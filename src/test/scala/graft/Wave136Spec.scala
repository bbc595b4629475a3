package graft

import java.nio.file.Files
import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-9 wave 136: COLUMN MAPPING — metadata-only RENAME/DROP
  * COLUMN, the schema-evolution half ADD COLUMN alone left open.
  * Claims proven here, not by the oracle: rename and drop commit ZERO
  * body lines and rewrite ZERO data bytes, pre-rename files alias
  * their physical column, post-rename appends write physical names
  * through stageEvolved, a rename back to the physical name collapses
  * the mapping, and the guards fail loudly (missing column, name
  * collision, last-column drop).
  */
class Wave136Spec extends SparkSpec {

  private def bodyLines(root: java.nio.file.Path, v: Int): Seq[String] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(root.resolve("_manifests").resolve(f"v$v%05d.txt")))
      .asScala.drop(1).filter(_.nonEmpty).toSeq

  private def table() = {
    val root = Files.createTempDirectory("graft_mf_colmap")
    val df = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).as("price"))
    val v1 = ManifestTable.appendCommit(root,
      ManifestTable.stage(df.repartition(2), root, "base"),
      s"schema=${ManifestTable.schemaMeta(df.schema)}")
    assert(v1 == 1)
    (root, df)
  }

  test("rename is metadata-only: zero body lines, identical live set, " +
    "identical data bytes; reads alias the physical column") {
    val (root, df) = table()
    val data = root.resolve("data")
    val sizesBefore = ManifestTable.filesFor(root, 1)
      .map(f => f -> Files.size(data.resolve(f))).toMap
    val v2 = ManifestTable.renameColumn(root, "price", "cost")
    assert(bodyLines(root, v2).isEmpty, "rename wrote body lines")
    assert(ManifestTable.filesFor(root, v2).toSet == sizesBefore.keySet)
    sizesBefore.foreach { case (f, s) =>
      assert(Files.size(data.resolve(f)) == s, s"rename rewrote $f") }
    val got = ManifestTable.readEvolved(spark, root, v2)
    assert(got.schema.fieldNames.toSeq == Seq("k", "cost"))
    assert(got.agg(sum("cost")).head().getLong(0) ==
      df.agg(sum("price")).head().getLong(0))
    assert(ManifestTable.physicalName(root, v2, "cost") == "price")
  }

  test("appends after a rename ride stageEvolved (physical names in " +
    "files), and a rename back to the physical name collapses the map") {
    val (root, _) = table()
    val v2 = ManifestTable.renameColumn(root, "price", "cost")
    val late = spark.range(100, 110).select(col("id").as("k"),
      (col("id") * 2).as("cost"))
    val v3 = ManifestTable.appendCommit(root,
      ManifestTable.stageEvolved(late.coalesce(1), root, "late", v2),
      ManifestTable.evolutionMeta(root, v2))
    // the staged file physically carries 'price' (the mapped name)
    val newFile = (ManifestTable.filesFor(root, v3).toSet --
      ManifestTable.filesFor(root, v2).toSet).head
    val footer = spark.read
      .parquet(root.resolve("data").resolve(newFile).toString)
      .schema.fieldNames.toSeq
    assert(footer == Seq("k", "price"),
      s"post-rename append wrote logical names: $footer")
    val got = ManifestTable.readEvolved(spark, root, v3)
    assert(got.count() == 110 &&
      got.schema.fieldNames.toSeq == Seq("k", "cost"))
    // rename back: cost→price equals the physical name — mapping gone
    val v4 = ManifestTable.renameColumn(root, "cost", "price")
    assert(!ManifestTable.headerMeta(root, v4).contains("colmap"),
      "rename back to the physical name should collapse the mapping")
    assert(ManifestTable.readEvolved(spark, root, v4)
      .schema.fieldNames.toSeq == Seq("k", "price"))
  }

  test("drop is metadata-only: the column leaves the logical schema, " +
    "files and bytes stay, and the guards fail loudly") {
    val (root, df) = table()
    val data = root.resolve("data")
    val sizesBefore = ManifestTable.filesFor(root, 1)
      .map(f => f -> Files.size(data.resolve(f))).toMap
    val v2 = ManifestTable.dropColumn(root, "price")
    assert(bodyLines(root, v2).isEmpty, "drop wrote body lines")
    sizesBefore.foreach { case (f, s) =>
      assert(Files.size(data.resolve(f)) == s, s"drop rewrote $f") }
    val got = ManifestTable.readEvolved(spark, root, v2)
    assert(got.schema.fieldNames.toSeq == Seq("k") && got.count() == 100)
    // the bytes are still in the files (drop is logical, not physical)
    val raw = spark.read.parquet(ManifestTable.filesFor(root, v2)
      .map(f => data.resolve(f).toString): _*)
    assert(raw.schema.fieldNames.contains("price"))
    // guards
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(root, "nosuch", "x") }
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(root, "k") } // would empty the schema
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(root, "price") } // already dropped
    val (root2, _) = table()
    intercept[IllegalArgumentException] {
      ManifestTable.renameColumn(root2, "price", "k") } // collision
  }

  test("the declared colmap lifecycle reads the final logical schema " +
    "with every batch visible exactly once") {
    val orders = Tables.table(spark, sfDir, "orders")
    val root = ManifestOps.evo2Root(spark, sfDir)
    assert(ManifestTable.latestVersion(root) == 5)
    val got = ManifestTable.readEvolved(spark, root, 5)
    assert(got.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_price", "o_orderpriority"))
    val n = orders.count()
    val nShift = orders.filter(col("o_orderkey") % 5 === 0 &&
      col("o_orderkey") > 0).count()
    assert(got.count() == n + nShift)
    // pre-rename files: null priority on even keys, price carried over
    val mx = orders.agg(max("o_orderkey")).head().getLong(0)
    assert(got.filter(col("o_orderkey") <= mx &&
      col("o_orderkey") % 2 === 0 && col("o_orderpriority").isNotNull)
      .count() == 0)
    // the post-rename append carries price+1000 under the NEW name
    val shifted = got.filter(col("o_orderkey") > mx)
    assert(shifted.count() == nShift && nShift > 0)
  }
}
