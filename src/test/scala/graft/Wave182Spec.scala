package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.sources.{ManifestRuntimeScan, ManifestScanBuilder}
import org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

/** Round-13 wave 182 — r12-VERDICT task 5: PARTITION EVOLUTION. One
  * metadata-only commit swaps the write layout; old files keep their
  * recorded virtual bands and read-side derivation walks current +
  * historical transforms (`ptransprev=`). Claims proven here:
  *
  *  - the evolve commit rewrites ZERO data files
  *  - pruning works ACROSS the mixed layout: an equality skips
  *    old-generation files via the old bucket band AND new-generation
  *    files via the new one (admitted < both generation counts)
  *  - results stay exact (superset admit + residual re-filter)
  *  - SPJ fails CLOSED on a mixed snapshot: old files carry no band
  *    for the current transform, so key-grouping degrades to
  *    UnknownPartitioning even with the conf on
  *  - a garbage transform spec through CALL fails loudly instead of
  *    silently un-partitioning
  */
class Wave182Spec extends SparkSpec {

  private def admitted(root: java.nio.file.Path,
      schema: org.apache.spark.sql.types.StructType,
      f: org.apache.spark.sql.sources.Filter): Int = {
    val b = new ManifestScanBuilder(spark.sqlContext, root,
      ManifestTable.latestVersion(root), schema)
    b.pushFilters(Array(f))
    b.build().asInstanceOf[ManifestRuntimeScan].admittedEntries.size
  }

  test("evolution is metadata-only; pruning crosses the mixed layout; " +
    "results exact; SPJ fails closed") {
    val cat = "w182"
    val wh = Files.createTempDirectory("graft_w182")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k))")
    spark.range(0, 4000).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w182_src")
    spark.sql(s"INSERT INTO $cat.t " +
      "SELECT * FROM w182_src WHERE k % 2 = 0")
    val root = wh.resolve("t")
    val vBefore = ManifestTable.latestVersion(root)
    val filesBefore = ManifestTable.filesFor(root, vBefore)

    val out = graft.plans.GraftSql.sql(spark,
      s"CALL $cat.system.evolve_partitioning($cat.t, 'bucket(16,k)')")
      .head().getString(0).toInt
    assert(out == vBefore + 1, "evolution is one commit")
    assert(ManifestTable.filesFor(root, out) == filesBefore,
      "evolution must rewrite ZERO data files")
    assert(ManifestTable.partTransforms(root, out).map(_.meta) ==
      Seq("bucket(16,k)"), "the new layout is current")
    assert(ManifestTable.prevPartTransforms(root, out).map(_.meta) ==
      Seq("bucket(4,k)"), "the old layout moves to ptransprev")

    spark.sql(s"INSERT INTO $cat.t " +
      "SELECT * FROM w182_src WHERE k % 2 = 1")
    val v = ManifestTable.latestVersion(root)
    val entries = ManifestTable.entriesFor(root, v)
    val oldGen = entries.count(_.band("__ptb4_k").nonEmpty)
    val newGen = entries.count(_.band("__ptb16_k").nonEmpty)
    assert(oldGen > 1 && newGen > 1,
      s"fixture needs both generations multi-file: $oldGen/$newGen")

    // an equality must prune INSIDE both generations
    val schema = spark.read.format("graft-manifest-v2")
      .option("path", root.toString).load().schema
    val hit = admitted(root, schema, EqualTo("k", 42L))
    assert(hit < oldGen + newGen && hit <= oldGen / 2 + newGen / 2 + 2,
      s"equality admitted $hit of ${oldGen + newGen} files — the mixed " +
      "layout must prune via BOTH generations' bands")

    // exactness across the mix
    val got = spark.sql(s"SELECT k, v FROM $cat.t WHERE k = 42").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((42L, 42L)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 4000L)

    // SPJ fails closed on the mixed snapshot
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val scan = new ManifestScanBuilder(spark.sqlContext, root, v,
        schema).build().asInstanceOf[ManifestRuntimeScan]
      assert(scan.outputPartitioning().isInstanceOf[UnknownPartitioning],
        "a mixed-generation snapshot must NOT claim key grouping")
    } finally
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")

    // a garbage spec must fail loudly, never silently un-partition
    val e = intercept[Exception](graft.plans.GraftSql.sql(spark,
      s"CALL $cat.system.evolve_partitioning($cat.t, 'bogus(3,k)')")
      .collect())
    assert(String.valueOf(e.getMessage).contains("unparseable"),
      s"garbage spec must name the failure: ${e.getMessage}")
    assert(ManifestTable.partTransforms(root,
      ManifestTable.latestVersion(root)).nonEmpty,
      "the failed call must not have un-partitioned the table")
  }

  test("rewrites preserve OLD-generation virtual stats " +
    "(restoreTransformCols walks historical transforms)") {
    val root = Files.createTempDirectory("graft_w182_rw").resolve("t")
    Files.createDirectories(root)
    val df = spark.range(0, 2000).selectExpr("id AS k", "id AS v")
    ManifestTable.commit(root, ManifestTable.stageHidden(
      df, root, "b", Seq(ManifestTable.BucketTransform(4, "k")), 8,
      Seq("k")),
      s"schema=${ManifestTable.schemaMeta(df.schema)} ptrans=bucket(4,k)")
    ManifestTable.evolvePartitioning(root,
      Seq(ManifestTable.BucketTransform(8, "k")))
    // a CoW DELETE rewrites old-generation files: their preserved stat
    // columns name __ptb4_k, which only the historical walk restores
    val v = ManifestTable.deleteWhereCoW(spark, root, df.schema,
      col("k") === 7L, Seq(("k", 7L, 7L)), Nil, Nil, Nil)
    assert(spark.read.format("graft-manifest-v2")
      .option("path", root.toString).load().count() == 1999L)
    val rewritten = ManifestTable.entriesFor(root, v)
    assert(rewritten.exists(_.band("__ptb4_k").nonEmpty),
      "the rewritten file must keep its old-generation virtual band")
  }

  test("un-partitioning ('' spec) stops the layout but keeps history " +
    "pruning; evolution on a column-mapped table refuses") {
    val root = Files.createTempDirectory("graft_w182_unp").resolve("t")
    Files.createDirectories(root)
    val df = spark.range(0, 1000).selectExpr("id AS k", "id AS v")
    ManifestTable.commit(root, ManifestTable.stageHidden(
      df, root, "b", Seq(ManifestTable.BucketTransform(4, "k")), 4,
      Seq("k")),
      s"schema=${ManifestTable.schemaMeta(df.schema)} ptrans=bucket(4,k)")
    ManifestTable.evolvePartitioning(root, Nil)
    val v = ManifestTable.latestVersion(root)
    assert(ManifestTable.partTransforms(root, v).isEmpty)
    assert(ManifestTable.prevPartTransforms(root, v).map(_.meta) ==
      Seq("bucket(4,k)"))
    // history still derives: equality admits < all files
    val schema = spark.read.format("graft-manifest-v2")
      .option("path", root.toString).load().schema
    assert(admitted(root, schema, EqualTo("k", 3L)) <
      ManifestTable.filesFor(root, v).size,
      "historical bands must keep pruning after un-partitioning")

    // column-mapped refusal
    ManifestTable.renameColumn(root, "v", "val")
    val e = intercept[IllegalArgumentException](
      ManifestTable.evolvePartitioning(root,
        Seq(ManifestTable.BucketTransform(8, "k"))))
    assert(e.getMessage.contains("column-mapped"))
  }
}
