package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.plans.ManifestDmlStrategy
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Round-11 wave 159: schema evolution on INSERT and MERGE
  * (r10-VERDICT task 7). Claims proven here:
  *
  *  - a DataFrame append with new columns + mergeSchema=true widens
  *    the logical schema IN the append commit (old rows null-fill,
  *    zero bytes rewritten); without the option it fails loudly; a
  *    NARROWER append no longer silently narrows the recorded schema
  *  - MERGE … WITH SCHEMA EVOLUTION auto-ADDs source-only columns
  *    (metadata-only) and propagates them through matched UPDATEs and
  *    INSERTs even when the analyzer aligned the assignment lists
  *    against the pre-evolution schema
  */
class Wave159Spec extends SparkSpec {

  test("mergeSchema append widens in one commit; no option fails " +
    "loudly; narrow appends keep the recorded schema") {
    val root = Files.createTempDirectory("graft_w159_ms").resolve("t")
    Files.createDirectories(root)
    spark.range(0, 10).selectExpr("id AS k", "id AS v")
      .write.format("graft-manifest").option("path", root.toString)
      .option("statsColumns", "k").mode("append").save()
    // new column without the option → loud
    val e = intercept[IllegalArgumentException] {
      spark.range(10, 20).selectExpr("id AS k", "id AS v", "id AS w")
        .write.format("graft-manifest").option("path", root.toString)
        .mode("append").save()
    }
    assert(e.getMessage.contains("mergeSchema"), e.getMessage)
    // with the option: widened schema, old rows null-fill
    spark.range(10, 20).selectExpr("id AS k", "id AS v", "id AS w")
      .write.format("graft-manifest").option("path", root.toString)
      .option("mergeSchema", "true").mode("append").save()
    val got = spark.read.format("graft-manifest")
      .option("path", root.toString).load()
    assert(got.columns.toSeq == Seq("k", "v", "w"))
    assert(got.filter(col("k") < 10 && col("w").isNull).count() == 10)
    assert(got.filter(col("k") >= 10 && col("w").isNotNull).count() == 10)
    // a narrower append keeps the widened schema recorded
    spark.range(20, 25).selectExpr("id AS k", "id AS v")
      .write.format("graft-manifest").option("path", root.toString)
      .mode("append").save()
    val after = spark.read.format("graft-manifest")
      .option("path", root.toString).load()
    assert(after.columns.toSeq == Seq("k", "v", "w"),
      "a narrow append must not narrow the recorded schema")
    assert(after.count() == 25)
  }

  test("MERGE WITH SCHEMA EVOLUTION: source-only columns auto-ADD " +
    "and propagate through UPDATE SET * and INSERT *") {
    val wh = Files.createTempDirectory("graft_w159_mrg")
    val cat = "w159mrg"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    bridge.addStrategy(spark, ManifestDmlStrategy)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(10)")
    spark.range(5, 15)
      .selectExpr("id AS k", "id * 10 AS v", "id + 1000 AS tag")
      .createOrReplaceTempView("w159_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t
         |USING w159_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT k, v, tag FROM $cat.t ORDER BY k")
      .collect()
    assert(got.length == 15)
    got.foreach { r =>
      val k = r.getLong(0)
      if (k < 5) // untouched: tag null-fills
        assert(r.getLong(1) == k && r.isNullAt(2), s"row $r")
      else // matched update / insert: tag arrives from the source
        assert(r.getLong(1) == k * 10 && r.getLong(2) == k + 1000,
          s"row $r")
    }
    // the evolution is metadata-only: the schema commit is visible in
    // history and pre-merge files were not rewritten for the ADD
    val hist = ManifestTable.history(spark, wh.resolve("t")).collect()
    assert(hist.length >= 3, s"expected CREATE+INSERT+ADD+MERGE: " +
      s"${hist.toSeq}")
  }

  test("MERGE WITH SCHEMA EVOLUTION with explicit assignments keeps " +
    "the evolved column NULL (only SET * / INSERT * auto-propagate)") {
    val wh = Files.createTempDirectory("graft_w159_part")
    val cat = "w159part"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    bridge.addStrategy(spark, ManifestDmlStrategy)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest`")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(6)")
    spark.range(0, 3).selectExpr("id AS k", "id AS sv", "id * 2 AS nw")
      .createOrReplaceTempView("w159_part_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t
         |USING w159_part_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.sv + 100""".stripMargin)
    val got = spark.sql(s"SELECT k, v, nw FROM $cat.t ORDER BY k")
      .collect()
    got.foreach { r =>
      val k = r.getLong(0)
      // Delta's evolution rule (round 12 — r11-ADVICE fix): ONLY
      // SET * / INSERT * auto-propagate new columns; an explicit
      // assignment list leaves the evolved column NULL even on
      // matched rows — the column exists (schema widened) but no
      // clause assigned it
      if (k < 3)
        assert(r.getLong(1) == k + 100 && r.isNullAt(2),
          s"explicit SET must leave the evolved column NULL: $r")
      else assert(r.getLong(1) == k && r.isNullAt(2), s"row $r")
    }
  }
}
