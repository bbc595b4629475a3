package graft

import java.nio.file.Files

import graft.operators.{ManifestSqlOps, ManifestTable}
import graft.plans.ManifestDmlStrategy
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Round-11 wave 153: GENERAL-shape SQL MERGE (the r10-VERDICT top
  * task) — [[graft.plans.MergeManifestCommand]] over
  * [[ManifestTable.mergeRewrite]]. Claims proven here:
  *
  *  - the declared mixed statement (conditional partial UPDATE +
  *    fall-through DELETE + conditional INSERT) is row-identical to
  *    an API-composed twin, and its band-scoped touched set leaves
  *    the out-of-band files live by path (the CoW claim)
  *  - first-true-wins clause order across multiple conditional
  *    WHEN MATCHED clauses; no-clause-fires keeps the row
  *  - WHEN NOT MATCHED BY SOURCE UPDATE / DELETE (full-table touch)
  *  - INSERT with a partial column list NULL-fills the rest
  *  - TARGET-side duplicate keys get per-row actions (the shape the
  *    one-image-per-key upsert rejects by design)
  *  - an empty source with band-scoped clauses is a no-op (no commit)
  *  - MERGE WITH SCHEMA EVOLUTION plans (semantics in Wave159Spec)
  */
class Wave153Spec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft_w153_$tag")
    val cat = s"w153$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    bridge.addStrategy(spark, ManifestDmlStrategy)
    cat
  }

  private def rootOf(cat: String, table: String) =
    java.nio.file.Paths.get(
      spark.conf.get(s"spark.sql.catalog.$cat.warehouse"), table)

  test("declared mixed MERGE == API-composed twin; out-of-band files " +
    "survive by path") {
    import graft.operators.ManifestOps
    val orders = Tables.table(spark, sfDir, "orders")
    val mx = orders.agg(max("o_orderkey")).head().getLong(0)
    val got = q("manifest_sql_merge_mixed").collect().toSeq
    // the API twin, composed with plain DataFrame algebra
    val srcPrice = col("o_totalprice") + lit(10.0d)
    val isMatch = col("o_orderkey") % 13 === 0 && col("o_orderkey") < mx / 2
    val updated = orders.filter(isMatch && srcPrice > 50000.0)
      .withColumn("o_totalprice", srcPrice + lit(1.0d))
      .withColumn("o_orderstatus", lit("M"))
    val untouched = orders.filter(!isMatch)
    val inserted = orders
      .filter(col("o_orderkey") % 29 === 0 && col("o_orderkey") > 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(mx))
      .filter(col("o_orderkey") % 2 === 0)
    val want = untouched.unionByName(updated).unionByName(inserted)
      .select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .orderBy("o_orderkey").collect().toSeq
    assert(got == want,
      s"mixed MERGE diverged from the twin: ${got.diff(want).take(3)} " +
      s"vs ${want.diff(got).take(3)}")
    // CoW: v1 files whose key band sits wholly ABOVE the matched band
    // (and below the inserts) must survive into v2 by path
    val root = ManifestSqlOps.sqlMergeMixedRoot(spark, sfDir)
    val v1 = ManifestTable.entriesFor(root, 1)
    val v2 = ManifestTable.filesFor(root, 2).toSet
    val outOfBand = v1.filter(_.band("o_orderkey").exists(_._1 >= mx / 2))
    assert(outOfBand.nonEmpty, "fixture must have out-of-band files")
    outOfBand.foreach(e => assert(v2.contains(e.path),
      s"out-of-band file ${e.path} was rewritten — not copy-on-write"))
  }

  test("declared NMBS MERGE == sync-to-source; full-table touch") {
    val orders = Tables.table(spark, sfDir, "orders")
    val mx = orders.agg(max("o_orderkey")).head().getLong(0)
    val got = q("manifest_sql_merge_nmbs").collect().toSeq
    val want = orders.filter(col("o_orderkey") < mx / 4)
      .withColumn("o_totalprice", col("o_totalprice") + lit(2.0d))
      .select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .orderBy("o_orderkey").collect().toSeq
    assert(got == want, s"NMBS MERGE diverged: ${got.size} vs ${want.size}")
  }

  test("first-true-wins across conditional matched clauses; " +
    "no-clause-fires keeps the row") {
    val cat = freshCatalog("order")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(10)")
    spark.range(0, 10).selectExpr("id AS k", "id AS sv")
      .createOrReplaceTempView("w153_order_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING w153_order_src s ON t.k = s.k
         |WHEN MATCHED AND s.sv < 3 THEN UPDATE SET v = 100
         |WHEN MATCHED AND s.sv < 6 THEN UPDATE SET v = 200
         |WHEN MATCHED AND s.sv = 7 THEN DELETE""".stripMargin)
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = (0L to 9L).flatMap {
      case k if k < 3 => Some(k -> 100L)  // first clause wins
      case k if k < 6 => Some(k -> 200L)  // second fires where first missed
      case 7L => None                      // delete
      case k => Some(k -> k)               // no clause fires → keep
    }
    assert(got == want, s"clause order broken: $got")
  }

  test("NMBS UPDATE assigns target-side expressions on unmatched rows") {
    val cat = freshCatalog("nmbsu")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(8)")
    spark.range(0, 4).selectExpr("id AS k", "id AS sv")
      .createOrReplaceTempView("w153_nmbsu_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING w153_nmbsu_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.sv * 10
         |WHEN NOT MATCHED BY SOURCE AND t.k < 6 THEN
         |  UPDATE SET v = t.v + 1000""".stripMargin)
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = (0L to 7L).map {
      case k if k < 4 => k -> k * 10      // matched
      case k if k < 6 => k -> (k + 1000)  // NMBS conditional update
      case k => k -> k                    // NMBS cond false → keep
    }
    assert(got == want, s"NMBS update broken: $got")
  }

  test("INSERT with a partial column list NULL-fills unassigned " +
    "columns") {
    val cat = freshCatalog("nulls")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT, s STRING) " +
      "USING `graft-manifest`")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id, 'x' FROM range(3)")
    spark.range(2, 5).selectExpr("id AS k", "id AS sv")
      .createOrReplaceTempView("w153_nulls_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING w153_nulls_src s ON t.k = s.k
         |WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)""".stripMargin)
    val got = spark.sql(s"SELECT k, v, s FROM $cat.t ORDER BY k").collect()
    assert(got.length == 5)
    got.filter(_.getLong(0) >= 3).foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2),
        s"unassigned insert columns must be NULL: $r")
    }
  }

  test("target-side duplicate keys each get their own row action " +
    "(per-row Delta semantics, not one-image collapse)") {
    val cat = freshCatalog("tdup")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest`")
    // key 5 appears twice in the target with different values
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(8)")
    spark.sql(s"INSERT INTO $cat.t VALUES (5, 555)")
    spark.range(5, 6).selectExpr("id AS k", "id AS sv")
      .createOrReplaceTempView("w153_tdup_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING w153_tdup_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = t.v + 1""".stripMargin)
    val got = spark.sql(s"SELECT v FROM $cat.t WHERE k = 5 ORDER BY v")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(6L, 556L),
      s"both duplicate rows must be updated per-row: $got")
  }

  test("empty source with band-scoped clauses is a no-op; " +
    "WITH SCHEMA EVOLUTION adds the source-only column") {
    val cat = freshCatalog("edge")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest`")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(5)")
    val before = ManifestTable.latestVersion(rootOf(cat, "t"))
    spark.range(0).selectExpr("id AS k", "id AS sv")
      .createOrReplaceTempView("w153_empty_src")
    spark.sql(
      s"""MERGE INTO $cat.t t USING w153_empty_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.sv
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.sv)"""
        .stripMargin)
    assert(ManifestTable.latestVersion(rootOf(cat, "t")) == before,
      "an empty band-scoped MERGE must not commit a version")
    // WITH SCHEMA EVOLUTION became legal in wave 159 — Wave159Spec
    // proves the semantics; here just the smoke that it plans
    spark.range(3).selectExpr("id AS k", "id AS sv", "id AS extra")
      .createOrReplaceTempView("w153_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t t
         |USING w153_evo_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.sv""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $cat.t").columns.contains("extra"),
      "WITH SCHEMA EVOLUTION must add the source-only column")
  }
}
