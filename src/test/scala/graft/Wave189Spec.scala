package graft

import java.nio.file.Files

/** Round-13 wave 189: METADATA TABLES — Iceberg's `t.files` /
  * `t.history` / `t.partitions` resolved through the catalog. Claims
  * proven here:
  *
  *  - `t.history` lists every committed version with its op token,
  *    and the scan plans a LOCAL table scan (no distributed job for
  *    driver-scale metadata)
  *  - `t.files` lists the LIVE files of the latest snapshot with
  *    their single-transform partition value; `t.partitions`
  *    aggregates value → file count
  *  - a REAL table named `history` shadows the metadata view
  *  - SQL composes: filtering/aggregating over the metadata rows
  */
class Wave189Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("t.history lists commits; the plan is a LOCAL scan") {
    val cat = "w189h"
    mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 1), (2, 2)")
    spark.sql(s"DELETE FROM $cat.t WHERE k = 1")
    val df = spark.sql(
      s"SELECT version, kind, operation FROM $cat.t.history " +
      "ORDER BY version")
    val got = df.collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == 1L && got(0).getString(1) == "checkpoint")
    assert(got(1).getLong(0) == 2L)
    assert(got(2).getString(2).startsWith("delete=v"),
      s"v3 must carry the delete op token, got '${got(2).getString(2)}'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"metadata reads must plan LocalTableScan, got:\n$plan")
    // ts_millis present and sane (commits happened just now)
    val ts = spark.sql(s"SELECT min(ts_millis) FROM $cat.t.history")
      .head().getLong(0)
    assert(ts > 0L)
  }

  test("t.files and t.partitions expose the layout; straddles " +
    "count under NULL") {
    val cat = "w189f"
    mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k))")
    spark.range(0, 400).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w189_src")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM w189_src")
    val files = spark.sql(
      s"SELECT path, size_bytes, partition FROM $cat.b.files").collect()
    assert(files.length == 4, s"4 bucket files expected, ${files.length}")
    assert(files.forall(_.getLong(1) > 0L), "sizes must be real")
    assert(files.map(_.getLong(2)).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    val parts = spark.sql(
      s"SELECT transform, value, files FROM $cat.b.partitions " +
      "ORDER BY value").collect()
    assert(parts.length == 4)
    assert(parts.forall(r => r.getString(0) == "bucket(4,k)" &&
      r.getLong(2) == 1L))
    // SQL composes over metadata rows
    assert(spark.sql(s"SELECT sum(files) FROM $cat.b.partitions")
      .head().getLong(0) == 4L)
  }

  test("a REAL table named 'history' shadows the metadata view") {
    val cat = "w189s"
    mkCatalog(cat)
    spark.sql(s"CREATE NAMESPACE $cat.t")
    spark.sql(s"CREATE TABLE $cat.t.history (x BIGINT) " +
      "USING `graft-manifest`")
    spark.sql(s"INSERT INTO $cat.t.history VALUES (42)")
    val got = spark.sql(s"SELECT x FROM $cat.t.history").collect()
    assert(got.length == 1 && got(0).getLong(0) == 42L,
      "the real table must win over the metadata view")
  }
}
