package graft

import java.nio.file.Files

import graft.operators.ManifestTable

/** Round-13 wave 183 — r12-VERDICT task 6: V2 writes to transform-laid
  * tables implement `RequiresDistributionAndOrdering`, so Spark plans
  * the range-cluster-by-transform exchange and the V1 writer stages
  * the arriving layout as-is (`preclustered`). Claims proven here:
  *
  *  - a HIGH-parallelism INSERT into a bucket(4) table commits
  *    O(buckets) files, not O(input partitions), every file
  *    bucket-exact (band lo == hi) — the distribution request
  *    resolved and applied through the catalog's bucket function
  *  - the same contract holds for days() and truncate() layouts —
  *    the round-13 catalog functions resolve in write distribution
  *  - rows and pruning are unchanged (the request is a relayout of
  *    the same physics)
  */
class Wave183Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("a 32-partition INSERT into bucket(4) commits bucket-exact " +
    "O(buckets) files") {
    val cat = "w183b"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k))")
    spark.range(0, 4000).repartition(32)
      .selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w183_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w183_src")
    val root = wh.resolve("t")
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.size <= 4,
      s"32 input partitions into bucket(4) committed ${entries.size} " +
      "files — the write distribution did not apply")
    assert(entries.forall(_.band("__ptb4_k").exists(b => b._1 == b._2)),
      "every committed file must be bucket-exact (band lo == hi)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 4000L)
    // pruning through the laid-out files stays exact
    val got = spark.sql(s"SELECT v FROM $cat.t WHERE k = 77").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(77L))
  }

  test("days() and truncate() layouts lay out through the write " +
    "distribution (catalog functions resolve)") {
    val cat = "w183d"
    val wh = mkCatalog(cat)
    val day = 86400000000L
    spark.sql(s"CREATE TABLE $cat.d (ts BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts))")
    spark.range(0, 3000).repartition(16)
      .selectExpr(s"id * ${day / 1000} AS ts", "id AS v")
      .createOrReplaceTempView("w183_days_src") // spans exactly 3 days
    spark.sql(s"INSERT INTO $cat.d SELECT * FROM w183_days_src")
    val droot = wh.resolve("d")
    val dentries = ManifestTable.entriesFor(droot,
      ManifestTable.latestVersion(droot))
    assert(dentries.size == 3,
      s"3 days of data must commit 3 day-exact files, got ${dentries.size}")
    assert(dentries.forall(_.band("__ptd_ts").exists(b => b._1 == b._2)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.d " +
      s"WHERE ts >= ${day} AND ts < ${2 * day}").head().getLong(0)
      == 1000L)

    spark.sql(s"CREATE TABLE $cat.r (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (truncate(1000, k))")
    spark.range(0, 5000).repartition(16)
      .selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w183_tr_src")
    spark.sql(s"INSERT INTO $cat.r SELECT * FROM w183_tr_src")
    val rroot = wh.resolve("r")
    val rentries = ManifestTable.entriesFor(rroot,
      ManifestTable.latestVersion(rroot))
    assert(rentries.size == 5,
      s"5 truncate-ranges must commit 5 files, got ${rentries.size}")
    assert(rentries.forall(_.band("__ptt1000_k").exists(b => b._1 == b._2)))
    assert(spark.sql(s"SELECT count(*) FROM $cat.r WHERE k = 4321")
      .head().getLong(0) == 1L)
  }

  test("the plain V1 write path (no V2 negotiation) still lays out " +
    "itself") {
    val root = Files.createTempDirectory("graft_w183_v1").resolve("t")
    Files.createDirectories(root)
    val df = spark.range(0, 2000).repartition(8)
      .selectExpr("id AS k", "id AS v")
    ManifestTable.commit(root, Nil,
      s"schema=${ManifestTable.schemaMeta(df.schema)} ptrans=bucket(4,k)")
    df.write.format("graft-manifest").option("path", root.toString)
      .mode("append").save()
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.forall(_.band("__ptb4_k").exists(b => b._1 == b._2)),
      "the V1 writer must still repartition by the transforms itself")
  }
}
