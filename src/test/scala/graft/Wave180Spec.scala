package graft

import java.nio.file.Files

import graft.sources.ManifestScanBuilder
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, UnknownPartitioning}
import org.apache.spark.sql.functions._

/** Round-13 wave 180 — r12-VERDICT tasks 2+3 (the two nits):
  *
  *  - join_manifest_spj scopes `spark.sql.sources.v2.bucketing.enabled`
  *    with try/finally save-restore and materializes its result INSIDE
  *    the scope — the old leak re-enabled group-granular planning
  *    (parallelism capped at numBuckets) for every later bucket-table
  *    query in the session
  *  - the bloom probe selection derives its 5 keys from an
  *    agg(min,max) ladder instead of collecting every distinct
  *    custkey to the driver (both declared sites)
  */
class Wave180Spec extends SparkSpec {

  test("join_manifest_spj restores the SPJ conf; a bucket-table scan " +
    "after it plans split-granular (UnknownPartitioning)") {
    val key = "spark.sql.sources.v2.bucketing.enabled"
    spark.conf.set(key, "false")
    val df = q("join_manifest_spj")
    assert(df.count() > 0, "spj join must return segment rows")
    assert(spark.conf.get(key) == "false",
      "the SPJ conf must be restored after the query")

    // a fresh bucket table: with the conf back OFF its scan must NOT
    // key-group (group-granularity caps parallelism at numBuckets)
    val cat = "w180spj"
    val wh = Files.createTempDirectory("graft_w180")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k))")
    spark.range(0, 400).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w180_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w180_src")
    val root = wh.resolve("t")
    val schema = spark.read.format("graft-manifest-v2")
      .option("path", root.toString).load().schema
    def partitioning() = new ManifestScanBuilder(spark.sqlContext, root,
        graft.operators.ManifestTable.latestVersion(root), schema)
      .build().asInstanceOf[graft.sources.ManifestRuntimeScan]
      .outputPartitioning()
    assert(partitioning().isInstanceOf[UnknownPartitioning],
      "conf off after the query: plain scans must stay split-granular")
    spark.conf.set(key, "true")
    try assert(partitioning().isInstanceOf[KeyGroupedPartitioning],
      "conf on: the same scan must key-group")
    finally spark.conf.set(key, "false")

    // and the symmetric direction: a session that already opted in
    // must come back opted-in (getOption on a registered SQLConf
    // entry resolves the default, so 'unset' itself is unobservable —
    // value round-tripping is the testable contract)
    spark.conf.set(key, "true")
    try {
      q("join_manifest_spj").count()
      assert(spark.conf.get(key) == "true",
        "an opted-in session must stay opted-in after the query")
    } finally spark.conf.set(key, "false")
  }

  test("bloom probes ride the agg(min,max) ladder: results are exactly " +
    "the ladder keys' rows, no distinct-key collect") {
    val orders = Tables.table(spark, sfDir, "orders")
    val b = orders.agg(min("o_custkey"), max("o_custkey")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val ladder = (0L until 5L).map(i => lo + (i * (hi - lo)) / 5).toSet
    Seq("source_manifest_bloom", "source_manifest_bloom_sql").foreach {
      name =>
        val got = q(name).collect()
        assert(got.nonEmpty, s"$name returned no rows")
        val cks = got.map(_.getAs[Long]("o_custkey")).toSet
        assert(cks.subsetOf(ladder),
          s"$name returned keys outside the ladder: ${cks -- ladder}")
        // the exact-filter ground truth
        val want = orders.filter(col("o_custkey")
          .isin(ladder.toSeq: _*)).count()
        assert(got.length.toLong == want,
          s"$name: got ${got.length} rows, want $want")
    }
  }
}
