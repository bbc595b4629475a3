package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** Round-12 wave 176: STORAGE-PARTITIONED JOINS — the shuffle
  * eliminator real formats ship (Iceberg SPJ): a scan over a
  * bucket-laid manifest table reports KeyGroupedPartitioning (one
  * HasPartitionKey partition per bucket value, grouped from the
  * per-file transform bands), the catalog exposes the layout's bucket
  * function, and two co-bucketed tables join with ZERO exchanges.
  * Claims proven here:
  *
  *  - the co-bucketed join plans NO ShuffleExchange on either side
  *    and returns exactly the plain join's rows
  *  - a straddle/degraded state (no transforms) falls back to
  *    ordinary exchanges, never to wrong co-location
  */
class Wave176Spec extends SparkSpec {

  private def shufflesOf(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => shufflesOf(a.executedPlan)
    case q: QueryStageExec => shufflesOf(q.plan)
    case s: ShuffleExchangeExec => s +: s.children.flatMap(shufflesOf)
    case other => other.children.flatMap(shufflesOf)
  }

  private def joinsOf(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => joinsOf(a.executedPlan)
    case q: QueryStageExec => joinsOf(q.plan)
    case j: SortMergeJoinExec => j +: j.children.flatMap(joinsOf)
    case j: ShuffledHashJoinExec => j +: j.children.flatMap(joinsOf)
    case other => other.children.flatMap(joinsOf)
  }

  test("two co-bucketed manifest tables join with ZERO shuffles") {
    val cat = "w176spj"
    val wh = Files.createTempDirectory("graft_w176")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.a (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, k))")
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT, w BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, k))")
    spark.range(0, 800).selectExpr("id AS k", "id * 3 AS v")
      .createOrReplaceTempView("w176_a")
    spark.range(0, 400).selectExpr("id AS k", "id * 7 AS w")
      .createOrReplaceTempView("w176_b")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM w176_a")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM w176_b")
    // the layout must be bucket-exact for SPJ to engage
    val rootA = wh.resolve("a")
    val entries = ManifestTable.entriesFor(rootA,
      ManifestTable.latestVersion(rootA))
    assert(entries.forall(_.band("__ptb8_k").exists(b => b._1 == b._2)),
      s"fixture files must be bucket-exact: " +
      entries.map(_.band("__ptb8_k")).mkString(","))
    val saved = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        s"""SELECT a.k, a.v, b.w FROM $cat.a a
           |JOIN $cat.b b ON a.k = b.k""".stripMargin)
      val rows = df.collect()
      assert(rows.length == 400 && rows.forall(r =>
        r.getLong(1) == r.getLong(0) * 3 && r.getLong(2) == r.getLong(0) * 7),
        s"join rows wrong: ${rows.length}")
      val plan = df.queryExecution.executedPlan
      assert(joinsOf(plan).nonEmpty, s"expected a shuffled-family join:\n$plan")
      assert(shufflesOf(plan).isEmpty,
        s"co-bucketed join must plan ZERO exchanges:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("unpartitioned tables keep ordinary exchanges (no false " +
    "co-location)") {
    val cat = "w176fb"
    val wh = Files.createTempDirectory("graft_w176_fb")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.a (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT, w BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.range(0, 500).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w176_fa")
    spark.range(0, 500).selectExpr("id AS k", "id AS w")
      .createOrReplaceTempView("w176_fbv")
    spark.sql(s"INSERT INTO $cat.a SELECT * FROM w176_fa")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM w176_fbv")
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        s"SELECT a.k FROM $cat.a a JOIN $cat.b b ON a.k = b.k")
      assert(df.count() == 500)
      assert(shufflesOf(df.queryExecution.executedPlan).nonEmpty,
        "unpartitioned tables must still exchange")
    } finally saved.fold(
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }
}
