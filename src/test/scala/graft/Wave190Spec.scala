package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Round-13 wave 190: ROLLING writers — value-exact layout files BY
  * CONSTRUCTION, and maintenance that preserves it. Claims proven:
  *
  *  - a days() INSERT with writeFiles FAR below the day count still
  *    commits one value-exact file per day (the roll, not the range
  *    sampler, guarantees exactness)
  *  - OPTIMIZE on a fragmented bucket table packs small files while
  *    keeping every packed file bucket-exact — and the SPJ still
  *    plans ZERO exchanges after maintenance
  *  - rows are bit-identical through the pack
  */
class Wave190Spec extends SparkSpec {

  private def shufflesOf(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => shufflesOf(a.executedPlan)
    case q: QueryStageExec => shufflesOf(q.plan)
    case s: ShuffleExchangeExec => s +: s.children.flatMap(shufflesOf)
    case other => other.children.flatMap(shufflesOf)
  }

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("writeFiles far below the day count still commits " +
    "one value-exact file per day (the rolling guarantee)") {
    val cat = "w190r"
    val wh = mkCatalog(cat)
    val day = 86400000000L
    spark.sql(s"CREATE TABLE $cat.d (day_us BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (days(day_us)) " +
      "TBLPROPERTIES ('writeFiles'='3')")
    // 20 distinct days into 3 write partitions: the old
    // one-file-per-task shape would straddle ~7 days per file
    spark.range(0, 2000).repartition(8)
      .selectExpr(s"(id % 20) * $day AS day_us", "id AS v")
      .createOrReplaceTempView("w190_src")
    spark.sql(s"INSERT INTO $cat.d SELECT * FROM w190_src")
    val root = wh.resolve("d")
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.size == 20,
      s"20 days must commit 20 rolled files, got ${entries.size}")
    assert(entries.forall(_.band("__ptd_day_us")
      .exists(b => b._1 == b._2)),
      "every rolled file must be day-exact")
    assert(spark.sql(s"SELECT count(*) FROM $cat.d").head().getLong(0)
      == 2000L)
  }

  test("OPTIMIZE packs a fragmented bucket table value-exactly; " +
    "SPJ survives maintenance") {
    val cat = "w190o"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.big (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('statsColumns'='k')")
    spark.sql(s"CREATE TABLE $cat.dim (k BIGINT, w BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k))")
    // three INSERTs fragment the layout: ~3 files per bucket
    (0 until 3).foreach { i =>
      spark.range(i * 400, (i + 1) * 400)
        .selectExpr("id AS k", "id * 3 AS v")
        .createOrReplaceTempView(s"w190_b$i")
      spark.sql(s"INSERT INTO $cat.big SELECT * FROM w190_b$i")
    }
    spark.range(0, 1200).selectExpr("id AS k", "id * 7 AS w")
      .createOrReplaceTempView("w190_dim")
    spark.sql(s"INSERT INTO $cat.dim SELECT * FROM w190_dim")
    val root = wh.resolve("big")
    val preCount = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root)).size
    assert(preCount >= 9, s"fixture should fragment, got $preCount")

    graft.plans.GraftSql.sql(spark, s"OPTIMIZE $cat.big")
      .head().getLong(0)
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.size <= 4,
      s"pack must reach O(buckets) files, got ${entries.size}")
    assert(entries.forall(_.band("__ptb4_k").exists(b => b._1 == b._2)),
      "every packed file must stay bucket-exact (the layout-aware " +
      "OPTIMIZE claim)")
    // rows bit-identical through the pack
    assert(spark.sql(s"SELECT sum(v), count(*) FROM $cat.big").head()
      .getLong(1) == 1200L)

    // and the co-bucketed join STILL plans zero shuffles
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(s"SELECT b.k, b.v, d.w FROM $cat.big b " +
        s"JOIN $cat.dim d ON b.k = d.k")
      assert(df.count() == 1200L)
      assert(shufflesOf(df.queryExecution.executedPlan).isEmpty,
        "SPJ must survive the layout-aware OPTIMIZE")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
