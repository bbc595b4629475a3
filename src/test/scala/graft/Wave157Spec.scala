package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.plans.GraftSql
import org.apache.spark.sql.functions._

/** Round-11 wave 157: the SQL maintenance surface (r10-VERDICT task
  * 5) — OPTIMIZE / OPTIMIZE ZORDER BY / VACUUM / DESCRIBE HISTORY
  * through the [[graft.plans.GraftSqlParser]] wrapper. Claims proven:
  *
  *  - the parser recognizes exactly the three maintenance shapes and
  *    delegates everything else verbatim (a SELECT mentioning
  *    OPTIMIZE still parses as a SELECT)
  *  - OPTIMIZE bin-packs the small-file tail copy-on-write; ZORDER
  *    re-clusters so BOTH columns' per-file bands narrow
  *  - VACUUM honors the retention horizon (RETAIN large sweeps
  *    nothing; RETAIN 0 sweeps the replaced files) and the swept
  *    table still reads
  *  - DESCRIBE HISTORY surfaces the commit log newest-first
  */
class Wave157Spec extends SparkSpec {

  private def freshTable(tag: String): (String, java.nio.file.Path) = {
    val wh = Files.createTempDirectory(s"graft_w157_$tag")
    val cat = s"w157$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, c BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k', " +
      "'writeFiles' = '8')")
    (cat, wh.resolve("t"))
  }

  test("parser dispatch: maintenance shapes parse, everything else " +
    "delegates") {
    val p = new graft.plans.GraftSqlParser(
      org.apache.spark.sql.graft.bridge.parser(spark))
    assert(p.parsePlan("OPTIMIZE gm.a.b")
      .isInstanceOf[graft.plans.OptimizeManifestCommand])
    assert(p.parsePlan("optimize gm.a.b zorder by (x, y)") match {
      case graft.plans.OptimizeManifestCommand(parts, cols) =>
        parts == Seq("gm", "a", "b") && cols == Seq("x", "y")
      case _ => false
    })
    assert(p.parsePlan("VACUUM gm.`a-b`.t RETAIN 24 HOURS") match {
      case graft.plans.VacuumManifestCommand(parts, Some(ms)) =>
        parts == Seq("gm", "a-b", "t") && ms == 24L * 3600 * 1000
      case _ => false
    })
    assert(p.parsePlan("DESCRIBE HISTORY gm.a.b")
      .isInstanceOf[graft.plans.DescribeHistoryCommand])
    // non-maintenance statements delegate verbatim
    assert(!p.parsePlan("SELECT 'OPTIMIZE gm.a.b' AS s")
      .isInstanceOf[graft.plans.OptimizeManifestCommand])
    assert(!p.parsePlan("DESCRIBE TABLE some_table")
      .isInstanceOf[graft.plans.DescribeHistoryCommand])
  }

  test("OPTIMIZE bin-packs small files CoW; ZORDER narrows both " +
    "columns' bands") {
    val (cat, root) = freshTable("opt")
    spark.range(0, 4096)
      .selectExpr("id AS k", "(id * 2654435761) % 4096 AS c")
      .repartitionByRange(16, col("k"))
      .createOrReplaceTempView("w157_opt_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w157_opt_src")
    assert(ManifestTable.filesFor(root, 2).size == 16)
    val v3 = GraftSql.sql(spark, s"OPTIMIZE $cat.t").head().getLong(0)
    assert(v3 == 3 && ManifestTable.filesFor(root, 3).size < 16,
      s"OPTIMIZE must pack the 16 small files, got " +
      s"${ManifestTable.filesFor(root, 3).size}")
    // zorder: stage with wide-scattered c, then assert the relayout
    // narrows the per-file c bands (the k-range layout spans c fully)
    GraftSql.sql(spark,
      s"OPTIMIZE $cat.t ZORDER BY (k, c)").head().getLong(0)
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.size > 1 && entries.forall(e =>
      e.band("k").isDefined && e.band("c").isDefined))
    val avgSpan = entries.map(e => {
      val (lo, hi) = e.band("c").get; hi - lo
    }).sum / entries.size
    assert(avgSpan < 4096,
      s"zorder must narrow c bands below the full span, avg $avgSpan")
    // data intact through the whole cycle
    assert(spark.sql(s"SELECT count(*), sum(k) FROM $cat.t").head match {
      case r => r.getLong(0) == 4096 && r.getLong(1) == 4096L * 4095 / 2
    })
  }

  test("VACUUM honors retention; RETAIN 0 sweeps replaced files and " +
    "the table still reads; DESCRIBE HISTORY lists newest-first") {
    val (cat, root) = freshTable("vac")
    spark.sql(s"INSERT INTO $cat.t SELECT id, id FROM range(0, 64)")
    spark.range(0, 64).selectExpr("id AS k", "id AS c")
      .repartitionByRange(4, col("k"))
      .createOrReplaceTempView("w157_vac_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w157_vac_src")
    GraftSql.sql(spark, s"OPTIMIZE $cat.t").head().getLong(0)
    // the default/large retention keeps everything (in-flight-writer
    // guard): freshly-replaced files are inside the horizon
    assert(GraftSql.sql(spark, s"VACUUM $cat.t RETAIN 168 HOURS")
      .count() == 0)
    val swept = GraftSql.sql(spark, s"VACUUM $cat.t RETAIN 0 HOURS")
      .collect().map(_.getString(0))
    assert(swept.nonEmpty, "RETAIN 0 must sweep the replaced files")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0)
      == 128)
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY $cat.t").collect()
    assert(hist.length == ManifestTable.latestVersion(root))
    assert(hist.map(_.getLong(0)).toSeq ==
      hist.map(_.getLong(0)).toSeq.sorted.reverse,
      "history must list newest-first")
    assert(hist.exists(_.getString(3).contains("optimize")),
      s"history must carry the optimize op: ${hist.toSeq}")
    // a non-manifest catalog identifier fails loudly
    val e = intercept[Exception] {
      GraftSql.sql(spark, "OPTIMIZE spark_catalog.default.x").collect()
    }
    assert(e.getMessage.contains("ManifestCatalog"), e.getMessage)
  }
}
