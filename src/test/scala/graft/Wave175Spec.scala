package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.plans.GraftSql
import org.apache.spark.sql.functions._

/** Round-12 wave 175: `CALL gm.system.compact_mor` — the SQL form of
  * the mandatory pre-rewrite vector materialization. Claims proven:
  *
  *  - key-vector tables compact via the CALL (vectors cleared, rows
  *    = the subtracted view, OPTIMIZE legal again afterwards)
  *  - the dispatch picks the POSITIONAL compactor for dvr= tables
  *  - a vector-less table fails loudly toward OPTIMIZE
  */
class Wave175Spec extends SparkSpec {

  private def freshCatalog(tag: String): (String, java.nio.file.Path) = {
    val cat = s"w175$tag"
    val wh = Files.createTempDirectory(s"graft_w175_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("compact_mor materializes a key-vector table; OPTIMIZE legal " +
    "after; vector-less tables fail loudly") {
    val (cat, wh) = freshCatalog("kv")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.range(0, 300).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w175_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w175_src")
    val root = wh.resolve("t")
    ManifestTable.deleteMOR(root,
      spark.range(0, 300).filter(col("id") % 5 === 0).selectExpr("id AS k"))
    val v = GraftSql.sql(spark,
      s"CALL $cat.system.compact_mor($cat.t, 'k', 2)")
      .head().getString(0).toInt
    assert(ManifestTable.dvsFor(root, v).isEmpty, "vectors must clear")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 240)
    // OPTIMIZE is legal again (it refuses DV-carrying snapshots)
    GraftSql.sql(spark, s"OPTIMIZE $cat.t").collect()
    // a second compact_mor has nothing to do — loud toward OPTIMIZE
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CALL $cat.system.compact_mor($cat.t, 'k', 2)").collect()
    }
    assert(e.getMessage.contains("OPTIMIZE"), e.getMessage)
  }

  test("compact_mor dispatches to the positional compactor for dvr= " +
    "tables") {
    val (cat, wh) = freshCatalog("pos")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.range(0, 100).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w175_psrc")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w175_psrc")
    val root = wh.resolve("t")
    val f = ManifestTable.filesFor(root,
      ManifestTable.latestVersion(root)).head
    ManifestTable.deleteMORPositional(spark, root,
      spark.range(0, 3).selectExpr(s"'$f' AS src", "id AS pos"))
    assert(ManifestTable.rowDvsFor(root,
      ManifestTable.latestVersion(root)).nonEmpty)
    val before = spark.sql(s"SELECT count(*) FROM $cat.t")
      .head().getLong(0)
    val v = GraftSql.sql(spark,
      s"CALL $cat.system.compact_mor($cat.t, 'k', 1)")
      .head().getString(0).toInt
    assert(ManifestTable.rowDvsFor(root, v).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == before, s"row count must be stable across the compaction")
    assert(before == 97)
  }
}
