package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-13 wave 186: predicate-scoped overwrite — Delta's
  * `replaceWhere`, Spark SQL's `INSERT INTO … REPLACE WHERE cond
  * SELECT …`. One atomic commit rewrites ONLY the stats-admitted
  * files without their matching rows and lands the new data; the rest
  * of the table is untouched bytes. Claims proven here:
  *
  *  - REPLACE WHERE on a key band replaces exactly that region; files
  *    fully outside the band survive by IDENTITY (path equality — the
  *    "replace a region of 100 TB touches the region's files" claim)
  *  - an incoming row NOT matching the predicate fails loudly (the
  *    Delta constraint) and commits nothing
  *  - the statement works through SQL on a transform-laid (hidden
  *    bucket) table — layout columns restore on both halves
  *  - NULL-predicate rows survive (the DELETE rule)
  */
class Wave186Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("REPLACE WHERE replaces exactly the band; outside files " +
    "survive by identity; strays fail loudly") {
    val cat = "w186a"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` " +
      "TBLPROPERTIES ('statsColumns'='k')")
    spark.range(0, 1000).selectExpr("id AS k", "id AS v")
      .repartitionByRange(8, col("id"))
      .createOrReplaceTempView("w186_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w186_src")
    val root = wh.resolve("t")
    val v1 = ManifestTable.latestVersion(root)
    val before = ManifestTable.entriesFor(root, v1)
    assert(before.size >= 4, s"fixture should lay >=4 files, ${before.size}")

    // replace [250, 500) with re-valued rows at 10x density
    spark.range(250, 500).selectExpr("id AS k", "id * 100 AS v")
      .createOrReplaceTempView("w186_repl")
    spark.sql(s"INSERT INTO $cat.t REPLACE WHERE k >= 250 AND k < 500 " +
      "SELECT * FROM w186_repl")
    val v2 = ManifestTable.latestVersion(root)
    assert(v2 == v1 + 1, "replaceWhere must be ONE commit")
    val after = ManifestTable.entriesFor(root, v2)
    // files whose band is fully outside [250,500) survive verbatim
    val outside = before.filter(e => e.band("k").exists {
      case (lo, hi) => hi < 250 || lo >= 500 })
    val afterPaths = after.map(_.path).toSet
    assert(outside.nonEmpty &&
      outside.forall(e => afterPaths.contains(e.path)),
      "band-disjoint files must survive the replace BY IDENTITY")
    // rows: [0,250) ∪ [500,1000) original + replaced region at v*100
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k").collect()
    assert(got.length == 1000)
    assert(got.forall { r =>
      val (k, v) = (r.getLong(0), r.getLong(1))
      if (k >= 250 && k < 500) v == k * 100 else v == k
    }, "replaced region re-valued, rest untouched")

    // a stray row outside the predicate refuses and commits NOTHING
    spark.range(0, 10).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w186_stray")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t REPLACE WHERE k >= 900 " +
        "SELECT * FROM w186_stray")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("satisfy the predicate") ||
        e.getCause != null &&
        e.getCause.getMessage.contains("satisfy the predicate")))
    assert(ManifestTable.latestVersion(root) == v2,
      "a refused replaceWhere must not commit")
  }

  test("REPLACE WHERE composes with hidden bucket layout through SQL") {
    val cat = "w186b"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.h (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('statsColumns'='k')")
    spark.range(0, 800).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w186_hsrc")
    spark.sql(s"INSERT INTO $cat.h SELECT * FROM w186_hsrc")
    spark.range(100, 200).selectExpr("id AS k", "id + 5000 AS v")
      .createOrReplaceTempView("w186_hrepl")
    spark.sql(s"INSERT INTO $cat.h REPLACE WHERE k >= 100 AND k < 200 " +
      "SELECT * FROM w186_hrepl")
    val got = spark.sql(s"SELECT k, v FROM $cat.h ORDER BY k").collect()
    assert(got.length == 800)
    assert(got.forall { r =>
      val (k, v) = (r.getLong(0), r.getLong(1))
      if (k >= 100 && k < 200) v == k + 5000 else v == k
    })
    // both halves carry the restored layout: a point read still prunes
    val root = wh.resolve("h")
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.forall(_.band("__ptb4_k").isDefined),
      "every post-replace file must carry the virtual bucket band")
    assert(spark.sql(s"SELECT v FROM $cat.h WHERE k = 150")
      .head().getLong(0) == 5150L)
  }

  test("rows where the predicate is NULL survive (the DELETE rule)") {
    val cat = "w186c"
    mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.n (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns'='v')")
    spark.sql(s"INSERT INTO $cat.n VALUES (CAST(NULL AS BIGINT), 1), " +
      "(5, 2), (50, 3)")
    spark.sql(s"INSERT INTO $cat.n REPLACE WHERE k >= 10 " +
      "SELECT CAST(77 AS BIGINT) AS k, CAST(9 AS BIGINT) AS v")
    val got = spark.sql(s"SELECT k, v FROM $cat.n ORDER BY v").collect()
    // NULL-k row survives, k=5 survives, k=50 replaced by (77, 9)
    assert(got.length == 3)
    assert(got(0).isNullAt(0) && got(0).getLong(1) == 1L)
    assert(got(1).getLong(0) == 5L && got(1).getLong(1) == 2L)
    assert(got(2).getLong(0) == 77L && got(2).getLong(1) == 9L)
  }
}
