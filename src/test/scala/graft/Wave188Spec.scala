package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-13 wave 188: DYNAMIC partition overwrite — Iceberg's
  * signature overwrite, Spark's `INSERT OVERWRITE` under
  * `partitionOverwriteMode=dynamic`: replace exactly the partitions
  * PRESENT in the source, leave every other partition's bytes
  * untouched. Claims proven here:
  *
  *  - on a bucket-laid table, only the buckets present in the source
  *    are replaced; value-exact files of replaced buckets drop by
  *    METADATA (no rewrite job touches them), and files of absent
  *    buckets survive by path identity
  *  - on a days-laid table, NULL-day rows (the null partition)
  *    survive a day replacement that does not include them — the
  *    band-invisible-nulls case the rewrite filter must respect
  *  - an unpartitioned table under dynamic mode replaces everything
  *    (the Hive/Spark unpartitioned-dynamic rule) through the native
  *    batch write
  */
class Wave188Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  private def withDynamic(body: => Unit): Unit = {
    val k = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "dynamic")
    try body finally prev match {
      case Some(v) => spark.conf.set(k, v)
      case None => spark.conf.unset(k)
    }
  }

  test("bucket table: only source-present buckets replaced; absent " +
    "buckets survive by identity") {
    val cat = "w188b"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, k))")
    spark.range(0, 800).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w188_base")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w188_base")
    val root = wh.resolve("t")
    val v1 = ManifestTable.latestVersion(root)
    val before = ManifestTable.entriesFor(root, v1)
    assert(before.size == 8, s"8 bucket-exact files expected, ${before.size}")

    // source holds keys 0 and 1 only → exactly 2 buckets replaced
    spark.sql(s"SELECT CAST(id AS BIGINT) AS k, id + 900 AS v " +
      "FROM range(0, 2)").createOrReplaceTempView("w188_repl")
    withDynamic {
      spark.sql(s"INSERT OVERWRITE $cat.t SELECT * FROM w188_repl")
    }
    val v2 = ManifestTable.latestVersion(root)
    assert(v2 == v1 + 1, "dynamic overwrite must be ONE commit")
    val after = ManifestTable.entriesFor(root, v2)
    val afterPaths = after.map(_.path).toSet
    val replBuckets = Set(0L, 1L).map(k =>
      java.lang.Math.floorMod(org.apache.spark.sql.catalyst.expressions
        .XXH64.hashLong(k, 42L), 8L))
    val (replaced, untouched) = before.partition(e =>
      e.band("__ptb8_k").exists(b => replBuckets.contains(b._1)))
    assert(untouched.forall(e => afterPaths.contains(e.path)),
      "files of absent buckets must survive BY IDENTITY")
    assert(replaced.forall(e => !afterPaths.contains(e.path)),
      "files of present buckets must be dropped")
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k, v").collect()
    // rows of the two replaced buckets are gone wholesale; the two
    // new rows stand in their place
    val expected = (0L until 800L)
      .filterNot(k => replBuckets.contains(java.lang.Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(k, 42L),
        8L)))
      .map(k => (k, k)) ++ Seq((0L, 900L), (1L, 901L))
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      expected.sortBy(identity))
  }

  test("days table: the NULL partition survives a day replacement " +
    "that does not include it") {
    val cat = "w188n"
    mkCatalog(cat)
    val day = 86400000000L
    spark.sql(s"CREATE TABLE $cat.d (day_us BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (days(day_us))")
    spark.sql(s"INSERT INTO $cat.d VALUES " +
      s"(0, 1), (${day}, 2), (CAST(NULL AS BIGINT), 3)")
    withDynamic {
      // replaces ONLY day 0
      spark.sql(s"INSERT OVERWRITE $cat.d " +
        "SELECT CAST(0 AS BIGINT) AS day_us, CAST(10 AS BIGINT) AS v")
    }
    val got = spark.sql(s"SELECT day_us, v FROM $cat.d ORDER BY v")
      .collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == day && got(0).getLong(1) == 2L)
    assert(got(1).isNullAt(0) && got(1).getLong(1) == 3L,
      "the null-day row must survive a day-0 replacement")
    assert(got(2).getLong(0) == 0L && got(2).getLong(1) == 10L)
  }

  test("unpartitioned table under dynamic mode replaces everything") {
    val cat = "w188u"
    mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.p (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.p VALUES (1, 1), (2, 2)")
    withDynamic {
      spark.sql(s"INSERT OVERWRITE $cat.p VALUES " +
        "(CAST(7 AS BIGINT), CAST(7 AS BIGINT))")
    }
    val got = spark.sql(s"SELECT k, v FROM $cat.p").collect()
    assert(got.length == 1 && got(0).getLong(0) == 7L)
  }
}
