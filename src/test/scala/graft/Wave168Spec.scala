package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.plans.GraftSql
import org.apache.spark.sql.functions._

/** Round-12 wave 168 — r11-VERDICT task 5: the `CALL` procedure
  * surface. Claims proven here:
  *
  *  - CALL build_bloom_index builds the exact index the API builds
  *    (sidecar meta present, point-read admission shrinks)
  *  - CALL expire_manifests truncates the log (firstVersion advances,
  *    pre-horizon versions die)
  *  - CALL replicate lands the source's LOGICAL view — deletion
  *    vectors subtracted — as the destination's next checkpoint, with
  *    stat coverage translated
  *  - unknown procedures and malformed argument lists fail loudly
  */
class Wave168Spec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val cat = s"w168$tag"
    val wh = Files.createTempDirectory(s"graft_w168_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  test("CALL build_bloom_index + expire_manifests drive the API " +
    "primitives; unknown procedures fail loudly") {
    val cat = freshCatalog("bx")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, u BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.range(0, 800)
      .selectExpr("id AS k", "(id * 2654435761) % 2000 AS u")
      .repartitionByRange(4, col("k"))
      .createOrReplaceTempView("w168_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w168_src")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val root = java.nio.file.Paths.get(wh, "t")
    val v = GraftSql.sql(spark,
      s"CALL $cat.system.build_bloom_index($cat.t, 'u')")
      .head().getString(0).toInt
    assert(v == ManifestTable.latestVersion(root))
    assert(ManifestTable.bloomsFor(root, v).nonEmpty,
      "CALL must land the bloom= sidecar meta")
    val probe = (5L * 2654435761L) % 2000L
    assert(ManifestTable.bloomAdmitted(root, v, "u", probe).size <=
      ManifestTable.filesFor(root, v).size)
    // expire: two checkpoints exist (CREATE's empty commit is v1);
    // a second INSERT then an expiry at the latest checkpoint
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w168_src")
    val latest = ManifestTable.latestVersion(root)
    // make the head a checkpoint so everything below is expendable
    ManifestTable.commit(root,
      ManifestTable.entriesFor(root, latest).map(_.line))
    val dead = GraftSql.sql(spark,
      s"CALL $cat.system.expire_manifests($cat.t, " +
      s"${ManifestTable.latestVersion(root)})").count()
    assert(dead >= 1, s"expiry must delete manifests, got $dead")
    assert(ManifestTable.firstVersion(root) ==
      ManifestTable.latestVersion(root))
    // loud contracts
    val e1 = intercept[UnsupportedOperationException] {
      GraftSql.sql(spark, s"CALL $cat.system.frobnicate($cat.t)")
        .collect()
    }
    assert(e1.getMessage.contains("unknown procedure"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CALL $cat.system.build_bloom_index($cat.t)").collect()
    }
    assert(e2.getMessage.contains("build_bloom_index takes"),
      e2.getMessage)
  }

  test("CALL replicate lands the source's DV-subtracted logical view " +
    "with translated stat coverage") {
    val cat = freshCatalog("rp")
    spark.sql(s"CREATE TABLE $cat.src (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'k')")
    spark.sql(s"CREATE TABLE $cat.dst (k BIGINT, v BIGINT) " +
      "USING `graft-manifest`")
    spark.range(0, 300).selectExpr("id AS k", "id * 2 AS v")
      .repartitionByRange(3, col("k"))
      .createOrReplaceTempView("w168_rsrc")
    spark.sql(s"INSERT INTO $cat.src SELECT * FROM w168_rsrc")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val srcRoot = java.nio.file.Paths.get(wh, "src")
    val dstRoot = java.nio.file.Paths.get(wh, "dst")
    // outstanding key vector on the source: the replica must NOT
    // carry the deleted rows (logical-view replication)
    ManifestTable.deleteMOR(srcRoot,
      spark.range(0, 300).filter(col("id") % 10 === 0)
        .selectExpr("id AS k"))
    val v = GraftSql.sql(spark,
      s"CALL $cat.system.replicate($cat.src, $cat.dst)")
      .head().getString(0).toInt
    assert(v == ManifestTable.latestVersion(dstRoot))
    val got = spark.sql(s"SELECT k, v FROM $cat.dst ORDER BY k").collect()
    assert(got.length == 270 && got.forall(_.getLong(0) % 10 != 0),
      s"replica must be the DV-subtracted view: ${got.length}")
    // stat coverage translated: the replica's files carry k bounds
    val entries = ManifestTable.entriesFor(dstRoot, v)
    assert(entries.nonEmpty && entries.forall(_.band("k").isDefined),
      s"replicated files must carry k stats: $entries")
    // self-replication is rejected
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CALL $cat.system.replicate($cat.src, $cat.src)").collect()
    }
    assert(e.getMessage.contains("itself"), e.getMessage)
  }
}
