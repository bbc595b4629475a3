package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.plans.GraftSql

/** Round-13 wave 192: TAGS — Iceberg's named immutable refs. Claims
  * proven here:
  *
  *  - CALL create_tag + `VERSION AS OF 'name'` reads the tagged
  *    snapshot; a duplicate create refuses (tags are immutable);
  *    drop_tag + re-create re-points
  *  - log expiry RETAINS tagged snapshots: expire_manifests clamps
  *    its horizon to the oldest tag, and the tagged version stays
  *    readable afterwards
  *  - the `t.tags` metadata table lists the refs; an unknown tag
  *    name fails loudly naming the known set
  */
class Wave192Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("create_tag + VERSION AS OF 'name'; duplicates refuse; " +
    "drop re-points") {
    val cat = "w192t"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns'='k')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 1), (2, 2)")
    spark.sql(s"DELETE FROM $cat.t WHERE k = 1")
    GraftSql.sql(spark,
      s"CALL $cat.system.create_tag($cat.t, 'pre_delete', 2)").collect()
    val tagged = spark.sql(
      s"SELECT k FROM $cat.t VERSION AS OF 'pre_delete' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(tagged == Seq(1L, 2L), "the tag must pin the pre-delete rows")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 1L)
    val dup = intercept[Exception] {
      GraftSql.sql(spark,
        s"CALL $cat.system.create_tag($cat.t, 'pre_delete', 3)")
        .collect()
    }
    assert(dup.getMessage.contains("immutable"),
      s"duplicate create must refuse: ${dup.getMessage}")
    GraftSql.sql(spark,
      s"CALL $cat.system.drop_tag($cat.t, 'pre_delete')").collect()
    GraftSql.sql(spark,
      s"CALL $cat.system.create_tag($cat.t, 'pre_delete', 3)").collect()
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.t VERSION AS OF 'pre_delete'")
      .head().getLong(0) == 1L, "drop + create must re-point")
    val unknown = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'nope'").collect()
    }
    assert(unknown.getMessage.contains("pre_delete"),
      s"unknown tag must name the known set: ${unknown.getMessage}")
  }

  test("log expiry retains tagged snapshots; t.tags lists refs") {
    val cat = "w192e"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT) USING `graft-manifest`")
    (1 to 4).foreach(i =>
      spark.sql(s"INSERT INTO $cat.t VALUES (CAST($i AS BIGINT))"))
    val root = wh.resolve("t")
    assert(ManifestTable.latestVersion(root) == 5)
    GraftSql.sql(spark,
      s"CALL $cat.system.create_tag($cat.t, 'keep_me', 2)").collect()
    // ask to expire below v4 — the tag at v2 clamps the horizon
    GraftSql.sql(spark,
      s"CALL $cat.system.expire_manifests($cat.t, 4)").collect()
    val got = spark.sql(
      s"SELECT k FROM $cat.t VERSION AS OF 'keep_me' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), "the tagged snapshot must survive expiry")
    val tags = spark.sql(s"SELECT tag, version FROM $cat.t.tags")
      .collect()
    assert(tags.length == 1 && tags(0).getString(0) == "keep_me" &&
      tags(0).getLong(1) == 2L)
    // dropping the tag frees the horizon: the next expiry truncates
    GraftSql.sql(spark,
      s"CALL $cat.system.drop_tag($cat.t, 'keep_me')").collect()
    GraftSql.sql(spark,
      s"CALL $cat.system.expire_manifests($cat.t, 4)").collect()
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 4L, "the live table reads on after the freed expiry")
  }
}
