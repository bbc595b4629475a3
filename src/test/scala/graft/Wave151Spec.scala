package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import graft.sources.ManifestRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo

/** Round-10 wave 151: hidden partitioning through SQL DDL —
  * `PARTITIONED BY (bucket(n, c) / truncate(w, c) / days(c))` on the
  * catalog composes the wave-142 SQL surface with the wave-147
  * transform layout. Claims proven here:
  *
  *  - CREATE TABLE … PARTITIONED BY records the transforms in ptrans=
  *    meta; plain SQL INSERTs lay files out by the transform tuple
  *    with virtual per-file stats (no per-write options)
  *  - a plain equality SELECT through the catalog prunes to a small
  *    fraction of the files (admittedEntries counter)
  *  - non-BIGINT transform columns are rejected at CREATE; unknown
  *    transforms are rejected; days()/truncate() DDL forms parse
  *  - renaming a transform source column fails loudly (the derivation
  *    and write layout key on its name)
  */
class Wave151Spec extends SparkSpec {

  private def freshCatalog(tag: String): String = {
    val wh = Files.createTempDirectory(s"graft_w151_$tag")
    val cat = s"w151$tag"
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    cat
  }

  private def rootOf(cat: String, table: String) =
    java.nio.file.Paths.get(
      spark.conf.get(s"spark.sql.catalog.$cat.warehouse"), table)

  test("CREATE PARTITIONED BY bucket + SQL INSERT = transform-laid " +
    "files, and a plain equality SELECT prunes through the layout") {
    val cat = freshCatalog("bkt")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, c BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(16, c))")
    val root = rootOf(cat, "t")
    assert(ManifestTable.partTransforms(root, 1).map(_.meta) ==
      Seq("bucket(16,c)"), "CREATE did not record the transform")
    spark.range(0, 4000).selectExpr("id AS k", "id * 7 AS c")
      .repartitionByRange(8, col("k"))
      .createOrReplaceTempView("w151_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w151_src")
    val v = ManifestTable.latestVersion(root)
    val es = ManifestTable.entriesFor(root, v)
    assert(es.size >= 4 && es.forall(_.band("__ptb16_c").isDefined),
      s"INSERT files missing transform stats: $es")
    // the catalog SELECT path (V2 -> V1 bridge) derives the band
    val schema = spark.table(s"$cat.t").schema
    val target = 777L * 7L
    val admitted = new ManifestRelation(spark.sqlContext, root, v, schema)
      .admittedEntries(Array(EqualTo("c", target)))
    assert(admitted.size <= math.max(1, es.size / 4),
      s"bucket equality admitted ${admitted.size}/${es.size}")
    val got = spark.sql(s"SELECT k FROM $cat.t WHERE c = $target")
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(777L))
  }

  test("days()/truncate() DDL forms parse; non-BIGINT and unknown " +
    "transforms are rejected at CREATE") {
    val cat = freshCatalog("ddl")
    spark.sql(s"CREATE TABLE $cat.d (ts_us BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (days(ts_us))")
    assert(ManifestTable.partTransforms(rootOf(cat, "d"), 1)
      .map(_.meta) == Seq("days(ts_us)"))
    spark.sql(s"CREATE TABLE $cat.tr (k BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (truncate(1000, k))")
    assert(ManifestTable.partTransforms(rootOf(cat, "tr"), 1)
      .map(_.meta) == Seq("truncate(1000,k)"))
    val notLong = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad (s STRING) " +
        "USING `graft-manifest` PARTITIONED BY (bucket(4, s))")
    }
    assert(notLong.getMessage.contains("BIGINT"),
      s"expected the type rejection: ${notLong.getMessage}")
    val unknown = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad2 (k BIGINT) " +
        "USING `graft-manifest` PARTITIONED BY (years(k))")
    }
    assert(unknown.getMessage.contains("bucket"),
      s"expected the unsupported-transform error: ${unknown.getMessage}")
  }

  test("renaming a transform source column fails loudly; renaming " +
    "any other column still works") {
    val cat = freshCatalog("ren")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, c BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, c))")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN c TO c2")
    }
    assert(e.getMessage.contains("ptrans"),
      s"expected the transform-source guard: ${e.getMessage}")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN k TO key")
    // a write onto the now-MAPPED transform table WORKS since round
    // 13 (the native batch write renames the file schema to physical
    // names — the V1 bridge used to refuse this outright): rows land
    // laid-out and read back under the LOGICAL name
    spark.range(3).selectExpr("id AS key", "id AS c")
      .createOrReplaceTempView("w151_ren_src")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM w151_ren_src")
    val got = spark.sql(s"SELECT key, c FROM $cat.t ORDER BY key")
      .collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 1L), (2L, 2L)),
      "the mapped-table write must read back under logical names")
  }
}
