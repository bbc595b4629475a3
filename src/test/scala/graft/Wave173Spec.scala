package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-12 wave 173: the remaining SQL DDL surfaces DECLARED —
  * CTAS / RTAS and ALTER TABLE column evolution. Claims proven here:
  *
  *  - CREATE TABLE … AS SELECT lands schema + rows in one statement
  *    (createTable + the V1 write bridge); REPLACE TABLE … AS SELECT
  *    swaps contents AND schema
  *  - ALTER TABLE RENAME/ADD COLUMN are metadata-only commits
  *    (pre-evolution files survive by path, read aliased/null-filled)
  *  - DROP COLUMN projects the column away with zero rewrites
  */
class Wave173Spec extends SparkSpec {

  private def freshCatalog(tag: String): (String, java.nio.file.Path) = {
    val cat = s"w173$tag"
    val wh = Files.createTempDirectory(s"graft_w173_$tag")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    (cat, wh)
  }

  test("CTAS lands schema + rows; RTAS replaces contents and schema") {
    val (cat, wh) = freshCatalog("ct")
    spark.sql(s"CREATE TABLE $cat.t USING `graft-manifest` AS " +
      "SELECT id AS k, id * 2 AS v FROM range(100)")
    val root = wh.resolve("t")
    assert(ManifestTable.latestVersion(root) == 2,
      "CTAS = schema commit + one insert commit")
    assert(spark.sql(s"SELECT sum(v) FROM $cat.t").head().getLong(0) ==
      (0L until 100).map(_ * 2).sum)
    spark.sql(s"REPLACE TABLE $cat.t USING `graft-manifest` AS " +
      "SELECT id AS k, concat('s', id) AS tag FROM range(10)")
    val got = spark.sql(s"SELECT k, tag FROM $cat.t ORDER BY k").collect()
    assert(got.length == 10 && got.head.getString(1) == "s0",
      "RTAS must swap contents AND schema")
  }

  test("ALTER TABLE RENAME/ADD COLUMN are metadata-only; DROP COLUMN " +
    "projects away") {
    val (cat, wh) = freshCatalog("al")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, price DOUBLE, " +
      "extra BIGINT) USING `graft-manifest` " +
      "TBLPROPERTIES ('statsColumns' = 'k')")
    spark.sql(s"INSERT INTO $cat.t " +
      "SELECT id, cast(id AS double), id * 7 FROM range(50)")
    val root = wh.resolve("t")
    val filesBefore = ManifestTable.filesFor(root,
      ManifestTable.latestVersion(root)).toSet
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN price TO amount")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN flag BIGINT")
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN extra")
    val latest = ManifestTable.latestVersion(root)
    assert(ManifestTable.filesFor(root, latest).toSet == filesBefore,
      "the three DDLs must rewrite ZERO data files")
    val got = spark.sql(s"SELECT k, amount, flag FROM $cat.t ORDER BY k")
      .collect()
    assert(got.length == 50 &&
      got.forall(r => r.getDouble(1) == r.getLong(0).toDouble &&
        r.isNullAt(2)),
      "renamed column aliases, added column null-fills")
    assert(!spark.table(s"$cat.t").columns.contains("extra"),
      "dropped column must leave the logical schema")
    // an INSERT after the evolution writes physical names + the flag
    spark.sql(s"INSERT INTO $cat.t SELECT id, cast(id AS double), " +
      "id % 5 FROM range(50, 60)")
    val post = spark.sql(
      s"SELECT k, amount, flag FROM $cat.t WHERE k >= 50 ORDER BY k")
      .collect()
    assert(post.length == 10 && post.forall(r =>
      r.getLong(2) == r.getLong(0) % 5),
      "post-evolution inserts carry the added column")
  }
}
