package graft

import java.nio.file.Files

import graft.operators.ManifestTable

/** Round-13 wave 193: CHECK constraints — Delta's table constraints
  * as `check.<name>` properties, SQL-standard semantics (violation =
  * predicate FALSE; NULL passes). Claims proven here:
  *
  *  - a violating INSERT through the V1 path refuses and commits
  *    nothing; a conforming one lands
  *  - the native (transform-laid) write path enforces too, deleting
  *    its staged files on violation — no orphan live data
  *  - NULL predicate values PASS (the CHECK rule)
  *  - ALTER TABLE SET a constraint the existing rows violate refuses;
  *    one they satisfy lands and is enforced on the next write
  *  - an unresolvable predicate names itself loudly
  */
class Wave193Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("V1 path: violating INSERT refuses whole; NULL passes") {
    val cat = "w193a"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` " +
      "TBLPROPERTIES ('check.positive' = 'v > 0')")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 10), " +
      "(2, CAST(NULL AS BIGINT))") // NULL passes — the CHECK rule
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (3, 5), (4, -1)")
    }
    assert((e.getMessage != null && e.getMessage.contains("positive"))
      || (e.getCause != null &&
        e.getCause.getMessage.contains("positive")),
      s"violation must name the constraint: ${e.getMessage}")
    val root = wh.resolve("t")
    assert(ManifestTable.latestVersion(root) == 2,
      "a refused INSERT must not commit")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 2L)
  }

  test("native path: violation deletes staged files, commits nothing") {
    val cat = "w193n"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('check.small' = 'v < 100')")
    spark.range(0, 40).selectExpr("id AS k", "id AS v")
      .createOrReplaceTempView("w193_ok")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM w193_ok")
    val root = wh.resolve("b")
    val v2 = ManifestTable.latestVersion(root)
    val liveBefore = ManifestTable.filesFor(root, v2).toSet
    spark.range(0, 40).selectExpr("id AS k", "id * 10 AS v")
      .createOrReplaceTempView("w193_bad")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.b SELECT * FROM w193_bad")
    }
    assert(e.getMessage.contains("small") ||
      (e.getCause != null && e.getCause.getMessage.contains("small")))
    assert(ManifestTable.latestVersion(root) == v2,
      "a refused native write must not commit")
    // no orphan staged files beyond the live set
    val onDisk = {
      val s = Files.list(root.resolve("data"))
      try {
        import scala.jdk.CollectionConverters._
        // ignore Hadoop local-FS .crc checksum artifacts — filesystem
        // noise, not data
        s.iterator().asScala.map(_.getFileName.toString)
          .filterNot(_.startsWith(".")).toSet
      } finally s.close()
    }
    assert(onDisk == liveBefore,
      s"staged files of the refused write must be deleted: " +
      s"${onDisk -- liveBefore}")
  }

  test("ALTER SET: a constraint the data violates refuses; a " +
    "satisfied one lands and enforces") {
    val cat = "w193s"
    mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT) USING `graft-manifest`")
    spark.sql(s"INSERT INTO $cat.t VALUES (5), (50)")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t " +
        "SET TBLPROPERTIES ('check.low' = 'k < 10')")
    }
    assert(e.getMessage.contains("low") ||
      (e.getCause != null && e.getCause.getMessage.contains("low")))
    spark.sql(s"ALTER TABLE $cat.t " +
      "SET TBLPROPERTIES ('check.low' = 'k < 100')")
    val w = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (500)")
    }
    assert(w.getMessage.contains("low") ||
      (w.getCause != null && w.getCause.getMessage.contains("low")),
      "the landed constraint must enforce on the next write")
    // an unresolvable predicate names itself
    val bad = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t " +
        "SET TBLPROPERTIES ('check.ghost' = 'no_such_col > 0')")
    }
    assert(bad.getMessage.contains("ghost") ||
      (bad.getCause != null && bad.getCause.getMessage.contains("ghost")))
  }
}
