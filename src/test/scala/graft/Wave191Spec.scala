package graft

import java.nio.file.Files

import graft.operators.ManifestTable

/** Round-13 wave 191: write SORT ORDER — the `sortOrder` table
  * property (Iceberg's write.sort-order): inserts range-cluster by
  * (layout transforms, sort columns), so per-file bands on the sort
  * columns come out narrow and near-disjoint — the band-prune payoff
  * without any layout transform. Claims proven here:
  *
  *  - a plain table with sortOrder commits files whose sort-column
  *    bands are near-disjoint (total overlap-free span ≈ the domain),
  *    while the same insert without sortOrder commits full-span files
  *  - a point read on the sorted table admits ~1 file (physical skip)
  *  - sortOrder composes with a bucket layout: files stay
  *    bucket-exact AND sort-banded
  */
class Wave191Spec extends SparkSpec {

  private def mkCatalog(name: String): java.nio.file.Path = {
    val wh = Files.createTempDirectory(s"graft_$name")
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh.toString)
    wh
  }

  test("sortOrder lays near-disjoint bands; the unsorted twin " +
    "spans the domain") {
    val cat = "w191s"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.s (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES " +
      "('statsColumns'='k', 'sortOrder'='k', 'writeFiles'='8')")
    spark.sql(s"CREATE TABLE $cat.u (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` TBLPROPERTIES ('statsColumns'='k')")
    // a SHUFFLED source: every input partition spans the whole domain
    spark.range(0, 8000).selectExpr("id AS k", "id AS v")
      .repartition(8).createOrReplaceTempView("w191_src")
    spark.sql(s"INSERT INTO $cat.s SELECT * FROM w191_src")
    spark.sql(s"INSERT INTO $cat.u SELECT * FROM w191_src")

    def spans(t: String): Seq[(Long, Long)] = {
      val root = wh.resolve(t)
      ManifestTable.entriesFor(root, ManifestTable.latestVersion(root))
        .flatMap(_.band("k"))
    }
    val sorted = spans("s")
    val unsorted = spans("u")
    assert(sorted.size >= 4)
    val avgSorted = sorted.map { case (lo, hi) => hi - lo }.sum /
      sorted.size
    val avgUnsorted = unsorted.map { case (lo, hi) => hi - lo }.sum /
      unsorted.size
    assert(avgSorted * 2 < avgUnsorted,
      s"sorted files must carry far narrower bands " +
      s"($avgSorted vs $avgUnsorted)")
    // near-disjoint: sorted bands do not overlap
    val s2 = sorted.sortBy(_._1)
    assert(s2.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => h1 <= l2
      case _ => true
    }, s"sorted bands must be disjoint: $s2")
    // a point read physically admits fewer files on the sorted table
    val got = spark.sql(s"SELECT v FROM $cat.s WHERE k = 4321")
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(4321L))
  }

  test("sortOrder composes with a bucket layout: bucket-exact AND " +
    "sort-banded") {
    val cat = "w191b"
    val wh = mkCatalog(cat)
    spark.sql(s"CREATE TABLE $cat.b (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(2, k)) " +
      "TBLPROPERTIES ('statsColumns'='v', 'sortOrder'='v', " +
      "'writeFiles'='8')")
    spark.range(0, 4000).selectExpr("id AS k", "id % 1000 AS v")
      .repartition(8).createOrReplaceTempView("w191_bsrc")
    spark.sql(s"INSERT INTO $cat.b SELECT * FROM w191_bsrc")
    val root = wh.resolve("b")
    val entries = ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root))
    assert(entries.forall(_.band("__ptb2_k").exists(b => b._1 == b._2)),
      "every file must stay bucket-exact under the sort suffix")
    // multiple files per bucket, v-banded within each bucket
    val perBucket = entries.groupBy(_.band("__ptb2_k").get._1)
    assert(perBucket.values.exists(_.size > 1),
      "the sort suffix should split hot buckets into several files")
    perBucket.values.foreach { es =>
      val bands = es.flatMap(_.band("v")).sortBy(_._1)
      assert(bands.sliding(2).forall {
        case Seq((_, h1), (l2, _)) => h1 <= l2
        case _ => true
      }, s"per-bucket v bands must be disjoint: $bands")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.b").head().getLong(0)
      == 4000L)
  }
}
