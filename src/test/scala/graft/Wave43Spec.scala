package graft

import org.apache.spark.sql.functions._

/** Round-7 wave 43: the LSH operating-point sweep and the multi-signal
  * dedup audit report — invariants that hold regardless of the oracle.
  */
class Wave43Spec extends SparkSpec {

  test("dedup_lsh_tuning: recall/candidates monotone in bands; bounds") {
    val rows = q("dedup_lsh_tuning").orderBy("bands").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("bands")).toSeq == Seq(2L, 4L, 8L))
    assert(rows.map(_.getAs[Long]("rows_per_band")).toSeq == Seq(8L, 4L, 2L))
    // every config: confirmed ⊆ candidates and confirmed ⊆ truth
    rows.foreach { r =>
      val (cand, conf, tru) = (r.getAs[Long]("n_cand"),
        r.getAs[Long]("n_conf"), r.getAs[Long]("n_true"))
      assert(tru > 0, "truth set must be non-degenerate on the fixtures")
      assert(conf <= cand && conf <= tru)
      val rec = r.getAs[Double]("recall")
      val prec = r.getAs[Double]("precision")
      assert(rec >= 0.0 && rec <= 1.0 && prec >= 0.0 && prec <= 1.0)
    }
    // more bands with fewer rows per band ⇒ a superset of band-collision
    // candidates is NOT guaranteed pairwise, but recall and candidate
    // volume must be non-decreasing in expectation — and on these
    // fixtures (extreme baseline similarity) strictly hold
    val byBands = rows.map(r => (r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_conf")))
    assert(byBands(0)._1 <= byBands(1)._1 && byBands(1)._1 <= byBands(2)._1,
      s"candidate volume should grow with band count: $byBands")
    assert(byBands(0)._2 <= byBands(1)._2 && byBands(1)._2 <= byBands(2)._2,
      s"confirmed pairs should grow with band count: $byBands")
  }

  test("dedup_lsh_tuning: confirmed-pair count matches a brute-force " +
      "recount at one config") {
    // independent truth: all same-source pairs with unigram-token
    // Jaccard >= 0.8, computed by plain Scala set ops
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSet))
    val truth = (for {
      a <- docs; b <- docs
      if a._2 == b._2 && a._1 < b._1
      i = (a._3 & b._3).size
      u = (a._3 | b._3).size
      j = math.floor(i.toDouble / u * 1e6 + 0.5) / 1e6
      if j >= 0.8
    } yield 1).size.toLong
    val row = q("dedup_lsh_tuning").orderBy("bands").collect()
    assert(row.head.getAs[Long]("n_true") == truth,
      s"n_true=${row.head.getAs[Long]("n_true")} brute=$truth")
  }

  test("dedup_explain: signals agree with brute force on every pair") {
    val df = q("dedup_explain")
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .toMap
    val rows = df.collect()
    assert(rows.nonEmpty)
    def r6(x: Double) =
      if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
      else -math.floor(-x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val ta = docs(a).split(" ", -1).toSet
      val tb = docs(b).split(" ", -1).toSet
      val i = (ta & tb).size.toDouble
      assert(r.getAs[Double]("tok_jaccard") == r6(i / (ta | tb).size))
      assert(r.getAs[Double]("cont_a") == r6(i / ta.size))
      assert(r.getAs[Double]("cont_b") == r6(i / tb.size))
      assert(r.getAs[Boolean]("exact_dup") == (docs(a) == docs(b)))
      val h = r.getAs[Long]("sim_hamming")
      assert(h >= 0 && h <= 48)
      // the verdict is a pure function of the emitted signal columns
      val expect =
        if (r.getAs[Boolean]("exact_dup")) "exact"
        else if (r.getAs[Double]("jaccard3") >= 0.8) "near"
        else if (math.max(r.getAs[Double]("cont_a"),
          r.getAs[Double]("cont_b")) >= 0.9) "contained"
        else if (h <= 12) "templated"
        else "weak"
      assert(r.getAs[String]("verdict") == expect)
    }
  }

  test("dedup_explain: exact duplicates score 1.0 on every set signal") {
    q("dedup_explain").filter(col("exact_dup")).collect().foreach { r =>
      assert(r.getAs[Double]("tok_jaccard") == 1.0)
      assert(r.getAs[Long]("sim_hamming") == 0L)
    }
  }
}
