package graft

import org.apache.spark.sql.functions._

/** Group I specs — dedup/similarity/multimodal invariants (SURVEY.md §5.2.3,
  * §5.5): properties that hold regardless of the oracle.
  */
class LlmOpsSpec extends SparkSpec {

  test("dedup_exact group sizes sum to doc count") {
    val df = q("dedup_exact")
    assert(df.agg(sum("n_dup")).head().getLong(0) ==
      Tables.table(spark, sfDir, "documents").count())
  }

  test("minhash candidates achieve high recall on true near-dups") {
    // every Jaccard ≥ 0.9 same-source pair should be caught by ≥1 band
    // with high probability (P(miss) = (1-J^8)^2 ≤ 0.1 at J=0.9)
    val exact = q("dedup_jaccard").filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")
    val cand = q("dedup_minhash").select("doc_a", "doc_b")
    val missed = exact.except(cand).count()
    val total = exact.count()
    assert(total == 0 || missed.toDouble / total < 0.3,
      s"minhash missed $missed of $total J>=0.9 pairs")
  }

  test("simhash: hamming within [0, threshold], sane pair ids") {
    val df = q("dedup_simhash")
    assert(df.count() > 0)
    assert(df.filter(col("hamming") < 0 || col("hamming") > 12).count() == 0,
      "declared threshold is 12")
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("knn_cosine: top-20 bounded by [-1,1], strictly ordered") {
    val rows = q("knn_cosine").collect()
    assert(rows.length == 20)
    val sims = rows.map(_.getAs[Double]("cosine"))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(sims.sameElements(sims.sortBy(-(_: Double))))
    rows.foreach(r => assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("knn_ivf pairs really share an LSH bucket") {
    // recompute each vector's bucket independently and check every
    // emitted pair agrees on it
    val buckets = Tables.table(spark, sfDir, "embeddings").collect()
      .map { r =>
        val e = r.getAs[scala.collection.Seq[Float]]("embedding")
        val b = (0 to 7).map(i => if (e(i) > e(i + 32)) 1L << i else 0L).sum
        r.getAs[Long]("vec_id") -> b
      }.toMap
    val ivf = q("knn_ivf").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(a < b)
      assert(buckets(a) == buckets(b), s"pair ($a,$b) crosses buckets")
      assert(r.getAs[Long]("bucket") == buckets(a))
    }
  }

  test("dedup_embed_cosine: above threshold, superset of knn top pairs ≥ 0.4") {
    val df = q("dedup_embed_cosine")
    assert(df.filter(col("cosine") < 0.4).count() == 0)
    assert(df.count() > 0)
    val embPairs = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val knnHigh = q("knn_cosine").filter(col("cosine") >= 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(knnHigh.subsetOf(embPairs),
      "every top-20 pair at ≥0.4 must appear in the near-dup set")
  }

  test("centroid outliers: distances positive and descending") {
    val d = q("knn_centroid_dist").collect().map(_.getAs[Double]("dist"))
    assert(d.forall(_ > 0))
    assert(d.sameElements(d.sortBy(-(_: Double))))
  }

  test("multimodal_features: deterministic, fixed-width, full coverage") {
    val a = q("multimodal_features").collect()
    val b = q("multimodal_features").collect()
    assert(a.length == Tables.table(spark, sfDir, "documents").count())
    assert(a.length == b.length, "row count must be stable across runs")
    assert(a.zip(b).forall { case (x, y) => x == y }, "decode stub must be deterministic")
    a.foreach { r =>
      (0 until 8).foreach(i => assert(!r.isNullAt(r.fieldIndex(s"f$i"))))
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(Set("image", "audio", "video")(r.getAs[String]("media_type")))
    }
  }

  test("multimodal_frame_sample: every 4th frame, deterministic crcs") {
    val df = q("multimodal_frame_sample")
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("frame_no") % 4 =!= 0).count() == 0)
    assert(df.filter(col("frame_bytes") > 64 || col("frame_bytes") <= 0).count() == 0)
    val a = df.collect()
    val b = q("multimodal_frame_sample").collect()
    assert(a.length == b.length, "row count must be stable across runs")
    assert(a.zip(b).forall { case (x, y) => x == y })
    // every doc contributes at least frame 0
    assert(df.filter(col("frame_no") === 0).count() ==
      Tables.table(spark, sfDir, "documents").count())
  }

  test("multimodal_join carries vector facets through the join") {
    // the raw list column was dropped from the OUTPUT (it crashed the
    // driver's pandas row-sort, r01); dim asserts the join still saw the
    // full 64-wide array
    val df = q("multimodal_join")
    assert(df.count() > 0)
    assert(df.head().getAs[Long]("dim") == 64)
  }

  test("text_langid covers all docs with a valid prediction") {
    val df = q("text_langid")
    assert(df.count() == 500)
    assert(df.filter(!col("pred_lang").isin("de", "en", "es", "fr", "zh")).count() == 0)
  }

  test("split_assign partitions every doc, roughly 80/10/10, deterministic") {
    val rows = q("split_assign").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.table(spark, sfDir, "documents").count())
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val frac = bySplit("train").toDouble / total
    assert(frac > 0.65 && frac < 0.95, s"train fraction $frac")
    // stable across runs (hash-based, not rand()-based)
    assert(rows.sameElements(q("split_assign").collect()))
  }

  test("text_len_hist buckets are consistent and cover all docs") {
    val rows = q("text_len_hist").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.table(spark, sfDir, "documents").count())
    rows.foreach { r =>
      val b = r.getAs[Long]("len_bucket")
      assert(r.getAs[Long]("min_tokens") >= b
        && r.getAs[Long]("max_tokens") < b + 10
        && r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
    }
  }

  test("vec_quantize: int8 error bounded by half a step, extremes saturate") {
    val rows = q("vec_quantize").collect()
    assert(rows.length ==
      Tables.table(spark, sfDir, "embeddings").count())
    rows.foreach { r =>
      // per-element |err| <= scale/2 and unit-norm vectors keep the
      // range (and so the step) small => MSE far below 1e-3
      assert(r.getAs[Double]("mse") >= 0.0 && r.getAs[Double]("mse") < 1e-3)
      // min and max of every vector quantize to 0 and 255 exactly
      assert(r.getAs[Long]("n_sat") >= 2)
    }
  }

  test("dedup_ngram matches a full O(n²) shingle-Jaccard recompute") {
    // independent oracle: brute-force word-3-gram Jaccard over every
    // same-source pair at sf0.001, using plain Scala sets (no hashing,
    // no index) — the operator's inverted-index plan and 56-bit token
    // hashing must not change the answer. Rounding mirrors Canon.round6
    // (half away from zero on the binary value), NOT rint's half-to-even
    def shingles(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty
      else (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), shingles(r.getString(2))))
      .filter(_._3.nonEmpty)
    val expected = (for {
      (ia, sa, xa) <- docs; (ib, sb, xb) <- docs
      if sa == sb && ia < ib
      j = xa.intersect(xb).size.toDouble / xa.union(xb).size
      if math.floor(j * 1e6 + 0.5) / 1e6 >= 0.2
    } yield ((ia, ib), math.floor(j * 1e6 + 0.5) / 1e6)).toMap
    val got = q("dedup_ngram").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet,
      s"pair sets differ: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-6) }
  }

  test("dedup_ngram is word-order sensitive where token-set Jaccard is not") {
    // identical token MULTISETS in different orders: set-Jaccard = 1,
    // shingle-Jaccard low — the property that motivates the operator
    import spark.implicits._
    val df = Seq(
      (1L, "src", "a b c d e f g h"),
      (2L, "src", "h g f e d c b a")
    ).toDF("doc_id", "source", "text")
    val tmp = java.nio.file.Files.createTempDirectory("ngram_ord").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ng = SparkEntry.queries("dedup_ngram")(spark, tmp).collect()
    assert(ng.isEmpty, s"reversed doc must not be an n-gram near-dup: ${ng.toSeq}")
    val js = SparkEntry.queries("dedup_jaccard")(spark, tmp).collect()
    assert(js.length == 1 && js(0).getDouble(2) == 1.0,
      "token-SET jaccard must still see the reversed pair as identical")
  }

  test("dedup_edit: ASCII precondition, bounded distances, candidate subset") {
    // the cross-engine parity claim (DuckDB bytes ≡ Spark chars) holds
    // only on ASCII prefixes — assert it corpus-wide so a future
    // non-ASCII fixture fails loudly instead of silently mismatching
    val docs = Tables.table(spark, sfDir, "documents")
    val nonAscii = docs.filter(octet_length(substring(col("text"), 1, 64))
      =!= length(substring(col("text"), 1, 64))).count()
    assert(nonAscii == 0, s"$nonAscii docs break the ASCII prefix premise")
    val out = q("dedup_edit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, lev) => a < b && lev >= 0 && lev <= 16 })
    // rescore only ever narrows the banded candidate set
    val cand = q("dedup_ngram_global").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(t => (t._1, t._2)).toSet.subsetOf(cand),
      "edit pairs must come from the n-gram candidate set")
  }
}
