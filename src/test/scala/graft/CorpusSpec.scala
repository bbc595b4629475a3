package graft

/** JVM brute-force ground truth for the round-5 corpus-pipeline group
  * (operators/Corpus.scala) — independent of both the Spark expressions
  * and the DuckDB oracle.
  */
class CorpusSpec extends SparkSpec {

  private def sha56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 7).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xffL))
  }

  private def r6(x: Double): Double =
    if (x >= 0) math.floor(x * 1e6 + 0.5) / 1e6
    else -math.floor(-x * 1e6 + 0.5) / 1e6

  private lazy val docs: Array[(Long, String)] =
    Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def shingles(text: String): Set[String] = {
    val t = text.split(" ", -1)
    (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
  }

  /** All-pairs n=3 Jaccard ≥ 0.2, round6 like the query — (a, b), a < b. */
  private lazy val truthPairs: Set[(Long, Long)] = {
    val sh = docs.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, xa) <- sh; (ib, xb) <- sh if ia < ib
      i = xa.intersect(xb).size
      if i > 0
      j = r6(i.toDouble / (xa.size + xb.size - i))
      if j >= 0.2
    } yield (ia, ib)).toSet
  }

  test("graph_triangles == brute-force census of the all-pairs edge set") {
    val e = truthPairs
    val adj = (e.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupMap(_._1)(_._2).map { case (v, ns) => (v, ns.toSet) }
    val wedges = adj.valuesIterator
      .map(ns => ns.size.toLong * (ns.size - 1) / 2).sum
    val tri = e.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b).toLong
    }.sum
    val r = q("graph_triangles").collect().head
    assert(r.getLong(0) == e.size.toLong, "n_edges")
    assert(r.getLong(1) == wedges, "n_wedges")
    assert(r.getLong(2) == tri, "n_triangles")
    val expected =
      if (wedges > 0) r6(3.0 * tri / wedges) else 0.0
    assert(r.getDouble(3) == expected, "clustering")
  }

  test("dedup_incremental == brute-force batch verdicts; batch-join plan never mines corpus-corpus") {
    val truth = docs.filter(_._1 % 10 == 0).map { case (id, _) =>
      val partners = truthPairs.collect {
        case (a, b) if a == id => b
        case (a, b) if b == id => a
      }
      val nc = partners.count(_ % 10 != 0).toLong
      val nb = partners.count(_ % 10 == 0).toLong
      val verdict =
        if (nc > 0) "dup_of_corpus"
        else if (nb > 0) "new_dup_group" else "unique"
      (id, nc, nb, verdict)
    }.sortBy(_._1)
    val got = q("dedup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == truth.toSeq)
    // every vertex of every mined pair must touch the batch — the
    // incremental property (corpus×corpus pairs never materialize)
    assert(truth.exists(_._4 != "unique"), "fixture has batch dups")
  }

  test("bpe_pair_counts == brute-force weighted char-pair counts") {
    val wc = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach(_._2.split(" ", -1).foreach(w =>
      wc.update(w, wc.getOrElse(w, 0L) + 1)))
    val pc = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      if (w.length >= 2)
        (0 until w.length - 1).foreach { i =>
          val p = w.substring(i, i + 2)
          pc.update(p, pc.getOrElse(p, 0L) + c)
        }
    }
    val truth = pc.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
      .zipWithIndex.map { case ((p, c), i) => (i + 1L, p, c) }
    val got = q("bpe_pair_counts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == truth)
  }

  test("train_shuffle == brute-force seeded-hash order; exhaustive and deterministic") {
    val truth = docs.map { case (id, _) => (sha56(s"shuf42:$id") % 8, sha56(s"shuf42:$id"), id) }
      .sortBy { case (s, h, id) => (s, h, id) }
    val gotRows = q("train_shuffle").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // shard sequence and within-shard order match; pos is 1..n per shard
    assert(gotRows.map(_._3).toSeq == truth.map(_._3).toSeq)
    gotRows.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq == (1L to rows.length).toSeq)
    }
    // every doc appears exactly once — a shuffle is a permutation
    assert(gotRows.map(_._3).toSet == docs.map(_._1).toSet)
    assert(gotRows.length == docs.length)
  }

  test("text_lm_score == brute-force pooled bigram probability") {
    val bigrams = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      (id, w.zip(w.drop(1)).toSeq)
    }
    val cab = scala.collection.mutable.Map.empty[(String, String), Long]
    bigrams.foreach(_._2.foreach(p =>
      cab.update(p, cab.getOrElse(p, 0L) + 1)))
    val ca = cab.groupBy(_._1._1).map { case (a, m) => (a, m.values.sum) }
    val v = docs.flatMap(_._2.split(" ", -1)).distinct.length.toLong
    val truth = bigrams.filter(_._2.nonEmpty).map { case (id, bgs) =>
      val num = bgs.map(cab(_) + 1).sum
      val den = bgs.map(p => ca(p._1) + v).sum
      (id, bgs.length.toLong, r6(num.toDouble / den.toDouble))
    }.sortBy(_._1)
    val got = q("text_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == truth.toSeq)
    // self-trained LM: every score is a valid probability-ish ratio
    got.foreach { case (_, _, s) => assert(s > 0.0 && s <= 1.0) }
  }

  test("text_chunks: chunks tile each doc with exact 16-token overlaps") {
    val nTok = docs.map { case (id, t) => (id, t.split(" ", -1).length.toLong) }.toMap
    val got = q("text_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    got.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // ids dense from 0; starts on the stride grid; last chunk ends at n_tok
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, cid, s, e, n) =>
        assert(s == cid * 48, "stride grid")
        assert(e == math.min(s + 64, nTok(id)), "window end")
        assert(n == e - s, "length")
      }
      assert(sorted.last._4 == nTok(id), "coverage to the last token")
      // consecutive chunks overlap by exactly 64 - 48 = 16 (when full)
      sorted.sliding(2).foreach {
        case Array(a, b) if a._4 == a._3 + 64 =>
          assert(a._4 - b._3 == 16, s"overlap drift at doc $id")
        case _ => ()
      }
    }
    assert(got.map(_._1).distinct.length == docs.length, "every doc chunked")
  }

  test("dedup_chunks: fingerprints match a JVM re-chunk; thresholds hold") {
    import org.apache.spark.sql.functions.col
    val rows = q("dedup_chunks").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"),
        "occurrences count every chunk, docs count distinct hosts")
    }
    // brute-force recount: chunk every doc 64/48 in plain Scala, hash
    // with the same sha256-56 scheme, and compare the full report
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def h56(s: String): Long = {
      val d = md.digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(7).map(b => f"$b%02x").mkString, 16)
    }
    val byHash = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect().foreach { r =>
        val toks = r.getString(1).split(" ")
        var st = 0
        while (st < math.max(toks.length, 1)) {
          val chunk = toks.slice(st, math.min(st + 64, toks.length))
            .mkString(" ")
          byHash.getOrElseUpdate(h56(chunk),
            scala.collection.mutable.ArrayBuffer.empty) += r.getLong(0)
          st += 48
        }
      }
    val truth = byHash.filter(_._2.distinct.size >= 2).map { case (h, ds) =>
      (h, ds.distinct.size.toLong, ds.size.toLong, ds.min)
    }.toSet
    val got = rows.map(r => (r.getAs[Long]("h"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_occ"), r.getAs[Long]("first_doc"))).toSet
    assert(got == truth)
  }

  test("knn_recall_matrix: coarser buckets recall more, truth is constant") {
    val rows = q("knn_recall_matrix").collect()
      .sortBy(_.getAs[Long]("bits"))
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("n_true_pairs")).distinct.length == 1,
      "the exact gold standard must not vary with the sweep parameter")
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    assert(cands.zip(cands.tail).forall { case (a, b) => b <= a },
      "more bits = finer buckets = fewer candidate pairs")
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a },
      "recall is monotone non-increasing in bits")
    assert(recalls.forall(r => r >= 0 && r <= 1))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_true_pairs"))
    }
  }

  test("vec_diversity == brute-force mean pairwise squared distance") {
    import org.apache.spark.sql.functions.col
    val got = q("vec_diversity").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val vecs = Tables.table(spark, sfDir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1)
    vecs.foreach { case (label, vs) =>
      val xs = vs.map(_._2)
      val n = xs.length
      // E over ALL ordered pairs incl. self (matches the moment identity)
      var s = 0.0
      for (a <- xs; b <- xs) {
        var d2 = 0.0
        var i = 0
        while (i < a.length) { val d = a(i) - b(i); d2 += d * d; i += 1 }
        s += d2
      }
      val truth = s / (n.toLong * n)
      val (gn, gv) = got(label)
      assert(gn == n.toLong)
      assert(math.abs(gv - truth) < 1e-4, s"label $label: $gv vs $truth")
    }
  }

  test("events_gini: impurity bounds and a brute-force recount") {
    import org.apache.spark.sql.functions.col
    val rows = q("events_gini").collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("n_distinct_k").toDouble
      val g = r.getAs[Double]("gini")
      assert(g >= 0 && g <= 1 - 1 / k + 1e-9,
        s"${r.getString(0)}: gini $g out of [0, 1-1/k]")
    }
    // recount one type from raw props
    val t0 = rows.head.getString(0)
    val ks = Tables.events(spark, sfDir)
      .filter(col("event_type") === t0).select("props").collect()
      .map(r => ujsonK(r.getString(0)))
    val counts = ks.groupBy(identity).map(_._2.size.toLong)
    val n = counts.sum
    val truth = 1.0 - counts.map(c => c * c).sum.toDouble / (n * n)
    assert(math.abs(rows.head.getAs[Double]("gini") - truth) < 1e-5)
  }

  private def ujsonK(s: String): Int = {
    val m = """"k"\s*:\s*(-?\d+)""".r.findFirstMatchIn(s)
    m.map(_.group(1).toInt).getOrElse(Int.MinValue)
  }

  test("text_zipf: ranks dense, frequencies non-increasing, top verified") {
    import org.apache.spark.sql.functions.{col, explode, split}
    val rows = q("text_zipf").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length))
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => b <= a })
    rows.foreach(r => assert(
      r.getAs[Long]("freq_x_rank")
        == r.getAs[Long]("freq") * r.getAs[Long]("rank")))
    val top = Tables.table(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t")).limit(1).collect().head
    assert(rows.head.getAs[String]("token") == top.getString(0))
    assert(rows.head.getAs[Long]("freq") == top.getLong(1))
  }

  test("graph_degree_dist == brute-force degree histogram of the edge set") {
    val deg = scala.collection.mutable.Map.empty[Long, Long]
    truthPairs.foreach { case (a, b) =>
      deg.update(a, deg.getOrElse(a, 0L) + 1)
      deg.update(b, deg.getOrElse(b, 0L) + 1)
    }
    val truth = deg.values.groupBy(identity)
      .map { case (d, vs) => (d, vs.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = q("graph_degree_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == truth)
    // histogram mass = vertex count of the pair graph
    assert(got.map(_._2).sum == deg.size.toLong)
  }

  test("dedup_containment == brute-force directional shingle containment") {
    val bySource = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(_._3)
    val truth = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    bySource.values.foreach { ds =>
      for ((ia, ta, _) <- ds; (ib, tb, _) <- ds if ia != ib) {
        val (sa, sb) = (shingles(ta), shingles(tb))
        if (sa.nonEmpty && sb.nonEmpty) {
          val c = r6(sa.intersect(sb).size.toDouble / sa.size)
          if (c >= 0.7) truth += ((ia, ib, c))
        }
      }
    }
    val got = q("dedup_containment").collect()
      .map(r => (r.getAs[Long]("contained"), r.getAs[Long]("container"),
        r.getAs[Double]("containment")))
    assert(got.toSet == truth.toSet, "exact directional pair set")
    assert(got.nonEmpty, "fixture must exercise the containment path")
  }

  test("text_ngram_novelty == brute-force first-occurrence fractions") {
    val sh = docs.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    val firstSeen = sh.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupMapReduce(_._1)(_._2)(math.min)
    val truth = sh.map { case (id, ss) =>
      val novel = ss.count(s => firstSeen(s) == id)
      (id, ss.size.toLong, novel.toLong, r6(novel.toDouble / ss.size))
    }.sortBy(_._1)
    val got = q("text_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == truth.toSeq)
    // ingestion-order sanity: the first doc is 100% novel
    assert(got.head._4 == 1.0)
  }

  test("graph_bfs == brute-force 3-hop BFS from the smallest vertex") {
    val adj = truthPairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).map { case (v, ns) => (v, ns.toSet) }
    val seed = truthPairs.flatMap(p => Seq(p._1, p._2)).min
    var dist = Map(seed -> 0L)
    (1 to 3).foreach { d =>
      val frontier = dist.filter(_._2 == d - 1).keySet
      frontier.flatMap(adj.getOrElse(_, Set.empty)).foreach { v =>
        if (!dist.contains(v)) dist += (v -> d.toLong)
      }
    }
    val got = q("graph_bfs").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == dist, "hop distances must match the brute-force BFS")
  }

  test("dedup_semantic_hybrid: signal labels partition the two truth sets") {
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val embTruth = (for {
      (ia, va) <- emb; (ib, vb) <- emb if ia < ib
      if r6(cos(va, vb)) >= 0.4
    } yield (ia, ib)).toSet
    val rows = q("dedup_semantic_hybrid").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pair = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (inText, inEmb) = (truthPairs(pair), embTruth(pair))
      val expect =
        if (inText && inEmb) "both" else if (inText) "text" else "embed"
      assert(r.getAs[String]("signal") == expect, s"$pair")
      assert(inText || inEmb, s"$pair must come from a candidate set")
    }
    assert(rows.length == (truthPairs ++ embTruth).size,
      "the outer join must cover the union exactly")
  }

  test("sample_importance: counts re-derive from the hash filter; " +
      "weights sum to 1") {
    val meta = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rows = q("sample_importance").collect()
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    val rates = rows.map(r =>
      (r.getAs[String]("source"), r.getAs[Double]("rate"))).toMap
    val truth = meta.groupBy(_._2).map { case (s, ds) =>
      (s, ds.count { case (id, _) =>
        (sha56(s"imp|$id") % 1000000L).toDouble / 1e6 < rates(s)
      }.toLong)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") == truth(r.getAs[String]("source")))
    }
    // the 20% global target is roughly met (hash uniformity)
    val total = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val kept = rows.map(_.getAs[Long]("n_sampled")).sum.toDouble
    assert(kept / total > 0.1 && kept / total < 0.3)
  }

  test("text_rarity: mean bounded by vocab size, max ≥ mean, all docs") {
    val rows = q("text_rarity").collect()
    val nDocs = Tables.table(spark, sfDir, "documents").count()
    assert(rows.length == nDocs, "one row per document")
    rows.foreach { r =>
      val (avg, mx) = (r.getAs[Double]("avg_rarity"), r.getAs[Double]("max_rarity"))
      // mean of N/c_t is ≥ 1 (c_t ≤ N) and its corpus-wide average
      // equals |vocab| — per-doc values scatter around that
      assert(avg >= 1.0 && mx >= avg - 1e-9)
    }
  }
}
