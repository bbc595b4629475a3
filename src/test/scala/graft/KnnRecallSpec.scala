package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

/** Measured IVF recall vs the exact path (r2 VERDICT item 4) — the
  * bucket-width / multi-probe knobs must come with evidence, not vibes.
  * Two assertions are theorems given the implementation and verified as
  * such; the floors are measured on the sf0.001 fixture embeddings
  * (clustered by label — the setting LSH is for) and asserted with
  * margin.
  *
  * Monotonicity theorems under the total output order
  * (round-6 cosine desc, idx_id asc):
  *  - probes=1 candidates ⊇ probes=0 candidates (probe set adds the
  *    `bits` hamming-1 buckets) ⇒ recall can only rise;
  *  - lshBucket(e, 4) is the low 4 bits of lshBucket(e, 8), so sharing
  *    an 8-bit bucket implies sharing the 4-bit bucket ⇒ candidates at
  *    bits=4 ⊇ candidates at bits=8 (probes=0) ⇒ recall(4) ≥ recall(8).
  */
class KnnRecallSpec extends SparkSpec {

  private val k = 10

  private lazy val emb = Tables.table(spark, sfDir, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") % 25 === 0)

  private def topk(bits: Int, probes: Int): Map[Long, Set[Long]] =
    Knn.search(queries, emb, k, bits, probes).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }

  private lazy val exact = topk(bits = 0, probes = 0)

  private def recall(ann: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, t) =>
      ann.getOrElse(q, Set.empty).count(t).toDouble / t.size
    }
    per.sum / per.size
  }

  test("recall monotone in probe width and bucket coarseness") {
    val r40 = recall(topk(4, 0)); val r41 = recall(topk(4, 1))
    val r80 = recall(topk(8, 0)); val r81 = recall(topk(8, 1))
    info(f"recall bits=4: $r40%.3f (+probe $r41%.3f); bits=8: $r80%.3f (+probe $r81%.3f)")
    assert(r41 >= r40, "multi-probe adds candidates, recall cannot drop")
    assert(r81 >= r80, "multi-probe adds candidates, recall cannot drop")
    assert(r40 >= r80, "coarser buckets are candidate supersets")
    // measured floors (sf0.001 fixture, k=10: r40=0.14, r41=0.46,
    // r80=0.00, r81=0.12): asserted at wide margin below the observed
    // values so fixture regeneration noise cannot flake the spec. The
    // absolute numbers also document WHY multi-probe exists — a single
    // 8-bit probe at 500 vectors finds nothing.
    assert(r40 > 0.05, f"bits=4 recall collapsed: $r40%.3f")
    assert(r41 > 0.25, f"bits=4+probe recall collapsed: $r41%.3f")
  }

  test("knn_graph_ivf: rescore exactness and measured recall vs knn_graph") {
    // within its candidate set the IVF graph rescore is exact: any
    // (q, idx) edge both graphs emit must carry the identical round-6
    // cosine, and per-query recall vs the exact top-3 is measured
    val exactG = q("knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    val ivfG = q("knn_graph_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
    assert(ivfG.nonEmpty)
    val exactScores = exactG.toMap
    ivfG.foreach { case (edge, c) =>
      exactScores.get(edge).foreach(e =>
        assert(e == c, s"score drift at $edge"))
    }
    val exactSets = exactG.map(_._1).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val ivfSets = ivfG.map(_._1).groupMap(_._1)(_._2)
      .view.mapValues(_.toSet).toMap
    val per = exactSets.map { case (q, t) =>
      ivfSets.getOrElse(q, Set.empty).count(t).toDouble / t.size }
    val r = per.sum / per.size
    info(f"knn-graph recall (6 bits, hamming-1 probes, k=3): $r%.3f")
    // measured on the sf0.001 fixture; floor with wide margin — the
    // point is collapse detection, not a tuning target
    assert(r > 0.1, f"graph recall collapsed: $r%.3f")
  }

  test("dedup_embed_lsh: subset of the exact pair set, identical scores, measured recall") {
    // banding only ever DROPS pairs — every recalled pair must appear in
    // the exact dedup_embed_cosine output with the same round-6 score
    val exactPairs = q("dedup_embed_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = q("dedup_embed_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty, "banded dedup found nothing")
    lsh.foreach { case (pair, c) =>
      assert(exactPairs.contains(pair), s"phantom pair $pair")
      assert(exactPairs(pair) == c, s"score drift at $pair")
    }
    val r = lsh.size.toDouble / exactPairs.size
    info(f"pair recall at threshold 0.4: $r%.3f (${lsh.size}/${exactPairs.size})")
    // measured 0.44 at sf0.01; floor with margin. Near-identical pairs
    // (the actual dedup targets) agree on most sign bits, so the high-
    // cosine end must be found: assert full recall above 0.8.
    assert(r > 0.2, f"recall collapsed: $r%.3f")
    val hi = exactPairs.filter(_._2 >= 0.8).keySet
    val hiGot = lsh.map(_._1).toSet
    hi.foreach(p => assert(hiGot(p), s"missed high-cosine pair $p"))
  }

  test("vec_gram: symmetric, PSD diagonal, trace = vector count (unit norms)") {
    val g = q("vec_gram").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(g.size == 64 * 64)
    g.foreach { case ((i, j), v) =>
      assert(g((j, i)) == v, s"asymmetry at ($i,$j)") // exact decimal sums
    }
    (0L until 64L).foreach(i => assert(g((i, i)) >= 0, s"negative diagonal $i"))
    // embeddings are exactly unit-L2 (FIXTURES.md): trace = Σ ||x||² = n
    val n = Tables.table(spark, sfDir, "embeddings")
      .filter(col("label") === 0).count()
    val trace = (0L until 64L).map(i => g((i, i))).sum
    assert(math.abs(trace - n) < 1e-2, s"trace $trace vs n=$n")
  }

  test("knn_recall_at_k: accounting exact, equals an independent recount") {
    val r = q("knn_recall_at_k").collect().head
    val nq = r.getAs[Long]("n_queries")
    assert(nq == emb.filter(col("vec_id") % 50 === 0).count())
    assert(r.getAs[Long]("n_exact") == 3 * nq,
      "every query has exactly k=3 exact neighbors")
    assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_exact"))
    val rec = r.getAs[Double]("recall_at_3")
    assert(rec >= 0 && rec <= 1)
    // independent recount through the library API (bits=6, probes=1 —
    // the same deployment the query declares)
    val qs50 = emb.filter(col("vec_id") % 50 === 0)
    val ex = Knn.search(qs50, emb, 3).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(2))).toSet
    val ann = Knn.search(qs50, emb, 3, bits = 6, probes = 1).collect()
      .map(r2 => (r2.getLong(0), r2.getLong(2))).toSet
    val hits = ex.count(ann)
    assert(r.getAs[Long]("n_hits") == hits.toLong)
  }

  test("exact path equals knn-style self-query of the fixture") {
    // sanity anchor: every query's own top-1 neighbor by the exact path
    // must have cosine >= any ivf-returned neighbor's cosine
    val ex = Knn.search(queries, emb, 1).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    val ivf = Knn.search(queries, emb, 1, bits = 8, probes = 1).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    ivf.foreach { case (q, c) => assert(c <= ex(q) + 1e-12) }
  }
}
