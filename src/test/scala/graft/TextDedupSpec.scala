package graft

import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Parameterized-API invariants for [[graft.operators.TextDedup]] — the
  * library surface behind the oracle-checked dedup_ngram query.
  */
class TextDedupSpec extends SparkSpec {

  private def pairs(blockCols: Seq[String], n: Int, t: Double) =
    TextDedup.ngramJaccardPairs(
      Tables.table(spark, sfDir01, "documents"),
      "doc_id", "text", blockCols, n, t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))

  test("higher threshold yields a subset; scores agree on shared pairs") {
    val low = pairs(Seq("source"), 3, 0.1).toMap
    val high = pairs(Seq("source"), 3, 0.3).toMap
    assert(high.keySet.subsetOf(low.keySet))
    high.foreach { case (k, j) => assert(j == low(k) && j >= 0.3) }
    assert(low.nonEmpty)
  }

  test("no blocking is a superset of source-blocked pairs") {
    val blocked = pairs(Seq("source"), 3, 0.2).toMap
    val global = pairs(Seq.empty, 3, 0.2).toMap
    assert(blocked.keySet.subsetOf(global.keySet))
    blocked.foreach { case (k, j) => assert(global(k) == j) }
  }

  test("wider shingles are stricter on this corpus") {
    // a shared word contributes to n=1 similarity but only shared RUNS
    // of n words contribute at larger n — on random-ish text, scores at
    // n=4 must not find pairs that n=3 scores below threshold misses
    val n3 = pairs(Seq("source"), 3, 0.2).toMap.keySet
    val n4 = pairs(Seq("source"), 4, 0.2).toMap.keySet
    assert(n4.subsetOf(n3),
      s"n=4 found pairs n=3 did not: ${n4 -- n3}")
  }

  test("n=1 equals distinct-token-set Jaccard") {
    // shingle width 1 degenerates to the token-set measure — cross-check
    // against an independent Scala recompute on a small slice
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    val expected = (for {
      (ia, xa) <- docs; (ib, xb) <- docs if ia < ib
      j = xa.intersect(xb).size.toDouble / xa.union(xb).size
      if math.floor(j * 1e6 + 0.5) / 1e6 >= 0.5
    } yield ((ia, ib), math.floor(j * 1e6 + 0.5) / 1e6)).toMap
    val got = TextDedup.ngramJaccardPairs(
      Tables.table(spark, sfDir, "documents"),
      "doc_id", "text", Seq.empty, 1, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-9) }
  }

  test("minhashLshPairs emits only true pairs: subset of exact, equal scores") {
    // every LSH-emitted pair is exactly rescored, so it must appear in
    // the exhaustive inverted-index result with the identical score —
    // this also pins the JVM sha256-prefix hash to the codegen hash56
    val exact = pairs(Seq("source"), 3, 0.2).toMap
    val lsh = TextDedup.minhashLshPairs(
      Tables.table(spark, sfDir01, "documents"),
      "doc_id", "text", Seq("source"), n = 3, numPerms = 16, bands = 4,
      threshold = 0.2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(lsh.keySet.subsetOf(exact.keySet),
      s"LSH emitted non-pairs: ${lsh.keySet -- exact.keySet}")
    lsh.foreach { case (k, j) => assert(j == exact(k)) }
  }

  test("minhashLshPairs recall on high-Jaccard pairs") {
    // P(miss) = (1 - J^4)^4 ≤ 2.5% at J = 0.9 with 4 bands × 4 rows —
    // the sf0.01 corpus's near-dup pairs should essentially all surface
    val exact = pairs(Seq("source"), 1, 0.9).toMap.keySet
    val lsh = TextDedup.minhashLshPairs(
      Tables.table(spark, sfDir01, "documents"),
      "doc_id", "text", Seq("source"), n = 1, numPerms = 16, bands = 4,
      threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain J>=0.9 token-set pairs")
    val missed = exact -- lsh
    assert(missed.size.toDouble / exact.size <= 0.3,
      s"missed ${missed.size} of ${exact.size} J>=0.9 pairs")
  }

  test("custom hash (xxhash64) reproduces the sha-hash pair set") {
    val sha = pairs(Seq("source"), 3, 0.2).toMap
    val xx = TextDedup.ngramJaccardPairs(
      Tables.table(spark, sfDir01, "documents"),
      "doc_id", "text", Seq("source"), 3, 0.2, c => xxhash64(c))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(xx == sha, "hash choice must not change the (collision-free) answer")
  }
}
