package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join equivalence + plan shape: the salt must change the
  * shuffle key (that is its entire purpose) without changing the result.
  */
class SkewSpec extends SparkSpec {

  private def skewedFixture = {
    import spark.implicits._
    // one hot key carrying 90% of rows + a uniform tail
    val big = ((1 to 9000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 50 + 2).toLong, i.toLong)))
      .toDF("k", "payload")
    val small = (1 to 60).map(i => (i.toLong, s"dim_$i")).toDF("k", "name")
    (big, small)
  }

  test("saltedInnerJoin is row-identical to the plain join") {
    val (big, small) = skewedFixture
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = canon(big.join(small, Seq("k")))
    val salted = canon(Skew.saltedInnerJoin(big, small, Seq("k"), n = 8))
    assert(plain.nonEmpty && salted == plain)
  }

  test("salt widens the shuffle key and is deterministic across runs") {
    val (big, small) = skewedFixture
    // force a shuffle join so the exchange keys are observable
    val joined = Skew.saltedInnerJoin(
      big.hint("merge"), small, Seq("k"), n = 8)
    val p = plan(joined)
    val exchanges = p.split("\n").filter(_.contains("hashpartitioning"))
    assert(exchanges.exists(_.contains("__graft_salt")),
      s"shuffle must be keyed by (k, salt), got:\n${exchanges.mkString("\n")}")
    val a = joined.collect()
    val b = Skew.saltedInnerJoin(big.hint("merge"), small, Seq("k"), 8).collect()
    assert(a.length == b.length && a.map(_.toString).sorted
      .sameElements(b.map(_.toString).sorted))
  }

  test("hot key spreads over multiple salt buckets") {
    val (big, _) = skewedFixture
    import spark.implicits._
    val buckets = big.filter(col("k") === 1L)
      .withColumn("s", pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8L)))
      .select(countDistinct("s")).head().getLong(0)
    assert(buckets >= 6, s"9000 hot rows should hit most of 8 buckets, got $buckets")
  }
}
