package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) sketching — the corpus-stats sketch
  * family next to HLL (distinct) and KLL (quantiles): which tokens
  * dominate a 100 TB corpus, without a vocabulary-sized exact aggregate.
  *
  * The sketch is distributed Misra-Gries: each partition keeps an
  * m-counter summary (increment if present; insert if room; else
  * decrement ALL — one incoming occurrence plus m keys absorb m+1
  * occurrence units per decrement step), then summaries MERGE by plain
  * per-token estimate sum. Laws (proved in AggregateSpec over the
  * fixture, not assumed):
  *
  *  - underestimate: est(t) ≤ true(t) for every token — decrements only
  *    ever subtract real occurrences;
  *  - bounded error: true(t) − est(t) ≤ n / (m+1) where n = total token
  *    occurrences — each per-partition decrement step retires m+1
  *    occurrence units, so Σ decrements ≤ n/(m+1), and a token absent
  *    from a partition's summary lost at most that partition's
  *    decrement count;
  *  - coverage: every token with true(t) > n/(m+1) therefore has
  *    est(t) > 0 and appears in the merged sketch — the sketch is a
  *    SUPERSET of the true heavy hitters at the error bound.
  *
  * Scale shape: one corpus pass, ≤ partitions·m summary rows shuffle
  * (vs the full vocabulary for the exact twin), one tiny merge agg.
  */
object Sketches {

  /** Merged Misra-Gries summary of whitespace tokens in `textCol`:
    * (token, est) with the laws above, m counters per partition.
    */
  def misraGriesTokens(docs: DataFrame, textCol: String, m: Int): DataFrame = {
    require(m >= 1, "summary capacity must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val local: Dataset[(String, Long)] = docs
      .select(col(textCol).cast("string")).as[String]
      .mapPartitions { it =>
        val cnt = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { text =>
          val toks = text.split(" ", -1)
          var i = 0
          while (i < toks.length) {
            val t = toks(i)
            cnt.get(t) match {
              case Some(c) => cnt.update(t, c + 1)
              case None if cnt.size < m => cnt.update(t, 1L)
              case None =>
                // decrement-all: order-insensitive (every key −1, drop
                // zeros), so the summary is deterministic per partition
                val dead = List.newBuilder[String]
                cnt.foreach { case (k, v) =>
                  if (v == 1L) dead += k else cnt.update(k, v - 1L)
                }
                dead.result().foreach(cnt.remove)
            }
            i += 1
          }
        }
        cnt.iterator
      }
    local.toDF("token", "est")
      .groupBy("token").agg(sum("est").as("est"))
  }
}
