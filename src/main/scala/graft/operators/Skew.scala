package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys overwhelm single tasks
  * (SURVEY.md §4 scale notes; README "Scale design").
  *
  * AQE's skew-join handling splits oversized partitions of a sort-merge
  * join at runtime and is the first line of defense — it stays on in
  * every session this library builds. Explicit salting remains the tool
  * when AQE cannot re-plan: a skewed stream feeding a stateful operator,
  * a shuffled-hash join, or a key so hot that even a split partition's
  * build side won't fit. The salt widens the shuffle key from `keys` to
  * `(keys, salt)`, spreading one hot key over `n` tasks at the cost of
  * replicating the (small) right side n×.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join `big ⋈ small` on `keys`, row-identical to
    * `big.join(small, keys)` but with the big side scattered across `n`
    * salt buckets and the small side replicated n×. The salt is derived
    * from the whole big-side row (xxhash64), so it is deterministic
    * across runs and partitionings — any 0..n-1 value is correct; a
    * content hash just keeps re-runs byte-stable.
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
      keys: Seq[String], n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    require(keys.nonEmpty, "salted join needs at least one equi key")
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"input already has a $SaltCol column — the salt would clobber it")
    val saltedBig = big.withColumn(SaltCol,
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(n.toLong)))
    val repeatedSmall = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    saltedBig.join(repeatedSmall, keys :+ SaltCol).drop(SaltCol)
  }
}
