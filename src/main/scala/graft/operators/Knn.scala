package graft.operators

import graft.Canon
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized similarity-search library — the serving shape of ANN
  * (r2 VERDICT items 4 + 6): given Q query vectors, return the top-k
  * neighbors of each from an index of N vectors.
  *
  * Two candidate modes share one exact top-k reducer:
  *
  *  - `bits <= 0` (exact): distributed index × `broadcast()` queries
  *    nested-loop join — every (query, index) pair scored by the codegen
  *    [[graft.functions.CosineSim]]. The right baseline and the
  *    small-query-set serving path: the index (the 100 TB side) streams
  *    exactly once, nothing ever concentrates on the driver.
  *  - `bits > 0` (IVF/LSH): index rows bucketed by a `bits`-bit sign
  *    LSH; queries probe their own bucket plus, with `probes = 1`, the
  *    `bits` neighboring buckets at hamming distance 1 (multi-probe —
  *    the recall knob that a fixed bucket width lacks). Candidates come
  *    from a shuffle-partitioned equi-join on bucket id; only candidates
  *    are scored. Recall vs the exact path is measured in KnnRecallSpec
  *    at several widths, not assumed.
  *
  * Top-k per query is exact and two-phase: each scored partition keeps a
  * bounded heap per query id (≤ Q·k rows emitted per partition, under
  * the FULL output ordering — round-6 cosine desc, index id asc — so
  * boundary ties cannot drop a true winner), then one window pass over
  * the pruned union ranks globally. The heavy n·Q scored stream never
  * shuffles; only the ≤ partitions·Q·k survivors do.
  */
object Knn {

  /** Deterministic sign-pattern LSH bucket: bit i set iff
    * e[i] > e[i+32] (0-based), for `bits` ≤ 32 over 64-dim vectors.
    * `bits` trades bucket occupancy (candidate cost Σc²) against recall:
    * 2^bits buckets, occupancy ≈ n / 2^bits.
    */
  def lshBucket(e: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 32, "bits must be in [1, 32]")
    (0 until bits).map { i =>
      when(element_at(e, i + 1) > element_at(e, i + 33), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Top-`k` index neighbors per query vector by round-6 cosine,
    * tie-broken by index id. Input frames both carry
    * (vec_id: long, embedding: array&lt;float&gt;); self-matches
    * (q_id = idx_id) are excluded so a query set drawn from the index
    * doesn't return itself.
    *
    * @return (q_id, rank: long 1-based, idx_id, cosine) — exact when
    *         `bits <= 0`, IVF-pruned (measured recall) otherwise
    */
  def search(queries: DataFrame, index: DataFrame, k: Int,
      bits: Int = 0, probes: Int = 0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val ix = index.select(col("vec_id").as("idx_id"), col("embedding").as("ie"))
    val paired =
      if (bits <= 0)
        ix.join(broadcast(q), col("q_id") =!= col("idx_id"))
      else {
        val ib = ix.withColumn("bucket", lshBucket(col("ie"), bits))
        val probeBuckets =
          if (probes <= 0) array(col("qbucket"))
          else array(col("qbucket") +:
            (0 until bits).map(b => col("qbucket").bitwiseXOR(lit(1L << b))): _*)
        val qb = q.withColumn("qbucket", lshBucket(col("qe"), bits))
          .withColumn("bucket", explode(probeBuckets))
          .drop("qbucket")
        ib.join(broadcast(qb), Seq("bucket"))
          .filter(col("q_id") =!= col("idx_id"))
      }
    val scored = paired
      .select(col("q_id"), col("idx_id"),
        Canon.round6(
          graft.functions.CosineSim.cosine(col("qe"), col("ie"))).as("cosine"))
    // phase 1: per-partition bounded heap per query id. Heap order is
    // the exact final order (cosine desc, idx_id asc) so the partition
    // union is a superset of the global top-k.
    val partial = scored.as[(Long, Long, Double)]
      .mapPartitions { it =>
        // dequeue() must evict the WORST kept candidate: order by
        // (-cosine, idx_id) makes the max = lowest cosine, largest id
        val ord = Ordering.by[(Double, Long), (Double, Long)] {
          case (c, id) => (-c, id)
        } // max under this order = lowest cosine, largest id = worst
        val heaps = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
        it.foreach { case (qid, iid, c) =>
          val h = heaps.getOrElseUpdate(qid,
            scala.collection.mutable.PriorityQueue.empty(ord))
          h.enqueue((c, iid))
          if (h.size > k) h.dequeue()
        }
        heaps.iterator.flatMap { case (qid, h) =>
          h.iterator.map { case (c, iid) => (qid, iid, c) }
        }
      }
      .toDF("q_id", "idx_id", "cosine")
    // phase 2: exact global rank over the ≤ partitions·Q·k survivors
    partial
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id")
          .orderBy(col("cosine").desc, col("idx_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("idx_id"), col("cosine"))
  }
}
