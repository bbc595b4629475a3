package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the cluster-assignment step that
  * turns near-duplicate PAIRS into deduplication DECISIONS (keep the
  * canonical member of each component, drop the rest). Without this, a
  * dedup pipeline stops one step short of its output.
  *
  * Algorithm: hash-min label propagation (pregel-style). Every vertex
  * starts labeled with its own id; each round every vertex takes the min
  * of its label and its neighbors' labels; fixpoint = every vertex holds
  * the min id of its component. Each round is one shuffle-partitioned
  * equi-join + partial-agg min — fully distributed, no driver state
  * beyond the loop counter and a per-round convergence count.
  *
  * Rounds needed = graph diameter. Near-dup components are dense
  * near-cliques (similarity is nearly transitive at high thresholds), so
  * diameter is tiny (2-3) and this beats the O(log n) large-star /
  * small-star scheme (Kiveris et al.) in practice — that variant is the
  * documented upgrade path for adversarially-chained graphs. Lineage is
  * truncated per round with localCheckpoint so plans don't nest.
  */
object Graph {

  /** Component label (min member id) per vertex of the undirected edge
    * set. Input: two long columns of `edges`; output: (id, component).
    * Vertices are exactly the ids appearing in ≥ 1 edge — callers join
    * isolated vertices back with coalesce(component, id).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 25): DataFrame = {
    // checkpoint the DIRECTED pairs before mirroring: the union's two
    // branches are separate plan subtrees, so checkpointing only after
    // the union runs the caller's whole pair-generation pipeline TWICE
    // (and every propagation round would re-run it without any barrier
    // — measured on dedup_clusters at sf0.1: 10.4 s → 5.8 s)
    val sym = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).localCheckpoint()
    val undirected = sym.union(sym.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint()
    var labels = undirected.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = undirected
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("lbl").as("nbl"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbl"), col("lbl"))).as("lbl"),
          (col("nbl") < col("lbl")).as("moved"))
        .localCheckpoint() // truncate lineage; also one action per round
      converged = next.filter(col("moved")).limit(1).isEmpty
      labels = next.select("id", "lbl")
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Fixed-iteration PageRank over an undirected edge set — the
    * centrality ranking of, e.g., the near-duplicate similarity graph
    * (which member of a duplicate cluster is the hub every variant
    * derives from). Simplified power iteration:
    * r₀ = 1/n; r_{k+1}(v) = (1−d)/n + d·Σ_{u→v} r_k(u)/deg(u).
    * Dangling (isolated) vertices keep the teleport term only — their
    * mass is NOT redistributed, so ranks need not sum to 1. This keeps
    * every iteration a pure join+agg (contributions along edges, one
    * partial+final sum per round), bit-reproducible across engines up
    * to float addition order, with no global renormalization pass.
    *
    * Each round is one equi-join of ranks against the checkpointed edge
    * set plus a hash agg on the destination — the same shuffle shape as
    * [[connectedComponents]], fixed iteration count instead of
    * convergence detection (PageRank never exactly converges). Driver
    * holds only the loop counter; n enters the plan as a broadcast
    * 1-row aggregate, not a collected constant.
    *
    * @param vertices one-column ("id", long) universe — including
    *                 isolated vertices that appear in no edge
    * @return (id, rank) — raw doubles; callers canonicalize rounding
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      vertices: DataFrame, iters: Int = 3, damping: Double = 0.85)
      : DataFrame = {
    // same pairs-before-mirror checkpoint as connectedComponents: one
    // pair-generation pass, not two
    val sym = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).localCheckpoint()
    val undirected = sym.union(sym.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint()
    val deg = undirected.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val v = vertices.select(col(vertices.columns.head).cast("long").as("id"))
      .localCheckpoint()
    // n as a broadcast scalar: stays in the plan (1-row cross join),
    // checkpointed once so each round doesn't recount the universe
    val n = v.agg(count(lit(1)).cast("double").as("n")).localCheckpoint()
    var ranks = v.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("n")).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = undirected
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .join(deg.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("r") / col("deg")).as("m"))
      ranks = v.crossJoin(broadcast(n))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / col("n")
            + lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
        .localCheckpoint() // truncate lineage so plans don't nest per round
    }
    ranks.select(col("id"), col("r").as("rank"))
  }
}
