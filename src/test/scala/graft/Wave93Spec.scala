package graft

import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-8 wave 93: two-stage retrieval (ADC shortlist → exact rerank)
  * and view maintenance off manifest file deltas — the claims the
  * oracles can't check: the shortlist's measured recall, the rerank's
  * upper bound (exact search), and that the view refresh never rescans
  * the base data.
  */
class Wave93Spec extends SparkSpec {

  test("knn_rerank recall@3 vs exact search is measured and the " +
    "reranked scores are exact cosines") {
    val emb = Tables.table(spark, sfDir01, "embeddings")
    val exact = graft.operators.Knn
      .search(emb.filter(col("vec_id") % 50 === 0), emb, k = 3)
      .select("q_id", "idx_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = q("knn_rerank", sfDir01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val hit = got.count(g => exact.contains((g._1, g._3)))
    val recall = hit.toDouble / exact.size
    info(f"rerank recall@3 vs exact: $recall%.2f (${exact.size} truths)")
    // untrained 16-seed PQ on a near-uniform fixture is the hardest
    // case (the knn_search_pq floor is 40% at top-3-vs-top-10); a
    // 20-wide shortlist must do at least as well
    assert(recall >= 0.3, f"recall $recall%.2f below floor")
    // every reranked score is the true cosine of that pair
    val byPair = got.map(g => (g._1, g._3) -> g._4).toMap
    val check = emb.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .join(emb.select(col("vec_id").as("idx_id"), col("embedding").as("ie")),
        col("q_id") =!= col("idx_id"))
      .select(col("q_id"), col("idx_id"),
        Canon.round6(graft.functions.CosineSim.cosine(col("qe"), col("ie")))
          .as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    byPair.foreach { case (k, v) => assert(check(k) == v) }
  }

  test("ivm_manifest_delta equals the direct v2 aggregate, and the " +
    "delta scan touches ONLY the appended files") {
    val orders = Tables.table(spark, sfDir, "orders")
    val root = ManifestOps.lifecycleRoot(spark, sfDir)
    val refreshed = q("ivm_manifest_delta").collect().toSeq
    val direct = ManifestTable.read(spark, root, 2, orders.schema)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Canon.decRound4(sum(col("o_totalprice").cast(Canon.Dec))).as("rev"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(refreshed == direct)
    // the refresh's only table scan is the delta: v1's files are absent
    val delta = ManifestTable.readIncremental(spark, root, 1, 2,
      orders.schema)
    val v1Files = ManifestTable.filesFor(root, 1).toSet
    val scanned = delta.inputFiles.map(_.split('/').last).toSet
    assert(scanned.nonEmpty && scanned.intersect(v1Files).isEmpty,
      s"delta scan touched base files: ${scanned.intersect(v1Files)}")
  }
}
