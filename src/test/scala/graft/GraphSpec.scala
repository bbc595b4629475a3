package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Ground truth for hash-min connected components: handcrafted graphs
  * whose components are known by construction, including a path graph
  * (worst diameter — the case that needs > 1 propagation round) and the
  * dedup_clusters consistency laws on the fixture.
  */
class GraphSpec extends SparkSpec {

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph + clique + isolated pair resolve to min-id components") {
    // path 1-2-3-4-5 (diameter 4), triangle 10-11-12, pair 20-21
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)))
    assert((1L to 5L).forall(got(_) == 1L), s"path: $got")
    assert((10L to 12L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got.size == 10, "vertices = ids appearing in an edge, nothing else")
  }

  test("component label is order-independent (reversed + shuffled edges)") {
    val edges = Seq((5L, 4L), (3L, 4L), (2L, 3L), (1L, 2L))
    assert(cc(edges) == cc(edges.reverse))
  }

  test("dedup_clusters: pairs co-clustered, canonical is min member, sizes add up") {
    val rows = q("dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = rows.map(r => r._1 -> r._2).toMap
    // every edge's endpoints share a canonical id
    q("dedup_ngram_global").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .foreach { case (a, b) => assert(byDoc(a) == byDoc(b), s"pair ($a,$b)") }
    // canonical = min member of its cluster; cluster_size consistent
    rows.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._1).min == canon, s"canonical $canon not min")
      assert(members.forall(_._3 == members.length), s"size skew at $canon")
    }
    // assignment is total: one row per document
    assert(rows.length == Tables.table(spark, sfDir, "documents").count())
  }
}
