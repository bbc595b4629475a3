package graft

import graft.operators.TextDedup
import org.apache.spark.sql.functions._

/** Round-8 wave 98: truncated closeness — brute JVM multi-source BFS
  * over the same mined edge set.
  */
class Wave98Spec extends SparkSpec {

  test("graph_closeness matches a brute radius-3 BFS per seed") {
    val pairs = TextDedup.sharedNgramPairs(spark, sfDir, n = 3,
      threshold = 0.2).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.toSeq.sorted.take(5)
    val got = q("graph_closeness").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    seeds.foreach { s =>
      var dist = Map(s -> 0L)
      var frontier = Set(s)
      (1 to 3).foreach { d =>
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        dist ++= next.map(_ -> d.toLong)
        frontier = next
      }
      val reached = dist.size - 1L
      val sumd = dist.values.sum
      if (sumd > 0) {
        val (gr, gc) = got(s)
        assert(gr == reached, s"seed $s reached: $gr vs $reached")
        assert(math.abs(gc - reached.toDouble / sumd) < 5.01e-7)
      } else assert(!got.contains(s))
    }
  }
}
