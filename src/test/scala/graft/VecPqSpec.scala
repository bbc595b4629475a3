package graft

import org.apache.spark.sql.functions._

/** vec_pq (product quantization) + source_evolving_schema invariants. */
class VecPqSpec extends SparkSpec {

  test("vec_pq: 8 codes in 0..15 per vector; codebook vectors self-encode at zero error") {
    val rows = q("vec_pq").collect()
    assert(rows.length == Tables.table(spark, sfDir, "embeddings").count())
    for (r <- rows) {
      val codes = r.getString(1).split("-")
      assert(codes.length == 8, s"vec ${r.getLong(0)}: ${r.getString(1)}")
      assert(codes.forall(c => c.toInt >= 0 && c.toInt <= 15))
      assert(r.getDouble(2) >= 0)
    }
    // seeds: vec_id < 16 must choose themselves in every subspace
    for (r <- rows.filter(_.getLong(0) < 16)) {
      val id = r.getLong(0)
      assert(r.getString(1) == Array.fill(8)(id.toString).mkString("-"),
        s"seed $id code ${r.getString(1)}")
      assert(r.getDouble(2) == 0.0, s"seed $id recon ${r.getDouble(2)}")
    }
  }

  test("vec_pq: per-subspace recon error no worse than whole-vector nearest seed") {
    // encoding subspaces independently can only reduce the total
    // squared error vs picking ONE seed for the whole vector
    import spark.implicits._
    val emb = Tables.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val seeds = emb.filter(_._1 < 16)
    val pq = q("vec_pq").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    for ((id, v) <- emb) {
      val bestWhole = seeds.map { case (_, s) =>
        math.sqrt(v.indices.map(i =>
          (v(i).toDouble - s(i).toDouble) * (v(i).toDouble - s(i).toDouble)).sum)
      }.min
      assert(pq(id) <= bestWhole + 1e-6,
        s"vec $id: pq ${pq(id)} > whole-vector best $bestWhole")
    }
  }

  test("source_evolving_schema: legacy group present and totals partition orders") {
    val rows = q("source_evolving_schema").collect()
    assert(rows.map(_.getString(0)).contains("<legacy>"))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.table(spark, sfDir, "orders").count())
  }
}
