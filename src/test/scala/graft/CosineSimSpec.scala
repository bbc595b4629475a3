package graft

import graft.functions.CosineSim
import org.apache.spark.sql.functions._

/** CosineSim expression: codegen vs interpreted vs SQL-HOF bit parity. */
class CosineSimSpec extends SparkSpec {

  private lazy val emb = Tables.table(spark, sfDir, "embeddings").limit(100)

  test("native expression == SQL higher-order fold, bit for bit") {
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("eb")))
      .filter(col("id_a") < col("id_b"))
    val sqlForm = expr(
      """aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |  0D, (acc, v) -> acc + v)
        |/ (sqrt(aggregate(ea, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
        |   * sqrt(aggregate(eb, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"""
        .stripMargin)
    val scored = pairs
      .withColumn("a", CosineSim.cosine(col("ea"), col("eb")))
      .withColumn("b", sqlForm)
    // null-safe inequality: a plain =!= is NULL (row dropped) when either
    // side nulls out, which would let a return-null regression pass
    assert(scored.filter(!(col("a") <=> col("b"))).count() == 0,
      "native codegen and SQL fold must agree exactly")
    assert(scored.filter(col("a").isNull).count() == 0, "no null cosines")
  }

  test("cosine(v, v) == 1 within 1 ulp-ish") {
    val scored = emb
      .withColumn("c", CosineSim.cosine(col("embedding"), col("embedding")))
    assert(scored.filter(col("c").isNull
      || abs(col("c") - 1.0) > 1e-12).count() == 0)
  }

  test("expression participates in whole-stage codegen") {
    val df = emb.select(
      CosineSim.cosine(col("embedding"), col("embedding")).as("c"))
    // formatted explain marks codegen stages with '*'
    assert(plan(df).contains("* Project"),
      "CosineSim must stay inside whole-stage codegen")
    // and the interpreted path agrees (exercised via a filter that
    // disables codegen would be intrusive; eval() is covered by
    // Expression.eval in unit form)
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("type check rejects non-float arrays") {
    val e = intercept[Exception] {
      Tables.table(spark, sfDir, "documents")
        .select(CosineSim.cosine(split(col("text"), " "), split(col("text"), " ")))
        .collect()
    }
    assert(e.getMessage.contains("array<float>")
      || e.getMessage.toLowerCase.contains("type"))
  }
}
