package graft

import graft.functions.JaccardSorted
import org.apache.spark.sql.functions._

/** JaccardSorted expression: codegen vs naive set-Jaccard parity on the
  * real signature pipeline, plus codegen participation and type checks.
  */
class JaccardSortedSpec extends SparkSpec {

  // same-source doc pairs with materialized sorted distinct hash sets —
  // the exact shape dedup_jaccard rescored (small slice for speed)
  private lazy val pairs = {
    val t = Tables.table(spark, sfDir, "documents").limit(120)
      .withColumn("dtoks", array_distinct(split(col("text"), " ")))
      .withColumn("shs", array_sort(transform(col("dtoks"),
        t => conv(substring(sha2(t, 256), 1, 14), 16, 10).cast("long"))))
      .select(col("doc_id"), col("source"), col("shs"), col("dtoks"))
    t.as("x").join(t.as("y"),
        col("x.source") === col("y.source") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.shs").as("sa"), col("y.shs").as("sb"),
        col("x.dtoks").as("ta"), col("y.dtoks").as("tb"))
  }

  test("native expression == interpreted set Jaccard over token arrays") {
    val scored = pairs
      .withColumn("a", JaccardSorted.jaccard(col("sa"), col("sb")))
      .withColumn("b",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))).cast("double"))
    assert(scored.count() > 0, "need at least one same-source pair")
    // exact double equality: inter/union identical integers both ways
    // (56-bit hash injective on this corpus), division IEEE-identical
    assert(scored.filter(!(col("a") <=> col("b"))).count() == 0,
      "merge-walk and set-op Jaccard must agree exactly")
    assert(scored.filter(col("a").isNull).count() == 0, "no null scores")
  }

  test("expression participates in whole-stage codegen") {
    // single-table projection: inside a join the projection fuses into
    // the join's codegen stage and no separate "* Project" line appears
    val df = Tables.table(spark, sfDir, "documents")
      .withColumn("shs", array_sort(transform(
        array_distinct(split(col("text"), " ")),
        t => conv(substring(sha2(t, 256), 1, 14), 16, 10).cast("long"))))
      .select(JaccardSorted.jaccard(col("shs"), col("shs")).as("j"))
    assert(plan(df).contains("* Project"),
      "JaccardSorted must stay inside whole-stage codegen")
  }

  test("jaccard(s, s) == 1 for non-empty sets") {
    val df = pairs.select(JaccardSorted.jaccard(col("sa"), col("sa")).as("j"))
    assert(df.filter(col("j") =!= 1.0).count() == 0)
  }

  test("type check rejects non-long arrays") {
    val e = intercept[Exception] {
      pairs.select(JaccardSorted.jaccard(col("ta"), col("tb"))).collect()
    }
    assert(e.getMessage.contains("array<bigint>")
      || e.getMessage.toLowerCase.contains("type"))
  }
}
