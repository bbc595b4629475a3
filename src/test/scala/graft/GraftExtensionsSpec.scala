package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the native expressions must resolve as SQL functions
  * in a session built with the extensions installed (sharing the test
  * JVM's SparkContext; default/active session restored afterwards).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_sim / jaccard_sorted resolve and evaluate from SQL") {
    val base = SparkSpec.session // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions).getOrCreate()
    try {
      assert(s ne base, "extensions need their own session state")
      s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("emb")
      val cos = s.sql(
        "SELECT cosine_sim(embedding, embedding) AS c FROM emb LIMIT 5")
        .collect()
      assert(cos.nonEmpty)
      assert(cos.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12),
        "cosine of a vector with itself must be 1")
      val jac = s.sql(
        """SELECT jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j""")
        .head().getDouble(0)
      assert(jac == 0.5, s"|{2,3}| / |{1,2,3,4}| must be 0.5, got $jac")
      val dot = s.sql(
        "SELECT dot_product(CAST(array(1, 2) AS ARRAY<FLOAT>), " +
          "CAST(array(3, 4) AS ARRAY<FLOAT>)) AS d").head().getDouble(0)
      assert(dot == 11.0, s"1*3 + 2*4 must be 11, got $dot")
      // injected optimizer rule: self-similarity folds to a constant —
      // the expression disappears from the optimized plan, the value is
      // exactly 1.0 / NaN / null for the non-empty / empty / null cases
      val self = s.sql(
        "SELECT jaccard_sorted(shs, shs) AS j FROM " +
          "(SELECT array(1L, 2L) AS shs)")
      assert(!self.queryExecution.optimizedPlan.toString.contains("jaccard_sorted"),
        "SelfSimilarityFold must eliminate the self-pair expression")
      assert(self.head().getDouble(0) == 1.0)
      val cases = s.sql(
        "SELECT jaccard_sorted(CAST(array() AS ARRAY<BIGINT>), CAST(array() AS ARRAY<BIGINT>)) AS e, " +
          "jaccard_sorted(CAST(NULL AS ARRAY<BIGINT>), CAST(NULL AS ARRAY<BIGINT>)) AS n").head()
      assert(cases.getDouble(0).isNaN, "empty self-jaccard is 0/0 = NaN")
      assert(cases.isNullAt(1), "null self-jaccard is null")
      // haversine_km: registered as the same built-in composition the
      // Column API uses — one equator degree = 2πR/360
      val hv = s.sql("SELECT haversine_km(0.0D, 0.0D, 0.0D, 1.0D) AS d")
        .head().getDouble(0)
      assert(math.abs(hv - 111.195) < 0.01, s"1 equator degree: $hv")
      // hamming_dist: string byte-position mismatches + length delta
      val hd = s.sql(
        "SELECT hamming_dist('karolin', 'kathrin') AS a, " +
          "hamming_dist('abc', 'abcde') AS b").head()
      assert(hd.getLong(0) == 3L && hd.getLong(1) == 2L)
      // self-pair folds to constant 0 via SelfSimilarityFold
      val hdSelf = s.sql(
        "SELECT hamming_dist(text, text) AS d FROM " +
          "(SELECT 'abc' AS text)")
      assert(!hdSelf.queryExecution.optimizedPlan.toString
        .contains("hamming_dist"),
        "SelfSimilarityFold must eliminate the self-pair hamming")
      assert(hdSelf.head().getLong(0) == 0L)
      // sq_dist: sequential float64 fold; zero against itself cast
      val sq = s.sql(
        "SELECT sq_dist(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(1.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d").head()
      assert(sq.getDouble(0) == 4.0, s"(2-4)^2 must be 4, got ${sq.getDouble(0)}")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("functions are absent without the extensions (no global leakage)") {
    val base = SparkSpec.session
    val e = intercept[Exception] {
      base.sql("SELECT cosine_sim(array(1.0F), array(1.0F))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("unresolved")
      || e.getMessage.toLowerCase.contains("cannot be found")
      || e.getMessage.toLowerCase.contains("undefined"))
  }
}
