package graft.operators

import graft.{QueryGroup, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Group K (UDF / UDAF / UDTF surfaces) — SURVEY.md §2.K.
  *
  * These demonstrate the extension surfaces themselves (a plain Column
  * expression would beat the scalar UDF — and the oracle CASE shows the
  * equivalence — but the surface under test is user code in the plan).
  *
  * Scale notes: the scalar UDF breaks whole-stage codegen at its call
  * site (one extra virtual call per row — fine); the typed Aggregator
  * participates in partial aggregation (zero/reduce on the map side,
  * merge after the shuffle), so it scales exactly like a built-in
  * decimal sum. Its buffer quantizes each term to DECIMAL(18,6) —
  * mirroring `CAST(x AS DECIMAL(18,6))` bit-for-bit — so the merge order
  * across 1000 executors cannot change the result (SURVEY.md §5.3).
  */
object Udfs extends QueryGroup {

  /** Quantity-weighted mean of extendedprice: Σ(x·w)/Σ(w), both sums
    * accumulated exactly after per-term DECIMAL(18,6) quantization
    * (HALF_UP on Double.toString, identical to Spark's Cast-to-decimal).
    */
  object WeightedAvg extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {
    private def q6(d: Double): JBigDecimal =
      JBigDecimal.valueOf(d).setScale(6, RoundingMode.HALF_UP)
    def zero: (JBigDecimal, JBigDecimal) = (JBigDecimal.ZERO, JBigDecimal.ZERO)
    def reduce(b: (JBigDecimal, JBigDecimal), a: (Double, Double)): (JBigDecimal, JBigDecimal) =
      (b._1.add(q6(a._1 * a._2)), b._2.add(q6(a._2)))
    def merge(x: (JBigDecimal, JBigDecimal), y: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (x._1.add(y._1), x._2.add(y._2))
    def finish(b: (JBigDecimal, JBigDecimal)): Double = {
      // binary-value rounding (matches DuckDB round(double,4) — see
      // Canon.binRound; BigDecimal-of-shortest-repr would diverge on
      // repr-boundary quotients)
      val q = b._1.doubleValue() / b._2.doubleValue()
      if (q >= 0) math.floor(q * 1e4 + 0.5) / 1e4
      else -math.floor(-q * 1e4 + 0.5) / 1e4
    }
    def bufferEncoder: Encoder[(JBigDecimal, JBigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries = Map(
    "udf_scalar" -> { (spark, dir) =>
      val priceBand = udf { (p: Double) =>
        if (p < 100000) "low" else if (p < 300000) "mid" else "high"
      }
      spark.udf.register("price_band", priceBand) // SQL-callable too
      Tables.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          priceBand(col("o_totalprice")).as("band"))
        .orderBy("o_orderkey")
    },

    "udaf_weighted_avg" -> { (spark, dir) =>
      val wavg = udaf(WeightedAvg)
      Tables.table(spark, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
        .orderBy("l_returnflag")
    },

    "udtf_generator" -> { (spark, dir) =>
      // posexplode IS the Generator/UDTF surface (GenerateExec); emits
      // (token, position) pairs per doc.
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")
    }
  )

  def oracle = Map(
    "udf_scalar" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice < 300000 THEN 'mid' ELSE 'high' END AS band
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  CAST(round(
        |    CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
        |    / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4) AS DOUBLE)
        |    AS w_avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "udtf_generator" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |       string_split(text, ' ')[i + 1] AS token
        |FROM documents CROSS JOIN (SELECT unnest(range(
        |  (SELECT max(len(string_split(text, ' '))) FROM documents))) AS i)
        |WHERE i < len(string_split(text, ' '))
        |ORDER BY doc_id, pos""".stripMargin
  )
}
