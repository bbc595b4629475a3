package graft

import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-8 wave 90: ADD COLUMN schema evolution in the manifest format
  * and the streaming mergeable-histogram quantile — the claims the
  * oracles can't check: zero-rewrite evolution, old-reader isolation,
  * the schema-meta roundtrip, and the sketch's bin-width error bound
  * against exact percentiles.
  */
class Wave90Spec extends SparkSpec {

  test("ADD COLUMN rewrites nothing: v1's files survive into v2 " +
    "verbatim, and a v1 reader still sees the narrow schema") {
    val root = ManifestOps.evoRoot(spark, sfDir)
    val v1Files = ManifestTable.filesFor(root, 1).toSet
    val v2Files = ManifestTable.filesFor(root, 2).toSet
    assert(v1Files.subsetOf(v2Files),
      "schema evolution rewrote v1 data files — not metadata-only")
    // pinned old reader: v1 under v1's own recorded (3-column) schema
    val v1 = ManifestTable.readEvolved(spark, root, 1)
    assert(v1.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
    val orders = Tables.table(spark, sfDir, "orders")
    assert(v1.count() == orders.filter(col("o_orderkey") % 2 === 0).count())
    // evolved reader: v2 schema is the widened one; the old files'
    // rows null-fill exactly the pre-evolution keys
    val v2 = ManifestTable.readEvolved(spark, root, 2)
    assert(v2.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"))
    assert(v2.filter(col("o_orderpriority").isNull)
      .agg(count(lit(1)), sum(col("o_orderkey") % 2)).head() ==
      org.apache.spark.sql.Row(
        orders.filter(col("o_orderkey") % 2 === 0).count(), 0L))
  }

  test("schema meta roundtrips the DDL types it allows and rejects " +
    "space-carrying ones") {
    import org.apache.spark.sql.types._
    val s = StructType(Seq(StructField("k", LongType),
      StructField("p", DecimalType(12, 2)), StructField("s", StringType),
      StructField("m", MapType(StringType, LongType))))
    assert(ManifestTable.parseSchemaMeta(ManifestTable.schemaMeta(s))
      .fields.map(f => (f.name, f.dataType)).toSeq ==
      s.fields.map(f => (f.name, f.dataType)).toSeq)
    // `interval day to second` renders with spaces — the one class the
    // space-split header line cannot carry
    val bad = StructType(Seq(StructField("i", DayTimeIntervalType())))
    assertThrows[IllegalArgumentException](ManifestTable.schemaMeta(bad))
  }

  test("stream_quantile estimates sit within one bin width of the " +
    "exact percentiles, and the histogram state is grid-sized") {
    val got = q("stream_quantile").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ev = Tables.events(spark, sfDir)
    val types = got.keySet
    assert(types.nonEmpty)
    types.foreach { t =>
      val vals = ev.filter(col("event_type") === t)
        .select("value").collect().map(_.getDouble(0)).sorted
      val (n, p50, p90, p99) = got(t)
      assert(n == vals.length)
      def exact(qq: Double) = vals(math.ceil(qq * n).toInt - 1)
      // the estimate is the lower edge of the bin holding the exact
      // ceil-rank order statistic → error < 1.0 bin width, one-sided
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (qq, est) =>
        val ex = exact(qq)
        assert(est <= ex + 0.5 && ex - est < 1.0,
          s"$t q=$qq: est $est vs exact $ex breaks the bin bound")
      }
    }
    // state size = |types| x |unit bins over the value domain|
    val bins = ev.select(
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT) div 100").as("b"),
      col("event_type")).distinct().count()
    assert(bins < 3000, s"histogram grid unexpectedly large: $bins")
  }
}
