package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a ~Nx corpus from an existing SF dir by replica
  * expansion, for local scale-smoke runs (r4 VERDICT item 5 — "does the
  * Σc² / diameter / recall math hold at 10×?").
  *
  * Replication is NOT naive copying: identical copies would multiply
  * every posting-list count c by N and the exact dedup family's Σc²
  * work by N² — a skew stress test, not a scale test. Instead replica
  * r > 0 rewrites every 4th token to the replica tag, so
  *
  *  - intra-replica near-dup structure is PRESERVED (both members of a
  *    pair mutate the same positions → their Jaccard barely moves);
  *  - cross-replica similarity drops below the 0.2 mining threshold
  *    (only ~1/4 of shingles survive in both → J ≈ 0.14), like fresh
  *    crawl content that shares boilerplate but not documents;
  *  - posting lists grow ~linearly in N (each replica contributes its
  *    own shingle occurrences; hot boilerplate shingles overlap, which
  *    is exactly the skew a real 10× crawl brings).
  *
  * Embeddings: replica vectors are the source vectors rotated left by r
  * positions — norm-preserving, deterministic, and far from the
  * originals in cosine, so ANN bucket occupancy grows ~linearly too.
  *
  * Usage: runMain graft.ScaleSynth <srcSfDir> <outDir> <replicas>
  */
object ScaleSynth {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val reps = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val IdStride = 10000000L
    val docs = Tables.table(spark, src, "documents")
    (0 until reps).map { r =>
      val mutated =
        if (r == 0) docs.select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        else docs.select(
          (col("doc_id") + lit(r * IdStride)).as("doc_id"),
          expr(s"array_join(transform(split(text, ' '), " +
            s"(t, i) -> IF(i % 4 = 0, 'x$r', t)), ' ')").as("text"),
          col("lang"), col("source"), col("n_chars"))
      mutated
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = Tables.table(spark, src, "embeddings")
    (0 until reps).map { r =>
      if (r == 0) emb.select(col("vec_id"), col("embedding"), col("label"))
      else emb.select(
        (col("vec_id") + lit(r * IdStride)).as("vec_id"),
        expr(s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
          s"slice(embedding, 1, $r))").as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    // Entity tables for the analytics/telemetry smoke: replicas shift
    // every key by a disjoint stride, so a 10× synth has 10× entities
    // (users / customers / parts) each carrying its original series —
    // per-entity plan work is UNCHANGED and only entity cardinality
    // scales, which is exactly how a 10× fleet/market grows. Events get
    // a +r-second jitter so replica timelines interleave instead of
    // colliding on identical timestamps.
    val ev = Tables.events(spark, src)
    (0 until reps).map { r =>
      ev.select(
        (col("event_id") + lit(r * IdStride)).as("event_id"),
        timestamp_micros(col("ts_us") + lit(r * 1000000L)).as("ts"),
        (col("user_id") + lit(r * IdStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    val ord = Tables.table(spark, src, "orders")
    (0 until reps).map { r =>
      ord.select(
        (col("o_orderkey") + lit(r * IdStride)).as("o_orderkey"),
        (col("o_custkey") + lit(r * IdStride)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    val part = Tables.table(spark, src, "part")
    (0 until reps).map { r =>
      part.select(
        (col("p_partkey") + lit(r * IdStride)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/part.parquet")

    // Full relational closure for the composite-join smoke (tpch_*,
    // dq_expectations): lineitem rides its order's replica (all three
    // FKs shift by the same stride, so referential totality is
    // preserved replica-by-replica); customer/supplier shift keys;
    // nation/region are genuinely global dimensions and stay as-is —
    // exactly the part of the schema that does NOT grow with the fleet.
    val li = Tables.table(spark, src, "lineitem")
    (0 until reps).map { r =>
      li.select(
        (col("l_orderkey") + lit(r * IdStride)).as("l_orderkey"),
        (col("l_partkey") + lit(r * IdStride)).as("l_partkey"),
        (col("l_suppkey") + lit(r * IdStride)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")

    val cust = Tables.table(spark, src, "customer")
    (0 until reps).map { r =>
      cust.select(
        (col("c_custkey") + lit(r * IdStride)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/customer.parquet")

    val supp = Tables.table(spark, src, "supplier")
    (0 until reps).map { r =>
      supp.select(
        (col("s_suppkey") + lit(r * IdStride)).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/supplier.parquet")

    Tables.table(spark, src, "nation")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/nation.parquet")
    Tables.table(spark, src, "region")
      .write.mode(SaveMode.Overwrite).parquet(s"$out/region.parquet")

    println(s"[synth] wrote ${reps}x ${src} -> $out")
    spark.stop()
  }
}
