package graft

import java.nio.file.Files
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 wave 102: the manifest lifecycle INTEGRATION — streaming
  * ingest (stats-carrying, idempotent), incremental consumption,
  * small-file OPTIMIZE, CoW merge, vacuum and the batch ledger, all
  * composed on one table in order. Each feature is spec-proved alone
  * in waves 86-99; this is the proof they compose.
  */
class Wave102Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def frame(lo: Long, n: Long) = {
    import spark.implicits._
    spark.range(lo, lo + n).select(col("id").as("k"),
      (col("id") * 7 % 100).as("v"))
  }

  test("ingest → drain → optimize → merge → vacuum compose on one table") {
    val root = Files.createTempDirectory("graft_mf_e2e")
    // 1) streaming ingest: three stats-carrying idempotent batches
    val v1 = ManifestTable.commitBatch(frame(0, 400).coalesce(1), root, 0L,
      statsKey = Some("k"))
    val v2 = ManifestTable.commitBatch(frame(400, 30).coalesce(1), root, 1L,
      statsKey = Some("k"))
    val v3 = ManifestTable.commitBatch(frame(430, 30).coalesce(1), root, 2L,
      statsKey = Some("k"))
    assert((v1, v2, v3) == (1, 2, 3))
    // incremental consumer drains v1→v3 = exactly batches 1..2's rows
    val drained = ManifestTable.readIncremental(spark, root, 1, 3, schema)
    assert(drained.count() == 60 &&
      drained.agg(min("k"), max("k")).head() ==
        org.apache.spark.sql.Row(400L, 459L))
    // 2) OPTIMIZE packs the two tiny tail files; the big base survives
    val v4 = ManifestTable.optimizeSmall(spark, root, 3, schema, "k",
      smallBytes = 2500)
    assert(v4 == 4)
    assert(ManifestTable.read(spark, root, 4, schema).count() == 460)
    // incremental across the optimize refuses (not append-only)
    intercept[IllegalArgumentException] {
      ManifestTable.readIncremental(spark, root, 3, 4, schema)
    }
    // 3) CoW merge over [100, 199]: bump v, delete k%10==0 in band
    val v5 = ManifestTable.mergeCoW(spark, root, 4, schema, "k", 100, 199) {
      df =>
        val in = col("k").between(100, 199)
        df.filter(!(in && col("k") % 10 === 0))
          .withColumn("v", when(in, col("v") + 1000L).otherwise(col("v")))
    }
    assert(v5 == 5)
    val merged = ManifestTable.read(spark, root, 5, schema)
    assert(merged.count() == 450)
    assert(merged.filter(col("v") >= 1000).count() == 90)
    // pinned pre-merge reader unaffected
    assert(ManifestTable.read(spark, root, 4, schema).count() == 460)
    // stats-pruned point read on the merged snapshot
    val pt = ManifestTable.readPruned(spark, root, 5, schema, "k", 150, 159)
    assert(pt.count() == 9 && pt.filter(col("v") < 1000).count() == 0)
    // 4) the batch ledger still dedupes a replay AFTER the rewrites
    assert(ManifestTable.commitBatch(frame(400, 30), root, 1L,
      statsKey = Some("k")) == 5)
    assert(ManifestTable.committedBatches(root) == Set(0L, 1L, 2L))
    // 5) vacuum to the optimize horizon: v4/v5 read, v3 dies
    ManifestTable.vacuum(root, keepFrom = 4, retainMillis = 0)
    assert(ManifestTable.read(spark, root, 5, schema).count() == 450)
    val v3Dead =
      try { ManifestTable.read(spark, root, 3, schema).count(); false }
      catch { case _: Exception => true }
    assert(v3Dead, "pre-horizon snapshot must not read after vacuum")
  }
}
