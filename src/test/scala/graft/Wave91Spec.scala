package graft

import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-8 wave 91: reader-side stats pruning on the manifest table
  * and the length-curriculum sharder — the claims the oracles can't
  * check: the scan's actual file set, pruning honesty, stage
  * monotonicity and shard balance.
  */
class Wave91Spec extends SparkSpec {

  test("readPruned scans ONLY the stats-admitted files, and equals a " +
    "full scan + filter") {
    val orders = Tables.table(spark, sfDir, "orders")
    val root = ManifestOps.cowRoot(spark, sfDir)
    val v = ManifestTable.latestVersion(root)
    val mx = orders.agg(max("o_orderkey")).head().getLong(0)
    val (lo, hi) = (mx / 10, mx / 5)
    val entries = ManifestTable.entriesFor(root, v)
    val admitted = entries.filter(e => e.mayContain("o_orderkey", lo, hi))
    assert(admitted.size < entries.size,
      s"band [$lo,$hi] admits all ${entries.size} files — pruning inert")
    val pruned = ManifestTable.readPruned(spark, root, v, orders.schema,
      "o_orderkey", lo, hi)
    // the physical scan touches exactly the admitted paths
    val scanned = pruned.inputFiles.map(_.split('/').last).toSet
    assert(scanned == admitted.map(_.path).toSet,
      s"scan read $scanned, stats admit ${admitted.map(_.path).toSet}")
    // value equality with the unpruned protocol read
    val full = ManifestTable.read(spark, root, v, orders.schema)
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
    assert(pruned.orderBy("o_orderkey").collect().toSeq ==
      full.orderBy("o_orderkey").collect().toSeq)
    // empty band short-circuits to zero rows without touching files
    assert(ManifestTable.readPruned(spark, root, v, orders.schema,
      "o_orderkey", mx + 10, mx + 20).count() == 0)
  }

  test("train_curriculum stages are contiguous in the (n_tokens, " +
    "doc_id) order, sized within one row, and shards ramp together") {
    val rows = q("train_curriculum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    // stage sizes: exact ntile semantics — first n%4 stages get the
    // extra row
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1)
    assert((1L to 4L).map(sizes).sum == n)
    // contiguity: sort by the curriculum key; stages must be monotone
    val ordered = rows.sortBy(r => (r._2, r._1)).map(_._3)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b },
      "a later curriculum position landed in an earlier stage")
    // shards: round-robin in global order → every shard's stage
    // sequence ramps like the curriculum (monotone), and shard sizes
    // are within one row of each other
    val byShard = rows.sortBy(r => (r._2, r._1)).groupBy(_._4)
    assert(byShard.keySet == (0L to 7L).toSet)
    assert(byShard.values.map(_.length).max -
      byShard.values.map(_.length).min <= 1)
    byShard.values.foreach { sh =>
      val st = sh.map(_._3)
      assert(st.zip(st.tail).forall { case (a, b) => a <= b })
    }
  }
}
