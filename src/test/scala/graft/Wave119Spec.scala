package graft

import java.nio.file.Files
import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-9 wave 119: protocol hardening — a real multithreaded commit
  * storm against the OCC core (no version lost, no file dropped,
  * checkpoint cadence intact under contention) and physical-plan
  * assertions for the new read paths (the MOR subtraction joins must
  * broadcast the sidecar, never shuffle the table).
  */
class Wave119Spec extends SparkSpec {

  test("8 writers × 10 racing appendCommits: every commit wins a " +
    "distinct version, no file is lost, and the delta/checkpoint " +
    "cadence holds under contention") {
    val root = Files.createTempDirectory("graft_mf_storm")
    // pure log-level storm: commit fabricated paths (the OCC protocol
    // never inspects data files), maximizing publish-race pressure
    val threads = (0 until 8).map { t =>
      new Thread(() =>
        (0 until 10).foreach { i =>
          ManifestTable.appendCommit(root, Seq(f"storm-$t-$i.parquet"))
        })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val latest = ManifestTable.latestVersion(root)
    assert(latest == 80, s"80 commits must win 80 versions, got $latest")
    val live = ManifestTable.filesFor(root, latest)
    assert(live.size == 80 && live.toSet.size == 80,
      s"files lost in the storm: ${live.size} live")
    assert(live.toSet == (for (t <- 0 until 8; i <- 0 until 10)
      yield f"storm-$t-$i.parquet").toSet)
    // cadence: depth never exceeds the checkpoint bound, and at least
    // one checkpoint landed after v1 (80 commits ≫ CheckpointEvery)
    val kinds = (1 to latest).map(v =>
      ManifestTable.headerMeta(root, v).get("depth").map(_.toInt))
    assert(kinds.flatten.forall(d => d >= 1 && d <= 7),
      "a delta chain outran the checkpoint cadence")
    assert(kinds.count(_.isEmpty) >= 80 / 8,
      "contention starved the checkpoint cadence")
    // every intermediate version still resolves to a consistent
    // prefix-closed set (monotone growth for pure appends)
    (1 until latest).foreach { v =>
      assert(ManifestTable.filesFor(root, v).toSet
        .subsetOf(ManifestTable.filesFor(root, v + 1).toSet))
    }
  }

  test("MOR subtraction plans broadcast the sidecar: key-based anti, " +
    "scoped anti and the replicate read never shuffle the base scan") {
    val orders = Tables.table(spark, sfDir, "orders")
    val mor = ManifestTable.readMOR(spark,
      ManifestOps.morRoot(spark, sfDir), 2, orders.schema, "o_orderkey")
    val pMor = plan(mor)
    assert(pMor.contains("BroadcastHashJoin") &&
      pMor.contains("LeftAnti"),
      s"key-based MOR read must broadcast-anti the DV:\n$pMor")
    assert(!pMor.contains("SortMergeJoin"),
      "MOR subtraction shuffled the table")
    val scoped = ManifestTable.readMORScoped(spark,
      ManifestOps.morScopedRoot(spark, sfDir), 3, orders.schema,
      "o_orderkey")
    val pSc = plan(scoped)
    assert(pSc.contains("BroadcastHashJoin") && pSc.contains("LeftAnti"),
      s"scoped MOR read must broadcast-anti the sidecar:\n$pSc")
    assert(!pSc.contains("SortMergeJoin"),
      "scoped subtraction shuffled the table")
  }
}
