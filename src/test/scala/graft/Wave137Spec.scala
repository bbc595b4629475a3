package graft

import java.nio.file.Files
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-9 wave 137: the INCREMENTAL batch ledger — commitBatch's
  * idempotency check now reads only the headers committed since the
  * JVM last looked (a long-lived sink previously paid O(versions)
  * header IO per micro-batch, O(n²) cumulative). Claims proven here:
  * replay still no-ops with the cache warm, a commit landed by ANOTHER
  * writer (cache-invisible) is still honored — the cache must re-read
  * the suffix, never trust its bound — racing replays of one batch id
  * land exactly one commit, and distinct ids all land.
  */
class Wave137Spec extends SparkSpec {

  private def df(n: Long) = spark.range(n)
    .select(col("id").as("k"), (col("id") * 2).as("v"))

  test("replay no-ops with a warm cache; distinct batch ids all land") {
    val root = Files.createTempDirectory("graft_mf_ledger")
    (0L until 10L).foreach(b => ManifestTable.commitBatch(df(5), root, b))
    assert(ManifestTable.latestVersion(root) == 10)
    assert(ManifestTable.committedBatches(root) == (0L until 10L).toSet)
    // warm-cache replays: no new version, no orphan growth in the log
    (0L until 10L).foreach(b => ManifestTable.commitBatch(df(5), root, b))
    assert(ManifestTable.latestVersion(root) == 10,
      "a replayed batch committed again")
    assert(ManifestTable.read(spark, root, 10, df(5).schema).count() == 50)
  }

  test("a batch committed by another writer (cache-invisible) still " +
    "no-ops: the ledger re-reads the suffix, never trusts its bound") {
    val root = Files.createTempDirectory("graft_mf_ledger2")
    ManifestTable.commitBatch(df(5), root, 1L) // warms the cache
    // another process's sink commit, bypassing this JVM's cache path
    ManifestTable.appendCommit(root, ManifestTable.stage(
      df(3).coalesce(1), root, "alien"), meta = "batch=7")
    val before = ManifestTable.latestVersion(root)
    ManifestTable.commitBatch(df(99), root, 7L)
    assert(ManifestTable.latestVersion(root) == before,
      "batch 7 double-committed — the cache trusted a stale bound")
  }

  test("racing replays of one batch id land exactly one commit") {
    val root = Files.createTempDirectory("graft_mf_ledger3")
    ManifestTable.commitBatch(df(5), root, 0L)
    val threads = (1 to 4).map { _ =>
      new Thread(() => ManifestTable.commitBatch(df(8), root, 1L): Unit)
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val batchCommits = (1 to ManifestTable.latestVersion(root)).count(v =>
      ManifestTable.headerMeta(root, v).get("batch").contains("1"))
    assert(batchCommits == 1,
      s"batch 1 landed $batchCommits times under racing replays")
    assert(ManifestTable.read(spark, root,
      ManifestTable.latestVersion(root), df(5).schema).count() == 13)
  }
}
