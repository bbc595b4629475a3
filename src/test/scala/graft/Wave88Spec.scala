package graft

import java.nio.file.Files
import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-8 wave 88: incremental (version-range) manifest reads and the
  * exactly-once streaming sink — the protocol-level claims the two
  * oracles (which only see values) cannot check: the append-only guard,
  * the batch ledger's duplicate suppression, and racing same-batch
  * commits.
  */
class Wave88Spec extends SparkSpec {

  test("readIncremental v1→v2 yields exactly the appended batch; the " +
    "guard refuses a range that crosses the compaction") {
    val orders = Tables.table(spark, sfDir, "orders")
    val root = ManifestOps.lifecycleRoot(spark, sfDir)
    val inc = ManifestTable.readIncremental(spark, root, 1, 2, orders.schema)
    val expect = orders.filter(col("o_orderkey") % 2 === 1)
    assert(inc.count() == expect.count())
    assert(inc.agg(sum("o_orderkey")).head().getLong(0) ==
      expect.agg(sum("o_orderkey")).head().getLong(0))
    // v0→v1 primes a from-nothing consumer with the base batch
    val boot = ManifestTable.readIncremental(spark, root, 0, 1, orders.schema)
    assert(boot.count() == orders.filter(col("o_orderkey") % 2 === 0).count())
    // v2→v3 is the compaction: v2's files are gone from v3's list, so
    // file-level deltas would re-surface every row — the guard refuses
    val ex = intercept[IllegalArgumentException] {
      ManifestTable.readIncremental(spark, root, 2, 3, orders.schema)
    }
    assert(ex.getMessage.contains("append-only"))
  }

  test("commitBatch is idempotent: a replayed batch id neither commits " +
    "nor stages, even with different payload rows") {
    val root = Files.createTempDirectory("graft_mf_sink")
    val a = spark.range(10).withColumnRenamed("id", "k")
    val b = spark.range(99).withColumnRenamed("id", "k")
    val v1 = ManifestTable.commitBatch(a, root, 0L)
    assert(v1 == 1 && ManifestTable.committedBatches(root) == Set(0L))
    val dataFiles = {
      val s = Files.list(root.resolve("data"))
      try s.count() finally s.close()
    }
    // replay of batch 0 with a DIFFERENT frame: version unchanged,
    // content unchanged, no orphan data files staged
    val v2 = ManifestTable.commitBatch(b, root, 0L)
    assert(v2 == 1, s"duplicate batch won a new version v$v2")
    val again = {
      val s = Files.list(root.resolve("data"))
      try s.count() finally s.close()
    }
    assert(again == dataFiles, "duplicate replay staged orphan files")
    assert(ManifestTable.read(spark, root, 1, a.schema).count() == 10)
    // a genuinely new batch still lands
    val v3 = ManifestTable.commitBatch(b, root, 1L)
    assert(v3 == 2 && ManifestTable.committedBatches(root) == Set(0L, 1L))
    assert(ManifestTable.read(spark, root, 2, a.schema).count() == 109)
  }

  test("racing commits of the SAME batch id cannot both win; distinct " +
    "ids all land") {
    val root = Files.createTempDirectory("graft_mf_race2")
    val df = spark.range(5).withColumnRenamed("id", "k")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // 4 threads × batch ids {7, 7, 8, 9}: the duplicate 7 must
      // collapse to one commit whichever thread gets there first
      val futs = Seq(7L, 7L, 8L, 9L).map(id =>
        Future(ManifestTable.commitBatch(df, root, id)))
      Await.result(Future.sequence(futs), 120.seconds)
      assert(ManifestTable.latestVersion(root) == 3,
        s"expected 3 snapshots, got ${ManifestTable.latestVersion(root)}")
      assert(ManifestTable.committedBatches(root) == Set(7L, 8L, 9L))
      assert(ManifestTable.read(spark, root, 3, df.schema).count() == 15)
    } finally pool.shutdown()
  }

  test("stream_manifest_sink replays every micro-batch into the table " +
    "exactly once: read-back equals the batch events projection") {
    val got = q("stream_manifest_sink")
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "ts_us")
    assert(got.count() == ev.count())
    val g = got.agg(sum("event_id"), sum("ts_us")).head()
    val e = ev.agg(sum("event_id"), sum("ts_us")).head()
    assert(g == e)
  }
}
