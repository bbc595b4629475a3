package graft

import java.nio.file.{Files, Paths}
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-8 wave 86: the manifest-file table format's PROTOCOL claims
  * (operators/Manifest.scala) — the parts the DuckDB oracles can't
  * see. Oracles already pin the data: source_manifest ≡ orders and
  * source_manifest_timetravel ≡ the even-key half; here the isolation
  * and concurrency mechanics are exercised directly.
  */
class Wave86Spec extends SparkSpec {

  private def freshTable(prefix: String) = {
    val root = Files.createTempDirectory(prefix)
    val orders = Tables.table(spark, sfDir, "orders")
    val v1 = ManifestTable.appendCommit(root, ManifestTable.stage(
      orders.filter(col("o_orderkey") % 2 === 0).repartition(3), root, "b"))
    (root, orders, v1)
  }

  test("snapshot isolation: a pinned reader is untouched by a " +
    "concurrent append + compaction rewrite") {
    val (root, orders, v1) = freshTable("graft_mf_iso")
    val pinned = ManifestTable.read(spark, root, v1, orders.schema)
    val before = pinned.agg(count(lit(1)), sum("o_orderkey")).head()
    // rewrite the table AROUND the pinned version: append the odd
    // half, then compact everything into one file
    val v2 = ManifestTable.appendCommit(root, ManifestTable.stage(
      orders.filter(col("o_orderkey") % 2 === 1), root, "d"))
    val v3 = ManifestTable.compact(spark, root, v2, orders.schema, 1)
    assert(v2 == v1 + 1 && v3 == v1 + 2)
    // the pinned version re-reads IDENTICALLY post-rewrite — its files
    // are immutable and still referenced
    val after = ManifestTable.read(spark, root, v1, orders.schema)
      .agg(count(lit(1)), sum("o_orderkey")).head()
    assert(before == after, s"pinned snapshot drifted: $before -> $after")
    // and the new latest sees the full table through one file
    assert(ManifestTable.filesFor(root, v3).size == 1)
    assert(ManifestTable.read(spark, root, v3, orders.schema).count()
      == orders.count())
  }

  test("optimistic concurrency: a lost publish race retries onto the " +
    "next version and keeps both commits' files") {
    val (root, orders, v1) = freshTable("graft_mf_race")
    val added = ManifestTable.stage(
      orders.filter(col("o_orderkey") % 2 === 1), root, "d")
    // simulate a racing winner: another committer publishes v2 first
    val racer = ManifestTable.commit(root, ManifestTable.filesFor(root, v1))
    assert(racer == v1 + 1)
    // our append must LOSE the race on v2, retry, and land on v3 with
    // the racer's live set folded in — nothing dropped
    val v = ManifestTable.appendCommit(root, added)
    assert(v == v1 + 2, s"append landed on v$v, expected v${v1 + 2}")
    val live = ManifestTable.filesFor(root, v)
    assert(added.forall(live.contains), "append's own files were dropped")
    assert(ManifestTable.filesFor(root, racer).forall(live.contains),
      "the race winner's live set was dropped by the retry")
    assert(ManifestTable.read(spark, root, v, orders.schema).count()
      == orders.count())
  }

  test("staged files are invisible until a manifest references them") {
    val (root, orders, v1) = freshTable("graft_mf_stage")
    ManifestTable.stage(
      orders.filter(col("o_orderkey") % 2 === 1), root, "orphan")
    assert(ManifestTable.latestVersion(root) == v1,
      "staging must not advance the table version")
    assert(ManifestTable.read(spark, root, v1, orders.schema).count()
      == orders.filter(col("o_orderkey") % 2 === 0).count(),
      "unreferenced data files leaked into a snapshot read")
  }

  test("declared lifecycle queries equal their batch twins (sf0.001)") {
    val orders = Tables.table(spark, sfDir, "orders")
    assert(q("source_manifest").count() == orders.count())
    assert(q("source_manifest_timetravel").count()
      == orders.filter(col("o_orderkey") % 2 === 0).count())
  }
}
