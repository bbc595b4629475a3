package graft

import java.nio.file.Files
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-9 wave 138: LOG retention — expireManifests deletes the
  * manifest files no kept version's resolution can reach, bounding
  * `_manifests/` growth over table lifetime (the unbounded-metadata
  * twin of the data-file problem vacuum solves). Claims proven here:
  * expiry keeps exactly chainBase(keepFrom)..latest, every kept
  * version still resolves byte-identically, expired reads fail loudly,
  * latestVersion survives losing BOTH hints via the listing fallback,
  * the header-scanning surfaces (ledger, history, versionAt) truncate
  * to the kept range instead of crashing, vacuum composes after
  * expiry, and the expired checkpoints' segments fall to the orphan
  * sweep.
  */
class Wave138Spec extends SparkSpec {

  private def build(n: Int) = {
    val root = Files.createTempDirectory("graft_mf_expire")
    val df = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    val v1 = ManifestTable.commit(root, ManifestTable.stage(
      df.repartition(2), root, "base"))
    (2 to n).foreach { i =>
      ManifestTable.commitBatch(
        spark.range(100L + i, 102L + i)
          .select(col("id").as("k"), (col("id") * 2).as("v")),
        root, batchId = i.toLong)
    }
    assert(v1 == 1 && ManifestTable.latestVersion(root) == n)
    (root, df)
  }

  test("expiry keeps chainBase(keepFrom)..latest; kept versions resolve " +
    "identically; expired versions fail loudly") {
    val (root, df) = build(20)
    val wantFiles = (17 to 20).map(v =>
      v -> ManifestTable.filesFor(root, v)).toMap
    // CheckpointEvery=8 => checkpoints at 1, 9, 17; chainBase(18) = 17
    val dead = ManifestTable.expireManifests(root, keepFrom = 18)
    assert(dead == (1 to 16).map(v => f"v$v%05d.txt"),
      s"expired wrong set: $dead")
    assert(ManifestTable.firstVersion(root) == 17)
    assert(ManifestTable.latestVersion(root) == 20)
    wantFiles.foreach { case (v, want) =>
      assert(ManifestTable.filesFor(root, v) == want,
        s"v$v resolves differently after expiry") }
    assert(ManifestTable.read(spark, root, 20, df.schema).count() ==
      100 + 19 * 2)
    val e = intercept[IllegalStateException] {
      ManifestTable.filesFor(root, 9) }
    assert(e.getMessage.contains("expired"))
    // re-expiry with the same horizon is a no-op
    assert(ManifestTable.expireManifests(root, keepFrom = 18).isEmpty)
  }

  test("latestVersion and firstVersion survive losing both hints after " +
    "expiry (listing fallback)") {
    val (root, _) = build(20)
    ManifestTable.expireManifests(root, keepFrom = 18)
    Files.deleteIfExists(root.resolve("_manifests").resolve("_latest"))
    Files.deleteIfExists(root.resolve("_manifests").resolve("_first"))
    assert(ManifestTable.latestVersion(root) == 20,
      "latestVersion lost the table when v00001 is expired and the " +
      "hint is gone")
    assert(ManifestTable.firstVersion(root) == 17)
  }

  test("the header-scanning surfaces truncate to the kept range: " +
    "ledger, history, versionAt; vacuum and the orphan sweep compose") {
    val (root, df) = build(20)
    val t17 = ManifestTable.commitTime(root, 17)
    ManifestTable.expireManifests(root, keepFrom = 17)
    // ledger: kept-range batch ids only (13..20 ride versions 13..20 —
    // expired ids are forgotten, the documented retention contract)
    val ledger = ManifestTable.committedBatches(root)
    assert(ledger == (17 to 20).map(_.toLong).toSet, s"ledger: $ledger")
    // a kept batch id still no-ops; an expired one re-lands (documented)
    val before = ManifestTable.latestVersion(root)
    ManifestTable.commitBatch(df.limit(1), root, 19L)
    assert(ManifestTable.latestVersion(root) == before)
    // history = kept range
    val hist = ManifestTable.history(spark, root)
      .select("version").collect().map(_.getLong(0)).sorted
    assert(hist.toSeq == (17L to 20L))
    // versionAt at the first kept commit's time resolves; earlier throws
    assert(ManifestTable.versionAt(root, t17) >= 17)
    intercept[IllegalArgumentException] {
      ManifestTable.versionAt(root, t17 - 1000000L) }
    // vacuum after expiry: files only referenced by expired versions
    // die (v1..16 content that v17+ no longer lists), kept reads intact
    ManifestTable.vacuum(root, keepFrom = 17, retainMillis = 0)
    assert(ManifestTable.read(spark, root, 20, df.schema).count() ==
      100 + 19 * 2)
    // expired checkpoints' parquet segments are unreferenced now
    val orphans = ManifestTable.vacuumOrphanSegments(root, retainMillis = 0)
    assert(orphans.nonEmpty,
      "expired checkpoints (v1, v9) left no orphan segments to sweep?")
    assert(ManifestTable.read(spark, root, 20, df.schema).count() ==
      100 + 19 * 2)
  }
}
