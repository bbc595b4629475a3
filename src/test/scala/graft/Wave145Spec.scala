package graft

import java.nio.file.{Files, Path}

import graft.operators.ManifestTable
import graft.operators.ManifestTable.FileEntry

/** Round-10 wave 145: COLUMNAR DELTA manifests (r9-VERDICT task 4 —
  * checkpoints got the wave-133 parquet segments; `+`/`-` delta bodies
  * were still text lines). Claims proven here:
  *
  *  - a delta with ≥ DeltaSegEntries adds writes them as parquet
  *    segments listed as @descriptors (no `+` lines), and the commit
  *    file's BODY is far smaller than the text encoding of the same
  *    adds; a smaller delta stays inline text (the Delta-Lake
  *    JSON-delta trade)
  *  - resolution through a mixed chain (checkpoint → columnar delta →
  *    text delta → removes) is byte-identical to the text encoding:
  *    same entries, same stats, same order semantics
  *  - pruned planning skips a columnar delta's segment when the
  *    descriptor's aggregate bounds prove disjointness (counter
  *    asserted — the wave-133 IO assertion, now on the delta level)
  *  - removes may target paths added by an earlier columnar segment;
  *    the re-add guard still fires through segment adds
  *  - vacuumOrphanSegments keeps delta-referenced segments and still
  *    sweeps orphans
  */
class Wave145Spec extends SparkSpec {

  private def fresh(tag: String): Path = {
    val root = Files.createTempDirectory(s"graft_w145_$tag").resolve("t")
    Files.createDirectories(root)
    root
  }

  private def entry(i: Int, tag: String = "f"): FileEntry =
    FileEntry(f"$tag-$i%05d.parquet",
      Seq("k" -> (i * 10L, i * 10L + 9L)),
      Seq("b" -> (f"br$i%03d", f"br$i%03dz")))

  private def manifestBody(root: Path, v: Int): Seq[String] = {
    val f = root.resolve("_manifests").resolve(f"v$v%05d.txt")
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(f)).asScala.toSeq.drop(1).filter(_.nonEmpty)
  }

  test("a large delta goes columnar: @descriptor body, no + lines, " +
    "body bytes far below the text encoding; a small delta stays text") {
    val root = fresh("enc")
    val base = (0 until 10).map(entry(_))
    ManifestTable.commit(root, base.map(_.line))
    val n = ManifestTable.DeltaSegEntries
    val big = (100 until 100 + n).map(entry(_))
    val v2 = ManifestTable.appendCommit(root, big.map(_.line))
    val body2 = manifestBody(root, v2)
    assert(body2.nonEmpty && body2.forall(_.startsWith("@")),
      s"expected @descriptors only, got ${body2.take(3)}")
    val textBytes = big.map(_.line.length + 2).sum
    val bodyBytes = body2.map(_.length + 1).sum
    assert(bodyBytes < textBytes / 4,
      s"columnar delta body $bodyBytes B should be <<" +
      s" text encoding $textBytes B")
    // one below the threshold stays inline
    val small = (500 until 500 + n - 1).map(entry(_))
    val v3 = ManifestTable.appendCommit(root, small.map(_.line))
    val body3 = manifestBody(root, v3)
    assert(body3.forall(_.startsWith("+")),
      s"sub-threshold delta must stay text: ${body3.take(3)}")
    // resolution sees every entry with exact stats either way
    val es = ManifestTable.entriesFor(root, v3)
    assert(es.map(_.line).sorted ==
      (base ++ big ++ small).map(_.line).sorted,
      "chain resolution diverged from the committed entries")
  }

  test("pruned planning skips a columnar delta's segment when the " +
    "descriptor bounds are disjoint, reads it when they intersect") {
    val root = fresh("prune")
    ManifestTable.commit(root,
      (0 until 10).map(entry(_)).map(_.line))
    val n = ManifestTable.DeltaSegEntries
    ManifestTable.appendCommit(root,
      (1000 until 1000 + n).map(entry(_)).map(_.line))
    val v = ManifestTable.latestVersion(root)
    // two segments total: the base CHECKPOINT's (wave 133) and the
    // columnar DELTA's. A band inside the base keyspace reads only
    // the checkpoint's; the delta's descriptor proves disjointness.
    val (hit1, r1, t1) = ManifestTable.prunedEntries(root, v,
      Seq(("k", 20L, 39L)), Nil)
    assert(hit1.map(_.path).toSet ==
      Set(entry(2).path, entry(3).path))
    assert(t1 == 2 && r1 == 1,
      s"disjoint delta segment must not be read: read=$r1 listed=$t1")
    // band inside the DELTA keyspace: delta segment read, checkpoint
    // segment skipped
    val (hit2, r2, t2) = ManifestTable.prunedEntries(root, v,
      Seq(("k", 10050L, 10069L)), Nil)
    assert(hit2.map(_.path).toSet ==
      Set(entry(1005).path, entry(1006).path))
    assert(t2 == 2 && r2 == 1,
      s"intersecting delta segment must be read: read=$r2 listed=$t2")
    // string-band prune rides the same descriptor bounds
    val (hit3, r3, _) = ManifestTable.prunedEntries(root, v, Nil,
      Seq(("b", Some("br005"), Some("br005z"))))
    assert(hit3.map(_.path).toSet == Set(entry(5).path) && r3 == 1,
      s"string band must admit exactly br005 via the checkpoint " +
      s"segment only: ${hit3.map(_.path)} read=$r3")
  }

  test("removes target columnar-segment adds; the re-add guard fires " +
    "through segments; a mixed chain resolves exactly") {
    val root = fresh("mix")
    val n = ManifestTable.DeltaSegEntries
    ManifestTable.commit(root, (0 until 5).map(entry(_)).map(_.line))
    val big = (100 until 100 + n).map(entry(_))
    ManifestTable.appendCommit(root, big.map(_.line))
    // CoW-style delta: remove two segment-added files, add one text
    val v3 = ManifestTable.commitOps(root,
      Seq(entry(9000).line), Seq(big(0).path, big(1).path))
    val es = ManifestTable.entriesFor(root, v3)
    assert(!es.map(_.path).contains(big(0).path) &&
      !es.map(_.path).contains(big(1).path) &&
      es.map(_.path).contains(entry(9000).path) &&
      es.size == 5 + n - 2 + 1,
      s"mixed chain resolution wrong: ${es.size} entries")
    // re-adding a path that lives via a columnar segment must fail
    val dup = intercept[Exception] {
      ManifestTable.appendCommit(root,
        (0 until n).map(i => if (i == 3) big(5) else entry(2000 + i))
          .map(_.line))
      // the guard fires on RESOLUTION (rawLines validates the chain)
      ManifestTable.entriesFor(root, ManifestTable.latestVersion(root))
    }
    assert(dup.getMessage.contains("re-adds"),
      s"expected the re-add guard, got: ${dup.getMessage}")
  }

  test("vacuumOrphanSegments keeps delta-referenced segments, sweeps " +
    "orphans") {
    val root = fresh("vac")
    val n = ManifestTable.DeltaSegEntries
    ManifestTable.commit(root, (0 until 5).map(entry(_)).map(_.line))
    ManifestTable.appendCommit(root,
      (100 until 100 + n).map(entry(_)).map(_.line))
    val md = root.resolve("_manifests")
    // plant an orphan older than the horizon
    val orphan = md.resolve("cpORPHAN-s0.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
    val swept = ManifestTable.vacuumOrphanSegments(root)
    assert(swept == Seq("cpORPHAN-s0.parquet"),
      s"orphan sweep took the wrong files: $swept")
    // the live chain still resolves (its segments survived)
    assert(ManifestTable.entriesFor(root,
      ManifestTable.latestVersion(root)).size == 5 + n)
  }
}
