package graft

import java.nio.file.{Files, Path}
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-9 wave 133: PARQUET checkpoint encoding + the two-level
  * manifest list — the last two representational gaps FORMAT.md named
  * ("text manifests vs avro/parquet", "single-level delta chain vs
  * Iceberg's two-level manifest lists"). Claims proven here: full
  * checkpoints write columnar segment files whose resolution is
  * byte-equal to the logical entry list (typed bounds included, nasty
  * strings included), legacy TEXT checkpoints still resolve and
  * convert on the next checkpoint, the parquet encoding is smaller
  * than the text encoding at realistic entry counts, pruned PLANNING
  * reads only the segments whose manifest-list bounds intersect the
  * predicate, and orphan segments from lost races are vacuumable
  * without touching referenced ones.
  */
class Wave133Spec extends SparkSpec {

  private def header(root: Path, v: Int): String =
    Files.readAllLines(root.resolve("_manifests").resolve(f"v$v%05d.txt"))
      .get(0)
  private def bodyLines(root: Path, v: Int): Seq[String] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(root.resolve("_manifests").resolve(f"v$v%05d.txt")))
      .asScala.drop(1).filter(_.nonEmpty).toSeq
  private def segFiles(root: Path, v: Int): Seq[Path] =
    bodyLines(root, v).map(l => root.resolve("_manifests")
      .resolve(l.drop(1).split('\t').head))

  test("a full checkpoint writes parquet segments, the commit file is " +
    "the manifest list, and typed bounds round-trip the columnar " +
    "encoding byte-exactly") {
    val root = Files.createTempDirectory("graft_mf_pq")
    // synthetic entries with BOTH bound kinds incl. separator-hostile
    // strings — no data files needed for log-level claims
    val nasty = Seq("a:b", "c,d", "e\tf", "g\nh", "ü", "zz")
    val lines = (0 until 50).map { i =>
      ManifestTable.FileEntry(f"f$i%04d.parquet",
        Seq("k" -> (i * 10L, i * 10L + 9L)),
        Seq("tag" -> (nasty(i % 6), nasty((i + 1) % 6)))).line
    }
    val v1 = ManifestTable.commit(root, lines)
    assert(header(root, v1).contains("body=seg"),
      s"checkpoint did not go parquet: ${header(root, v1)}")
    assert(bodyLines(root, v1).forall(_.startsWith("@")),
      "manifest-list body must hold only segment descriptors")
    assert(segFiles(root, v1).forall(Files.exists(_)))
    // resolution is byte-equal to the logical entry list, order kept
    val es = ManifestTable.entriesFor(root, v1)
    assert(es.map(_.line) == lines,
      "parquet resolution diverged from the committed entry list")
    // and a read through the normal API agrees after a delta on top
    val v2 = ManifestTable.appendCommit(root,
      Seq(ManifestTable.FileEntry("late.parquet",
        Seq("k" -> (500L, 505L)), Nil).line))
    assert(ManifestTable.filesFor(root, v2).size == 51)
  }

  test("legacy TEXT checkpoints resolve unchanged, deltas stack on " +
    "them, and the next forced checkpoint converts to parquet") {
    val root = Files.createTempDirectory("graft_mf_legacy")
    val d = root.resolve("_manifests")
    Files.createDirectories(d)
    // a pre-wave-133 checkpoint, byte-for-byte as the old code wrote it
    Files.write(d.resolve("v00001.txt"),
      ("# graft-manifest version=1 parent=0 ts=1000\n" +
        "f1.parquet\tk:0:9\nf2.parquet\tk:10:19\n").getBytes("UTF-8"))
    assert(ManifestTable.entriesFor(root, 1).map(_.path) ==
      Seq("f1.parquet", "f2.parquet"))
    // 8 deltas on top: the 8th chained commit forces a checkpoint,
    // which lands in the NEW encoding and resolves the union
    (0 until 8).foreach { i =>
      ManifestTable.appendCommit(root,
        Seq(ManifestTable.FileEntry(s"g$i.parquet",
          Seq("k" -> (100L + i, 100L + i)), Nil).line))
    }
    assert(header(root, 9).contains("body=seg"),
      s"forced checkpoint stayed text: ${header(root, 9)}")
    assert(ManifestTable.filesFor(root, 9).size == 10)
    assert(ManifestTable.entriesFor(root, 9)
      .forall(_.band("k").isDefined), "stats lost crossing encodings")
  }

  test("at realistic entry counts the parquet checkpoint is SMALLER " +
    "than the text encoding and shards into ceil(n/1024) segments") {
    val root = Files.createTempDirectory("graft_mf_size")
    val lines = (0 until 5000).map { i =>
      ManifestTable.FileEntry(f"part-$i%05d-c000.snappy.parquet",
        Seq("k" -> (i * 10L, i * 10L + 9L),
          "ts" -> (1700000000000L + i, 1700000000000L + i + 86400000L)),
        Nil).line
    }
    val v1 = ManifestTable.commit(root, lines)
    val segs = segFiles(root, v1)
    assert(segs.size == 5, s"expected 5 segments for 5000 entries: $segs")
    val parquetBytes = segs.map(Files.size).sum
    val textBytes = lines.map(_.length + 1L).sum
    assert(parquetBytes < textBytes,
      s"parquet checkpoint $parquetBytes B >= text $textBytes B — " +
      "the encoding does not pay")
    // the manifest list itself is tiny: O(segments), not O(files)
    val listBytes = bodyLines(root, v1).map(_.length + 1L).sum
    assert(listBytes * 100 < textBytes,
      s"manifest list $listBytes B is not O(segments)")
  }

  test("pruned PLANNING reads only the segments whose manifest-list " +
    "bounds intersect the predicate; deltas stack without extra " +
    "segment IO") {
    val root = Files.createTempDirectory("graft_mf_twolevel")
    val lines = (0 until 5000).map { i =>
      ManifestTable.FileEntry(f"f$i%05d.parquet",
        Seq("k" -> (i * 10L, i * 10L + 9L)), Nil).line
    }
    val v1 = ManifestTable.commit(root, lines)
    // a narrow band inside segment 2 (entries 2048..3071)
    val (hit, segsRead, segsTotal) = ManifestTable.prunedEntries(root, v1,
      Seq(("k", 25000L, 25099L)), Nil)
    assert(segsTotal == 5 && segsRead == 1,
      s"narrow band read $segsRead/$segsTotal segments — planning is " +
      "not two-level")
    val want = (0 until 5000).filter(i =>
      i * 10L <= 25099L && i * 10L + 9L >= 25000L)
      .map(i => f"f$i%05d.parquet")
    assert(hit.map(_.path) == want, "pruned planning admitted wrong set")
    // a delta add inside the band: admitted with the SAME segment IO
    val v2 = ManifestTable.appendCommit(root,
      Seq(ManifestTable.FileEntry("inband.parquet",
        Seq("k" -> (25050L, 25060L)), Nil).line))
    val (hit2, segsRead2, _) = ManifestTable.prunedEntries(root, v2,
      Seq(("k", 25000L, 25099L)), Nil)
    assert(segsRead2 == 1 && hit2.map(_.path) == want :+ "inband.parquet")
    // and a band intersecting nothing reads NO segments
    val (none, zeroRead, _) = ManifestTable.prunedEntries(root, v1,
      Seq(("k", 99000000L, 99000001L)), Nil)
    assert(none.isEmpty && zeroRead == 0)
  }

  test("orphan segments (lost races) vacuum under the retention rule; " +
    "referenced segments survive") {
    val root = Files.createTempDirectory("graft_mf_orphan")
    val v1 = ManifestTable.commit(root, (0 until 10).map(i =>
      ManifestTable.FileEntry(s"f$i.parquet",
        Seq("k" -> (i.toLong, i.toLong)), Nil).line))
    val d = root.resolve("_manifests")
    val referenced = segFiles(root, v1).map(_.getFileName.toString).toSet
    Files.write(d.resolve("cpdeadbeef-s0.parquet"), Array[Byte](1, 2, 3))
    // inside the horizon: kept (an in-flight committer looks like this)
    assert(ManifestTable.vacuumOrphanSegments(root).isEmpty)
    // horizon 0: the orphan dies, every referenced segment survives
    val dead = ManifestTable.vacuumOrphanSegments(root, retainMillis = 0)
    assert(dead == Seq("cpdeadbeef-s0.parquet"), s"vacuumed: $dead")
    assert(referenced.forall(n => Files.exists(d.resolve(n))))
    assert(ManifestTable.filesFor(root, v1).size == 10)
  }
}
