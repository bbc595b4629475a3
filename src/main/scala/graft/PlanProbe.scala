package graft

import java.nio.file.Files
import graft.operators.ManifestTable

/** Measurement harness for the manifest format's PLANNING cost at a
  * realistic file count — the wave-133/134 claim made concrete: on a
  * table whose checkpoint lists N files, how long does resolving the
  * full live set take vs a band-pruned plan that rides the two-level
  * manifest list? No SparkSession — planning is pure driver IO, which
  * is exactly the point (Spark plans a 100 TB scan from metadata).
  *
  * Usage: `runMain graft.PlanProbe [nFiles]` (default 200000). Prints
  * one line per measurement; segment caches are cleared between
  * timings by using a fresh JVM per run (run it once per number you
  * quote).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val root = Files.createTempDirectory("graft_planprobe")
    val lines = (0 until n).map { i =>
      ManifestTable.FileEntry(f"part-$i%07d-c000.snappy.parquet",
        Seq("k" -> (i * 10L, i * 10L + 9L),
          "ts" -> (1700000000000L + i, 1700000000000L + i + 86400000L)),
        Nil).line
    }
    val t0 = System.nanoTime()
    val v1 = ManifestTable.commit(root, lines)
    val tCommit = (System.nanoTime() - t0) / 1e6
    val segs = Files.list(root.resolve("_manifests"))
    val segBytes =
      try {
        import scala.jdk.CollectionConverters._
        segs.iterator().asScala.filter(_.getFileName.toString
          .endsWith(".parquet")).map(Files.size).sum
      } finally segs.close()
    // cold full resolution (first read pays the parquet segment IO)
    val t1 = System.nanoTime()
    val full = ManifestTable.entriesFor(root, v1)
    val tFull = (System.nanoTime() - t1) / 1e6
    // banded plan on a fresh table state is not possible in one JVM
    // without defeating the cache — so measure the banded plan FIRST
    // on a clone table instead: rebuild and prune before resolving
    val root2 = Files.createTempDirectory("graft_planprobe2")
    val v2 = ManifestTable.commit(root2, lines)
    val t2 = System.nanoTime()
    val (hit, segsRead, segsTotal) = ManifestTable.prunedEntries(
      root2, v2, Seq(("k", n * 5L, n * 5L + 999L)), Nil)
    val tPruned = (System.nanoTime() - t2) / 1e6
    println(f"[planprobe] n=$n commit=${tCommit}%.0fms " +
      f"segBytes=${segBytes / 1024}%dKiB fullResolve=${tFull}%.0fms " +
      f"(${full.size} entries) prunedPlan=${tPruned}%.0fms " +
      f"(${hit.size} admitted, $segsRead/$segsTotal segments read)")

    // DELTA-CHAIN resolution cost (round 10 — columnar deltas): a
    // checkpoint + one large appendCommit whose adds land in a parquet
    // segment (@descriptor body). Reports the delta's commit bytes
    // (commit file + its segments — the O(delta) claim under the
    // columnar encoding) and the chain-resolved pruned plan, where a
    // band disjoint from the delta's adds must skip its segment.
    val root3 = Files.createTempDirectory("graft_planprobe3")
    ManifestTable.commit(root3, lines)
    val md = root3.resolve("_manifests")
    def segNames(): Set[String] = {
      val s = Files.list(md)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".parquet")).toSet
      } finally s.close()
    }
    val before = segNames()
    val dAdds = (0 until n / 20).map { i =>
      ManifestTable.FileEntry(f"delta-$i%07d-c000.snappy.parquet",
        Seq("k" -> (n * 10L + i * 10L, n * 10L + i * 10L + 9L)), Nil).line
    }
    val t3 = System.nanoTime()
    val v3 = ManifestTable.appendCommit(root3, dAdds)
    val tDelta = (System.nanoTime() - t3) / 1e6
    val deltaCommitBytes = Files.size(md.resolve(f"v$v3%05d.txt"))
    val deltaSegBytes = (segNames() -- before).toSeq
      .map(n0 => Files.size(md.resolve(n0))).sum
    val t4 = System.nanoTime()
    val chain = ManifestTable.entriesFor(root3, v3)
    val tChain = (System.nanoTime() - t4) / 1e6
    // band inside the BASE keyspace: the delta's segment is disjoint
    val t5 = System.nanoTime()
    val (hit3, r3, tot3) = ManifestTable.prunedEntries(
      root3, v3, Seq(("k", n * 5L, n * 5L + 999L)), Nil)
    val tPruned3 = (System.nanoTime() - t5) / 1e6
    println(f"[planprobe] deltaCommit=${tDelta}%.0fms " +
      f"bytes=${deltaCommitBytes}%dB+${deltaSegBytes / 1024}%dKiBseg " +
      f"(${dAdds.size} adds) chainResolve=${tChain}%.0fms " +
      f"(${chain.size} entries) chainPrunedPlan=${tPruned3}%.0fms " +
      f"(${hit3.size} admitted, $r3/$tot3 segments read)")
  }
}
