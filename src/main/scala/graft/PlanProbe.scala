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
  }
}
