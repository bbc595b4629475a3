package graft

import java.nio.file.Files
import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-8 wave 99: the `_latest` checkpoint pointer (advisory hint +
  * forward probes) and the streaming peak detector's stream ≡ batch
  * equivalence inside Spark.
  */
class Wave99Spec extends SparkSpec {

  test("_latest hint: commits advance it, a stale or corrupt hint " +
    "never changes the answer, and a fresh table reads 0") {
    val root = Files.createTempDirectory("graft_mf_hint")
    assert(ManifestTable.latestVersion(root) == 0)
    val df = spark.range(4).withColumnRenamed("id", "k")
    val v1 = ManifestTable.appendCommit(root,
      ManifestTable.stage(df, root, "a"))
    val v2 = ManifestTable.appendCommit(root,
      ManifestTable.stage(df, root, "b"))
    assert(v1 == 1 && v2 == 2 && ManifestTable.latestVersion(root) == 2)
    val hint = root.resolve("_manifests").resolve("_latest")
    assert(new String(Files.readAllBytes(hint), "UTF-8").trim == "2")
    // stale-low hint → forward probes recover the truth
    Files.write(hint, "1".getBytes("UTF-8"))
    assert(ManifestTable.latestVersion(root) == 2)
    // hint claiming a version that does not exist → ignored, not trusted
    Files.write(hint, "9".getBytes("UTF-8"))
    assert(ManifestTable.latestVersion(root) == 2)
    // corrupt hint → ignored
    Files.write(hint, "not-a-number".getBytes("UTF-8"))
    assert(ManifestTable.latestVersion(root) == 2)
  }

  test("stream_peaks emits exactly the batch events_peaks rows") {
    val stream = q("stream_peaks").collect().toSeq
    val batch = q("events_peaks").collect().toSeq
    assert(stream.nonEmpty && stream == batch)
  }
}
