package graft

import graft.operators.{Corpus, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-9 wave 109: the lakehouse × dedup composition
  * (dedup_manifest_incremental) — the claims the oracle can't see:
  * the batch side scans ONLY the appended crawl files (never the
  * corpus files), the final plan reads the persisted posting index
  * instead of documents.parquet, and the verdicts are identical to
  * dedup_incremental's.
  */
class Wave109Spec extends SparkSpec {

  test("the batch side scans exactly the v1→v2 appended files; the " +
    "full plan never rescans the base corpus or documents.parquet") {
    val docs = Tables.table(spark, sfDir, "documents")
    val root = Corpus.docsManifestRoot(spark, sfDir)
    val corpusFiles = ManifestTable.filesFor(root, 1).toSet
    val crawlFiles = ManifestTable.filesFor(root, 2).toSet -- corpusFiles
    assert(corpusFiles.nonEmpty && crawlFiles.nonEmpty)
    val batch = ManifestTable.readIncremental(spark, root, 1, 2,
      docs.schema)
    val scanned = batch.inputFiles.map(_.split('/').last).toSet
    assert(scanned == crawlFiles,
      s"batch scan read $scanned, append delta is $crawlFiles")
    // the DECLARED query's physical inputs: crawl files + the cached
    // posting index only — no corpus data file, no documents.parquet
    val q9 = q("dedup_manifest_incremental")
    q9.count() // force the ArtifactCache build before inspecting inputs
    val inputs = q("dedup_manifest_incremental").inputFiles.toSeq
    assert(inputs.nonEmpty)
    inputs.foreach { f =>
      assert(!f.contains("documents.parquet"),
        s"plan rescans the source table: $f")
      assert(!corpusFiles.contains(f.split('/').last),
        s"plan rescans a base-corpus manifest file: $f")
    }
    assert(inputs.exists(_.contains("ngram_postings3")),
      "plan does not read the persisted posting index")
  }

  test("verdicts equal dedup_incremental's (same batch, same index " +
    "semantics) at sf0.001") {
    val a = q("dedup_manifest_incremental").collect().toSeq
    val b = q("dedup_incremental").collect().toSeq
    assert(a == b, s"composition diverged: ${a.size} vs ${b.size} rows")
    // non-degenerate: at least one duplicate verdict exists
    assert(a.exists(_.getString(3) != "unique"),
      "fixture produced only 'unique' verdicts — test is vacuous")
  }
}
