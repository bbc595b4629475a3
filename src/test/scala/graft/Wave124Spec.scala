package graft

import graft.operators.{Knn, LlmVectors, ManifestTable}
import org.apache.spark.sql.functions._

/** Round-9 wave 124: knn_manifest_incremental — similarity search
  * riding the transactional table. The claims: results equal the
  * from-scratch exact search, and the physical plan reads ONLY the
  * persisted base-corpus artifact plus the manifest's appended delta
  * files — never the raw embeddings fixture, never v1's data files.
  */
class Wave124Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the composed incremental search equals the from-scratch " +
    "exact search") {
    val got = SparkEntry.queries("knn_manifest_incremental")(spark, dir)
    val emb = Tables.table(spark, dir, "embeddings")
    val expect = Knn.search(
        emb.filter(col("vec_id") % 10 === 0), emb, k = 3)
      .orderBy("q_id", "rank")
    assert(got.collect().toSeq == expect.collect().toSeq,
      "incremental composition diverged from the from-scratch search")
  }

  test("the plan never rescans the raw fixture or v1's corpus files — " +
    "base rides the artifact, the batch rides the file delta") {
    val got = SparkEntry.queries("knn_manifest_incremental")(spark, dir)
    val root = LlmVectors.embManifestRoot(spark, dir)
    val inputs = got.inputFiles.toSeq
    assert(inputs.nonEmpty)
    assert(!inputs.exists(_.contains("embeddings.parquet")),
      s"plan rescans the raw fixture: $inputs")
    // v2's delta = the files batch-prefixed "batch-"; v1's corpus files
    // ("corpus-") must NOT appear — the index side reads the artifact
    val v1Files = ManifestTable.filesFor(root, 1).toSet
    assert(v1Files.nonEmpty && v1Files.forall(_.startsWith("corpus-")))
    assert(!inputs.exists(p => v1Files.exists(f => p.endsWith(f))),
      s"plan rescans v1 corpus data files: $inputs")
    val v2Delta = ManifestTable.filesFor(root, 2).toSet -- v1Files
    assert(v2Delta.forall(f => inputs.exists(_.endsWith(f))),
      "the appended delta files are not the batch side")
  }
}
