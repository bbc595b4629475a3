package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.functions._

/** Round-12 wave 178: the registered streaming SINK composes with
  * hidden partitioning — micro-batches into a PARTITIONED BY table
  * are laid out by the transforms with virtual per-file stats, so
  * hidden pruning skips STREAMED files too. Claims proven here:
  *
  *  - streamed files carry the __pt* bands; a derived-band point
  *    predicate admits a strict subset of them
  *  - replayed batches still no-op (the ledger survives the new path)
  *  - plain (transform-less) tables keep the old sink shape
  */
class Wave178Spec extends SparkSpec {

  test("micro-batches into a bucket-laid table carry transform stats " +
    "and prune; replays no-op") {
    val cat = "w178hs"
    val wh = Files.createTempDirectory("graft_w178")
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.ManifestCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh.toString)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v BIGINT) " +
      "USING `graft-manifest` PARTITIONED BY (bucket(8, k)) " +
      "TBLPROPERTIES ('writeFiles' = '8')")
    val root = wh.resolve("t")
    // drive the registered sink directly (the foreachBatch-shaped V1
    // Sink contract), two batches + one replay
    val sink = new graft.sources.ManifestSource().createSink(
      spark.sqlContext, Map("path" -> root.toString,
        "statsColumns" -> "k"),
      Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0, spark.range(0, 400).selectExpr("id AS k", "id AS v"))
    sink.addBatch(1, spark.range(400, 800).selectExpr("id AS k", "id AS v"))
    val vAfter = ManifestTable.latestVersion(root)
    sink.addBatch(1, spark.range(400, 800).selectExpr("id AS k", "id AS v"))
    assert(ManifestTable.latestVersion(root) == vAfter,
      "a replayed batch must no-op on the transform path too")
    // every streamed file carries the virtual bucket band
    val entries = ManifestTable.entriesFor(root, vAfter)
    assert(entries.nonEmpty && entries.forall(_.band("__ptb8_k").isDefined),
      s"streamed files must carry __pt stats: $entries")
    // the derived band prunes streamed files for a plain equality
    val (hit, _, _) = ManifestTable.prunedEntries(root, vAfter,
      Seq(("k", 42L, 42L)) ++
        ManifestTable.hiddenBands(root, vAfter, Seq(("k", 42L, 42L))), Nil)
    assert(hit.size < entries.size,
      s"hidden pruning must skip streamed files: ${hit.size}/${entries.size}")
    // exactness through the registered source
    val got = spark.read.format("graft-manifest")
      .option("path", root.toString).load()
      .filter(col("k") === 42L).collect()
    assert(got.length == 1 && got.head.getLong(1) == 42L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0)
      == 800)
  }
}
