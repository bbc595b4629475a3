package graft

import java.nio.file.Files
import graft.operators.{ManifestOps, ManifestTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Round-9 wave 122: Structured Streaming FROM the manifest table —
  * the commit chain drives real micro-batches (one per committed
  * version, in commit order), and the streamed stateful aggregate
  * equals the batch aggregate over the latest snapshot.
  */
class Wave122Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("each committed version is exactly one micro-batch, in commit " +
    "order, with the version's own row count") {
    val orders = Tables.table(spark, dir, "orders")
    val root = ManifestOps.streamSrcRoot(spark, dir)
    // the replay dir holds one file per committed version
    val s = Files.list(root.resolve("replay"))
    val files = try s.toArray.map(_.toString).toSeq.sorted finally s.close()
    assert(files.size == 4)
    val st = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(root.resolve("replay").toString)
    val q = st.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("w122_probe")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 4,
      s"expected one micro-batch per commit, saw ${batches.length}")
    // batch i carries quarter i's rows — commit order == trigger order
    val quarters = (0 to 3).map(r =>
      orders.filter(col("o_orderkey") % 4 === r).count())
    assert(batches.map(_.numInputRows).toSeq == quarters,
      s"micro-batch row counts ${batches.map(_.numInputRows).toSeq} != " +
      s"per-commit quarters $quarters")
  }

  test("declared query: the streamed aggregate equals the batch " +
    "aggregate over the latest snapshot") {
    val got = SparkEntry.queries("stream_manifest_source")(spark, dir)
    val orders = Tables.table(spark, dir, "orders")
    val expect = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Canon.decRound4(sum(col("o_totalprice").cast(Canon.Dec))).as("rev"))
      .orderBy("o_orderpriority")
    assert(got.collect().toSeq == expect.collect().toSeq,
      "streamed aggregate diverged from the batch aggregate")
  }
}
