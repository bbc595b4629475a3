package graft

import java.nio.file.{Files, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** Round-8 wave 83 (ADVICE item 4): stream_trend's cross-batch
  * ordering contract is now ENFORCED, not assumed. The fold anchors
  * each vehicle's x-origin at the first event time it sees; an event
  * arriving EARLIER than that anchor in a later micro-batch cannot be
  * folded exactly (truncated-seconds x is not re-originable from
  * moments), and previously corrupted the slope silently. The guard
  * must fail the query loudly instead. The happy path — single-batch
  * AvailableNow replay equals the batch regression bit-for-bit — is
  * StreamingSpec's first test.
  */
class Wave83Spec extends SparkSpec {

  test("out-of-event-time multi-batch replay fails loudly, " +
    "never folds a corrupt slope") {
    val root = Files.createTempDirectory("graft_ooo_trend")
    val data = root.resolve("data")
    Files.createDirectories(data)
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
    val r = ev.agg(min("ts_us"), max("ts_us")).head()
    val mid = (r.getLong(0) + r.getLong(1)) / 2
    // batch 1 = the LATE half, batch 2 = the EARLY half: batch 2's
    // rows all precede the t0 anchored by batch 1
    val files = Seq(("a_late", ev.filter(col("ts_us") >= mid)),
      ("b_early", ev.filter(col("ts_us") < mid)))
    files.zipWithIndex.foreach { case ((name, df), i) =>
      val tmp = root.resolve(s"tmp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val ls = Files.list(tmp)
      val part =
        try ls.filter(_.toString.endsWith(".parquet")).findFirst.get
        finally ls.close()
      Files.move(part, data.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(data.resolve(s"$name.parquet"),
        FileTime.fromMillis(1000000L * (i + 1)))
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(data.toString)
    val slopes = operators.Streaming.trendSlopes(spark, stream)
    val q = slopes.toDF("user_id", "n", "slope_per_s")
      .writeStream.format("memory").queryName("w83_ooo_sink")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    val ex = intercept[StreamingQueryException] { q.awaitTermination() }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(c =>
      String.valueOf(c.getMessage).contains("refusing to fold")),
      s"query failed for the wrong reason: $ex")
  }
}
