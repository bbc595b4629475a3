package graft

import java.nio.file.Files

import graft.operators.ManifestTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Round-10 wave 144: the REGISTERED streaming source
  * (`spark.readStream.format("graft-manifest")`, r9-VERDICT task 3).
  * Claims proven here on real micro-batch execution:
  *
  *  - offsets are commit versions: maxVersionsPerTrigger=1 yields
  *    exactly one micro-batch per commit, in commit order, each with
  *    the version's own row count, and the WAL offsets are the
  *    version numbers (the Wave122 one-batch-per-commit contract,
  *    now on the registered source instead of the replay harness)
  *  - without pacing, everything available is ONE batch
  *  - startingVersion skips the prefix
  *  - exactly-once across restart: an AvailableNow run drains the
  *    log, new commits land, the SAME checkpoint resumes — only the
  *    new versions replay (offset WAL composed with immutable
  *    versions)
  *  - a rewrite (compaction) inside the streamed range fails loudly
  *    (readIncremental's append-only guard — the Delta
  *    no-ignoreChanges default)
  */
class Wave144Spec extends SparkSpec {

  private def freshTable(tag: String): java.nio.file.Path = {
    val root = Files.createTempDirectory(s"graft_w144_$tag").resolve("t")
    Files.createDirectories(root)
    root
  }

  private def commitRange(root: java.nio.file.Path, lo: Long, hi: Long,
      tag: String): Int =
    ManifestTable.appendCommit(root, ManifestTable.stage(
      spark.range(lo, hi).selectExpr("id AS k", "id * 2 AS v"),
      root, tag))

  test("one micro-batch per commit under maxVersionsPerTrigger=1, " +
    "offsets are the version numbers") {
    val root = freshTable("pace")
    commitRange(root, 0, 10, "a")
    commitRange(root, 10, 30, "b")
    commitRange(root, 30, 35, "c")
    val st = spark.readStream.format("graft-manifest")
      .option("path", root.toString)
      .option("maxVersionsPerTrigger", "1").load()
    val q = st.groupBy().agg(count(lit(1)).as("n"), sum("k").as("s"))
      .writeStream.format("memory").queryName("w144_pace")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.map(_.numInputRows).toSeq == Seq(10L, 20L, 5L),
      s"per-commit batches: ${batches.map(_.numInputRows).toSeq}")
    // the committed WAL offsets are the version numbers themselves
    val ends = batches.map(_.sources.head.endOffset.trim).toSeq
    assert(ends == Seq("1", "2", "3"),
      s"offsets must be commit versions, got $ends")
    assert(spark.table("w144_pace").head.getLong(0) == 35L)
  }

  test("no pacing option: all available commits drain as one batch; " +
    "startingVersion skips the prefix") {
    val root = freshTable("all")
    commitRange(root, 0, 10, "a")
    commitRange(root, 10, 30, "b")
    val st = spark.readStream.format("graft-manifest")
      .option("path", root.toString).load()
    val q = st.writeStream.format("memory").queryName("w144_all")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.map(_.numInputRows).toSeq == Seq(30L),
      s"expected one 30-row batch, got ${batches.map(_.numInputRows).toSeq}")
    // startingVersion is INCLUSIVE of that version's own changes
    // (the Delta contract, round-10 ADVICE fix): 2 streams v2 onward
    val st2 = spark.readStream.format("graft-manifest")
      .option("path", root.toString)
      .option("startingVersion", "2").load()
    val q2 = st2.writeStream.format("memory").queryName("w144_from1")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.table("w144_from1").count() == 20L,
      s"startingVersion=2 must stream v2's own delta inclusively; progress=" +
      q2.recentProgress.map(p => s"(rows=${p.numInputRows} start=" +
        s"${p.sources.head.startOffset} end=${p.sources.head.endOffset})")
        .mkString(","))
  }

  test("exactly-once across restart: a resumed checkpoint replays " +
    "only the versions committed after the first run") {
    val root = freshTable("ckpt")
    val ckpt = Files.createTempDirectory("graft_w144_ckpt").toString
    commitRange(root, 0, 10, "a")
    commitRange(root, 10, 25, "b")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-manifest")
        .option("path", root.toString)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.select("k").collect().foreach(r => seen.add(r.getLong(0)))
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(seen.size == 25, s"first drain saw ${seen.size} rows")
    commitRange(root, 25, 32, "c")
    drain()
    import scala.jdk.CollectionConverters._
    val all = seen.asScala.toSeq.sorted
    assert(all == (0L until 32L),
      s"resume must replay ONLY v3 (exactly-once): ${all.size} rows, " +
      s"dupes=${all.diff(all.distinct).distinct.take(5)}")
  }

  test("a compaction inside the streamed range fails loudly " +
    "(append-only guard), and version/asof pins are rejected") {
    val root = freshTable("guard")
    commitRange(root, 0, 10, "a")
    commitRange(root, 10, 20, "b")
    val schema = spark.range(1).selectExpr("id AS k", "id * 2 AS v").schema
    ManifestTable.compact(spark, root, 2, schema, 1)
    val q = spark.readStream.format("graft-manifest")
      .option("path", root.toString)
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("w144_guard")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")),
      s"expected the append-only guard, got: ${e.getMessage}")
    val pin = intercept[Exception] {
      spark.readStream.format("graft-manifest")
        .option("path", root.toString).option("version", "1").load()
    }
    assert(pin.getMessage.contains("startingVersion"),
      s"version pin must point at startingVersion: ${pin.getMessage}")
  }

  test("a column-mapped table streams under LOGICAL names with the " +
    "renamed column populated") {
    val root = freshTable("cmap")
    // first commit through the V1 writer so the header carries the
    // schema= meta renameColumn requires
    spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
      .write.format("graft-manifest").option("path", root.toString)
      .mode("append").save()
    // rename k -> key (metadata-only; files keep the physical name),
    // then append through the colmap-aware V1 writer (logical frame)
    ManifestTable.renameColumn(root, "k", "key")
    spark.range(10, 15).selectExpr("id AS key", "id * 2 AS v")
      .write.format("graft-manifest").option("path", root.toString)
      .mode("append").save()
    val st = spark.readStream.format("graft-manifest")
      .option("path", root.toString).load()
    assert(st.schema.fieldNames.toSeq == Seq("key", "v"),
      s"stream schema must be logical: ${st.schema.fieldNames.toSeq}")
    val q = st.writeStream.format("memory").queryName("w144_cmap")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("w144_cmap").orderBy("key").collect()
    assert(got.length == 15 && got.map(_.getLong(0)).toSeq == (0L until 15L),
      s"renamed column must be populated for pre-rename files: " +
      s"${got.take(3).mkString(",")}")
  }
}
