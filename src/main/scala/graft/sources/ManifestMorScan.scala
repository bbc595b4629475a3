package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.util.SerializableConfiguration

/** Merge-on-read subtraction for the NATIVE manifest scan, applied as
  * a per-row filter over the delegate parquet reader. Round 13
  * (r12-VERDICT top task) moves the vector state OFF the driver: the
  * r12 shape collected every deleted key / (file, pos) pair into
  * driver arrays and embedded them in the shipped factory — at 100 TB
  * a routine 1% churn is ~10⁹ positions ≈ 8+ GB of driver heap plus
  * the task binary. Now:
  *
  *  - [[MorKeyFilter]] — key vectors (`dv=`): the deleted-key set
  *    applies to EVERY file, so it ships as a BROADCAST (torrent
  *    distribution, one copy per executor, a handle in the factory) —
  *    the readMOR broadcast-anti-join's distribution, kept under a
  *    size gate: [[ManifestScanBuilder.build]] falls back to the V1
  *    anti-join scan when the sidecar bytes exceed the threshold, so
  *    the driver-side collect feeding the broadcast is always bounded
  *    (exactly Spark's own BroadcastHashJoin discipline). A row dies
  *    when its key is in the set; NULL keys survive (the anti-join
  *    rule).
  *  - [[MorScopedFilter]] — file-scoped vectors (`dvp=`): the factory
  *    carries only the sidecar PATHS; each partition's reader loads
  *    ITS OWN file's slice executor-side ([[MorSidecars]], a parquet
  *    read under a `src = <file>` record filter — Delta's per-file DV
  *    descriptor model). Zero driver materialization at any churn.
  *    Needs the one-partition-per-file planning for file attribution.
  *  - [[MorPositionalFilter]] — row-position vectors (`dvr=`): same
  *    executor-side per-file slice load; a row dies when its index
  *    within its file is listed, so the planning additionally pushes
  *    NO parquet filters (a skipped row group would shift every later
  *    counted index).
  *
  * Row-mode only (a ColumnarBatch cannot drop rows without a selection
  * vector Spark's scan contract doesn't carry) — still ahead of the V1
  * bridge, which paid the same row path PLUS an InternalRow→Row
  * conversion and could not accept runtime (DPP) filters at all.
  */
private[graft] sealed trait MorFilter extends Serializable

/** `keyOrd` indexes the key column in the DELEGATE's read schema (the
  * planner widens the projection when the query pruned the key away);
  * `keys` is the sorted deleted-key set as a broadcast handle — the
  * factory serializes in O(1) regardless of churn.
  */
private[graft] case class MorKeyFilter(keyOrd: Int,
    keys: Broadcast[Array[Long]]) extends MorFilter

private[graft] case class MorScopedFilter(keyOrd: Int, keyName: String,
    sidecars: Seq[String], hconf: SerializableConfiguration)
    extends MorFilter

private[graft] case class MorPositionalFilter(sidecars: Seq[String],
    hconf: SerializableConfiguration) extends MorFilter

/** Executor-side sidecar slice loading (round 13): one partition =
  * one data file, so its reader asks the sidecars for exactly that
  * file's rows — a parquet-hadoop read under a `src = <file>` record
  * filter, which prunes row groups by `src` min/max stats, pages by
  * the column index (the DML writers sort sidecars by `src` for
  * exactly this), and dictionary-skips the rest. Worst case one
  * sidecar scan per partition, O(|sidecar|) bytes — distributed
  * across the executors instead of resident on the driver.
  */
private[graft] object MorSidecars {

  /** Sorted long values of `valueCol` across `sidecars`, restricted to
    * rows whose `src` equals `file`. Duplicates are harmless to the
    * binary-search consumer; rows with a missing value are skipped.
    */
  def longsForFile(sidecars: Seq[String],
      conf: org.apache.hadoop.conf.Configuration, file: String,
      valueCol: String): Array[Long] = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.io.api.Binary
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    sidecars.foreach { p =>
      val r = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(p))
        .withConf(conf)
        .withFilter(FilterCompat.get(FilterApi.eq(
          FilterApi.binaryColumn("src"), Binary.fromString(file))))
        .build()
      try {
        var g = r.read()
        while (g != null) {
          if (g.getFieldRepetitionCount(valueCol) > 0)
            out += g.getLong(valueCol, 0)
          g = r.read()
        }
      } finally r.close()
    }
    val a = out.toArray
    java.util.Arrays.sort(a)
    a
  }
}

private[graft] case class MorFilteredReaderFactory(
    delegate: PartitionReaderFactory, mor: MorFilter)
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  private def filtered(inner: PartitionReader[InternalRow],
      dead: InternalRow => Boolean): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (!dead(r)) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = inner.close()
    }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val inner = delegate.createReader(p)
    mor match {
      case MorKeyFilter(ord, keys) =>
        val ks = keys.value
        filtered(inner, r => !r.isNullAt(ord) &&
          java.util.Arrays.binarySearch(ks, r.getLong(ord)) >= 0)
      case MorScopedFilter(ord, keyName, sidecars, hconf) =>
        val ks = MorSidecars.longsForFile(sidecars, hconf.value,
          bridge.partitionFileName(p), keyName)
        if (ks.isEmpty) inner // no vector scopes this file
        else filtered(inner, r => !r.isNullAt(ord) &&
          java.util.Arrays.binarySearch(ks, r.getLong(ord)) >= 0)
      case MorPositionalFilter(sidecars, hconf) =>
        val ps = MorSidecars.longsForFile(sidecars, hconf.value,
          bridge.partitionFileName(p), "pos")
        if (ps.isEmpty) inner
        else {
          var idx = -1L
          filtered(inner, { _ =>
            idx += 1
            java.util.Arrays.binarySearch(ps, idx) >= 0
          })
        }
    }
  }
}
