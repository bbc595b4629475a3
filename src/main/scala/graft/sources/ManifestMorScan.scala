package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.graft.bridge

/** Merge-on-read subtraction for the NATIVE manifest scan (round 12 —
  * r11-VERDICT task 3): the deletion-vector state, loaded once on the
  * driver from the sidecars (they are O(|deleted|) by design), applied
  * as a per-row filter over the delegate parquet reader. Row-mode only
  * (a ColumnarBatch cannot drop rows without a selection vector Spark's
  * scan contract doesn't carry) — still ahead of the V1 bridge, which
  * paid the same row path PLUS an InternalRow→Row conversion and could
  * not accept runtime (DPP) filters at all. Vector semantics mirror
  * the DataFrame readers exactly:
  *
  *  - [[MorKeyFilter]] — key vectors (`dv=`): a row dies when its key
  *    is in the deleted set; NULL keys survive (the anti-join rule).
  *  - [[MorScopedFilter]] — file-scoped vectors (`dvp=`): a row dies
  *    when (its key, its source file) both match; needs the
  *    one-partition-per-file planning for file attribution.
  *  - [[MorPositionalFilter]] — row-position vectors (`dvr=`): a row
  *    dies when its index within its file is listed; needs
  *    one-partition-per-file planning AND an unfiltered delegate (no
  *    pushed parquet filters — a skipped row group would shift every
  *    later count), so the delegate emits rows in exact file order.
  */
private[graft] sealed trait MorFilter extends Serializable

/** `keyOrd` indexes the key column in the DELEGATE's read schema (the
  * planner widens the projection when the query pruned the key away);
  * `keys` is the sorted deleted-key set.
  */
private[graft] case class MorKeyFilter(keyOrd: Int, keys: Array[Long])
    extends MorFilter

private[graft] case class MorScopedFilter(keyOrd: Int,
    byFile: Map[String, Array[Long]]) extends MorFilter

private[graft] case class MorPositionalFilter(
    byFile: Map[String, Array[Long]]) extends MorFilter

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
        filtered(inner, r => !r.isNullAt(ord) &&
          java.util.Arrays.binarySearch(keys, r.getLong(ord)) >= 0)
      case MorScopedFilter(ord, byFile) =>
        byFile.get(bridge.partitionFileName(p)) match {
          case None => inner // no vector scopes this file
          case Some(ks) =>
            filtered(inner, r => !r.isNullAt(ord) &&
              java.util.Arrays.binarySearch(ks, r.getLong(ord)) >= 0)
        }
      case MorPositionalFilter(byFile) =>
        byFile.get(bridge.partitionFileName(p)) match {
          case None => inner
          case Some(ps) =>
            var idx = -1L
            filtered(inner, { _ =>
              idx += 1
              java.util.Arrays.binarySearch(ps, idx) >= 0
            })
        }
    }
  }
}
