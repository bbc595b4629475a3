package graft.sources

import java.nio.file.{Files, Path}

import graft.operators.ManifestTable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES (round 13 — Iceberg's `t.files` / `t.history` /
  * `t.partitions` surface): `SELECT * FROM cat.ns.t.history` resolves
  * through [[ManifestCatalog.loadTable]] to one of these read-only
  * tables. Each is a [[LocalScan]] — the rows ARE driver-scale
  * metadata (O(versions) or O(files), the same bytes manifest
  * planning already reads), so Spark plans a LocalTableScan instead
  * of shipping a distributed job to read a handful of rows.
  *
  *  - `history`: one row per committed version — version, commit
  *    millis, kind (checkpoint/delta), and the committing op's own
  *    meta token (merge=vK / replacewhere=vK / batch=N / …).
  *  - `files`: one row per LIVE data file of the latest snapshot —
  *    path, size, and the layout partition value when the table has
  *    one transform and the file is value-exact (NULL otherwise).
  *  - `partitions`: the layout's value → file-count aggregation
  *    (single-transform tables; empty for plain tables, a straddling
  *    file counts under NULL).
  */
private[graft] object ManifestMetaTables {
  val kinds: Set[String] = Set("files", "history", "partitions", "tags")

  def apply(root: Path, kind: String, name: String): Table =
    new ManifestMetaTable(root, kind, name)
}

private[graft] class ManifestMetaTable(root: Path, kind: String,
    name0: String) extends Table with SupportsRead {

  override def name(): String = name0

  override lazy val schema: StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("ts_millis", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("operation", StringType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("size_bytes", LongType, nullable = false),
      StructField("partition", LongType, nullable = true)))
    case "partitions" => StructType(Seq(
      StructField("transform", StringType, nullable = false),
      StructField("value", LongType, nullable = true),
      StructField("files", LongType, nullable = false)))
    case "tags" => StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table kind '$other'")
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def description(): String = s"graft-manifest-meta $kind"

      override def rows(): Array[InternalRow] = kind match {
        case "history" => historyRows()
        case "files" => fileRows()
        case "partitions" => partitionRows()
        case "tags" => tagRows()
      }
    }
  }

  // the committing op's own meta tokens, infra keys stripped — the
  // same rendering as ManifestTable.history (the SQL DESCRIBE HISTORY
  // surface); the log IS the history, derived rather than stored
  private def historyRows(): Array[InternalRow] = {
    val infra = Set("ts", "depth", "schema", "body", "colmap", "bloom")
    (math.max(1, ManifestTable.firstVersion(root)) to
        ManifestTable.latestVersion(root)).map { v =>
      val m = ManifestTable.headerMeta(root, v)
      new GenericInternalRow(Array[Any](
        v.toLong,
        m.get("ts").map(_.toLong).getOrElse(-1L),
        UTF8String.fromString(
          if (m.contains("kind")) m("kind") else "checkpoint"),
        UTF8String.fromString(
          m.view.filterKeys(k => !infra(k) && k != "kind")
            .map { case (k, x) => s"$k=$x" }.toSeq.sorted
            .mkString(" ")))): InternalRow
    }.toArray
  }

  private def singleTransform: Option[ManifestTable.PartTransform] =
    ManifestTable.partTransforms(root,
      ManifestTable.latestVersion(root)) match {
      case Seq(t) => Some(t)
      case _ => None
    }

  private def fileRows(): Array[InternalRow] = {
    val latest = ManifestTable.latestVersion(root)
    val data = root.resolve("data")
    val t = singleTransform
    ManifestTable.entriesFor(root, latest).sortBy(_.path).map { e =>
      val value: Any = t.flatMap(tr => e.band(tr.statName).collect {
        case (lo, hi) if lo == hi => java.lang.Long.valueOf(lo)
      }).orNull
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.path),
        try Files.size(data.resolve(e.path)) catch {
          case _: Exception => -1L },
        value)): InternalRow
    }.toArray
  }

  private def tagRows(): Array[InternalRow] =
    ManifestTable.tags(root).toSeq.sortBy(_._1).map { case (t, v) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(t), v.toLong)): InternalRow
    }.toArray

  private def partitionRows(): Array[InternalRow] = singleTransform match {
    case None => Array.empty
    case Some(t) =>
      val latest = ManifestTable.latestVersion(root)
      ManifestTable.entriesFor(root, latest)
        .groupBy(e => e.band(t.statName).collect {
          case (lo, hi) if lo == hi => lo })
        .toSeq
        .sortBy { case (v, _) => v.getOrElse(Long.MaxValue) }
        .map { case (v, es) =>
          new GenericInternalRow(Array[Any](
            UTF8String.fromString(t.meta),
            v.map(java.lang.Long.valueOf).orNull,
            es.size.toLong)): InternalRow
        }.toArray
  }
}
