package graft.plans

import java.nio.file.Path

import graft.operators.ManifestTable
import graft.sources.{ManifestV2Table, ManifestCatalog}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/** The SQL MAINTENANCE surface (round 11 — r10-VERDICT task 5): the
  * lifecycle statements every real lakehouse exposes, parsed by a
  * lightweight [[ParserInterface]] wrapper that recognizes exactly
  * three statement shapes and delegates EVERYTHING else verbatim —
  * the standard extension-parser pattern (Delta's SparkSqlParser
  * wrapper, stated minimally):
  *
  * {{{
  * OPTIMIZE gm.sales.orders                          -- small-file bin-pack
  * OPTIMIZE gm.sales.orders ZORDER BY (k, c)         -- 2-3-col Morton relayout
  * VACUUM gm.sales.orders [RETAIN 168 HOURS]         -- unreferenced-file sweep
  * DESCRIBE HISTORY gm.sales.orders                  -- the commit log as rows
  * }}}
  *
  * Installed by [[graft.GraftExtensions]] via `injectParser`; sessions
  * built without the extensions reach the same statements through
  * [[GraftSql.sql]], which parses with this wrapper directly (a parser
  * cannot be added to a live session the way planner strategies can).
  * Identifiers must be catalog-qualified (`cat.ns….table`) against a
  * [[ManifestCatalog]]; each command maps onto the existing
  * maintenance primitive — OPTIMIZE onto
  * [[ManifestTable.optimizeSmall]] / [[ManifestTable.optimizeZorder]]
  * (CoW, OCC publish, retention guards all preserved), VACUUM onto
  * [[ManifestTable.vacuum]] + [[ManifestTable.vacuumOrphanSegments]],
  * DESCRIBE HISTORY onto [[ManifestTable.history]].
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  // statement shapes; identifiers are re-parsed by the DELEGATE's
  // multipart-identifier grammar, so backquoted segments with any
  // characters work exactly as everywhere else in Spark SQL
  private val OptimizeRe =
    """(?is)^\s*OPTIMIZE\s+(.+?)(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val VacuumRe =
    """(?is)^\s*VACUUM\s+(.+?)(?:\s+RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*$""".r
  private val HistoryRe =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(.+?)\s*;?\s*$""".r

  private[plans] def maintenancePlan(sql: String,
      delegate: ParserInterface): Option[LogicalPlan] = sql match {
    case HistoryRe(ident) =>
      Some(DescribeHistoryCommand(delegate.parseMultipartIdentifier(ident)))
    case VacuumRe(ident, hours) =>
      Some(VacuumManifestCommand(delegate.parseMultipartIdentifier(ident),
        Option(hours).map(_.toLong * 3600L * 1000L)))
    case OptimizeRe(ident, zorder) =>
      Some(OptimizeManifestCommand(
        delegate.parseMultipartIdentifier(ident),
        Option(zorder).map(_.split(',').toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)).getOrElse(Nil)))
    case _ => None
  }

  /** Resolve a catalog-qualified identifier to its table root through
    * the registered [[ManifestCatalog]] — the table IS its directory,
    * so no further state is needed.
    */
  private[plans] def rootOf(spark: SparkSession, parts: Seq[String]): Path = {
    require(parts.length >= 2,
      s"maintenance statements take a catalog-qualified identifier " +
      s"(cat.ns….table), got ${parts.mkString(".")}")
    val cat = bridge.catalog(spark, parts.head) match {
      case c: ManifestCatalog => c
      case other => throw new IllegalArgumentException(
        s"catalog '${parts.head}' is not a graft ManifestCatalog: $other")
    }
    cat.loadTable(Identifier.of(parts.tail.dropRight(1).toArray,
      parts.last)) match {
      case t: ManifestV2Table => t.root
      case other => throw new IllegalStateException(s"unexpected $other")
    }
  }
}

/** `OPTIMIZE t [ZORDER BY (c1, c2[, c3])]` — bin-pack the small-file
  * tail (threshold: the `optimize.smallBytes` table property, default
  * 128 MiB) or rewrite the live set in Morton order. Column names are
  * logical; the mapping translates them like every stats consumer.
  * Returns (version) — the post-optimize snapshot.
  */
case class OptimizeManifestCommand(parts: Seq[String],
    zorderCols: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootOf(spark, parts)
    val latest = ManifestTable.latestVersion(root)
    require(latest >= 1, s"OPTIMIZE on empty table ${parts.mkString(".")}")
    val cmap = ManifestTable.columnMap(root, latest)
    def phys(n: String): String = cmap.getOrElse(n, n)
    val logical = graft.sources.ManifestV2.resolveSchema(spark, root, latest)
    val physSchema = StructType(logical.fields.map(f =>
      f.copy(name = phys(f.name))))
    val props = graft.sources.ManifestV2Table.props(root)
    val v =
      if (zorderCols.nonEmpty) {
        val live = ManifestTable.filesFor(root, latest).size
        val target = props.get("writeFiles").map(_.toInt)
          .getOrElse(math.max(1, live))
        ManifestTable.optimizeZorder(spark, root, latest, physSchema,
          zorderCols.map(phys), target)
      } else {
        // bin-pack key: the table's declared stats key, else the first
        // recorded long-stat column of the live set
        val keyCol = props.get("statsColumns")
          .flatMap(_.split(',').map(_.trim).find(_.nonEmpty)).map(phys)
          .orElse(ManifestTable.entriesFor(root, latest)
            .flatMap(_.stats.map(_._1)).headOption)
          .getOrElse(throw new IllegalArgumentException(
            s"OPTIMIZE needs a stats key: set TBLPROPERTIES(" +
            "'statsColumns'='…') or use ZORDER BY"))
        val smallBytes = props.get("optimize.smallBytes").map(_.toLong)
          .getOrElse(128L * 1024 * 1024)
        ManifestTable.optimizeSmall(spark, root, latest, physSchema,
          keyCol, smallBytes)
      }
    Seq(Row(v.toLong))
  }
}

/** `VACUUM t [RETAIN n HOURS]` — delete data files referenced by no
  * retained version (plus orphan checkpoint segments), keeping
  * anything newer than the retention horizon for in-flight writers —
  * Delta VACUUM's contract, default 168 h. Returns one row per
  * removed file.
  */
case class VacuumManifestCommand(parts: Seq[String],
    retainMillis: Option[Long]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("path", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootOf(spark, parts)
    val latest = ManifestTable.latestVersion(root)
    require(latest >= 1, s"VACUUM on empty table ${parts.mkString(".")}")
    val retain = retainMillis.getOrElse(7L * 24 * 3600 * 1000)
    val dead = ManifestTable.vacuum(root, latest, retain) ++
      ManifestTable.vacuumOrphanSegments(root, retain)
    dead.map(Row(_))
  }
}

/** `DESCRIBE HISTORY t` — one row per committed version from the
  * manifest headers ([[ManifestTable.history]]'s derivation: the log
  * IS the history), newest first like Delta.
  */
case class DescribeHistoryCommand(parts: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("ts_millis", LongType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = GraftSqlParser.rootOf(spark, parts)
    ManifestTable.history(spark, root).collect().toSeq
      .sortBy(-_.getLong(0))
  }
}

/** Maintenance SQL for sessions built WITHOUT the extensions (the
  * Verify/Bench route): parse through [[GraftSqlParser]] directly and
  * execute — byte-identical semantics to an `injectParser` session.
  */
object GraftSql {
  def sql(spark: SparkSession, text: String): DataFrame =
    bridge.ofRows(spark,
      new GraftSqlParser(bridge.parser(spark)).parsePlan(text))
}
