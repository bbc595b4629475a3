package graft.plans

import graft.operators.ManifestTable
import graft.sources.{FilterBands, ManifestV2, ManifestV2Table}
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.command.{ExecutedCommandExec, LeafRunnableCommand}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{LongType, StructType}

/** SQL row-level DML for the manifest format (round 10 — r9-VERDICT
  * task 2): plans `UPDATE` and `MERGE INTO` statements over
  * [[graft.sources.ManifestV2Table]] targets onto the format's
  * copy-on-write primitives.
  *
  * Spark's built-in path for these statements requires
  * `SupportsRowLevelOperations` (a connector-side distributed write —
  * Spark computes the replacement rows and the connector streams them
  * to files). The manifest format's primitives already own the whole
  * rewrite — stats-banded touched-file discovery, staging,
  * serializable-writer publish ([[ManifestTable.updateWhereCoW]] /
  * [[ManifestTable.upsert]]) — so the integration point is the
  * PLANNER: a strategy that intercepts the analyzed command before
  * `SparkStrategies.BasicOperators` rejects it ("UPDATE TABLE is not
  * supported temporarily") and hands the statement to the primitive.
  * Installed two ways, mirroring [[AsOfJoinStrategy]]:
  * `spark.sql.extensions=graft.GraftExtensions` at session build, or
  * `bridge.addStrategy` on a live session (the Verify/Bench route —
  * `extraStrategies` run before every built-in strategy).
  *
  * Scale shape is the primitives': an UPDATE whose WHERE carries a
  * key band rewrites only the stats-admitted files; a MERGE rewrites
  * only files whose band intersects the source key range. "A MERGE
  * into 100 TB rewrites 3 files, not the table."
  */
object ManifestDmlStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case UpdateTable(rel, assignments, condition) =>
      targetOf(rel) match {
        case Some(t) =>
          ExecutedCommandExec(
            UpdateManifestCommand(t, assignments, condition)) :: Nil
        case None => Nil
      }
    case m: MergeIntoTable =>
      targetOf(m.targetTable) match {
        case Some(t) =>
          ExecutedCommandExec(MergeManifestCommand(t, m.sourceTable,
            m.mergeCondition, m.matchedActions, m.notMatchedActions,
            m.notMatchedBySourceActions)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }

  /** The ManifestV2Table under the statement's target relation (alias
    * chains included; commands plan AFTER optimization, where
    * V2ScanRelationPushDown has already turned the relation into a
    * DataSourceV2ScanRelation — match both forms). None for foreign
    * tables (built-in planning proceeds). DML against a time-travel
    * pin fails loudly — versions are immutable.
    */
  private def targetOf(plan: LogicalPlan): Option[ManifestV2Table] = {
    def ofTable(t: Table): Option[ManifestV2Table] = t match {
      case t: ManifestV2Table =>
        require(!t.pinned, s"cannot run DML against a time-travel " +
          s"snapshot of ${t.root} (VERSION/TIMESTAMP AS OF)")
        Some(t)
      case _ => None
    }
    plan match {
      case SubqueryAlias(_, child) => targetOf(child)
      case r: DataSourceV2Relation => ofTable(r.table)
      case r: DataSourceV2ScanRelation => ofTable(r.relation.table)
      case _ => None
    }
  }
}

private[plans] object ManifestDml {

  /** Fold foldable subtrees (the analyzer wraps SQL integer literals
    * compared to BIGINT columns in `CAST(lit AS BIGINT)`, and commands
    * plan from the ANALYZED tree — no optimizer constant folding ran),
    * so band extraction sees plain literals.
    */
  def foldLiterals(e: Expression): Expression = e.transform {
    case f if f.foldable && !f.isInstanceOf[Literal] =>
      Literal.create(f.eval(null), f.dataType)
  }

  /** Per-file stats bands of a DML condition, via the same
    * expression→Filter translation the V1 pushdown path uses; names
    * mapped logical→physical like every stats consumer.
    */
  def bands(conjuncts: Seq[Expression], phys: String => String)
      : (Seq[(String, Long, Long)],
         Seq[(String, Option[String], Option[String])]) = {
    val fs = conjuncts.map(foldLiterals)
      .flatMap(bridge.translateFilter(_)).toArray
    (FilterBands.long(fs).map { case (c, lo, hi) => (phys(c), lo, hi) },
     FilterBands.str(fs).map { case (c, lo, hi) => (phys(c), lo, hi) })
  }

  /** Rebind a resolved expression onto a fresh scan by NAME (the
    * command re-reads the touched files as a new DataFrame, so the
    * statement's attribute ids don't exist there), mapping
    * logical→physical column names on the way.
    */
  def rebind(e: Expression, phys: String => String): Column =
    bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(phys(a.name))
    })
}

/** `UPDATE t SET c = expr, … [WHERE cond]` → [[ManifestTable.updateWhereCoW]]:
  * the WHERE's pushable conjuncts become stats bands pruning the
  * candidate files, only those are rewritten (assigned values where
  * cond is TRUE, original rows otherwise — SQL semantics including
  * NULL-keeps), everything else rides the delta commit untouched.
  */
case class UpdateManifestCommand(table: ManifestV2Table,
    assignments: Seq[Assignment], condition: Option[Expression])
    extends LeafRunnableCommand with PredicateHelper {

  override def run(spark: SparkSession): Seq[Row] = {
    val root = table.root
    val latest = ManifestTable.latestVersion(root)
    val cmap = ManifestTable.columnMap(root, latest)
    def phys(n: String): String = cmap.getOrElse(n, n)
    val logical = ManifestV2.resolveSchema(spark, root, latest)
    val physSchema = StructType(logical.fields.map(f =>
      f.copy(name = phys(f.name))))
    val set = assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case k => throw new UnsupportedOperationException(
          "graft-manifest UPDATE assigns top-level columns only, got " +
          s"SET ${k.sql}")
      }
      phys(name) -> ManifestDml.rebind(a.value, phys)
    }.toMap
    val cond = condition.map(ManifestDml.rebind(_, phys))
      .getOrElse(lit(true))
    val (lb, sb) = ManifestDml.bands(
      condition.toSeq.flatMap(splitConjunctivePredicates), phys)
    ManifestTable.updateWhereCoW(spark, root, physSchema, cond, set,
      lb, sb)
    Seq.empty
  }
}

/** `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *` → [[ManifestTable.upsert]] — the
  * keyed full-row upsert (matched keys replaced by the source image,
  * unseen keys inserted, serializable-writer conflict rules, at most
  * one source row per key enforced like Delta's "multiple source rows
  * matched" error). Conditional actions, partial-column SET, DELETE
  * actions, and NOT MATCHED BY SOURCE have no upsert equivalent and
  * fail loudly toward the programmatic API.
  */
case class MergeManifestCommand(table: ManifestV2Table,
    source: LogicalPlan, mergeCondition: Expression,
    matched: Seq[MergeAction], notMatched: Seq[MergeAction],
    notMatchedBySource: Seq[MergeAction]) extends LeafRunnableCommand {

  private def unsupported(got: String): Nothing =
    throw new UnsupportedOperationException(
      "graft-manifest SQL MERGE supports the keyed upsert shape — " +
      "ON t.key = s.key WHEN MATCHED THEN UPDATE SET * WHEN NOT " +
      s"MATCHED THEN INSERT * — got $got; use ManifestTable.upsert / " +
      "mergeCoW for other shapes")

  override def run(spark: SparkSession): Seq[Row] = {
    if (notMatchedBySource.nonEmpty)
      unsupported("WHEN NOT MATCHED BY SOURCE")
    val root = table.root
    val latest = ManifestTable.latestVersion(root)
    val cmap = ManifestTable.columnMap(root, latest)
    def phys(n: String): String = cmap.getOrElse(n, n)
    val logical = ManifestV2.resolveSchema(spark, root, latest)
    val srcIds = source.output.map(_.exprId).toSet

    // ON t.k = s.k — classify the sides by the source plan's attr ids
    val key = mergeCondition match {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if srcIds(r.exprId) && !srcIds(l.exprId) => l.name
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if srcIds(l.exprId) && !srcIds(r.exprId) => r.name
      case c => unsupported(s"ON ${c.sql}")
    }
    require(logical.fields.exists(f => f.name == key &&
        f.dataType == LongType),
      s"graft-manifest MERGE keys on a BIGINT target column, got '$key'")

    // full-row source image per target column: SET * / INSERT * (both
    // the analyzer-expanded assignment lists and the raw star forms)
    def starAssigns(assigns: Seq[Assignment], action: String)
        : Map[String, Expression] = {
      val m = assigns.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case k => unsupported(s"$action SET ${k.sql}")
        }
        a.value match {
          case v: AttributeReference if srcIds(v.exprId) => name -> v
          case v => unsupported(
            s"$action assigning ${v.sql} (not a source column)")
        }
      }.toMap
      require(logical.fieldNames.forall(m.contains),
        s"graft-manifest MERGE needs every target column assigned " +
        s"($action covers ${m.keys.mkString(",")})")
      m
    }
    val srcByName = source.output.map(a => a.name -> a).toMap
    def starByName(action: String): Map[String, Expression] =
      logical.fieldNames.map { n =>
        n -> srcByName.getOrElse(n, unsupported(
          s"$action * with no source column '$n'")).asInstanceOf[Expression]
      }.toMap
    val updateImage = matched match {
      case Seq(UpdateAction(None, assigns, _)) =>
        starAssigns(assigns, "WHEN MATCHED UPDATE")
      case Seq(_: UpdateStarAction) => starByName("WHEN MATCHED UPDATE")
      case a => unsupported(s"matched actions $a")
    }
    val insertImage = notMatched match {
      case Seq(InsertAction(None, assigns)) =>
        starAssigns(assigns, "WHEN NOT MATCHED INSERT")
      case Seq(_: InsertStarAction) =>
        starByName("WHEN NOT MATCHED INSERT")
      case a => unsupported(s"not-matched actions $a")
    }
    // one updates frame serves both halves, so the images must agree
    logical.fieldNames.foreach { n =>
      require(updateImage(n).semanticEquals(insertImage(n)),
        s"graft-manifest MERGE writes ONE source image per key — " +
        s"UPDATE and INSERT assign different values for '$n'")
    }

    // project the source to the target's PHYSICAL column names; the
    // resolved source attrs live in this exact plan, so they bind by id
    val srcDF = bridge.ofRows(spark, source)
    val updates = srcDF.select(logical.fieldNames.toSeq.map(n =>
      bridge.column(updateImage(n)).as(phys(n))): _*)
    val physSchema = StructType(logical.fields.map(f =>
      f.copy(name = phys(f.name))))
    ManifestTable.upsert(spark, root, latest, physSchema, phys(key),
      updates)
    Seq.empty
  }
}
