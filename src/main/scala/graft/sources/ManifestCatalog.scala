package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.operators.ManifestTable
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The manifest layout's bucket transform as a V2 catalog function
  * (round 12 — the storage-partitioned-join contract): bucket(n, col)
  * = floorMod(xxhash64(col), n), BIT-IDENTICAL to the stage-time
  * layout expression and the plan-time literal derivation
  * ([[graft.operators.ManifestTable.BucketTransform]] — the one
  * discipline every hidden-partitioning consumer shares). The stable
  * `canonicalName` is what two scans' partitionings compare by.
  */
private[graft] object GraftBucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): floorMod(xxhash64(col), n) — the manifest layout transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType == LongType,
      s"graft bucket binds (INT numBuckets, BIGINT col), got $inputType")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] =
        Array(IntegerType, LongType)
      override def resultType(): DataType = LongType
      override def name(): String = "bucket"
      override def canonicalName(): String = "graft.bucket"
      override def isResultNullable: Boolean = false
      override def produceResult(row: org.apache.spark.sql.catalyst
          .InternalRow): java.lang.Long =
        java.lang.Math.floorMod(
          org.apache.spark.sql.catalyst.expressions.XXH64
            .hashLong(row.getLong(1), 42L),
          row.getInt(0).toLong)
    }
  }
}

/** The layout's `days` transform as a catalog function (round 13 —
  * writer-side distribution + SPJ breadth): floorDiv(epoch-micros,
  * 86400000000), bit-identical to
  * [[graft.operators.ManifestTable.DaysTransform]]'s stage-time and
  * plan-time forms.
  */
private[graft] object GraftDaysFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types.{DataType, LongType}

  override def name(): String = "days"
  override def description(): String =
    "days(col): floorDiv(epoch-micros, 86400000000) — the manifest layout transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"graft days binds (BIGINT col), got $inputType")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(LongType)
      override def resultType(): DataType = LongType
      override def name(): String = "days"
      override def canonicalName(): String = "graft.days"
      override def isResultNullable: Boolean = false
      override def produceResult(row: org.apache.spark.sql.catalyst
          .InternalRow): java.lang.Long =
        java.lang.Math.floorDiv(row.getLong(0), 86400000000L)
    }
  }
}

/** A WIDTH-NAMED truncate transform function (round 13 — SPJ
  * breadth): `truncate_100(col)` = col - floorMod(col, 100). The
  * width lives in the NAME, not a literal argument, because Spark's
  * `KeyGroupedPartitioning.satisfies0` requires every LEAF of a
  * partition expression to appear among the join's clustering keys —
  * a literal-width `truncate(100, col)` transform carries the literal
  * as a leaf and can never satisfy a clustered distribution (bucket
  * only works because Spark special-cases `numBuckets` out of the
  * children). Width equality across the two join sides is enforced
  * exactly where it belongs: `canonicalName` matching in
  * `TransformExpression.isSameFunction`.
  */
private[graft] final case class GraftTruncateWidthFunction(w: Long)
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types.{DataType, LongType}

  override def name(): String = s"truncate_$w"
  override def description(): String =
    s"truncate_$w(col): col - floorMod(col, $w) — the manifest layout transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"graft truncate_$w binds (BIGINT col), got $inputType")
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] = Array(LongType)
      override def resultType(): DataType = LongType
      override def name(): String = s"truncate_$w"
      override def canonicalName(): String = s"graft.truncate_$w"
      override def isResultNullable: Boolean = false
      override def produceResult(row: org.apache.spark.sql.catalyst
          .InternalRow): java.lang.Long = {
        val v = row.getLong(0)
        v - java.lang.Math.floorMod(v, w)
      }
    }
  }
}

/** The layout's `truncate` transform as a two-argument catalog
  * function (round 13): truncate(w, col) = col - floorMod(col, w),
  * bit-identical to
  * [[graft.operators.ManifestTable.TruncateTransform]]. This is the
  * SQL-facing spelling; plan-time partitioning reports the
  * width-named [[GraftTruncateWidthFunction]] form instead (see its
  * scaladoc for why).
  */
private[graft] object GraftTruncateFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction}
  import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

  override def name(): String = "truncate"
  override def description(): String =
    "truncate(w, col): col - floorMod(col, w) — the manifest layout transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      (inputType.fields(0).dataType == IntegerType ||
        inputType.fields(0).dataType == LongType) &&
      inputType.fields(1).dataType == LongType,
      s"graft truncate binds (INT|BIGINT width, BIGINT col), got $inputType")
    val wideWidth = inputType.fields(0).dataType == LongType
    new ScalarFunction[java.lang.Long] {
      override def inputTypes(): Array[DataType] =
        Array(if (wideWidth) LongType else IntegerType, LongType)
      override def resultType(): DataType = LongType
      override def name(): String = "truncate"
      override def canonicalName(): String = "graft.truncate"
      override def isResultNullable: Boolean = false
      override def produceResult(row: org.apache.spark.sql.catalyst
          .InternalRow): java.lang.Long = {
        val w = if (wideWidth) row.getLong(0) else row.getInt(0).toLong
        val v = row.getLong(1)
        v - java.lang.Math.floorMod(v, w)
      }
    }
  }
}

/** The SQL catalog for manifest tables (round 10 — the r9-VERDICT top
  * task's second half): a `TableCatalog` + `SupportsNamespaces` plugin
  * mapping identifiers onto a warehouse directory tree, so the whole
  * lifecycle runs in plain SQL:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.gm",
  *   "graft.sources.ManifestCatalog")
  * spark.conf.set("spark.sql.catalog.gm.warehouse", "/tables")
  *
  * CREATE NAMESPACE gm.sales
  * CREATE TABLE gm.sales.orders (k BIGINT, v BIGINT)
  *   USING graft-manifest TBLPROPERTIES ('statsColumns' = 'k')
  * INSERT INTO gm.sales.orders SELECT id, id * 2 FROM range(100)
  * SELECT * FROM gm.sales.orders VERSION AS OF 1
  * SELECT * FROM gm.sales.orders TIMESTAMP AS OF '…'
  * ALTER TABLE gm.sales.orders RENAME COLUMN v TO val
  * ALTER TABLE gm.sales.orders ADD COLUMN note STRING
  * DELETE FROM gm.sales.orders WHERE k = 3
  * DROP TABLE gm.sales.orders
  * }}}
  *
  * A table IS its directory (`warehouse/ns…/name/_manifests`), so the
  * catalog holds no state of its own — exactly like a path-addressed
  * lakehouse: every catalog operation is a manifest-log operation
  * (CREATE = the v1 schema commit, ALTER COLUMN = the metadata-only
  * evolution commits, DROP = remove the directory). Time travel maps
  * onto the log's version pinning ([[ManifestTable.versionAt]] for
  * `TIMESTAMP AS OF`, which Spark passes in MICROseconds).
  */
class ManifestCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  // ---- functions (round 12 — storage-partitioned joins) ----
  // The ONE catalog function: the layout's own bucket transform. Its
  // existence is what lets Spark resolve a scan-reported
  // KeyGroupedPartitioning over bucket(n, col) into a bound
  // TransformExpression — two co-bucketed manifest tables then join
  // WITHOUT a shuffle (EnsureRequirements recognizes the matching
  // canonical function + numBuckets on both sides).

  override def listFunctions(namespace: Array[String])
      : Array[Identifier] =
    Array("bucket", "days", "truncate")
      .map(Identifier.of(namespace, _))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name().toLowerCase match {
      case "bucket" => GraftBucketFunction
      case "days" => GraftDaysFunction
      case "truncate" => GraftTruncateFunction
      case TruncWidthRe(w) => GraftTruncateWidthFunction(w.toLong)
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }

  private val TruncWidthRe = "truncate_(\\d+)".r

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse")))
    Files.createDirectories(warehouse): Unit
  }

  override def name(): String = catalogName

  private def safe(seg: String): String = {
    require(seg.nonEmpty && !seg.contains('/') && !seg.contains('\\') &&
      seg != "." && seg != "..",
      s"illegal catalog path segment: '$seg'")
    seg
  }

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)((p, s) => p.resolve(safe(s)))

  private def tableDir(ident: Identifier): Path =
    nsDir(ident.namespace()).resolve(safe(ident.name()))

  private def isTable(p: Path): Boolean =
    Files.isDirectory(p.resolve("_manifests"))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && isTable(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) {
      // metadata tables (round 13 — Iceberg's surface): `cat.ns.t
      // .history` arrives as Identifier(ns :+ t, "history"); when the
      // trailing-namespace element IS a table and the name is a known
      // metadata kind, serve the metadata view. A REAL table named
      // "history" always wins (the isTable check above).
      if (ManifestMetaTables.kinds.contains(ident.name().toLowerCase)
          && ident.namespace().nonEmpty) {
        val base = Identifier.of(ident.namespace().init,
          ident.namespace().last)
        val baseDir = tableDir(base)
        if (isTable(baseDir))
          return ManifestMetaTables(baseDir, ident.name().toLowerCase,
            s"$catalogName.${ident.toString}")
      }
      throw new NoSuchTableException(ident)
    }
    new ManifestV2Table(dir, ManifestTable.latestVersion(dir),
      pinned = false, s"$catalogName.${ident.toString}")
  }

  /** `VERSION AS OF <v>` — a pinned snapshot. A NON-numeric version
    * resolves as a TAG name (round 13 — Iceberg's named refs):
    * `VERSION AS OF 'pre_migration'` reads the tagged snapshot.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException =>
        ManifestTable.resolveTag(dir, version).getOrElse(
          throw new IllegalArgumentException(
            s"no tag '$version' on $dir — " +
            s"known: ${ManifestTable.tags(dir).keys.toSeq.sorted
              .mkString(", ")}"))
    }
    require(v >= 1 && v <= ManifestTable.latestVersion(dir),
      s"no committed version $v at $dir")
    new ManifestV2Table(dir, v, pinned = true,
      s"$catalogName.${ident.toString}@v$v")
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val v = ManifestTable.versionAt(dir, timestamp / 1000L)
    new ManifestV2Table(dir, v, pinned = true,
      s"$catalogName.${ident.toString}@t$timestamp")
  }

  /** `PARTITIONED BY (bucket(16, c) / truncate(1000, k) / days(ts))`
    * → HIDDEN partitioning (wave 151, composing waves 142+147): the
    * transforms land in the table's `ptrans=` meta at CREATE, every
    * SQL INSERT lays its files out by the transform tuple with the
    * per-file transform bounds as virtual stats, and plain predicates
    * prune through the layout with zero user knowledge of it —
    * exactly Iceberg's DDL surface for the feature.
    */
  private def toPartTransform(t: Transform, schema: StructType)
      : ManifestTable.PartTransform = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    def field(e: org.apache.spark.sql.connector.expressions.Expression)
        : String = e match {
      case f: NamedReference =>
        require(f.fieldNames.length == 1,
          "graft-manifest transforms take top-level columns, got " +
          f.fieldNames.mkString("."))
        f.fieldNames()(0)
      case other => throw new IllegalArgumentException(
        s"expected a column reference in ${t.name}, got $other")
    }
    def lit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Long = e match {
      case l: Literal[_] => l.value match {
        case i: Integer => i.toLong
        case l2: java.lang.Long => l2
        case other => throw new IllegalArgumentException(
          s"expected an integer argument in ${t.name}, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"expected a literal argument in ${t.name}, got $other")
    }
    val built = (t.name.toLowerCase, t.arguments().toSeq) match {
      case ("bucket", Seq(n, c)) =>
        ManifestTable.BucketTransform(lit(n).toInt, field(c))
      case ("truncate", Seq(a, b)) =>
        // both arg orders circulate (Iceberg DDL: truncate(w, col);
        // Spark's Expressions.truncate: (col, w))
        if (a.isInstanceOf[Literal[_]])
          ManifestTable.TruncateTransform(lit(a), field(b))
        else ManifestTable.TruncateTransform(lit(b), field(a))
      case ("days", Seq(c)) => ManifestTable.DaysTransform(field(c))
      case (other, _) => throw new UnsupportedOperationException(
        s"graft-manifest supports PARTITIONED BY bucket(n, col) / " +
        s"truncate(w, col) / days(col) — got $other")
    }
    val f = schema.fields.find(_.name == built.srcCol).getOrElse(
      throw new IllegalArgumentException(
        s"PARTITIONED BY ${built.meta}: no column '${built.srcCol}'"))
    require(f.dataType == org.apache.spark.sql.types.LongType,
      s"PARTITIONED BY ${built.meta} needs a BIGINT column; " +
      s"'${built.srcCol}' is ${f.dataType.simpleString}")
    built
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val transforms = partitions.toSeq.map(toPartTransform(_, schema))
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    Files.createDirectories(dir)
    // durable table properties (reserved keys stay Spark's)
    val reserved = Set(TableCatalog.PROP_PROVIDER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_IS_MANAGED_LOCATION,
      TableCatalog.PROP_COLLATION)
    val props = properties.asScala.toMap.filterNot {
      case (k, _) => reserved(k) || k.startsWith("option.")
    }
    Option(properties.get(TableCatalog.PROP_PROVIDER)).foreach(p =>
      require(p.equalsIgnoreCase("graft-manifest") ||
        p.equalsIgnoreCase("graft-manifest-v2"),
        s"this catalog creates graft-manifest tables, got USING $p"))
    if (props.nonEmpty) ManifestV2Table.writeProps(dir, props)
    // the v1 commit IS the table creation: empty live set, schema meta
    // (+ the hidden-partitioning transforms, which every later commit
    // inherits)
    ManifestTable.commit(dir, Nil,
      s"schema=${ManifestTable.schemaMeta(schema)}" +
        (if (transforms.isEmpty) ""
         else " " + ManifestTable.transformsMeta(transforms)))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case c: TableChange.RenameColumn =>
        require(c.fieldNames.length == 1,
          "graft-manifest columns are top-level")
        ManifestTable.renameColumn(dir, c.fieldNames()(0), c.newName()): Unit
      case c: TableChange.DeleteColumn =>
        require(c.fieldNames.length == 1,
          "graft-manifest columns are top-level")
        ManifestTable.dropColumn(dir, c.fieldNames()(0)): Unit
      case c: TableChange.AddColumn =>
        require(c.fieldNames.length == 1,
          "graft-manifest columns are top-level")
        ManifestTable.addColumn(dir, c.fieldNames()(0), c.dataType()): Unit
      case c: TableChange.UpdateColumnType =>
        // ALTER COLUMN … TYPE — metadata-only SAFE widening (round 13);
        // narrowing/cross-family casts fail loudly inside
        require(c.fieldNames.length == 1,
          "graft-manifest columns are top-level")
        ManifestTable.widenColumnType(dir, c.fieldNames()(0),
          c.newDataType()): Unit
      case c: TableChange.SetProperty =>
        // adding a CHECK constraint validates the EXISTING rows first
        // (Delta's rule — a constraint the current data violates must
        // not land); non-check properties set unconditionally
        if (c.property().startsWith("check.") &&
            ManifestTable.latestVersion(dir) > 0 &&
            ManifestTable.filesFor(dir,
              ManifestTable.latestVersion(dir)).nonEmpty) {
          val df = org.apache.spark.sql.SparkSession.active.read
            .format("graft-manifest").option("path", dir.toString).load()
          ManifestV2Table.enforceChecks(df,
            Seq((c.property().stripPrefix("check."), c.value())),
            s"the existing rows of ${ident.toString}")
        }
        ManifestV2Table.writeProps(dir,
          ManifestV2Table.props(dir) + (c.property() -> c.value()))
      case c: TableChange.RemoveProperty =>
        ManifestV2Table.writeProps(dir,
          ManifestV2Table.props(dir) - c.property())
      case c => throw new UnsupportedOperationException(
        s"graft-manifest ALTER TABLE does not support $c — supported: " +
        "RENAME COLUMN, DROP COLUMN, ADD COLUMN, ALTER COLUMN TYPE " +
        "(safe widening), SET/UNSET TBLPROPERTIES")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) false
    else { deleteTree(dir); true }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val from = tableDir(oldIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (isTable(to)) throw new TableAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to): Unit
  }

  // ---- namespaces (directories; a namespace dir holds no _manifests) --

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    val s = Files.list(d)
    try s.iterator().asScala
      .filter(p => Files.isDirectory(p) && !isTable(p))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
    finally s.close()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (Files.isDirectory(nsDir(namespace)) && !isTable(nsDir(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    Files.createDirectories(nsDir(namespace)): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-manifest namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) false
    else {
      if (!cascade) {
        val s = Files.list(d)
        val empty = try !s.iterator().hasNext finally s.close()
        require(empty, s"namespace ${namespace.mkString(".")} is not " +
          "empty — DROP NAMESPACE … CASCADE")
      }
      deleteTree(d)
      true
    }
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
