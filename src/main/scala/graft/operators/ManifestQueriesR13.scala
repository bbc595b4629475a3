package graft.operators

import java.nio.file.{Files, Path, Paths}
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ROUND-13 manifest declared queries (split discipline — the
  * ManifestQueriesSql object regrew past 1,200 lines): the native
  * distributed-write/replace-where/dynamic-overwrite lifecycles, the
  * days-laid storage-partitioned join, metadata tables, layout-aware
  * OPTIMIZE, write sort order, tags, and CHECK constraints. Shared
  * helpers (sqlCatalog / sqlIdent) stay on [[ManifestSqlOps]]; oracles
  * stay in [[ManifestOracles]]. Zero hash drift: same keys, same
  * builders, proven by the 3-SF sweep.
  */
private[graft] object ManifestR13Ops {
  import ManifestSqlOps.{sqlCatalog, sqlIdent}

  private[graft] def spjDaysRoot(spark: SparkSession, dir: String)
      : (Path, Path) = {
    val out = ArtifactCache.path("manifest_spj_days",
      Seq(s"$dir/events.parquet")) { staging =>
      val base = Paths.get(staging)
      val (f, d) = (base.resolve("f"), base.resolve("d"))
      Files.createDirectories(f); Files.createDirectories(d)
      ManifestOps.deleteTree(f); ManifestOps.deleteTree(d)
      val cat = sqlCatalog(spark)
      spark.sql(s"CREATE TABLE $cat.${sqlIdent(f)} " +
        "(event_id BIGINT, day_us BIGINT, value DOUBLE) " +
        "USING `graft-manifest` PARTITIONED BY (days(day_us)) " +
        "TBLPROPERTIES ('writeFiles'='128')")
      spark.sql(s"CREATE TABLE $cat.${sqlIdent(d)} " +
        "(day_us BIGINT, day_n BIGINT) " +
        "USING `graft-manifest` PARTITIONED BY (days(day_us)) " +
        "TBLPROPERTIES ('writeFiles'='128')")
      val ev = Tables.events(spark, dir).select(
        col("event_id"),
        (col("ts_us") - pmod(col("ts_us"), lit(86400000000L)))
          .as("day_us"),
        col("value"))
      ev.createOrReplaceTempView("spj_days_fact_src")
      ev.groupBy("day_us").agg(count(lit(1)).as("day_n"))
        .createOrReplaceTempView("spj_days_dim_src")
      spark.sql(s"INSERT INTO $cat.${sqlIdent(f)} " +
        "SELECT * FROM spj_days_fact_src")
      spark.sql(s"INSERT INTO $cat.${sqlIdent(d)} " +
        "SELECT * FROM spj_days_dim_src")
      Files.createFile(base.resolve("_SUCCESS")): Unit
    }
    (Paths.get(out).resolve("f"), Paths.get(out).resolve("d"))
  }

  /** The REPLACE WHERE lifecycle (round 13 — Delta's `replaceWhere`,
    * Spark SQL's `INSERT INTO … REPLACE WHERE`): orders range-laid
    * into 8 key-stat files, then ONE atomic statement replaces the
    * [max/4, max/2) key band with re-priced rows that also DROP the
    * band's %3 keys — region replacement, not an update. Only the
    * band's files are touched (Wave186Spec proves band-disjoint files
    * survive by path identity); the read-back equals the oracle's
    * outside ∪ replaced composition.
    */
  private[graft] def replaceWhereRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_replace_where",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` " +
        "TBLPROPERTIES ('statsColumns' = 'o_orderkey')")
      orders.repartitionByRange(8, col("o_orderkey"))
        .createOrReplaceTempView("rw_orders_src")
      spark.sql(s"INSERT INTO $ident SELECT * FROM rw_orders_src")
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val (lo, hi) = (mx / 4, mx / 2)
      spark.sql(
        s"""INSERT INTO $ident
           |REPLACE WHERE o_orderkey >= $lo AND o_orderkey < $hi
           |SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
           |  o_totalprice + 1000.0 AS o_totalprice, o_orderdate,
           |  o_orderpriority
           |FROM rw_orders_src
           |WHERE o_orderkey >= $lo AND o_orderkey < $hi
           |  AND o_orderkey % 3 <> 0""".stripMargin)
      require(ManifestTable.latestVersion(root) == 3,
        "replaceWhere lifecycle = CREATE + INSERT + ONE replace commit")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }

  /** The native distributed-write lifecycle (round 13 — r12-VERDICT
    * task 6 as a DECLARED query): a 32-partition INSERT into a
    * bucket(8)-laid table goes through the true V2 BatchWrite —
    * Spark plans the requested range-cluster-by-transform exchange,
    * each task writes ONE bucket-exact stats-carrying file, and the
    * commit is O(buckets) files, not O(tasks×buckets) (the require
    * asserts ≤8; Wave183Spec proves the mechanics). The read-back
    * composes with hidden-partition pruning as usual.
    */
  private[graft] def distSinkRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_dist_sink",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` " +
        "PARTITIONED BY (bucket(8, o_orderkey)) " +
        "TBLPROPERTIES ('statsColumns' = 'o_orderkey', " +
        "'writeFiles' = '32')")
      orders.repartition(32).createOrReplaceTempView("dist_orders_src")
      spark.sql(s"INSERT INTO $ident SELECT * FROM dist_orders_src")
      val files = ManifestTable.entriesFor(root,
        ManifestTable.latestVersion(root))
      require(files.size <= 8 && files.nonEmpty,
        s"32 input partitions into bucket(8) committed ${files.size} " +
        "files — the write distribution did not apply")
      require(files.forall(_.band("__ptb8_o_orderkey")
          .exists(b => b._1 == b._2)),
        "every committed file must be bucket-exact")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }

  /** The DYNAMIC partition overwrite lifecycle (round 13 — Iceberg's
    * signature overwrite): events laid by days(day_us), then one
    * `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` whose
    * source holds ONLY days 3-5 (values doubled) — exactly those three
    * day partitions are replaced, every other day's files survive
    * untouched (Wave188Spec proves file identity; this query proves
    * the rows). The conf is scoped with try/finally, the wave-180
    * discipline.
    */
  private[graft] def dynOverwriteRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_dyn_overwrite",
      Seq(s"$dir/events.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident " +
        "(event_id BIGINT, day_us BIGINT, value DOUBLE) " +
        "USING `graft-manifest` PARTITIONED BY (days(day_us)) " +
        "TBLPROPERTIES ('statsColumns'='event_id,day_us', " +
        "'writeFiles'='128')")
      val ev = Tables.events(spark, dir).select(
        col("event_id"),
        (col("ts_us") - pmod(col("ts_us"), lit(86400000000L)))
          .as("day_us"),
        col("value"))
      ev.createOrReplaceTempView("dyo_events_src")
      spark.sql(s"INSERT INTO $ident SELECT * FROM dyo_events_src")
      val day = 86400000000L
      val d0 = ev.agg(min("day_us")).head().getLong(0)
      val (lo, hi) = (d0 + 3 * day, d0 + 6 * day)
      val k = "spark.sql.sources.partitionOverwriteMode"
      val prev = spark.conf.getOption(k)
      spark.conf.set(k, "dynamic")
      try spark.sql(
        s"""INSERT OVERWRITE $ident
           |SELECT event_id, day_us, value * 2 AS value
           |FROM dyo_events_src
           |WHERE day_us >= $lo AND day_us < $hi""".stripMargin)
      finally prev match {
        case Some(v) => spark.conf.set(k, v)
        case None => spark.conf.unset(k)
      }
      require(ManifestTable.latestVersion(root) == 3,
        "dynamic-overwrite lifecycle = CREATE + INSERT + ONE commit")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }

  /** The layout-aware OPTIMIZE lifecycle (round 13, wave 190): orders
    * bucket(8)-laid, fragmented by TWO insert halves (~2 files per
    * bucket), then ONE `OPTIMIZE` statement packs the small-file tail
    * through the ROLLING writer — every packed file stays
    * bucket-exact, so the storage-partitioned layout survives its own
    * maintenance (Wave190Spec asserts file counts, exactness, and the
    * post-pack zero-exchange SPJ; this query proves the rows).
    */
  private[graft] def optimizeLayoutRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_optimize_layout",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` " +
        "PARTITIONED BY (bucket(8, o_orderkey)) " +
        "TBLPROPERTIES ('statsColumns' = 'o_orderkey')")
      orders.createOrReplaceTempView("optl_orders_src")
      spark.sql(s"INSERT INTO $ident " +
        "SELECT * FROM optl_orders_src WHERE o_orderkey % 2 = 0")
      spark.sql(s"INSERT INTO $ident " +
        "SELECT * FROM optl_orders_src WHERE o_orderkey % 2 = 1")
      val frag = ManifestTable.entriesFor(root,
        ManifestTable.latestVersion(root)).size
      graft.plans.GraftSql.sql(spark, s"OPTIMIZE $ident")
        .head().getLong(0)
      val packed = ManifestTable.entriesFor(root,
        ManifestTable.latestVersion(root))
      require(packed.size <= 8 && packed.size < frag,
        s"OPTIMIZE must pack $frag files to O(buckets), got " +
        s"${packed.size}")
      require(packed.forall(_.band("__ptb8_o_orderkey")
          .exists(b => b._1 == b._2)),
        "every packed file must stay bucket-exact")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }

  /** The write SORT-ORDER lifecycle (round 13, wave 191 — Iceberg's
    * write.sort-order as a table property): orders inserted from a
    * SHUFFLED source into a `sortOrder='o_orderkey'` table come out
    * range-clustered — per-file key bands disjoint (asserted here),
    * so band predicates skip physically without any layout transform.
    */
  private[graft] def sortedSinkRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_sorted_sink",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` " +
        "TBLPROPERTIES ('statsColumns' = 'o_orderkey', " +
        "'sortOrder' = 'o_orderkey', 'writeFiles' = '8')")
      orders.repartition(16)
        .createOrReplaceTempView("sorted_orders_src")
      spark.sql(s"INSERT INTO $ident SELECT * FROM sorted_orders_src")
      val bands = ManifestTable.entriesFor(root,
          ManifestTable.latestVersion(root))
        .flatMap(_.band("o_orderkey")).sortBy(_._1)
      require(bands.size >= 2 && bands.sliding(2).forall {
          case Seq((_, h1), (l2, _)) => h1 <= l2
          case _ => true
        },
        s"sortOrder files must carry disjoint key bands, got $bands")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }

  /** The TAG lifecycle (round 13, wave 192 — Iceberg's named refs):
    * orders committed, tagged 'pre_delete', then a band-scoped CoW
    * DELETE; the
    * declared read is `VERSION AS OF 'pre_delete'` — the tag pins the
    * pre-delete snapshot BY NAME, and log expiry retains it
    * (Wave192Spec proves retention + immutability; this query proves
    * the pinned rows).
    */
  private[graft] def tagRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_sql_tag",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` " +
        "TBLPROPERTIES ('statsColumns' = 'o_orderkey')")
      orders.repartitionByRange(4, col("o_orderkey"))
        .createOrReplaceTempView("tag_orders_src")
      spark.sql(s"INSERT INTO $ident SELECT * FROM tag_orders_src")
      graft.plans.GraftSql.sql(spark,
        s"CALL $cat.system.create_tag($ident, 'pre_delete', 2)")
        .collect()
      // band-shaped predicate: SupportsDelete's V2 translation takes
      // band+equality shapes (an arithmetic %-predicate does not
      // translate — the documented DELETE contract)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.sql(s"DELETE FROM $ident WHERE o_orderkey >= ${mx / 3} " +
        s"AND o_orderkey <= ${mx / 2}")
      require(ManifestTable.latestVersion(root) == 3,
        "tag lifecycle = CREATE + INSERT + DELETE")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }

  /** The CHECK-constraint lifecycle (round 13, wave 193 — Delta's
    * table constraints): a `check.priced='o_totalprice > 0'` table
    * takes the conforming source whole, then REFUSES a negated-price
    * batch — the refusal is asserted (nothing may land), and the
    * read-back equals the source exactly: enforcement leaked zero
    * rows in either direction.
    */
  private[graft] def constraintRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_sql_constraint",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging).resolve("t")
      Files.createDirectories(root)
      ManifestOps.deleteTree(root)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` " +
        "TBLPROPERTIES ('statsColumns' = 'o_orderkey', " +
        "'check.priced' = 'o_totalprice > 0')")
      orders.createOrReplaceTempView("ck_orders_src")
      spark.sql(s"INSERT INTO $ident SELECT * FROM ck_orders_src")
      val refused =
        try {
          spark.sql(s"INSERT INTO $ident " +
            "SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, " +
            "-o_totalprice, o_orderdate, o_orderpriority " +
            "FROM ck_orders_src")
          false
        } catch { case _: Exception => true }
      require(refused, "the negated-price batch must refuse")
      require(ManifestTable.latestVersion(root) == 2,
        "the refused INSERT must not commit")
      Files.createFile(Paths.get(staging).resolve("_SUCCESS")): Unit
    }
    Paths.get(out).resolve("t")
  }
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "manifest_sql_constraint" -> { (spark, dir) =>
      // after one accepted and one refused batch, the table IS the
      // source — constraint enforcement leaked nothing either way
      val root = constraintRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "manifest_sql_tag" -> { (spark, dir) =>
      // the named ref pins the pre-delete snapshot: the read-back IS
      // the full source table even though the live table lost %13
      val root = tagRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)} VERSION AS OF 'pre_delete'
           |ORDER BY o_orderkey""".stripMargin)
    },

    "sink_manifest_sorted" -> { (spark, dir) =>
      // the sort-clustered write read back through a band filter —
      // the disjoint layout admits ~1/8 of the files (fixture asserts
      // disjointness; value equality proves the relayout is lossless)
      val root = sortedSinkRoot(spark, dir)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |WHERE o_orderkey >= ${mx / 2} AND o_orderkey <= ${mx / 2 + mx / 8}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "manifest_optimize_layout" -> { (spark, dir) =>
      // the packed table read back with a pruned band filter — value
      // equality through fragment + pack IS the assertion
      val root = optimizeLayoutRoot(spark, dir)
      val orders = Tables.table(spark, dir, "orders")
      val cat = sqlCatalog(spark)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |WHERE o_orderkey >= ${mx / 8} AND o_orderkey <= ${mx / 4}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "manifest_meta_history" -> { (spark, dir) =>
      // the `t.history` METADATA TABLE (round 13 — Iceberg's audit
      // surface as a queryable table, served as a LocalScan because
      // the rows ARE driver-scale metadata): the replaceWhere
      // lifecycle's log is deterministic — CREATE checkpoint, INSERT
      // delta, one replacewhere delta — so the oracle is literal
      val root = replaceWhereRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT version, kind, operation
           |FROM $cat.${sqlIdent(root)}.`history`
           |ORDER BY version""".stripMargin)
    },

    "manifest_meta_partitions" -> { (spark, dir) =>
      // the `t.partitions` metadata table over the days-laid SPJ
      // fact: the layout's value set must equal the data's distinct
      // days — metadata cross-checked against a fact the oracle
      // derives from the raw events
      val (f, _) = spjDaysRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT value FROM $cat.${sqlIdent(f)}.`partitions`
           |ORDER BY value""".stripMargin)
    },

    "manifest_dynamic_overwrite" -> { (spark, dir) =>
      // the partition-scoped replacement read back whole: days 3-5
      // carry doubled values, every other day is the source verbatim
      val root = dynOverwriteRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT event_id, day_us, value
           |FROM $cat.${sqlIdent(root)}
           |ORDER BY event_id""".stripMargin)
    },

    "sink_manifest_dist" -> { (spark, dir) =>
      // the distributed clustered write read back whole through the
      // catalog — value equality through the native write path IS the
      // assertion (file-count/bucket-exactness asserted in the
      // fixture; plan mechanics in Wave183Spec)
      val root = distSinkRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "manifest_replace_where" -> { (spark, dir) =>
      // predicate-scoped overwrite read back through the catalog: the
      // band's rows were atomically swapped for the re-priced %3-
      // filtered set, everything outside is untouched bytes
      val root = replaceWhereRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "join_manifest_spj_days" -> { (spark, dir) =>
      // the DAYS-laid storage-partitioned join (round 13 — SPJ
      // breadth beyond bucket): both sides report
      // KeyGroupedPartitioning over days(day_us) resolved through the
      // catalog's days function, and the per-day fact⋈dim join plans
      // zero exchanges below the join (Wave184Spec asserts the plan;
      // this query proves the rows). Money-style sums ride the exact
      // DECIMAL cast so execution order cannot perturb the hash. The
      // SPJ conf is scoped with try/finally + eager materialization,
      // the wave-180 discipline.
      val (f, d) = spjDaysRoot(spark, dir)
      val cat = sqlCatalog(spark)
      val key = "spark.sql.sources.v2.bucketing.enabled"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try {
        val df = spark.sql(
          s"""SELECT f.day_us, count(*) AS n,
             |  CAST(round(sum(CAST(f.value AS DECIMAL(18,6))), 4)
             |    AS DOUBLE) AS sumv,
             |  max(d.day_n) AS day_n
             |FROM $cat.${sqlIdent(f)} f
             |JOIN $cat.${sqlIdent(d)} d ON f.day_us = d.day_us
             |GROUP BY f.day_us ORDER BY f.day_us""".stripMargin)
        spark.createDataFrame(
          java.util.Arrays.asList(df.collect(): _*), df.schema)
          .orderBy("day_us")
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    },

  )
}
