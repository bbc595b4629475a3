package graft.operators

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** MUTATION half of [[ManifestTable]] (round-10 split; zero behavior
  * change): copy-on-write rewrites (merge/upsert/update/delete),
  * OPTIMIZE (small-file, z-order), all three deletion-vector
  * granularities with their MOR reads and compactions, retention
  * (vacuum / orphan sweep / log expiry), and full compaction.
  * Internal — every consumer addresses [[ManifestTable]].
  */
trait ManifestMutations { self: ManifestLog with ManifestData
    with ManifestTxn with ManifestBloom =>

  /** Copy-on-write MERGE: apply `transform` to the rows of ONLY the
    * files whose [min,max] key band intersects [loKey, hiKey] — the
    * stats-pruned affected set — and commit (untouched entries ++
    * rewritten replacements) as the next snapshot. `transform` must be
    * the identity outside the key band (its matches are band-scoped by
    * contract), which is what makes skipping disjoint files lossless.
    * This is the Delta/Iceberg merge shape stated minimally: at 100 TB
    * a keyed upsert touching one tenant's band rewrites the handful of
    * files the stats admit, never the table; pinned readers of the
    * pre-merge snapshot are untouched by immutability.
    */
  def mergeCoW(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, loKey: Long, hiKey: Long)(
      transform: DataFrame => DataFrame): Int = {
    requireNoScopedDvs(root, from, "mergeCoW")
    val fromEntries = entriesFor(root, from)
    val hit = fromEntries.filter(_.mayContain(keyCol, loKey, hiKey))
    require(hit.nonEmpty, "merge band matched no file — nothing to do")
    val affected = spark.read.schema(schema).parquet(
      hit.map(e => root.resolve("data").resolve(e.path).toString): _*)
    // the rewrite preserves the hit files' FULL stats coverage (plus
    // the merge key), STRING bounds included: a merge must not
    // silently narrow the column set later prunes rely on
    val statCols = (keyCol +: hit.flatMap(_.stats.map(_._1))).distinct
    val strCols = hit.flatMap(_.strStats.map(_._1)).distinct
    val dblCols = hit.flatMap(_.dblStats.map(_._1)).distinct
    val decCols = hit.flatMap(_.decStats.map(_._1)).distinct
    val binCols = hit.flatMap(_.binStats.map(_._1)).distinct
    val rewritten = stageWithTypedStats(
      restoreTransformCols(root, from, transform(affected))
        .repartitionByRange(math.max(1, hit.size), col(keyCol)),
      root, s"merge$from${nonce()}", statCols, strCols, dblCols, decCols,
      binCols)
    // SERIALIZABLE-WRITER commit: recompute the conflict checks against
    // whatever parent WINS the publish race, aborting on BOTH conflict
    // directions. (1) A concurrent commit removed a file this merge
    // read — our read set was rewritten under us, and committing would
    // silently drop that writer's changes (the Delta/Iceberg
    // write-conflict rule). (2) A concurrent commit ADDED a file whose
    // key band intersects our merge band — its rows should have seen
    // the transform but did not, the write-skew the r8 ADVICE showed
    // made the old check merely snapshot-isolated; a band-intersecting
    // newcomer (or one with no stats for the key, which cannot prove
    // disjointness) now aborts too. Appends and merges DISJOINT from
    // the band still compose: the retry folds their files in via the
    // delta log and both commits land.
    val fromPaths = fromEntries.map(_.path).toSet
    commitOpsF(root, _ => s"merge=v$from") { parent =>
      val cur = entriesFor(root, parent)
      val curPaths = cur.map(_.path).toSet
      if (!hit.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"merge over v$from conflicts: a commit after v$from " +
          "rewrote part of its read set — re-read and re-merge")
      val inBandNewcomer = cur.filterNot(e => fromPaths.contains(e.path))
        .filter(_.mayContain(keyCol, loKey, hiKey))
      if (inBandNewcomer.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"merge over v$from conflicts: a commit after v$from added " +
          s"rows inside the merge band [$loKey,$hiKey] " +
          s"(${inBandNewcomer.map(_.path).mkString(",")}) that the " +
          "transform never saw — re-read and re-merge")
      Some((rewritten, hit.map(_.path)))
    }.get
  }

  /** MERGE INTO (keyed upsert), copy-on-write: replace the FULL ROW of
    * every table key present in `updates` and insert the rows whose
    * key the table does not hold — one OCC commit, the
    * `WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT` shape
    * every real format exposes. Unlike [[mergeCoW]] (a band-scoped
    * TRANSFORM the caller expresses as a closure), the update set here
    * is DATA: an arbitrary keyed DataFrame, which is how upserts
    * arrive in production (a CDC batch, a corrections feed).
    *
    * Touched-file discovery is a broadcast join of the update keys
    * against the per-file key bands (one row per live file — the same
    * order of bytes the manifest itself is): a file is touched when
    * ANY update key falls inside its recorded band; a file with no
    * recorded `keyCol` stats cannot prove disjointness and is always
    * touched. The collected result is O(|touched files|), never
    * O(table) — at 100 TB a keyed upsert rewrites the handful of files
    * the stats admit ("a MERGE into 100 TB rewrites 3 files, not the
    * table"). Matched-row replacement and the insert remainder are ONE
    * union: survivors (touched-file rows whose key is not updated)
    * ++ the entire `updates` frame.
    *
    * Contract: `updates` carries `schema`'s columns and at most one
    * row per key (two images of one key would land nondeterministically).
    * Conflicts follow [[mergeCoW]]'s SERIALIZABLE-WRITER rule,
    * recomputed inside the publish retry against the winning parent:
    * a later commit that rewrote part of the touched set aborts, and
    * so does a newcomer file whose band intersects the updates' global
    * key range (its rows never saw the upsert — write skew); appends
    * and rewrites disjoint from the range compose. Key-based DVs
    * inherit with the documented [[deleteMOR]] caveat (an upserted key
    * that is also in an outstanding DV stays subtracted until
    * [[compactMOR]]); scoped DVs fail loudly like every rewrite path.
    */
  /** Touched-file discovery shared by [[upsert]] and [[mergeRewrite]]:
    * a broadcast join of the distinct source keys against the per-file
    * key bands (one row per live file — the same order of bytes the
    * manifest itself is); a file is touched when ANY key falls inside
    * its recorded band, and a file with no recorded `keyCol` stats
    * cannot prove disjointness so it is always touched. The collected
    * result is O(|touched files|), never O(table).
    */
  private def touchedByKeys(spark: SparkSession, entries: Seq[FileEntry],
      keyCol: String, keys: DataFrame): Seq[FileEntry] = {
    val bandsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(entries.map { e =>
        val b = e.band(keyCol)
        org.apache.spark.sql.Row(e.path,
          b.map(_._1).getOrElse(Long.MinValue),
          b.map(_._2).getOrElse(Long.MaxValue))
      }, 1),
      StructType(Seq(
        org.apache.spark.sql.types.StructField("__p",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__lo",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__hi",
          org.apache.spark.sql.types.LongType))))
    val hitPaths = keys.select(col(keyCol).as("__k")).distinct()
      .join(broadcast(bandsDf),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .select("__p").distinct().collect().map(_.getString(0)).toSet
    entries.filter(e => hitPaths(e.path))
  }

  def upsert(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, updates: DataFrame): Int = {
    requireNoScopedDvs(root, from, "upsert")
    // ONE aggregate pass over the update set yields the emptiness
    // check, the duplicate-key check (two source images of one key
    // would land nondeterministically — fail loudly like Delta's
    // "multiple source rows matched" MERGE error), and the global key
    // bounds the conflict rule needs
    val kb = updates.agg(min(keyCol), max(keyCol), count(lit(1)),
      count_distinct(col(keyCol))).head()
    require(!kb.isNullAt(0), "upsert with an empty updates set")
    require(kb.getLong(2) == kb.getLong(3),
      s"upsert updates carry duplicate $keyCol values " +
      s"(${kb.getLong(2)} rows, ${kb.getLong(3)} distinct keys) — " +
      "an upsert needs at most one row per key")
    val (kLo, kHi) = (kb.getLong(0), kb.getLong(1))
    val fromEntries = entriesFor(root, from)
    val hit = touchedByKeys(spark, fromEntries, keyCol, updates)
    val data = root.resolve("data")
    val ordered = updates.select(schema.fieldNames.map(col).toSeq: _*)
    val touched =
      if (hit.isEmpty) null
      else spark.read.schema(schema)
        .parquet(hit.map(e => data.resolve(e.path).toString): _*)
    // TARGET-side duplicate guard (round-10 ADVICE, medium): the
    // upsert replaces every matched key with ONE source image — if the
    // table holds duplicate rows for a matched key (appends are
    // unconstrained, nothing in the format prevents it), Delta MERGE
    // semantics would update EVERY matched row while this path would
    // silently collapse them to one. Fail loudly instead of losing
    // rows; general per-row semantics live in [[mergeRewrite]]. One
    // O(touched) aggregate over the files already being rewritten.
    if (hit.nonEmpty) {
      val dup = touched
        .join(broadcast(updates.select(keyCol).distinct()),
          Seq(keyCol), "left_semi")
        .agg(count(lit(1)), count_distinct(col(keyCol))).head()
      require(dup.getLong(0) == dup.getLong(1),
        s"upsert matched ${dup.getLong(0)} target rows across " +
        s"${dup.getLong(1)} keys — the target holds duplicate rows " +
        "for matched key(s), which a one-image-per-key upsert would " +
        "silently collapse; deduplicate the target (or merge row-wise " +
        "via mergeCoW) first")
    }
    val replacement =
      if (hit.isEmpty) ordered // pure insert — nothing to rewrite
      else touched
        .join(updates.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(ordered)
    // rewritten files keep the touched set's stats coverage (mergeCoW
    // discipline, string bounds included): an upsert must not narrow
    // the columns later prunes rely on
    val statCols = (keyCol +: hit.flatMap(_.stats.map(_._1))).distinct
    val strColsU = hit.flatMap(_.strStats.map(_._1)).distinct
    val dblColsU = hit.flatMap(_.dblStats.map(_._1)).distinct
    val decColsU = hit.flatMap(_.decStats.map(_._1)).distinct
    val binColsU = hit.flatMap(_.binStats.map(_._1)).distinct
    val rewritten = stageWithTypedStats(
      restoreTransformCols(root, from, replacement)
        .repartitionByRange(math.max(1, hit.size + 1), col(keyCol)),
      root, s"upsert$from${nonce()}", statCols, strColsU, dblColsU,
      decColsU, binColsU)
    val fromPaths = fromEntries.map(_.path).toSet
    commitOpsF(root, _ => s"upsert=v$from") { parent =>
      val cur = entriesFor(root, parent)
      val curPaths = cur.map(_.path).toSet
      if (!hit.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"upsert over v$from conflicts: a commit after v$from " +
          "rewrote part of its touched set — re-read and re-upsert")
      val newcomer = cur.filterNot(e => fromPaths.contains(e.path))
        .filter(_.mayContain(keyCol, kLo, kHi))
      if (newcomer.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"upsert over v$from conflicts: a commit after v$from added " +
          s"rows inside the update key range [$kLo,$kHi] " +
          s"(${newcomer.map(_.path).mkString(",")}) the upsert never " +
          "saw — re-read and re-upsert")
      Some((rewritten, hit.map(_.path)))
    }.get
  }

  /** GENERAL row-level MERGE rewrite (round 11 — the r10-VERDICT top
    * task's engine): the copy-on-write core [[upsert]] specializes,
    * with the per-ROW semantics left to the caller. `rewrite` maps the
    * touched files' rows to their full replacement — survivors,
    * per-row updated images, per-row deletes, AND inserted rows, which
    * is exactly the shape SQL MERGE's conditional WHEN clauses need
    * (an upsert's one-image-per-key contract cannot express "update
    * every matched row", "delete some matched rows", or NOT MATCHED BY
    * SOURCE at all).
    *
    * Touched-file discovery: the stats-banded key join of
    * [[touchedByKeys]] over `sourceKeys` — O(|touched|), never
    * O(table) — UNLESS `touchAll` (a merge with NOT MATCHED BY SOURCE
    * actions must see every target row; that clause is definitionally
    * a full-table operation, exactly as in Delta). Conflicts follow
    * the [[upsert]] serializable-writer rule recomputed inside the
    * publish retry: a later commit that rewrote part of the touched
    * set aborts, and so does a newcomer file whose band intersects the
    * source key range (or ANY newcomer under `touchAll` — its rows
    * never saw the not-matched-by-source clauses). An empty source
    * with band-scoped semantics returns `from` untouched (nothing can
    * match and nothing inserts).
    */
  def mergeRewrite(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, sourceKeys: DataFrame,
      touchAll: Boolean, extraMetaOf: Int => String = _ => "")(
      rewrite: DataFrame => DataFrame): Int = {
    requireNoScopedDvs(root, from, "mergeRewrite")
    val kb = sourceKeys.agg(min(keyCol), max(keyCol), count(lit(1))).head()
    val bounds =
      if (kb.isNullAt(0)) None else Some((kb.getLong(0), kb.getLong(1)))
    // only a ROWLESS source no-ops (nothing can match, nothing can
    // insert); an all-NULL-key source has no bounds but its rows are
    // still legitimate NOT MATCHED inserts (review fix — the old
    // bounds-only test silently dropped them), so it proceeds with an
    // empty touched set
    if (kb.getLong(2) == 0L && !touchAll) return from
    val fromEntries = entriesFor(root, from)
    val hit =
      if (touchAll) fromEntries
      else touchedByKeys(spark, fromEntries, keyCol, sourceKeys)
    val data = root.resolve("data")
    val touched =
      if (hit.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(hit.map(e => data.resolve(e.path).toString): _*)
    val replacement = rewrite(touched)
    // the non-narrowing rule: rewritten files keep the touched set's
    // stat coverage, string bounds included
    val statCols = (keyCol +: hit.flatMap(_.stats.map(_._1))).distinct
    val strCols = hit.flatMap(_.strStats.map(_._1)).distinct
    val dblCols = hit.flatMap(_.dblStats.map(_._1)).distinct
    val decCols = hit.flatMap(_.decStats.map(_._1)).distinct
    val binCols = hit.flatMap(_.binStats.map(_._1)).distinct
    val rewritten = stageWithTypedStats(
      restoreTransformCols(root, from, replacement)
        .repartitionByRange(math.max(1, hit.size + 1), col(keyCol)),
      root, s"mrg$from${nonce()}", statCols, strCols, dblCols, decCols,
      binCols)
    val fromPaths = fromEntries.map(_.path).toSet
    // extraMetaOf rides THE merge commit itself — schema evolution on
    // MERGE widens atomically with the data change (review fix: a
    // separate pre-commit ADD would survive a failed or conflicted
    // merge as a half-applied DDL) — and is recomputed PER ATTEMPT
    // against the winning parent (round 12 — r11-ADVICE fix: an
    // evolved schema= built from a pre-read snapshot would overwrite
    // a concurrent non-intersecting commit's own widening, dropping
    // that column from the logical view)
    commitOpsF(root, p => (s"merge=v$from " + extraMetaOf(p)).trim) { parent =>
      val cur = entriesFor(root, parent)
      val curPaths = cur.map(_.path).toSet
      if (!hit.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"merge over v$from conflicts: a commit after v$from " +
          "rewrote part of its touched set — re-read and re-merge")
      val newcomer = cur.filterNot(e => fromPaths.contains(e.path))
        .filter(e => touchAll || bounds.exists { case (lo, hi) =>
          e.mayContain(keyCol, lo, hi) })
      if (newcomer.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"merge over v$from conflicts: a commit after v$from added " +
          s"rows the merge never saw " +
          s"(${newcomer.map(_.path).mkString(",")}) — re-read and " +
          "re-merge")
      Some((rewritten, hit.map(_.path)))
    }.get
  }

  /** Shared copy-on-write file-rewrite commit: replace exactly `hit`
    * with the staged `replacement` rows under the upsert's conflict
    * discipline (touched files must still be live at publish time).
    * The staged files keep the touched set's stat coverage — a rewrite
    * must never narrow the columns later prunes rely on.
    */
  private def rewriteFilesCoW(spark: SparkSession, root: Path, from: Int,
      hit: Seq[FileEntry], replacement: DataFrame, opMeta: String,
      batchTag: String): Int = {
    val statCols = hit.flatMap(_.stats.map(_._1)).distinct
    val strCols = hit.flatMap(_.strStats.map(_._1)).distinct
    val dblCols = hit.flatMap(_.dblStats.map(_._1)).distinct
    val decCols = hit.flatMap(_.decStats.map(_._1)).distinct
    val binCols = hit.flatMap(_.binStats.map(_._1)).distinct
    // restore hidden-partitioning virtual columns FIRST: the leading
    // stat column (the clustering key below) may itself be a __pt*
    // transform the logical-schema frame lacks (wave-150 review fix)
    val restored = restoreTransformCols(root, from, replacement)
    // keep the rewritten set clustered on the leading stat column when
    // one exists (narrow bounds keep the files prunable); otherwise
    // the layout is whatever the replacement plan produced
    val laid = statCols.headOption match {
      case Some(k) => restored
        .repartitionByRange(math.max(1, hit.size), col(k))
      case None => restored
    }
    // a stats-less table (no statsColumns property) still rewrites —
    // there is just no coverage to preserve
    val rewritten =
      if (statCols.isEmpty && strCols.isEmpty && dblCols.isEmpty &&
          decCols.isEmpty && binCols.isEmpty)
        stage(laid, root, s"$batchTag$from${nonce()}")
      else stageWithTypedStats(laid,
        root, s"$batchTag$from${nonce()}", statCols, strCols, dblCols,
        decCols, binCols)
    commitOpsF(root, _ => opMeta) { parent =>
      val curPaths = entriesFor(root, parent).map(_.path).toSet
      if (!hit.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"$opMeta over v$from conflicts: a commit after v$from " +
          "rewrote part of its touched set — re-read and re-run")
      Some((rewritten, hit.map(_.path)))
    }.get
  }

  /** SQL `DELETE FROM … WHERE cond` as copy-on-write: the band hints
    * (derived from the pushable conjuncts of `cond`) prune the
    * candidate set through the per-file stats, ONLY the files that may
    * hold matching rows are rewritten without them, and everything
    * else rides the delta commit untouched — "a DELETE on 100 TB
    * rewrites 3 files". Rows where `cond` is NULL are kept (SQL DELETE
    * semantics). Key-based DVs survive (they subtract by key on any
    * file); scoped DVs fail loudly like every rewrite path.
    */
  def deleteWhereCoW(spark: SparkSession, root: Path,
      schema: StructType, cond: Column,
      longBands: Seq[(String, Long, Long)] = Nil,
      strBands: Seq[(String, Option[String], Option[String])] = Nil,
      dblBands: Seq[(String, Double, Double)] = Nil,
      decBands: Seq[(String, Option[BigDecimal], Option[BigDecimal])] = Nil)
      : Int = {
    val from = latestVersion(root)
    require(from > 0, "deleteWhere on an empty table")
    requireNoScopedDvs(root, from, "deleteWhere")
    // hidden partitioning composes: derive virtual transform bands
    // from the caller's plain bands (superset admit either way)
    val (hit, _, _) = prunedEntries(root, from,
      longBands ++ hiddenBands(root, from, longBands), strBands,
      dblBands, decBands)
    if (hit.isEmpty) return from
    val data = root.resolve("data")
    val kept = spark.read.schema(schema)
      .parquet(hit.map(e => data.resolve(e.path).toString): _*)
      .filter(not(coalesce(cond, lit(false))))
    rewriteFilesCoW(spark, root, from, hit, kept,
      s"delete=v$from", "del")
  }

  /** Predicate-scoped overwrite (round 13 — Delta's `replaceWhere`,
    * Spark SQL's `INSERT INTO … REPLACE WHERE cond SELECT …`): one
    * atomic commit that (a) rewrites ONLY the stats-admitted files
    * without their `cond`-matching rows and (b) appends `newData` —
    * "replace this region of a 100 TB table" touches the region's
    * files and nothing else. Incoming rows must ALL satisfy `cond`
    * (checked with a short-circuit `limit(1)` job) — Delta's
    * constraint, because a stray row would silently land OUTSIDE the
    * region the statement claims to replace. Rows where `cond` is
    * NULL survive (the DELETE rule). The rewritten half preserves the
    * touched files' stats coverage; the inserted half records
    * `statsCols` (the table's stats properties) plus any layout
    * transforms, so both halves stay prunable. Scoped DVs refuse like
    * every rewrite path; key DVs survive (they subtract by key on any
    * file).
    */
  def replaceWhereCoW(spark: SparkSession, root: Path,
      schema: StructType, cond: Column, newData: DataFrame,
      statsCols: Seq[String] = Nil, strStatsCols: Seq[String] = Nil,
      dblStatsCols: Seq[String] = Nil, decStatsCols: Seq[String] = Nil,
      longBands: Seq[(String, Long, Long)] = Nil,
      strBands: Seq[(String, Option[String], Option[String])] = Nil,
      dblBands: Seq[(String, Double, Double)] = Nil,
      decBands: Seq[(String, Option[BigDecimal], Option[BigDecimal])] = Nil)
      : Int = {
    val from = latestVersion(root)
    require(from > 0, "replaceWhere on an empty table")
    requireNoScopedDvs(root, from, "replaceWhere")
    val aligned = newData.select(schema.fieldNames.map(col).toSeq: _*)
    // the inserted half: its own stats (table properties) + layout
    val insLaid = restoreTransformCols(root, from, aligned)
    val insNames: Seq[String] =
      if (statsCols.isEmpty && strStatsCols.isEmpty &&
          dblStatsCols.isEmpty && decStatsCols.isEmpty)
        stage(insLaid, root, s"rwi$from${nonce()}")
      else stageWithTypedStats(insLaid, root, s"rwi$from${nonce()}",
        statsCols, strStatsCols, dblStatsCols, decStatsCols, Nil)
    spliceReplaceWhere(spark, root, schema, cond, insNames,
      longBands, strBands, dblBands, decBands)
  }

  /** The commit half of REPLACE WHERE, shared by the frame path above
    * and the native V2 batch write (whose tasks have ALREADY written
    * the new-data files distributed — `newLines` are their staged
    * manifest entry lines). Validates the Delta constraint against the
    * staged FILES (row-exact, short-circuit `limit(1)`); on violation
    * the staged files are deleted and nothing commits.
    */
  def spliceReplaceWhere(spark: SparkSession, root: Path,
      schema: StructType, cond: Column, newLines: Seq[String],
      longBands: Seq[(String, Long, Long)] = Nil,
      strBands: Seq[(String, Option[String], Option[String])] = Nil,
      dblBands: Seq[(String, Double, Double)] = Nil,
      decBands: Seq[(String, Option[BigDecimal], Option[BigDecimal])] = Nil)
      : Int = {
    val from = latestVersion(root)
    require(from > 0, "replaceWhere on an empty table")
    requireNoScopedDvs(root, from, "replaceWhere")
    val data = root.resolve("data")
    val newPaths = newLines.map(_.split('\t').head)
    if (newPaths.nonEmpty) {
      val stray = !spark.read.schema(schema)
        .parquet(newPaths.map(p => data.resolve(p).toString): _*)
        .filter(not(coalesce(cond, lit(false)))).limit(1).isEmpty
      if (stray) {
        newPaths.foreach(p =>
          try Files.deleteIfExists(data.resolve(p)): Unit
          catch { case _: Exception => () })
        throw new IllegalArgumentException(
          "REPLACE WHERE: every incoming row must satisfy the " +
          "predicate — a non-matching row would land outside the " +
          "replaced region (write it with a plain INSERT instead)")
      }
    }
    val (hit, _, _) = prunedEntries(root, from,
      longBands ++ hiddenBands(root, from, longBands), strBands,
      dblBands, decBands)
    // survivors: the touched files' non-matching rows, coverage
    // preserved, clustered back on the leading recorded stat column
    val survNames: Seq[String] = if (hit.isEmpty) Nil else {
      val sc = hit.flatMap(_.stats.map(_._1)).distinct
      val sSc = hit.flatMap(_.strStats.map(_._1)).distinct
      val dSc = hit.flatMap(_.dblStats.map(_._1)).distinct
      val decSc = hit.flatMap(_.decStats.map(_._1)).distinct
      val binSc = hit.flatMap(_.binStats.map(_._1)).distinct
      val kept = restoreTransformCols(root, from,
        spark.read.schema(schema)
          .parquet(hit.map(e => data.resolve(e.path).toString): _*)
          .filter(not(coalesce(cond, lit(false)))))
      val laid = sc.headOption match {
        case Some(k) => kept.repartitionByRange(
          math.max(1, hit.size), col(k))
        case None => kept
      }
      if (sc.isEmpty && sSc.isEmpty && dSc.isEmpty && decSc.isEmpty &&
          binSc.isEmpty) stage(laid, root, s"rws$from${nonce()}")
      else stageWithTypedStats(laid, root, s"rws$from${nonce()}",
        sc, sSc, dSc, decSc, binSc)
    }
    commitOpsF(root, _ => s"replacewhere=v$from") { parent =>
      val curPaths = entriesFor(root, parent).map(_.path).toSet
      if (!hit.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"replaceWhere over v$from conflicts: a commit after " +
          s"v$from rewrote part of its touched set — re-read and re-run")
      Some((survNames ++ newLines, hit.map(_.path)))
    }.get
  }

  /** DYNAMIC partition overwrite (round 13 — Iceberg's signature
    * overwrite, Spark's `INSERT OVERWRITE` under
    * `partitionOverwriteMode=dynamic`): replace exactly the partitions
    * PRESENT in the new data, leave every other partition's bytes
    * untouched. The tasks have already written the new files
    * (`newLines`); the partition-value set S is read EXACTLY from
    * their own `__pt*` column (one narrow scan — that set IS the
    * operation's metadata, O(|touched partitions|)). Current files
    * whose recorded virtual band intersects S are the touched set:
    * bucket-exact files with value ∈ S drop WITHOUT a rewrite (a
    * bucket transform maps NULL sources to a real bucket, so the band
    * covers every row); days/truncate files rewrite their survivors
    * through the row-exact filter instead — their bands ignore NULL
    * source rows, which belong to the null partition and must survive
    * unless S contains it. Needs exactly ONE layout transform (a
    * multi-transform partition tuple cannot be expressed as
    * per-coordinate membership; the capability gate refuses earlier).
    */
  def spliceDynamicOverwrite(spark: SparkSession, root: Path,
      schema: StructType, newLines: Seq[String]): Int = {
    val from = latestVersion(root)
    require(from > 0, "dynamic overwrite on an empty table")
    requireNoScopedDvs(root, from, "dynamic overwrite")
    val ts = partTransforms(root, from)
    require(ts.size == 1,
      "dynamic partition overwrite needs exactly one layout " +
      s"transform, got [${ts.map(_.meta).mkString(", ")}]")
    val t = ts.head
    val data = root.resolve("data")
    val newPaths = newLines.map(_.split('\t').head)
    if (newPaths.isEmpty) return from // empty source replaces nothing
    val vrows = spark.read
      .parquet(newPaths.map(p => data.resolve(p).toString): _*)
      .select(col(t.statName)).distinct().collect()
    val hasNullPart = vrows.exists(_.isNullAt(0))
    val values = vrows.filterNot(_.isNullAt(0)).map(_.getLong(0)).toSet
    val cur = entriesFor(root, from)
    val hit = cur.filter { e =>
      e.band(t.statName) match {
        // a recorded band still says nothing about NULL source rows —
        // when S holds the null partition, no file proves disjointness
        case Some((lo, hi)) => hasNullPart ||
          values.exists(v => v >= lo && v <= hi)
        case None => true // cannot prove disjoint — conservative
      }
    }
    val bucketLike = t.isInstanceOf[BucketTransform]
    val (drop, rewriteSet) = hit.partition(e => bucketLike &&
      e.band(t.statName).exists { case (lo, hi) =>
        lo == hi && values.contains(lo) })
    val survNames: Seq[String] = if (rewriteSet.isEmpty) Nil else {
      val inS = {
        val base = if (values.isEmpty) lit(false)
          else t.exprCol.isin(values.toSeq: _*)
        if (hasNullPart) base || t.exprCol.isNull else base
      }
      val sc = rewriteSet.flatMap(_.stats.map(_._1)).distinct
      val sSc = rewriteSet.flatMap(_.strStats.map(_._1)).distinct
      val dSc = rewriteSet.flatMap(_.dblStats.map(_._1)).distinct
      val decSc = rewriteSet.flatMap(_.decStats.map(_._1)).distinct
      val binSc = rewriteSet.flatMap(_.binStats.map(_._1)).distinct
      val kept = restoreTransformCols(root, from,
        spark.read.schema(schema)
          .parquet(rewriteSet.map(e =>
            data.resolve(e.path).toString): _*)
          .filter(not(coalesce(inS, lit(false)))))
      val laid = sc.headOption match {
        case Some(k) => kept.repartitionByRange(
          math.max(1, rewriteSet.size), col(k))
        case None => kept
      }
      if (sc.isEmpty && sSc.isEmpty && dSc.isEmpty && decSc.isEmpty &&
          binSc.isEmpty) stage(laid, root, s"dyo$from${nonce()}")
      else stageWithTypedStats(laid, root, s"dyo$from${nonce()}",
        sc, sSc, dSc, decSc, binSc)
    }
    commitOpsF(root, _ => s"dynoverwrite=v$from") { parent =>
      val curPaths = entriesFor(root, parent).map(_.path).toSet
      if (!hit.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"dynamic overwrite over v$from conflicts: a commit after " +
          s"v$from rewrote part of its touched set — re-run")
      Some((survNames ++ newLines, hit.map(_.path)))
    }.get
  }

  /** SQL `UPDATE … SET … WHERE cond` as copy-on-write: same pruned
    * touched-set discipline as [[deleteWhereCoW]]; within the admitted
    * files each row either takes the assigned values (cond TRUE) or
    * survives verbatim (FALSE or NULL).
    */
  def updateWhereCoW(spark: SparkSession, root: Path,
      schema: StructType, cond: Column, set: Map[String, Column],
      longBands: Seq[(String, Long, Long)] = Nil,
      strBands: Seq[(String, Option[String], Option[String])] = Nil,
      dblBands: Seq[(String, Double, Double)] = Nil,
      decBands: Seq[(String, Option[BigDecimal], Option[BigDecimal])] = Nil)
      : Int = {
    require(set.nonEmpty, "UPDATE with no assignments")
    set.keys.foreach(k => require(schema.fieldNames.contains(k),
      s"UPDATE assigns unknown column '$k'"))
    val from = latestVersion(root)
    require(from > 0, "updateWhere on an empty table")
    requireNoScopedDvs(root, from, "updateWhere")
    // hidden partitioning composes: derive virtual transform bands
    // from the caller's plain bands (superset admit either way)
    val (hit, _, _) = prunedEntries(root, from,
      longBands ++ hiddenBands(root, from, longBands), strBands,
      dblBands, decBands)
    if (hit.isEmpty) return from
    val data = root.resolve("data")
    val c = coalesce(cond, lit(false))
    val updated = spark.read.schema(schema)
      .parquet(hit.map(e => data.resolve(e.path).toString): _*)
      .select(schema.fields.toSeq.map { f =>
        set.get(f.name) match {
          case Some(v) =>
            when(c, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    rewriteFilesCoW(spark, root, from, hit, updated,
      s"update=v$from", "upd")
  }

  /** OPTIMIZE (small-file bin-packing): rewrite ONLY the live files
    * smaller than `smallBytes` into one range-laid, stats-carrying
    * replacement set; files already big enough survive verbatim —
    * unlike [[compact]]'s full rewrite, cost rides the small-file
    * tail, not the table (the Delta OPTIMIZE shape). Returns the new
    * version (or `from` unchanged when <2 small files — nothing to
    * pack). Pinned readers of `from` are untouched by immutability.
    *
    * LAYOUT-AWARE since round 13 (wave 190): on a transform-laid
    * table the packed set is clustered by (transform tuple, key) and
    * staged through the ROLLING writer
    * ([[graft.sources.ManifestRollingStage]]) — every packed file
    * stays value-exact, so a storage-partitioned layout SURVIVES its
    * own maintenance (the old key-only range layout straddled
    * transform values and silently degraded SPJ to exchanges).
    */
  def optimizeSmall(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, smallBytes: Long): Int = {
    requireNoScopedDvs(root, from, "optimizeSmall")
    val data = root.resolve("data")
    val (small, keep) = entriesFor(root, from)
      .partition(e => Files.size(data.resolve(e.path)) < smallBytes)
    if (small.size < 2) return from
    // preserve the packed files' stats coverage (string bounds
    // included), like mergeCoW
    val statCols = (keyCol +: small.flatMap(_.stats.map(_._1))).distinct
    val strCols = small.flatMap(_.strStats.map(_._1)).distinct
    val dblCols = small.flatMap(_.dblStats.map(_._1)).distinct
    val decCols = small.flatMap(_.decStats.map(_._1)).distinct
    val binCols = small.flatMap(_.binStats.map(_._1)).distinct
    val restored = restoreTransformCols(root, from,
      spark.read.schema(schema)
        .parquet(small.map(e => data.resolve(e.path).toString): _*))
    val target = math.max(1,
      (small.map(e => Files.size(data.resolve(e.path))).sum
        / smallBytes).toInt)
    val ts = partTransforms(root, from)
    val packed =
      if (ts.nonEmpty) {
        val sortCols = (ts.map(_.statName) :+ keyCol).map(col)
        graft.sources.ManifestRollingStage.stage(
          restored.repartitionByRange(target, sortCols: _*)
            .sortWithinPartitions(sortCols: _*),
          root.toString, s"opt$from${nonce()}",
          statCols, strCols, dblCols, decCols, binCols)
      } else stageWithTypedStats(
        restored.repartitionByRange(target, col(keyCol)),
        root, s"opt$from${nonce()}", statCols, strCols, dblCols,
        decCols, binCols)
    commitOpsF(root, _ => s"optimize=v$from") { parent =>
      val curPaths = entriesFor(root, parent).map(_.path).toSet
      if (!small.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"optimize over v$from conflicts with a later rewrite")
      Some((packed, small.map(_.path)))
    }.get
  }

  /** Deletion-vector names a version references (merge-on-read state),
    * from the `dv=` header meta.
    */
  def dvsFor(root: Path, version: Int): Seq[String] =
    headerMeta(root, version).get("dv")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** Spread the low 21 bits of a long into every SECOND bit position —
    * one half of a 2-D Morton (Z-order) interleave, expressed entirely
    * in built-in bitwise ops so the whole z-value computation stays
    * inside whole-stage codegen (the standard mask-and-shift bit
    * spreading; public-domain bit-twiddling identity).
    */
  private def spreadBits(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    var x = c.bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Every-THIRD-bit spread of the low 21 bits — the 3-D Morton half
    * (same mask-and-shift identity, stride 3).
    */
  private def spreadBits3(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    var x = c.bitwiseAND(lit(0x1FFFFFL))
    x = x.bitwiseOR(shiftleft(x, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** OPTIMIZE ZORDER (multi-dimensional clustering): rewrite the live
    * set ordered by the 2-D Morton interleave of `cols`, so every
    * rewritten file covers a small HYPER-RECTANGLE of the (c1, c2)
    * value space instead of a slab of one column. The point is what it
    * does to [[readPrunedMulti]]: under a single-column range layout a
    * predicate on the OTHER column admits every file (each file spans
    * that column's full range); under the z-layout both columns' per-
    * file bands are narrow, so a 2-predicate prune admits roughly the
    * product of the band fractions — the Delta OPTIMIZE ZORDER
    * rationale, and the reason real tables z-order their two or three
    * hottest filter columns. Each column is affinely normalized to 21
    * bits (doubles, clamp-safe for any value range — the z-value only
    * ORDERS the rewrite, data is untouched), interleaved with
    * codegen-friendly mask/shift ops, range-partitioned and sorted on
    * the z-value, and staged with stats on BOTH columns. Commit
    * follows [[optimizeSmall]]'s read-set conflict rule.
    */
  def optimizeZorder(spark: SparkSession, root: Path, from: Int,
      schema: StructType, cols: Seq[String], targetFiles: Int): Int = {
    requireNoScopedDvs(root, from, "optimizeZorder")
    require(cols.size == 2 || cols.size == 3,
      "optimizeZorder interleaves 2 or 3 columns")
    val live = entriesFor(root, from)
    val df = read(spark, root, from, schema)
    val aggs = cols.flatMap(c => Seq(min(c), max(c)))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    if (b.isNullAt(0)) return from // empty table — nothing to cluster
    def norm(i: Int) = {
      val (lo, hi) = (b.getLong(2 * i), b.getLong(2 * i + 1))
      val span = math.max(1L, hi - lo)
      ((col(cols(i)) - lit(lo)).cast("double") * lit(2097151.0 / span))
        .cast("long")
    }
    val spread: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (cols.size == 2) spreadBits else spreadBits3
    val z = cols.indices.map(i => shiftleft(spread(norm(i)), i))
      .reduce(_ bitwiseOR _)
    // stats on both interleaved columns: the narrow per-file bands ARE
    // the product this op sells; preserve any further recorded columns
    // of BOTH kinds (the non-narrowing rule, wave-139 review fix)
    val statCols = (cols ++ live.flatMap(_.stats.map(_._1))).distinct
    val strCols = live.flatMap(_.strStats.map(_._1)).distinct
    val dblCols = live.flatMap(_.dblStats.map(_._1)).distinct
    val decCols = live.flatMap(_.decStats.map(_._1)).distinct
    val binCols = live.flatMap(_.binStats.map(_._1)).distinct
    val rewritten = stageWithTypedStats(
      restoreTransformCols(root, from, df.withColumn("__z", z)
        .repartitionByRange(math.max(1, targetFiles), col("__z"))
        .sortWithinPartitions("__z").drop("__z")),
      root, s"zorder$from${nonce()}", statCols, strCols, dblCols,
      decCols, binCols)
    commitOpsF(root, _ => s"zorder=v$from") { parent =>
      val curPaths = entriesFor(root, parent).map(_.path).toSet
      if (!live.forall(e => curPaths.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"zorder over v$from conflicts with a later rewrite")
      Some((rewritten, live.map(_.path)))
    }.get
  }

  /** Merge-on-READ delete — the CoW alternative real formats call
    * deletion vectors / positional deletes: the commit writes ONLY a
    * tiny sidecar of deleted keys (one column, `keyCol`-named) and
    * annotates the snapshot; zero data files are rewritten (write
    * cost = |deleted keys|), and READERS subtract the vectors with one
    * broadcast anti-join ([[readMOR]]) until a [[compactMOR]]
    * materializes the view. The trade vs [[mergeCoW]]: MOR makes
    * deletes O(delta) at write time and taxes every read; CoW pays
    * once at write. Delete-by-key stays correct across concurrent
    * key-preserving rewrites, so no file-level conflict check is
    * needed; the DV list accumulates parent-dependently inside the
    * publish retry.
    */
  def deleteMOR(root: Path, deletedKeys: DataFrame): Int = {
    val rel = stage(deletedKeys.coalesce(1), root, s"dv${nonce()}")
    // a zero-op DELTA commit: the live set is the parent's verbatim,
    // so the manifest body is empty and only the header's dv= list
    // changes — write cost O(|deleted keys|), the whole point of MOR
    commitOpsF(root, parent => "dv=" +
        ((if (parent == 0) Nil else dvsFor(root, parent)) ++ rel)
          .mkString(","))(_ => Some((Nil, Nil))).get
  }

  /** Positional (file-SCOPED) deletion-vector names of a version, from
    * the `dvp=` header meta — the round-9 upgrade of the key-based
    * `dv=` form.
    */
  def scopedDvsFor(root: Path, version: Int): Seq[String] =
    headerMeta(root, version).get("dvp")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** Positional (file-scoped) merge-on-read delete — the form real
    * formats actually ship (Delta deletion vectors / Iceberg
    * positional deletes, minimally restated): the sidecar records
    * (key, src file) pairs, resolved by a stats-pruned provenance
    * scan at delete time, and [[readMORScoped]] subtracts a row only
    * when BOTH its key and its source file match. That closes the
    * key-based form's documented semantic edge: an append that
    * RE-INSERTS a previously deleted key produces rows in a NEW file,
    * which no scoped vector matches — they survive, exactly like the
    * real formats (proven in Wave117Spec).
    *
    * The price is the positional contract: a scoped vector is pinned
    * to its file, so REWRITING that file would silently resurrect its
    * deleted rows under new file names. The rewrite paths
    * (mergeCoW / optimizeSmall / compact / the CDF) therefore fail
    * loudly while scoped vectors are outstanding — run
    * [[compactMORScoped]] first, which materializes and clears them
    * (the same order of operations Delta's OPTIMIZE enforces by
    * applying DVs during the rewrite).
    *
    * Write cost: one provenance scan over the files whose key stats
    * admit the deleted keys (never the table, when stats exist) + a
    * sidecar of |deleted keys| rows; zero data files rewritten.
    */
  def deleteMORScoped(spark: SparkSession, root: Path,
      deletedKeys: DataFrame, keyCol: String, schema: StructType): Int = {
    val from = latestVersion(root)
    require(from > 0, "scoped delete on an empty table")
    val entries = entriesFor(root, from)
    val bounds = deletedKeys.agg(min(keyCol), max(keyCol)).head()
    if (bounds.isNullAt(0)) return from // nothing to delete
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val hit = entries.filter(_.mayContain(keyCol, lo, hi))
    if (hit.isEmpty) return from
    val sidecar = spark.read.schema(schema).parquet(
        hit.map(e => root.resolve("data").resolve(e.path).toString): _*)
      .withColumn("__src",
        substring_index(input_file_name(), "/", -1))
      .join(broadcast(deletedKeys.select(keyCol).distinct()),
        Seq(keyCol), "left_semi")
      .select(col(keyCol), col("__src").as("src"))
    // sorted by src so the native scan's executor-side per-file slice
    // reads prune pages via the parquet column index (round 13)
    val rel = stage(sidecar.coalesce(1).sortWithinPartitions("src"),
      root, s"dvp${nonce()}")
    commitOpsF(root, parent => "dvp=" +
        ((if (parent == 0) Nil else scopedDvsFor(root, parent)) ++ rel)
          .mkString(",")) { parent =>
      // positional provenance is only valid while the scanned files
      // are live: a rewrite that raced in invalidates the (key, src)
      // pairs — conflict instead of committing stale scopes
      val live = filesFor(root, parent).toSet
      if (!hit.forall(e => live.contains(e.path)))
        throw new java.util.ConcurrentModificationException(
          s"scoped delete over v$from conflicts: a commit rewrote its " +
          "provenance files — re-read and re-delete")
      Some((Nil, Nil)) // zero-op body; only the dvp= meta changes
    }.get
  }

  /** Read a snapshot MINUS its scoped vectors: rows drop only when
    * (key, source file) BOTH match — one broadcast anti-join against
    * the sidecars, with provenance from `input_file_name()`.
    */
  def readMORScoped(spark: SparkSession, root: Path, version: Int,
      schema: StructType, keyCol: String): DataFrame = {
    val base = read(spark, root, version, schema)
    val dvps = scopedDvsFor(root, version)
    if (dvps.isEmpty) base
    else {
      val sc = spark.read.parquet(dvps.map(f =>
          root.resolve("data").resolve(f).toString): _*)
        .select(col(keyCol).as("__k"), col("src").as("__s")).distinct()
      base.withColumn("__src",
          substring_index(input_file_name(), "/", -1))
        .join(broadcast(sc),
          col(keyCol) === col("__k") && col("__src") === col("__s"),
          "left_anti")
        .drop("__src")
    }
  }


  /** Row-POSITION deletion-vector names of a version (`dvr=` header
    * meta) — round 10's final granularity step (r9-VERDICT task 5).
    */
  def rowDvsFor(root: Path, version: Int): Seq[String] =
    headerMeta(root, version).get("dvr")
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  /** ROW-POSITION merge-on-read delete — the exact granularity real
    * formats ship (Delta's deletion vectors are per-file row-index
    * bitmaps; Iceberg's positional delete files are (file, pos) rows):
    * the sidecar records `(src file, row position)` pairs and
    * [[readMORPositional]] subtracts exactly those rows. This closes
    * the key-scoped form's one declared granularity gap
    * (r9 VERDICT "what's wrong" #3): a file holding two rows with the
    * SAME key — or two fully identical rows — can now have exactly
    * one of them deleted, which no key-based predicate can express.
    *
    * `positions` carries (src: string — file name relative to data/,
    * pos: long — the row's index within that file, i.e. parquet's
    * `_metadata.row_index`). Same positional contract as the scoped
    * form: vectors pin to their files, rewrites fail loudly while any
    * are outstanding ([[compactMORPositional]] materializes first),
    * and the publish loop conflicts if a racing commit rewrote a
    * referenced file. Write cost: one sidecar of |deleted rows| —
    * zero data files rewritten.
    */
  def deleteMORPositional(spark: SparkSession, root: Path,
      positions: DataFrame): Int = {
    val from = latestVersion(root)
    require(from > 0, "positional delete on an empty table")
    require(positions.columns.toSeq == Seq("src", "pos"),
      s"positions frame carries (src, pos), got " +
      positions.columns.mkString(","))
    val touched = positions.select("src").distinct()
      .collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return from
    val rel = stage(positions.coalesce(1).sortWithinPartitions("src", "pos"),
      root, s"dvr${nonce()}")
    commitOpsF(root, parent => "dvr=" +
        ((if (parent == 0) Nil else rowDvsFor(root, parent)) ++ rel)
          .mkString(",")) { parent =>
      val live = filesFor(root, parent).toSet
      if (!touched.forall(live.contains))
        throw new java.util.ConcurrentModificationException(
          s"positional delete over v$from conflicts: a commit rewrote " +
          "its referenced files — re-read and re-delete")
      Some((Nil, Nil)) // zero-op body; only the dvr= meta changes
    }.get
  }

  /** Predicate-driven positional delete: resolve `cond` to (src, pos)
    * pairs by a stats-pruned provenance scan (only the band-admitted
    * files are read; `_metadata.row_index` supplies the position),
    * then commit them via [[deleteMORPositional]].
    */
  def deleteWhereMORPositional(spark: SparkSession, root: Path,
      schema: StructType, cond: Column,
      longBands: Seq[(String, Long, Long)] = Nil,
      strBands: Seq[(String, Option[String], Option[String])] = Nil,
      dblBands: Seq[(String, Double, Double)] = Nil)
      : Int = {
    val from = latestVersion(root)
    require(from > 0, "positional delete on an empty table")
    // hidden partitioning composes: derive virtual transform bands
    // from the caller's plain bands (superset admit either way)
    val (hit, _, _) = prunedEntries(root, from,
      longBands ++ hiddenBands(root, from, longBands), strBands, dblBands)
    if (hit.isEmpty) return from
    val data = root.resolve("data")
    val positions = spark.read.schema(schema)
      .parquet(hit.map(e => data.resolve(e.path).toString): _*)
      .withColumn("__src", substring_index(input_file_name(), "/", -1))
      .withColumn("__pos", col("_metadata.row_index"))
      .filter(coalesce(cond, lit(false)))
      .select(col("__src").as("src"), col("__pos").as("pos"))
    deleteMORPositional(spark, root, positions)
  }

  /** Read a snapshot MINUS its row-position vectors: one broadcast
    * anti-join on (source file, row index) — provenance from
    * `input_file_name()`, position from parquet's `_metadata.row_index`
    * (stable per file by the metadata-column contract, independent of
    * split planning).
    */
  def readMORPositional(spark: SparkSession, root: Path, version: Int,
      schema: StructType): DataFrame = {
    val base = read(spark, root, version, schema)
    val dvrs = rowDvsFor(root, version)
    if (dvrs.isEmpty) base
    else {
      val sc = spark.read.parquet(dvrs.map(f =>
          root.resolve("data").resolve(f).toString): _*)
        .select(col("src").as("__s"), col("pos").as("__p")).distinct()
      base.withColumn("__src",
          substring_index(input_file_name(), "/", -1))
        .withColumn("__pos", col("_metadata.row_index"))
        .join(broadcast(sc),
          col("__src") === col("__s") && col("__pos") === col("__p"),
          "left_anti")
        .drop("__src", "__pos")
    }
  }

  /** Materialize the positional-MOR view into plain stats-carrying
    * files and CLEAR the vectors — the mandatory pre-rewrite step,
    * mirroring [[compactMORScoped]].
    */
  def compactMORPositional(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, targetFiles: Int): Int = {
    require(dvsFor(root, from).isEmpty && scopedDvsFor(root, from).isEmpty,
      "mixed vector kinds on one snapshot — compact the others first")
    val live = entriesFor(root, from)
    commit(root, stageWithTypedStats(
      restoreTransformCols(root, from,
          readMORPositional(spark, root, from, schema))
        .repartitionByRange(math.max(1, targetFiles), col(keyCol)),
      root, s"cmorp$from${nonce()}",
      (keyCol +: live.flatMap(_.stats.map(_._1))).distinct,
      live.flatMap(_.strStats.map(_._1)).distinct,
      live.flatMap(_.dblStats.map(_._1)).distinct,
      live.flatMap(_.decStats.map(_._1)).distinct,
      live.flatMap(_.binStats.map(_._1)).distinct), meta = "dvr=")
  }

  /** Materialize the scoped-MOR view into plain stats-carrying files
    * and CLEAR the vectors — the mandatory step before any rewrite of
    * a scoped-DV table (see [[deleteMORScoped]]).
    */
  def compactMORScoped(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, targetFiles: Int): Int = {
    require(dvsFor(root, from).isEmpty && rowDvsFor(root, from).isEmpty,
      "mixed vector kinds on one snapshot — compact the others first")
    // preserve recorded stat coverage of BOTH kinds (non-narrowing)
    val live = entriesFor(root, from)
    commit(root, stageWithTypedStats(
      restoreTransformCols(root, from,
          readMORScoped(spark, root, from, schema, keyCol))
        .repartitionByRange(math.max(1, targetFiles), col(keyCol)),
      root, s"cmors$from${nonce()}",
      (keyCol +: live.flatMap(_.stats.map(_._1))).distinct,
      live.flatMap(_.strStats.map(_._1)).distinct,
      live.flatMap(_.dblStats.map(_._1)).distinct,
      live.flatMap(_.decStats.map(_._1)).distinct,
      live.flatMap(_.binStats.map(_._1)).distinct), meta = "dvp=")
  }

  /** Fail-loud guard for the rewrite paths: positional vectors do not
    * survive file rewrites (their (key, src) pairs would dangle and
    * the deleted rows resurrect under new names).
    */
  private[operators] def requireNoScopedDvs(root: Path, version: Int, op: String): Unit = {
    require(scopedDvsFor(root, version).isEmpty,
      s"$op on v$version: scoped (positional) deletion vectors are " +
      "outstanding — compactMORScoped first; a rewrite would orphan " +
      "their file scopes and resurrect deleted rows")
    require(rowDvsFor(root, version).isEmpty,
      s"$op on v$version: row-position deletion vectors are " +
      "outstanding — compactMORPositional first; a rewrite would " +
      "orphan their (file, pos) scopes and resurrect deleted rows")
  }

  /** Read a snapshot MINUS its deletion vectors: the base scan plus
    * one broadcast anti-join on `keyCol` — the merge-on-read price.
    */
  def readMOR(spark: SparkSession, root: Path, version: Int,
      schema: StructType, keyCol: String): DataFrame = {
    val base = read(spark, root, version, schema)
    val dvs = dvsFor(root, version)
    if (dvs.isEmpty) base
    else base.join(
      broadcast(spark.read.parquet(dvs.map(f =>
          root.resolve("data").resolve(f).toString): _*)
        .select(keyCol).distinct()),
      Seq(keyCol), "left_anti")
  }

  /** Materialize the MOR view into plain stats-carrying files: the
    * next snapshot has no `dv=` meta, and plain [[read]] equals the
    * pre-compaction [[readMOR]] — when the read tax exceeds the
    * rewrite cost, this is the switch back.
    */
  def compactMOR(spark: SparkSession, root: Path, from: Int,
      schema: StructType, keyCol: String, targetFiles: Int): Int = {
    requireNoScopedDvs(root, from, "compactMOR")
    // explicit empty dv= token: the vectors were just materialized, so
    // this is the ONE commit that must NOT inherit the parent's list.
    // Stat coverage of BOTH kinds is preserved (non-narrowing).
    val live = entriesFor(root, from)
    commit(root, stageWithTypedStats(
      restoreTransformCols(root, from,
          readMOR(spark, root, from, schema, keyCol))
        .repartitionByRange(math.max(1, targetFiles), col(keyCol)),
      root, s"cmor$from${nonce()}",
      (keyCol +: live.flatMap(_.stats.map(_._1))).distinct,
      live.flatMap(_.strStats.map(_._1)).distinct,
      live.flatMap(_.dblStats.map(_._1)).distinct,
      live.flatMap(_.decStats.map(_._1)).distinct,
      live.flatMap(_.binStats.map(_._1)).distinct), meta = "dv=")
  }

  /** Retention: delete data files referenced by NO version ≥
    * `keepFrom` (time travel older than the horizon dies; every kept
    * snapshot still reads). The one op that may remove bytes — kept
    * strictly separate from commits, exactly like VACUUM.
    *
    * `retainMillis` is the concurrent-writer guard (r8 ADVICE): a
    * writer between stage() and commit has files referenced by NO
    * manifest yet, so an unguarded vacuum would delete them and the
    * writer would then publish a snapshot pointing at missing files.
    * Files whose mtime is inside the retention horizon are therefore
    * kept even when unreferenced — Delta VACUUM's retention-period
    * rule. Pass 0 ONLY when no writer can be in flight (tests,
    * single-process maintenance windows).
    */
  def vacuum(root: Path, keepFrom: Int,
      retainMillis: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    // a kept snapshot needs its data files AND its deletion vectors
    // (both kinds) — dropping a referenced vector would silently
    // resurrect deleted rows
    val keep = (math.max(keepFrom, math.max(1, firstVersion(root)))
        to latestVersion(root))
      .flatMap(v => filesFor(root, v) ++ dvsFor(root, v) ++
        scopedDvsFor(root, v) ++ rowDvsFor(root, v)).toSet
    val horizon = System.currentTimeMillis() - retainMillis
    val data = root.resolve("data")
    val s = Files.list(data)
    val all =
      try s.map[String](_.getFileName.toString).toArray.toSeq
        .collect { case n: String => n }
      finally s.close()
    val dead = all.filterNot(keep).filter(n =>
      Files.getLastModifiedTime(data.resolve(n)).toMillis < horizon)
    dead.foreach(n => Files.delete(data.resolve(n)))
    dead
  }

  /** Remove ORPHAN checkpoint segments: `cp*.parquet` files under
    * `_manifests/` referenced by NO committed version — the residue of
    * lost publish races and crashes between segment write and commit
    * link (wave 133's parquet checkpoints write segments first, so the
    * loser's are invisible but occupy bytes). Kept separate from
    * [[vacuum]] exactly like Iceberg splits remove-orphan-files from
    * expire-snapshots: data-file retention and metadata hygiene have
    * different blast radii. The same retention horizon guards an
    * in-flight committer whose segments exist but whose link hasn't
    * landed yet.
    */
  def vacuumOrphanSegments(root: Path,
      retainMillis: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) return Nil
    // referenced = segments of EVERY manifest still on disk (listed,
    // not firstVersion..latest): a crashed expiry leaves straggler
    // manifests below _first whose segments must survive until the
    // stragglers themselves are swept (wave-139 review fix)
    val referenced = manifestVersionsListed(manifestDir(root))
      .flatMap { v =>
        // checkpoint bodies are ALL descriptors; columnar deltas mix
        // @descriptors with -/+ lines — one filter covers both
        manifestOf(root, v)._3.filter(_.startsWith("@")).map(parseDesc(_)._1)
      }.toSet
    val horizon = System.currentTimeMillis() - retainMillis
    val s = Files.list(d)
    val all =
      try s.map[String](_.getFileName.toString).toArray.toSeq
        .collect { case n: String
          if n.startsWith("cp") && n.endsWith(".parquet") => n }
      finally s.close()
    val dead = all.filterNot(referenced).filter(n =>
      Files.getLastModifiedTime(d.resolve(n)).toMillis < horizon)
    dead.foreach { n =>
      Files.delete(d.resolve(n))
      // checksum sidecar from a pre-round-10 writer (SegIO now strips
      // them at write time, but existing tables may still carry them)
      Files.deleteIfExists(d.resolve("." + n + ".crc")): Unit
    }
    dead
  }

  /** LOG retention (wave 138): delete the manifest files no kept
    * version's resolution can reach — without it `_manifests/` grows
    * one file per commit FOREVER (a million-commit table carries a
    * million log files), the unbounded-metadata twin of the data-file
    * problem [[vacuum]] solves; Delta's logRetentionDuration and
    * Iceberg's expire-snapshots exist for exactly this.
    *
    * Resolving any v ≥ `keepFrom` needs v's delta chain back to its
    * checkpoint, and chains only ever point BACKWARD — so everything
    * below `chainBase(keepFrom)` (the checkpoint at or below it) is
    * unreachable from every kept version and can go. Time travel below
    * `keepFrom` dies — that is the point, the same contract as
    * [[vacuum]]; batch-ledger entries recorded only in expired
    * manifests are forgotten (don't expire below a live sink's replay
    * horizon), and `history`/`versionAt` truncate to the kept range.
    * The `_first` hint is written BEFORE the deletes so a crash
    * mid-expiry leaves a valid (already-truncated) view plus some
    * undeleted stragglers the next expiry sweeps; the expired
    * checkpoints' parquet segments become unreferenced and fall to
    * [[vacuumOrphanSegments]]. Returns the deleted manifest names.
    */
  /** RESTORE the table to snapshot `to` (round 12 — Delta's `RESTORE
    * TABLE … VERSION AS OF`, Iceberg's rollback_to_snapshot): ONE new
    * checkpoint commit whose live set, deletion-vector lists, and
    * evolution state (schema= / colmap= / ptrans=) are exactly
    * version `to`'s. History is preserved — a rollback is a new
    * commit, never a log rewrite, so time travel still reaches the
    * undone versions and concurrent writers order serializably
    * through the normal OCC publish. Fails loudly when any of `to`'s
    * referenced files (data OR vector sidecars) were vacuumed — a
    * snapshot below the retention horizon cannot be restored. The
    * bloom index list inherits ACCUMULATED from the current head
    * (bitsets key on immutable file names: re-lived files keep valid
    * bitsets, dead entries stay inert). The one caveat: a `to` that
    * predates the table's first schema= meta keeps inheriting the
    * current head's (an empty schema token is unrepresentable;
    * modern lifecycles carry schema= from v1, so this arises only on
    * legacy roots).
    */
  def restore(root: Path, to: Int): Int = {
    val latest = latestVersion(root)
    val first = math.max(1, firstVersion(root))
    require(to >= first && to <= latest,
      s"restore target v$to outside committed $first..$latest")
    if (to == latest) return latest
    val entries = entriesFor(root, to)
    val data = root.resolve("data")
    val dvs = dvsFor(root, to)
    val dvps = scopedDvsFor(root, to)
    val dvrs = rowDvsFor(root, to)
    val missing = (entries.map(_.path) ++ dvs ++ dvps ++ dvrs)
      .filterNot(p => Files.exists(data.resolve(p)))
    require(missing.isEmpty,
      s"cannot restore to v$to: ${missing.size} referenced file(s) " +
      s"were vacuumed (${missing.take(3).mkString(",")}) — the " +
      "snapshot is below the retention horizon")
    val m = headerMeta(root, to)
    val meta = (Seq(s"restore=v$to") ++
      m.get("schema").map(s => s"schema=$s") ++
      Seq(s"colmap=${m.getOrElse("colmap", "")}",
        s"ptrans=${m.getOrElse("ptrans", "")}",
        s"dv=${dvs.mkString(",")}",
        s"dvp=${dvps.mkString(",")}",
        s"dvr=${dvrs.mkString(",")}")).mkString(" ")
    commit(root, entries.map(_.line), meta)
  }

  // ---- TAGS (round 13, wave 192 — Iceberg's named refs) ----

  private def refsDir(root: Path): Path = root.resolve("_refs")

  private val TagNameRe = "[A-Za-z0-9_.-]{1,128}".r

  /** Create an immutable named ref to a committed version. Refuses an
    * existing name (Iceberg's create-vs-replace split — replace is
    * drop+create, never silent); the atomic CREATE_NEW makes two
    * racing creates resolve to exactly one winner.
    */
  def createTag(root: Path, tag: String, version: Int): Unit = {
    require(TagNameRe.pattern.matcher(tag).matches(),
      s"invalid tag name '$tag' (allowed: [A-Za-z0-9_.-], ≤128)")
    val latest = latestVersion(root)
    require(version >= math.max(1, firstVersion(root)) &&
      version <= latest,
      s"cannot tag v$version: committed range is " +
      s"${math.max(1, firstVersion(root))}..$latest")
    Files.createDirectories(refsDir(root))
    try Files.write(refsDir(root).resolve(s"$tag.txt"),
      version.toString.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW): Unit
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"tag '$tag' already exists (→ v${resolveTag(root, tag).get})" +
          " — tags are immutable; drop_tag first to re-point")
    }
  }

  def dropTag(root: Path, tag: String): Unit = {
    require(Files.deleteIfExists(refsDir(root).resolve(s"$tag.txt")),
      s"no tag '$tag' on $root")
  }

  /** All named refs, name → version. */
  def tags(root: Path): Map[String, Int] = {
    val d = refsDir(root)
    if (!Files.isDirectory(d)) return Map.empty
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".txt"))
        .map { p =>
          p.getFileName.toString.stripSuffix(".txt") ->
            new String(Files.readAllBytes(p), "UTF-8").trim.toInt
        }.toMap
    } finally s.close()
  }

  def resolveTag(root: Path, tag: String): Option[Int] = {
    val p = refsDir(root).resolve(s"$tag.txt")
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), "UTF-8").trim.toInt)
    else None
  }

  def expireManifests(root: Path, keepFrom: Int): Seq[String] = {
    val latest = latestVersion(root)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"expireManifests keepFrom=$keepFrom outside committed 1..$latest")
    // TAGS RETAIN (wave 192 — Iceberg's rule): a tagged snapshot
    // never falls below the log-retention horizon; the effective
    // horizon clamps to the oldest tag
    val tagged = tags(root).values
    val keepFromEff =
      if (tagged.isEmpty) keepFrom else math.min(keepFrom, tagged.min)
    expireManifestsRaw(root, keepFromEff)
  }

  private def expireManifestsRaw(root: Path, keepFrom: Int)
      : Seq[String] = {
    val latest = latestVersion(root)
    // the checkpoint keepFrom's chain resolves from (chains are
    // parent-linked, so walk until a non-delta manifest; one read per
    // hop)
    var base = keepFrom
    var m = manifestOf(root, base)
    while (m._2.contains("kind")) {
      base = m._1
      m = manifestOf(root, base)
    }
    val d = manifestDir(root)
    // listing, not the firstVersion..base range: a crashed previous
    // expiry can leave stragglers BELOW the _first hint, which a
    // range walk would never sweep
    val expendable = manifestVersionsListed(d).filter(_ < base).sorted
    if (expendable.isEmpty) return Nil
    // hint first: a crash after this point leaves a consistent
    // truncated table with vacuumable stragglers, never a live table
    // whose firstVersion points at a deleted manifest
    try {
      val tmp = d.resolve(s"._first_${nonce()}")
      Files.write(tmp, base.toString.getBytes("UTF-8"))
      Files.move(tmp, d.resolve("_first"),
        StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Exception => () }
    val dead = expendable.map(name)
    // deleteIfExists: two concurrent expiries may race on one file
    dead.foreach(n => Files.deleteIfExists(d.resolve(n)): Unit)
    dead
  }


  /** Compaction as a normal snapshot: rewrite version `from`'s live
    * set into `targetFiles` files and commit the REPLACEMENT list.
    * Old files stay on disk — every pinned reader of `from` is
    * untouched (snapshot isolation by immutability).
    */
  def compact(spark: SparkSession, root: Path, from: Int,
      schema: StructType, targetFiles: Int): Int = {
    requireNoScopedDvs(root, from, "compact")
    // batch prefix carries the writer nonce like every other rewrite
    // path (r8 ADVICE): a repeated or concurrent compaction of the
    // same `from` must stage under private names, not REPLACE_EXISTING
    // the earlier run's already-committed data files.
    val rewritten = stage(
      read(spark, root, from, schema).repartition(targetFiles),
      root, s"compact$from${nonce()}")
    commit(root, rewritten)
  }
}
