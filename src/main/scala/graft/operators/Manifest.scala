package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import graft.{QueryGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Minimal MANIFEST-FILE table format over parquet — the lakehouse
  * architecture proof the r7 verdict listed as the one remaining
  * table-format gap (item 2 / stretch 9): snapshot isolation, time
  * travel, optimistic concurrency and compaction from nothing but
  * immutable data files plus an append-only manifest log, the core
  * idea shared by Delta/Iceberg/Hudi (re-derived here from their
  * public papers/specs; no table-format dependency is obtainable in
  * this environment, and none is needed for the mechanism).
  *
  * Layout under a table root:
  *
  *   data/<batch>-<n>.parquet     immutable, never rewritten in place
  *   _manifests/v00001.txt        one file per committed snapshot
  *
  * A manifest is EITHER a full checkpoint (header then the snapshot's
  * complete live-file list, one `path[\tstats]` line each) OR — the
  * round-9 upgrade that removed the r8 format's O(files) commit /
  * O(files²) cumulative-log cost — a DELTA (`kind=delta` header,
  * `+line` / `-path` body) against its parent, with a full checkpoint
  * forced every [[ManifestTable.CheckpointEvery]] commits so readers
  * resolve any version in O(CheckpointEvery) manifest reads (the
  * Delta-log JSON-deltas-plus-checkpoint shape). The manifest file
  * itself is the commit:
  *
  *  - WRITERS stage data files under data/ (invisible until
  *    referenced), then publish `v<K+1>.txt` via hard-link creation —
  *    atomic and CREATE-EXCLUSIVE on POSIX, so two racing committers
  *    cannot both win a version: the loser sees EEXIST, re-reads the
  *    new latest, and retries on top of it (optimistic concurrency,
  *    the Delta protocol's mutual-exclusion primitive). A plain
  *    rename() would silently REPLACE an existing manifest and lose
  *    the race's loser — that near-miss is exactly why the link trick
  *    exists.
  *  - READERS resolve a version (latest or pinned) to its file list
  *    and scan EXACTLY those files with an explicit schema. A reader
  *    holding version K is isolated from every later commit by
  *    immutability: compaction ADDS a rewritten file and publishes a
  *    new manifest; it never deletes what K references (vacuuming old
  *    files is a separate retention op, out of scope here).
  *
  * At 100 TB the protocol's three formerly-documented-only
  * refinements are now implemented: per-file PER-COLUMN stats
  * ([[ManifestTable.FileEntry]], so planning prunes files on any
  * recorded predicate before the scan), delta commits + periodic
  * checkpoints (commit bytes O(delta), reader resolution
  * O(CheckpointEvery)), and the `_latest` pointer replacing directory
  * listings. The remaining representational gap vs the real formats
  * is encoding only (text lines vs avro/parquet manifests). The scan
  * side is already the scale path: an explicit-schema multi-file
  * parquet read is splittable and fully parallel, identical to
  * Spark's own file-index scan on the listed subset.
  */
object ManifestTable {

  /** One live data file plus its per-column stats (min/max of any
    * number of long-typed columns), the planning metadata real formats
    * carry per file: a reader or merge writer intersects a predicate
    * with these bounds and PRUNES files before any scan — the
    * mechanism behind "a MERGE into 100 TB rewrites 3 files, not the
    * table". Round 9 generalized the single hard-wired key of the r8
    * format (r8 VERDICT item 2) to a small ordered column→bounds list,
    * so pruning composes across predicates on different columns.
    */
  case class FileEntry(path: String, stats: Seq[(String, (Long, Long))],
      strStats: Seq[(String, (String, String))] = Nil) {
    /** Recorded bounds of `c`, None when this file carries none. */
    def band(c: String): Option[(Long, Long)] =
      stats.collectFirst { case (`c`, b) => b }
    /** Recorded STRING bounds of `c` (round-9 wave 132: the r8/r9
      * format carried long bounds only — "no string/binary bounds"
      * was a named representational gap). Admission compares in
      * UTF-8 BYTE order ([[ManifestTable.u8cmp]]) because that is the
      * order Spark's min/max on StringType recorded the bounds in —
      * Java's UTF-16 code-unit compare disagrees for
      * supplementary-plane text vs U+E000..U+FFFF, and a wrong-order
      * compare there would SKIP a non-empty file (wave-139 review
      * fix), breaking the only-skip-provably-empty rule.
      */
    def bandStr(c: String): Option[(String, String)] =
      strStats.collectFirst { case (`c`, b) => b }
    /** Can this file contain a row with `c` in [lo, hi]? A file with
      * no stats for `c` CANNOT be proven disjoint, so it is admitted —
      * pruning must only ever skip provably-empty files.
      */
    def mayContain(c: String, lo: Long, hi: Long): Boolean =
      band(c).forall { case (mn, mx) => mn <= hi && mx >= lo }
    /** String-band admission, same only-skip-provably-empty rule. */
    def mayContainStr(c: String, lo: String, hi: String): Boolean =
      bandStr(c).forall { case (mn, mx) =>
        u8cmp(mn, hi) <= 0 && u8cmp(mx, lo) >= 0 }
    /** Open-interval form (None = unbounded side) — strings have no
      * finite top element, so an unbounded `col > v` predicate cannot
      * be expressed with closed bounds without a fabricated sentinel
      * a pathological string could legitimately exceed.
      */
    def mayContainStrOpt(c: String, lo: Option[String],
        hi: Option[String]): Boolean =
      bandStr(c).forall { case (mn, mx) =>
        lo.forall(u8cmp(mx, _) >= 0) && hi.forall(u8cmp(mn, _) <= 0) }
    /** The manifest line: `path` or `path\tc:min:max[,c2:min:max…]`.
      * String bounds ride the same comma list as `c:~b64:~b64` tokens
      * — base64 because a string bound may contain the line format's
      * own separators (colon, comma, tab, newline); the `~` marker
      * disambiguates from long bounds (a long never starts with `~`),
      * so pre-wave-132 lines parse unchanged.
      */
    def line: String = {
      val toks = stats.map { case (c, (mn, mx)) => s"$c:$mn:$mx" } ++
        strStats.map { case (c, (mn, mx)) => s"$c:~${b64(mn)}:~${b64(mx)}" }
      if (toks.isEmpty) path else path + "\t" + toks.mkString(",")
    }
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** Unsigned UTF-8 byte comparison — the collation Spark's UTF8String
    * min/max recorded the string bounds in. Java String.compareTo
    * (UTF-16 code units) agrees on the BMP below the surrogate block
    * but INVERTS supplementary-plane text vs U+E000..U+FFFF; pruning
    * with the wrong order would skip non-empty files.
    */
  private[graft] def u8cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private[graft] def u8min(a: String, b: String): String =
    if (u8cmp(a, b) <= 0) a else b
  private[graft] def u8max(a: String, b: String): String =
    if (u8cmp(a, b) >= 0) a else b

  private[graft] def parseEntry(l: String): FileEntry = l.split('\t') match {
    case Array(p) => FileEntry(p, Nil)
    case Array(p, s) =>
      val toks = s.split(',').toSeq.map { t =>
        val Array(c, mn, mx) = t.split(':')
        (c, mn, mx)
      }
      FileEntry(p,
        toks.collect { case (c, mn, mx) if !mn.startsWith("~") =>
          c -> (mn.toLong, mx.toLong) },
        toks.collect { case (c, mn, mx) if mn.startsWith("~") =>
          require(mx.startsWith("~"), s"corrupt string-stat token in: $l")
          c -> (unb64(mn.drop(1)), unb64(mx.drop(1))) })
    case _ => throw new IllegalArgumentException(s"corrupt manifest line: $l")
  }

  private def manifestDir(root: Path) = root.resolve("_manifests")
  private def name(v: Int) = f"v$v%05d.txt"

  /** Writer nonce for staged-file batch prefixes: pid + thread alone
    * is NOT unique across two writes from one thread — the second
    * write's stage() would silently REPLACE the first's committed
    * data files (same target names) before its own commit even runs.
    * The counter makes every stage batch name JVM-unique.
    */
  private val writeNonce = new java.util.concurrent.atomic.AtomicLong(0)
  private def nonce(): String =
    s"x${ProcessHandle.current().pid()}t${Thread.currentThread().getId}" +
      s"n${writeNonce.incrementAndGet()}"

  /** Latest committed version, 0 if none — the `_latest` HINT file
    * (the _last_checkpoint refinement the object doc previously only
    * documented) plus forward existence probes from it. The hint is
    * advisory, never authoritative: it is written AFTER the commit
    * wins (losers and crashes leave it stale-low, never high — a
    * higher-than-real hint would fabricate a version, so writes take
    * max(current, v) under REPLACE-atomic move), and the probe loop
    * walks forward until the next manifest is absent. Cost: O(1 +
    * staleness) stat calls instead of a directory listing — the
    * object-store-scale lookup (LIST is the expensive op there).
    */
  def latestVersion(root: Path): Int = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) return 0
    val hintFile = d.resolve("_latest")
    val hint =
      try new String(Files.readAllBytes(hintFile), "UTF-8").trim.toInt
      catch { case _: Exception => 0 }
    // never trust the hint's existence claim — verify, fall back to 0
    var v = if (hint > 0 && Files.exists(d.resolve(name(hint)))) hint else 0
    while (Files.exists(d.resolve(name(v + 1)))) v += 1
    // wave 138: with the hint lost AND v00001 expired by log retention,
    // the forward probe from 0 finds nothing — fall back to ONE
    // directory listing (the cold path real formats also pay when
    // their _last_checkpoint is gone), then probe forward from it
    if (v == 0) {
      manifestVersionsListed(d).maxOption.foreach { m =>
        v = m
        while (Files.exists(d.resolve(name(v + 1)))) v += 1
      }
    }
    v
  }

  /** Every live manifest version by directory listing — the cold-path
    * fallback only; steady-state lookups ride the hints.
    */
  private val ManifestName = """v(\d{5,})\.txt""".r

  private def manifestVersionsListed(d: Path): Seq[Int] = {
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    // exact-shape match: a stray "v2-backup.txt" or "versions.txt"
    // dropped into _manifests/ must be inert, not a NumberFormat crash
    try s.map[String](_.getFileName.toString).toArray.toSeq.collect {
      case n: String => n
    }.collect { case ManifestName(v) => v.toInt }
    finally s.close()
  }

  /** Smallest LIVE manifest version, 0 for an empty table — 1 until
    * [[expireManifests]] first truncates the log. The `_first` hint is
    * advisory like `_latest`: written after an expiry completes,
    * validated by existence, listing fallback when wrong.
    */
  def firstVersion(root: Path): Int = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) return 0
    val hint =
      try new String(Files.readAllBytes(d.resolve("_first")), "UTF-8")
        .trim.toInt
      catch { case _: Exception => 1 }
    if (hint >= 1 && Files.exists(d.resolve(name(hint)))) hint
    else if (Files.exists(d.resolve(name(1)))) 1
    else manifestVersionsListed(d).minOption.getOrElse(0)
  }

  /** Advance the `_latest` hint to at least `v` (best-effort; losers
    * of the REPLACE race leave a lower value, which is safe).
    */
  private def writeHint(root: Path, v: Int): Unit =
    try {
      val d = manifestDir(root)
      val cur =
        try new String(Files.readAllBytes(d.resolve("_latest")), "UTF-8")
          .trim.toInt
        catch { case _: Exception => 0 }
      if (v > cur) {
        val tmp = d.resolve(s"._latest_${nonce()}")
        Files.write(tmp, v.toString.getBytes("UTF-8"))
        Files.move(tmp, d.resolve("_latest"),
          StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
      }
    } catch { case _: Exception => () } // advisory only

  /** Relative live-file list of a committed version (delta chains
    * resolved).
    */
  def filesFor(root: Path, version: Int): Seq[String] =
    rawLines(root, version).map(_.split('\t').head)

  /** Live files WITH their per-column stats (delta chains resolved).
    * Files committed without stats parse as stats-free entries — the
    * pruning consumers admit those unconditionally ([[FileEntry
    * .mayContain]]), so mixed-coverage logs stay correct, just less
    * prunable.
    */
  def entriesFor(root: Path, version: Int): Seq[FileEntry] =
    rawLines(root, version).map(parseEntry)

  /** Header fields + body lines of ONE manifest file, unresolved. */
  private def manifestOf(root: Path, version: Int)
      : (Int, Map[String, String], Seq[String]) = {
    val f = manifestDir(root).resolve(name(version))
    if (!Files.exists(f))
      throw new IllegalStateException(s"manifest v$version is absent — " +
        "expired by log retention (expireManifests) or never committed")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      Files.readAllLines(f)).asScala
    require(lines.nonEmpty && lines.head.startsWith(
      s"# graft-manifest version=$version "),
      s"corrupt manifest for v$version")
    val toks = lines.head.split(' ').drop(2)
    val kv = toks.flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> v)
      case _ => None
    }).toMap
    (kv.getOrElse("parent", "0").toInt, kv,
      lines.drop(1).filter(_.nonEmpty).toSeq)
  }

  /** The RESOLVED full entry-line list of a version: a checkpoint
    * manifest's body verbatim, or — for a `kind=delta` manifest — the
    * parent's resolution with this commit's `-path` removals and
    * `+line` additions applied. The recursion is bounded by
    * [[CheckpointEvery]]: every chain reaches a full checkpoint within
    * that many hops, so a reader stats O(CheckpointEvery) manifest
    * files regardless of table age — the property that makes commit
    * cost O(delta) sustainable ([[commitOpsF]]).
    */
  private def rawLines(root: Path, version: Int): Seq[String] = {
    val (parent, kv, body) = manifestOf(root, version)
    if (kv.get("body").contains("seg"))
      // parquet checkpoint: the body is a manifest LIST — resolve each
      // segment file to its entries, in list order
      body.flatMap { l =>
        val (seg, n, _) = parseDesc(l)
        val es = SegIO.read(manifestDir(root).resolve(seg))
        require(es.size == n,
          s"segment $seg holds ${es.size} entries, list says $n")
        es.map(_.line)
      }
    else if (!kv.contains("kind")) body
    else {
      require(kv("kind") == "delta", s"unknown manifest kind ${kv("kind")}")
      val base = rawLines(root, parent)
      val removes = body.filter(_.startsWith("-")).map(_.drop(1)).toSet
      // a LARGE delta's adds live in parquet segments listed as
      // @descriptors (round 10 — the same columnar encoding wave 133
      // gave checkpoints); small deltas inline them as +lines
      val segAdds = body.filter(_.startsWith("@")).flatMap { l =>
        val (seg, n, _) = parseDesc(l)
        val es = SegIO.read(manifestDir(root).resolve(seg))
        require(es.size == n,
          s"delta segment $seg holds ${es.size} entries, list says $n")
        es.map(_.line)
      }
      val adds = body.filter(_.startsWith("+")).map(_.drop(1)) ++ segAdds
      require(body.forall(l => l.startsWith("-") || l.startsWith("+") ||
          l.startsWith("@")),
        s"corrupt delta manifest v$version: unprefixed line")
      val basePaths = base.map(_.split('\t').head).toSet
      require(removes.subsetOf(basePaths),
        s"delta v$version removes files absent from v$parent")
      require(adds.forall(a => !basePaths(a.split('\t').head)),
        s"delta v$version re-adds files already live in v$parent")
      base.filterNot(l => removes(l.split('\t').head)) ++ adds
    }
  }

  /** Commit `files` as the next snapshot's COMPLETE live set — always
    * a FULL (checkpoint) manifest, the caller's intent being "this
    * exact file list is the new snapshot" regardless of what the
    * parent held. Returns the version won. Retries on a lost publish
    * race (create-exclusive hard link); append callers use
    * [[appendCommit]] instead, which folds the parent in inside the
    * retry loop.
    */
  def commit(root: Path, files: Seq[String], meta: String = ""): Int =
    commitOpsF(root, _ => meta, checkpoint = true)(parent =>
      Some((files, if (parent == 0) Nil else filesFor(root, parent)))).get

  /** Append-style commit: the new snapshot = (winner parent's live
    * set) ++ `added`, recomputed inside the retry loop so a lost race
    * never drops the racer's files. Writes an O(|added|) DELTA
    * manifest (`+` lines only) — the parent's live set rides the log
    * chain verbatim, stats included, never re-serialized.
    */
  def appendCommit(root: Path, added: Seq[String], meta: String = ""): Int =
    commitOpsF(root, _ => meta)(_ => Some((added, Nil))).get

  /** Compact `name:type,...` encoding of a snapshot's logical schema
    * for the manifest header (`schema=` meta) — the minimal schema
    * log behind ADD COLUMN evolution. Any type whose simpleString is
    * space-free (all the scalar/array/map/struct forms; the interval
    * family is the exception) — header tokens are space-split.
    */
  def schemaMeta(schema: StructType): String = {
    val s = schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    require(!s.contains(' '), s"schema meta must be space-free: $s")
    s
  }

  def parseSchemaMeta(s: String): StructType = {
    // split fields on top-level commas only: decimal(12,2) and
    // map<string,bigint> carry commas inside their own brackets
    val fields = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var start = 0
    s.zipWithIndex.foreach {
      case (c, _) if c == '<' || c == '(' => depth += 1
      case (c, _) if c == '>' || c == ')' => depth -= 1
      case (',', i) if depth == 0 =>
        fields += s.substring(start, i); start = i + 1
      case _ => ()
    }
    fields += s.substring(start)
    StructType(fields.toSeq.map { fld =>
      val Array(n, t) = fld.split(":", 2)
      org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.DataType.fromDDL(t))
    })
  }

  /** Read a snapshot under ITS OWN recorded schema (the `schema=`
    * header meta): files committed before an ADD COLUMN null-fill the
    * added columns — parquet's missing-column semantics under an
    * explicit read schema, which is exactly how the real formats
    * implement metadata-only column addition (zero data rewritten).
    *
    * COLUMN MAPPING (wave 136): when the header carries `colmap=`
    * (written by [[renameColumn]]), each logical column reads from its
    * recorded PHYSICAL name — so a rename is one zero-body commit and
    * zero rewritten bytes, Delta's column-mapping idea stated
    * minimally. A column dropped by [[dropColumn]] simply leaves the
    * logical schema; its bytes stay in the files, projected away.
    * Note: per-file stats keys are PHYSICAL names (they were the
    * logical names at stage time) — pruned reads on a renamed column
    * must pass the physical name ([[physicalName]]).
    */
  def readEvolved(spark: SparkSession, root: Path, version: Int): DataFrame = {
    val m = headerMeta(root, version)
    require(m.contains("schema"),
      s"v$version carries no schema meta — use read() with an explicit schema")
    val logical = parseSchemaMeta(m("schema"))
    val cmap = colMap(m)
    val physical = StructType(logical.fields.map(f =>
      f.copy(name = cmap.getOrElse(f.name, f.name))))
    read(spark, root, version, physical)
      .select(logical.fields.toSeq.map(f =>
        col(cmap.getOrElse(f.name, f.name)).as(f.name)): _*)
  }

  /** logical→physical map of a version's header (`colmap=` meta). */
  private def colMap(m: Map[String, String]): Map[String, String] =
    m.get("colmap").map(_.split(',').toSeq.filter(_.nonEmpty).map { t =>
      val Array(l, p) = t.split(':')
      l -> p
    }.toMap).getOrElse(Map.empty)

  /** Physical (in-file) name of a logical column at `version` — what
    * stats-pruned reads and new writers must address.
    */
  def physicalName(root: Path, version: Int, logical: String): String =
    colMap(headerMeta(root, version)).getOrElse(logical, logical)

  /** The whole logical→physical map of a version (empty when the
    * table has never been renamed) — one header read.
    */
  def columnMap(root: Path, version: Int): Map[String, String] =
    colMap(headerMeta(root, version))

  private def tokenSafe(n: String): Unit =
    require(!n.exists(c => c == ':' || c == ',' || c == ' ' || c == '\t'),
      s"column name not header-token-safe: '$n'")

  /** Metadata-only RENAME COLUMN: one ZERO-body commit whose header
    * carries the renamed logical schema plus the logical→physical
    * mapping; no data file is touched — files keep the physical name,
    * [[readEvolved]] aliases it back. The schema state is recomputed
    * against the WINNING parent inside the OCC retry, so a racing
    * append simply composes. Returns the new version.
    */
  def renameColumn(root: Path, oldName: String, newName: String): Int = {
    tokenSafe(newName)
    commitOpsF(root, { parent =>
      require(parent > 0, "renameColumn on an empty table")
      val m = headerMeta(root, parent)
      require(m.contains("schema"),
        s"v$parent carries no schema meta — the table is not evolvable")
      val logical = parseSchemaMeta(m("schema"))
      require(logical.fieldNames.contains(oldName),
        s"renameColumn: no column '$oldName' in ${logical.fieldNames.toSeq}")
      require(!logical.fieldNames.contains(newName),
        s"renameColumn: '$newName' already exists")
      val cmap0 = colMap(m)
      val phys = cmap0.getOrElse(oldName, oldName)
      val cmap = (cmap0 - oldName) ++ (
        if (phys == newName) Nil else Seq(newName -> phys))
      val renamed = StructType(logical.fields.map(f =>
        if (f.name == oldName) f.copy(name = newName) else f))
      // colmap= is ALWAYS written (empty clears an inherited mapping)
      s"schema=${schemaMeta(renamed)} colmap=" +
        cmap.toSeq.sorted.map { case (l, p) => s"$l:$p" }.mkString(",")
    })(_ => Some((Nil, Nil))).get
  }

  /** Metadata-only DROP COLUMN: the column leaves the logical schema
    * (and the mapping) in one zero-body commit; its bytes stay in the
    * immutable files, projected away by every evolved read — exactly
    * how real formats make DROP instant at any table size. At least
    * one column must remain.
    */
  def dropColumn(root: Path, name: String): Int =
    commitOpsF(root, { parent =>
      require(parent > 0, "dropColumn on an empty table")
      val m = headerMeta(root, parent)
      require(m.contains("schema"),
        s"v$parent carries no schema meta — the table is not evolvable")
      val logical = parseSchemaMeta(m("schema"))
      require(logical.fieldNames.contains(name),
        s"dropColumn: no column '$name' in ${logical.fieldNames.toSeq}")
      require(logical.fields.length > 1,
        "dropColumn would leave an empty schema")
      val cmap = colMap(m) - name
      val dropped = StructType(logical.fields.filterNot(_.name == name))
      s"schema=${schemaMeta(dropped)} colmap=" +
        cmap.toSeq.sorted.map { case (l, p) => s"$l:$p" }.mkString(",")
    })(_ => Some((Nil, Nil))).get

  /** Metadata-only ADD COLUMN: one zero-body commit whose header
    * carries the widened logical schema; existing files null-fill the
    * new column under [[readEvolved]]'s explicit-schema read — zero
    * bytes rewritten at any table size (the evolution primitive the
    * evo lifecycle built inline; public for the SQL catalog's
    * `ALTER TABLE … ADD COLUMN`, round 10).
    */
  def addColumn(root: Path, name: String,
      dt: org.apache.spark.sql.types.DataType): Int = {
    tokenSafe(name)
    commitOpsF(root, { parent =>
      require(parent > 0, "addColumn on an empty table")
      val m = headerMeta(root, parent)
      require(m.contains("schema"),
        s"v$parent carries no schema meta — the table is not evolvable")
      val logical = parseSchemaMeta(m("schema"))
      require(!logical.fieldNames.contains(name),
        s"addColumn: '$name' already exists")
      s"schema=${schemaMeta(logical.add(
        org.apache.spark.sql.types.StructField(name, dt)))}"
    })(_ => Some((Nil, Nil))).get
  }

  /** The `schema=`/`colmap=` meta tokens of a committed version — what
    * an appending writer passes so its commit PRESERVES the evolution
    * state (commit meta is per-commit, not inherited; a schema-less
    * append on an evolved table would strand readEvolved).
    */
  def evolutionMeta(root: Path, version: Int): String = {
    val m = headerMeta(root, version)
    require(m.contains("schema"),
      s"v$version carries no schema meta — the table is not evolvable")
    s"schema=${m("schema")}" +
      m.get("colmap").map(c => s" colmap=$c").getOrElse("")
  }

  /** Stage under the PHYSICAL names of `version`'s mapping: a writer
    * appending after a rename holds logical column names; files must
    * carry physical ones or the mapped read would miss them. A no-op
    * select when the table has no mapping.
    */
  def stageEvolved(df: DataFrame, root: Path, batch: String,
      version: Int): Seq[String] = {
    val cmap = colMap(headerMeta(root, version))
    stage(df.select(df.columns.toSeq.map(c =>
      col(c).as(cmap.getOrElse(c, c))): _*), root, batch)
  }

  /** Header key=value metadata of one committed version (empty for
    * plain commits). The header line is
    * `# graft-manifest version=K parent=P [k=v ...]`.
    */
  def headerMeta(root: Path, version: Int): Map[String, String] =
    (manifestOf(root, version)._2 -- Seq("version", "parent"))
      // an explicit EMPTY colmap= token means "mapping cleared" (it
      // blocks inheritance at commit time, round 10) — API consumers
      // see it as no mapping at all
      .filterNot { case (k, v) => k == "colmap" && v.isEmpty }

  /** Streaming-sink batch ids already committed — the ledger that makes
    * [[commitBatch]] idempotent under foreachBatch's at-least-once
    * replay contract.
    */
  def committedBatches(root: Path): Set[Long] =
    (math.max(1, firstVersion(root)) to latestVersion(root))
      .flatMap(v => headerMeta(root, v).get("batch").map(_.toLong)).toSet

  /** Incremental ledger (wave 137): manifest headers are immutable, so
    * a JVM-wide cache of (versions scanned so far, batch ids seen)
    * turns the per-micro-batch ledger check from O(versions) header
    * reads into O(new commits since the last check) — without it a
    * long-lived sink pays O(n²) cumulative header IO over its
    * lifetime. Correct under races and other writers by construction:
    * the cache is only ever a (bound, subset) pair of immutable
    * history; a stale bound just re-reads the missed suffix on the
    * next call, and a concurrent put that regresses the bound leaves a
    * valid (smaller) snapshot. Delta carries the same state in its
    * checkpoints (per-appId txn versions); an in-JVM suffix cache is
    * the minimal form that keeps this format's no-extra-state shape.
    */
  private val batchLedger = new java.util.concurrent.ConcurrentHashMap[
    String, (Int, Set[Long])]()

  private def committedBatchesCached(root: Path): Set[Long] = {
    val latest = latestVersion(root)
    // cache key carries TABLE IDENTITY, not just the path: the first
    // live manifest's ts= header (unique per creation, and per expiry
    // horizon). A table deleted and recreated at the same path that
    // reaches a version >= the cached bound would otherwise reuse
    // stale batch ids and silently skip the new table's replayed
    // batches (round-10 ADVICE fix). Legacy pre-ts roots key on "0" —
    // same behavior as before for them.
    val ident =
      if (latest == 0) "0"
      else headerMeta(root, math.max(1, firstVersion(root)))
        .getOrElse("ts", "0")
    val key = root.toAbsolutePath.toString + "#" + ident
    val (seen0, known0) = Option(batchLedger.get(key))
      .getOrElse((0, Set.empty[Long]))
    // history SHRANK → the table at this path was deleted and
    // recreated (a reset test harness, a rebuilt staging table):
    // trusting the old ids would silently DROP the new table's
    // replayed batches — discard and rescan (wave-139 review fix)
    val (seen, known) =
      if (latest < seen0) { batchLedger.remove(key); (0, Set.empty[Long]) }
      else (seen0, known0)
    if (latest <= seen) known
    else {
      // start past BOTH the cache bound and the retention horizon —
      // batches recorded only in expired manifests are forgotten, the
      // same window semantics as Delta's txn retention (don't expire
      // below a live sink's replay horizon)
      val from = math.max(seen, math.max(1, firstVersion(root)) - 1)
      val merged = known ++ (from + 1 to latest)
        .flatMap(v => headerMeta(root, v).get("batch").map(_.toLong))
      // crude bound like SegIO's: a test JVM creating hundreds of
      // temp tables must not accumulate entries forever (a perf
      // cache, never a correctness structure)
      if (batchLedger.size > 512) batchLedger.clear()
      batchLedger.put(key, (latest, merged))
      merged
    }
  }

  /** Exactly-once streaming commit: append `df`'s rows as the next
    * snapshot, recording `batchId` in the manifest header. A replayed
    * batch (same id — Spark's foreachBatch may re-deliver after a
    * failure) finds its id in the ledger and no-ops BEFORE staging, so
    * duplicates neither commit nor leave orphan data files; the ledger
    * re-check runs inside the publish retry loop too, so two racing
    * replays of the same batch cannot both win. Commit = one hard-link
    * create, so a crash mid-batch leaves at most invisible staged files
    * (vacuum fodder), never a torn snapshot — the transactional-sink
    * half of exactly-once (the source side is Spark's checkpointed
    * offset log).
    */
  def commitBatch(df: DataFrame, root: Path, batchId: Long,
      statsKey: Option[String] = None): Int = {
    if (committedBatchesCached(root).contains(batchId))
      return latestVersion(root)
    // batch prefix carries a writer nonce: two RACING replays of the
    // same batch (the top check can't see an in-flight twin) must not
    // stage into one path and clobber each other mid-write — each gets
    // private file names, the ledger picks one commit, and the loser's
    // orphans stay invisible (vacuum fodder), the uuid-named-files
    // discipline of the real formats. statsKey makes the sink write
    // stats-carrying lines, so a streamed table composes with the
    // stats consumers (readPruned / mergeCoW / optimizeSmall).
    val batch = s"b$batchId${nonce()}"
    val added = statsKey match {
      case Some(k) => stageWithStats(df, root, batch, k)
      case None => stage(df, root, batch)
    }
    commitOpsF(root, _ => s"batch=$batchId") { parent =>
      if (committedBatchesCached(root).contains(batchId)) None
      else Some((added, Nil)) // O(|batch|) delta commit
    }.getOrElse(latestVersion(root))
  }

  /** Columnar (parquet) encoding of checkpoint manifest SEGMENTS —
    * wave 133, closing the "text manifests vs avro/parquet" encoding
    * gap. A full checkpoint no longer inlines its entry lines into the
    * commit file: entries are written as one or more parquet segment
    * files under `_manifests/` (path + typed per-column bounds as
    * proper columns — dictionary/RLE-compressed, splittable), and the
    * commit file's body holds one DESCRIPTOR line per segment carrying
    * the segment's AGGREGATE bounds. That makes the commit file a
    * MANIFEST LIST and the segments manifest files — Iceberg's
    * two-level shape — so pruned planning reads only the segments
    * whose aggregate bounds intersect the predicate
    * ([[prunedEntries]]): planning cost rides the relevant fraction of
    * the file list, not O(files). Driver-side IO uses the parquet
    * example Group API (no SparkSession needed at plan time); segment
    * files are nonce-named and written BEFORE the commit link, so a
    * lost publish race orphans them invisibly (vacuum fodder), never
    * corrupts a winner.
    */
  private object SegIO {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
    import org.apache.parquet.hadoop.metadata.CompressionCodecName
    import org.apache.parquet.schema.MessageTypeParser

    val schema = MessageTypeParser.parseMessageType(
      """message graft_manifest_entry {
        |  required binary path (UTF8);
        |  repeated group lstats { required binary col (UTF8);
        |    required int64 lmin; required int64 lmax; }
        |  repeated group sstats { required binary col (UTF8);
        |    required binary smin (UTF8); required binary smax (UTF8); }
        |}""".stripMargin)

    def write(file: Path, entries: Seq[FileEntry]): Unit = {
      val conf = new org.apache.hadoop.conf.Configuration()
      @annotation.nowarn("cat=deprecation")
      val w = ExampleParquetWriter.builder(
          new org.apache.hadoop.fs.Path(file.toString))
        .withConf(conf).withType(schema)
        .withCompressionCodec(CompressionCodecName.SNAPPY).build()
      val f = new SimpleGroupFactory(schema)
      try entries.foreach { e =>
        val g = f.newGroup()
        g.append("path", e.path)
        e.stats.foreach { case (c, (mn, mx)) =>
          val sg = g.addGroup("lstats")
          sg.append("col", c); sg.append("lmin", mn)
          sg.append("lmax", mx); ()
        }
        e.strStats.foreach { case (c, (mn, mx)) =>
          val sg = g.addGroup("sstats")
          sg.append("col", c); sg.append("smin", mn)
          sg.append("smax", mx); ()
        }
        w.write(g)
      } finally w.close()
      // Hadoop's checksummed LocalFileSystem drops a `.<name>.crc`
      // sidecar the NIO-based sweeps would never match (they filter on
      // names starting with "cp") — checksum files would accumulate
      // unboundedly on long-lived tables (round-10 ADVICE fix). The
      // local segment write doesn't need the sidecar; drop it here.
      Files.deleteIfExists(
        file.resolveSibling("." + file.getFileName.toString + ".crc")): Unit
    }

    /** Published segments are immutable (nonce-named, referenced only
      * after their commit wins), so a JVM-wide cache is safe; it turns
      * repeated plan-time resolutions of one snapshot into zero IO.
      * Crude size bound: clear-all past 512 segments (a perf cache,
      * never a correctness structure).
      */
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[String, Seq[FileEntry]]()

    def read(file: Path): Seq[FileEntry] = {
      val key = file.toAbsolutePath.toString
      val hit = cache.get(key)
      if (hit != null) return hit
      val conf = new org.apache.hadoop.conf.Configuration()
      @annotation.nowarn("cat=deprecation")
      val r = ParquetReader.builder(new GroupReadSupport(),
        new org.apache.hadoop.fs.Path(key)).withConf(conf).build()
      val out = Seq.newBuilder[FileEntry]
      try {
        var g = r.read()
        while (g != null) {
          val nl = g.getFieldRepetitionCount("lstats")
          val ns = g.getFieldRepetitionCount("sstats")
          out += FileEntry(g.getString("path", 0),
            (0 until nl).map { i =>
              val sg = g.getGroup("lstats", i)
              sg.getString("col", 0) ->
                (sg.getLong("lmin", 0), sg.getLong("lmax", 0))
            },
            (0 until ns).map { i =>
              val sg = g.getGroup("sstats", i)
              sg.getString("col", 0) ->
                (sg.getString("smin", 0), sg.getString("smax", 0))
            })
          g = r.read()
        }
      } finally r.close()
      val res = out.result()
      if (cache.size > 512) cache.clear()
      cache.put(key, res)
      res
    }
  }

  /** Segment granularity for parquet checkpoints: entries per manifest
    * segment file. Bounds the two-level trade like real formats do —
    * a 10M-file table checkpoints into ~10k segments, each a few
    * hundred KB, and a pruned plan reads only the segments whose
    * aggregate bounds intersect the predicate.
    */
  private val SegmentEntries = 1024

  /** Columnar-delta threshold: a delta commit with at least this many
    * ADD entries writes them as parquet segments instead of inline
    * `+` lines. private[graft] so specs can reference the boundary.
    */
  private[graft] val DeltaSegEntries = 32

  /** Aggregate (manifest-list-level) bounds of one segment: a column
    * appears only when EVERY entry in the segment records bounds for
    * it — a statless member makes the segment unprovable-disjoint for
    * that column, so the descriptor must admit it unconditionally.
    */
  private[graft] def segmentBounds(entries: Seq[FileEntry]): FileEntry = {
    val lcols = entries.head.stats.map(_._1)
      .filter(c => entries.forall(_.band(c).isDefined))
    val scols = entries.head.strStats.map(_._1)
      .filter(c => entries.forall(_.bandStr(c).isDefined))
    FileEntry("",
      lcols.map { c =>
        val bs = entries.map(_.band(c).get)
        c -> (bs.map(_._1).min, bs.map(_._2).max) },
      scols.map { c =>
        val bs = entries.map(_.bandStr(c).get)
        // UTF-8 order, matching the entry-level bounds' collation
        c -> (bs.map(_._1).reduce(u8min), bs.map(_._2).reduce(u8max)) })
  }

  /** Manifest-LIST descriptor line for one checkpoint segment:
    * `@<segfile>\t<count>[\t<aggregate-bounds tokens>]` — the same
    * comma token syntax entry lines use, so the list level reuses the
    * entry level's typed-bounds encoding verbatim.
    */
  private[graft] def descLine(seg: String, n: Int, b: FileEntry): String = {
    val toks = FileEntry("x", b.stats, b.strStats).line.split('\t')
    if (toks.length == 1) s"@$seg\t$n" else s"@$seg\t$n\t${toks(1)}"
  }

  /** (segment file, entry count, aggregate bounds). */
  private[graft] def parseDesc(l: String): (String, Int, FileEntry) = {
    require(l.startsWith("@"), s"corrupt manifest-list line: $l")
    l.drop(1).split('\t') match {
      case Array(seg, n) => (seg, n.toInt, FileEntry(seg, Nil))
      case Array(seg, n, toks) => (seg, n.toInt, parseEntry(s"$seg\t$toks"))
      case _ => throw new IllegalArgumentException(
        s"corrupt manifest-list line: $l")
    }
  }

  /** Checkpoint cadence for the delta log: a commit whose delta chain
    * since the last full manifest would reach this length writes a
    * full (checkpoint) manifest instead. 8 bounds BOTH sides of the
    * trade: commit bytes stay O(delta) for 7 of every 8 commits
    * (amortized log growth O(files·Δ/8 + total delta), not the
    * O(files²) the complete-list-per-commit r8 format paid — its one
    * genuine 100 TB limit, r8 VERDICT item 1), and a reader resolves
    * any version by statting at most 8 manifest files. Real formats
    * make the same choice with the same shape (Delta's JSON deltas +
    * periodic parquet checkpoint; Iceberg's manifest lists).
    */
  private val CheckpointEvery = 8

  /** The shared OCC commit core. `ops(parent)` recomputes the commit's
    * intent against whatever parent currently holds the log head:
    * (added entry lines, removed paths); returning None aborts (the
    * [[commitBatch]] ledger re-check). Per attempt the core decides
    * delta vs checkpoint — `checkpoint` forces a full manifest (used
    * by [[commit]]'s replace-everything semantics); otherwise a delta
    * (`-path` / `+line` body, `kind=delta depth=N` header) is written
    * unless the parent's chain depth exhausted [[CheckpointEvery]], in
    * which case the resolved parent set + this delta folds into a full
    * manifest. Publication is one create-exclusive hard link — atomic,
    * and the loser of a race retries with a fresh `ops(parent)`.
    *
    * EVERY commit path propagates the parent's outstanding deletion
    * vectors unless its meta says otherwise (r8 ADVICE: appendCommit /
    * commitBatch / mergeCoW / optimizeSmall / compact used to commit
    * DV-free meta, silently resurrecting deleted rows on the next
    * readMOR). A caller that really means "no DVs" — [[compactMOR]],
    * which just materialized them — passes an explicit empty `dv=`
    * token. Key-based DVs survive any key-preserving rewrite by
    * construction; the one documented semantic edge is an APPEND that
    * re-inserts a previously deleted key: the key-predicate still
    * subtracts it until a compactMOR (positional deletes, which real
    * formats use to scope a DV to one file, are out of this format's
    * minimal scope — the caveat mirrors a DELETE-WHERE predicate).
    */
  /** Delta commit of (added entry lines, removed paths) against the
    * live head — the raw rewrite primitive the CoW ops compose
    * (package-visible for specs that need a remove-bearing delta
    * without a full lifecycle op).
    */
  private[graft] def commitOps(root: Path, adds: Seq[String],
      removes: Seq[String], meta: String = ""): Int =
    commitOpsF(root, _ => meta)(_ => Some((adds, removes))).get

  private def commitOpsF(root: Path, metaOf: Int => String,
      checkpoint: Boolean = false)(
      ops: Int => Option[(Seq[String], Seq[String])]): Option[Int] = {
    val d = manifestDir(root)
    Files.createDirectories(d)
    var attempt = 0
    while (true) {
      attempt += 1
      require(attempt <= 100, "manifest commit: livelock guard tripped")
      val parent = latestVersion(root)
      val v = parent + 1
      val (adds, removes) = ops(parent) match {
        case Some(x) => x
        case None => return None
      }
      val meta0 = metaOf(parent)
      // both vector kinds inherit unless the caller's meta names them
      val inheritedDvs = Seq(
        "dv" -> ((v: Int) => dvsFor(root, v)),
        "dvp" -> ((v: Int) => scopedDvsFor(root, v)),
        "dvr" -> ((v: Int) => rowDvsFor(root, v))).flatMap {
        case (k, f) =>
          if (parent == 0 || meta0.split(' ').exists(_.startsWith(k + "=")))
            None // caller manages (or clears) this list itself
          else f(parent) match {
            case Nil => None
            case vs => Some(s"$k=${vs.mkString(",")}")
          }
      }
      // evolution state (schema=/colmap=) rides the log like the DV
      // lists: a commit whose caller doesn't name them inherits the
      // parent's, so a MERGE/UPDATE/DELETE/optimize on an evolved
      // table never strands readEvolved or the catalog's schema
      // resolution (round-10: the V2 catalog resolves schema from the
      // LATEST header). renameColumn/dropColumn write colmap=
      // explicitly — even when empty — to CLEAR an inherited mapping.
      val inheritedEvo = {
        lazy val pm = manifestOf(root, parent)._2
        Seq("schema", "colmap", "ptrans").flatMap { k =>
          if (parent == 0 || meta0.split(' ').exists(_.startsWith(k + "=")))
            None
          else pm.get(k).filter(_.nonEmpty).map(v => s"$k=$v")
        }
      }
      val meta = (meta0 +: (inheritedDvs ++ inheritedEvo))
        .filter(_.nonEmpty).mkString(" ")
      val parentDepth =
        if (parent == 0) -1
        else manifestOf(root, parent)._2.get("depth").map(_.toInt).getOrElse(0)
      val full = checkpoint || parent == 0 ||
        parentDepth + 1 >= CheckpointEvery
      val (kindMeta, bodyLines) =
        if (full) {
          val base = if (parent == 0) Nil else rawLines(root, parent)
          val rm = removes.toSet
          val entryLines =
            base.filterNot(l => rm(l.split('\t').head)) ++ adds
          if (entryLines.isEmpty) ("", Nil)
          else {
            // parquet-encoded checkpoint (wave 133): entries land in
            // nonce-named segment files, the commit file's body is the
            // manifest LIST (one descriptor + aggregate bounds per
            // segment). Segments are written before the publish link —
            // a lost race orphans them (vacuum fodder), never corrupts
            // the winner.
            val segNonce = nonce()
            val descs = entryLines.map(parseEntry)
              .grouped(SegmentEntries).zipWithIndex.map { case (es, i) =>
                val segName = s"cp$segNonce-s$i.parquet"
                SegIO.write(d.resolve(segName), es)
                descLine(segName, es.size, segmentBounds(es))
              }.toSeq
            ("body=seg", descs)
          }
        } else {
          // columnar delta (round 10): a delta whose ADD set is large
          // writes its adds as parquet segments (the wave-133 SegIO
          // encoding checkpoints use) listed as @descriptors beside
          // the -path lines — a 10k-file rewrite commits ~100 KB of
          // dictionary-compressed segment instead of ~1 MB of text,
          // and the descriptor's aggregate bounds let pruned plans
          // skip the whole segment. Small deltas stay inline text:
          // a parquet file has a ~KB fixed cost a 2-line delta never
          // amortizes (the same trade behind Delta Lake's JSON deltas)
          val addBody =
            if (adds.size >= DeltaSegEntries) {
              val segNonce = nonce()
              adds.map(parseEntry).grouped(SegmentEntries).zipWithIndex
                .map { case (es, i) =>
                  val segName = s"cp$segNonce-s$i.parquet"
                  SegIO.write(d.resolve(segName), es)
                  descLine(segName, es.size, segmentBounds(es))
                }.toSeq
            } else adds.map("+" + _)
          (s"kind=delta depth=${parentDepth + 1}",
            removes.map("-" + _) ++ addBody)
        }
      // every commit records its wall-clock time — the index TIMESTAMP
      // AS OF resolution ([[versionAt]]) scans; ties (same-ms commits)
      // resolve to the latest version, the Delta rule
      val extras = Seq(meta, s"ts=${System.currentTimeMillis()}", kindMeta)
        .filter(_.nonEmpty)
      val head = s"# graft-manifest version=$v parent=$parent" +
        (if (extras.isEmpty) "" else extras.mkString(" ", " ", ""))
      val body = (head +: bodyLines).mkString("", "\n", "\n")
      val tmp = d.resolve(s".tmp_${name(v)}_p${ProcessHandle.current().pid()}" +
        s"_t${Thread.currentThread().getId}")
      Files.write(tmp, body.getBytes("UTF-8"))
      try {
        Files.createLink(d.resolve(name(v)), tmp) // atomic, fails if exists
        Files.delete(tmp)
        writeHint(root, v)
        return Some(v)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.delete(tmp) // lost the race — retry on the new latest
      }
    }
    None // unreachable
  }

  /** Recorded commit wall-time of a version (the `ts=` header field
    * every commit writes), in epoch millis.
    */
  def commitTime(root: Path, version: Int): Long =
    headerMeta(root, version).get("ts").map(_.toLong).getOrElse(
      throw new IllegalStateException(
        s"v$version predates timestamp recording — resolve it by version"))

  /** TIMESTAMP AS OF: the largest committed version whose recorded
    * commit time is <= `tMillis` — time-travel by wall clock, the
    * Delta/Iceberg query surface for "the table as of last midnight".
    * Same-millisecond commits tie-break to the LATEST version (later
    * versions strictly supersede within one timestamp). O(versions)
    * header reads; real formats pay the same log scan (or index it in
    * a checkpoint). Throws when `tMillis` predates the first commit —
    * there is no table to read there.
    */
  def versionAt(root: Path, tMillis: Long): Int = {
    val latest = latestVersion(root)
    require(latest > 0, "versionAt on an empty table")
    val eligible = (math.max(1, firstVersion(root)) to latest).filter { v =>
      headerMeta(root, v).get("ts").exists(_.toLong <= tMillis)
    }
    require(eligible.nonEmpty,
      s"no committed version at or before t=$tMillis — the table " +
      "did not exist yet")
    eligible.max
  }

  /** [[read]] pinned by wall clock instead of version number. */
  def readAsOf(spark: SparkSession, root: Path, tMillis: Long,
      schema: StructType): DataFrame =
    read(spark, root, versionAt(root, tMillis), schema)

  /** DESCRIBE HISTORY: one row per committed version — (version,
    * ts_millis, kind, operation) — from the manifest headers alone.
    * `operation` is the committing path's own meta token (merge=vK /
    * optimize=vK / zorder=vK / upsert=vK / batch=N / dv= / …), "" for
    * plain appends; `kind` is checkpoint or delta. The audit surface
    * every real format exposes, derived rather than stored: the log IS
    * the history.
    */
  def history(spark: SparkSession, root: Path): DataFrame = {
    // colmap is evolution plumbing like schema — without it rename/
    // drop commits surface the raw logical:physical blob as their
    // "operation" (round-10 ADVICE fix)
    val infra = Set("ts", "depth", "schema", "body", "colmap")
    val rows = (math.max(1, firstVersion(root)) to latestVersion(root))
      .map { v =>
      val m = headerMeta(root, v)
      org.apache.spark.sql.Row(
        v.toLong,
        m.get("ts").map(_.toLong).getOrElse(-1L),
        if (m.contains("kind")) m("kind") else "checkpoint",
        m.view.filterKeys(k => !infra(k) && k != "kind")
          .map { case (k, x) => s"$k=$x" }.toSeq.sorted.mkString(" "))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        org.apache.spark.sql.types.StructField("version",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts_millis",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("operation",
          org.apache.spark.sql.types.StringType))))
  }

  /** Stage a DataFrame as immutable data files under data/ with a
    * caller-chosen batch prefix; returns the relative paths (NOT yet
    * visible to readers — only a commit references them).
    */
  def stage(df: DataFrame, root: Path, batch: String): Seq[String] = {
    val tmp = root.resolve(s".stage_$batch")
    df.write.mode("overwrite").parquet(tmp.toString)
    val data = root.resolve("data")
    Files.createDirectories(data)
    val s = Files.list(tmp)
    val parts =
      try s.map[Path](p => p).toArray.toSeq.collect {
        case p: Path if p.getFileName.toString.endsWith(".parquet") => p
      }.sortBy(_.getFileName.toString)
      finally s.close()
    val rel = parts.zipWithIndex.map { case (p, i) =>
      val n = s"$batch-$i.parquet"
      Files.move(p, data.resolve(n), StandardCopyOption.REPLACE_EXISTING)
      n
    }
    // remove the staging leftovers (_SUCCESS etc.)
    val rest = Files.list(tmp)
    try rest.forEach(p => Files.delete(p)) finally rest.close()
    Files.delete(tmp)
    rel
  }

  /** [[stage]] plus EXACT per-file min/max stats on `keyCol`, encoded
    * into the manifest lines (`path\tmin\tmax`). The caller range-lays
    * the frame first (repartitionByRange on the key) so each file
    * covers a narrow key band and the stats actually prune; measured
    * post-write, the bounds are exact, not estimates.
    */
  def stageWithStats(df: DataFrame, root: Path, batch: String,
      keyCol: String): Seq[String] =
    stageWithStats(df, root, batch, Seq(keyCol))

  /** Multi-column form: record exact min/max for EVERY column in
    * `statCols` (all long-typed), one stats pass per staged file —
    * the per-column stats map real formats carry, so [[readPruned]] /
    * [[mergeCoW]] can prune on any recorded column, not one hard-wired
    * key (r8 VERDICT item 2).
    */
  def stageWithStats(df: DataFrame, root: Path, batch: String,
      statCols: Seq[String]): Seq[String] =
    stageWithTypedStats(df, root, batch, statCols, Nil)

  /** Typed form: exact per-file min/max for `longCols` (long-typed)
    * AND `strCols` (string-typed) in one stats pass per staged file —
    * string bounds being the wave-132 closure of the format's
    * long-only-stats gap, so prunes compose across numeric and string
    * predicates the way real formats' per-column stats do.
    */
  def stageWithTypedStats(df: DataFrame, root: Path, batch: String,
      longCols: Seq[String], strCols: Seq[String]): Seq[String] = {
    require(longCols.nonEmpty || strCols.nonEmpty,
      "stageWithTypedStats needs at least one stats column")
    val spark = df.sparkSession
    stage(df, root, batch).flatMap { rel =>
      // count first: emptiness must be decided by ROWS, not by a null
      // min (an all-null stats column in a non-empty file would
      // otherwise delete live data); per-column null bounds are simply
      // not recorded — the file is then admitted unconditionally for
      // that column, the only-skip-provably-empty rule
      val aggs = count(lit(1)) +:
        (longCols ++ strCols).flatMap(c => Seq(min(c), max(c)))
      val mm = spark.read.schema(df.schema)
        .parquet(root.resolve("data").resolve(rel).toString)
        .agg(aggs.head, aggs.tail: _*).head()
      if (mm.getLong(0) == 0L) { // empty partition's file: not live
        Files.delete(root.resolve("data").resolve(rel)); None
      } else {
        val off = 1 + 2 * longCols.size
        Some(FileEntry(rel,
          longCols.zipWithIndex.flatMap { case (c, i) =>
            if (mm.isNullAt(1 + 2 * i)) None
            else Some(c -> (mm.getLong(1 + 2 * i), mm.getLong(2 + 2 * i))) },
          strCols.zipWithIndex.flatMap { case (c, i) =>
            if (mm.isNullAt(off + 2 * i)) None
            else Some(c ->
              (mm.getString(off + 2 * i), mm.getString(off + 2 * i + 1)))
          }).line)
      }
    }
  }

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
    val rewritten = stageWithTypedStats(
      transform(affected).repartitionByRange(
        math.max(1, hit.size), col(keyCol)),
      root, s"merge$from${nonce()}", statCols, strCols)
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
    val bandsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(fromEntries.map { e =>
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
    val hitPaths = updates.select(col(keyCol).as("__k")).distinct()
      .join(broadcast(bandsDf),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .select("__p").distinct().collect().map(_.getString(0)).toSet
    val hit = fromEntries.filter(e => hitPaths(e.path))
    val data = root.resolve("data")
    val ordered = updates.select(schema.fieldNames.map(col).toSeq: _*)
    val replacement =
      if (hit.isEmpty) ordered // pure insert — nothing to rewrite
      else spark.read.schema(schema)
        .parquet(hit.map(e => data.resolve(e.path).toString): _*)
        .join(updates.select(keyCol), Seq(keyCol), "left_anti")
        .unionByName(ordered)
    // rewritten files keep the touched set's stats coverage (mergeCoW
    // discipline, string bounds included): an upsert must not narrow
    // the columns later prunes rely on
    val statCols = (keyCol +: hit.flatMap(_.stats.map(_._1))).distinct
    val strColsU = hit.flatMap(_.strStats.map(_._1)).distinct
    val rewritten = stageWithTypedStats(
      replacement.repartitionByRange(math.max(1, hit.size + 1),
        col(keyCol)),
      root, s"upsert$from${nonce()}", statCols, strColsU)
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
    // keep the rewritten set clustered on the leading stat column when
    // one exists (narrow bounds keep the files prunable); otherwise
    // the layout is whatever the replacement plan produced
    val laid = statCols.headOption match {
      case Some(k) => replacement
        .repartitionByRange(math.max(1, hit.size), col(k))
      case None => replacement
    }
    // a stats-less table (no statsColumns property) still rewrites —
    // there is just no coverage to preserve
    val rewritten =
      if (statCols.isEmpty && strCols.isEmpty)
        stage(laid, root, s"$batchTag$from${nonce()}")
      else stageWithTypedStats(laid, root,
        s"$batchTag$from${nonce()}", statCols, strCols)
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
      strBands: Seq[(String, Option[String], Option[String])] = Nil)
      : Int = {
    val from = latestVersion(root)
    require(from > 0, "deleteWhere on an empty table")
    requireNoScopedDvs(root, from, "deleteWhere")
    val (hit, _, _) = prunedEntries(root, from, longBands, strBands)
    if (hit.isEmpty) return from
    val data = root.resolve("data")
    val kept = spark.read.schema(schema)
      .parquet(hit.map(e => data.resolve(e.path).toString): _*)
      .filter(not(coalesce(cond, lit(false))))
    rewriteFilesCoW(spark, root, from, hit, kept,
      s"delete=v$from", "del")
  }

  /** SQL `UPDATE … SET … WHERE cond` as copy-on-write: same pruned
    * touched-set discipline as [[deleteWhereCoW]]; within the admitted
    * files each row either takes the assigned values (cond TRUE) or
    * survives verbatim (FALSE or NULL).
    */
  def updateWhereCoW(spark: SparkSession, root: Path,
      schema: StructType, cond: Column, set: Map[String, Column],
      longBands: Seq[(String, Long, Long)] = Nil,
      strBands: Seq[(String, Option[String], Option[String])] = Nil)
      : Int = {
    require(set.nonEmpty, "UPDATE with no assignments")
    set.keys.foreach(k => require(schema.fieldNames.contains(k),
      s"UPDATE assigns unknown column '$k'"))
    val from = latestVersion(root)
    require(from > 0, "updateWhere on an empty table")
    requireNoScopedDvs(root, from, "updateWhere")
    val (hit, _, _) = prunedEntries(root, from, longBands, strBands)
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
    val packed = stageWithTypedStats(
      spark.read.schema(schema)
        .parquet(small.map(e => data.resolve(e.path).toString): _*)
        .repartitionByRange(math.max(1,
          (small.map(e => Files.size(data.resolve(e.path))).sum
            / smallBytes).toInt), col(keyCol)),
      root, s"opt$from${nonce()}", statCols, strCols)
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
    val rewritten = stageWithTypedStats(
      df.withColumn("__z", z)
        .repartitionByRange(math.max(1, targetFiles), col("__z"))
        .sortWithinPartitions("__z").drop("__z"),
      root, s"zorder$from${nonce()}", statCols, strCols)
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
    val rel = stage(sidecar.coalesce(1), root, s"dvp${nonce()}")
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

  /** HIDDEN PARTITIONING (round 10 — r9-VERDICT task 6, Iceberg's
    * headline feature restated): a table records VALUE TRANSFORMS in
    * its header meta (`ptrans=bucket(16,c),truncate(1000,k),days(ts)`)
    * and its writers lay files out by the transform values, recording
    * each file's transform bounds as ordinary per-file stats under a
    * reserved virtual column name (`__ptb16_c` / `__ptt1000_k` /
    * `__ptd_ts`). Planning then DERIVES virtual bands from plain
    * predicates on the SOURCE column — a user filters `c = 42` and the
    * planner adds `__ptb16_c = bucket(42)` — so file skipping works
    * with zero user knowledge of the layout (that is what makes the
    * partitioning "hidden"; a Hive-style layout leaks partition
    * columns into every query). The transform values are materialized
    * as extra columns in the data files: explicit-schema readers never
    * see them (parquet projection drops unrequested columns), and the
    * bytes are RLE'd near-constants.
    *
    * Transforms cover LONG columns: `bucket(n,c)` =
    * pmod(xxhash64(c), n) — equality predicates derive an exact
    * bucket band, ranges derive nothing (hash is not monotone);
    * `truncate(w,c)` = c - floorMod(c, w) and `days(c)` =
    * floorDiv(c, 86400000000) are monotone, so range bands map
    * through directly.
    */
  sealed trait PartTransform {
    def srcCol: String
    /** `ptrans=` meta token. */
    def meta: String
    /** Reserved virtual stats-column name the file bounds land under. */
    def statName: String
    /** Row-level transform value (stage-time layout + stats column). */
    def exprCol: Column
    /** Driver-side transform of one literal (plan-time derivation). */
    def ofLiteral(v: Long): Long
    /** Virtual band derived from a source-column band, when sound. */
    def bandOf(lo: Long, hi: Long): Option[(Long, Long)]
  }

  case class BucketTransform(n: Int, srcCol: String) extends PartTransform {
    def meta = s"bucket($n,$srcCol)"
    def statName = s"__ptb${n}_$srcCol"
    def exprCol: Column = pmod(xxhash64(col(srcCol)), lit(n.toLong))
    def ofLiteral(v: Long): Long = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
      val h = new XxHash64(Seq(Literal(v)), 42L).eval(null)
        .asInstanceOf[Long]
      java.lang.Math.floorMod(h, n.toLong)
    }
    def bandOf(lo: Long, hi: Long): Option[(Long, Long)] =
      if (lo == hi) { val b = ofLiteral(lo); Some((b, b)) } else None
  }

  case class TruncateTransform(w: Long, srcCol: String)
      extends PartTransform {
    require(w > 0, s"truncate width must be positive, got $w")
    def meta = s"truncate($w,$srcCol)"
    def statName = s"__ptt${w}_$srcCol"
    def exprCol: Column =
      col(srcCol) - pmod(col(srcCol), lit(w))
    def ofLiteral(v: Long): Long = v - java.lang.Math.floorMod(v, w)
    def bandOf(lo: Long, hi: Long): Option[(Long, Long)] =
      Some((ofLiteral(lo), ofLiteral(hi))) // monotone
  }

  /** Epoch-micros → days-since-epoch (the Iceberg `days(ts)` shape on
    * a long micros column, which is how this format's fixtures carry
    * time).
    */
  case class DaysTransform(srcCol: String) extends PartTransform {
    private val DayUs = 86400000000L
    def meta = s"days($srcCol)"
    def statName = s"__ptd_$srcCol"
    def exprCol: Column = floor(col(srcCol).cast("double") / DayUs)
      .cast("long")
    def ofLiteral(v: Long): Long = java.lang.Math.floorDiv(v, DayUs)
    def bandOf(lo: Long, hi: Long): Option[(Long, Long)] =
      Some((ofLiteral(lo), ofLiteral(hi))) // monotone
  }

  private val BucketRe = """bucket\((\d+),([^)]+)\)""".r
  private val TruncRe = """truncate\((\d+),([^)]+)\)""".r
  private val DaysRe = """days\(([^)]+)\)""".r

  def parseTransform(s: String): PartTransform = s match {
    case BucketRe(n, c) => BucketTransform(n.toInt, c)
    case TruncRe(w, c) => TruncateTransform(w.toLong, c)
    case DaysRe(c) => DaysTransform(c)
    case _ => throw new IllegalArgumentException(
      s"unknown partition transform '$s'")
  }

  /** Recorded transforms of a version (`ptrans=` header meta). The
    * token is comma-separated transform specs; specs contain no commas
    * outside their own parentheses, so a paren-depth split like
    * [[parseSchemaMeta]]'s applies — but bucket/truncate/days args
    * never nest, so a regex scan is enough.
    */
  def partTransforms(root: Path, version: Int): Seq[PartTransform] =
    headerMeta(root, version).get("ptrans").map { t =>
      """(bucket|truncate)\(\d+,[^)]+\)|days\([^)]+\)""".r
        .findAllIn(t).toSeq.map(parseTransform)
    }.getOrElse(Nil)

  def transformsMeta(ts: Seq[PartTransform]): String = {
    val m = ts.map(_.meta).mkString(",")
    require(!m.contains(' '), s"ptrans meta must be space-free: $m")
    s"ptrans=$m"
  }

  /** Stage `df` laid out BY the transform values (range-partitioned on
    * the transform tuple, so each staged file covers a tight,
    * near-disjoint transform range) with the transform bounds recorded
    * as per-file stats under the reserved virtual names, alongside any
    * ordinary stats columns. Commit the result with
    * [[transformsMeta]] in the commit meta so readers can derive.
    */
  def stageHidden(df: DataFrame, root: Path, batch: String,
      transforms: Seq[PartTransform], files: Int,
      statsCols: Seq[String] = Nil, strCols: Seq[String] = Nil)
      : Seq[String] = {
    require(transforms.nonEmpty, "stageHidden needs at least one transform")
    val withT = transforms.foldLeft(df)((d, t) =>
      d.withColumn(t.statName, t.exprCol))
    val laid = withT.repartitionByRange(math.max(1, files),
      transforms.map(t => col(t.statName)): _*)
    stageWithTypedStats(laid, root, batch,
      (statsCols ++ transforms.map(_.statName)).distinct, strCols)
  }

  /** Plan-time derivation: map source-column bands through the
    * version's recorded transforms into virtual-stat bands. A
    * predicate shape a transform cannot soundly map (range over a
    * bucket) derives nothing — the files are then admitted by the
    * ordinary rules (only-skip-provably-empty).
    */
  def hiddenBands(root: Path, version: Int,
      preds: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    val ts = partTransforms(root, version)
    if (ts.isEmpty) Nil
    else preds.flatMap { case (c, lo, hi) =>
      ts.filter(_.srcCol == c).flatMap(t =>
        t.bandOf(lo, hi).map { case (l, h) => (t.statName, l, h) })
    }
  }

  /** [[readPrunedMulti]] with hidden-partition derivation: predicates
    * prune through BOTH their own recorded stats (if any) and the
    * transform layout. The exact predicate re-applies on the admitted
    * rows, so results equal a full scan + filter.
    */
  def readPrunedHidden(spark: SparkSession, root: Path, version: Int,
      schema: StructType, preds: Seq[(String, Long, Long)]): DataFrame = {
    require(preds.nonEmpty, "readPrunedHidden needs at least one predicate")
    requirePrunableSnapshot(root, version, "readPrunedHidden")
    val (hit, _, _) = prunedEntries(root, version,
      preds ++ hiddenBands(root, version, preds), Nil)
    if (hit.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    spark.read.schema(schema).parquet(
        hit.map(e => root.resolve("data").resolve(e.path).toString): _*)
      .filter(preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
        .reduce(_ && _))
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
      strBands: Seq[(String, Option[String], Option[String])] = Nil)
      : Int = {
    val from = latestVersion(root)
    require(from > 0, "positional delete on an empty table")
    val (hit, _, _) = prunedEntries(root, from, longBands, strBands)
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
      readMORPositional(spark, root, from, schema)
        .repartitionByRange(math.max(1, targetFiles), col(keyCol)),
      root, s"cmorp$from${nonce()}",
      (keyCol +: live.flatMap(_.stats.map(_._1))).distinct,
      live.flatMap(_.strStats.map(_._1)).distinct), meta = "dvr=")
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
      readMORScoped(spark, root, from, schema, keyCol)
        .repartitionByRange(math.max(1, targetFiles), col(keyCol)),
      root, s"cmors$from${nonce()}",
      (keyCol +: live.flatMap(_.stats.map(_._1))).distinct,
      live.flatMap(_.strStats.map(_._1)).distinct), meta = "dvp=")
  }

  /** Fail-loud guard for the rewrite paths: positional vectors do not
    * survive file rewrites (their (key, src) pairs would dangle and
    * the deleted rows resurrect under new names).
    */
  private def requireNoScopedDvs(root: Path, version: Int, op: String): Unit = {
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
      readMOR(spark, root, from, schema, keyCol)
        .repartitionByRange(math.max(1, targetFiles), col(keyCol)),
      root, s"cmor$from${nonce()}",
      (keyCol +: live.flatMap(_.stats.map(_._1))).distinct,
      live.flatMap(_.strStats.map(_._1)).distinct), meta = "dv=")
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
  def expireManifests(root: Path, keepFrom: Int): Seq[String] = {
    val latest = latestVersion(root)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"expireManifests keepFrom=$keepFrom outside committed 1..$latest")
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

  /** Scan one snapshot: exactly its listed files, explicit schema. */
  def read(spark: SparkSession, root: Path, version: Int,
      schema: StructType): DataFrame = {
    val files = filesFor(root, version)
      .map(f => root.resolve("data").resolve(f).toString)
    spark.read.schema(schema).parquet(files: _*)
  }

  /** Stats-pruned read: intersect `[lo, hi]` with each live file's
    * recorded key bounds and scan ONLY the admitted files — planning
    * happens against the manifest's per-file stats, with no listing
    * and no footer I/O for skipped files. The exact predicate is
    * re-applied on the admitted rows (stats admit at file granularity),
    * so the result equals a full scan + filter; the file skips are the
    * point ("a point read on 100 TB touches the handful of files whose
    * band contains the key").
    */
  def readPruned(spark: SparkSession, root: Path, version: Int,
      schema: StructType, keyCol: String, lo: Long, hi: Long): DataFrame =
    readPrunedMulti(spark, root, version, schema, Seq((keyCol, lo, hi)))

  /** Plan-time pruned resolution (wave 134 — the two-level payoff): the
    * admitted entry set of `version` under conjunctive long + string
    * band predicates, computed WITHOUT resolving the full file list.
    * A parquet checkpoint's manifest list is consulted first: segments
    * whose aggregate bounds prove disjointness are never read, so
    * planning IO rides the relevant fraction of the file list — on a
    * 10M-file table a narrow band reads a handful of segment files,
    * not the 10M-entry checkpoint. Delta commits on top apply as
    * usual (removes may name entries in skipped segments; filtering a
    * set they were never admitted to is a no-op). Returns (admitted
    * entries, segments read, segments listed) — the counters are the
    * spec's hook for asserting the skip physically happened.
    */
  private[graft] def prunedEntries(root: Path, version: Int,
      longPreds: Seq[(String, Long, Long)],
      strPreds: Seq[(String, Option[String], Option[String])])
      : (Seq[FileEntry], Int, Int) = {
    def admit(e: FileEntry): Boolean =
      longPreds.forall { case (c, lo, hi) => e.mayContain(c, lo, hi) } &&
      strPreds.forall { case (c, lo, hi) => e.mayContainStrOpt(c, lo, hi) }
    val (parent, kv, body) = manifestOf(root, version)
    if (kv.get("body").contains("seg")) {
      var segsRead = 0
      val out = body.flatMap { l =>
        val (seg, _, bounds) = parseDesc(l)
        if (!admit(bounds)) Nil
        else {
          segsRead += 1
          SegIO.read(manifestDir(root).resolve(seg)).filter(admit)
        }
      }
      (out, segsRead, body.size)
    } else if (!kv.contains("kind"))
      (body.map(parseEntry).filter(admit), 0, 0)
    else {
      val (base, r0, t0) = prunedEntries(root, parent, longPreds, strPreds)
      val removes = body.filter(_.startsWith("-")).map(_.drop(1)).toSet
      val adds = body.filter(_.startsWith("+")).map(_.drop(1)).map(parseEntry)
      // columnar-delta adds prune at the DESCRIPTOR level too: a
      // segment whose aggregate bounds prove disjointness is never read
      var segsRead = 0
      val descs = body.filter(_.startsWith("@"))
      val segAdds = descs.flatMap { l =>
        val (seg, _, bounds) = parseDesc(l)
        if (!admit(bounds)) Nil
        else {
          segsRead += 1
          SegIO.read(manifestDir(root).resolve(seg)).filter(admit)
        }
      }
      (base.filterNot(e => removes(e.path)) ++ adds.filter(admit)
        ++ segAdds, r0 + segsRead, t0 + descs.size)
    }
  }

  /** Multi-predicate stats prune: a file is scanned only when EVERY
    * `(col, lo, hi)` band intersects its recorded bounds for that
    * column — predicates on different columns compose conjunctively,
    * exactly how real formats' per-column stats planning works. A file
    * with no recorded stats for some predicate column cannot be proven
    * disjoint and is admitted (the row-level filter still applies, so
    * results stay exact either way).
    */
  /** Fail-loud guard shared by the pruned readers: they scan snapshot
    * FILES and never subtract deletion vectors, so running one on a
    * DV-carrying version would silently resurrect deleted rows — the
    * same hazard the V1 source guards by checking vectors before
    * pruning (wave-139 review fix). Use [[readMOR]] /
    * [[readMORScoped]] (or compact first) on such snapshots.
    */
  private def requirePrunableSnapshot(root: Path, version: Int,
      op: String): Unit =
    require(dvsFor(root, version).isEmpty &&
        scopedDvsFor(root, version).isEmpty &&
        rowDvsFor(root, version).isEmpty,
      s"$op on v$version: outstanding deletion vectors — a pruned " +
      "file scan would resurrect deleted rows; use readMOR/" +
      "readMORScoped/readMORPositional or compact first")

  def readPrunedMulti(spark: SparkSession, root: Path, version: Int,
      schema: StructType, preds: Seq[(String, Long, Long)]): DataFrame = {
    require(preds.nonEmpty, "readPrunedMulti needs at least one predicate")
    requirePrunableSnapshot(root, version, "readPrunedMulti")
    val (hit, _, _) = prunedEntries(root, version, preds, Nil)
    if (hit.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    spark.read.schema(schema).parquet(
        hit.map(e => root.resolve("data").resolve(e.path).toString): _*)
      .filter(preds.map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
        .reduce(_ && _))
  }

  /** String-band stats prune (wave 132): admit only the files whose
    * recorded STRING bounds for `keyCol` intersect [lo, hi] — the
    * mechanism behind "a brand/tenant/category predicate on 100 TB
    * touches the handful of files whose dictionary band contains it".
    * Same exactness contract as [[readPrunedMulti]]: stats admit at
    * file granularity, the row filter re-applies, statless files are
    * admitted (never skipped).
    */
  def readPrunedStr(spark: SparkSession, root: Path, version: Int,
      schema: StructType, keyCol: String, lo: String, hi: String)
      : DataFrame = {
    requirePrunableSnapshot(root, version, "readPrunedStr")
    val (hit, _, _) = prunedEntries(root, version, Nil,
      Seq((keyCol, Some(lo), Some(hi))))
    if (hit.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    spark.read.schema(schema).parquet(
        hit.map(e => root.resolve("data").resolve(e.path).toString): _*)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** Incremental consumption: the rows added between two snapshots =
    * the files `to` references that `from` does not — the primitive
    * behind "stream a lakehouse table from version K" (a consumer
    * persists its last-read version and repeatedly drains the delta).
    * Valid only over an APPEND-ONLY version range: every file of
    * `from` must still be live in `to`, else a compaction/merge's
    * rewritten files would re-surface rows the consumer already saw —
    * the guard refuses instead. Real formats extend this to the
    * general case by logging row-level change actions (a change data
    * feed); this minimal format deliberately stops at file-level
    * append deltas.
    */
  def readIncremental(spark: SparkSession, root: Path, from: Int,
      to: Int, schema: StructType): DataFrame = {
    require(from <= to, s"incremental range v$from→v$to is backwards")
    val before = if (from == 0) Set.empty[String]
      else filesFor(root, from).toSet
    val after = filesFor(root, to)
    require(before.subsetOf(after.toSet),
      s"v$from→v$to is not append-only (a rewrite or compaction " +
      "intervened) — file-level incremental read is undefined there")
    val added = after.filterNot(before)
    if (added.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(
      added.map(f => root.resolve("data").resolve(f).toString): _*)
  }

  /** Row-level CHANGE DATA FEED between two snapshots — the
    * generalization whose absence [[readIncremental]]'s append-only
    * guard documents: every committed difference surfaces as tagged
    * rows (`_change_type` = insert | delete; an update is its
    * delete(old image) + insert(new image) pair, the standard CDF
    * pre/post-image shape), derived from FILE LINEAGE, never a
    * full-table diff:
    *
    *  - rows of files `to` added, minus rows of files it removed
    *    (multiset exceptAll), are the inserts; the reverse difference
    *    the deletes — so a compaction or optimize, which only moves
    *    rows between files, yields an EMPTY feed, and a CoW merge
    *    yields exactly the band rows it changed (untouched rows in
    *    rewritten files cancel);
    *  - deletion vectors added in (from, to] kill rows of SURVIVING
    *    files: those surface as deletes via one broadcast semi-join —
    *    the only case that reads a file both versions share, and only
    *    because its rows' visibility changed.
    *
    * Both sides of the exceptAll are bounded by the CHANGED files, so
    * feed cost rides the delta at any table size. Invariant (the CDF
    * contract, proven by Wave115Spec across append+merge+MOR+compact
    * lifecycles): readMOR(from) − deletes ⊎ inserts ≡ readMOR(to) as
    * multisets.
    */
  def readChanges(spark: SparkSession, root: Path, from: Int, to: Int,
      schema: StructType, keyCol: String): DataFrame = {
    require(from <= to, s"change range v$from→v$to is backwards")
    // the feed's visibility algebra covers key-based vectors only;
    // scoped (positional) vectors must be compacted first
    requireNoScopedDvs(root, from, "readChanges")
    requireNoScopedDvs(root, to, "readChanges")
    val fromFiles =
      if (from == 0) Set.empty[String] else filesFor(root, from).toSet
    val toFiles = filesFor(root, to).toSet
    def readSet(fs: Set[String]): DataFrame =
      if (fs.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(fs.toSeq.sorted.map(f =>
        root.resolve("data").resolve(f).toString): _*)
    def dvKeys(v: Int): Option[DataFrame] = {
      val dvs = if (v == 0) Nil else dvsFor(root, v)
      if (dvs.isEmpty) None
      else Some(spark.read.parquet(dvs.map(f =>
          root.resolve("data").resolve(f).toString): _*)
        .select(keyCol).distinct())
    }
    def visible(df: DataFrame, keys: Option[DataFrame]): DataFrame =
      keys.fold(df)(k => df.join(broadcast(k), Seq(keyCol), "left_anti"))
    val addVis = visible(readSet(toFiles -- fromFiles), dvKeys(to))
    val remVis = visible(readSet(fromFiles -- toFiles), dvKeys(from))
    val inserts = addVis.exceptAll(remVis)
    val deletes = remVis.exceptAll(addVis)
    val newDvKeys = (dvKeys(to), dvKeys(from)) match {
      case (Some(t), Some(f)) => Some(t.join(f, Seq(keyCol), "left_anti"))
      case (Some(t), None) => Some(t)
      case _ => None
    }
    val dvDeletes = newDvKeys.map(k =>
      readSet(fromFiles.intersect(toFiles))
        .join(broadcast(k), Seq(keyCol), "left_semi"))
    val tagged = inserts.withColumn("_change_type", lit("insert"))
      .unionAll(deletes.withColumn("_change_type", lit("delete")))
    dvDeletes.fold(tagged)(d =>
      tagged.unionAll(d.withColumn("_change_type", lit("delete"))))
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

/** The declared-query face of [[ManifestTable]]: the orders table
  * rebuilt as a manifest table (built ONCE per fixture snapshot in the
  * fingerprint-keyed [[ArtifactCache]]) through the full lifecycle —
  * initial snapshot (even order keys, 4 files), append (odd keys,
  * 2 files), compaction (1 file) — then read back through the
  * protocol. The oracles read the ORIGINAL parquet: value equality
  * through the manifest lifecycle IS the assertion.
  */
object ManifestOps extends QueryGroup {

  /** Build the lifecycle table, return its root. v1 = even keys,
    * v2 = +odd keys, v3 = compaction of v2.
    */
  private[graft] def lifecycleRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.appendCommit(root, ManifestTable.stage(
        orders.filter(col("o_orderkey") % 2 === 0).repartition(4),
        root, "base"))
      val v2 = ManifestTable.appendCommit(root, ManifestTable.stage(
        orders.filter(col("o_orderkey") % 2 === 1).repartition(2),
        root, "delta"))
      val v3 = ManifestTable.compact(spark, root, v2, orders.schema, 1)
      require(v1 == 1 && v2 == 2 && v3 == 3,
        s"manifest lifecycle built versions ($v1,$v2,$v3), expected (1,2,3)")
      Files.createFile(root.resolve("_SUCCESS")) // ArtifactCache marker
    }
    Paths.get(out)
  }

  /** The copy-on-write lifecycle: v1 = orders range-laid into 8
    * stats-carrying files; v2 = a band-scoped MERGE (update prices in
    * [max/4, max/2), delete that band's %19 keys) that rewrites ONLY
    * the stats-admitted files. The band covers ~a quarter of the
    * keyspace, so most of v1's files survive into v2 verbatim —
    * Wave87Spec asserts that file-identity, the actual copy-on-write
    * claim.
    */
  private[graft] def cowRoot(spark: SparkSession, dir: String): Path = {
    // cache name carries a format generation: the r9 per-column stats
    // encoding (path\tcol:min:max,…) is not parseable by — or from —
    // the r8 single-key 3-field lines, so a new name forces a rebuild
    // instead of reading a stale-format cached root
    val out = ArtifactCache.path("manifest_orders_cow2",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      // two stat columns: o_orderkey is the range-layout key (tight
      // per-file bands), o_custkey rides along so multi-predicate
      // prunes have a second recorded column to consult
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(8, col("o_orderkey")),
        root, "base", Seq("o_orderkey", "o_custkey")))
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val (lo, hi) = (mx / 4, mx / 2) // in-band: lo <= k < hi
      val v2 = ManifestTable.mergeCoW(spark, root, v1, orders.schema,
        "o_orderkey", lo, hi - 1) { df =>
        val inBand = col("o_orderkey") >= lo && col("o_orderkey") < hi
        df.filter(!(inBand && col("o_orderkey") % 19 === 0))
          .withColumn("o_totalprice",
            when(inBand, col("o_totalprice") + lit(1.0d))
              .otherwise(col("o_totalprice")))
      }
      require(v1 == 1 && v2 == 2,
        s"cow lifecycle built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** MERGE INTO lifecycle: v1 = orders range-laid into 8
    * stats-carrying files; v2 = one [[ManifestTable.upsert]] whose
    * update set carries BOTH matched keys (%17 keys in the bottom
    * quarter of the keyspace → full-row replace: status 'U', price
    * +5.0) and never-seen keys (%23 keys shifted above max →
    * inserts). The matched half sits in the bottom-quarter band, so
    * only ~2 of the 8 base files are touched — Wave120Spec asserts
    * the untouched files survive v2 by path identity, the
    * copy-on-write claim.
    */
  private[graft] def upsertRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_upsert",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(8, col("o_orderkey")),
        root, "base", "o_orderkey"))
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val upd = orders
        .filter(col("o_orderkey") % 17 === 0 && col("o_orderkey") < mx / 4)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(5.0d))
      // o_orderkey starts at 0 in the fixture: key 0's shifted image
      // would be 0+max = max, an EXISTING key (an update, not an
      // insert) — exclude it so the insert set is provably disjoint
      val ins = orders
        .filter(col("o_orderkey") % 23 === 0 && col("o_orderkey") > 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(mx))
        .withColumn("o_orderstatus", lit("N"))
      val v2 = ManifestTable.upsert(spark, root, v1, orders.schema,
        "o_orderkey", upd.unionByName(ins))
      require(v1 == 1 && v2 == 2,
        s"upsert lifecycle built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** SQL MERGE lifecycle (round 10 — r9-VERDICT task 2): the EXACT
    * [[upsertRoot]] update/insert sets, but driven by a `MERGE INTO …
    * WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
    * statement planned by [[graft.plans.ManifestDmlStrategy]] onto
    * [[ManifestTable.upsert]]. Same oracle as manifest_upsert —
    * equality proves the SQL surface is the programmatic op.
    */
  private[graft] def sqlMergeRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_sqlmerge",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(8, col("o_orderkey")),
        root, "base", "o_orderkey"))
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val upd = orders
        .filter(col("o_orderkey") % 17 === 0 && col("o_orderkey") < mx / 4)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(5.0d))
      val ins = orders
        .filter(col("o_orderkey") % 23 === 0 && col("o_orderkey") > 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(mx))
        .withColumn("o_orderstatus", lit("N"))
      upd.unionByName(ins).createOrReplaceTempView("manifest_sqlmerge_src")
      org.apache.spark.sql.graft.bridge.addStrategy(spark,
        graft.plans.ManifestDmlStrategy)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""MERGE INTO $cat.${sqlIdent(root)} t
           |USING manifest_sqlmerge_src s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val v2 = ManifestTable.latestVersion(root)
      require(v1 == 1 && v2 == 2,
        s"SQL MERGE lifecycle built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** SQL UPDATE + DELETE lifecycle: v1 = orders range-laid by
    * o_orderkey (8 stats-carrying files); v2 = `UPDATE … WHERE` a
    * bottom-quarter band (priority replaced, price +1.0 — CoW through
    * [[ManifestTable.updateWhereCoW]], only band-admitted files
    * rewritten); v3 = `DELETE FROM … WHERE` a top-quarter band
    * (SupportsDelete → [[ManifestTable.deleteWhereCoW]]). Both
    * statements are plain SQL through the V2 catalog.
    */
  private[graft] def sqlDmlRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_sqldml",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(8, col("o_orderkey")),
        root, "base", "o_orderkey"))
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      org.apache.spark.sql.graft.bridge.addStrategy(spark,
        graft.plans.ManifestDmlStrategy)
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"UPDATE $ident SET o_orderpriority = 'X-SQL', " +
        s"o_totalprice = o_totalprice + 1.0 " +
        s"WHERE o_orderkey % 5 = 0 AND o_orderkey < ${mx / 4}")
      spark.sql(s"DELETE FROM $ident " +
        s"WHERE o_orderkey >= ${3 * (mx / 4)} AND o_orderstatus = 'F'")
      val v3 = ManifestTable.latestVersion(root)
      require(v1 == 1 && v3 == 3,
        s"SQL DML lifecycle built versions ($v1,…,$v3), expected (1,2,3)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** ROW-POSITION DV lifecycle (round 10 — r9-VERDICT task 5): v1 =
    * orders in 8 stats-carrying range files; v2 = a DUPLICATE file
    * appended (every %7 key's full row again — same keys, same
    * values); v3 = a positional delete of the duplicate file's %3
    * rows by (file, row_index). The final table holds every original
    * row PLUS the surviving duplicates — a state no key-based or
    * key-scoped vector can express (deleting some copies of a key
    * while keeping others in the SAME table), which is exactly the
    * granularity gap the row-position form closes.
    */
  private[graft] def morPositionalRoot(spark: SparkSession, dir: String)
      : Path = {
    val out = ArtifactCache.path("manifest_orders_morr",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(8, col("o_orderkey")),
        root, "base", "o_orderkey"))
      val dupRel = ManifestTable.stage(
        orders.filter(col("o_orderkey") % 7 === 0).coalesce(1),
        root, "dup")
      require(dupRel.size == 1, s"dup stage produced $dupRel")
      val v2 = ManifestTable.appendCommit(root, dupRel)
      val positions = spark.read.schema(orders.schema)
        .parquet(root.resolve("data").resolve(dupRel.head).toString)
        .withColumn("pos", col("_metadata.row_index"))
        .filter(col("o_orderkey") % 3 === 0)
        .select(lit(dupRel.head).as("src"), col("pos"))
      val v3 = ManifestTable.deleteMORPositional(spark, root, positions)
      require(v1 == 1 && v2 == 2 && v3 == 3,
        s"positional-DV lifecycle built ($v1,$v2,$v3), expected (1,2,3)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** HIDDEN-PARTITIONING lifecycle (round 10 — r9-VERDICT task 6):
    * orders laid out by `bucket(16, o_custkey)` into 16 files whose
    * transform bounds ride the manifest as virtual per-file stats.
    * Deliberately NO plain stats on o_custkey — every custkey file
    * skip the queries achieve comes from the transform derivation
    * alone (a raw min/max on a high-cardinality scattered key would
    * admit everything; the bucket layout is what makes the key
    * prunable, which is the whole point of hidden partitioning).
    */
  private[graft] def hiddenRoot(spark: SparkSession, dir: String): Path = {
    // "hidden2": the first build committed no schema= meta and its
    // cached root would leak the layout column through the footer
    // fallback — name bumped to invalidate it
    val out = ArtifactCache.path("manifest_orders_hidden2",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val ts = Seq(ManifestTable.BucketTransform(16, "o_custkey"))
      // schema= meta pins the LOGICAL schema: the data files carry the
      // materialized __ptb16_o_custkey layout column, which must stay
      // hidden from every reader
      val v1 = ManifestTable.commit(root,
        ManifestTable.stageHidden(orders, root, "base", ts, files = 16),
        ManifestTable.transformsMeta(ts) +
          s" schema=${ManifestTable.schemaMeta(orders.schema)}")
      require(v1 == 1, s"hidden lifecycle built v$v1, expected 1")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** OPTIMIZE ZORDER lifecycle: v1 = orders range-laid by o_orderkey
    * only (8 files — each spans o_custkey's FULL range, the layout
    * under which any custkey predicate must scan everything); v2 = the
    * z-order rewrite interleaving (o_orderkey, o_custkey) into 8
    * hyper-rectangle files. Wave121Spec asserts the admitted-file
    * counts that make the layout worth paying for; the declared query
    * asserts the data survived the rewrite bit-for-bit.
    */
  private[graft] def zorderRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_zorder",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(8, col("o_orderkey")),
        root, "base", Seq("o_orderkey", "o_custkey")))
      val v2 = ManifestTable.optimizeZorder(spark, root, v1, orders.schema,
        Seq("o_orderkey", "o_custkey"), 8)
      require(v1 == 1 && v2 == 2,
        s"zorder lifecycle built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** STRING-stats lifecycle (wave 132): the part table as a manifest
    * table whose files are range-laid by p_brand and carry TYPED
    * per-file bounds — string (p_brand) plus long (p_partkey) — in two
    * append batches (even/odd part keys, both brand-range-laid, so
    * every file's brand band is narrow). The declared query prunes on
    * a lexicographic brand band; Wave132Spec asserts the physical
    * file skips.
    */
  private[graft] def strRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_part_str",
      Seq(s"$dir/part.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val part = Tables.table(spark, dir, "part")
      val v1 = ManifestTable.appendCommit(root,
        ManifestTable.stageWithTypedStats(
          part.filter(col("p_partkey") % 2 === 0)
            .repartitionByRange(6, col("p_brand")),
          root, "base", Seq("p_partkey"), Seq("p_brand")))
      val v2 = ManifestTable.appendCommit(root,
        ManifestTable.stageWithTypedStats(
          part.filter(col("p_partkey") % 2 === 1)
            .repartitionByRange(3, col("p_brand")),
          root, "odd", Seq("p_partkey"), Seq("p_brand")))
      require(v1 == 1 && v2 == 2,
        s"string-stats lifecycle built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** Streaming-SOURCE lifecycle: an append-only commit chain (v1..v4 =
    * orders quartered by o_orderkey % 4) plus a replay directory
    * holding each version's [[ManifestTable.readIncremental]] file
    * delta as ONE parquet file with (mtime, path) pinned to commit
    * order — Spark's file source processes files in that order, so
    * `maxFilesPerTrigger=1` turns each COMMIT into one deterministic
    * micro-batch. This is "stream a lakehouse table from version K"
    * driven through actual Structured Streaming, the source half
    * complementing stream_manifest_sink.
    */
  private[graft] def streamSrcRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_stream",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val vs = (0 to 3).map { r =>
        ManifestTable.appendCommit(root, ManifestTable.stage(
          orders.filter(col("o_orderkey") % 4 === r).repartition(2),
          root, s"q$r"))
      }
      require(vs == Seq(1, 2, 3, 4), s"stream-source chain built $vs")
      val replay = root.resolve("replay")
      Files.createDirectories(replay)
      (1 to 4).foreach { v =>
        val tmp = root.resolve(s".rtmp$v")
        ManifestTable.readIncremental(spark, root, v - 1, v, orders.schema)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val s = Files.list(tmp)
        val part =
          try s.filter(p => p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          finally s.close()
        val dst = replay.resolve(f"d$v%02d.parquet")
        Files.move(part, dst)
        // fixed, strictly increasing mtimes (any constant base works —
        // only the ORDER matters to the file source)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            1000000000000L + v * 1000L))
        val rest = Files.list(tmp)
        try rest.forEach(p => Files.delete(p)) finally rest.close()
        Files.delete(tmp)
      }
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** ADD COLUMN lifecycle: v1 = even-key orders under a 3-column
    * schema; v2 = odd-key append under the WIDENED 4-column schema
    * (o_orderpriority added). No v1 data file is rewritten — the
    * column addition is metadata-only (the `schema=` header meta is
    * the schema log), and readers of v2 null-fill the new column for
    * v1's files via parquet's explicit-schema missing-column
    * semantics.
    */
  private[graft] def evoRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_evo",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val s1 = orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val v1 = ManifestTable.appendCommit(root,
        ManifestTable.stage(s1.repartition(2), root, "base"),
        s"schema=${ManifestTable.schemaMeta(s1.schema)}")
      val s2 = orders.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
      val v2 = ManifestTable.appendCommit(root,
        ManifestTable.stage(s2.repartition(2), root, "widen"),
        s"schema=${ManifestTable.schemaMeta(s2.schema)}")
      require(v1 == 1 && v2 == 2,
        s"evolution lifecycle built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** COLUMN-MAPPING lifecycle (wave 136): v1 = even-key orders under a
    * 3-column schema; v2 = odd-key append under the widened 4-column
    * schema (the evo lifecycle's ADD COLUMN); v3 = metadata-only
    * RENAME o_totalprice→o_price (zero body, zero rewritten bytes —
    * files keep the physical name); v4 = an append AFTER the rename
    * (%5 keys shifted above max, price +1000) staged through
    * [[ManifestTable.stageEvolved]] so its files carry the physical
    * name; v5 = metadata-only DROP o_custkey. The declared query reads
    * the result under the final logical schema; Wave136Spec asserts
    * the zero-rewrite claims file-by-file.
    */
  private[graft] def evo2Root(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_evo2",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val s1 = orders.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val v1 = ManifestTable.appendCommit(root,
        ManifestTable.stage(s1.repartition(2), root, "base"),
        s"schema=${ManifestTable.schemaMeta(s1.schema)}")
      val s2 = orders.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority")
      val v2 = ManifestTable.appendCommit(root,
        ManifestTable.stage(s2.repartition(2), root, "widen"),
        s"schema=${ManifestTable.schemaMeta(s2.schema)}")
      val v3 = ManifestTable.renameColumn(root, "o_totalprice", "o_price")
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val s4 = orders
        .filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") > 0)
        .select((col("o_orderkey") + mx).as("o_orderkey"),
          col("o_custkey"),
          (col("o_totalprice") + lit(1000.0d)).as("o_price"),
          col("o_orderpriority"))
      val v4 = ManifestTable.appendCommit(root,
        ManifestTable.stageEvolved(s4.repartition(1), root, "late", v3),
        ManifestTable.evolutionMeta(root, v3))
      val v5 = ManifestTable.dropColumn(root, "o_custkey")
      require(Seq(v1, v2, v3, v4, v5) == Seq(1, 2, 3, 4, 5),
        s"colmap lifecycle built ($v1,$v2,$v3,$v4,$v5), expected 1..5")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** Merge-on-read lifecycle: v1 = orders range-laid with stats; v2 =
    * a DELETION-VECTOR commit (keys %13 — writes only the sidecar,
    * zero data files rewritten); v3 = compactMOR materializing the
    * view. Wave103Spec asserts the zero-rewrite and read-equivalence
    * claims the oracle can't see.
    */
  private[graft] def morRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_mor2",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(4, col("o_orderkey")),
        root, "base", "o_orderkey"))
      val v2 = ManifestTable.deleteMOR(root,
        orders.filter(col("o_orderkey") % 13 === 0).select("o_orderkey"))
      val v3 = ManifestTable.compactMOR(spark, root, v2, orders.schema,
        "o_orderkey", 4)
      require(v1 == 1 && v2 == 2 && v3 == 3,
        s"mor lifecycle built versions ($v1,$v2,$v3), expected (1,2,3)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** Positional (file-scoped) MOR lifecycle: v1 = orders range-laid
    * with stats; v2 = a SCOPED deletion-vector commit (%13 keys,
    * provenance-resolved to their files, zero rewrites); v3 = an
    * append that RE-INSERTS a subset of the deleted keys (%13 ∧ %3) —
    * the case that distinguishes positional from key-predicate
    * deletes: the re-inserted rows live in a new file no vector
    * scopes, so they survive the read while the originals stay dead.
    */
  private[graft] def morScopedRoot(spark: SparkSession, dir: String): Path = {
    val out = ArtifactCache.path("manifest_orders_morp",
      Seq(s"$dir/orders.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val orders = Tables.table(spark, dir, "orders")
      val v1 = ManifestTable.commit(root, ManifestTable.stageWithStats(
        orders.repartitionByRange(4, col("o_orderkey")),
        root, "base", "o_orderkey"))
      val v2 = ManifestTable.deleteMORScoped(spark, root,
        orders.filter(col("o_orderkey") % 13 === 0).select("o_orderkey"),
        "o_orderkey", orders.schema)
      val v3 = ManifestTable.appendCommit(root, ManifestTable.stage(
        orders.filter(col("o_orderkey") % 13 === 0
          && col("o_orderkey") % 3 === 0).coalesce(1), root, "reinsert"))
      require(v1 == 1 && v2 == 2 && v3 == 3,
        s"scoped-mor lifecycle built versions ($v1,$v2,$v3), expected (1,2,3)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    Paths.get(out)
  }

  /** Per-invocation scratch root for the streaming-sink table: the
    * WRITE is the operation under test, so it cannot be cached — but
    * pid-keyed scratch must not accumulate across JVM runs (the r6/r8
    * ADVICE pattern), so the whole pid dir is removed on JVM exit and
    * the previous invocation's run dir is removed as each new one
    * starts.
    */
  private val sinkRuns = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]
  private lazy val sinkBase: Path = {
    val p = Paths.get("/tmp/graft_mfsink", s"p${ProcessHandle.current().pid()}")
    sys.addShutdownHook(deleteTree(p))
    p
  }
  private def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteTree(_)) finally s.close()
      }
      Files.delete(p)
    }
  private def freshSinkRoot(dir: String, tag: String = ""): Path = {
    val key = tag + dir.replaceAll("[^A-Za-z0-9.]", "_")
    val n = sinkRuns.getOrElseUpdate(key,
      new java.util.concurrent.atomic.AtomicLong(0)).incrementAndGet()
    deleteTree(sinkBase.resolve(s"${key}_r${n - 1}"))
    val p = sinkBase.resolve(s"${key}_r$n")
    Files.createDirectories(p)
    p
  }

  def queries = Map(
    "source_manifest" -> { (spark, dir) =>
      // LATEST snapshot (post-append, post-compaction) must equal the
      // source table row-for-row: the append added the complement and
      // the compaction rewrote without loss.
      val orders = Tables.table(spark, dir, "orders")
      val root = lifecycleRoot(spark, dir)
      ManifestTable.read(spark, root,
          ManifestTable.latestVersion(root), orders.schema)
        .orderBy("o_orderkey")
    },

    "source_manifest_timetravel" -> { (spark, dir) =>
      // PINNED read of snapshot v1 AFTER two later commits rewrote the
      // table around it: time travel must surface exactly the initial
      // even-key batch — proof that later snapshots never leak into a
      // pinned version.
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.read(spark, lifecycleRoot(spark, dir), 1, orders.schema)
        .orderBy("o_orderkey")
    },

    "source_manifest_merge" -> { (spark, dir) =>
      // latest snapshot of the COPY-ON-WRITE lifecycle: a band-scoped
      // keyed merge (price bump + partial delete over [max/4, max/2))
      // applied by rewriting only the files whose key stats intersect
      // the band. The oracle restates the merged table from the
      // ORIGINAL parquet — equality proves both the merge semantics
      // and that skipping stats-disjoint files lost nothing.
      val orders = Tables.table(spark, dir, "orders")
      val root = cowRoot(spark, dir)
      ManifestTable.read(spark, root,
          ManifestTable.latestVersion(root), orders.schema)
        .orderBy("o_orderkey")
    },

    "source_manifest_incremental" -> { (spark, dir) =>
      // incremental consumption of the append v1→v2: exactly the files
      // the append commit added (the odd-key delta batch), never the
      // base — the "stream a lakehouse table from version K" primitive.
      // Wave88Spec additionally proves the guard refuses the range
      // across v3's compaction, where file-level deltas are undefined.
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.readIncremental(spark, lifecycleRoot(spark, dir),
          1, 2, orders.schema)
        .orderBy("o_orderkey")
    },

    "source_manifest_pruned" -> { (spark, dir) =>
      // stats-pruned point-range read over the CoW table's latest
      // snapshot: the key band [max/10, max/5] admits only the files
      // whose recorded bounds intersect it — Wave91Spec asserts the
      // scan's inputFiles are a strict subset. The band sits outside
      // the merge band, so the oracle is the plain source filter.
      val orders = Tables.table(spark, dir, "orders")
      val root = cowRoot(spark, dir)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      ManifestTable.readPruned(spark, root,
          ManifestTable.latestVersion(root), orders.schema,
          "o_orderkey", mx / 10, mx / 5)
        .orderBy("o_orderkey")
    },

    "source_manifest_pruned2" -> { (spark, dir) =>
      // TWO-predicate stats prune over the cow table's per-column
      // bounds (the r9 FileEntry generalization): files are admitted
      // only when BOTH the o_orderkey band and the o_custkey band
      // intersect their recorded stats — Wave108Spec asserts the
      // physical inputFiles are a strict subset. Rows re-filter
      // exactly, so the oracle is the plain two-predicate source
      // filter (orderkey band below the merge band).
      val orders = Tables.table(spark, dir, "orders")
      val root = cowRoot(spark, dir)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val mxC = orders.agg(max("o_custkey")).head().getLong(0)
      ManifestTable.readPrunedMulti(spark, root,
          ManifestTable.latestVersion(root), orders.schema,
          Seq(("o_orderkey", mx / 10, mx / 5), ("o_custkey", 0L, mxC / 2)))
        .orderBy("o_orderkey")
    },

    "manifest_upsert" -> { (spark, dir) =>
      // latest snapshot of the MERGE INTO lifecycle: one keyed upsert
      // whose update frame carried full-row replacements (bottom-
      // quarter %17 keys: status 'U', price +5.0) AND inserts (%23
      // keys shifted above max, status 'N'). The oracle restates the
      // merged state from the original parquet — equality proves the
      // matched/not-matched split, the full-row replace, and that
      // skipping stats-disjoint files lost nothing (the file-identity
      // half is Wave120Spec's plan-level assertion).
      val orders = Tables.table(spark, dir, "orders")
      val root = upsertRoot(spark, dir)
      ManifestTable.read(spark, root,
          ManifestTable.latestVersion(root), orders.schema)
        .orderBy("o_orderkey")
    },

    "source_manifest_v1api" -> { (spark, dir) =>
      // the manifest table read through Spark's STANDARD source API
      // (spark.read.format("graft-manifest"), registered by short name
      // via META-INF/services) — version-pinned to the pre-merge
      // snapshot, with a key-band filter that reaches the per-file
      // stats as file skipping (Wave126Spec asserts the admitted-file
      // counts). Pinned v1 = the source table verbatim, so the oracle
      // is the plain band filter.
      val orders = Tables.table(spark, dir, "orders")
      val root = cowRoot(spark, dir)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.read.format("graft-manifest")
        .option("path", root.toString).option("version", "1").load()
        .filter(col("o_orderkey") >= mx / 20 && col("o_orderkey") <= mx / 10)
        .orderBy("o_orderkey")
    },

    "sink_manifest_v1api" -> { (spark, dir) =>
      // round-trip through the REGISTERED source API's write path:
      // orders written with df.write.format("graft-manifest") in two
      // halves (append mode, stats on o_orderkey — each append an
      // O(delta) commit), read back through spark.read with a pushed
      // band filter riding the written stats. Equality with the plain
      // band filter proves the SaveMode mapping committed exactly
      // once per write and the written stats compose with the read
      // path's file skipping (Wave126Spec asserts the skip itself).
      val orders = Tables.table(spark, dir, "orders")
      val root = freshSinkRoot(dir, tag = "v1w_")
      def w(df: DataFrame) = df.write.format("graft-manifest")
        .option("path", root.toString)
        .option("statsColumns", "o_orderkey").mode("append").save()
      w(orders.filter(col("o_orderkey") % 2 === 0)
        .repartitionByRange(4, col("o_orderkey")))
      w(orders.filter(col("o_orderkey") % 2 === 1)
        .repartitionByRange(2, col("o_orderkey")))
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.read.format("graft-manifest").option("path", root.toString)
        .load()
        .filter(col("o_orderkey") >= mx / 10 && col("o_orderkey") <= mx / 5)
        .orderBy("o_orderkey")
    },

    "source_manifest_zorder" -> { (spark, dir) =>
      // 2-predicate stats-pruned read over the Z-ORDERED layout: after
      // the (o_orderkey, o_custkey) Morton rewrite each file's bands
      // are narrow in BOTH columns, so the conjunctive prune admits
      // roughly the product of the band fractions — Wave121Spec
      // asserts the admitted-file counts (z-layout beats the range
      // layout on the same predicate). Rows re-filter exactly, so the
      // oracle is the plain two-predicate source filter.
      val orders = Tables.table(spark, dir, "orders")
      val root = zorderRoot(spark, dir)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      val mxC = orders.agg(max("o_custkey")).head().getLong(0)
      ManifestTable.readPrunedMulti(spark, root,
          ManifestTable.latestVersion(root), orders.schema,
          Seq(("o_orderkey", mx / 8, mx / 4), ("o_custkey", 0L, mxC / 4)))
        .orderBy("o_orderkey")
    },

    "source_manifest_pruned_str" -> { (spark, dir) =>
      // STRING-band stats prune (wave 132 — the format's long-only
      // stats gap closed): the lexicographic brand band
      // ['Brand#12','Brand#19'] admits only the files whose recorded
      // p_brand bounds intersect it — Wave132Spec asserts the physical
      // inputFiles are a strict subset of the live set. Rows re-filter
      // exactly, so the oracle is the plain string-band filter on the
      // source table (pure-ASCII values: binary order everywhere).
      val part = Tables.table(spark, dir, "part")
      val root = strRoot(spark, dir)
      ManifestTable.readPrunedStr(spark, root,
          ManifestTable.latestVersion(root), part.schema,
          "p_brand", "Brand#12", "Brand#19")
        .orderBy("p_partkey")
    },

    "source_manifest_v1api_str" -> { (spark, dir) =>
      // the string-stats table read through the REGISTERED source API
      // with a brand EQUALITY filter: the V1 relation turns the pushed
      // string predicate into file skipping via the per-file string
      // bounds (wave 135 — Wave135Spec asserts the admitted-file
      // counts), and Spark re-applies the filter row-exactly, so the
      // oracle is the plain equality filter on the source table.
      val root = strRoot(spark, dir)
      spark.read.format("graft-manifest").option("path", root.toString)
        .load()
        .filter(col("p_brand") === "Brand#21")
        .orderBy("p_partkey")
    },

    "source_manifest_schema_evolution" -> { (spark, dir) =>
      // latest snapshot of the ADD COLUMN lifecycle read under ITS
      // recorded schema: v1's 3-column files null-fill the column v2
      // added, zero bytes rewritten — metadata-only evolution. The
      // oracle restates the null-fill from the original parquet.
      val root = evoRoot(spark, dir)
      ManifestTable.readEvolved(spark, root,
          ManifestTable.latestVersion(root))
        .orderBy("o_orderkey")
    },

    "source_manifest_colmap" -> { (spark, dir) =>
      // COLUMN MAPPING (wave 136): latest snapshot of the rename/drop
      // lifecycle read under its final logical schema (o_orderkey,
      // o_price, o_orderpriority) — pre-rename files alias their
      // physical o_totalprice to o_price, the post-rename append wrote
      // physical names via stageEvolved, and the dropped o_custkey is
      // projected away with zero bytes rewritten (Wave136Spec asserts
      // the files are untouched). The oracle restates all three
      // batches from the source table.
      val root = evo2Root(spark, dir)
      ManifestTable.readEvolved(spark, root,
          ManifestTable.latestVersion(root))
        .orderBy("o_orderkey")
    },

    "ivm_manifest_delta" -> { (spark, dir) =>
      // incremental VIEW maintenance off the manifest's file deltas:
      // the stored view (v1's per-priority count/revenue aggregate,
      // built once per fixture snapshot into the ArtifactCache — the
      // persisted materialized view) is refreshed to v2 by folding in
      // ONLY the appended files' rows via readIncremental — the base
      // data is never rescanned (Wave93Spec asserts the delta plan's
      // inputFiles). Works because count/sum are self-maintainable
      // under inserts; the oracle restates the refreshed view from the
      // source table.
      import graft.Canon
      val orders = Tables.table(spark, dir, "orders")
      val root = lifecycleRoot(spark, dir)
      def viewOf(df: DataFrame): DataFrame = df
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(Canon.Dec)).as("rev"))
      val stored = ArtifactCache(spark, "mf_view_v1",
        Seq(s"$dir/orders.parquet")) {
        viewOf(ManifestTable.read(spark, root, 1, orders.schema))
      }
      val delta = viewOf(
        ManifestTable.readIncremental(spark, root, 1, 2, orders.schema))
      stored.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(sum("n").as("n"), Canon.decRound4(sum("rev")).as("rev"))
        .orderBy("o_orderpriority")
    },

    "source_manifest_mor" -> { (spark, dir) =>
      // merge-on-READ deletes: v2 committed ONLY a deletion vector
      // (write cost = |deleted keys|, zero files rewritten —
      // Wave103Spec asserts the file identity); this read pays the
      // broadcast anti-join instead. The oracle restates the deletes
      // from the source table.
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.readMOR(spark, morRoot(spark, dir), 2,
          orders.schema, "o_orderkey")
        .orderBy("o_orderkey")
    },

    "ivm_manifest_cow_delta" -> { (spark, dir) =>
      // view maintenance ACROSS a copy-on-write merge — the case
      // ivm_manifest_delta's append-only guard refuses: the change set
      // is derived from the FILE diff (rows of the replacement files
      // minus rows of the replaced files — inserts, updates and
      // DELETES all land as one signed delta), so the refresh scans
      // only the merge band's files, never the table. The stored v1
      // view (ArtifactCache) plus signed partials per priority: count
      // via ±1, revenue via ±price — associative, so this is exactly
      // the ivm_retract algebra fed by CoW file lineage. Wave97Spec
      // asserts the refresh never touches a surviving file.
      import graft.Canon
      val orders = Tables.table(spark, dir, "orders")
      val root = cowRoot(spark, dir)
      val v1Files = ManifestTable.filesFor(root, 1).toSet
      val v2Files = ManifestTable.filesFor(root, 2).toSet
      def readFiles(fs: Set[String]): DataFrame =
        spark.read.schema(orders.schema).parquet(
          fs.toSeq.sorted.map(f =>
            root.resolve("data").resolve(f).toString): _*)
      def signed(df: DataFrame, sign: Int): DataFrame = df
        .groupBy("o_orderpriority")
        .agg((count(lit(1)) * sign).as("n"),
          (sum(col("o_totalprice").cast(Canon.Dec)) * sign).as("rev"))
      val stored = ArtifactCache(spark, "mf_cow_view_v1",
        Seq(s"$dir/orders.parquet")) {
        signed(ManifestTable.read(spark, root, 1, orders.schema), 1)
      }
      val adds = signed(readFiles(v2Files -- v1Files), 1)
      val dels = signed(readFiles(v1Files -- v2Files), -1)
      stored.unionByName(adds).unionByName(dels)
        .groupBy("o_orderpriority")
        .agg(sum("n").as("n"), Canon.decRound4(sum("rev")).as("rev"))
        .orderBy("o_orderpriority")
    },

    "source_manifest_mor_scoped" -> { (spark, dir) =>
      // POSITIONAL (file-scoped) deletion vectors — the real formats'
      // DV shape, closing the key-predicate form's re-insert edge:
      // v2 deleted the %13 keys as (key, src-file) pairs; v3
      // re-inserted the %13∧%3 subset in a NEW file. The scoped read
      // keeps the re-inserted rows alive while the originals stay
      // dead — a key-based DV would wrongly subtract both
      // (Wave117Spec proves the contrast directly).
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.readMORScoped(spark, morScopedRoot(spark, dir), 3,
          orders.schema, "o_orderkey")
        .orderBy("o_orderkey")
    },

    "ivm_manifest_cdf" -> { (spark, dir) =>
      // view maintenance driven by the CHANGE FEED across the WHOLE
      // version chain — the general form that retires both special
      // cases: ivm_manifest_delta rides only append-only ranges
      // (readIncremental's guard) and ivm_manifest_cow_delta
      // hand-rolls one merge's file diff; this query folds
      // readChanges deltas v1→v2→v3 (append, then compaction) into
      // the stored v1 view with the ivm_retract signed algebra —
      // inserts +1/+price, deletes −1/−price. The compaction step
      // contributes ZERO rows by the feed's exceptAll cancellation,
      // so the refresh rides rewrites without rescanning anything
      // (Wave115Spec's empty-feed law is exactly what makes IVM
      // log-driven instead of rewrite-aware).
      import graft.Canon
      val orders = Tables.table(spark, dir, "orders")
      val root = lifecycleRoot(spark, dir)
      def signedChanges(from: Int, to: Int): DataFrame = {
        val ch = ManifestTable.readChanges(spark, root, from, to,
          orders.schema, "o_orderkey")
        val sign = when(col("_change_type") === "insert", 1L)
          .otherwise(-1L)
        ch.groupBy("o_orderpriority")
          .agg(sum(sign).as("n"),
            sum(col("o_totalprice").cast(Canon.Dec) * sign).as("rev"))
      }
      val stored = ArtifactCache(spark, "mf_view_v1",
        Seq(s"$dir/orders.parquet")) {
        ManifestTable.read(spark, root, 1, orders.schema)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(Canon.Dec)).as("rev"))
      }
      val last = ManifestTable.latestVersion(root)
      (2 to last).map(v => signedChanges(v - 1, v))
        .foldLeft(stored.select(col("o_orderpriority"),
          col("n").cast("long").as("n"), col("rev")))(
          (acc, d) => acc.unionByName(d))
        .groupBy("o_orderpriority")
        .agg(sum("n").as("n"), Canon.decRound4(sum("rev")).as("rev"))
        .orderBy("o_orderpriority")
    },

    "cdf_manifest" -> { (spark, dir) =>
      // row-level CHANGE DATA FEED across the copy-on-write merge —
      // the case the file-level readIncremental refuses: the v1→v2
      // feed derives from the merge's file lineage alone (removed ∪
      // rewritten files; Wave115Spec asserts the physical inputFiles
      // never touch a surviving file) and surfaces the update as
      // delete(old image) + insert(new image) pairs, the %19 band
      // deletes as bare deletes, and NOTHING for the untouched rows
      // that merely rode along in rewritten files (the exceptAll
      // cancellation). The oracle restates both images from the
      // source table.
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.readChanges(spark, cowRoot(spark, dir), 1, 2,
          orders.schema, "o_orderkey")
        .orderBy("o_orderkey", "_change_type")
    },

    "cdf_manifest_mor" -> { (spark, dir) =>
      // the change feed's DELETION-VECTOR path: v1→v2 of the MOR
      // lifecycle commits no file change at all (zero-body delta
      // manifest), so the feed is pure deletes — the surviving files'
      // rows killed by the new vector, surfaced via one broadcast
      // semi-join on the DV keys.
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.readChanges(spark, morRoot(spark, dir), 1, 2,
          orders.schema, "o_orderkey")
        .orderBy("o_orderkey")
    },

    "manifest_replicate" -> { (spark, dir) =>
      // CDC REPLICATION — the full consume-produce pipeline the
      // format's pieces were built for: source (the CoW lifecycle) →
      // change feed → transactional apply → mirror table. Bootstrap
      // copies v1 under batch id 1 (exactly-once ledger, stats-
      // carrying so later provenance scans prune); the v1→v2 delta
      // applies as (a) the feed's deletes as SCOPED vectors —
      // provenance resolved against the mirror's PRE-batch files —
      // then (b) the feed's inserts as batch-id-2 append. Order is
      // the point: an update's delete half can only scope to old
      // files, so its re-inserted image in the new file survives —
      // exactly why the positional DV form exists (a key-based apply
      // would erase the update's new image too). The declared result
      // reads the mirror back; equality with the merged-state oracle
      // proves the replication end to end. Cost rides the delta: the
      // feed reads only changed source files, the apply writes only
      // the sidecar + the insert batch.
      val orders = Tables.table(spark, dir, "orders")
      val src = cowRoot(spark, dir)
      val mirror = freshSinkRoot(dir, tag = "repl_")
      ManifestTable.commitBatch(
        ManifestTable.read(spark, src, 1, orders.schema)
          .repartitionByRange(4, col("o_orderkey")),
        mirror, batchId = 1L, statsKey = Some("o_orderkey"))
      val ch = ManifestTable.readChanges(spark, src, 1, 2,
        orders.schema, "o_orderkey")
      ManifestTable.deleteMORScoped(spark, mirror,
        ch.filter(col("_change_type") === "delete").select("o_orderkey"),
        "o_orderkey", orders.schema)
      ManifestTable.commitBatch(
        ch.filter(col("_change_type") === "insert").drop("_change_type"),
        mirror, batchId = 2L, statsKey = Some("o_orderkey"))
      ManifestTable.readMORScoped(spark, mirror,
          ManifestTable.latestVersion(mirror), orders.schema, "o_orderkey")
        .orderBy("o_orderkey")
    },

    "stream_manifest_source" -> { (spark, dir) =>
      // Structured Streaming FROM the manifest format through the
      // REGISTERED source (round 10 — r9-VERDICT task 3; until round
      // 9 this was a replay-directory harness): offsets are commit
      // versions, each micro-batch one readIncremental file delta,
      // and maxVersionsPerTrigger=1 makes each COMMIT of the v1..v4
      // chain one micro-batch under Trigger.AvailableNow — the
      // SupportsTriggerAvailableNow pacing Wave144Spec asserts on
      // real micro-batch execution (4 batches, none empty, offsets =
      // versions). The stateful Complete-mode aggregate over the
      // stream must equal the batch aggregate over the table's latest
      // snapshot — the oracle restates it from the source table.
      import graft.Canon
      val root = streamSrcRoot(spark, dir)
      val st = spark.readStream.format("graft-manifest")
        .option("path", root.toString)
        .option("maxVersionsPerTrigger", "1")
        .load()
      val agg = st.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(Canon.Dec)).as("rev0"))
        .select(col("o_orderpriority"), col("n"),
          Canon.decRound4(col("rev0")).as("rev"))
      Streaming.runToMemory(spark, agg,
          org.apache.spark.sql.streaming.OutputMode.Complete())
        .orderBy("o_orderpriority")
    },

    "stream_manifest_sink" -> { (spark, dir) =>
      // Structured Streaming INTO the manifest format: each micro-batch
      // (3 deterministic ones via the shared 3-file replay) is one
      // atomic snapshot commit carrying its batch id; a replayed batch
      // — foreachBatch's at-least-once delivery contract — hits the
      // manifest's batch ledger and no-ops, the transactional-sink
      // half of exactly-once. The declared result is the final table
      // read back through the protocol; equality with the batch events
      // oracle proves no batch was lost OR double-committed. No
      // watermark: the sink appends raw rows, so even the c_late
      // straggler file lands (contrast stream_late_drop, where the
      // stateful operator evicts it).
      val root = freshSinkRoot(dir)
      val st = Streaming.lateReplayStream(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts_us"))
      val q = st.writeStream
        .foreachBatch((b: DataFrame, id: Long) =>
          ManifestTable.commitBatch(b, root, id): Unit)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ManifestTable.read(spark, root,
          ManifestTable.latestVersion(root), StructType(st.schema.fields))
        .orderBy("event_id")
    },

    "source_manifest_v2api" -> { (spark, dir) =>
      // the manifest table consumed through the DataSourceV2 CATALOG
      // in PLAIN SQL (round 10 — r9-VERDICT task 1): the TableCatalog
      // plugin resolves the identifier to the table directory,
      // `VERSION AS OF 1` pins the pre-merge snapshot through the V2
      // time-travel loadTable hook, and the pushed key band reaches
      // the per-file stats as file skipping through the V2
      // ScanBuilder → V1Scan bridge (Wave142Spec asserts the admitted
      // set equals readPrunedMulti's). Pinned v1 = the source table
      // verbatim, so the oracle is the plain band filter.
      val orders = Tables.table(spark, dir, "orders")
      val root = cowRoot(spark, dir)
      val cat = sqlCatalog(spark)
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)} VERSION AS OF 1
           |WHERE o_orderkey >= ${mx / 6} AND o_orderkey <= ${mx / 3}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "sink_manifest_v2sql" -> { (spark, dir) =>
      // the full SQL write lifecycle through the catalog: CREATE
      // TABLE … USING graft-manifest (the v1 schema commit) with
      // statsColumns as a TABLE PROPERTY, two INSERT INTO halves
      // (each an O(delta) append commit whose staged files carry
      // per-file key stats — SQL writes compose with the stats
      // consumers without per-write options), then a band SELECT
      // whose pushed filter rides those written stats. Equality with
      // the plain band filter proves exactly-once commits per INSERT.
      val orders = Tables.table(spark, dir, "orders")
      val root = freshSinkRoot(dir, tag = "v2sql_")
      val cat = sqlCatalog(spark)
      val ident = s"$cat.${sqlIdent(root)}"
      spark.sql(s"CREATE TABLE $ident (${orders.schema.toDDL}) " +
        "USING `graft-manifest` TBLPROPERTIES ('statsColumns' = 'o_orderkey')")
      orders.createOrReplaceTempView("orders_v2sql_src")
      spark.sql(s"INSERT INTO $ident " +
        "SELECT * FROM orders_v2sql_src WHERE o_orderkey % 2 = 0")
      spark.sql(s"INSERT INTO $ident " +
        "SELECT * FROM orders_v2sql_src WHERE o_orderkey % 2 = 1")
      val mx = orders.agg(max("o_orderkey")).head().getLong(0)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $ident
           |WHERE o_orderkey >= ${mx / 8} AND o_orderkey <= ${mx / 4}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "source_manifest_hidden_partition" -> { (spark, dir) =>
      // HIDDEN PARTITIONING through the registered source: the table
      // is laid out by bucket(16, o_custkey) and carries NO plain
      // custkey stats, yet a plain `o_custkey = k` filter skips
      // files — the source derives the virtual bucket band from the
      // recorded ptrans meta at plan time (Wave147Spec asserts the
      // admitted-file count; this query asserts exactness). The user
      // never names the layout: that is the "hidden" in hidden
      // partitioning.
      val orders = Tables.table(spark, dir, "orders")
      val root = hiddenRoot(spark, dir)
      val ck = orders.agg(min("o_custkey")).head().getLong(0)
      spark.read.format("graft-manifest")
        .option("path", root.toString).load()
        .filter(col("o_custkey") === ck)
        .orderBy("o_orderkey")
    },

    "source_manifest_mor_positional" -> { (spark, dir) =>
      // ROW-POSITION deletion vectors (the real formats' bitmap
      // granularity): a duplicate file's %3 rows die by (file,
      // row_index) while the identical originals in the base files
      // survive — key-based and key-scoped vectors cannot express
      // this state at all (Wave146Spec proves the one-of-two-copies
      // contrast directly). The registered source takes the same
      // branch, so spark.read sees the subtracted view too.
      val orders = Tables.table(spark, dir, "orders")
      ManifestTable.readMORPositional(spark,
          morPositionalRoot(spark, dir), 3, orders.schema)
        .orderBy("o_orderkey")
    },

    "manifest_sql_merge" -> { (spark, dir) =>
      // the manifest_upsert lifecycle driven by a plain-SQL
      // `MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
      // THEN INSERT *` (round 10 — r9-VERDICT task 2):
      // ManifestDmlStrategy intercepts the analyzed statement before
      // Spark's built-in planning rejects it and hands it to
      // ManifestTable.upsert — same touched-file discovery, same
      // serializable-writer publish. The oracle is manifest_upsert's
      // verbatim: equality proves the SQL surface IS the programmatic
      // op (Wave143Spec asserts row identity directly as well).
      val root = sqlMergeRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |ORDER BY o_orderkey""".stripMargin)
    },

    "manifest_sql_update_delete" -> { (spark, dir) =>
      // SQL UPDATE then SQL DELETE over the catalog table, both
      // copy-on-write with stats-banded touched sets: the UPDATE's
      // bottom-quarter band and the DELETE's top-quarter band each
      // rewrite only the admitted files (Wave143Spec asserts the
      // untouched files survive by path). The final state is read
      // back through the same SQL surface.
      val root = sqlDmlRoot(spark, dir)
      val cat = sqlCatalog(spark)
      spark.sql(
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |  o_orderdate, o_orderpriority
           |FROM $cat.${sqlIdent(root)}
           |ORDER BY o_orderkey""".stripMargin)
    }
  )

  /** One session-wide SQL catalog over /tmp: every lifecycle root
    * (ArtifactCache, sink scratch) lives under it, so a single
    * `gm.<dir-segments...>` identifier reaches any table the declared
    * queries build — the catalog itself is stateless (a table IS its
    * directory).
    */
  private def sqlCatalog(spark: SparkSession): String = {
    val cat = "gm"
    if (!spark.conf.getOption(s"spark.sql.catalog.$cat")
        .contains("graft.sources.ManifestCatalog")) {
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.sources.ManifestCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", "/tmp")
    }
    cat
  }

  /** /tmp-relative identifier of a table root, each segment quoted. */
  private def sqlIdent(root: Path): String = {
    val rel = Paths.get("/tmp").relativize(root.toAbsolutePath)
    (0 until rel.getNameCount)
      .map(i => s"`${rel.getName(i)}`").mkString(".")
  }

  def oracle = Map(
    "source_manifest_v2api" ->
      // pinned v1 is the source table verbatim; the band re-filters
      // exactly (file skip asserted by Wave142Spec)
      """WITH b AS (SELECT max(o_orderkey) // 6 AS lo,
        |    max(o_orderkey) // 3 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "sink_manifest_v2sql" ->
      // both INSERT halves together are the whole table; the band
      // re-filters exactly
      """WITH b AS (SELECT max(o_orderkey) // 8 AS lo,
        |    max(o_orderkey) // 4 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_hidden_partition" ->
      // the bucket-derived file skip is a superset admit; the exact
      // filter re-applies, so the result is the plain equality
      """WITH b AS (SELECT min(o_custkey) AS ck FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_custkey = ck
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_mor_positional" ->
      // originals all survive; duplicates survive only outside %3
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_merge" ->
      // manifest_upsert's oracle verbatim — the SQL MERGE must land
      // the exact state the programmatic upsert lands
      """WITH b AS (SELECT max(o_orderkey) AS m,
        |    max(o_orderkey) // 4 AS q FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN o_totalprice + 5.0 ELSE o_totalprice END
        |      AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  UNION ALL
        |  SELECT o_orderkey + m, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey % 23 = 0 AND o_orderkey > 0)
        |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,

    "manifest_sql_update_delete" ->
      // the UPDATE's CASE image minus the DELETE's band — restated
      // from the source table
      """WITH b AS (SELECT max(o_orderkey) // 4 AS q,
        |    3 * (max(o_orderkey) // 4) AS h FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 AND o_orderkey < q
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate,
        |  CASE WHEN o_orderkey % 5 = 0 AND o_orderkey < q
        |       THEN 'X-SQL' ELSE o_orderpriority END AS o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE NOT (o_orderkey >= h AND o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest" ->
      // oracle reads the ORIGINAL parquet — equality across the
      // append + compaction lifecycle IS the assertion
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "source_manifest_timetravel" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_merge" ->
      // the merged state restated from the source table: same integer
      // band bounds (max//4, max//2), same one IEEE price add, same
      // band-scoped delete predicate
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= lo AND o_orderkey < hi
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE NOT (o_orderkey >= lo AND o_orderkey < hi
        |           AND o_orderkey % 19 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_incremental" ->
      // v2's appended files carry exactly the odd-key batch
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned" ->
      // the prune band lies below the merge band → rows unchanged; the
      // file-skip claim itself is Wave91Spec's plan-level assertion
      """WITH b AS (SELECT max(o_orderkey) // 10 AS lo,
        |    max(o_orderkey) // 5 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned2" ->
      // both bands restated from the source table; the file-skip claim
      // is Wave108Spec's plan-level assertion
      """WITH b AS (SELECT max(o_orderkey) // 10 AS lo,
        |    max(o_orderkey) // 5 AS hi,
        |    (SELECT max(o_custkey) // 2 FROM orders) AS hic
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |  AND o_custkey >= 0 AND o_custkey <= hic
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_pruned_str" ->
      // the string band restated on the source table (both engines
      // compare pure-ASCII brands in binary order); the file-skip
      // claim itself is Wave132Spec's plan-level assertion
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |  p_retailprice
        |FROM part
        |WHERE p_brand >= 'Brand#12' AND p_brand <= 'Brand#19'
        |ORDER BY p_partkey""".stripMargin,

    "source_manifest_v1api_str" ->
      // the equality restated on the source table; the file-skip claim
      // is Wave135Spec's plan-level assertion
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
        |  p_retailprice
        |FROM part WHERE p_brand = 'Brand#21'
        |ORDER BY p_partkey""".stripMargin,

    "manifest_upsert" ->
      // the merged state restated from the source table: matched keys
      // (%17, bottom quarter) carry the replaced image, everything
      // else survives, and the %23 insert images land above max
      """WITH b AS (SELECT max(o_orderkey) AS m,
        |    max(o_orderkey) // 4 AS q FROM orders),
        |merged AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |    CASE WHEN o_orderkey % 17 = 0 AND o_orderkey < q
        |         THEN o_totalprice + 5.0 ELSE o_totalprice END
        |      AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  UNION ALL
        |  SELECT o_orderkey + m, o_custkey, 'N', o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey % 23 = 0 AND o_orderkey > 0)
        |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,

    "source_manifest_v1api" ->
      // pinned v1 is the source table verbatim; the band re-filters
      // exactly and the file-skip claim is Wave126Spec's assertion
      """WITH b AS (SELECT max(o_orderkey) // 20 AS lo,
        |    max(o_orderkey) // 10 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "sink_manifest_v1api" ->
      // both write halves together are the whole table; the band
      // re-filters exactly
      """WITH b AS (SELECT max(o_orderkey) // 10 AS lo,
        |    max(o_orderkey) // 5 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_zorder" ->
      // both bands restated from the source table; the admitted-file
      // claim is Wave121Spec's plan-level assertion
      """WITH b AS (SELECT max(o_orderkey) // 8 AS lo,
        |    max(o_orderkey) // 4 AS hi,
        |    (SELECT max(o_custkey) // 4 FROM orders) AS hic
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey >= lo AND o_orderkey <= hi
        |  AND o_custkey >= 0 AND o_custkey <= hic
        |ORDER BY o_orderkey""".stripMargin,

    "source_manifest_schema_evolution" ->
      // even keys predate the ADD COLUMN → null o_orderpriority
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
        |    AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "source_manifest_colmap" ->
      // the three batches restated: pre-rename evens (null priority,
      // price = o_totalprice), odds, and the post-rename shifted %5
      // append (price +1000.0, the same IEEE add on both engines)
      """WITH b AS (SELECT max(o_orderkey) AS m FROM orders)
        |SELECT o_orderkey, o_totalprice AS o_price,
        |  CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice AS o_price, o_orderpriority
        |FROM orders WHERE o_orderkey % 2 = 1
        |UNION ALL
        |SELECT o_orderkey + m AS o_orderkey,
        |  o_totalprice + 1000.0 AS o_price, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE o_orderkey % 5 = 0 AND o_orderkey > 0
        |ORDER BY o_orderkey""".stripMargin,

    "ivm_manifest_delta" ->
      // the refreshed view == the full aggregate over the source (v2's
      // content is the whole table); sums staged in exact decimal
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "stream_manifest_source" ->
      // the streamed Complete-mode aggregate over the 4-commit chain
      // == the batch aggregate over the whole table (v4's content)
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "source_manifest_mor" ->
      // the DV subtraction restated from the source table
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    "ivm_manifest_cow_delta" ->
      // the refreshed view == the aggregate over the MERGED state,
      // restated from the source table (same band/delete/price rules
      // as source_manifest_merge)
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders),
        |m AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderkey >= lo AND o_orderkey < hi
        |         THEN o_totalprice + 1.0 ELSE o_totalprice END AS p
        |  FROM orders CROSS JOIN b
        |  WHERE NOT (o_orderkey >= lo AND o_orderkey < hi
        |             AND o_orderkey % 19 = 0))
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(p AS DECIMAL(18,6))), 4) AS DOUBLE) AS rev
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "source_manifest_mor_scoped" ->
      // survivors = everything outside %13, plus the re-inserted
      // %13∧%3 copies (identical source rows in a new file)
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 3 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "ivm_manifest_cdf" ->
      // the CDF-refreshed view == the full aggregate over the source
      // (v3's content is the whole table); sums staged in exact
      // decimal — same restatement as ivm_manifest_delta, reached
      // through the general log-driven path
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 4)
        |    AS DOUBLE) AS rev
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "cdf_manifest" ->
      // the merge's change set restated from the source table: every
      // band row emits its pre-image as a delete; surviving band rows
      // (%19 ≠ 0) also emit the post-image (+1.0 price) as an insert
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders),
        |i AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders CROSS JOIN b
        |  WHERE o_orderkey >= lo AND o_orderkey < hi)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, 'delete' AS _change_type
        |FROM i
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice + 1.0, o_orderdate, o_orderpriority, 'insert'
        |FROM i WHERE o_orderkey % 19 <> 0
        |ORDER BY o_orderkey, _change_type""".stripMargin,

    "cdf_manifest_mor" ->
      // pure deletes: the DV commit killed the %13 keys
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority, 'delete' AS _change_type
        |FROM orders WHERE o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin,

    "manifest_replicate" ->
      // the mirror equals the source's merged state — identical
      // restatement to source_manifest_merge's oracle
      """WITH b AS (SELECT max(o_orderkey) // 4 AS lo,
        |    max(o_orderkey) // 2 AS hi FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= lo AND o_orderkey < hi
        |       THEN o_totalprice + 1.0 ELSE o_totalprice END
        |    AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders CROSS JOIN b
        |WHERE NOT (o_orderkey >= lo AND o_orderkey < hi
        |           AND o_orderkey % 19 = 0)
        |ORDER BY o_orderkey""".stripMargin,

    "stream_manifest_sink" ->
      // all three replay files land (no watermark on the append sink);
      // equality proves no batch lost, none double-committed
      """SELECT event_id, user_id, event_type, value,
        |  epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin
  )
}
