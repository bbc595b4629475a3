package graft

import java.nio.file.{Files, Path, Paths}

/** Spec-staleness guard (r8 VERDICT item 7, the Wave63/Wave68 lesson):
  * when a declared query is redesigned or renamed, older waves' specs
  * that still reference the previous key keep passing silently — or
  * worse, keep testing semantics the declared inventory no longer
  * ships. This meta-spec closes the gap cheaply: every query key any
  * spec references (`q("…")` / `queries("…")`) must resolve through
  * SparkEntry.queries, and every declared query must have an oracle or
  * be on the explicit rows-only list — so a rename/retire breaks the
  * build instead of orphaning its tests.
  */
class StalenessGuardSpec extends SparkSpec {

  private def scalaFiles(dir: Path): Seq[Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    Files.walk(dir).forEach(p =>
      if (p.toString.endsWith(".scala")) out += p)
    out.toSeq
  }

  test("every query key referenced by any spec resolves through " +
    "SparkEntry.queries") {
    val ref = """(?:\bq|queries)\("([a-z0-9_]+)"""".r
    val declared = SparkEntry.queries.keySet
    val testRoot = Paths.get("src/test/scala/graft")
    assume(Files.isDirectory(testRoot), "run from the repo root")
    val bad = scalaFiles(testRoot).flatMap { f =>
      val src = new String(Files.readAllBytes(f), "UTF-8")
      ref.findAllMatchIn(src).map(_.group(1)).toSeq.distinct
        .filterNot(declared)
        .map(k => s"${f.getFileName}: $k")
    }
    assert(bad.isEmpty,
      s"specs reference retired/renamed query keys:\n  ${bad.mkString("\n  ")}")
  }

  test("declared queries and oracles stay aligned: every oracle key " +
    "is declared, and every declared query has an oracle or a " +
    "documented rows-only reason") {
    val declared = SparkEntry.queries.keySet
    val withOracle = SparkEntry.oracleSql.keySet
    val phantom = withOracle -- declared
    assert(phantom.isEmpty, s"oracles for undeclared queries: $phantom")
    // rows-only by declared design (each with a named spec as oracle
    // substitute — see SURVEY.md §2-final)
    val rowsOnly = Set(
      "agg_approx_distinct", "agg_approx_quantile", "agg_hll_merge",
      "agg_topk_approx", "profile_columns_approx",
      "multimodal_features", "multimodal_frame_sample",
      "text_compressibility", "dedup_ncd")
    val missing = declared -- withOracle -- rowsOnly
    assert(missing.isEmpty,
      s"declared queries with neither oracle nor rows-only entry: $missing")
    val stale = rowsOnly -- declared
    assert(stale.isEmpty, s"rows-only list names retired queries: $stale")
  }
}
