package graft

/** JVM brute-force ground truth for the round-3 text-pipeline queries —
  * independent of both Spark expressions and the DuckDB oracle.
  */
class TextPipelineSpec extends SparkSpec {

  private def sha56(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 7).foldLeft(0L)((v, i) => (v << 8) | (d(i) & 0xffL))
  }

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  private def shingles(text: String): Set[String] = {
    val t = text.split(" ", -1)
    (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
  }

  test("text_contamination == brute-force best eval match") {
    val evalSets = docs.filter(_._1 % 100 == 0)
      .map { case (id, text, _, _) => (id, shingles(text)) }
    val truth = docs.filter(_._1 % 100 != 0).flatMap { case (id, text, _, _) =>
      val sh = shingles(text)
      val overlaps = evalSets
        .map { case (eid, es) => (eid, (sh & es).size.toLong) }
        .filter(_._2 > 0)
      if (overlaps.isEmpty) None
      else {
        val best = overlaps.minBy { case (eid, n) => (-n, eid) }
        Some((id, best._1, best._2))
      }
    }.sortBy(_._1)
    val got = q("text_contamination").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == truth.toSeq)
  }

  test("sample_stratified == brute-force hash-rate filter, correlated with sample_hash") {
    val truth = docs.flatMap { case (id, _, lang, source) =>
      val bucket = sha56(id.toString) % 100
      val rate = if (lang == "en") 20 else if (lang == "de" || lang == "fr") 10 else 4
      if (bucket < rate) Some((id, lang, source, bucket)) else None
    }.sortBy(_._1)
    val got = q("sample_stratified").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == truth.toSeq)
    // strata share the bucket definition with sample_hash: every
    // stratified row with bucket < 10 must also be in the 10% sample
    val tenPct = q("sample_hash").collect().map(_.getLong(0)).toSet
    got.filter(_._4 < 10).foreach { case (id, _, _, _) =>
      assert(tenPct(id), s"doc $id in stratified bucket<10 but not sample_hash")
    }
  }

  test("text_rep facets are internally consistent") {
    q("text_rep").collect().foreach { r =>
      val (total, distinct, maxRep) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(distinct <= total && maxRep >= 1 && maxRep <= total - distinct + 1)
      val ratio = r.getDouble(4)
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }
}
