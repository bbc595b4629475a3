package graft

import org.apache.spark.sql.functions._

/** Round-8 wave 104: the compression-ratio quality screen — direct
  * JVM deflate recompute (the oracle substitute for a rows-only op)
  * and the monotonicity laws that make the heuristic meaningful.
  */
class Wave104Spec extends SparkSpec {

  private def deflateLen(s: String): Long = {
    val raw = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  test("text_compressibility matches a direct JVM deflate per doc and " +
    "covers the corpus exactly once") {
    // record the zlib environment next to the numbers (r8 VERDICT item
    // 4): deflate byte counts are zlib-version-dependent, so if a
    // future environment shifts them, this line names the suspect
    info(s"zlib pin: ${graft.operators.TextDedup.zlibEnvPin}")
    val got = q("text_compressibility").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toMap
    val docs = Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val (raw, defl, ratio, flag) = got(id)
      assert(raw == text.getBytes("UTF-8").length)
      assert(defl == deflateLen(text), s"doc $id deflate mismatch")
      val expect = math.floor(defl.toDouble / raw * 1e6 + 0.5) / 1e6
      assert(ratio == expect)
      assert(flag == (if (ratio < 0.35) "repetitive"
        else if (ratio > 0.9) "incompressible" else "ok"))
    }
  }

  test("the heuristic's laws: repetition compresses, randomness does " +
    "not, and concatenating a doc with itself lowers the ratio") {
    val rep = Array.fill(200)("the same token again").mkString(" ")
    val rng = new scala.util.Random(42)
    val rnd = Array.fill(800)(rng.nextPrintableChar()).mkString
    def ratio(s: String) = deflateLen(s).toDouble / s.getBytes("UTF-8").length
    assert(ratio(rep) < 0.1, s"repetitive text should crush: ${ratio(rep)}")
    assert(ratio(rnd) > 0.7, s"near-random text should resist: ${ratio(rnd)}")
    val doc = Tables.table(spark, sfDir, "documents")
      .select("text").head().getString(0)
    assert(ratio(doc + " " + doc) < ratio(doc),
      "self-concatenation must compress better than the original")
  }
}
