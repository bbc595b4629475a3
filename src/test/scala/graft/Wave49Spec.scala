package graft

import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Round-7 wave 49: the iterative BPE trainer vs a from-scratch JVM
  * implementation of the same convention (greedy left-to-right merge,
  * max-count rule, lexicographic tiebreak).
  */
class Wave49Spec extends SparkSpec {

  test("bpe_train: 3 rounds match a brute-force trainer exactly") {
    // independent implementation on symbol VECTORS (no string encoding),
    // so it also cross-checks the paren-encoding's boundary safety
    val wc = mutable.Map.empty[List[String], Long]
    Tables.table(spark, sfDir, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .foreach { w =>
        val k = w.map(_.toString).toList
        wc(k) = wc.getOrElse(k, 0L) + 1L
      }
    val merges = mutable.Buffer.empty[(String, String, Long)]
    for (_ <- 1 to 3) {
      val pc = mutable.Map.empty[(String, String), Long]
      wc.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case List(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      val ((l, r), c) = pc.toSeq
        .sortBy { case ((a, b), n) => (-n, a + "+" + b) }.head
      merges += ((l, r, c))
      val snapshot = wc.toSeq
      wc.clear()
      snapshot.foreach { case (syms, n) =>
        val out = mutable.ListBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += s
        }
        val k = out.toList
        wc(k) = wc.getOrElse(k, 0L) + n
      }
    }
    val got = q("bpe_train").collect()
    assert(got.length == 3)
    got.zipWithIndex.foreach { case (row, i) =>
      val (l, r, c) = merges(i)
      assert(row.getAs[String]("l") == l && row.getAs[String]("r") == r
        && row.getAs[Long]("c") == c,
        s"round ${i + 1}: got (${row.getAs[String]("l")}," +
          s"${row.getAs[String]("r")},${row.getAs[Long]("c")})" +
          s" want ($l,$r,$c)")
      assert(row.getAs[String]("merged") == l + r)
    }
  }
}
