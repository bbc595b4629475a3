package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY.md §5.2.3 — property layer: algebraic invariants that need no
  * oracle, over fixture slices + ScalaCheck-generated inputs (fixed
  * seed — deterministic across runs).
  */
class PropertySpec extends SparkSpec {

  /** n deterministic samples from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("semi ∪ anti partitions customers for any priority filter") {
    val priorities =
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val customer = Tables.table(spark, sfDir, "customer")
    val orders = Tables.table(spark, sfDir, "orders")
    val total = customer.count()
    priorities.foreach { p =>
      val filt = orders.filter(col("o_orderpriority") === p)
      val semi = customer.join(filt,
        col("c_custkey") === col("o_custkey"), "left_semi").count()
      val anti = customer.join(filt,
        col("c_custkey") === col("o_custkey"), "left_anti").count()
      assert(semi + anti == total, s"priority $p")
    }
  }

  test("union count = sum of input counts for generated splits") {
    val orders = Tables.table(spark, sfDir, "orders")
    samples(Gen.choose(0.0, 500000.0), 5).foreach { cut =>
      val lo = orders.filter(col("o_totalprice") <= cut)
      val hi = orders.filter(col("o_totalprice") > cut)
      assert(lo.unionByName(hi).count() == orders.count())
    }
  }

  test("dedup group sizes sum to doc count for any hash prefix length") {
    val docs = Tables.table(spark, sfDir, "documents")
    samples(Gen.choose(4, 64), 5).foreach { n =>
      val grouped = docs
        .groupBy(substring(sha2(col("text"), 256), 1, n))
        .agg(count(lit(1)).as("c"))
      assert(grouped.agg(sum("c")).head().getLong(0) == docs.count())
    }
  }

  test("session islands are invariant to input row order") {
    // shuffle events (repartition scrambles order), sessionize, compare
    val base = q("win_session_batch").collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, sfDir).repartition(13)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val redo = ev.select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("brk", when(col("ts_us") - lag("ts_us", 1).over(w)
        >= 30L * 60 * 1000 * 1000 || lag("ts_us", 1).over(w).isNull, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum("brk").over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"))
      .orderBy("user_id", "session_id")
      .collect().map(_.toSeq).toSet
    assert(redo == base)
  }

  test("minhash candidate jaccard scores lie in [0, 1]") {
    val df = q("dedup_minhash")
    assert(df.count() > 0)
    assert(df.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("JaccardSorted == reference set Jaccard on random long sets") {
    import spark.implicits._
    val setGen = Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    val pairs = samples(Gen.zip(setGen, setGen), 60)
    def ref(a: Seq[Long], b: Seq[Long]): Double = {
      val inter = a.toSet.intersect(b.toSet).size
      inter.toDouble / (a.size + b.size - inter).toDouble // NaN for 0/0
    }
    val df = pairs.toDF("a", "b").select(
      graft.functions.JaccardSorted.jaccard(col("a"), col("b")).as("j"))
    val got = df.collect().map(_.getDouble(0))
    val want = pairs.map { case (a, b) => ref(a, b) }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w || (g.isNaN && w.isNaN),
        s"pair $i: expr=$g reference=$w inputs=${pairs(i)}")
    }
  }

  test("AsOfJoin == per-row linear scan on random skewed event data") {
    import spark.implicits._
    // few keys + coarse times → plenty of duplicate (key, time) stress
    val row = Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 30L))
    val lefts = samples(row, 80).zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) }
    val rights = samples(row, 80).map { case (k, t) => (k, t) }
    val l = lefts.toDF("k", "t", "row_id")
    val r = rights.toDF("rk", "rt")
    val joined = graft.plans.AsOfJoin
      .asofLeft(l, r, Seq("k" -> "rk"), "t", "rt", strict = true)
      .select("row_id", "rt").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    lefts.foreach { case (k, t, id) =>
      val want = rights.filter(rr => rr._1 == k && rr._2 < t)
        .map(_._2).sorted.lastOption
      assert(joined(id) == want,
        s"left (k=$k, t=$t): operator=${joined(id)} reference=$want")
    }
    assert(joined.size == lefts.size, "left-outer must keep every row")
  }

  test("TextDedup.ngramJaccardPairs matches brute force on random corpora") {
    // random word-soup docs over a tiny vocabulary (forces overlaps);
    // every emitted (pair, score) must equal the reference set-Jaccard
    // computed in plain Scala — inverted index, hashing, and rounding
    // must all be invisible
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.choose(3, 12).flatMap(k => Gen.listOfN(k, word))
    val docs = samples(doc, 30).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    def sh3(text: String): Set[String] = {
      val t = text.split(" ", -1)
      (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      xa = sh3(ta); xb = sh3(tb)
      inter = xa.intersect(xb).size if inter > 0
      j = math.floor(inter.toDouble / xa.union(xb).size * 1e6 + 0.5) / 1e6
      if j >= 0.05
    } yield ((ia, ib), j)).toMap
    val got = graft.operators.TextDedup.ngramJaccardPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", Seq.empty,
      n = 3, threshold = 0.05)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet,
      s"extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-9, s"$k") }
    assert(expected.nonEmpty, "generator must produce overlapping docs")
  }

  test("prefix-hamming banding is lossless on random noisy corpora") {
    // random base strings + mutated near-copies (0-4 substitutions on
    // the 48-prefix): the 3-segment pigeonhole join must recover
    // EXACTLY the brute-force hamming ≤ 2 pair set — including losing
    // the distance-3/4 mutants — on every generated corpus
    import spark.implicits._
    val alpha = Gen.oneOf('a', 'b', 'c')
    val base = Gen.listOfN(48, alpha).map(_.mkString)
    val corpora = samples(
      for {
        bases <- Gen.listOfN(8, base)
        muts <- Gen.listOfN(8, Gen.zip(
          Gen.choose(0, 7), Gen.choose(0, 4), Gen.listOf(Gen.zip(Gen.choose(0, 47), alpha))))
      } yield {
        val mutated = muts.map { case (src, nEdits, edits) =>
          edits.take(nEdits).foldLeft(bases(src)) { case (s, (pos, c)) =>
            s.updated(pos, c)
          }
        }
        (bases ++ mutated).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      }, 4)
    corpora.foreach { docs =>
      val brute = (for {
        (ia, pa) <- docs; (ib, pb) <- docs if ia < ib
        d = (0 until 48).count(k => pa(k) != pb(k)) if d <= 2
      } yield (ia, ib, d.toLong)).sortBy(x => (x._1, x._2))
      val df = docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      // run the declared query's pipeline over the generated corpus by
      // swapping the table read for a temp view is overkill — instead
      // reuse the same banding construction inline
      val d48 = df.select(col("doc_id"),
        rpad(substring(col("text"), 1, 48), 48, ".").as("p"))
      val segs = d48.select(col("doc_id"), col("p"),
        posexplode(array((0 until 3).map(i =>
          substring(col("p"), 1 + i * 16, 16)): _*)).as(Seq("seg", "segv")))
      val got = segs.as("x").join(segs.as("y"),
          col("x.seg") === col("y.seg") && col("x.segv") === col("y.segv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          graft.functions.HammingDist.hamming(col("x.p"), col("y.p")).as("d"))
        .filter(col("d") <= 2).dropDuplicates("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(got == brute)
    }
  }

  test("join_interval == brute-force overlap scan on the fixture intervals") {
    // recompute the declared query's pair set with a plain in-JVM double
    // loop over each customer's intervals — same [s, e) half-open
    // overlap definition, same integer day arithmetic
    val epochDay = java.time.LocalDate.of(1970, 1, 1)
    val orders = Tables.table(spark, sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map { r =>
        val s = java.time.temporal.ChronoUnit.DAYS.between(
          epochDay, r.getAs[java.time.LocalDateTime](2).toLocalDate)
        (r.getLong(0), r.getLong(1), s, s + (r.getLong(1) % 60) + 1)
      }
    val brute = orders.groupBy(_._1).values.flatMap { arr =>
      val os = arr.toSeq
      for {
        a <- os; b <- os
        if a._2 < b._2 && a._3 < b._4 && b._3 < a._4
      } yield (a._1, a._2, b._2, math.min(a._4, b._4) - math.max(a._3, b._3))
    }.toSet
    val got = q("join_interval").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute)
    assert(got.nonEmpty)
  }
}
