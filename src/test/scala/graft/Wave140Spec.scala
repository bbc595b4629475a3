package graft

import graft.operators.ManifestTable
import graft.operators.ManifestTable.FileEntry
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Round-9 wave 140: PROPERTY layer for the manifest encoding — the
  * invariants waves 132-139 rely on, over generated inputs (fixed
  * seeds, deterministic): entry-line round-trip under arbitrary
  * unicode bounds, descriptor round-trip, u8cmp ≡ Spark's own
  * UTF8String binary compare (the collation the string bounds were
  * recorded in), and segment aggregate bounds admitting every member
  * band (the superset law that makes list-level skipping lossless).
  */
class Wave140Spec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(1337L + i)))

  // unicode strings incl. separators, surrogate pairs, noncharacters
  private val genStr: Gen[String] = Gen.listOfN(6, Gen.frequency(
    (6, Gen.alphaNumChar),
    (2, Gen.oneOf(':', ',', '\t', '\n', '~', '\\', 'ü', '€')),
    (1, Gen.oneOf('\uffff', '\ufffe', '\ud800')) // lone surrogate too
  )).map(_.mkString)

  private val genPath: Gen[String] = for {
    a <- Gen.alphaNumStr.map(_.take(8)); n <- Gen.choose(0, 99999)
  } yield f"$a-$n%05d.parquet"

  private val genEntry: Gen[FileEntry] = for {
    p <- genPath
    nl <- Gen.choose(0, 3)
    ls <- Gen.listOfN(nl, for {
      c <- Gen.identifier.map(_.take(6).filter(_ != ':'))
      lo <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      w <- Gen.choose(0L, 1000000L)
    } yield (s"c$c", (lo, lo + w)))
    ns <- Gen.choose(0, 3)
    ss <- Gen.listOfN(ns, for {
      c <- Gen.identifier.map(_.take(6).filter(_ != ':'))
      a <- genStr; b <- genStr
    } yield (s"s$c",
      (if (ManifestTable.u8cmp(a, b) <= 0) (a, b) else (b, a))))
  } yield FileEntry(p,
    ls.distinctBy(_._1), ss.distinctBy(_._1))

  test("entry lines round-trip parseEntry for arbitrary unicode " +
    "bounds, separators and lone surrogates included") {
    samples(genEntry, 200).foreach { e =>
      val back = ManifestTable.parseEntry(e.line)
      // lone surrogates are replaced by UTF-8 transcoding (U+FFFD) —
      // compare through the same transcode the encoding itself uses
      def t(s: String) = new String(s.getBytes("UTF-8"), "UTF-8")
      assert(back.path == e.path)
      assert(back.stats == e.stats, s"long stats drifted for ${e.line}")
      assert(back.strStats == e.strStats.map { case (c, (a, b)) =>
        (c, (t(a), t(b))) }, s"string stats drifted for ${e.line}")
      // and re-serialization is a fixpoint
      assert(ManifestTable.parseEntry(back.line) == back)
    }
  }

  test("descriptor lines round-trip parseDesc with aggregate bounds") {
    samples(genEntry, 100).zipWithIndex.foreach { case (e, i) =>
      val seg = f"cpx$i-s0.parquet"
      val d = ManifestTable.descLine(seg, i + 1, e)
      val (s2, n2, b2) = ManifestTable.parseDesc(d)
      assert(s2 == seg && n2 == i + 1)
      assert(b2.stats == e.stats)
    }
  }

  test("u8cmp agrees in sign with Spark's UTF8String binary compare " +
    "on arbitrary (valid-UTF-8) strings") {
    import org.apache.spark.unsafe.types.UTF8String
    def t(s: String) = new String(s.getBytes("UTF-8"), "UTF-8")
    val pairs = samples(Gen.zip(genStr, genStr), 300)
    pairs.foreach { case (a0, b0) =>
      val (a, b) = (t(a0), t(b0))
      val ours = Integer.signum(ManifestTable.u8cmp(a, b))
      val sparks = Integer.signum(
        UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b)))
      assert(ours == sparks,
        s"u8cmp disagrees with UTF8String on (${a.codePoints().toArray
          .toSeq}, ${b.codePoints().toArray.toSeq})")
    }
  }

  test("segment aggregate bounds admit every member band (the " +
    "superset law behind lossless list-level skipping)") {
    val groups = samples(Gen.listOfN(5, genEntry), 40).filter(_.nonEmpty)
    groups.foreach { es =>
      val agg = ManifestTable.segmentBounds(es)
      es.foreach { e =>
        e.stats.foreach { case (c, (lo, hi)) =>
          assert(agg.mayContain(c, lo, hi),
            s"aggregate bounds exclude member band $c [$lo,$hi]") }
        e.strStats.foreach { case (c, (lo, hi)) =>
          assert(agg.mayContainStr(c, lo, hi),
            s"aggregate string bounds exclude member band $c") }
      }
    }
  }
}
