package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Group I, text half — LLM-data-pipeline text operators (SURVEY.md §2.I +
  * the north-star extension set): tokenization, stats, language-ID
  * heuristic, quality scoring, token counting, fingerprinting, and four
  * dedup families (exact hash, n-gram Jaccard, MinHash+LSH banding,
  * SimHash hamming).
  *
  * Operators are expressed in codegen-able expressions — built-ins plus
  * the native [[graft.functions.JaccardSorted]] merge-walk rescore — with
  * one deliberate exception: the [[sigTable]] mapPartitions signature
  * stage (a materialization barrier — see its doc). Everything is
  * oracle-checked against DuckDB, which requires *engine-independent*
  * hashing: tokens are hashed by taking the first 14 hex digits of
  * sha256 (56 bits, exact in both engines' int64), and MinHash/SimHash
  * are built from that with explicit integer arithmetic — no reliance on
  * either engine's internal `hash()`.
  *
  * Scale notes: all dedup candidate generation is shuffle-by-key
  * (hash/band/source), never all-pairs; the only quadratic step is within
  * a candidate bucket, which is the standard LSH trade. Per-doc hashing
  * pipelines inside the scan stage (one pass, no shuffle).
  */
object LlmText extends QueryGroup {

  /** Mersenne prime 2^31-1 for MinHash universal-hash arithmetic: keeps
    * every intermediate < 2^57, overflow-free in int64 on both engines.
    */
  private val P = 2147483647L

  /** tokens (all, with duplicates) and the distinct-token set. */
  private def toks(c: Column): Column = split(c, " ")

  /** 56-bit engine-independent token hash — the single definition lives
    * in the public [[TextDedup.hash56]]; minhash/simhash/bucketing here
    * and the library dedup API must never desynchronize.
    */
  private def tokHash56(t: Column): Column = TextDedup.hash56(t)

  private val tokHash56Sql =
    "CAST(concat('0x', substring(sha256(t), 1, 14)) AS BIGINT)"

  /** Stable 0..99 bucket of doc_id — the single definition behind
    * sample_hash and split_assign (they must stay correlated).
    */
  private def docBucket: Column = tokHash56(col("doc_id").cast("string")) % 100

  private val docBucketSql =
    "CAST(concat('0x', substring(sha256(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 100"

  /** docs with distinct tokens + 56-bit and mod-p hash lists. */
  private def withHashes(docs: DataFrame): DataFrame =
    docs
      .withColumn("dtoks", array_distinct(toks(col("text"))))
      .withColumn("hs56", transform(col("dtoks"), t => tokHash56(t)))
      .withColumn("hsp", transform(col("hs56"), h => h % P))

  private val withHashesSql =
    s"""SELECT *, list_distinct(string_split(text, ' ')) AS dtoks,
       |  list_transform(list_distinct(string_split(text, ' ')),
       |                 t -> $tokHash56Sql) AS hs56,
       |  list_transform(list_transform(list_distinct(string_split(text, ' ')),
       |                 t -> $tokHash56Sql), h -> h % $P) AS hsp
       |FROM documents""".stripMargin

  /** doc_id, source, dtoks + materialized MinHash(16) signature and
    * 48-bit SimHash. Token hashing stays in codegen'd sha2 expressions;
    * the signature loops run in a `mapPartitions` JVM loop — both ~100×
    * faster than interpreted nested lambdas AND a hard materialization
    * barrier, so self-joins downstream reuse the computed signatures
    * instead of re-evaluating them per candidate pair (measured: 38 s →
    * ~1 s at sf0.1 for dedup_simhash).
    * Arithmetic is identical to the oracle SQL: h_j(v) = ((2j+3)·v+5j+7)
    * mod p over (h56 mod p); simhash bit i set iff Σ±1 over bit i ≥ 0.
    */
  private def sigTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .withColumn("dtoks", array_distinct(toks(col("text"))))
      .withColumn("hs56", transform(col("dtoks"), t => tokHash56(t)))
      .select(col("doc_id"), col("source"), col("hs56"))
      .as[(Long, String, Array[Long])]
      .mapPartitions { it =>
        it.map { case (id, src, h) =>
          val mh = Array.tabulate(16) { j =>
            var m = Long.MaxValue
            var i = 0
            while (i < h.length) {
              val v = ((2 * j + 3) * (h(i) % P) + (5 * j + 7)) % P
              if (v < m) m = v
              i += 1
            }
            m
          }
          var sim = 0L
          var b = 0
          while (b < 48) {
            var cnt = 0
            var i = 0
            while (i < h.length) {
              if (((h(i) >> b) & 1L) == 1L) cnt += 1 else cnt -= 1
              i += 1
            }
            if (cnt >= 0) sim |= 1L << b
            b += 1
          }
          val shs = h.sorted // sorted distinct hashes → merge-walk set ops
          (id, src, shs, shs.length, mh, sim)
        }
      }
      .toDF("doc_id", "source", "shs", "nt", "mh", "simhash")
  }

  /** Jaccard over two SORTED distinct-hash arrays via a linear merge walk
    * (~100 ns/pair vs ~10 µs for interpreted array_intersect+array_union
    * hash-set builds) — the native codegen expression
    * [[graft.functions.JaccardSorted]] (was a Scala UDF; the expression
    * removes the per-pair Row↔JVM array copy and keeps the rescore stage
    * in whole-stage codegen). Exact equivalence to token-set Jaccard
    * holds because the 56-bit hash is injective on this corpus (asserted
    * in LlmOpsSpec); the double division inter/union is IEEE-identical
    * to the oracle's len()/CAST(len AS DOUBLE).
    */
  private def jacOfSorted(a: Column, b: Column): Column =
    graft.functions.JaccardSorted.jaccard(a, b)

  private val langWords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("join", "merge", "group"),
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("row", "table", "data"),
    "fr" -> Seq("key", "value", "sort"),
    "zh" -> Seq("scan", "filter", "batch"))

  def queries = Map(
    "text_tokenize" -> { (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .select(explode(toks(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },

    "text_stats" -> { (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          Canon.meanOf(col("n_chars")).as("avg_chars"),
          Canon.meanOf(size(toks(col("text"))).cast("long")).as("avg_tokens"))
        .orderBy("lang")
    },

    "text_langid" -> { (spark, dir) =>
      // n-gram/keyword-list language-ID heuristic: score per language =
      // matching distinct tokens; argmax with fixed alphabetic tie-break.
      val base = Tables.table(spark, dir, "documents")
        .withColumn("dtoks", array_distinct(toks(col("text"))))
      val scored = langWords.foldLeft(base) { case (df, (l, ws)) =>
        df.withColumn(s"s_$l",
          size(array_intersect(col("dtoks"), array(ws.map(lit): _*))).cast("long"))
      }
      val best = greatest(langWords.map { case (l, _) => col(s"s_$l") }: _*)
      val pred = langWords.foldRight(lit("und"): Column) { case ((l, _), els) =>
        when(col(s"s_$l") === best, lit(l)).otherwise(els)
      } // foldRight ⇒ first lang in order wins ties (de < en < es < fr < zh)
      scored
        .select((Seq(col("doc_id"), col("lang").as("true_lang"),
          pred.as("pred_lang")) ++
          langWords.map { case (l, _) => col(s"s_$l") }): _*)
        .orderBy("doc_id")
    },

    "text_quality" -> { (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .withColumn("n_tokens", size(toks(col("text"))).cast("long"))
        .withColumn("n_stop",
          size(array_intersect(array_distinct(toks(col("text"))),
            array(lit("the"), lit("a")))).cast("long"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          // avg token length: chars minus separators, over token count
          Canon.round6((col("n_chars") - (col("n_tokens") - 1))
            / col("n_tokens")).as("avg_tok_len"),
          Canon.round6(col("n_stop") / col("n_tokens")).as("stop_ratio"),
          Canon.round6(
            least(lit(1.0), col("n_tokens") / 50.0) * 0.5
              + (lit(1.0) - col("n_stop") / col("n_tokens")) * 0.3
              + least(lit(1.0),
                ((col("n_chars") - (col("n_tokens") - 1)) / col("n_tokens")) / 5.0)
              * 0.2).as("quality"))
        .orderBy("doc_id")
    },

    "text_token_count" -> { (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          size(toks(col("text"))).cast("long").as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
            .cast("long").as("re_tokens"))
        .orderBy("doc_id")
    },

    "dedup_cdc_chunks" -> { (spark, dir) =>
      // CONTENT-DEFINED CHUNKING dedup — the storage-style variant the
      // text family lacked: chunk boundaries fall where a 4-token
      // rolling hash ≡ 0 (mod 64), so insertions shift content WITHOUT
      // moving downstream boundaries (fixed-size chunking would
      // re-chunk everything after an edit — the whole reason CDC
      // exists in backup/dedup systems and long-doc pipelines).
      // Expected chunk ≈ 64 tokens. Everything is per-document ARRAY
      // arithmetic (no explode-then-window): boundary flags →
      // boundary positions → slice the token array per chunk — one
      // corpus map, then one groupBy on the chunk text. Mod-p Horner
      // over the token sha-56s, exact longs both engines.
      TextDedup.cdcChunks(Tables.table(spark, dir, "documents"))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_copies") > 1)
        .select(tokHash56(col("chunk")).as("fp"),
          size(toks(col("chunk"))).cast("long").as("n_toks"),
          col("n_copies"), col("n_docs"))
        .orderBy(col("n_copies").desc, col("fp"))
        .limit(20)
    },

    "text_fingerprint" -> { (spark, dir) =>
      // (a) order-insensitive bag fingerprint: sha256 of sorted distinct
      //     tokens; (b) order-SENSITIVE rolling polynomial hash over the
      //     full token stream (mod-p Horner fold) — reorderings collide
      //     on (a) but not (b).
      withHashes(Tables.table(spark, dir, "documents"))
        .select(col("doc_id"),
          sha2(concat_ws(" ", array_sort(col("dtoks"))), 256).as("bow_fp"),
          aggregate(
            transform(toks(col("text")), t => tokHash56(t) % P),
            lit(0L), (acc, h) => (acc * 31L + h) % P).as("roll_fp"))
        .orderBy("doc_id")
    },

    "split_assign" -> { (spark, dir) =>
      // deterministic 80/10/10 train/val/test assignment by stable key
      // hash (the sample_hash trick) — reproducible across engines, runs,
      // and cluster sizes, unlike rand()-based splits; per-(source, split)
      // facets verify both the assignment function and the balance. At
      // 100 TB: pure map + one partial-agg shuffle on 60 keys.
      Tables.table(spark, dir, "documents")
        .withColumn("split",
          when(docBucket < 80, lit("train"))
            .when(docBucket < 90, lit("val"))
            .otherwise(lit("test")))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source", "split")
    },

    "text_len_hist" -> { (spark, dir) =>
      // sequence-length histogram per lang in 10-token buckets — the
      // batch-packing / truncation-planning statistic; map + tiny agg
      Tables.table(spark, dir, "documents")
        .withColumn("n_tok", size(toks(col("text"))).cast("long"))
        .withColumn("len_bucket",
          (floor(col("n_tok") / 10.0) * 10).cast("long"))
        .groupBy("lang", "len_bucket")
        .agg(count(lit(1)).as("n_docs"),
          min("n_tok").as("min_tokens"),
          max("n_tok").as("max_tokens"))
        .orderBy("lang", "len_bucket")
    },

    "sample_hash" -> { (spark, dir) =>
      // deterministic 10% sample for pipeline subsetting: stable hash of
      // the key, NOT rand() — reproducible across engines, runs, and
      // cluster sizes (the only sane sampling at 100 TB)
      Tables.table(spark, dir, "documents")
        .withColumn("bucket", docBucket)
        .filter(col("bucket") < 10)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    "text_rep" -> { (spark, dir) =>
      // intra-document repetition (the Gopher/C4-style quality signal):
      // per doc, total vs distinct 3-gram shingles and the hottest
      // shingle's count — templated/looping docs score high. One JVM
      // pass per doc behind mapPartitions (shingling in lambdas hits the
      // O(L²) transform re-split trap); integer facets + one exact
      // double division keep it engine-reproducible.
      import spark.implicits._
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val t = text.split(" ", -1)
          if (t.length < 3) Iterator.empty
          else {
            val m = scala.collection.mutable.HashMap.empty[String, Int]
            var i = 0
            while (i + 2 < t.length) {
              val sh = t(i) + " " + t(i + 1) + " " + t(i + 2)
              m.update(sh, m.getOrElse(sh, 0) + 1)
              i += 1
            }
            Iterator.single((id, (t.length - 2).toLong, m.size.toLong,
              m.values.max.toLong))
          }
        })
        .toDF("doc_id", "n_shingles", "n_distinct", "max_rep")
        .withColumn("rep_ratio",
          Canon.round6(lit(1.0) - col("n_distinct") / col("n_shingles")))
        .select("doc_id", "n_shingles", "n_distinct", "max_rep", "rep_ratio")
        .orderBy("doc_id")
    },

    "text_tfidf" -> { (spark, dir) =>
      // top-3 characteristic terms per doc by tf × (N/df) — the term
      // relevance primitive behind topic filtering. The idf is the
      // LINEAR inverse document frequency, not ln(N/df): every factor is
      // then a small-integer ratio, bit-identical across engines (libm
      // log differs by ulps between engines and a ulp can cross the
      // round-6 boundary AND flip a rank tie; swapping ln back in is a
      // one-line change when cross-engine hashing is not a requirement).
      val docs = Tables.table(spark, dir, "documents")
      val nDocs = docs.count() // distributed count; one scalar to the driver
      val tf = docs.select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(dfc, "term")
        .withColumn("score", Canon.round6(col("tf") * (lit(nDocs) / col("df"))))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("term"))))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), col("tf"), col("score"))
        .orderBy("doc_id", "rank")
    },

    "text_bigram_lm" -> { (spark, dir) =>
      // Count-based bigram language model with add-one smoothing — the
      // classic n-gram LM table (the statistical ancestor of every
      // pretraining corpus): p(b|a) = (c_ab + 1) / (c_a + V). All inputs
      // are exact integers (pair counts, first-token totals, vocabulary
      // size), so the smoothed probability is one double division —
      // IEEE-identical cross-engine — rounded per the round-6 policy.
      // Plan: bigrams explode map-side (zip_with over two slices, no
      // shuffle), one (a,b) partial+final agg, c_a derived from c_ab by
      // a second tiny agg (never a re-scan), top-10 heads via
      // TakeOrderedAndProject (no global sort), broadcast back, per-head
      // top-5 window on ≤ 10 partitions.
      val docs = Tables.table(spark, dir, "documents")
      val t = toks(col("text"))
      val pairs = docs.select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
      val cab = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val ca = cab.groupBy("a").agg(sum("c_ab").as("c_a"))
      val vocab = docs.select(explode(t).as("tok")).distinct().count()
      val topA = ca.orderBy(col("c_a").desc, col("a")).limit(10)
      cab.join(broadcast(topA), "a")
        .withColumn("p", Canon.round6(
          (col("c_ab") + 1).cast("double")
            / (col("c_a") + lit(vocab)).cast("double")))
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("a")
            .orderBy(col("c_ab").desc, col("b"))))
        .filter(col("rnk") <= 5)
        .select(col("a"), col("rnk").cast("long").as("rnk"), col("b"),
          col("c_ab"), col("c_a"), col("p"))
        .orderBy("a", "rnk")
    },

    "text_vocab" -> { (spark, dir) =>
      // Per-language document-frequency vocabulary: top-10 tokens per
      // lang by the number of DISTINCT documents containing them — the
      // df table behind idf weighting and vocab pruning (text_tokenize
      // is raw term counts; this is presence). array_distinct runs
      // per-row BEFORE the explode, so the shuffle carries each
      // (doc, token) once however often the token repeats in the doc;
      // the per-lang top-10 is a WindowGroupLimit (map-side rank
      // pruning), never a global sort of the vocabulary.
      val dfc = Tables.table(spark, dir, "documents")
        .select(col("lang"),
          explode(array_distinct(toks(col("text")))).as("token"))
        .groupBy("lang", "token").agg(count(lit(1)).as("n_docs"))
      dfc.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("lang")
            .orderBy(col("n_docs").desc, col("token"))))
        .filter(col("rnk") <= 10)
        .select(col("lang"), col("rnk").cast("long").as("rnk"),
          col("token"), col("n_docs"))
        .orderBy("lang", "rnk")
    },

    "text_hashing_trick" -> { (spark, dir) =>
      // FEATURE HASHING (the "hashing trick"): token → one of D=64
      // buckets via the engine-independent 56-bit hash, with a ±1 sign
      // from the next hash bit so colliding tokens cancel in expectation
      // (Weinberger et al.'s signed variant). The point at 100 TB: the
      // feature space is FIXED-WIDTH — no vocabulary build, no global
      // dictionary shuffle, a brand-new token maps to a bucket
      // statelessly, so the op is a pure per-row map + one (doc, bucket)
      // partial agg. Emitted for the deterministic 1-in-97 doc sample
      // (the per-doc vectors are the product; the sample keeps the
      // driver compare bounded) — nothing in the plan depends on the
      // sample rate.
      val D = 64
      Tables.table(spark, dir, "documents")
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), explode(toks(col("text"))).as("t"))
        .withColumn("h", tokHash56(col("t")))
        .withColumn("bucket", col("h") % D)
        // `div` = exact integer division (the `/` Column operator would
        // route a 56-bit long through double and clip its low bits)
        .withColumn("sign",
          when(expr(s"(h div $D) % 2") === 0, lit(1L)).otherwise(lit(-1L)))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("n_tokens"), sum("sign").as("tf_signed"))
        .orderBy("doc_id", "bucket")
    },

    "text_contamination" -> { (spark, dir) =>
      // train/eval decontamination — the benchmark-leakage check every
      // LLM data pipeline runs before training: eval set = doc_id ≡ 0
      // (mod 100) (deterministic stand-in for a benchmark corpus), and
      // for every OTHER doc, its strongest eval match by shared distinct
      // 3-gram shingles. Shape: shingle postings equi-join where the
      // eval side is tiny (broadcast at any corpus size — benchmarks
      // don't grow with the crawl), partial-agg count per (train, eval)
      // pair, then a per-doc top-1 window (WindowGroupLimit prunes
      // map-side). Sub-quadratic for the same reason dedup_ngram is:
      // non-sharing pairs never materialize.
      import spark.implicits._
      val post = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val t = text.split(" ", -1)
          if (t.length < 3) Iterator.empty
          else {
            val set = new scala.collection.mutable.LinkedHashSet[String]
            var i = 0
            while (i + 2 < t.length) {
              set.add(t(i) + " " + t(i + 1) + " " + t(i + 2)); i += 1
            }
            set.iterator.map(sh => (id, sh))
          }
        }).toDF("doc_id", "sh")
        .select(col("doc_id"), TextDedup.hash56(col("sh")).as("h"))
      val evalPost = post.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("eval_id"), col("h"))
      post.filter(col("doc_id") % 100 =!= 0)
        .join(broadcast(evalPost), "h")
        .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("n_shared"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("n_shared").desc, col("eval_id"))))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("eval_id"), col("n_shared"))
        .orderBy("doc_id")
    },

    "sample_stratified" -> { (spark, dir) =>
      // stratified deterministic sampling (domain mixing): per-language
      // target rates — en 20%, de/fr 10%, rest 4% — applied through the
      // same stable doc_id hash bucket as sample_hash/split_assign, so
      // strata stay correlated with the splits and reproducible across
      // engines, runs, and cluster sizes. Pure map + filter at any scale.
      val rate = when(col("lang") === "en", 20)
        .when(col("lang").isin("de", "fr"), 10)
        .otherwise(4)
      Tables.table(spark, dir, "documents")
        .withColumn("bucket", docBucket)
        .filter(col("bucket") < rate)
        .select("doc_id", "lang", "source", "bucket")
        .orderBy("doc_id")
    },

    "dedup_exact" -> { (spark, dir) =>
      Tables.table(spark, dir, "documents")
        .groupBy(sha2(col("text"), 256).as("text_hash"))
        .agg(count(lit(1)).as("n_dup"), min(col("doc_id")).as("canonical_id"))
        .orderBy("text_hash")
    },

    "dedup_jaccard" -> { (spark, dir) =>
      // near-dup pairs among same-source docs: Jaccard ≥ 0.8 on distinct
      // token sets. Candidate generation is EXACT prefix filtering
      // (AllPairs/PPJoin; r2 VERDICT item 3), not all-pairs-within-source:
      // order every doc's tokens by a global rarity order (document
      // frequency asc, hash asc) and index only the first
      // |A| − ⌈t'·|A|⌉ + 1 tokens. For any pair with J ≥ t', the
      // globally-smallest common token provably lies in BOTH prefixes
      // (at most |A| − ⌈t'·|A|⌉ of A's tokens are outside B, since
      // J ≥ t' ⟹ |A∩B| ≥ ⌈t'·|A|⌉), so the equi-join of prefix postings
      // on (source, hash) is a lossless candidate superset — recall 1.0
      // by theorem, not by tuning. t' = 0.7999995 is the exact round-6
      // boundary of the declared 0.8 threshold (binRound: round6(J) ≥
      // 0.8 ⟺ J ≥ 0.7999995), so rounding can never sneak a pair past
      // the prefix bound. Work is Σc² over RARE-token posting lists —
      // the hot-token fan-out of a full inverted index never happens.
      // (sigTable feeds four branches of this plan; checkpointing it
      // once was measured at sf0.1 and does NOT help — 2.7 s either way,
      // the window ranking + joins dominate, not the re-hashing — so the
      // plan stays fully declarative)
      // r14: 64k-floor child session — the prefix-rank window and the
      // merge-walk rescore are CPU-dense over byte-small shuffles; the
      // 1m default serializes them (measured 2.55-2.75 s vs 1.15-1.41 s
      // in all three 32c A/B pairs — [[QueryGroup.cpuDenseSession]])
      val s2 = QueryGroup.cpuDenseSession(spark)
      val t = sigTable(s2, Tables.table(s2, dir, "documents"))
        .select(col("doc_id"), col("source"), col("shs"), col("nt"))
      val post = t.select(col("doc_id"), col("source"), col("nt"),
        explode(col("shs")).as("h"))
      val dfreq = post.groupBy("h").agg(count(lit(1)).as("df"))
      val prefix = post.join(dfreq, "h")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("doc_id").orderBy("df", "h")))
        .filter(col("rk") <= col("nt") - ceil(col("nt") * 0.7999995) + 1)
        .select("doc_id", "source", "nt", "h")
      val cand = prefix.as("x").join(prefix.as("y"),
          col("x.source") === col("y.source")
            && col("x.h") === col("y.h")
            && col("x.doc_id") < col("y.doc_id")
            // lossless size prefilter: J ≥ 0.8 ⟹ min/max ≥ 0.8 ⟺ 5·min ≥ 4·max
            && col("x.nt") * 5 >= col("y.nt") * 4
            && col("y.nt") * 5 >= col("x.nt") * 4)
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      // exact rescore: sigTable's sorted hash sets + the codegen merge
      // walk (the mapPartitions barrier keeps Catalyst from re-inlining
      // array_distinct(split(...)) per candidate pair)
      cand
        .join(t.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
        .join(t.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          Canon.round6(jacOfSorted(col("sa"), col("sb"))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
        .orderBy("doc_a", "doc_b")
    },

    "dedup_ngram" -> { (spark, dir) =>
      // word-3-gram (shingle) Jaccard — ORDER-sensitive near-dup, unlike
      // dedup_jaccard's token-SET form: reordered docs share tokens but
      // not shingles. Delegates to the parameterized library API
      // [[TextDedup.ngramJaccardPairs]] (exact inverted-index plan; see
      // its doc for the plan rationale and the two measured traps:
      // transform-lambda re-splitting and the all-pairs candidate join —
      // 17.4 → 2.2 s at sf0.1). Threshold 0.2 isolates the corpus's true
      // duplicate pairs (1 / 7 at sf0.01 / sf0.1).
      TextDedup.ngramJaccardPairs(
        Tables.table(spark, dir, "documents"),
        idCol = "doc_id", textCol = "text", blockCols = Seq("source"),
        n = 3, threshold = 0.2)
    },

    "dedup_ngram_global" -> { (spark, dir) =>
      // corpus-WIDE near-dup (r2 VERDICT item 5): real corpora duplicate
      // across sources, so no blocking column at all — the posting join
      // key is the shingle hash alone, still high-cardinality and
      // shuffle-partitioned (the inverted index needs no block to stay
      // sub-quadratic; blocks only shrink the posting lists). Reads the
      // materialized [[TextDedup.sharedNgramPairs]] index (r4 VERDICT
      // item 2) — mined once per (process, corpus, params) and shared
      // with the five other corpus-wide pipeline queries; the re-sort is
      // over the tiny surviving pair set only.
      TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
        .orderBy("doc_a", "doc_b")
    },

    "dedup_edit" -> { (spark, dir) =>
      // EDIT-DISTANCE near-dup — the character-level metric the
      // token-set family (jaccard/minhash) can't see (transpositions,
      // small in-word edits). Candidate generation is the standard
      // pipeline form: shingle-banded pairs first (segment banding is
      // NOT lossless under insertions — indels shift every later
      // position — so candidates come from the order-insensitive n-gram
      // index, which IS robust to them), then an exact Levenshtein
      // rescore on the 64-char prefix. Sub-quadratic end-to-end: the
      // O(64²) DP only ever runs on candidate pairs. Integer distance —
      // bit-exact cross-engine (ASCII fixtures; DuckDB counts bytes,
      // Spark counts chars — equal on ASCII, asserted corpus-wide in
      // LlmOpsSpec).
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      val pfx = docs.select(col("doc_id"),
        substring(col("text"), 1, 64).as("pfx"))
      pairs
        .join(pfx.select(col("doc_id").as("doc_a"), col("pfx").as("pa")),
          "doc_a")
        .join(pfx.select(col("doc_id").as("doc_b"), col("pfx").as("pb")),
          "doc_b")
        .withColumn("lev", levenshtein(col("pa"), col("pb")).cast("long"))
        .filter(col("lev") <= 16)
        .select(col("doc_a"), col("doc_b"), col("lev"))
        .orderBy("doc_a", "doc_b")
    },

    "dedup_clusters" -> { (spark, dir) =>
      // pairs → components → canonical assignment: the step that turns
      // near-dup PAIRS into dedup DECISIONS (keep canonical_id, drop the
      // rest). Edges = the corpus-wide n-gram pairs (same definition as
      // dedup_ngram_global); components via [[Graph.connectedComponents]]
      // (hash-min label propagation — one equi-join + partial-agg min
      // per round, rounds = component diameter ≈ 2 for near-dup
      // cliques); singleton docs rejoin with their own id as canonical.
      // Edges read from the shared materialized pair index — mined once
      // per (process, corpus, params), not once per consumer (r4 item 2).
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      val comp = Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("canonical_id"))
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("canonical_id")))
        .orderBy("doc_id")
    },

    "dedup_ncd" -> { (spark, dir) =>
      // NORMALIZED COMPRESSION DISTANCE over the mined candidate pairs
      // (oracle-omitted: zlib; Wave105Spec is the oracle substitute) —
      // the information-theoretic near-dup signal the token family
      // can't see: NCD(a,b) = (C(ab) − min(C(a),C(b))) / max(...), low
      // when one document's content predicts the other's even under
      // paraphrase-ish edits token Jaccard misses. Candidates come
      // from the shared pair index (never all-pairs); per pair three
      // deflates in one mapPartitions pass. Byte counts are pinned to
      // one zlib config + JVM (TextDedup.zlibEnvPin — recorded by
      // Wave105Spec); a cross-environment rerun may shift them.
      import spark.implicits._
      val docs = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
        .select("doc_a", "doc_b")
        .join(docs.select(col("doc_id").as("doc_a"),
          col("text").as("ta")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"),
          col("text").as("tb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("ta"), col("tb"))
        .as[(Long, Long, String, String)]
        .mapPartitions { it =>
          it.map { case (a, b, ta, tb) =>
            val ca = TextDedup.deflateLen(ta.getBytes("UTF-8"))
            val cb = TextDedup.deflateLen(tb.getBytes("UTF-8"))
            val cab = TextDedup.deflateLen((ta + " " + tb).getBytes("UTF-8"))
            val ncd = (cab - math.min(ca, cb)).toDouble / math.max(ca, cb)
            (a, b, math.floor(ncd * 1e6 + 0.5) / 1e6)
          }
        }
        .toDF("doc_a", "doc_b", "ncd")
        .withColumn("verdict",
          when(col("ncd") < 0.45, "near_dup").otherwise("distinct"))
        .orderBy("doc_a", "doc_b")
    },

    "text_compressibility" -> { (spark, dir) =>
      // COMPRESSION-RATIO quality screen (oracle-omitted: zlib is not
      // expressible in DuckDB SQL; Wave104Spec pins the numbers against
      // a direct JVM deflate and the monotonicity laws) — the classic
      // curation heuristic: highly compressible text is repetitive
      // boilerplate, incompressible text is noise/binary junk; both
      // tails get flagged. Deflate (level 6, fixed) runs per document
      // in a mapPartitions JVM loop over the UTF-8 bytes — one corpus
      // map, ~40 B/row out, embarrassingly parallel; the ratio is
      // deterministic for a given zlib, which the driver's single-JVM
      // rows-only check and the spec both satisfy (the exact pin and
      // its cross-environment caveat: TextDedup.zlibEnvPin, recorded
      // by Wave104Spec).
      import spark.implicits._
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            val raw = text.getBytes("UTF-8")
            val n = TextDedup.deflateLen(raw)
            (id, raw.length.toLong, n,
              math.floor(n.toDouble / raw.length * 1e6 + 0.5) / 1e6)
          }
        }
        .toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
        .withColumn("flag",
          when(col("ratio") < 0.35, "repetitive")
            .when(col("ratio") > 0.9, "incompressible")
            .otherwise("ok"))
        .orderBy("doc_id")
    },

    "agg_countmin" -> { (spark, dir) =>
      // COUNT-MIN frequency sketch — the third mergeable sketch next
      // to HLL (distinct) and Misra-Gries (top-k), and unlike those
      // two it is FULLY deterministic here, so it gets a real hash
      // oracle, not a rows-only check: d=4 affine hash rows (the
      // minhash family convention (2j+3)·h+(5j+7) mod p), w=256
      // counters, all mergeable by addition — the shape a streaming
      // or distributed frequency service keeps per shard and sums.
      // Probes = the exact top-10 tokens; estimate = min over the 4
      // rows, and overestimate = est − exact is ≥ 0 BY CONSTRUCTION
      // (counters only ever overcount), exposed per probe so the
      // sketch's error is measured, not claimed.
      val W = 256
      val tk = Tables.table(spark, dir, "documents")
        .select(explode(toks(col("text"))).as("t"))
        .withColumn("h", tokHash56(col("t")) % P)
      def bucket(j: Column, h: Column): Column =
        ((lit(2L) * j + 3L) * h + (lit(5L) * j + 7L)) % P % W
      val counters = tk
        .select(col("h"), explode(sequence(lit(0L), lit(3L))).as("j"))
        .withColumn("bucket", bucket(col("j"), col("h")))
        .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))
      val probes = tk.groupBy("t", "h").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("t")).limit(10)
      probes
        .withColumn("j", explode(sequence(lit(0L), lit(3L))))
        .withColumn("bucket", bucket(col("j"), col("h")))
        .join(counters, Seq("j", "bucket"))
        .groupBy("t", "exact").agg(min("cnt").as("cm_est"))
        .select(col("t").as("token"), col("exact"), col("cm_est"),
          (col("cm_est") - col("exact")).as("overestimate"))
        .orderBy(col("exact").desc, col("token"))
    },

    "curation_soft_dedup" -> { (spark, dir) =>
      // SOFT dedup for training mixtures: instead of dropping
      // near-dups, every document keeps weight 1/|cluster|, so each
      // near-dup cluster contributes exactly one document's worth of
      // training mass — the duplication-aware reweighting used when
      // hard dedup would cost coverage (rare domains often survive
      // only as near-dup families). Same shared pair index +
      // distributed CC as dedup_clusters; the weight is one column on
      // top of that plan.
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      val comp = Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("canonical_id"))
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("canonical_id")))
        .withColumn("weight",
          Canon.round6(lit(1.0) / col("cluster_size")))
        .orderBy("doc_id")
    },

    "dedup_survivors" -> { (spark, dir) =>
      // The dedup DECISION step: one surviving document per near-dup
      // cluster (same edge set + components as dedup_clusters), chosen
      // by the standard keep-the-longest rule — max n_chars, ties to the
      // lower doc_id. Output is one row per cluster: the survivor, the
      // cluster size, and how many duplicate docs get dropped. This is
      // the operator a curation pipeline actually executes after pair
      // mining: pairs → components → survivors → anti-join the rest out.
      // Scale shape: the rank-1 filter is one window over the component
      // exchange (WindowGroupLimit prunes map-side); nothing beyond the
      // label-propagation rounds ever shuffles the corpus again. Edges
      // come from the shared materialized pair index.
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      val comp = Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      val assigned = docs.select(col("doc_id"), col("n_chars"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("canonical_id",
          coalesce(col("component"), col("doc_id")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("canonical_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      assigned
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("canonical_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("canonical_id"), col("doc_id").as("survivor_id"),
          col("n_chars").as("survivor_chars"), col("cluster_size"),
          (col("cluster_size") - 1).as("n_dropped"))
        .orderBy("canonical_id")
    },

    "curation_summary" -> { (spark, dir) =>
      // The whole curation pipeline as ONE declarative plan: near-dup
      // pairs → components → keep-the-longest survivors → per-language
      // report of what survives (docs, tokens) and what gets dropped
      // (docs, chars). This is the dataset-card / ablation number a
      // training-data pipeline publishes per snapshot. Pair edges come
      // from the shared materialized index, so the only corpus pass here
      // is the per-doc token/char map feeding the final aggregate.
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      val comp = Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("canonical_id")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val flagged = docs
        .select(col("doc_id"), col("lang"), col("n_chars"),
          size(toks(col("text"))).cast("long").as("n_tok"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("canonical_id",
          coalesce(col("component"), col("doc_id")))
        .withColumn("keep", row_number().over(w) === 1)
      flagged.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("keep"), 1)).as("n_kept"),
          sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("tokens_kept"),
          sum(when(!col("keep"), col("n_chars")).otherwise(0L))
            .as("chars_dropped"))
        .orderBy("lang")
    },

    "graph_pagerank" -> { (spark, dir) =>
      // Centrality over the near-dup similarity graph: which member of
      // each duplicate family is the hub the variants derive from
      // (complementing dedup_survivors' length heuristic with a
      // structural one). Edges = the same corpus-wide n-gram pairs as
      // dedup_clusters (read from the shared materialized pair index);
      // 3 fixed power-iteration rounds, d = 0.85 — [[Graph.pagerank]],
      // join+agg per round, no driver state.
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      Graph.pagerank(pairs, "doc_a", "doc_b",
          docs.select(col("doc_id")), iters = 3, damping = 0.85)
        .select(col("id").as("doc_id"), Canon.round6(col("rank")).as("rank"))
        .orderBy("doc_id")
    },

    "graph_ppr" -> { (spark, dir) =>
      // Personalized PageRank from the eval-set seeds (doc_id ≡ 0 mod
      // 100 — the text_contamination convention): rank mass = proximity
      // to the seed set through the near-dup similarity graph, i.e.
      // "which training docs sit closest to the benchmark family" — the
      // graph-walk complement of text_contamination's direct n-gram
      // overlap. Same shared pair index, same per-iteration join+agg
      // shape as graph_pagerank; only the teleport vector differs.
      val docs = Tables.table(spark, dir, "documents")
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      Graph.personalizedPagerank(pairs, "doc_a", "doc_b",
          docs.select(col("doc_id")),
          docs.filter(col("doc_id") % 100 === 0).select(col("doc_id")),
          iters = 3, damping = 0.85)
        .select(col("id").as("doc_id"), Canon.round6(col("rank")).as("rank"))
        .filter(col("rank") > 0)
        .orderBy("doc_id")
    },

    "curation_filters" -> { (spark, dir) =>
      // C4/Gopher-style rule-based filter report — the other half of the
      // dataset card next to [[curation_summary]]: for each quality rule,
      // how many docs it flags, plus the any-rule and kept totals. All
      // per-doc signals come from ONE JVM pass (token count, stopword
      // presence, shingle repetition — shingling in SQL lambdas hits the
      // O(L²) transform re-split trap, see text_rep), the lang flag is a
      // column test, and the report is a single partial+final agg over
      // (rule, flag) rows — one scan, one small shuffle, no per-rule
      // re-reads. Scale shape: map → explode(6 rows/doc) → hash agg on a
      // 6-value key; input-size-proportional, driver-free.
      import spark.implicits._
      val perDoc = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (_, text, lang) =>
          val t = text.split(" ", -1)
          val m = scala.collection.mutable.HashMap.empty[String, Int]
          var i = 0
          while (i + 2 < t.length) {
            val sh = t(i) + " " + t(i + 1) + " " + t(i + 2)
            m.update(sh, m.getOrElse(sh, 0) + 1)
            i += 1
          }
          val nsh = math.max(t.length - 2, 0)
          // same round-6 canonicalization as text_rep so the threshold
          // compares the identical double on both engines
          val rep =
            if (nsh == 0) 0.0
            else math.rint((1.0 - m.size.toDouble / nsh) * 1e6) / 1e6
          (t.length < 30,
            !t.contains("the") && !t.contains("a"),
            rep >= 0.04,
            lang == "zh")
        })
        .toDF("too_short", "no_stopword", "repetitive", "lang_other")
      val rules = perDoc.select(explode(array(
        struct(lit("too_short").as("rule"), col("too_short").as("flag")),
        struct(lit("no_stopword").as("rule"), col("no_stopword").as("flag")),
        struct(lit("repetitive").as("rule"), col("repetitive").as("flag")),
        struct(lit("lang_other").as("rule"), col("lang_other").as("flag")),
        struct(lit("any_rule").as("rule"),
          (col("too_short") || col("no_stopword") || col("repetitive")
            || col("lang_other")).as("flag")),
        struct(lit("kept").as("rule"),
          (!(col("too_short") || col("no_stopword") || col("repetitive")
            || col("lang_other"))).as("flag")))).as("r"))
        .select(col("r.rule"), col("r.flag"))
      rules.groupBy("rule")
        .agg(count(when(col("flag"), 1)).as("n_flagged"),
          Canon.round6(count(when(col("flag"), 1)) / count(lit(1)))
            .as("pct"))
        .orderBy("rule")
    },

    "text_oov_rate" -> { (spark, dir) =>
      // Tokenizer-vocabulary COVERAGE — the go/no-go check before
      // committing a vocab: with the top-16 corpus tokens as the
      // vocabulary (the fixture's whole vocabulary is 31 — a real
      // corpus uses 32-256k), what fraction of each document's tokens
      // fall out of vocabulary? Vocab selection is one map-side-combined
      // token count + TakeOrderedAndProject (ties broken by token text,
      // so the cut is deterministic cross-engine); the vocab then
      // BROADCASTS to a left join on the exploded token stream and the
      // per-doc rate is one keyed aggregate. At 100 TB the vocab table
      // is the persisted artifact and this query is a single corpus
      // pass.
      val tok = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      val vocab = tok.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(16)
        .select(col("token"), lit(1L).as("in_v"))
      tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tok"), col("n_oov"),
          Canon.round6(col("n_oov").cast("double") / col("n_tok"))
            .as("oov_rate"))
        .orderBy("doc_id")
    },

    "curation_pipeline" -> { (spark, dir) =>
      // END-TO-END curation funnel in ONE DAG — the dataset-card query
      // a training-data pipeline materializes per snapshot: quality
      // gate (≥30 tokens + stopword presence) → exact dedup (keep
      // min doc_id per content hash) → near-dup survivor selection
      // (components over the SHARED pair index restricted to the
      // remaining set; keep-the-longest) → per-(source, lang) funnel
      // counts, kept tokens, and the final mixture weight. Every stage
      // reuses the corpus-wide machinery the standalone queries
      // declare: one signal pass, the cached pair artifact, the
      // checkpointed label propagation — so the end-to-end cost is ONE
      // corpus pass plus small keyed exchanges, proving the pieces
      // compose without re-mining (the r4 pipeline-redundancy fix,
      // exercised as a user would chain it).
      val docs = Tables.table(spark, dir, "documents")
        .withColumn("toks", split(col("text"), " ", -1))
        .withColumn("ntok", size(col("toks")).cast("long"))
      val gated = docs.filter(col("ntok") >= 30 &&
        (array_contains(col("toks"), "the")
          || array_contains(col("toks"), "a")))
      val wex = org.apache.spark.sql.expressions.Window
        .partitionBy("thash").orderBy("doc_id")
      // checkpoint: four consumers read this stage (two pair semi-joins,
      // the survivor join, the funnel count) — without the barrier each
      // re-runs the corpus scan + dedup window (measured 32 s → ~18 s at
      // the 10× smoke, where the re-runs multiply)
      val exact = gated.withColumn("thash", sha2(col("text"), 256))
        .withColumn("rnx", row_number().over(wex))
        .filter(col("rnx") === 1)
        .select("doc_id", "source", "lang", "n_chars", "ntok")
        .localCheckpoint()
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
        .join(exact.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(exact.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      val comp = Graph.connectedComponents(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      val wsur = org.apache.spark.sql.expressions.Window
        .partitionBy("canonical").orderBy(col("n_chars").desc, col("doc_id"))
      val kept = exact.join(comp, Seq("doc_id"), "left")
        .withColumn("canonical", coalesce(col("component"), col("doc_id")))
        .withColumn("rn", row_number().over(wsur))
        .filter(col("rn") === 1)
        // r13 opt: two consumers (the token total + the funnel counts)
        // each re-ran the survivor join + window without this barrier
        .localCheckpoint(false)
      val tot = kept.agg(sum("ntok").as("tok_total"))
      val raw = docs.groupBy("source", "lang").agg(count(lit(1)).as("n_raw"))
      val gc = gated.groupBy("source", "lang").agg(count(lit(1)).as("n_gated"))
      val ec = exact.groupBy("source", "lang").agg(count(lit(1)).as("n_exact"))
      val kc = kept.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_kept"), sum("ntok").as("tok_kept"))
      raw.join(gc, Seq("source", "lang"), "left")
        .join(ec, Seq("source", "lang"), "left")
        .join(kc, Seq("source", "lang"), "left")
        .crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("n_raw"),
          coalesce(col("n_gated"), lit(0L)).as("n_gated"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("tok_kept"), lit(0L)).as("tok_kept"),
          Canon.round6(coalesce(col("tok_kept"), lit(0L)).cast("double")
            / col("tok_total").cast("double")).as("mix_weight"))
        .orderBy("source", "lang")
    },

    "corpus_mixture" -> { (spark, dir) =>
      // Data-mixing weights per source: token counts and the
      // temperature-scaled sampling weight w_s ∝ tokens_s^0.7 (the
      // standard multi-source rebalancing exponent) normalized over the
      // corpus. Partial+final agg to 20 source rows, then a single-
      // partition window for the normalizing constant — the window runs
      // over |sources| rows (already aggregated), not over documents, so
      // the one-partition stage is O(sources) at any corpus size.
      val bySource = Tables.table(spark, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(toks(col("text"))).cast("long")).as("tokens"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      bySource
        .withColumn("raw", pow(col("tokens").cast("double"), 0.7))
        .withColumn("weight", Canon.round6(col("raw") / sum("raw").over(all)))
        .select(col("source"), col("n_docs"), col("tokens"), col("weight"))
        .orderBy("source")
    },

    "dedup_minhash" -> { (spark, dir) =>
      // MinHash(16 perms) + LSH banding (2 bands × 8 rows), blocked by
      // `source` (composite LSH + attribute blocking — this corpus has
      // extreme baseline similarity, so band keys alone under-prune).
      // Engine-independent permutations h_j(v) = ((2j+3)·v + 5j+7) mod p
      // over 56-bit token hashes.
      val sig = sigTable(spark, Tables.table(spark, dir, "documents"))
      val bands = sig
        .withColumn("band", explode(sequence(lit(0), lit(1))))
        .select(col("doc_id"), col("source"), col("band"),
          concat_ws("_", slice(col("mh"), col("band") * 8 + 1, lit(8))).as("bkey"))
      // candidates as id pairs only — distinct over two longs, not over
      // carried token arrays; hash sets re-joined just for the rescore
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
            && col("x.source") === col("y.source")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      val s = sig.select(col("doc_id"), col("shs"))
      cand
        .join(s.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
        .join(s.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          Canon.round6(jacOfSorted(col("sa"), col("sb"))).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    "dedup_simhash" -> { (spark, dir) =>
      // 48-bit SimHash over token hashes; near-dup = same source with
      // hamming distance ≤ 12 (bit_count of xor — both engines native).
      // Candidate generation is pigeonhole banding (r2 VERDICT item 2),
      // NOT all-pairs-within-source: the 48 bits split into 13 disjoint
      // segments (9×4 bits + 4×3 bits), so any pair differing in ≤ 12
      // bits leaves at least one segment untouched — an equi-join on
      // (source, segment-id, segment-value) is a lossless candidate
      // superset. Exact bit_count rescore + dedup then restores the
      // precise hamming-ball semantics. The join keys are
      // high-cardinality and shuffle-partitioned: sub-quadratic at scale
      // (the hamming analog of MinHash's LSH banding).
      val widths = Seq.fill(9)(4) ++ Seq.fill(4)(3) // 9·4 + 4·3 = 48 bits
      val offsets = widths.scanLeft(0)(_ + _).init
      val segCols = offsets.zip(widths).zipWithIndex.map {
        case ((off, w), i) =>
          struct(lit(i).as("seg"),
            shiftright(col("simhash"), off)
              .bitwiseAND(lit((1L << w) - 1)).as("segv"))
      }
      val sh = sigTable(spark, Tables.table(spark, dir, "documents"))
        .select(col("doc_id"), col("source"), col("simhash"),
          explode(array(segCols: _*)).as("s"))
        .select(col("doc_id"), col("source"), col("simhash"),
          col("s.seg").as("seg"), col("s.segv").as("segv"))
      sh.as("x").join(sh.as("y"),
          col("x.source") === col("y.source")
            && col("x.seg") === col("y.seg")
            && col("x.segv") === col("y.segv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 12)
        // a close pair typically agrees on several segments — hamming is
        // deterministic per pair, so dropDuplicates after the filter
        .dropDuplicates("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    },

    "text_scrub" -> { (spark, dir) =>
      // PII-style redaction pass: digit runs → <num>, naive emails →
      // <email>, whitespace collapsed. Pure per-row regexp_replace —
      // codegen'd, no shuffle until the output sort; at 100 TB this is
      // the map-only hygiene stage before anything keyed. Patterns stay
      // in the RE2 ∩ java.util.regex dialect (character classes only) so
      // the DuckDB oracle is the same regex text.
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_num_runs"),
          substring(
            regexp_replace(
              regexp_replace(
                regexp_replace(col("text"),
                  "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<email>"),
                "[0-9]+", "<num>"),
              "[ ]+", " "),
            1, 120).as("scrubbed_prefix"))
        .orderBy("doc_id")
    },

    "dedup_prefix_hamming" -> { (spark, dir) =>
      // Position-aligned near-dup (OCR/mirror-noise shape): pairs whose
      // padded 48-char prefixes differ in ≤ 2 positions. Candidates via
      // pigeonhole banding — 3 disjoint 16-char segments; ≤ 2 edits
      // leave ≥ 1 segment byte-identical — so candidate generation is a
      // shuffle equi-join on (segment-id, segment-value), corpus-wide
      // (no source blocking), never all-pairs. Exact rescore through the
      // codegen [[graft.functions.HammingDist]] expression restores the
      // precise ball. Measured selectivity at sf0.1: 860 candidates of
      // 12.5 M possible pairs.
      val d = Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          rpad(substring(col("text"), 1, 48), 48, ".").as("p"))
      val segs = d.select(col("doc_id"), col("p"),
        posexplode(array((0 until 3).map(i =>
          substring(col("p"), 1 + i * 16, 16)): _*)).as(Seq("seg", "segv")))
      segs.as("x").join(segs.as("y"),
          col("x.seg") === col("y.seg") && col("x.segv") === col("y.segv")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          graft.functions.HammingDist.hamming(col("x.p"), col("y.p"))
            .as("dist"))
        .filter(col("dist") <= 2)
        .dropDuplicates("doc_a", "doc_b")
        .orderBy("doc_a", "doc_b")
    },

    "dedup_lsh_tuning" -> { (spark, dir) =>
      // LSH OPERATING-POINT SWEEP — the calibration table an operator
      // reads before fixing (bands, rowsPerBand) in production: for each
      // config over the SAME MinHash(16) signature, candidate volume,
      // exact-rescore survivors (unigram J ≥ 0.8), and recall/precision
      // against the exact truth set. More bands ⇒ higher recall AND more
      // candidates; this query measures the trade instead of guessing
      // it. Shapes: one signature build feeds three band self-joins
      // (each a shuffle equi-join on (source, band, bandkey), never
      // all-pairs); the TRUTH side is the within-source exact rescore —
      // 622 k pairs at sf0.1, linear-walk codegen — which at 100 TB runs
      // on a per-source SAMPLE (calibration needs a confidence interval,
      // not the full corpus; the candidate side is what must scale).
      // Truth/config counts meet as 1-row broadcast aggregates — no
      // collected scalars.
      val tau = 0.8
      val sig = sigTable(spark, Tables.table(spark, dir, "documents"))
      val truth = sig.as("x").join(sig.as("y"),
          col("x.source") === col("y.source")
            && col("x.doc_id") < col("y.doc_id"))
        .select(Canon.round6(
          jacOfSorted(col("x.shs"), col("y.shs"))).as("j"))
        .agg(coalesce(sum(when(col("j") >= tau, 1L).otherwise(0L)), lit(0L))
          .as("n_true")) // coalesce: zero within-source pairs ⇒ 0, not NULL
      val perCfg = Seq(2, 4, 8).map { b =>
        val w = 16 / b
        val bands = sig
          .withColumn("band", explode(sequence(lit(0), lit(b - 1))))
          .select(col("doc_id"), col("source"), col("band"),
            concat_ws("_", slice(col("mh"), col("band") * w + 1, lit(w)))
              .as("bkey"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band")
              && col("x.bkey") === col("y.bkey")
              && col("x.source") === col("y.source")
              && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val s = sig.select(col("doc_id"), col("shs"))
        cand
          .join(s.select(col("doc_id").as("doc_a"), col("shs").as("sa")),
            "doc_a")
          .join(s.select(col("doc_id").as("doc_b"), col("shs").as("sb")),
            "doc_b")
          .select(Canon.round6(
            jacOfSorted(col("sa"), col("sb"))).as("j"))
          .agg(count(lit(1)).as("n_cand"),
            // coalesce: a config with ZERO candidates still reports a
            // row (n_cand = 0, n_conf = 0, recall 0-able, precision
            // NULL) — the global agg always emits one row, but sum()
            // over it is NULL; the oracle zero-fills from its cfg list
            // the same way, so an empty operating point can never
            // row-count-mismatch the sweep (r8 ADVICE item 1).
            coalesce(sum(when(col("j") >= tau, 1L).otherwise(0L)), lit(0L))
              .as("n_conf"))
          .select(lit(b.toLong).as("bands"), lit(w.toLong).as("rows_per_band"),
            col("n_cand"), col("n_conf"))
      }.reduce(_ unionByName _)
      perCfg.crossJoin(broadcast(truth))
        .select(col("bands"), col("rows_per_band"),
          col("n_cand"), col("n_conf"), col("n_true"),
          when(col("n_true") > 0, Canon.round6(col("n_conf").cast("double")
            / col("n_true").cast("double"))).as("recall"),
          when(col("n_cand") > 0, Canon.round6(col("n_conf").cast("double")
            / col("n_cand").cast("double"))).as("precision"))
        .orderBy("bands")
    },

    "dedup_explain" -> { (spark, dir) =>
      // MULTI-SIGNAL near-dup AUDIT — for every corpus-wide candidate
      // pair in the shared 3-gram index, ALL the signals the dedup
      // family computes separately, side by side, plus a rule-based
      // verdict: the report a data curator reads to decide which
      // signal's threshold to act on (and the ground truth for debating
      // "why did X survive dedup?"). Signals: 3-gram Jaccard (from the
      // materialized index — not re-mined), unigram Jaccard +
      // directional containment (one array_intersect on the candidate
      // pairs only — bounded by |pairs|, never corpus²), 48-bit SimHash
      // hamming, exact-dup flag via sha-256 text fingerprint. Shape:
      // the tiny pair set joins the signature table twice — at 100 TB
      // the pair index is the thing that was already mined once, so
      // this whole report costs |pairs| joins, not a corpus pass.
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      val sig = sigTable(spark, Tables.table(spark, dir, "documents"))
        .join(Tables.table(spark, dir, "documents")
          .select(col("doc_id"), sha2(col("text"), 256).as("fp")), "doc_id")
      val a = sig.select(col("doc_id").as("doc_a"), col("shs").as("sa"),
        col("nt").as("na"), col("simhash").as("ha"), col("fp").as("fa"))
      val b = sig.select(col("doc_id").as("doc_b"), col("shs").as("sb"),
        col("nt").as("nb"), col("simhash").as("hb"), col("fp").as("fb"))
      pairs.join(a, "doc_a").join(b, "doc_b")
        .withColumn("i1",
          size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .withColumn("tok_jaccard", Canon.round6(
          col("i1") / (col("na") + col("nb") - col("i1"))))
        .withColumn("cont_a", Canon.round6(col("i1") / col("na")))
        .withColumn("cont_b", Canon.round6(col("i1") / col("nb")))
        .withColumn("sim_hamming",
          expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
        .withColumn("exact_dup", col("fa") === col("fb"))
        .select(col("doc_a"), col("doc_b"),
          col("jaccard").as("jaccard3"), col("tok_jaccard"),
          col("cont_a"), col("cont_b"), col("sim_hamming"),
          col("exact_dup"),
          when(col("exact_dup"), lit("exact"))
            .when(col("jaccard") >= 0.8, lit("near"))
            .when(greatest(col("cont_a"), col("cont_b")) >= 0.9,
              lit("contained"))
            .when(col("sim_hamming") <= 12, lit("templated"))
            .otherwise(lit("weak")).as("verdict"))
        .orderBy("doc_a", "doc_b")
    }
  )

  /** Shared oracle CTE: corpus-wide word-3-gram Jaccard ≥ 0.2 pairs as
    * `gpairs(doc_a, doc_b, jaccard)` — the edge set for both
    * dedup_ngram_global and dedup_clusters.
    */
  private[operators] val ngramGlobalPairsCte =
    """t AS (SELECT doc_id,
      |  list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
      |         || ' ' || string_split(text,' ')[i+2])) AS sh
      |  FROM documents WHERE len(string_split(text,' ')) >= 3),
      |post AS (SELECT doc_id, len(sh) AS nsh, unnest(sh) AS s FROM t),
      |cpairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    x.nsh AS na, y.nsh AS nb, count(*) AS i
      |  FROM post x JOIN post y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY 1, 2, 3, 4),
      |gpairs AS (SELECT doc_a, doc_b,
      |    CAST(round(i / CAST(na + nb - i AS DOUBLE), 6) AS DOUBLE) AS jaccard
      |  FROM cpairs
      |  WHERE round(i / CAST(na + nb - i AS DOUBLE), 6) >= 0.2)""".stripMargin

  private val langScoreSql = langWords.map { case (l, ws) =>
    val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_filter(dtoks, x -> list_contains($lst, x))) AS BIGINT) AS s_$l"
  }.mkString(",\n  ")

  def oracle = Map(
    "text_tokenize" ->
      """SELECT token, count(*) AS n FROM
        |  (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(round(CAST(sum(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_chars,
        |  CAST(round(CAST(sum(CAST(len(string_split(text,' ')) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  list_distinct(string_split(text, ' ')) AS dtoks FROM documents),
         |s AS (SELECT doc_id, lang AS true_lang,
         |  $langScoreSql
         |FROM t)
         |SELECT doc_id, true_lang,
         |  CASE WHEN s_de >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |       WHEN s_en >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |       WHEN s_es >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |       WHEN s_fr >= greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |       ELSE 'zh' END AS pred_lang,
         |  s_de, s_en, s_es, s_fr, s_zh
         |FROM s ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      """SELECT doc_id, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(round((n_chars - (len(string_split(text, ' ')) - 1))
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS DOUBLE) AS avg_tok_len,
        |  CAST(round(len(list_filter(list_distinct(string_split(text, ' ')),
        |      x -> list_contains(['the', 'a'], x)))
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS DOUBLE) AS stop_ratio,
        |  CAST(round(
        |    least(1.0, len(string_split(text, ' ')) / 50.0) * 0.5
        |    + (1.0 - len(list_filter(list_distinct(string_split(text, ' ')),
        |         x -> list_contains(['the', 'a'], x)))
        |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.3
        |    + least(1.0, ((n_chars - (len(string_split(text, ' ')) - 1))
        |       / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 5.0) * 0.2,
        |  6) AS DOUBLE) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_cdc_chunks" ->
      // same mod-p Horner boundaries, DuckDB list arithmetic;
      // list_slice's inclusive end = Spark's slice length form
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tks,
        |    list_transform(string_split(text, ' '), t ->
        |      CAST(concat('0x', substring(sha256(t), 1, 14)) AS BIGINT)
        |        % 2147483647) AS hsp
        |  FROM documents),
        |b AS (SELECT doc_id, tks,
        |    list_filter(range(1, len(tks) + 1), i -> i = 1 OR
        |      (CASE WHEN i >= 4 THEN
        |        ((((hsp[i-3] * 31 + hsp[i-2]) % 2147483647)
        |           * 31 + hsp[i-1]) % 2147483647
        |           * 31 + hsp[i]) % 2147483647 % 64 = 0
        |       ELSE false END)) AS bps
        |  FROM d),
        |c AS (SELECT doc_id, unnest(list_transform(range(1, len(bps) + 1),
        |    j -> array_to_string(list_slice(tks, bps[j],
        |      coalesce(bps[j + 1], len(tks) + 1) - 1), ' '))) AS chunk
        |  FROM b)
        |SELECT CAST(concat('0x', substring(sha256(chunk), 1, 14)) AS BIGINT)
        |    AS fp,
        |  CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_toks,
        |  count(*) AS n_copies,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM c GROUP BY chunk HAVING count(*) > 1
        |ORDER BY n_copies DESC, fp LIMIT 20""".stripMargin,

    "text_fingerprint" ->
s"""WITH h AS ($withHashesSql)
         |SELECT doc_id,
         |  sha256(array_to_string(list_sort(dtoks), ' ')) AS bow_fp,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(text, ' '),
         |                     t -> $tokHash56Sql % $P)),
         |    (acc, x) -> (acc * 31 + x) % $P) AS roll_fp
         |FROM h ORDER BY doc_id""".stripMargin,

    "sample_hash" ->
      s"""SELECT doc_id, lang, source FROM documents
        |WHERE $docBucketSql < 10
        |ORDER BY doc_id""".stripMargin,

    "split_assign" ->
      s"""WITH b AS (SELECT source, doc_id, $docBucketSql AS bucket
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM b GROUP BY source, split ORDER BY source, split""".stripMargin,

    "text_len_hist" ->
      """WITH t AS (SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT lang, CAST(floor(n_tok / 10.0) AS BIGINT) * 10 AS len_bucket,
        |  count(*) AS n_docs, min(n_tok) AS min_tokens, max(n_tok) AS max_tokens
        |FROM t GROUP BY lang, len_bucket ORDER BY lang, len_bucket""".stripMargin,

    "text_rep" ->
      """WITH s AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |c AS (SELECT doc_id, sh, count(*) AS n FROM s GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_shingles,
        |    count(*) AS n_distinct, CAST(max(n) AS BIGINT) AS max_rep
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_shingles, n_distinct, max_rep,
        |  CAST(round(1.0 - n_distinct / CAST(n_shingles AS DOUBLE), 6) AS DOUBLE)
        |    AS rep_ratio
        |FROM a ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        |s AS (SELECT doc_id, term, tf,
        |    CAST(round(tf * ((SELECT count(*) FROM documents)
        |      / CAST(df AS DOUBLE)), 6) AS DOUBLE) AS score
        |  FROM tfc JOIN dfc USING (term)),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM s)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "text_bigram_lm" ->
      """WITH td AS (SELECT string_split(text, ' ') AS s FROM documents),
        |ix AS (SELECT s, unnest(range(1, len(s))) AS i FROM td),
        |pr AS (SELECT s[i] AS a, s[i+1] AS b FROM ix),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM pr GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS n FROM
        |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
        |ta AS (SELECT a, c_a FROM ca ORDER BY c_a DESC, a LIMIT 10),
        |r AS (SELECT cab.a, cab.b, cab.c_ab, ta.c_a,
        |    CAST(round(CAST(cab.c_ab + 1 AS DOUBLE)
        |      / CAST(ta.c_a + (SELECT n FROM v) AS DOUBLE), 6) AS DOUBLE) AS p,
        |    row_number() OVER (PARTITION BY cab.a
        |      ORDER BY cab.c_ab DESC, cab.b) AS rnk
        |  FROM cab JOIN ta ON cab.a = ta.a)
        |SELECT a, CAST(rnk AS BIGINT) AS rnk, b, c_ab, c_a, p
        |FROM r WHERE rnk <= 5 ORDER BY a, rnk""".stripMargin,

    "text_vocab" ->
      """WITH t AS (SELECT lang,
        |    unnest(list_distinct(string_split(text, ' '))) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS n_docs FROM t GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY n_docs DESC, token) AS rnk FROM c)
        |SELECT lang, CAST(rnk AS BIGINT) AS rnk, token, n_docs
        |FROM r WHERE rnk <= 10 ORDER BY lang, rnk""".stripMargin,

    "text_hashing_trick" ->
      // same 56-bit hash, same integer bucket/sign arithmetic; DuckDB's
      // // is integer division on BIGINT
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents WHERE doc_id % 97 = 0),
         |h AS (SELECT doc_id, $tokHash56Sql AS h FROM t),
         |b AS (SELECT doc_id, h % 64 AS bucket,
         |    CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sign
         |  FROM h)
         |SELECT doc_id, bucket, count(*) AS n_tokens,
         |  CAST(sum(sign) AS BIGINT) AS tf_signed
         |FROM b GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin,

    "text_contamination" ->
      """WITH t AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |post AS (SELECT doc_id, unnest(sh) AS s FROM t),
        |ov AS (SELECT tr.doc_id AS doc_id, ev.doc_id AS eval_id,
        |    count(*) AS n_shared
        |  FROM post tr JOIN post ev ON tr.s = ev.s
        |  WHERE tr.doc_id % 100 <> 0 AND ev.doc_id % 100 = 0
        |  GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY doc_id ORDER BY n_shared DESC, eval_id) AS rk
        |  FROM ov)
        |SELECT doc_id, eval_id, n_shared FROM r WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, lang, source, $docBucketSql AS bucket
         |FROM documents
         |WHERE $docBucketSql <
         |  CASE WHEN lang = 'en' THEN 20
         |       WHEN lang IN ('de', 'fr') THEN 10 ELSE 4 END
         |ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT sha256(text) AS text_hash, count(*) AS n_dup,
        |       min(doc_id) AS canonical_id
        |FROM documents GROUP BY sha256(text) ORDER BY text_hash""".stripMargin,

    "dedup_jaccard" ->
      """WITH t AS (SELECT doc_id, source,
        |  list_distinct(string_split(text, ' ')) AS dtoks FROM documents)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  CAST(round(
        |    len(list_filter(x.dtoks, v -> list_contains(y.dtoks, v)))
        |      / CAST(len(list_distinct(list_concat(x.dtoks, y.dtoks))) AS DOUBLE),
        |  6) AS DOUBLE) AS jaccard
        |FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
        |WHERE round(len(list_filter(x.dtoks, v -> list_contains(y.dtoks, v)))
        |      / CAST(len(list_distinct(list_concat(x.dtoks, y.dtoks))) AS DOUBLE), 6)
        |      >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram" ->
      """WITH t AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |         || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3)
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  CAST(round(len(list_filter(x.sh, v -> list_contains(y.sh, v)))
        |    / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE), 6)
        |    AS DOUBLE) AS jaccard
        |FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
        |WHERE round(len(list_filter(x.sh, v -> list_contains(y.sh, v)))
        |    / CAST(len(list_distinct(list_concat(x.sh, y.sh))) AS DOUBLE), 6) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_ngram_global" ->
      // inverted-index form in DuckDB too (unnest → self-join on shingle →
      // count = intersection): the naive all-pairs double list walk is
      // quadratic in the oracle engine as well. I/(na+nb−I) divides the
      // same integers as the list_filter/list_distinct form ⇒ identical
      // doubles. (Concatenation, not an outer stripMargin: the embedded
      // CTE has lines starting with `||`, which a second stripMargin
      // would truncate to `|`.)
      ("WITH " + ngramGlobalPairsCte +
        "\nSELECT doc_a, doc_b, jaccard FROM gpairs\nORDER BY doc_a, doc_b"),

    "dedup_edit" ->
      // same candidate CTE as dedup_ngram_global + integer Levenshtein
      // rescore on the 64-char prefix (ASCII corpus ⇒ byte≡char)
      ("WITH " + ngramGlobalPairsCte + """,
        |p AS (SELECT doc_id, substr(text, 1, 64) AS pfx FROM documents)
        |SELECT g.doc_a, g.doc_b,
        |  CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
        |FROM gpairs g
        |JOIN p a ON g.doc_a = a.doc_id
        |JOIN p b ON g.doc_b = b.doc_id
        |WHERE levenshtein(a.pfx, b.pfx) <= 16
        |ORDER BY doc_a, doc_b""".stripMargin),

    "dedup_clusters" ->
      // transitive closure per component via a recursive CTE (fixture
      // scale only — the engine side uses distributed label propagation
      // instead): reach(id, m) = every m reachable from id over the
      // symmetric edge set; canonical = min reachable; singleton docs
      // fall back to their own id
      ("WITH RECURSIVE " + ngramGlobalPairsCte + ",\n" +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs
          |      UNION ALL SELECT doc_b, doc_a FROM gpairs),
          |r(id, m) AS (SELECT DISTINCT a, a FROM e
          |  UNION
          |  SELECT e.a, r.m FROM e JOIN r ON e.b = r.id),
          |comp AS (SELECT id, min(m) AS canonical FROM r GROUP BY id)
          |SELECT d.doc_id,
          |  coalesce(c.canonical, d.doc_id) AS canonical_id,
          |  COUNT(*) OVER (PARTITION BY coalesce(c.canonical, d.doc_id))
          |    AS cluster_size
          |FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
          |ORDER BY d.doc_id""".stripMargin),

    "agg_countmin" ->
      // same affine rows, same min-over-rows probe, exact longs
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |h AS (SELECT t,
         |    CAST(concat('0x', substring(sha256(t), 1, 14)) AS BIGINT)
         |      % $P AS h
         |  FROM tk),
         |c AS (SELECT j, ((2 * j + 3) * h + (5 * j + 7)) % $P % 256
         |      AS bucket, count(*) AS cnt
         |  FROM h CROSS JOIN (SELECT unnest(range(4)) AS j) GROUP BY 1, 2),
         |p AS (SELECT t, h, count(*) AS exact FROM h GROUP BY 1, 2
         |  ORDER BY exact DESC, t LIMIT 10),
         |e AS (SELECT p.t, p.exact, min(c.cnt) AS cm_est
         |  FROM p CROSS JOIN (SELECT unnest(range(4)) AS j) pj
         |    JOIN c ON c.j = pj.j
         |      AND c.bucket = ((2 * pj.j + 3) * p.h + (5 * pj.j + 7))
         |        % $P % 256
         |  GROUP BY 1, 2)
         |SELECT t AS token, CAST(exact AS BIGINT) AS exact,
         |  CAST(cm_est AS BIGINT) AS cm_est,
         |  CAST(cm_est - exact AS BIGINT) AS overestimate
         |FROM e ORDER BY exact DESC, token""".stripMargin,

    "curation_soft_dedup" ->
      // dedup_clusters' closure CTE + the 1/|cluster| weight
      ("WITH RECURSIVE " + ngramGlobalPairsCte + ",\n" +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs
          |      UNION ALL SELECT doc_b, doc_a FROM gpairs),
          |r(id, m) AS (SELECT DISTINCT a, a FROM e
          |  UNION
          |  SELECT e.a, r.m FROM e JOIN r ON e.b = r.id),
          |comp AS (SELECT id, min(m) AS canonical FROM r GROUP BY id),
          |cl AS (SELECT d.doc_id,
          |    coalesce(c.canonical, d.doc_id) AS canonical_id,
          |    COUNT(*) OVER (PARTITION BY coalesce(c.canonical, d.doc_id))
          |      AS cluster_size
          |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
          |SELECT doc_id, canonical_id, cluster_size,
          |  CAST(floor(1.0 / cluster_size * 1e6 + 0.5) / 1e6 AS DOUBLE)
          |    AS weight
          |FROM cl ORDER BY doc_id""".stripMargin),

    "dedup_survivors" ->
      // same recursive-closure component CTE as dedup_clusters, then
      // keep-the-longest survivor per component (ties to lower doc_id)
      ("WITH RECURSIVE " + ngramGlobalPairsCte + ",\n" +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs
          |      UNION ALL SELECT doc_b, doc_a FROM gpairs),
          |r(id, m) AS (SELECT DISTINCT a, a FROM e
          |  UNION
          |  SELECT e.a, r.m FROM e JOIN r ON e.b = r.id),
          |comp AS (SELECT id, min(m) AS canonical FROM r GROUP BY id),
          |assigned AS (SELECT d.doc_id, d.n_chars,
          |    coalesce(c.canonical, d.doc_id) AS canonical_id
          |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
          |ranked AS (SELECT *,
          |    row_number() OVER (PARTITION BY canonical_id
          |      ORDER BY n_chars DESC, doc_id) AS rn,
          |    COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
          |  FROM assigned)
          |SELECT canonical_id, doc_id AS survivor_id,
          |  n_chars AS survivor_chars, cluster_size,
          |  cluster_size - 1 AS n_dropped
          |FROM ranked WHERE rn = 1 ORDER BY canonical_id""".stripMargin),

    "curation_summary" ->
      // survivors CTE as in dedup_survivors, rolled up per language.
      // DuckDB sum(BIGINT) is HUGEINT → cast back to BIGINT for dtype
      // parity with Spark's long sums.
      ("WITH RECURSIVE " + ngramGlobalPairsCte + ",\n" +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs
          |      UNION ALL SELECT doc_b, doc_a FROM gpairs),
          |r(id, m) AS (SELECT DISTINCT a, a FROM e
          |  UNION
          |  SELECT e.a, r.m FROM e JOIN r ON e.b = r.id),
          |comp AS (SELECT id, min(m) AS canonical FROM r GROUP BY id),
          |flagged AS (SELECT d.doc_id, d.lang, d.n_chars,
          |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
          |    row_number() OVER (
          |      PARTITION BY coalesce(c.canonical, d.doc_id)
          |      ORDER BY d.n_chars DESC, d.doc_id) = 1 AS keep
          |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
          |SELECT lang, count(*) AS n_docs,
          |  count(*) FILTER (WHERE keep) AS n_kept,
          |  CAST(COALESCE(sum(n_tok) FILTER (WHERE keep), 0) AS BIGINT)
          |    AS tokens_kept,
          |  CAST(COALESCE(sum(n_chars) FILTER (WHERE NOT keep), 0) AS BIGINT)
          |    AS chars_dropped
          |FROM flagged GROUP BY lang ORDER BY lang""".stripMargin),

    "graph_ppr" ->
      // pagerank's unrolled CTE chain with the seed-set teleport vector
      // ((1-d)·tele instead of (1-d)/n) and the rounded-rank > 0 gate
      ("WITH " + ngramGlobalPairsCte + ",\n" +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs
          |      UNION ALL SELECT doc_b, doc_a FROM gpairs),
          |deg AS (SELECT a AS id, CAST(count(*) AS DOUBLE) AS deg
          |  FROM e GROUP BY 1),
          |v AS (SELECT doc_id AS id FROM documents),
          |sd AS (SELECT doc_id AS id FROM documents WHERE doc_id % 100 = 0),
          |nn AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM sd),
          |tv AS (SELECT v.id, CASE WHEN sd.id IS NOT NULL
          |    THEN 1.0 / (SELECT ns FROM nn) ELSE 0.0 END AS tele
          |  FROM v LEFT JOIN sd ON v.id = sd.id),
          |p0 AS (SELECT id, tele AS r FROM tv),
          |c1 AS (SELECT e.b AS id, sum(p.r / d.deg) AS m FROM e
          |  JOIN p0 p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
          |p1 AS (SELECT tv.id, (1.0 - 0.85) * tv.tele
          |    + 0.85 * coalesce(c.m, 0) AS r
          |  FROM tv LEFT JOIN c1 c ON tv.id = c.id),
          |c2 AS (SELECT e.b AS id, sum(p.r / d.deg) AS m FROM e
          |  JOIN p1 p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
          |p2 AS (SELECT tv.id, (1.0 - 0.85) * tv.tele
          |    + 0.85 * coalesce(c.m, 0) AS r
          |  FROM tv LEFT JOIN c2 c ON tv.id = c.id),
          |c3 AS (SELECT e.b AS id, sum(p.r / d.deg) AS m FROM e
          |  JOIN p2 p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
          |p3 AS (SELECT tv.id, (1.0 - 0.85) * tv.tele
          |    + 0.85 * coalesce(c.m, 0) AS r
          |  FROM tv LEFT JOIN c3 c ON tv.id = c.id),
          |f AS (SELECT id AS doc_id,
          |    CAST(round(r, 6) AS DOUBLE) AS rank FROM p3)
          |SELECT doc_id, rank FROM f WHERE rank > 0
          |ORDER BY doc_id""".stripMargin),

    "graph_pagerank" ->
      // the 3 power-iteration rounds unrolled as chained CTEs (recursive
      // CTEs can't aggregate in the recursive term); (1.0 - 0.85)
      // written as the expression, not a 0.15 literal, so both engines
      // produce the bit-identical IEEE subtraction result
      ("WITH " + ngramGlobalPairsCte + ",\n" +
        """e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs
          |      UNION ALL SELECT doc_b, doc_a FROM gpairs),
          |deg AS (SELECT a AS id, CAST(count(*) AS DOUBLE) AS deg
          |  FROM e GROUP BY 1),
          |v AS (SELECT doc_id AS id FROM documents),
          |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
          |p0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM v),
          |c1 AS (SELECT e.b AS id, sum(p.r / d.deg) AS m FROM e
          |  JOIN p0 p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
          |p1 AS (SELECT v.id, (1.0 - 0.85) / (SELECT n FROM nn)
          |    + 0.85 * coalesce(c.m, 0) AS r
          |  FROM v LEFT JOIN c1 c ON v.id = c.id),
          |c2 AS (SELECT e.b AS id, sum(p.r / d.deg) AS m FROM e
          |  JOIN p1 p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
          |p2 AS (SELECT v.id, (1.0 - 0.85) / (SELECT n FROM nn)
          |    + 0.85 * coalesce(c.m, 0) AS r
          |  FROM v LEFT JOIN c2 c ON v.id = c.id),
          |c3 AS (SELECT e.b AS id, sum(p.r / d.deg) AS m FROM e
          |  JOIN p2 p ON e.a = p.id JOIN deg d ON e.a = d.id GROUP BY e.b),
          |p3 AS (SELECT v.id, (1.0 - 0.85) / (SELECT n FROM nn)
          |    + 0.85 * coalesce(c.m, 0) AS r
          |  FROM v LEFT JOIN c3 c ON v.id = c.id)
          |SELECT id AS doc_id, CAST(round(r, 6) AS DOUBLE) AS rank
          |FROM p3 ORDER BY doc_id""".stripMargin),

    "curation_filters" ->
      // same per-doc signals in SQL; rep ratio re-uses text_rep's shingle
      // count CTE with the identical round-6 canonicalization before the
      // threshold compare
      """WITH s AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |           || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |c AS (SELECT doc_id, sh, count(*) AS n FROM s GROUP BY 1, 2),
        |rr AS (SELECT doc_id,
        |    round(1.0 - count(*) / CAST(sum(n) AS DOUBLE), 6) AS rep
        |  FROM c GROUP BY doc_id),
        |f AS (SELECT d.doc_id,
        |    len(string_split(d.text, ' ')) < 30 AS too_short,
        |    NOT list_has_any(string_split(d.text, ' '), ['the', 'a'])
        |      AS no_stopword,
        |    coalesce(rr.rep, 0) >= 0.04 AS repetitive,
        |    d.lang = 'zh' AS lang_other
        |  FROM documents d LEFT JOIN rr ON d.doc_id = rr.doc_id),
        |x AS (SELECT doc_id, too_short, no_stopword, repetitive, lang_other,
        |    (too_short OR no_stopword OR repetitive OR lang_other) AS any_rule
        |  FROM f),
        |r AS (
        |  SELECT 'too_short' AS rule, count(*) FILTER (WHERE too_short) AS n,
        |    count(*) AS tot FROM x
        |  UNION ALL SELECT 'no_stopword', count(*) FILTER (WHERE no_stopword),
        |    count(*) FROM x
        |  UNION ALL SELECT 'repetitive', count(*) FILTER (WHERE repetitive),
        |    count(*) FROM x
        |  UNION ALL SELECT 'lang_other', count(*) FILTER (WHERE lang_other),
        |    count(*) FROM x
        |  UNION ALL SELECT 'any_rule', count(*) FILTER (WHERE any_rule),
        |    count(*) FROM x
        |  UNION ALL SELECT 'kept', count(*) FILTER (WHERE NOT any_rule),
        |    count(*) FROM x)
        |SELECT rule, n AS n_flagged,
        |  CAST(round(n / CAST(tot AS DOUBLE), 6) AS DOUBLE) AS pct
        |FROM r ORDER BY rule""".stripMargin,

    "text_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |v AS (SELECT token FROM (
        |    SELECT token, count(*) AS n FROM tok GROUP BY token)
        |  ORDER BY n DESC, token LIMIT 16)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(floor(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS DOUBLE)
        |    AS oov_rate
        |FROM tok LEFT JOIN v ON tok.token = v.token
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "curation_pipeline" ->
      // full funnel: the gpairs CTE (shared with the dedup family)
      // restricted to post-exact-dedup survivors, recursive closure for
      // components, keep-the-longest, then the per-(source, lang) card
      ("WITH RECURSIVE " + ngramGlobalPairsCte + ",\n" +
        """d AS (SELECT doc_id, source, lang, n_chars, text,
          |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
          |    string_split(text, ' ') AS toksv
          |  FROM documents),
          |g AS (SELECT * FROM d WHERE ntok >= 30
          |  AND (list_contains(toksv, 'the') OR list_contains(toksv, 'a'))),
          |x AS (SELECT *, row_number() OVER
          |    (PARTITION BY sha256(text) ORDER BY doc_id) AS rnx FROM g),
          |ex AS (SELECT doc_id, source, lang, n_chars, ntok
          |  FROM x WHERE rnx = 1),
          |pe AS (SELECT doc_a, doc_b FROM gpairs
          |  WHERE doc_a IN (SELECT doc_id FROM ex)
          |    AND doc_b IN (SELECT doc_id FROM ex)),
          |e AS (SELECT doc_a AS a, doc_b AS b FROM pe
          |      UNION ALL SELECT doc_b, doc_a FROM pe),
          |r(id, m) AS (SELECT DISTINCT a, a FROM e
          |  UNION
          |  SELECT e.a, r.m FROM e JOIN r ON e.b = r.id),
          |comp AS (SELECT id, min(m) AS canonical FROM r GROUP BY id),
          |asg AS (SELECT ex.*, coalesce(comp.canonical, ex.doc_id) AS canon
          |  FROM ex LEFT JOIN comp ON ex.doc_id = comp.id),
          |k AS (SELECT * FROM (SELECT *, row_number() OVER
          |    (PARTITION BY canon ORDER BY n_chars DESC, doc_id) AS rn
          |  FROM asg) WHERE rn = 1),
          |tot AS (SELECT CAST(sum(ntok) AS BIGINT) AS tok_total FROM k),
          |raw AS (SELECT source, lang, count(*) AS n_raw
          |  FROM documents GROUP BY 1, 2),
          |gc AS (SELECT source, lang, count(*) AS n_gated FROM g GROUP BY 1, 2),
          |ec AS (SELECT source, lang, count(*) AS n_exact FROM ex GROUP BY 1, 2),
          |kc AS (SELECT source, lang, count(*) AS n_kept,
          |    CAST(sum(ntok) AS BIGINT) AS tok_kept FROM k GROUP BY 1, 2)
          |SELECT raw.source, raw.lang, CAST(n_raw AS BIGINT) AS n_raw,
          |  CAST(coalesce(n_gated, 0) AS BIGINT) AS n_gated,
          |  CAST(coalesce(n_exact, 0) AS BIGINT) AS n_exact,
          |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
          |  CAST(coalesce(tok_kept, 0) AS BIGINT) AS tok_kept,
          |  CAST(floor(CAST(coalesce(tok_kept, 0) AS DOUBLE)
          |    / CAST(tok_total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS DOUBLE)
          |    AS mix_weight
          |FROM raw LEFT JOIN gc USING (source, lang)
          |  LEFT JOIN ec USING (source, lang)
          |  LEFT JOIN kc USING (source, lang)
          |  CROSS JOIN tot
          |ORDER BY source, lang""".stripMargin),

    "corpus_mixture" ->
      """WITH t AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, tokens,
        |  CAST(round(power(CAST(tokens AS DOUBLE), 0.7)
        |    / sum(power(CAST(tokens AS DOUBLE), 0.7)) OVER (), 6) AS DOUBLE)
        |    AS weight
        |FROM t ORDER BY source""".stripMargin,

    "dedup_minhash" ->
      s"""WITH h AS ($withHashesSql),
         |sig AS (SELECT doc_id, source, dtoks,
         |  list_transform(range(0, 16), j ->
         |    list_min(list_transform(hsp, v -> ((2*j+3)*v + (5*j+7)) % $P))) AS mh
         |FROM h),
         |bands AS (SELECT doc_id, source, dtoks, b,
         |  array_to_string(list_slice(mh, 8*b + 1, 8*b + 8), '_') AS bkey
         |FROM sig CROSS JOIN (SELECT unnest([0, 1]) AS b)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |    x.dtoks AS ta, y.dtoks AS tb
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.bkey = y.bkey AND x.source = y.source
         |    AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(round(len(list_filter(ta, v -> list_contains(tb, v)))
         |    / CAST(len(list_distinct(list_concat(ta, tb))) AS DOUBLE), 6) AS DOUBLE)
         |    AS jaccard
         |FROM cand ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash" ->
      s"""WITH h AS ($withHashesSql),
         |sh AS (SELECT doc_id, source,
         |  list_sum(list_transform(range(0, 48), i ->
         |    CASE WHEN list_sum(list_transform(hs56, v ->
         |           CASE WHEN (v >> i) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
         |         THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END)) AS simhash
         |FROM h)
         |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM sh x JOIN sh y ON x.source = y.source AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 12
         |ORDER BY doc_a, doc_b""".stripMargin,

    "text_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num_runs,
        |  substring(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+', '<email>', 'g'),
        |      '[0-9]+', '<num>', 'g'),
        |      '[ ]+', ' ', 'g'), 1, 120) AS scrubbed_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_prefix_hamming" ->
      // quadratic reference form — the pigeonhole banding is provably a
      // lossless candidate superset, so results are identical
      """WITH d AS (SELECT doc_id, rpad(substring(text, 1, 48), 48, '.') AS p
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(hamming(a.p, b.p) AS BIGINT) AS dist
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE hamming(a.p, b.p) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_lsh_tuning" ->
      // identical signature arithmetic to dedup_minhash's oracle; per
      // config the band key is the '_'-joined slice of the one 16-perm
      // signature. The truth side is the all-pairs within-source
      // rescore (quadratic is fine in the oracle engine; the Spark side
      // uses the codegen merge walk over the same 622 k pairs).
      s"""WITH h AS ($withHashesSql),
         |mhs AS (SELECT doc_id, source, hs56,
         |  list_transform(range(0, 16), j ->
         |    list_min(list_transform(hsp, v -> ((2*j+3)*v + (5*j+7)) % $P))) AS mh
         |FROM h),
         |cfg AS (SELECT unnest([2, 4, 8]) AS bands),
         |bnd AS (SELECT m.doc_id, m.source, c.bands, bb.b,
         |    array_to_string(list_slice(m.mh,
         |      (16 // c.bands) * bb.b + 1, (16 // c.bands) * (bb.b + 1)),
         |      '_') AS bkey
         |  FROM mhs m CROSS JOIN cfg c
         |  JOIN (SELECT unnest(range(0, 8)) AS b) bb ON bb.b < c.bands),
         |cand AS (SELECT DISTINCT x.bands, x.doc_id AS doc_a,
         |    y.doc_id AS doc_b
         |  FROM bnd x JOIN bnd y ON x.bands = y.bands AND x.b = y.b
         |    AND x.bkey = y.bkey AND x.source = y.source
         |    AND x.doc_id < y.doc_id),
         |resc AS (SELECT c.bands,
         |    round(len(list_filter(a.hs56, v -> list_contains(b.hs56, v)))
         |      / CAST(len(list_distinct(list_concat(a.hs56, b.hs56)))
         |        AS DOUBLE), 6) AS j
         |  FROM cand c JOIN mhs a ON a.doc_id = c.doc_a
         |  JOIN mhs b ON b.doc_id = c.doc_b),
         |truth AS (SELECT count(*) AS n_true
         |  FROM h x JOIN h y ON x.source = y.source AND x.doc_id < y.doc_id
         |  WHERE round(len(list_filter(x.hs56, v -> list_contains(y.hs56, v)))
         |      / CAST(len(list_distinct(list_concat(x.hs56, y.hs56)))
         |        AS DOUBLE), 6) >= 0.8),
         |agg AS (SELECT bands, count(*) AS n_cand,
         |    CAST(sum(CASE WHEN j >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_conf
         |  FROM resc GROUP BY bands),
         |fill AS (SELECT c.bands,
         |    coalesce(a.n_cand, 0) AS n_cand,
         |    coalesce(a.n_conf, 0) AS n_conf
         |  FROM cfg c LEFT JOIN agg a ON a.bands = c.bands)
         |SELECT CAST(bands AS BIGINT) AS bands,
         |  CAST(16 // bands AS BIGINT) AS rows_per_band,
         |  n_cand, n_conf, n_true,
         |  CASE WHEN n_true > 0 THEN
         |    CAST(round(CAST(n_conf AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
         |      AS DOUBLE) END AS recall,
         |  CASE WHEN n_cand > 0 THEN
         |    CAST(round(CAST(n_conf AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
         |      AS DOUBLE) END AS "precision"
         |FROM fill CROSS JOIN truth ORDER BY bands""".stripMargin,

    "dedup_explain" ->
      // the shared 3-gram candidate CTE + per-pair signal recompute:
      // unigram intersection on the hs56 lists (injective on this
      // corpus), the dedup_simhash CTE verbatim, sha-256 of the text as
      // the exact-dup fingerprint. The CASE verdict compares only
      // rounded doubles / integers, so it is engine-stable.
      ("WITH " + ngramGlobalPairsCte + s""",
        |h AS ($withHashesSql),
        |sim AS (SELECT doc_id,
        |  list_sum(list_transform(range(0, 48), i ->
        |    CASE WHEN list_sum(list_transform(hs56, v ->
        |           CASE WHEN (v >> i) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
        |         THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))
        |    AS simhash
        |FROM h),
        |sg AS (SELECT h.doc_id, h.hs56, len(h.hs56) AS nt, s.simhash,
        |    sha256(h.text) AS fp
        |  FROM h JOIN sim s ON s.doc_id = h.doc_id),
        |j AS (SELECT g.doc_a, g.doc_b, g.jaccard, a.nt AS na, b.nt AS nb,
        |    len(list_filter(a.hs56, v -> list_contains(b.hs56, v))) AS i1,
        |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
        |      AS sim_hamming,
        |    (a.fp = b.fp) AS exact_dup
        |  FROM gpairs g JOIN sg a ON g.doc_a = a.doc_id
        |  JOIN sg b ON g.doc_b = b.doc_id),
        |j2 AS (SELECT doc_a, doc_b, jaccard,
        |    CAST(round(i1 / CAST(na + nb - i1 AS DOUBLE), 6) AS DOUBLE)
        |      AS tok_jaccard,
        |    CAST(round(i1 / CAST(na AS DOUBLE), 6) AS DOUBLE) AS cont_a,
        |    CAST(round(i1 / CAST(nb AS DOUBLE), 6) AS DOUBLE) AS cont_b,
        |    sim_hamming, exact_dup
        |  FROM j)
        |SELECT doc_a, doc_b, jaccard AS jaccard3, tok_jaccard,
        |  cont_a, cont_b, sim_hamming, exact_dup,
        |  CASE WHEN exact_dup THEN 'exact'
        |       WHEN jaccard >= 0.8 THEN 'near'
        |       WHEN greatest(cont_a, cont_b) >= 0.9 THEN 'contained'
        |       WHEN sim_hamming <= 12 THEN 'templated'
        |       ELSE 'weak' END AS verdict
        |FROM j2 ORDER BY doc_a, doc_b""".stripMargin)
  )
}
