package graft.operators

import graft.{Canon, QueryGroup, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 corpus-pipeline group — the operations a training-data
  * pipeline runs AROUND the dedup core: incremental dedup of a new
  * snapshot against the persisted corpus index, graph statistics over
  * the near-dup graph, BPE merge mining, deterministic training-shuffle
  * sharding, and LM-based quality scoring.
  *
  * Scale notes per query at the declaration site; the common thread is
  * that every one is a pure hash-partitioned join/agg DAG — no driver
  * state, no global single-task stage (train_shuffle's per-shard
  * row_number partitions by shard; everything else aggregates).
  */
object Corpus extends QueryGroup {

  /** Same deterministic 56-bit hash as the dedup family (sha256 hex
    * prefix) — cross-engine reproducible, so shuffle order and shard
    * assignment are identical in Spark and the oracle.
    */
  private def hash56(c: Column): Column = TextDedup.hash56(c)

  /** The documents corpus as a manifest (lakehouse) table, built once
    * per fixture snapshot: v1 = the existing corpus (doc_id % 10 != 0),
    * v2 = one appended crawl batch (doc_id % 10 == 0) — the substrate
    * for [[dedup_manifest_incremental]]'s file-delta batch read. The
    * same %10 split as dedup_incremental, so the two queries' verdicts
    * are directly comparable.
    */
  private[graft] def docsManifestRoot(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : java.nio.file.Path = {
    import java.nio.file.{Files, Paths}
    val out = ArtifactCache.path("manifest_documents",
      Seq(s"$dir/documents.parquet")) { staging =>
      val root = Paths.get(staging)
      Files.createDirectories(root)
      val docs = Tables.table(spark, dir, "documents")
      val v1 = ManifestTable.appendCommit(root, ManifestTable.stage(
        docs.filter(col("doc_id") % 10 =!= 0).repartition(4),
        root, "corpus"))
      val v2 = ManifestTable.appendCommit(root, ManifestTable.stage(
        docs.filter(col("doc_id") % 10 === 0).repartition(2),
        root, "crawl"))
      require(v1 == 1 && v2 == 2,
        s"documents manifest built versions ($v1,$v2), expected (1,2)")
      Files.createFile(root.resolve("_SUCCESS")): Unit
    }
    java.nio.file.Paths.get(out)
  }

  /** Two unrolled synchronous-LPA rounds over the shared near-dup graph
    * (graph_communities' partition), returned as (vid, lbl) — shared by
    * graph_communities and graph_modularity so the score is computed
    * over EXACTLY the partition the detector reports.
    */
  private def communities(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
      threshold = 0.2)
    val e = pairs.select(col("doc_a").as("s"), col("doc_b").as("d"))
      .unionAll(pairs.select(col("doc_b").as("s"), col("doc_a").as("d")))
    val v = Tables.table(spark, dir, "documents")
      .select(col("doc_id").as("vid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("mv").orderBy(col("c").desc, col("lbl"))
    def round(l: org.apache.spark.sql.DataFrame) = {
      val best = e.join(l, e("d") === l("vid"))
        .groupBy(e("s").as("mv"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("mv"), col("lbl").as("new_lbl"))
      v.join(best, v("vid") === best("mv"), "left")
        .select(col("vid"), coalesce(col("new_lbl"), col("vid")).as("lbl"))
    }
    // r13 opt (guide §3.3/§7.3): the |V|-row label table is referenced
    // up to three times by graph_modularity (degree sum + both endpoint
    // label joins), which would inline the 2-round LPA pipeline — two
    // windows + joins — once per reference; truncating here keeps it
    // one pass (same labels, oracle-proven)
    round(round(v.select(col("vid"), col("vid").as("lbl"))))
      .localCheckpoint(false)
  }

  def queries = Map(
    "graph_triangles" -> { (spark, dir) =>
      // Triangle census of the near-dup graph — the standard structure
      // check on a dedup pair set (triangle-dense = transitive clusters,
      // triangle-free wedges = chaining risk for cluster collapse).
      // Seventh consumer of the materialized shared pair index: edges
      // are the tiny mined artifact, so the 3-way self-join runs over
      // |E| near-dup pairs, never over the corpus. Edges arrive oriented
      // a<b, so e1(a,b)⋈e2(b,c)⋈e3(a,c) counts each triangle exactly
      // once (a<b<c) — two shuffle joins on edge endpoints, both
      // broadcast-eligible at this |E|; wedge counts are one groupBy on
      // vertex degree. Clustering coefficient = 3T/W is a single scalar
      // division of exact longs (IEEE-identical), rounded per policy.
      val e = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val wedges = deg.agg(
        sum(expr("d * (d - 1) DIV 2")).cast("long").as("n_wedges"))
      val edges = e.agg(count(lit(1)).as("n_edges"))
      edges.crossJoin(broadcast(wedges)).crossJoin(broadcast(tri))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          Canon.round6(when(col("n_wedges") > 0,
            lit(3.0) * col("n_triangles") / col("n_wedges"))
            .otherwise(lit(0.0))).as("clustering"))
    },

    "graph_degree_dist" -> { (spark, dir) =>
      // Degree distribution of the near-dup graph — the eighth consumer
      // of the shared pair index, and the diagnostic read before any
      // cluster collapse: a heavy tail here means hub documents
      // (boilerplate) that would glue unrelated clusters together, the
      // signal to cap or drop hot shingles BEFORE running components.
      // Two aggregates over |E| mined pairs (degree per vertex, then
      // vertex count per degree) — nothing touches the corpus, and the
      // output is at most max-degree rows regardless of corpus size.
      val e = TextDedup.sharedNgramPairs(spark, dir, n = 3, threshold = 0.2)
      e.select(col("doc_a").as("v"))
        .unionAll(e.select(col("doc_b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .groupBy("d").agg(count(lit(1)).as("n_vertices"))
        .orderBy("d")
    },

    "graph_link_predict" -> { (spark, dir) =>
      // Link prediction by common-neighbor count over the kNN graph
      // (knn_graph's top-3 edges, undirected): a wedge a–w–b without
      // the closing edge a–b is the classic "probably also similar"
      // signal — the candidate list a graph-ANN refinement (NN-descent)
      // or a dedup rescore pass reads first. (The n-gram near-dup
      // graph is transitively CLOSED on this corpus — every wedge is a
      // triangle — so the demonstration lives on the richer similarity
      // graph: 3 109 of its 3 227 wedge pairs are open at sf0.01.)
      // Plan: after the declared knn_graph build, edges undirect via
      // least/greatest + distinct; the wedge join is the standard
      // two-hop equi-join keyed by the middle vertex (Σ deg², never
      // corpus-sized); existing edges drop via anti-join; top-20 =
      // TakeOrderedAndProject under (count desc, a, b).
      val e = Knn.sharedEdges(spark, dir, k = 3)
        .select(least(col("q_id"), col("idx_id")).as("a"),
          greatest(col("q_id"), col("idx_id")).as("b"))
        .distinct()
      val u = e.select(col("a").as("v"), col("b").as("w"))
        .unionAll(e.select(col("b").as("v"), col("a").as("w")))
      val cand = u.as("x").join(u.as("y"),
          col("x.w") === col("y.w") && col("x.v") < col("y.v"))
        .groupBy(col("x.v").as("a"), col("y.v").as("b"))
        .agg(count(lit(1)).as("common_neighbors"))
      cand.join(e, Seq("a", "b"), "left_anti")
        .orderBy(col("common_neighbors").desc, col("a"), col("b"))
        .limit(20)
    },

    "dedup_incremental" -> { (spark, dir) =>
      // Incremental dedup — the arrival-time shape of the dedup family:
      // a new snapshot (batch = doc_id % 10 == 0, a stand-in for
      // "today's crawl") is checked against the EXISTING corpus without
      // ever re-mining corpus×corpus pairs. The batch's postings join
      // the full posting index (at 100 TB: the PERSISTED
      // [[TextDedup.ngramPostings]] artifact, bucketed by shingle hash —
      // here rebuilt per run because the harness owns no cross-run
      // state); candidate work is Σ (batch postings × list hits), linear
      // in the batch, not the corpus. Batch-batch duplicates come free
      // because batch ⊆ index. Output: one verdict row per batch doc —
      // the admission decision an ingest pipeline acts on.
      val docs = Tables.table(spark, dir, "documents")
      val post = TextDedup.ngramPostings(
        docs, idCol = "doc_id", textCol = "text",
        blockCols = Seq.empty, n = 3)
      val postB = post.filter(col("doc_id") % 10 === 0)
      val pairs = postB.as("x").join(post.as("y"),
          col("x.h") === col("y.h")
            && col("x.doc_id") =!= col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_id"),
          col("y.doc_id").as("partner"),
          col("x.nsh").as("na"), col("y.nsh").as("nb"))
        .agg(count(lit(1)).as("i"))
        .select(col("doc_id"), col("partner"),
          Canon.round6(col("i") / (col("na") + col("nb") - col("i")))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.2)
      val counts = pairs.groupBy("doc_id").agg(
        count(when(col("partner") % 10 =!= 0, 1)).as("n_dup_corpus"),
        count(when(col("partner") % 10 === 0, 1)).as("n_dup_batch"))
      docs.filter(col("doc_id") % 10 === 0).select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_corpus"), lit(0L)).as("n_dup_corpus"),
          coalesce(col("n_dup_batch"), lit(0L)).as("n_dup_batch"))
        .withColumn("verdict",
          when(col("n_dup_corpus") > 0, "dup_of_corpus")
            .when(col("n_dup_batch") > 0, "new_dup_group")
            .otherwise("unique"))
        .orderBy("doc_id")
    },

    "dedup_manifest_incremental" -> { (spark, dir) =>
      // The lakehouse × dedup COMPOSITION (r8 VERDICT item 3) — the
      // production shape both round-8 arcs were building toward:
      // incremental corpus dedup riding the transactional table. The
      // documents corpus is a manifest table (v1 = existing corpus,
      // v2 = append of "today's crawl"); the batch side comes from
      // [[ManifestTable.readIncremental]]'s FILE DELTA — exactly the
      // files the append committed, so the base corpus is never
      // rescanned (Wave109Spec asserts the batch scan's physical
      // inputFiles) — and joins the PERSISTED full-corpus posting
      // index (ArtifactCache, built once per fixture snapshot; the
      // final plan never touches documents.parquet at all). Verdicts
      // are identical to dedup_incremental's: candidate work is
      // Σ (batch postings × list hits), linear in the batch.
      val docs = Tables.table(spark, dir, "documents")
      val root = docsManifestRoot(spark, dir)
      val batch = ManifestTable.readIncremental(spark, root, 1, 2,
        docs.schema)
      val post = ArtifactCache(spark, "ngram_postings3",
        Seq(s"$dir/documents.parquet")) {
        TextDedup.ngramPostings(docs, idCol = "doc_id", textCol = "text",
          blockCols = Seq.empty, n = 3)
      }
      val postB = TextDedup.ngramPostings(batch, idCol = "doc_id",
        textCol = "text", blockCols = Seq.empty, n = 3)
      val pairs = postB.as("x").join(post.as("y"),
          col("x.h") === col("y.h")
            && col("x.doc_id") =!= col("y.doc_id"))
        .groupBy(col("x.doc_id").as("doc_id"),
          col("y.doc_id").as("partner"),
          col("x.nsh").as("na"), col("y.nsh").as("nb"))
        .agg(count(lit(1)).as("i"))
        .select(col("doc_id"), col("partner"),
          Canon.round6(col("i") / (col("na") + col("nb") - col("i")))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.2)
      val counts = pairs.groupBy("doc_id").agg(
        count(when(col("partner") % 10 =!= 0, 1)).as("n_dup_corpus"),
        count(when(col("partner") % 10 === 0, 1)).as("n_dup_batch"))
      batch.select("doc_id")
        .join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_corpus"), lit(0L)).as("n_dup_corpus"),
          coalesce(col("n_dup_batch"), lit(0L)).as("n_dup_batch"))
        .withColumn("verdict",
          when(col("n_dup_corpus") > 0, "dup_of_corpus")
            .when(col("n_dup_batch") > 0, "new_dup_group")
            .otherwise("unique"))
        .orderBy("doc_id")
    },

    "text_zipf" -> { (spark, dir) =>
      // Zipf diagnostic of the corpus vocabulary — the rank-frequency
      // table with the freq·rank product whose (rough) constancy IS
      // Zipf's law, kept log-free on purpose: fitting the slope would
      // drag libm log into the hash compare, while the integer product
      // carries the same diagnostic exactly. The corpus-scale work is
      // ONE token-count aggregate (partial+final); the rank window runs
      // over the vocabulary-sized aggregate only (the documented
      // two-phase rule), and the top-20 cut bounds the output.
      val freq = Tables.table(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("freq").desc, col("token"))
      freq.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("token"), col("freq"),
          (col("freq") * col("rank")).as("freq_x_rank"))
        .orderBy("rank")
    },

    "dedup_chunks" -> { (spark, dir) =>
      // Sub-document boilerplate mining: exact dedup at CHUNK
      // granularity (the text_chunks 64/48 sliding windows) — finds the
      // repeated spans (headers, disclaimers, navigation) that
      // document-level dedup can never see because their host documents
      // differ. The standard pre-training pass after doc-level dedup.
      // Plan: chunking is the text_chunks projection+explode (no
      // shuffle), each chunk reduces to its 56-bit sha fingerprint
      // map-side, ONE hash aggregate groups by fingerprint, and only
      // groups spanning ≥2 documents survive — output is bounded by the
      // boilerplate population, not the corpus. At 100 TB the report
      // keys (h) feed a broadcast semi-join that strips the spans.
      val W = 64L; val S = 48L
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n_tok", size(col("toks")).cast("long"))
        .withColumn("start_tok", explode(
          sequence(lit(0L), greatest(col("n_tok") - 1, lit(0L)), lit(S))))
        .select(col("doc_id"),
          TextDedup.hash56(array_join(
            slice(col("toks"), (col("start_tok") + 1).cast("int"),
              least(lit(W), col("n_tok") - col("start_tok")).cast("int")),
            " ")).as("h"))
        .groupBy("h")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occ"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("n_occ").desc, col("h"))
    },

    "text_chunks" -> { (spark, dir) =>
      // Overlapping sliding-window chunking — the RAG/context-window
      // sibling of pack_chunks (which concatenates; this SPLITS):
      // window 64 tokens, stride 48 (16-token overlap so no boundary
      // ever cuts context on both sides). Chunk boundaries are a pure
      // arithmetic function of the per-doc token count — one projection
      // + explode(sequence), no shuffle at all until the output sort;
      // rows out = Σ ceil(n_tok/stride), linear in the corpus. At
      // 100 TB this runs embarrassingly parallel and the downstream
      // embed/index stages key on (doc_id, chunk_id).
      val W = 64L; val S = 48L
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("start_tok", explode(
          sequence(lit(0L), greatest(col("n_tok") - 1, lit(0L)), lit(S))))
        .select(col("doc_id"), (col("start_tok") / S).cast("long").as("chunk_id"),
          col("start_tok"),
          least(col("start_tok") + W, col("n_tok")).as("end_tok"),
          (least(col("start_tok") + W, col("n_tok")) - col("start_tok"))
            .as("n_tok_chunk"))
        .orderBy("doc_id", "chunk_id")
    },

    "bpe_pair_counts" -> { (spark, dir) =>
      // The counting step of BPE tokenizer training: adjacent CHARACTER
      // pair frequencies weighted by word frequency — the statistic the
      // first merge rule is chosen from. Two-level aggregation keeps the
      // explode cheap: words dedup to (word, count) FIRST (one hash agg
      // over the corpus — the heavy pass), then pairs explode over the
      // distinct-word table only (vocabulary-sized, tiny vs the corpus)
      // weighted by the carried count. At 100 TB that ordering is the
      // whole game: pair explosion over raw text would be tokens × word
      // length rows; over the vocab it is |V| × word length. Top-50 cut
      // via TakeOrderedAndProject (no global sort).
      val words = Tables.table(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wc"))
      words.filter(length(col("w")) >= 2)
        .select(col("wc"), explode(
          expr("transform(sequence(1, length(w) - 1)," +
            " i -> substr(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum("wc").cast("long").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(50)
        // rank window runs AFTER the limit — its input is the 50
        // surviving rows, so the single-partition WindowExec is a
        // constant-size post-step, not a scale hazard
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("c").desc, col("pair"))).cast("long"))
        .select("rnk", "pair", "c")
        .orderBy("rnk")
    },

    "bpe_merge_apply" -> { (spark, dir) =>
      // One FULL BPE training step — selection + application: pick the
      // top pair from the bpe_pair_counts statistic (broadcast 1-row
      // rule), apply it to the VOCABULARY as a left-to-right
      // non-overlapping merge (regex replaceAll's scan order IS the
      // BPE convention; symbols stay '|'-delimited strings, so the
      // merge is one codegen'd regexp_replace over the distinct-word
      // table, never the corpus), then recount adjacent SYMBOL pairs
      // weighted by word count and emit the next top-10 — exactly the
      // loop state a tokenizer trainer carries. Corpus-sized work
      // remains the ONE word-count aggregate; everything after runs on
      // the vocabulary, which is the property that lets 100 TB train a
      // tokenizer at all.
      val words = Tables.table(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("wc"))
      val top = words.filter(length(col("w")) >= 2)
        .select(col("wc"), explode(
          expr("transform(sequence(1, length(w) - 1)," +
            " i -> substr(w, i, 2))")).as("pair"))
        .groupBy("pair").agg(sum("wc").cast("long").as("c"))
        .orderBy(col("c").desc, col("pair")).limit(1)
        .select(col("pair").as("rule"))
      val merged = words
        .withColumn("tagged",
          rtrim(regexp_replace(col("w"), "(.)", "$1|"), "|"))
        .crossJoin(broadcast(top))
        .withColumn("sym", split(
          regexp_replace(col("tagged"),
            concat(substring(col("rule"), 1, 1), lit("\\|"),
              substring(col("rule"), 2, 1)),
            col("rule")),
          "\\|"))
        .filter(size(col("sym")) >= 2)
      merged
        .select(col("wc"), col("rule"), explode(
          expr("transform(sequence(1, size(sym) - 1)," +
            " i -> concat(element_at(sym, i), '+', element_at(sym, i + 1)))"))
          .as("pair2"))
        .groupBy("rule", "pair2").agg(sum("wc").cast("long").as("c"))
        .orderBy(col("c").desc, col("pair2")).limit(10)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("c").desc, col("pair2"))).cast("long"))
        .select("rnk", "rule", "pair2", "c")
        .orderBy("rnk")
    },

    "bpe_train" -> { (spark, dir) =>
      // The full iterative BPE TRAINER (3 merge rounds, unrolled) — the
      // piece bpe_pair_counts (statistic) and bpe_merge_apply (one
      // step) build toward: each round counts adjacent symbol pairs
      // weighted by word frequency, picks the best rule (max count, tie
      // → lexicographically smallest), applies it to the vocabulary,
      // and the next round counts over the MERGED symbols. Output is
      // the ranked merge table a tokenizer ships.
      //
      // Symbols are wrapped "(sym)" and merges are LITERAL string
      // replaces of "(l)(r)" → "(lr)": parens are structural (tokens
      // are [a-z]+), so a multi-char rule can never match inside a
      // larger symbol — the '|'-delimiter form bpe_merge_apply uses is
      // only boundary-safe for the first round — and both engines'
      // replace() scans left-to-right non-overlapping, which IS the BPE
      // merge convention (consecutive pairs "(a)(a)(a)(a)" → two
      // merges, the delimiter-sharing bug a space-joined form hits).
      //
      // Scale shape: the ONE corpus-sized pass is the word-count
      // aggregate, checkpointed so the three rounds (re)read a
      // vocabulary-sized table instead of re-scanning the corpus — at
      // 100 TB this is precisely how tokenizer training stays feasible
      // (SentencePiece-style frequency-table training). Each round is
      // one vocab-sized explode+agg; each rule enters as a broadcast
      // 1-row join, never a collected scalar.
      bpeChain(spark, dir)._1
        .select(col("rnk"), col("l"), col("r"),
          concat(col("l"), col("r")).as("merged"), col("c"))
        .orderBy("rnk")
    },

    "bpe_encode" -> { (spark, dir) =>
      // The INFERENCE side of bpe_train: encode every document with the
      // trained merge table and report the token accounting a training-
      // data pipeline actually budgets with — words, post-merge BPE
      // tokens, characters, and the chars-per-token compression ratio.
      // The encoded vocabulary (word → final symbol count after the 3
      // merges) is vocabulary-sized and joins the exploded document
      // words; the corpus-sized work is one explode + one co-keyed
      // join + one doc-keyed aggregate. At 100 TB the trained vocab is
      // a stored artifact and the encode pass is the only corpus scan —
      // the same train-once/encode-everywhere split real tokenizers
      // run.
      val ntok = bpeChain(spark, dir)._2
        .withColumn("ntok", size(
          expr("regexp_extract_all(enc, '\\\\(([a-z]+)\\\\)', 1)"))
          .cast("long"))
        .select(col("w"), col("ntok"))
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .join(ntok, "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("ntok").as("n_tokens"),
          sum(length(col("w")).cast("long")).as("n_chars"))
        .select(col("doc_id"), col("n_words"), col("n_tokens"),
          col("n_chars"),
          Canon.round6(col("n_chars").cast("double")
            / col("n_tokens").cast("double")).as("chars_per_token"))
        .orderBy("doc_id")
    },

    "train_shuffle" -> { (spark, dir) =>
      // Deterministic global training shuffle + shard assignment: order
      // by a seeded content-independent hash of the key, never rand() —
      // reproducible across engines, runs, and cluster sizes, and
      // resumable mid-epoch (position is derivable, not stored). Plan:
      // shard = hash % 8 is one hash exchange; position is a row_number
      // PER SHARD (parallel across shards, each a local sort of N/8 —
      // no global single-task sort; at 100 TB shards are sized to the
      // downstream trainer's reader parallelism, e.g. 8192).
      val h = hash56(concat(lit("shuf42:"), col("doc_id").cast("string")))
      Tables.table(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("h", h)
        .withColumn("shard", col("h") % 8)
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy("h", "doc_id")).cast("long"))
        .select("shard", "pos", "doc_id", "lang", "source")
        .orderBy("shard", "pos")
    },

    "train_curriculum" -> { (spark, dir) =>
      // Length-based curriculum for training: corpus ordered by
      // (n_tokens, doc_id), cut into 4 EXACT difficulty stages (short
      // docs first — the sequence-length curriculum), round-robin
      // sharded within the global order so every shard ramps with the
      // curriculum. Stage = exact distributed ntile(4) via the
      // win_ntile two-phase (approx-percentile cuts only BALANCE the
      // buckets — any cut set yields identical output — then per-bucket
      // row_number + a broadcast carry-in offset reconstructs the exact
      // global rank; the residual windows run over the B-row offset
      // grid, never the corpus). One corpus exchange total.
      val docs = Tables.table(spark, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val B = 32
      val qs = (1 until B).map(i => i.toDouble / B).mkString(",")
      val cuts = docs.agg(
        expr(s"approx_percentile(n_tokens, array($qs), 10000)").as("cuts"))
      val bucketed = docs.crossJoin(broadcast(cuts))
        .withColumn("bkt", expr("size(filter(cuts, c -> c < n_tokens))"))
        .drop("cuts")
      val offs = bucketed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(
          Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("n", sum("cnt").over(Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select("bkt", "off", "n")
      val inBkt = Window.partitionBy("bkt").orderBy("n_tokens", "doc_id")
      bucketed
        .withColumn("rn", row_number().over(inBkt).cast("long"))
        .join(broadcast(offs), "bkt")
        .withColumn("r", col("off") + col("rn"))
        .withColumn("stage",
          expr("""CASE WHEN r <= (n % 4) * (n div 4 + 1)
                 |     THEN (r - 1) div (n div 4 + 1) + 1
                 |     ELSE n % 4 + (r - 1 - (n % 4) * (n div 4 + 1)) div (n div 4) + 1
                 |END""".stripMargin))
        .withColumn("shard", (col("r") - 1) % 8)
        .select("doc_id", "n_tokens", "stage", "shard")
        .orderBy("doc_id")
    },

    "sample_temperature" -> { (spark, dir) =>
      // EXECUTE the corpus_mixture policy: per-source document quota =
      // floor(weight · B) from the temperature-scaled weights
      // (w_s ∝ tokens_s^0.7, B = 200 — upsampling small sources
      // relative to proportional draw), filled by the deterministic
      // seeded-hash rank (the sample_quota draw, so the materialized
      // mixture is reproducible and append-stable). The weight reuses
      // corpus_mixture's round6 value, making the two queries one
      // policy: quota derivation there, execution here. Plan: one
      // 20-row aggregate + one source-keyed window exchange. The
      // weight denominator Σ tokens^0.7 is an ORDERED double fold
      // (sort_array → aggregate, the stat_kruskal discipline), not an
      // unordered window sum: a parallel double sum's addition order
      // is nondeterministic, and a last-ulp flip would shift
      // floor(round6(w)·200) by 1 vs the oracle (r8 ADVICE).
      val d = Tables.table(spark, dir, "documents")
      val q0 = d.groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
        .withColumn("raw", pow(col("tokens").cast("double"), 0.7))
      val den = q0.agg(expr(
        "aggregate(array_sort(collect_list(raw)), 0D, (acc, x) -> acc + x)")
        .as("den"))
      val quota = q0.crossJoin(broadcast(den))
        .withColumn("w", graft.Canon.round6(col("raw") / col("den")))
        .withColumn("quota", floor(col("w") * 200).cast("long"))
        .select("source", "quota")
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      d.select(col("doc_id"), col("source"), col("lang"),
          hash56(concat(lit("mix|"), col("doc_id").cast("string"))).as("h"))
        .join(broadcast(quota), "source")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= col("quota"))
        .select("source", "rk", "doc_id", "lang")
        .orderBy("source", "rk")
    },

    "text_lm_score" -> { (spark, dir) =>
      // LM-based quality scoring — the model-free form of perplexity
      // filtering: each doc scored by its micro-averaged smoothed bigram
      // probability under the corpus's own add-one LM, score =
      // Σ(c_ab+1) / Σ(c_a+V) over the doc's bigram occurrences. The
      // integer-sums-then-ONE-division form is deliberate: exact long
      // arithmetic all the way to a single IEEE division, so the score
      // is engine-reproducible where per-bigram log-prob sums are not
      // (libm log is not correctly-rounded everywhere). Plan: bigram
      // occurrences join the (a,b)-count table built in the same pass
      // (self-join on the aggregated LM, not a re-scan); V enters as a
      // broadcast 1-row aggregate, never a driver collect. Rare/atypical
      // text scores low — the pretraining quality-filter signal.
      val docs = Tables.table(spark, dir, "documents")
      val t = split(col("text"), " ")
      val occ = docs.select(col("doc_id"), explode(zip_with(
          slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("bg"))
        .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
      val cab = occ.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      val ca = cab.groupBy("a").agg(sum("c_ab").as("c_a"))
      val v = docs.select(explode(t).as("tok"))
        .agg(countDistinct("tok").as("v"))
      occ.join(cab, Seq("a", "b")).join(ca, Seq("a"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          Canon.round6(sum(col("c_ab") + 1).cast("double")
            / sum(col("c_a") + col("v")).cast("double")).as("lm_score"))
        .orderBy("doc_id")
    },

    "sample_quota" -> { (spark, dir) =>
      // Fixed-k per-group deterministic sample — the per-domain QUOTA
      // draw that builds fixed-budget eval slices: rank each language's
      // docs by the engine-independent seeded hash of their id, keep
      // the 5 smallest. Unlike sample_stratified (rate-based, output
      // grows with the corpus), the quota form guarantees ≤ k rows per
      // group at ANY corpus size, and the seeded-hash order makes the
      // draw reproducible and append-stable (new docs displace rather
      // than reshuffle). Plan: ONE (lang) window exchange; at 100 TB
      // the per-partition top-k could further pre-cut before the
      // exchange (the Knn partial-heap pattern) — at k=5 × |langs| the
      // plain window is already bounded.
      val d = Tables.table(spark, dir, "documents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("h"), col("doc_id"))
      d.select(col("doc_id"), col("lang"), col("source"),
          hash56(concat(lit("quota|"), col("doc_id").cast("string")))
            .as("h"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select("lang", "rk", "doc_id", "source")
        .orderBy("lang", "rk")
    },

    "text_cooccur" -> { (spark, dir) =>
      // Token co-occurrence lift over the corpus — the collocation /
      // topic-drift diagnostic. Unbounded pair mining is Σ tokens² per
      // doc; restricting to the top-30 vocabulary (a tiny broadcast
      // built from the same token pass) caps the per-doc fanout at
      // C(30,2) whatever the doc length, so the self-join stays linear
      // in corpus size. Lift = n_ab·N / (df_a·df_b) is exact integer
      // products to ONE IEEE division (both factors < 2^53 — exact in
      // double), then round6 — engine-reproducible without log/PMI
      // libm hazards. Top-20 via TakeOrderedAndProject, never a global
      // sort.
      val docs = Tables.table(spark, dir, "documents")
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok")).limit(30)
      val vt = toks.join(broadcast(vocab), "tok")
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      vt.as("a").join(vt.as("b"),
          col("a.doc_id") === col("b.doc_id")
            && col("a.tok") < col("b.tok"))
        .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
        .agg(count(lit(1)).as("n_ab"),
          max(col("a.df")).as("df_a"), max(col("b.df")).as("df_b"))
        .crossJoin(broadcast(nDocs))
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          Canon.round6((col("n_ab") * col("n_docs")).cast("double")
            / (col("df_a") * col("df_b")).cast("double")).as("lift"))
        .orderBy(col("n_ab").desc, col("tok_a"), col("tok_b"))
        .limit(20)
    },

    "graph_communities" -> { (spark, dir) =>
      // Synchronous label propagation (2 unrolled plurality rounds,
      // deterministic (count DESC, label ASC) tie-break) over the
      // shared near-dup graph — community detection as the topic-
      // cluster diagnostic BEFORE hard dedup collapses components.
      // Ninth consumer of the materialized pair index: every round is
      // one equi-join of the |E|-row edge list against the |V|-row
      // label table + one hash agg + one per-vertex window over ≤ deg
      // rows — the pure dataflow LPA, no driver state, rounds are a
      // fixed unroll so the oracle can mirror them as CTE stages.
      // (Connected components = the transitive-closure limit lives at
      // dedup_clusters; LPA's plurality vote splits chained components
      // that CC would merge — the two answers are complementary.)
      communities(spark, dir)
        .select(col("vid").as("doc_id"), col("lbl").as("community"))
        .orderBy("doc_id")
    },

    "graph_modularity" -> { (spark, dir) =>
      // SCORE the detected partition: Newman modularity
      // Q = Σ_c (e_c/m − (d_c/2m)²), reported per community as its
      // contribution — the quantitative answer to "did LPA find real
      // structure or noise?" that a curation pipeline gates on before
      // trusting topic clusters. Everything is INTEGER until one final
      // fixed-order double expression: m (undirected edge count), e_c
      // (intra edges — one join of the pair list against two broadcast
      // label maps), d_c (degree sums — one keyed agg) — so the score
      // is hash-exact with no float accumulation anywhere. Eleventh
      // consumer of the shared pair index; all inputs are |V|- or
      // |E|-bounded.
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      val lab = communities(spark, dir)
      val m = pairs.agg(count(lit(1)).as("m"))
      val deg = pairs.select(col("doc_a").as("vid"))
        .unionAll(pairs.select(col("doc_b").as("vid")))
        .groupBy("vid").agg(count(lit(1)).as("deg"))
      val dc = lab.join(deg, Seq("vid"), "left")
        .groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"),
          sum(coalesce(col("deg"), lit(0L))).as("d_sum"))
      val ein = pairs
        .join(lab.select(col("vid").as("doc_a"), col("lbl").as("la")), "doc_a")
        .join(lab.select(col("vid").as("doc_b"), col("lbl").as("lb")), "doc_b")
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("community"))
        .agg(count(lit(1)).as("e_in"))
      dc.join(ein, Seq("community"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(m))
        .filter(col("n_members") >= 2)
        .select(col("community"), col("n_members"), col("e_in"),
          col("d_sum"),
          Canon.round6(
            (lit(4.0) * col("m") * col("e_in")
              - (col("d_sum") * col("d_sum")).cast("double"))
              / (lit(4.0) * col("m") * col("m"))).as("contrib"))
        .orderBy("community")
    },

    "graph_assortativity" -> { (spark, dir) =>
      // Degree assortativity of the near-dup graph — do similar docs
      // link to similarly-connected docs (boilerplate hubs vs clique
      // clusters)? Pearson r over the degree pairs of every DIRECTED
      // edge (the standard symmetrized form). All moments are exact
      // long sums over the |E|-row edge×degree join; one fixed-order
      // closed form; NULL when the graph is degree-regular (zero
      // variance) — identically in both engines via the CASE guard.
      // Twelfth consumer of the shared pair index.
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      val e = pairs.select(col("doc_a").as("s"), col("doc_b").as("d"))
        .unionAll(pairs.select(col("doc_b").as("s"), col("doc_a").as("d")))
      val deg = e.groupBy(col("s").as("vid")).agg(count(lit(1)).as("dg"))
      e.join(deg.select(col("vid").as("s"), col("dg").as("da")), "s")
        .join(deg.select(col("vid").as("d"), col("dg").as("db")), "d")
        .agg(count(lit(1)).as("n"),
          sum("da").as("sx"), sum("db").as("sy"),
          sum(col("da") * col("db")).as("sxy"),
          sum(col("da") * col("da")).as("sxx"),
          sum(col("db") * col("db")).as("syy"))
        .select(col("n"),
          when(
            (col("n") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")) > 0
              && (col("n") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double")) > 0,
            Canon.round6(
              (col("n") * col("sxy").cast("double")
                - col("sx").cast("double") * col("sy").cast("double"))
              / sqrt((col("n") * col("sxx").cast("double")
                  - col("sx").cast("double") * col("sx").cast("double"))
                * (col("n") * col("syy").cast("double")
                  - col("sy").cast("double") * col("sy").cast("double")))))
            .as("assortativity"))
    },

    "text_lang_mix" -> { (spark, dir) =>
      // Per-source language-mix profile — the corpus-composition
      // diagnostic a multilingual pretraining mix is balanced against:
      // language count, majority share, and Simpson concentration
      // Σp². The Simpson sum is Σc² / n² with an EXACT integer
      // numerator (Σ over ≤|langs| squared counts folds as longs —
      // never a parallel double sum) and ONE double division; majority
      // share likewise. Two nested aggregates, both map-side combined.
      Tables.table(spark, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n_docs"),
          count(lit(1)).as("n_langs"),
          max("c").as("maxc"),
          sum(col("c") * col("c")).as("sq"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          Canon.round6(col("maxc").cast("double") / col("n_docs"))
            .as("top_share"),
          Canon.round6(col("sq").cast("double")
            / (col("n_docs") * col("n_docs"))).as("simpson"))
        .orderBy("source")
    },

    "text_rarity" -> { (spark, dir) =>
      // Per-document rarity score under the corpus's own unigram model —
      // the perplexity-proxy quality filter (rare-token-heavy docs =
      // OCR noise / gibberish candidates) kept TRANSCENDENTAL-FREE so it
      // hash-matches cross-engine: instead of exp(mean −log p) the score
      // is mean 1/p(t) = mean N/c_t — monotone in the same tail signal,
      // but every operand is one exact-integer IEEE division folded
      // through the decimal-mean policy. Plan: token counts are ONE
      // aggregate (vocab-sized result → broadcast), the corpus total is
      // a 1-row aggregate OF that aggregate (never a re-scan), and the
      // per-doc mean is one partial+final agg keyed on doc_id. At 100 TB
      // the vocab broadcast is the only state; nothing is corpus².
      val tk = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val cnt = tk.groupBy("tok").agg(count(lit(1)).as("c_t"))
      val tot = cnt.agg(sum("c_t").as("n_total"))
      val rarity = col("n_total").cast("double") / col("c_t").cast("double")
      tk.join(broadcast(cnt), "tok")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          (sum(rarity.cast(Canon.Dec)).cast("double") / count(lit(1)))
            .as("avg_raw"),
          max(rarity).as("max_raw"))
        .select(col("doc_id"), col("n_tok"),
          Canon.round6(col("avg_raw")).as("avg_rarity"),
          Canon.round6(col("max_raw")).as("max_rarity"))
        .orderBy("doc_id")
    },

    "dedup_containment" -> { (spark, dir) =>
      // Directional near-dup detection: doc A CONTAINED in doc B when
      // ≥70% of A's 3-gram shingles also occur in B — the excerpt/
      // quotation case Jaccard structurally misses (small A inside big
      // B ⇒ high I/|A|, low I/(|A|+|B|−I)). Same exact inverted-index
      // engine as dedup_ngram (source-blocked postings, Σc² work, one
      // equi-join — never all-pairs); both directions price out of the
      // ONE intersection count, then explode to (contained, container)
      // rows. The 100 TB consumer strips contained docs via a
      // broadcast semi-join on the contained-id column.
      val p = TextDedup.ngramContainmentPairs(
        Tables.table(spark, dir, "documents"),
        idCol = "doc_id", textCol = "text", blockCols = Seq("source"),
        n = 3, threshold = 0.7)
      p.select(explode(array(
          struct(col("doc_a").as("contained"), col("doc_b").as("container"),
            col("cont_a").as("containment")),
          struct(col("doc_b").as("contained"), col("doc_a").as("container"),
            col("cont_b").as("containment")))).as("d"))
        .select(col("d.contained"), col("d.container"), col("d.containment"))
        .filter(col("containment") >= 0.7)
        .orderBy("contained", "container")
    },

    "dedup_substring" -> { (spark, dir) =>
      // ExactSubstr-style duplicated-SPAN report (the method of Lee et
      // al.'s "Deduplicating Training Data Makes Language Models
      // Better", re-expressed relationally): any width-8 word shingle
      // occurring in ≥2 DISTINCT documents marks its 8 tokens as
      // duplicated; per document, overlapping/adjacent duplicated
      // shingle starts merge into maximal spans (gaps-and-islands over
      // positions — new island when pos > prev + 8). Output per
      // affected doc: span count, duplicated tokens, longest span,
      // duplicated fraction.
      // Scale: the positional posting index is ONE corpus pass and
      // linear in tokens; the duplicated-shingle set is one map-side-
      // combined hash groupBy; the island merge is a per-doc keyed
      // window. NO doc×doc join anywhere — unlike similarity dedup,
      // span dedup never materializes candidate pairs, which is what
      // makes exact-substring dedup THE scalable method at 100 TB (the
      // suffix-array formulation is this same computation with k
      // generalized to "longest shared run").
      val k = 8
      val docs = Tables.table(spark, dir, "documents")
      val post = TextDedup.positionalPostings(docs, "doc_id", "text", k)
      val dup = post.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("h")
      val wl = Window.partitionBy("doc_id").orderBy("pos")
      val spans = post.join(dup, "h").select("doc_id", "pos")
        .withColumn("prev", lag("pos", 1).over(wl))
        .withColumn("brk", when(col("prev").isNull
          || col("pos") > col("prev") + k, 1L).otherwise(0L))
        .withColumn("isl",
          sum("brk").over(wl.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "isl")
        .agg(min("pos").as("st"), (max("pos") + lit(k - 1)).as("en"))
      val ntok = docs.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      spans.groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("en") - col("st") + 1L).as("dup_tokens"),
          max(col("en") - col("st") + 1L).as("longest_span"))
        .join(ntok, "doc_id")
        .select(col("doc_id"), col("n_spans"), col("dup_tokens"),
          col("longest_span"), col("n_tokens"),
          Canon.round6(col("dup_tokens").cast("double")
            / col("n_tokens").cast("double")).as("dup_frac"))
        .orderBy("doc_id")
    },

    "dedup_threshold_sweep" -> { (spark, dir) =>
      // Threshold CALIBRATION curve — the question every dedup rollout
      // answers first: how many pairs does each Jaccard cutoff sweep in?
      // One decile histogram over ALL scored shingle-pairs (threshold
      // 0.05 ≈ everything the inverted index surfaces) plus the
      // cumulative pairs-at-or-above column a reviewer reads right off.
      // Scale: the same Σc² posting join as dedup_ngram (3-gram shingles
      // are rare, so candidates stay sparse even unthresholded — this is
      // WHY the sweep uses shingles, not tokens: hot tokens would make
      // every same-block pair a candidate); the histogram and running
      // sum are over ≤10 decile rows.
      val pairs = TextDedup.ngramJaccardPairs(
        Tables.table(spark, dir, "documents"),
        idCol = "doc_id", textCol = "text", blockCols = Seq("source"),
        n = 3, threshold = 0.05)
      val w = Window.orderBy(col("decile").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      pairs
        .withColumn("decile", least(floor(col("jaccard") * 10), lit(9L)))
        .groupBy("decile").agg(count(lit(1)).as("n_pairs"))
        .withColumn("n_at_or_above", sum("n_pairs").over(w))
        .orderBy("decile")
    },

    "graph_kcore" -> { (spark, dir) =>
      // BOUNDED k-core peel (k=2, 4 synchronous rounds) of the MUTUAL
      // kNN graph — the dense-cluster extractor of embedding-space
      // curation: a mutual edge (each of the pair in the other's
      // top-3) is the standard noise-robust neighborhood signal, and
      // vertices surviving degree-<2 peeling sit in mutual clusters
      // worth sampling around, not on chain tails. Peeling is UNROLLED
      // to 4 rounds, the graph_pagerank bounded-iteration discipline:
      // each round is one degree aggregate + two semi-joins — a pure
      // hash-partitioned O(|E|) DAG, no driver state — and production
      // loops rounds to the fixpoint (the measured tail here is a long
      // chain peeling one hop per round; Wave27Spec proves the 4-round
      // result is a SUPERSET of the true core and that rounds only
      // shrink). Reads the shared persisted kNN-edge artifact (its 4th
      // consumer); the mutual self-join is over n·k rows, not the
      // corpus.
      val kk = 2
      val g = Knn.sharedEdges(spark, dir, k = 3)
        .select(col("q_id").as("a"), col("idx_id").as("b"))
      val rev = g.select(col("b").as("ra"), col("a").as("rb"))
      val e0 = g.join(rev, col("a") === col("ra") && col("b") === col("rb"),
        "left_semi")
      def peel(e: org.apache.spark.sql.DataFrame) = {
        val keep = e.groupBy("a").agg(count(lit(1)).as("d"))
          .filter(col("d") >= kk).select(col("a").as("v"))
        e.join(keep, e("a") === keep("v"), "left_semi")
          .join(keep, e("b") === keep("v"), "left_semi")
      }
      // r13 opt (guide §3.3/§7.3): `peel` references its input THREE
      // times (degree agg + two semi-joins), so nesting 4 rounds
      // inlines 3⁴ = 81 copies of e0's subtree — the before-plan was
      // 7.4k lines / 324 scan nodes and Catalyst spent ~2 s planning
      // it (~75% of the query's wall). localCheckpoint between rounds
      // truncates lineage — same per-round O(|E|) work, constant-size
      // plans; identical rows (same peeling), oracle-proven.
      peel(peel(peel(peel(e0).localCheckpoint())
        .localCheckpoint()).localCheckpoint())
        .groupBy(col("a").as("vid")).agg(count(lit(1)).as("degree"))
        .orderBy("vid")
    },

    "dedup_substring_scrub" -> { (spark, dir) =>
      // The APPLY half of dedup_substring: emit each affected document
      // with its duplicated spans REMOVED (the ExactSubstr treatment —
      // cut the shared bytes, keep the unique remainder). Same span
      // mining as the report; the removal is a per-doc anti-join of
      // token positions against the span intervals (spans are tiny and
      // broadcast), and the remainder reassembles deterministically via
      // sort-by-position. Output: kept/removed counts + the scrubbed
      // 120-char prefix. Still no doc×doc join anywhere.
      val k = 8
      val docs = Tables.table(spark, dir, "documents")
      val post = TextDedup.positionalPostings(docs, "doc_id", "text", k)
      val dup = post.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("h")
      val wl = Window.partitionBy("doc_id").orderBy("pos")
      val spans = post.join(dup, "h").select("doc_id", "pos")
        .withColumn("prev", lag("pos", 1).over(wl))
        .withColumn("brk", when(col("prev").isNull
          || col("pos") > col("prev") + k, 1L).otherwise(0L))
        .withColumn("isl",
          sum("brk").over(wl.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "isl")
        .agg(min("pos").as("st"), (max("pos") + lit(k - 1)).as("en"))
      val toksPos = docs
        .join(spans.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ", -1)).as(Seq("p0", "tok")))
        .withColumn("pos", (col("p0") + 1L).cast("long"))
      val kept = toksPos.join(broadcast(spans),
        toksPos("doc_id") === spans("doc_id")
          && col("pos") >= col("st") && col("pos") <= col("en"),
        "left_anti")
      kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr("transform(array_sort(" +
            "collect_list(struct(pos, tok))), x -> x.tok)"), " ")
            .as("scrubbed"))
        .join(docs.select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens")),
          Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_kept"),
          (col("n_tokens") - col("n_kept")).as("n_removed"),
          substring(col("scrubbed"), 1, 120).as("scrubbed_prefix"))
        .orderBy("doc_id")
    },

    "text_ngram_novelty" -> { (spark, dir) =>
      // Crawl-increment novelty: per document (in doc_id = ingestion
      // order), the fraction of its distinct 3-gram shingles appearing
      // for the FIRST time in the corpus — the diminishing-returns
      // curve behind "is another crawl batch still worth ingesting".
      // First occurrence = min(doc_id) per shingle hash (one h-keyed
      // aggregate over the SAME postings artifact the dedup family
      // mines), joined back co-keyed on h, then one doc_id aggregate.
      // All corpus-sized work is two co-keyed hash aggregates + one
      // equi-join — Σ postings, nothing quadratic; at 100 TB the
      // min-doc table is the persisted index's natural companion (an
      // incremental batch updates it with ONE merge).
      val post = TextDedup.ngramPostings(
        Tables.table(spark, dir, "documents"),
        idCol = "doc_id", textCol = "text", blockCols = Seq.empty, n = 3)
      val firstSeen = post.groupBy(col("h").as("fh"))
        .agg(min("doc_id").as("first_doc"))
      post.join(firstSeen, col("h") === col("fh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nsh"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("nsh"), col("n_novel"),
          Canon.round6(col("n_novel").cast("double") / col("nsh"))
            .as("novelty"))
        .orderBy("doc_id")
    },

    "graph_bfs" -> { (spark, dir) =>
      // Breadth-first distances over the near-dup graph from a
      // deterministic seed (the smallest vertex id in the pair set) —
      // the reachability probe behind "how far does this boilerplate
      // family spread", completing the graph family (components =
      // reachability limit, pagerank = stationary mass, BFS = hop
      // metric). Three frontier rounds unrolled as join+agg stages over
      // the |E| mined pairs (tenth consumer of the shared index — the
      // corpus is never touched): frontier ⋈ edges → min-dist union —
      // the standard iterative-dataflow BFS, no driver state; the
      // oracle mirrors the rounds as CTE stages.
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      val e = pairs.select(col("doc_a").as("s"), col("doc_b").as("d"))
        .unionAll(pairs.select(col("doc_b").as("s"), col("doc_a").as("d")))
      val seed = pairs.agg(least(min("doc_a"), min("doc_b")).as("v"))
        .select(col("v"), lit(0L).as("dist"))
      def round(l: org.apache.spark.sql.DataFrame) =
        l.unionAll(
            e.join(l, e("s") === l("v"))
              .select(e("d").as("v"), (col("dist") + 1L).as("dist")))
          .groupBy("v").agg(min("dist").as("dist"))
      round(round(round(seed)))
        .select(col("v").as("doc_id"), col("dist"))
        .orderBy("doc_id")
    },

    "graph_closeness" -> { (spark, dir) =>
      // TRUNCATED closeness centrality for the 5 smallest vertices of
      // the near-dup graph: (reached within 3 hops) / Σdist — the
      // bounded-radius form every at-scale graph system substitutes
      // for exact closeness (exact needs all-pairs distances; radius-k
      // multi-source BFS is k join+agg rounds over |E|·|seeds|, the
      // same dataflow as graph_bfs with a seed label carried through).
      // Eleventh consumer of the shared pair index.
      val pairs = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      val e = pairs.select(col("doc_a").as("s"), col("doc_b").as("d"))
        .unionAll(pairs.select(col("doc_b").as("s"), col("doc_a").as("d")))
      val seeds = e.select(col("s").as("v")).distinct()
        .orderBy("v").limit(5)
        .select(col("v").as("seed"), col("v"), lit(0L).as("dist"))
      def round(l: org.apache.spark.sql.DataFrame) =
        l.unionAll(
            e.join(l, e("s") === l("v"))
              .select(col("seed"), e("d").as("v"),
                (col("dist") + 1L).as("dist")))
          .groupBy("seed", "v").agg(min("dist").as("dist"))
      round(round(round(seeds)))
        .groupBy("seed")
        .agg((count(lit(1)) - 1).as("reached"), sum("dist").as("sumd"))
        .filter(col("sumd") > 0)
        .select(col("seed"), col("reached"),
          Canon.round6(col("reached").cast("double") / col("sumd"))
            .as("closeness"))
        .orderBy("seed")
    },

    "dedup_semantic_hybrid" -> { (spark, dir) =>
      // Multi-signal near-dup triage: the text candidate set (exact
      // 3-gram Jaccard ≥ 0.2, from the shared pair index) FULL OUTER
      // joined with the embedding candidate set (exact cosine ≥ 0.4) —
      // real curation pipelines cross-check surface overlap against
      // semantic similarity because each signal has blind spots
      // (paraphrases have low Jaccard; short boilerplate has odd
      // embeddings). Pairs carrying both signals are the high-
      // confidence removals; single-signal pairs go to review. The
      // outer join runs over two already-tiny pair sets (the corpus
      // never re-joins); the cosine side is the declared lazy-broadcast
      // NL scorer from dedup_embed_cosine. doc_id ≡ vec_id on the
      // aligned prefix of the fixture (FIXTURES.md); text-only pairs
      // outside the embedded prefix keep cosine NULL, which is exactly
      // the triage answer ("no embedding yet").
      val tp = TextDedup.sharedNgramPairs(spark, dir, n = 3,
        threshold = 0.2)
      // the PINNED scorer (LlmVectors.allPairsCos): an unpinned
      // broadcast NL here scored serially off the one-file probe side
      // (measured 5.3 s vs 0.9 s warm at sf0.1 — the identical trap
      // that function's doc records)
      val ep = LlmVectors.allPairsCos(Tables.table(spark, dir, "embeddings"))
        .withColumn("cosine", Canon.round6(col("cos")))
        .filter(col("cosine") >= 0.4)
        .select("id_a", "id_b", "cosine")
      tp.join(ep, col("doc_a") === col("id_a")
          && col("doc_b") === col("id_b"), "full_outer")
        .select(
          coalesce(col("doc_a"), col("id_a")).as("a"),
          coalesce(col("doc_b"), col("id_b")).as("b"),
          col("jaccard"), col("cosine"),
          when(col("jaccard").isNotNull && col("cosine").isNotNull, "both")
            .when(col("jaccard").isNotNull, "text")
            .otherwise("embed").as("signal"))
        .orderBy("a", "b")
    },

    "sample_importance" -> { (spark, dir) =>
      // APPLYING the corpus_mixture weights: a deterministic
      // importance sample targeting 20% of the corpus distributed by
      // the temperature-scaled source weights (up-weighted sources keep
      // more of their docs). Per-source acceptance rate r_s =
      // min(1, 0.2·N·w_s/n_s) is rounded to 6 dp BEFORE the
      // comparison (pow(·,0.7) could differ by an ulp cross-engine; the
      // rounded rate can't), and acceptance is a pure hash-fraction
      // test — reproducible at any cluster size, across engines, and
      // under re-runs, unlike rand()-sampling. One source aggregate
      // (|sources| rows, single-partition window over it), broadcast
      // back, one filtered re-aggregation — two corpus passes, zero
      // corpus shuffles.
      val docs = Tables.table(spark, dir, "documents")
      val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      val rates = docs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
        .withColumn("raw", pow(col("tokens").cast("double"), 0.7))
        // the normalizer folds each pow value through DECIMAL before the
        // window sum — double addition is order-sensitive and the
        // single-partition window row order is not pinned; the decimal
        // fold is associative, so the normalizer is bit-identical at
        // any row order and in both engines
        .withColumn("sraw",
          sum(col("raw").cast(Canon.Dec)).over(all).cast("double"))
        .withColumn("weight", Canon.round6(col("raw") / col("sraw")))
        .withColumn("rate", Canon.round6(least(lit(1.0),
          lit(0.2) * sum("n_docs").over(all)
            * (col("raw") / col("sraw")) / col("n_docs"))))
        .select(col("source").as("rs"), col("n_docs"), col("weight"),
          col("rate"))
      val frac = pmod(TextDedup.hash56(
        concat(lit("imp|"), col("doc_id").cast("string"))), lit(1000000L))
        .cast("double") / 1e6
      val sampled = docs.join(broadcast(rates), col("source") === col("rs"))
        .filter(frac < col("rate"))
        .groupBy(col("source").as("ss"))
        .agg(count(lit(1)).as("n_sampled"))
      rates.join(sampled, col("rs") === col("ss"), "left")
        .select(col("rs").as("source"), col("n_docs"), col("weight"),
          col("rate"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("source")
    }
  )

  /** sha256-prefix 56-bit hash of an expression, DuckDB side. */
  private def h56Sql(e: String): String =
    s"CAST(concat('0x', substring(sha256($e), 1, 14)) AS BIGINT)"

  /** The shared 3-round BPE training chain: returns (merge table with
    * (rnk, l, r, c), final encoded vocabulary with (w, wc, enc)). The
    * word-count aggregate — the one corpus-sized pass — is
    * localCheckpoint'ed so the rounds and any encode consumer read a
    * vocabulary-sized table. Each round's rule enters as a broadcast
    * 1-row join.
    */
  private def bpeChain(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val words = Tables.table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .withColumn("enc", regexp_replace(col("w"), "(.)", "($1)"))
      .select("w", "wc", "enc")
      .localCheckpoint()
    def bestRule(vocab: DataFrame, k: Int): DataFrame = vocab
      .withColumn("sym",
        expr("regexp_extract_all(enc, '\\\\(([a-z]+)\\\\)', 1)"))
      .filter(size(col("sym")) >= 2)
      .select(col("wc"), explode(
        expr("transform(sequence(1, size(sym) - 1)," +
          " i -> concat(element_at(sym, i), '+', element_at(sym, i + 1)))"))
        .as("pair"))
      .groupBy("pair").agg(sum("wc").cast("long").as("c"))
      .orderBy(col("c").desc, col("pair")).limit(1)
      .select(lit(k.toLong).as("rnk"),
        substring_index(col("pair"), "+", 1).as("l"),
        substring_index(col("pair"), "+", -1).as("r"), col("c"))
    def applyRule(vocab: DataFrame, rule: DataFrame): DataFrame = vocab
      .crossJoin(broadcast(rule))
      .withColumn("enc", expr(
        "replace(enc, concat('(', l, ')(', r, ')')," +
          " concat('(', l, r, ')'))"))
      .select("w", "wc", "enc")
    val r1 = bestRule(words, 1)
    val v1 = applyRule(words, r1)
    val r2 = bestRule(v1, 2)
    val v2 = applyRule(v1, r2)
    val r3 = bestRule(v2, 3)
    val v3 = applyRule(v2, r3)
    (r1.unionByName(r2).unionByName(r3), v3)
  }

  /** Shared oracle CTE chain for the 3-round BPE trainer: three
    * unrolled rounds of the same pair — pairs-from-symbols (RE2
    * '\(([a-z]+)\)' extraction; no lookarounds needed because parens
    * are structural), best rule (max count, lexicographic tiebreak),
    * literal "(l)(r)" → "(lr)" replace. Yields CTEs b1..b3 (rules) and
    * v3 (final encoded vocabulary, keyed by w).
    */
  private val bpeCtesSql: String = {
    def round(k: Int) =
      s"""p$k AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS c FROM (
         |    SELECT wc, unnest(list_transform(range(1, len(sym)),
         |      i -> concat(sym[i], '+', sym[i + 1]))) AS pair
         |    FROM (SELECT wc, regexp_extract_all(enc, '\\(([a-z]+)\\)', 1)
         |            AS sym FROM v${k - 1})
         |    WHERE len(sym) >= 2) GROUP BY pair),
         |b$k AS (SELECT $k AS rnk, split_part(pair, '+', 1) AS l,
         |    split_part(pair, '+', 2) AS r, c
         |  FROM p$k ORDER BY c DESC, pair LIMIT 1),
         |v$k AS (SELECT w, wc, replace(enc, concat('(', l, ')(', r, ')'),
         |    concat('(', l, r, ')')) AS enc
         |  FROM v${k - 1} CROSS JOIN b$k)""".stripMargin
    s"""wr AS (SELECT w, count(*) AS wc FROM
       |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w),
       |v0 AS (SELECT w, wc, regexp_replace(w, '(.)', '(\\1)', 'g') AS enc
       |  FROM wr),
       |${round(1)},
       |${round(2)},
       |${round(3)}""".stripMargin
  }

  def oracle = Map(
    "graph_triangles" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |e AS (SELECT doc_a AS a, doc_b AS b FROM gpairs),
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY v),
        |tr AS (SELECT count(*) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        |  FROM deg),
        |ne AS (SELECT count(*) AS n_edges FROM e)
        |SELECT n_edges, n_wedges, n_triangles,
        |  CAST(round(CASE WHEN n_wedges > 0
        |    THEN 3.0 * n_triangles / n_wedges ELSE 0.0 END, 6) AS DOUBLE)
        |    AS clustering
        |FROM ne, w, tr""".stripMargin),

    "graph_degree_dist" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |deg AS (SELECT v, count(*) AS d FROM
        |  (SELECT doc_a AS v FROM gpairs
        |   UNION ALL SELECT doc_b AS v FROM gpairs)
        |  GROUP BY v)
        |SELECT d, count(*) AS n_vertices FROM deg
        |GROUP BY d ORDER BY d""".stripMargin),

    "dedup_incremental" ->
      // oracle mines the FULL pair set (corpus×corpus included — the
      // oracle engine optimizes for simplicity, not incrementality) and
      // restricts to pairs touching the batch; the Spark side must
      // produce identical verdicts from the batch-driven join only
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |pb AS (SELECT doc_a AS doc_id, doc_b AS partner FROM gpairs
        |       UNION ALL
        |       SELECT doc_b AS doc_id, doc_a AS partner FROM gpairs),
        |cnt AS (SELECT doc_id,
        |    count(*) FILTER (WHERE partner % 10 <> 0) AS n_dup_corpus,
        |    count(*) FILTER (WHERE partner % 10 = 0) AS n_dup_batch
        |  FROM pb WHERE doc_id % 10 = 0 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_dup_corpus, 0) AS BIGINT) AS n_dup_corpus,
        |  CAST(coalesce(n_dup_batch, 0) AS BIGINT) AS n_dup_batch,
        |  CASE WHEN coalesce(n_dup_corpus, 0) > 0 THEN 'dup_of_corpus'
        |       WHEN coalesce(n_dup_batch, 0) > 0 THEN 'new_dup_group'
        |       ELSE 'unique' END AS verdict
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
        |LEFT JOIN cnt USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    "dedup_manifest_incremental" ->
      // identical oracle shape to dedup_incremental: the oracle mines
      // the full pair set and restricts to batch-touching pairs — the
      // Spark side must reproduce the verdicts from the manifest's
      // file delta + the persisted index alone
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |pb AS (SELECT doc_a AS doc_id, doc_b AS partner FROM gpairs
        |       UNION ALL
        |       SELECT doc_b AS doc_id, doc_a AS partner FROM gpairs),
        |cnt AS (SELECT doc_id,
        |    count(*) FILTER (WHERE partner % 10 <> 0) AS n_dup_corpus,
        |    count(*) FILTER (WHERE partner % 10 = 0) AS n_dup_batch
        |  FROM pb WHERE doc_id % 10 = 0 GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_dup_corpus, 0) AS BIGINT) AS n_dup_corpus,
        |  CAST(coalesce(n_dup_batch, 0) AS BIGINT) AS n_dup_batch,
        |  CASE WHEN coalesce(n_dup_corpus, 0) > 0 THEN 'dup_of_corpus'
        |       WHEN coalesce(n_dup_batch, 0) > 0 THEN 'new_dup_group'
        |       ELSE 'unique' END AS verdict
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
        |LEFT JOIN cnt USING (doc_id)
        |ORDER BY doc_id""".stripMargin),

    "graph_link_predict" ->
      """WITH s AS (SELECT q.vec_id AS q_id, i.vec_id AS idx_id,
        |    round(list_sum(list_transform(range(1, 65),
        |      k -> CAST(q.embedding[k] AS DOUBLE)
        |           * CAST(i.embedding[k] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(i.embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
        |      AS cosine
        |  FROM embeddings q JOIN embeddings i ON q.vec_id <> i.vec_id),
        |r AS (SELECT q_id, idx_id, ROW_NUMBER() OVER
        |    (PARTITION BY q_id ORDER BY cosine DESC, idx_id) AS rank
        |  FROM s),
        |e0 AS (SELECT q_id AS a, idx_id AS b FROM r WHERE rank <= 3),
        |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
        |  FROM e0),
        |u AS (SELECT a AS v, b AS w FROM e UNION ALL SELECT b, a FROM e),
        |cand AS (SELECT x.v AS a, y.v AS b, count(*) AS common_neighbors
        |  FROM u x JOIN u y ON x.w = y.w AND x.v < y.v
        |  GROUP BY 1, 2),
        |nc AS (SELECT c.a, c.b, c.common_neighbors FROM cand c
        |  LEFT JOIN e g ON c.a = g.a AND c.b = g.b
        |  WHERE g.a IS NULL)
        |SELECT a, b, common_neighbors FROM nc
        |ORDER BY common_neighbors DESC, a, b LIMIT 20""".stripMargin,

    "text_zipf" ->
      """WITH f AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS freq FROM f GROUP BY token),
        |r AS (SELECT token, freq, CAST(row_number() OVER
        |    (ORDER BY freq DESC, token) AS BIGINT) AS rank FROM c)
        |SELECT rank, token, freq, freq * rank AS freq_x_rank
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "dedup_chunks" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (SELECT doc_id, toks, n_tok,
        |    unnest(range(0, greatest(n_tok, 1), 48)) AS st FROM d),
        |c AS (SELECT doc_id,
        |    array_to_string(list_slice(toks, st + 1, least(st + 64, n_tok)),
        |      ' ') AS t
        |  FROM s),
        |hh AS (SELECT doc_id,
        |    CAST(concat('0x', substring(sha256(t), 1, 14)) AS BIGINT) AS h
        |  FROM c)
        |SELECT h, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ,
        |  min(doc_id) AS first_doc
        |FROM hh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, n_occ DESC, h""".stripMargin,

    "text_chunks" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |s AS (SELECT doc_id, n_tok,
        |    unnest(range(0, greatest(n_tok, 1), 48)) AS start_tok FROM d)
        |SELECT doc_id, start_tok // 48 AS chunk_id, start_tok,
        |  least(start_tok + 64, n_tok) AS end_tok,
        |  least(start_tok + 64, n_tok) - start_tok AS n_tok_chunk
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "bpe_merge_apply" ->
      // same selection statistic, same left-to-right regex merge
      // convention, same '|' symbol delimiter; '\|' is a literal
      // backslash-pipe in DuckDB standard strings
      """WITH w AS (SELECT w, count(*) AS wc FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |pc AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS c FROM
        |    (SELECT unnest(list_transform(range(1, len(w)),
        |       i -> substring(w, i, 2))) AS pair, wc
        |     FROM w WHERE len(w) >= 2)
        |  GROUP BY pair),
        |top AS (SELECT pair AS rule FROM pc
        |  ORDER BY c DESC, pair LIMIT 1),
        |t AS (SELECT wc, rtrim(regexp_replace(w, '(.)', '\1|', 'g'), '|')
        |    AS tagged FROM w),
        |m AS (SELECT wc, rule, string_split(
        |    regexp_replace(tagged,
        |      concat(substring(rule, 1, 1), '\|', substring(rule, 2, 1)),
        |      rule, 'g'), '|') AS sym
        |  FROM t CROSS JOIN top),
        |p2 AS (SELECT wc, rule,
        |    unnest(list_transform(range(1, len(sym)),
        |      i -> concat(sym[i], '+', sym[i + 1]))) AS pair2
        |  FROM m WHERE len(sym) >= 2),
        |agg AS (SELECT rule, pair2, CAST(sum(wc) AS BIGINT) AS c
        |  FROM p2 GROUP BY rule, pair2
        |  ORDER BY c DESC, pair2 LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY c DESC, pair2) AS BIGINT)
        |    AS rnk, rule, pair2, c
        |FROM agg ORDER BY rnk""".stripMargin,

    "bpe_train" ->
      s"""WITH $bpeCtesSql
         |SELECT CAST(rnk AS BIGINT) AS rnk, l, r, concat(l, r) AS merged, c
         |FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2
         |      UNION ALL SELECT * FROM b3)
         |ORDER BY rnk""".stripMargin,

    "bpe_encode" ->
      // same trained chain; the final vocabulary's symbol count joins
      // the exploded document words
      s"""WITH $bpeCtesSql,
         |nt AS (SELECT w, CAST(len(regexp_extract_all(enc,
         |    '\\(([a-z]+)\\)', 1)) AS BIGINT) AS ntok FROM v3),
         |d AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |  CAST(sum(len(w)) AS BIGINT) AS n_chars,
         |  CAST(round(CAST(sum(len(w)) AS DOUBLE)
         |    / CAST(sum(ntok) AS DOUBLE), 6) AS DOUBLE) AS chars_per_token
         |FROM d JOIN nt USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "bpe_pair_counts" ->
      """WITH w AS (SELECT w, count(*) AS wc FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |p AS (SELECT unnest(list_transform(range(1, len(w)),
        |    i -> substring(w, i, 2))) AS pair, wc
        |  FROM w WHERE len(w) >= 2),
        |c AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS c FROM p
        |  GROUP BY pair)
        |SELECT CAST(row_number() OVER (ORDER BY c DESC, pair) AS BIGINT)
        |    AS rnk, pair, c
        |FROM c ORDER BY c DESC, pair LIMIT 50""".stripMargin,

    "train_curriculum" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(ntile(4) OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
        |    AS stage,
        |  (row_number() OVER (ORDER BY n_tokens, doc_id) - 1) % 8
        |    AS shard
        |FROM d ORDER BY doc_id""".stripMargin,

    "sample_temperature" ->
      s"""WITH t AS (SELECT source,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
         |  FROM documents GROUP BY source),
         |d AS (SELECT list_sum(list_sort(list(
         |      power(CAST(tokens AS DOUBLE), 0.7)))) AS den FROM t),
         |q AS (SELECT source,
         |    CAST(floor(CAST(round(power(CAST(tokens AS DOUBLE), 0.7)
         |      / den, 6)
         |      AS DOUBLE) * 200) AS BIGINT) AS quota
         |  FROM t CROSS JOIN d),
         |h AS (SELECT doc_id, source, lang,
         |    ${h56Sql("concat('mix|', CAST(doc_id AS VARCHAR))")} AS hh
         |  FROM documents),
         |r AS (SELECT source, doc_id, lang,
         |    row_number() OVER (PARTITION BY source ORDER BY hh, doc_id)
         |      AS rk
         |  FROM h)
         |SELECT r.source, CAST(rk AS BIGINT) AS rk, doc_id, lang
         |FROM r JOIN q ON r.source = q.source
         |WHERE rk <= quota ORDER BY r.source, rk""".stripMargin,

    "train_shuffle" ->
      s"""WITH h AS (SELECT doc_id, lang, source,
         |    ${h56Sql("concat('shuf42:', CAST(doc_id AS VARCHAR))")} AS h
         |  FROM documents)
         |SELECT h % 8 AS shard,
         |  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id)
         |    AS BIGINT) AS pos,
         |  doc_id, lang, source
         |FROM h ORDER BY shard, pos""".stripMargin,

    "text_lm_score" ->
      """WITH td AS (SELECT doc_id, string_split(text, ' ') AS s
        |  FROM documents),
        |ix AS (SELECT doc_id, s, unnest(range(1, len(s))) AS i FROM td),
        |pr AS (SELECT doc_id, s[i] AS a, s[i+1] AS b FROM ix),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM pr GROUP BY 1, 2),
        |ca AS (SELECT a, CAST(sum(c_ab) AS BIGINT) AS c_a FROM cab
        |  GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS v FROM
        |  (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)),
        |j AS (SELECT pr.doc_id, cab.c_ab, ca.c_a FROM pr
        |  JOIN cab USING (a, b) JOIN ca USING (a))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(round(CAST(sum(c_ab + 1) AS DOUBLE)
        |    / CAST(sum(c_a + (SELECT v FROM v)) AS DOUBLE), 6) AS DOUBLE)
        |    AS lm_score
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "sample_quota" ->
      s"""WITH h AS (SELECT doc_id, lang, source,
         |    ${h56Sql("concat('quota|', CAST(doc_id AS VARCHAR))")} AS hh
         |  FROM documents),
         |r AS (SELECT lang, doc_id, source,
         |    row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id)
         |      AS rk
         |  FROM h)
         |SELECT lang, rk, doc_id, source FROM r WHERE rk <= 5
         |ORDER BY lang, rk""".stripMargin,

    "text_cooccur" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |v AS (SELECT tok, count(*) AS df FROM tk GROUP BY 1
        |  ORDER BY df DESC, tok LIMIT 30),
        |vt AS (SELECT doc_id, tok, df FROM tk JOIN v USING (tok)),
        |c AS (SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab,
        |    max(a.df) AS df_a, max(b.df) AS df_b
        |  FROM vt a JOIN vt b
        |    ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT tok_a, tok_b, n_ab,
        |  CAST(round(CAST(n_ab * n_docs AS DOUBLE)
        |    / CAST(df_a * df_b AS DOUBLE), 6) AS DOUBLE) AS lift
        |FROM c CROSS JOIN n
        |ORDER BY n_ab DESC, tok_a, tok_b LIMIT 20""".stripMargin,

    "graph_communities" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |e AS (SELECT doc_a AS s, doc_b AS d FROM gpairs
        |  UNION ALL SELECT doc_b, doc_a FROM gpairs),
        |v AS (SELECT doc_id AS vid FROM documents),
        |l0 AS (SELECT vid, vid AS lbl FROM v),
        |m1 AS (SELECT e.s AS mv, l0.lbl, count(*) AS c
        |  FROM e JOIN l0 ON e.d = l0.vid GROUP BY 1, 2),
        |b1 AS (SELECT mv, lbl FROM (SELECT mv, lbl, row_number()
        |    OVER (PARTITION BY mv ORDER BY c DESC, lbl) AS rn FROM m1)
        |  WHERE rn = 1),
        |l1 AS (SELECT v.vid, COALESCE(b1.lbl, v.vid) AS lbl
        |  FROM v LEFT JOIN b1 ON v.vid = b1.mv),
        |m2 AS (SELECT e.s AS mv, l1.lbl, count(*) AS c
        |  FROM e JOIN l1 ON e.d = l1.vid GROUP BY 1, 2),
        |b2 AS (SELECT mv, lbl FROM (SELECT mv, lbl, row_number()
        |    OVER (PARTITION BY mv ORDER BY c DESC, lbl) AS rn FROM m2)
        |  WHERE rn = 1),
        |l2 AS (SELECT v.vid, COALESCE(b2.lbl, v.vid) AS lbl
        |  FROM v LEFT JOIN b2 ON v.vid = b2.mv)
        |SELECT vid AS doc_id, lbl AS community FROM l2
        |ORDER BY doc_id""".stripMargin),

    "graph_modularity" ->
      // the SAME two LPA rounds as graph_communities, then integer
      // m / e_c / d_c and one fixed-order double expression per row
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |e AS (SELECT doc_a AS s, doc_b AS d FROM gpairs
        |  UNION ALL SELECT doc_b, doc_a FROM gpairs),
        |v AS (SELECT doc_id AS vid FROM documents),
        |l0 AS (SELECT vid, vid AS lbl FROM v),
        |m1 AS (SELECT e.s AS mv, l0.lbl, count(*) AS c
        |  FROM e JOIN l0 ON e.d = l0.vid GROUP BY 1, 2),
        |b1 AS (SELECT mv, lbl FROM (SELECT mv, lbl, row_number()
        |    OVER (PARTITION BY mv ORDER BY c DESC, lbl) AS rn FROM m1)
        |  WHERE rn = 1),
        |l1 AS (SELECT v.vid, COALESCE(b1.lbl, v.vid) AS lbl
        |  FROM v LEFT JOIN b1 ON v.vid = b1.mv),
        |m2 AS (SELECT e.s AS mv, l1.lbl, count(*) AS c
        |  FROM e JOIN l1 ON e.d = l1.vid GROUP BY 1, 2),
        |b2 AS (SELECT mv, lbl FROM (SELECT mv, lbl, row_number()
        |    OVER (PARTITION BY mv ORDER BY c DESC, lbl) AS rn FROM m2)
        |  WHERE rn = 1),
        |l2 AS (SELECT v.vid, COALESCE(b2.lbl, v.vid) AS lbl
        |  FROM v LEFT JOIN b2 ON v.vid = b2.mv),
        |mm AS (SELECT count(*) AS m FROM gpairs),
        |deg AS (SELECT s AS vid, count(*) AS deg FROM e GROUP BY s),
        |dc AS (SELECT l2.lbl AS community, count(*) AS n_members,
        |    CAST(sum(COALESCE(deg.deg, 0)) AS BIGINT) AS d_sum
        |  FROM l2 LEFT JOIN deg ON l2.vid = deg.vid
        |  GROUP BY l2.lbl),
        |ein AS (SELECT a.lbl AS community, count(*) AS e_in
        |  FROM gpairs p JOIN l2 a ON p.doc_a = a.vid
        |    JOIN l2 b ON p.doc_b = b.vid
        |  WHERE a.lbl = b.lbl GROUP BY a.lbl)
        |SELECT dc.community, dc.n_members,
        |  CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in, dc.d_sum,
        |  CAST(round((4.0 * m * COALESCE(ein.e_in, 0)
        |      - CAST(dc.d_sum * dc.d_sum AS DOUBLE))
        |    / (4.0 * m * m), 6) AS DOUBLE) AS contrib
        |FROM dc LEFT JOIN ein ON dc.community = ein.community
        |  CROSS JOIN mm
        |WHERE dc.n_members >= 2
        |ORDER BY dc.community""".stripMargin),

    "graph_assortativity" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |e AS (SELECT doc_a AS s, doc_b AS d FROM gpairs
        |  UNION ALL SELECT doc_b, doc_a FROM gpairs),
        |deg AS (SELECT s AS vid, count(*) AS dg FROM e GROUP BY s),
        |j AS (SELECT da.dg AS da, db.dg AS db
        |  FROM e JOIN deg da ON e.s = da.vid
        |    JOIN deg db ON e.d = db.vid),
        |s AS (SELECT count(*) AS n,
        |    CAST(sum(da) AS BIGINT) AS sx, CAST(sum(db) AS BIGINT) AS sy,
        |    CAST(sum(da * db) AS BIGINT) AS sxy,
        |    CAST(sum(da * da) AS BIGINT) AS sxx,
        |    CAST(sum(db * db) AS BIGINT) AS syy
        |  FROM j)
        |SELECT n,
        |  CASE WHEN (n * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
        |      AND (n * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
        |    THEN CAST(round((n * CAST(sxy AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / sqrt((n * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |        * (n * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |      AS DOUBLE)
        |  END AS assortativity
        |FROM s""".stripMargin),

    "text_lang_mix" ->
      """WITH c AS (SELECT source, lang, count(*) AS c
        |  FROM documents GROUP BY source, lang),
        |s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |    count(*) AS n_langs, CAST(max(c) AS BIGINT) AS maxc,
        |    CAST(sum(c * c) AS BIGINT) AS sq
        |  FROM c GROUP BY source)
        |SELECT source, n_docs, n_langs,
        |  CAST(round(CAST(maxc AS DOUBLE) / n_docs, 6) AS DOUBLE)
        |    AS top_share,
        |  CAST(round(CAST(sq AS DOUBLE) / (n_docs * n_docs), 6) AS DOUBLE)
        |    AS simpson
        |FROM s ORDER BY source""".stripMargin,

    "text_rarity" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, count(*) AS c_t FROM tk GROUP BY 1),
        |n AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_total FROM c)
        |SELECT doc_id, count(*) AS n_tok,
        |  CAST(round(CAST(sum(CAST(CAST(n_total AS DOUBLE)
        |      / CAST(c_t AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS DOUBLE) AS avg_rarity,
        |  CAST(round(max(CAST(n_total AS DOUBLE) / CAST(c_t AS DOUBLE)),
        |    6) AS DOUBLE) AS max_rarity
        |FROM tk JOIN c USING (tok) CROSS JOIN n
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_containment" ->
      """WITH t AS (SELECT doc_id, source,
        |  list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' '
        |      || string_split(text,' ')[i+1] || ' '
        |      || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |post AS (SELECT doc_id, source, len(sh) AS nsh, unnest(sh) AS s
        |  FROM t),
        |cp AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |    x.nsh AS na, y.nsh AS nb, count(*) AS i
        |  FROM post x JOIN post y
        |    ON x.s = y.s AND x.source = y.source AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |d AS (SELECT a AS contained, b AS container,
        |    round(i / CAST(na AS DOUBLE), 6) AS c FROM cp
        |  UNION ALL SELECT b, a, round(i / CAST(nb AS DOUBLE), 6) FROM cp)
        |SELECT contained, container, CAST(c AS DOUBLE) AS containment
        |FROM d WHERE c >= 0.7
        |ORDER BY contained, container""".stripMargin,

    "dedup_substring" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    CAST(concat('0x', substring(
        |      sha256(array_to_string(t[i:i+7], ' ')), 1, 14)) AS BIGINT) AS h
        |  FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        |  WHERE len(t) >= 8),
        |dup AS (SELECT h FROM sh GROUP BY h
        |  HAVING count(DISTINCT doc_id) >= 2),
        |p AS (SELECT doc_id, pos FROM sh JOIN dup USING (h)),
        |w AS (SELECT doc_id, pos,
        |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM p),
        |b AS (SELECT doc_id, pos,
        |    CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END AS brk
        |  FROM w),
        |i AS (SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM b),
        |sp AS (SELECT doc_id, isl, min(pos) AS st, max(pos) + 7 AS en
        |  FROM i GROUP BY doc_id, isl),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |    CAST(sum(en - st + 1) AS BIGINT) AS dup_tokens,
        |    CAST(max(en - st + 1) AS BIGINT) AS longest_span
        |  FROM sp GROUP BY doc_id),
        |nt AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT a.doc_id, n_spans, dup_tokens, longest_span, n_tokens,
        |  CAST(floor(CAST(dup_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS DOUBLE) AS dup_frac
        |FROM agg a JOIN nt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "dedup_substring_scrub" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    CAST(concat('0x', substring(
        |      sha256(array_to_string(t[i:i+7], ' ')), 1, 14)) AS BIGINT) AS h
        |  FROM toks, unnest(range(1, len(t) - 6)) AS u(i)
        |  WHERE len(t) >= 8),
        |dup AS (SELECT h FROM sh GROUP BY h
        |  HAVING count(DISTINCT doc_id) >= 2),
        |p AS (SELECT doc_id, pos FROM sh JOIN dup USING (h)),
        |w AS (SELECT doc_id, pos,
        |    lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM p),
        |b AS (SELECT doc_id, pos,
        |    CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END AS brk
        |  FROM w),
        |isl AS (SELECT doc_id, pos,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
        |  FROM b),
        |sp AS (SELECT doc_id, g, min(pos) AS st, max(pos) + 7 AS en
        |  FROM isl GROUP BY doc_id, g),
        |tp AS (SELECT toks.doc_id, CAST(i AS BIGINT) AS pos, t[i] AS tok
        |  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
        |  WHERE toks.doc_id IN (SELECT DISTINCT doc_id FROM sp)),
        |kept AS (SELECT tp.doc_id, pos, tok FROM tp
        |  WHERE NOT EXISTS (SELECT 1 FROM sp
        |    WHERE sp.doc_id = tp.doc_id AND tp.pos BETWEEN sp.st AND sp.en)),
        |gg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(tok, ' ' ORDER BY pos) AS scrubbed
        |  FROM kept GROUP BY doc_id),
        |nt AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT gg.doc_id, n_tokens, n_kept, n_tokens - n_kept AS n_removed,
        |  substring(scrubbed, 1, 120) AS scrubbed_prefix
        |FROM gg JOIN nt USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_ngram_novelty" ->
      """WITH t AS (SELECT doc_id,
        |  list_distinct(list_transform(
        |    range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' '
        |      || string_split(text,' ')[i+1] || ' '
        |      || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |post AS (SELECT doc_id, unnest(sh) AS s FROM t),
        |fs AS (SELECT s, min(doc_id) AS first_doc FROM post GROUP BY 1)
        |SELECT doc_id, count(*) AS nsh,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1
        |      ELSE 0 END) AS DOUBLE) / count(*), 6) AS DOUBLE) AS novelty
        |FROM post JOIN fs USING (s)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_threshold_sweep" ->
      """WITH t AS (SELECT doc_id, source,
        |  list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
        |         || ' ' || string_split(text,' ')[i+2])) AS sh
        |  FROM documents WHERE len(string_split(text,' ')) >= 3),
        |p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |    round(len(list_filter(x.sh, v -> list_contains(y.sh, v)))
        |      / CAST(len(x.sh) + len(y.sh)
        |        - len(list_filter(x.sh, v -> list_contains(y.sh, v)))
        |        AS DOUBLE), 6) AS j
        |  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
        |  WHERE len(list_filter(x.sh, v -> list_contains(y.sh, v))) > 0),
        |f AS (SELECT least(CAST(floor(j * 10) AS BIGINT), 9) AS decile
        |  FROM p WHERE j >= 0.05),
        |h AS (SELECT decile, count(*) AS n_pairs FROM f GROUP BY decile)
        |SELECT decile, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  CAST(sum(n_pairs) OVER (ORDER BY decile DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_at_or_above
        |FROM h ORDER BY decile""".stripMargin,

    "graph_kcore" ->
      s"""WITH s AS (SELECT q.vec_id AS q_id, i.vec_id AS idx_id,
         |    CAST(round(${LlmVectors.cosDuck("q.embedding", "i.embedding")},
         |      6) AS DOUBLE) AS cosine
         |  FROM embeddings q JOIN embeddings i ON q.vec_id <> i.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER
         |    (PARTITION BY q_id ORDER BY cosine DESC, idx_id) AS rank
         |  FROM s),
         |g AS (SELECT q_id, idx_id FROM r WHERE rank <= 3),
         |e0 AS (SELECT x.q_id AS a, x.idx_id AS b FROM g x
         |  JOIN g y ON x.q_id = y.idx_id AND x.idx_id = y.q_id),
         |v1 AS (SELECT a AS v FROM e0 GROUP BY a HAVING count(*) >= 2),
         |e1 AS (SELECT e0.a, e0.b FROM e0
         |  JOIN v1 x ON e0.a = x.v JOIN v1 y ON e0.b = y.v),
         |v2 AS (SELECT a AS v FROM e1 GROUP BY a HAVING count(*) >= 2),
         |e2 AS (SELECT e1.a, e1.b FROM e1
         |  JOIN v2 x ON e1.a = x.v JOIN v2 y ON e1.b = y.v),
         |v3 AS (SELECT a AS v FROM e2 GROUP BY a HAVING count(*) >= 2),
         |e3 AS (SELECT e2.a, e2.b FROM e2
         |  JOIN v3 x ON e2.a = x.v JOIN v3 y ON e2.b = y.v),
         |v4 AS (SELECT a AS v FROM e3 GROUP BY a HAVING count(*) >= 2),
         |e4 AS (SELECT e3.a, e3.b FROM e3
         |  JOIN v4 x ON e3.a = x.v JOIN v4 y ON e3.b = y.v)
         |SELECT a AS vid, CAST(count(*) AS BIGINT) AS degree
         |FROM e4 GROUP BY a ORDER BY vid""".stripMargin,

    "graph_bfs" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |e AS (SELECT doc_a AS s, doc_b AS d FROM gpairs
        |  UNION ALL SELECT doc_b, doc_a FROM gpairs),
        |seed AS (SELECT least(min(doc_a), min(doc_b)) AS v,
        |    CAST(0 AS BIGINT) AS dist FROM gpairs),
        |l1 AS (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        |  SELECT v, dist FROM seed
        |  UNION ALL SELECT e.d, dist + 1 FROM e JOIN seed ON e.s = seed.v)
        |  GROUP BY v),
        |l2 AS (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        |  SELECT v, dist FROM l1
        |  UNION ALL SELECT e.d, dist + 1 FROM e JOIN l1 ON e.s = l1.v)
        |  GROUP BY v),
        |l3 AS (SELECT v, CAST(min(dist) AS BIGINT) AS dist FROM (
        |  SELECT v, dist FROM l2
        |  UNION ALL SELECT e.d, dist + 1 FROM e JOIN l2 ON e.s = l2.v)
        |  GROUP BY v)
        |SELECT v AS doc_id, dist FROM l3 ORDER BY doc_id""".stripMargin),

    "graph_closeness" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + """,
        |e AS (SELECT doc_a AS s, doc_b AS d FROM gpairs
        |  UNION ALL SELECT doc_b, doc_a FROM gpairs),
        |seeds AS (SELECT v AS seed, v, CAST(0 AS BIGINT) AS dist FROM (
        |  SELECT DISTINCT s AS v FROM e ORDER BY v LIMIT 5)),
        |l1 AS (SELECT seed, v, CAST(min(dist) AS BIGINT) AS dist FROM (
        |  SELECT seed, v, dist FROM seeds
        |  UNION ALL SELECT seed, e.d, dist + 1
        |    FROM e JOIN seeds ON e.s = seeds.v)
        |  GROUP BY seed, v),
        |l2 AS (SELECT seed, v, CAST(min(dist) AS BIGINT) AS dist FROM (
        |  SELECT seed, v, dist FROM l1
        |  UNION ALL SELECT seed, e.d, dist + 1 FROM e JOIN l1 ON e.s = l1.v)
        |  GROUP BY seed, v),
        |l3 AS (SELECT seed, v, CAST(min(dist) AS BIGINT) AS dist FROM (
        |  SELECT seed, v, dist FROM l2
        |  UNION ALL SELECT seed, e.d, dist + 1 FROM e JOIN l2 ON e.s = l2.v)
        |  GROUP BY seed, v),
        |a AS (SELECT seed, count(*) - 1 AS reached,
        |    CAST(sum(dist) AS BIGINT) AS sumd
        |  FROM l3 GROUP BY seed)
        |SELECT seed, CAST(reached AS BIGINT) AS reached,
        |  CAST(floor(CAST(reached AS DOUBLE) / sumd * 1e6 + 0.5) / 1e6
        |    AS DOUBLE) AS closeness
        |FROM a WHERE sumd > 0 ORDER BY seed""".stripMargin),

    "dedup_semantic_hybrid" ->
      ("WITH " + LlmText.ngramGlobalPairsCte + s""",
        |ep AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(round(${LlmVectors.cosDuck("a.embedding", "b.embedding")},
        |      6) AS DOUBLE) AS cosine
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(${LlmVectors.cosDuck("a.embedding", "b.embedding")},
        |      6) >= 0.4)
        |SELECT coalesce(doc_a, id_a) AS a, coalesce(doc_b, id_b) AS b,
        |  jaccard, cosine,
        |  CASE WHEN jaccard IS NOT NULL AND cosine IS NOT NULL THEN 'both'
        |       WHEN jaccard IS NOT NULL THEN 'text'
        |       ELSE 'embed' END AS signal
        |FROM gpairs FULL OUTER JOIN ep
        |  ON doc_a = id_a AND doc_b = id_b
        |ORDER BY a, b""".stripMargin),

    "sample_importance" ->
      s"""WITH s AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
         |  FROM documents GROUP BY 1),
         |t AS (SELECT *, pow(CAST(tokens AS DOUBLE), 0.7) AS raw FROM s),
         |z AS (SELECT CAST(sum(CAST(raw AS DECIMAL(18,6))) AS DOUBLE)
         |      AS sraw,
         |    CAST(sum(n_docs) AS BIGINT) AS n FROM t),
         |r AS (SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |    CAST(round(raw / sraw, 6) AS DOUBLE) AS weight,
         |    CAST(round(least(1.0, 0.2 * n * (raw / sraw) / n_docs), 6)
         |      AS DOUBLE) AS rate
         |  FROM t CROSS JOIN z),
         |k AS (SELECT d.source, count(*) AS n_sampled
         |  FROM documents d JOIN r ON d.source = r.source
         |  WHERE CAST(${h56Sql("concat('imp|', CAST(doc_id AS VARCHAR))")}
         |      % 1000000 AS DOUBLE) / 1000000.0 < rate
         |  GROUP BY 1)
         |SELECT r.source AS source, n_docs, weight, rate,
         |  CAST(coalesce(n_sampled, 0) AS BIGINT) AS n_sampled
         |FROM r LEFT JOIN k ON r.source = k.source
         |ORDER BY r.source""".stripMargin
  )
}
