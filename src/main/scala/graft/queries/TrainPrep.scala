package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions._
import graft.operators.{GlobalOrder, Parallelism, TextOps}
import graft.operators.Pin.PinOps

/** Training-mixture governance: the corpus-level weighting / sharding /
  * vocabulary ops a pretraining data pipeline runs AFTER cleaning and
  * dedup (parity-plus next to `q_split_hash` / `q_temperature_sample` /
  * `q_domain_caps`, which govern selection — these govern composition).
  *
  * Everything here is deterministic under any partitioning, retry, or
  * engine: repetition coins and shard assignment come from salted md5
  * buckets (never an RNG), and every ratio is a division of two exact
  * longs, so both engines round identically.
  */
object TrainPrep {

  /** Mixture weights per source domain — epochs per document. Fractions
    * are exact binary (.125 granularity) so `frac · 1000` is an exact
    * integer mille threshold on both engines. */
  private val mixtureWeights: Seq[(String, Double)] = Seq(
    "src0" -> 2.5, "src1" -> 1.25, "src2" -> 0.75, "src3" -> 1.5,
    "src4" -> 0.25, "src5" -> 1.0, "src6" -> 2.0, "src7" -> 0.5,
    "src8" -> 1.75, "src9" -> 0.125)

  /** (lang, marker) lexicon q_naive_bayes injects to make the
    * likelihood label-correlated — one source of truth feeding both the
    * Spark frame and the oracle's VALUES list, so they cannot drift. */
  private val nbMarkers: Seq[(String, String)] =
    Seq("en", "fr", "es", "de", "zh").flatMap(l =>
      graft.operators.TextOps.langMarkers(l).map((l, _)))

  val queries: Map[String, Q] = Map(

    // Domain-mixture epoch upsampling: each source gets a target weight
    // w (epochs per doc); a doc repeats floor(w) times plus one more
    // with probability frac(w), decided by a salted md5 coin — the
    // deterministic fractional-epoch rule (the standard way LLM
    // pretraining mixes oversampled domains, e.g. multiple epochs of a
    // small high-quality source against a down-weighted crawl).
    // Scale shape: the weight dim is 10 rows → broadcast join (no
    // shuffle); n_rep is a pure projection; the replication is
    // explode(sequence(1, n_rep)) — rows multiply INSIDE the scan
    // stage, nothing shuffles until a downstream consumer asks. Only
    // (doc_id, source) enter the explode here; in production the
    // exploded frame carries doc_id + epoch and re-joins text lazily
    // (or the writer re-reads by doc_id), so the corpus text is never
    // replicated through a shuffle.
    "q_domain_mixture" -> ((s, dir) => {
      val w = s.createDataFrame(mixtureWeights).toDF("source", "wt")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .join(broadcast(w), Seq("source"))
        .withColumn("n_rep",
          floor(col("wt")).cast("long") +
            when(md5Bucket(col("doc_id"), 1000L, salt = "mix:") <
              ((col("wt") - floor(col("wt"))) * 1000).cast("long"), 1L)
              .otherwise(0L))
        .filter(col("n_rep") >= 1)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1L), col("n_rep"))).as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    // Mixture summary report (what a data lead actually reads before
    // training): per source, the achieved epoch factor of the
    // fractional-coin rule vs its target weight — doc counts from the
    // SAME n_rep expression the mixture query explodes, so the two
    // queries cannot drift apart. One broadcast join + one hash agg;
    // the ratio is exact longs divided once, rounded.
    "q_mixture_report" -> ((s, dir) => {
      val w = s.createDataFrame(mixtureWeights).toDF("source", "wt")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .join(broadcast(w), Seq("source"))
        .withColumn("__rep",
          floor(col("wt")).cast("long") +
            when(md5Bucket(col("doc_id"), 1000L, salt = "mix:") <
              ((col("wt") - floor(col("wt"))) * 1000).cast("long"), 1L)
              .otherwise(0L))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__rep")).as("n_mixture"),
          max(col("wt")).as("target_epochs"))
        .withColumn("achieved_epochs",
          round(col("n_mixture").cast("double") / col("n_docs").cast("double"),
            6))
        .orderBy(col("source"))
    }),

    // Per-source label-diversity audit: Shannon entropy of the
    // language distribution inside each source (a monoculture source
    // scores 0; the mixture designer reads this next to the weights).
    // Group counts from one hash agg; the entropy fold runs on the
    // (source × lang) frame — tiny — with the ln+round-6 determinism
    // precedent (q_tfidf) and the quantize-to-long order-free sum.
    "q_groupby_entropy" -> ((s, dir) => {
      val counts = Tables(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
      counts.join(totals, Seq("source"))
        .withColumn("__p", col("c").cast("double") / col("n").cast("double"))
        .withColumn("__tq",
          floor(-(col("__p")) * log(col("__p")) * lit(1e9) + lit(0.5))
            .cast("long"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          count(lit(1)).as("n_langs"),
          round(sum(col("__tq")).cast("double") / lit(1e9), 6)
            .as("lang_entropy"))
        .orderBy(col("source"))
    }),

    // Deterministic shard assignment + balance audit: shard = salted
    // md5 bucket of doc_id (reproducible across engines/runs/retries —
    // the property a round-robin over an arbitrary partitioning does
    // NOT have), then per-shard doc and char totals so a skewed shard
    // is visible before the write. Scale: one hash-agg shuffle of
    // (shard, two longs); the write itself would be
    // .write.partitionBy("shard") riding this same projection.
    "q_shard_assign" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(md5Bucket(col("doc_id"), 16L, salt = "shard:").as("shard"),
          col("n_chars"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars_total"))
        .orderBy(col("shard"))
    }),

    // Vocabulary coverage curve: what fraction of all token
    // OCCURRENCES the top-{10,100,1000} most frequent types cover —
    // the tokenizer-sizing / OOV-budget statistic. One explode+agg
    // pass builds the (type, count) table; ranking runs over the
    // VOCAB (≪ corpus) via the two-pass range-partitioned row_number
    // (no single-partition window even for a billion-type vocab); the
    // coverage sums are one final agg of exact longs, so the rounded
    // ratios are engine-identical. (count DESC, word) is a total
    // order ⇒ the rank cut is deterministic.
    "q_vocab_coverage" -> ((s, dir) => {
      val counts = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(explode(TextOps.normWords(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val ranked = GlobalOrder.withRowNumberLong(
        counts, Seq(col("c").desc, col("w")), "rn")
      def cov(k: Int) = sum(when(col("rn") <= k, col("c")).otherwise(0L))
      ranked
        .agg(count(lit(1)).as("n_vocab"), sum(col("c")).as("__tot"),
          cov(10).as("__c10"), cov(100).as("__c100"), cov(1000).as("__c1000"))
        .select(col("n_vocab"),
          round(col("__c10").cast("double") / col("__tot").cast("double"), 6)
            .as("cov10"),
          round(col("__c100").cast("double") / col("__tot").cast("double"), 6)
            .as("cov100"),
          round(col("__c1000").cast("double") / col("__tot").cast("double"), 6)
            .as("cov1000"))
    }),

    // Zipf sanity check (rank · frequency ≈ constant for natural
    // language; a flat product curve is the classic synthetic-or-
    // boilerplate tell): top-20 types by frequency with their rank and
    // the rank·freq product — pure integers, no libm fit, the
    // constancy is visible in the data itself. Vocabulary ranked by
    // the two-pass row number; the cut is a bounded top-k on the
    // (count DESC, word) total order.
    "q_zipf_check" -> ((s, dir) => {
      val counts = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(explode(TextOps.normWords(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      GlobalOrder.withRowNumberLong(counts, Seq(col("c").desc, col("w")), "rank")
        .filter(col("rank") <= 20)
        .select(col("rank"), col("w").as("word"), col("c").as("freq"),
          (col("rank") * col("c")).as("rank_freq"))
        .orderBy(col("rank"))
    }),

    // BPE merge TRAINING, 6 rounds — the iterative top-pair merge loop
    // (Sennrich et al.) run the distributed way: tokenize + count the
    // corpus ONCE into (word, freq), then merges run at vocabulary
    // scale. This runs the WAVE-BATCHED trainer (several provably
    // non-interacting rules per job wave — the depth that makes a 32k
    // vocab feasible; BpeBatchSpec proves it bit-identical to
    // sequential greedy, and this oracle unrolls the SEQUENTIAL
    // greedy, so the equivalence is also checked live on every
    // verify). Deterministic end to end: exact long pair counts,
    // (count DESC, pair ASC) winner order, and a wrapped-token string
    // spelling whose replace pass IS the greedy merge on both engines.
    // Output = the learned merge table plus the corpus token count
    // after each rule. Full recipe on TextOps.bpeTrainBatched.
    "q_bpe_merges" -> ((s, dir) => {
      val words = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(explode(TextOps.normWords(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      TextOps.bpeTrainBatched(words, rounds = 6)
    }),

    // BPE ENCODE — the apply half of q_bpe_merges' learn half: the
    // same 6 trained merges, then every doc's whitespace tokens join
    // the vocab-sized final-spelling table (AQE broadcasts it) and the
    // per-doc BPE token count is one hash agg. This is the shape a
    // tokenizer-sizing pass runs corpus-wide: train once at vocabulary
    // scale, encode by join — the corpus text never re-enters the
    // merge loop.
    "q_bpe_encode" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val words = Parallelism.fanOut(docs)
        .select(explode(TextOps.normWords(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      val (_, spelled) =
        TextOps.bpeTrainBatchedWithSpellings(words, rounds = 6)
      val enc = spelled.select(col("word"),
        size(split(TextOps.wsTrim(col("s")), " +")).cast("long").as("nsym"))
      docs.select(col("doc_id"),
          explode(TextOps.normWords(col("text"))).as("word"))
        .filter(length(col("word")) > 0)
        .join(enc, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_ws"), sum(col("nsym")).as("n_bpe"))
        .orderBy(col("doc_id"))
    }),

    // Heavy hitters: token types above 0.5% of all occurrences — the
    // exact two-aggregate path (type counts, then a broadcast 1-row
    // total). Map-side partial aggregation absorbs the heavy keys by
    // construction (a frequent type combines within every map task),
    // so the shuffle carries ≤ |vocab per task| rows and the hot key
    // is never a straggler. The counts frame feeds both the total and
    // the filter, so it materializes once (TF-checkpoint pattern; it
    // is vocab-sized, not corpus-sized). At a scale where even the
    // vocab table hurts, the sketch swap is Misra-Gries/Count-Min with
    // this exact query as its verifier — same contract as the
    // q_approx_* sketch tier.
    // Tokenizer fertility by language (BPE-ish tokens per whitespace
    // word — the metric that decides whether a tokenizer needs more
    // vocab for a language): exact integer token counts per doc, one
    // lang-keyed hash agg, one rounded division per row.
    "q_tokenizer_fertility" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("lang"), TextOps.tokenCount(col("text")).as("__ws"),
          TextOps.bpeTokenCount(col("text")).as("__bpe"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__ws").cast("long")).as("n_ws"),
          sum(col("__bpe").cast("long")).as("n_bpe"))
        .withColumn("fertility",
          round(col("n_bpe").cast("double") / col("n_ws").cast("double"), 6))
        .orderBy(col("lang"))
    }),

    // Dataset card (the one-row summary a corpus release ships with):
    // doc/char/token totals, language count, exact-duplicate rate, and
    // mean whitespace-token length — every number a count or exact
    // ratio from TWO passes (one over documents, one distinct-digest
    // agg), composed by 1-row broadcasts. At 100 TB this is the same
    // two scans; nothing collects.
    "q_dataset_card" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val base = d.agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"))
      val dup = d.select(md5(col("text")).as("__h"))
        .agg(count(lit(1)).as("__n"),
          countDistinct(col("__h")).as("__nd"))
        .select(round((col("__n") - col("__nd")).cast("double") /
          col("__n").cast("double"), 6).as("dup_rate"))
      base.crossJoin(broadcast(dup))
        .withColumn("mean_doc_tokens",
          round(col("n_tokens").cast("double") / col("n_docs").cast("double"),
            6))
    }),

    // Character-entropy quality signal (low entropy ⇒ repetitive /
    // degenerate text — the boilerplate gate corpus filters run).
    // Shape: explode(char) → (doc, char) hash agg → per-doc fold.
    // Map-side partial aggregation collapses each partition to ≤36
    // rows per doc BEFORE the shuffle, so the exchange carries
    // O(36·|docs|), never O(chars). This replaced a 36×translate
    // scan-only projection: that shape re-reads every row's text 36
    // times, and the A/B at sf0.1 measured 3.9-4.2 s (translate,
    // warm) vs 0.6 s here with zero 6-dp mismatches — one O(chars)
    // pass + a narrow shuffle beats 36 O(chars) passes. Cross-engine
    // determinism: the per-count c·ln(c) terms are quantized to 1e-9
    // longs BEFORE the order-free sum (the q_psi pattern), and the
    // only unquantized libm call left, ln(n), is a single op both
    // engines sequence identically; entropy = ln(n) − (Σq/1e9)/n.
    "q_char_entropy" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val chs = docs
        .select(col("doc_id"), explode(split(lower(col("text")), "")).as("__ch"))
        .filter((col("__ch") >= "a" && col("__ch") <= "z") ||
          (col("__ch") >= "0" && col("__ch") <= "9"))
      val agg = chs.groupBy(col("doc_id"), col("__ch"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("__c")).as("__n"),
          sum(floor(col("__c").cast("double") *
            log(col("__c").cast("double")) * 1e9 + 0.5).cast("long"))
            .as("__sq"))
      // left join back so alphabet-free docs keep their entropy-0 row
      docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("__n").isNotNull && col("__n") > 0,
            round(log(col("__n").cast("double")) -
              (col("__sq").cast("double") / 1e9) /
                col("__n").cast("double"), 6))
            .otherwise(0.0).as("entropy"))
        .orderBy(col("doc_id"))
    }),

    // Feature hashing (the hashing-trick featurizer): token → one of
    // 64 buckets via the salted md5 fold, per-doc bucket counts. The
    // 100 TB-friendly property is NO vocabulary pass: one explode +
    // one (doc, bucket) hash agg — no global dictionary build, no
    // broadcast, collisions absorbed by the learner (the trick's
    // contract). Bucket ids are engine-identical md5 arithmetic.
    "q_feature_hash" -> ((s, dir) => {
      Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(col("doc_id"), explode(TextOps.normWords(col("text"))).as("w"))
        .select(col("doc_id"), md5Bucket(col("w"), 64L, salt = "fh:").as("bucket"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    // Class-balanced downsampling: every label keeps exactly n_min
    // docs (the minority-class size — data-dependent, derived in the
    // same job as a 1-row broadcast), selected by salted-md5 priority
    // within each label — deterministic under any partitioning, retry,
    // or engine, unlike sampleBy's RNG. One label-keyed window shuffle.
    "q_sample_balanced" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("lang"), col("doc_id"))
      val minN = d.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
        .agg(min(col("__n")).as("__minn"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("bal|"), col("doc_id"))), col("doc_id"))
      d.withColumn("__rn", row_number().over(w))
        .crossJoin(broadcast(minN))
        .filter(col("__rn") <= col("__minn"))
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // Per-doc OOV rate against the corpus top-1000 vocabulary — the
    // EXACT perplexity-filter stand-in: a unigram-LM logprob score
    // inherits libm's last-ulp freedom (ln differs across engines),
    // while "fraction of token occurrences outside the top-k types" is
    // a ratio of two longs — deterministic everywhere — and ranks docs
    // almost identically for quality-gating purposes. Scale shape: the
    // vocab is ranked over the (≪ corpus) type table by the two-pass
    // row_number, the top-1000 set broadcasts back onto the token
    // stream (map-side hash join — corpus tokens never shuffle; the
    // only corpus-keyed shuffle is the final per-doc agg), and
    // tokenization runs twice in two fully pipelined scans rather than
    // materializing O(corpus tokens) to block storage (the
    // q_text_repetition trade, taken the other way because nothing
    // here re-enters a regex — explode+split is cheap next to a
    // token-stream checkpoint).
    "q_oov_rate" -> ((s, dir) => {
      def toks = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(col("doc_id"), explode(TextOps.normWords(col("text"))).as("w"))
      val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      // top-k via TakeOrdered (r15): a bounded k over a total order
      // needs no global rank — per-partition top-1000 + one merge,
      // replacing the two-pass range shuffle + checkpoint + window the
      // rank operator pays. Same deterministic set: (c desc, w) is a
      // total order.
      val vocab = counts.orderBy(col("c").desc, col("w")).limit(1000)
        .select(col("w"), lit(1).as("__in"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tok"),
          round(col("n_oov").cast("double") / col("n_tok").cast("double"), 6)
            .as("oov_rate"))
        .orderBy(col("doc_id"))
    }),

    // Multinomial Naive Bayes language classifier, trained AND
    // self-evaluated in one plan (the quality/lang-filter model corpus
    // pipelines train in SQL-shaped passes): top-200 word vocabulary,
    // Laplace-smoothed per-(lang, word) log-likelihoods, log-prior,
    // argmax per doc → confusion counts vs the labeled lang column.
    // Scale shape: the (L×200) likelihood grid and the vocab broadcast;
    // corpus tokens shuffle once (the per-doc score agg); the argmax is
    // a per-doc window over ≤L rows. Determinism: every ln() term is
    // quantized to 1e-9 longs at the (lang, word) grid — the score sum
    // is exact integer addition, order-free, and ties break on lang asc.
    // Docs with zero vocabulary tokens have no score rows and drop from
    // the matrix on both engines identically. To make the LIKELIHOOD
    // term decisive (the raw fixture's word distribution is
    // label-independent, so priors alone would pick every argmax and a
    // broken likelihood could hide), the token stream is augmented with
    // each doc's own language-marker lexicon (TextOps.langMarkers, one
    // occurrence per marker per doc — the same deterministic injection
    // on both engines) and the lexicon is unioned into the vocabulary:
    // now p(w|lang) separates the classes, the confusion matrix goes
    // diagonal, and a likelihood bug (swapped counts, broken smoothing,
    // wrong denominator) flips argmaxes and fails the hash.
    "q_naive_bayes" -> ((s, dir) => {
      import s.implicits._
      val mk = nbMarkers.toDF("lang", "w")
      val docs = Tables(s, dir, "documents")
      def toks = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          explode(TextOps.normWords(col("text"))).as("w"))
        .unionByName(docs.select(col("doc_id"), col("lang"))
          .join(broadcast(mk), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("w")))
      val counts = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      // top-k via TakeOrdered (r15) — the q_oov_rate note: a bounded
      // 200-word vocabulary needs no two-pass global rank.
      val vocab = counts.orderBy(col("c").desc, col("w")).limit(200)
        .select(col("w"))
        .union(mk.select(col("w"))).distinct()
      val priors = docs.groupBy(col("lang")).agg(count(lit(1)).as("nd"))
      val total = docs.agg(count(lit(1)).as("ntot"))
      // three consumers (class totals, per-class counts, scoring) —
      // pinning beats re-running tokenize+explode three times
      // (measured at sf0.1: 4.5 s → 3.8 s warm, identical rows)
      val vtoks = toks.join(broadcast(vocab), Seq("w")).pinned
      val classTok = vtoks.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      val cw = vtoks.groupBy(col("lang"), col("w"))
        .agg(count(lit(1)).as("cw"))
      val grid = priors.select(col("lang"))
        .crossJoin(broadcast(vocab))
        .join(cw, Seq("lang", "w"), "left")
        .join(classTok, Seq("lang"))
        .select(col("lang").as("__l"), col("w"),
          floor(log((coalesce(col("cw"), lit(0L)) + 1).cast("double") /
            (col("nl") + 200).cast("double")) * 1e9 + 0.5).cast("long")
            .as("llq"))
      val prq = priors.crossJoin(broadcast(total))
        .select(col("lang").as("__l"),
          floor(log(col("nd").cast("double") / col("ntot").cast("double"))
            * 1e9 + 0.5).cast("long").as("prq"))
      val scored = vtoks
        .select(col("doc_id"), col("lang").as("true_lang"), col("w"))
        .join(broadcast(grid), Seq("w"))
        .groupBy(col("doc_id"), col("true_lang"), col("__l"))
        .agg(sum(col("llq")).as("__s"))
        .join(broadcast(prq), Seq("__l"))
        .withColumn("score", col("__s") + col("prq"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("__l"))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .groupBy(col("true_lang").as("lang"), col("__l").as("pred"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // Token-length distribution in power-of-two buckets — the corpus
    // length audit run before choosing context length / packing
    // strategy. The bucket is ⌊log₂ n⌋+1 computed as LENGTH(BIN(n)) —
    // integer bit-length, no libm log2 (whose boundary values 2^k are
    // exactly where engines may disagree). One hash agg; exact longs.
    "q_length_histogram" -> ((s, dir) => {
      val n = TextOps.bpeTokenCount(col("text"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), n.as("n"))
        .withColumn("bucket",
          when(col("n") === 0, lit(0L))
            .otherwise(length(bin(col("n"))).cast("long")))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tok_total"))
        .orderBy(col("bucket"))
    }),

    "q_heavy_hitters" -> ((s, dir) => {
      val counts = Parallelism.fanOut(Tables(s, dir, "documents"))
        .select(explode(TextOps.normWords(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .pinned
      val tot = counts.agg(sum(col("c")).as("__tot"))
      counts.crossJoin(broadcast(tot))
        .filter(col("c") * 200 > col("__tot"))
        .select(col("w").as("word"), col("c").as("n"),
          round(col("c").cast("double") / col("__tot").cast("double"), 6)
            .as("frac"))
        .orderBy(col("n").desc, col("word"))
    }))

  private def tokCte: String =
    """WITH tok AS (
      |  SELECT unnest(regexp_split_to_array(
      |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\s]', ' ', 'g'),
      |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
      |    '\s+')) AS w
      |  FROM documents),
      |c AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w)""".stripMargin

  /** Shared DuckDB replica of the 6-round BPE training loop: CTEs
    * tok/wf/s0 then per round x$i (split), p$i (winning pair), s$i
    * (re-spelled words, MATERIALIZED — inlining would re-run the
    * whole prefix per consumer), k$i (the rule row). Ends with
    * s$bpeMaxi = final spellings; consumers pick what they need —
    * unreferenced CTEs are not evaluated. */
  private val bpeMaxi = 6

  private def bpeOracleCtes: String = {
    def round_(i: Int) = {
      val prev = s"s${i - 1}"
      s"""x$i AS MATERIALIZED (SELECT freq,
         |    regexp_split_to_array(TRIM(s), ' +') AS a FROM $prev),
         |p$i AS MATERIALIZED (SELECT pa, pb,
         |    CAST(SUM(freq) AS BIGINT) AS pair_count
         |  FROM (SELECT freq, a[i] AS pa, a[i+1] AS pb
         |        FROM (SELECT freq, a,
         |                unnest(generate_series(1, len(a) - 1)) AS i
         |              FROM x$i) t) u
         |  GROUP BY pa, pb ORDER BY pair_count DESC, pa, pb LIMIT 1),
         |s$i AS MATERIALIZED (SELECT w.word, w.freq,
         |    replace(w.s, ' ' || p.pa || '  ' || p.pb || ' ',
         |      ' ' || p.pa || p.pb || ' ') AS s
         |  FROM $prev w, p$i p),
         |k$i AS (SELECT CAST($i AS INT) AS merge_rank, pa AS sym_a,
         |    pb AS sym_b, pair_count,
         |    (SELECT CAST(SUM(freq *
         |        len(regexp_split_to_array(TRIM(s), ' +'))) AS BIGINT)
         |     FROM s$i) AS tokens_after
         |  FROM p$i)""".stripMargin
    }
    val rounds = (1 to bpeMaxi).map(round_).mkString(",\n")
    s"""tok AS (
      |  SELECT unnest(regexp_split_to_array(
      |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),
      |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
      |    '\\s+')) AS w
      |  FROM documents),
      |wf AS MATERIALIZED (SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS freq
      |  FROM tok WHERE w <> '' GROUP BY w),
      |s0 AS MATERIALIZED (SELECT word, freq,
      |    regexp_replace(word, '(.)', ' \\1 ', 'g') AS s FROM wf),
      |$rounds""".stripMargin
  }

  val oracle: Map[String, String] = Map(

    // weight dim as unnested parallel lists cast to DOUBLE (a bare
    // VALUES 2.5 would type DECIMAL and change the frac arithmetic);
    // the coin replays md5Bucket's salted fold, the replication is a
    // correlated generate_series (empty for n_rep = 0, like the
    // filtered explode)
    "q_domain_mixture" -> {
      val srcs = mixtureWeights.map(p => s"'${p._1}'").mkString(", ")
      val wts = mixtureWeights.map(_._2).mkString(", ")
      s"""WITH w AS (SELECT unnest([$srcs]) AS source,
        |            unnest(CAST([$wts] AS DOUBLE[])) AS wt),
        |d AS (SELECT doc_id, documents.source,
        |  CAST(FLOOR(wt) AS BIGINT) +
        |    CASE WHEN ${Extras.hex8("'mix:' || doc_id::VARCHAR")} % 1000 <
        |      CAST((wt - FLOOR(wt)) * 1000 AS BIGINT) THEN 1 ELSE 0 END
        |    AS n_rep
        |  FROM documents JOIN w USING (source)),
        |e AS (SELECT doc_id, source,
        |  unnest(generate_series(1, n_rep)) AS g FROM d)
        |SELECT doc_id, source, CAST(g AS BIGINT) AS epoch
        |FROM e ORDER BY doc_id, epoch""".stripMargin
    },

    "q_mixture_report" -> {
      val srcs = mixtureWeights.map(p => s"'${p._1}'").mkString(", ")
      val wts = mixtureWeights.map(_._2).mkString(", ")
      s"""WITH w AS (SELECT unnest([$srcs]) AS source,
        |            unnest(CAST([$wts] AS DOUBLE[])) AS wt),
        |d AS (SELECT documents.source, wt,
        |  CAST(FLOOR(wt) AS BIGINT) +
        |    CASE WHEN ${Extras.hex8("'mix:' || doc_id::VARCHAR")} % 1000 <
        |      CAST((wt - FLOOR(wt)) * 1000 AS BIGINT) THEN 1 ELSE 0 END
        |    AS rep
        |  FROM documents JOIN w USING (source))
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(rep) AS BIGINT) AS n_mixture,
        |  MAX(wt) AS target_epochs,
        |  ROUND(CAST(SUM(rep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS achieved_epochs
        |FROM d GROUP BY source ORDER BY source""".stripMargin
    },

    "q_groupby_entropy" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS c FROM documents
        |  GROUP BY source, lang),
        |t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c
        |  GROUP BY source),
        |q AS (SELECT c.source, n,
        |    CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9 + 0.5)
        |      AS BIGINT) AS tq
        |  FROM c JOIN t USING (source))
        |SELECT source, MAX(n) AS n_docs, COUNT(*) AS n_langs,
        |  ROUND(CAST(SUM(tq) AS DOUBLE) / 1e9, 6) AS lang_entropy
        |FROM q GROUP BY source ORDER BY source""".stripMargin,

    "q_shard_assign" ->
      s"""SELECT ${Extras.hex8("'shard:' || doc_id::VARCHAR")} % 16 AS shard,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
        |FROM documents GROUP BY shard ORDER BY shard""".stripMargin,

    "q_vocab_coverage" ->
      s"""$tokCte,
        |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM c)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
        |  ROUND(CAST(COALESCE(SUM(c) FILTER (WHERE rn <= 10), 0) AS DOUBLE)
        |    / CAST(SUM(c) AS DOUBLE), 6) AS cov10,
        |  ROUND(CAST(COALESCE(SUM(c) FILTER (WHERE rn <= 100), 0) AS DOUBLE)
        |    / CAST(SUM(c) AS DOUBLE), 6) AS cov100,
        |  ROUND(CAST(COALESCE(SUM(c) FILTER (WHERE rn <= 1000), 0) AS DOUBLE)
        |    / CAST(SUM(c) AS DOUBLE), 6) AS cov1000
        |FROM r""".stripMargin,

    // the 6 merge rounds unrolled as MATERIALIZED CTEs (each spelled
    // frame feeds the next round, a pair scan, and a token recount —
    // inlining would re-run the iteration prefix per consumer); the
    // same wrapped-token replace spelling as the Spark side, so the
    // greedy merge is byte-identical
    "q_bpe_merges" -> {
      val unioned = (1 to bpeMaxi).map(i => s"SELECT * FROM k$i")
        .mkString("\nUNION ALL ")
      s"""WITH $bpeOracleCtes
        |SELECT * FROM ($unioned) ORDER BY merge_rank""".stripMargin
    },

    // encode replica: the same trained CTE chain, then per-doc words
    // join the final spelling s6 for symbol counts (unreferenced k
    // CTEs are never evaluated)
    "q_bpe_encode" ->
      s"""WITH $bpeOracleCtes,
        |enc AS (SELECT word,
        |    CAST(len(regexp_split_to_array(TRIM(s), ' +')) AS BIGINT)
        |      AS nsym
        |  FROM s$bpeMaxi),
        |dw AS (SELECT doc_id, unnest(regexp_split_to_array(
        |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),
        |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
        |    '\\s+')) AS w
        |  FROM documents)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ws,
        |  CAST(SUM(nsym) AS BIGINT) AS n_bpe
        |FROM (SELECT doc_id, w FROM dw WHERE w <> '') d
        |JOIN enc ON d.w = enc.word
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_tokenizer_fertility" ->
      """WITH t AS (SELECT lang,
        |  CASE WHEN LENGTH(TRIM(text, ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11))) = 0 THEN 0
        |    ELSE CAST(len(regexp_split_to_array(TRIM(text, ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)), '\s+')) AS INT)
        |  END AS ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS INT) AS bpe
        |FROM documents)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(ws) AS BIGINT) AS n_ws,
        |  CAST(SUM(bpe) AS BIGINT) AS n_bpe,
        |  ROUND(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 6)
        |    AS fertility
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,

    "q_dataset_card" ->
      """WITH t AS (SELECT lang, n_chars,
        |  CASE WHEN LENGTH(TRIM(text, ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11))) = 0 THEN 0
        |    ELSE CAST(len(regexp_split_to_array(TRIM(text, ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)), '\s+')) AS INT)
        |  END AS ws,
        |  md5(text) AS h
        |FROM documents),
        |b AS (SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |    CAST(SUM(ws) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(COUNT(DISTINCT h) AS BIGINT) AS nd
        |  FROM t)
        |SELECT n_docs, n_chars, n_tokens, n_langs,
        |  ROUND(CAST(n_docs - nd AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS dup_rate,
        |  ROUND(CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS mean_doc_tokens
        |FROM b""".stripMargin,

    // identical 36-term chain, REPLACE per literal char, same ln/round
    // same op sequence: per-char counts, 1e-9-quantized c·ln(c) sum
    "q_char_entropy" ->
      """WITH lt AS (SELECT doc_id, LOWER(text) AS t FROM documents),
        |pos AS (SELECT doc_id, t,
        |    unnest(generate_series(1, LENGTH(t))) AS i FROM lt),
        |ch AS (SELECT doc_id, substr(t, i, 1) AS ch FROM pos
        |  WHERE substr(t, i, 1) BETWEEN 'a' AND 'z'
        |     OR substr(t, i, 1) BETWEEN '0' AND '9'),
        |c AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch),
        |a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CAST(FLOOR(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |      * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sq
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN a.n IS NULL OR a.n = 0 THEN 0.0
        |    ELSE ROUND(ln(CAST(a.n AS DOUBLE))
        |      - (CAST(a.sq AS DOUBLE) / 1e9) / CAST(a.n AS DOUBLE), 6)
        |  END AS entropy
        |FROM documents d LEFT JOIN a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q_feature_hash" ->
      s"""WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),
        |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
        |    '\\s+')) AS w
        |  FROM documents)
        |SELECT doc_id, ${Extras.hex8("'fh:' || w")} % 64 AS bucket,
        |  COUNT(*) AS n
        |FROM tok GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "q_sample_balanced" ->
      """WITH c AS (SELECT MIN(n) AS minn FROM (
        |    SELECT COUNT(*) AS n FROM documents GROUP BY lang)),
        |r AS (SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('bal|' || doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id FROM r, c WHERE rn <= minn
        |ORDER BY lang, doc_id""".stripMargin,

    // same tok CTE plus the marker injection; the grid's ln() terms
    // quantize to 1e-9 longs, so score sums are exact integer addition
    "q_naive_bayes" -> {
      val mkVals = nbMarkers
        .map { case (l, w) => s"('$l', '$w')" }.mkString(", ")
      s"""WITH mk (lang, w) AS (VALUES $mkVals),
        |tok AS (
        |  SELECT doc_id, lang, unnest(regexp_split_to_array(
        |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'),
        |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
        |    '\\s+')) AS w
        |  FROM documents
        |  UNION ALL
        |  SELECT d.doc_id, d.lang, m.w FROM documents d
        |  JOIN mk m ON m.lang = d.lang),
        |c AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        |v AS (SELECT w FROM (
        |    SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM c)
        |  WHERE rn <= 200
        |  UNION SELECT DISTINCT w FROM mk),
        |vt AS (SELECT t.doc_id, t.lang, t.w FROM tok t JOIN v USING (w)),
        |nl AS (SELECT lang, COUNT(*) AS nl FROM vt GROUP BY lang),
        |cw AS (SELECT lang, w, COUNT(*) AS cw FROM vt GROUP BY lang, w),
        |pl AS (SELECT lang, COUNT(*) AS nd FROM documents GROUP BY lang),
        |tot AS (SELECT COUNT(*) AS ntot FROM documents),
        |grid AS (SELECT l.lang AS cl, v.w,
        |    CAST(FLOOR(ln(CAST(COALESCE(cw.cw, 0) + 1 AS DOUBLE)
        |      / CAST(nl.nl + 200 AS DOUBLE)) * 1e9 + 0.5) AS BIGINT) AS llq
        |  FROM pl l CROSS JOIN v
        |  LEFT JOIN cw ON cw.lang = l.lang AND cw.w = v.w
        |  JOIN nl ON nl.lang = l.lang),
        |pr AS (SELECT lang AS cl,
        |    CAST(FLOOR(ln(CAST(nd AS DOUBLE) / CAST(ntot AS DOUBLE))
        |      * 1e9 + 0.5) AS BIGINT) AS prq
        |  FROM pl, tot),
        |sc AS (SELECT vt.doc_id, vt.lang AS true_lang, g.cl,
        |    CAST(SUM(g.llq) AS BIGINT) AS s
        |  FROM vt JOIN grid g ON g.w = vt.w
        |  GROUP BY vt.doc_id, vt.lang, g.cl),
        |best AS (SELECT doc_id, true_lang, cl,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY s + prq DESC, cl) AS rn
        |  FROM sc JOIN pr USING (cl))
        |SELECT true_lang AS lang, cl AS pred, COUNT(*) AS n
        |FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin
    },

    "q_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(
        |    TRIM(regexp_replace(LOWER(text), '[^a-z0-9\s]', ' ', 'g'),
        |         ' '||chr(9)||chr(10)||chr(13)||chr(12)||chr(11)),
        |    '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
        |v AS (SELECT w FROM (
        |    SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rn FROM c)
        |  WHERE rn <= 1000)
        |SELECT doc_id, COUNT(*) AS n_tok,
        |  ROUND(CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
        |FROM tok LEFT JOIN v ON tok.w = v.w
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // LENGTH(BIN(n)) = integer bit-length on both engines — no libm
    "q_length_histogram" ->
      """WITH t AS (SELECT
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n
        |  FROM documents)
        |SELECT CASE WHEN n = 0 THEN 0
        |         ELSE CAST(LENGTH(bin(n)) AS BIGINT) END AS bucket,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n) AS BIGINT) AS n_tok_total
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_zipf_check" ->
      s"""$tokCte,
        |r AS (SELECT w, c,
        |    ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rank FROM c)
        |SELECT rank, w AS word, c AS freq,
        |  rank * c AS rank_freq
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_heavy_hitters" ->
      s"""$tokCte,
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM c)
        |SELECT w AS word, c AS n,
        |  ROUND(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS frac
        |FROM c, t WHERE c * 200 > tot
        |ORDER BY n DESC, word""".stripMargin)
}
