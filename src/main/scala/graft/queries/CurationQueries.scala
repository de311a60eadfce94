package graft.queries

import graft.Tables
import graft.ops.{CurationOps, DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation manifest (SURVEY.md §2.13 X16-X19): the
  * training-data selection steps between ingest and dedup —
  * benchmark decontamination, repetition filtering, token-budget
  * selection, and corpus vocabulary statistics. Each oracle-checked
  * against DuckDB on the documents table.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q85_decontaminate — benchmark decontamination (the training-data
    * hygiene step q24/q59 don't cover: asymmetric corpus-vs-eval-set
    * any-overlap, not pairwise near-dup). Docs with doc_id % 50 == 0
    * stand in for a held-out benchmark; any corpus doc sharing a word
    * 5-gram with one of them is reported with its overlap count.
    * `DedupOps.contaminationHits`: benchmark shingle hashes broadcast,
    * corpus never shuffles.
    */
  def q85Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, dir))
    DedupOps.contaminationHits(
      docs, docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 5)
      .orderBy(col("doc_id"))
  }

  /** q86_repetition — Gopher-style within-doc repetition scoring
    * (`CurationOps.withRepetition`): fraction of word 3-gram
    * occurrences that repeat an earlier one. Pure projection — the
    * whole filter runs in the scan stage at any scale.
    */
  def q86Repetition(s: SparkSession, dir: String): DataFrame =
    CurationOps.withRepetition(
      Tables.parallelize(Tables.documents(s, dir)), "text", n = 3)
      .select(col("doc_id"), col("n_ngrams"), col("rep_frac"))
      .orderBy(col("doc_id"))

  /** q324_repeated_substrings — cross-document repeated-substring
    * detection, the k-gram relational form of suffix-array substring
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): every positional word 8-gram is hashed
    * (portable hash32 of the joined gram), grams occurring ≥ 2 times
    * corpus-wide mark their start positions as repeated, and each
    * doc's marked [pos, pos+8) intervals are merged by the sweep-line
    * union (q303's running-max-of-ends islands) into maximal repeated
    * SPANS with exact covered-token counts — what a span-level dedup
    * pass would excise, where q86 only scores within-doc repetition
    * and q98 drops whole chunks. All integer arithmetic (positions,
    * gram hashes, span lengths) so the only rounding is the final
    * coverage ratio. Plan: one corpus token pass fans out positional
    * grams in the scan stage; the gram-frequency aggregation and the
    * per-doc island windows are the two shuffles — O(total tokens),
    * never pairwise.
    */
  def q324RepeatedSubstrings(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val t = Tables.parallelize(Tables.documents(s, dir))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        posexplode(transform(
          sequence(lit(0), greatest(size(col("__toks")) - k, lit(0))),
          i => array_join(slice(col("__toks"), i + 1, lit(k)), " "))))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        TextOps.hash32(col("col")).as("__gh"))
    val repeated = t.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__f"))
      .filter(col("__f") >= 2)
      .select(col("__gh"))
    val marks = t.join(repeated, Seq("__gh"), "left_semi")
      .withColumn("__end",
        least(col("pos") + k, col("n_tokens")).cast("long"))
    val before = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marks
      .withColumn("__pmax", max(col("__end")).over(before))
      .withColumn("__new",
        when(col("__pmax").isNull || col("pos") >= col("__pmax"), 1)
          .otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(upTo))
      .groupBy(col("doc_id"), col("n_tokens"), col("__isl"))
      .agg(count(lit(1)).as("__starts"),
        (max(col("__end")) - min(col("pos"))).as("__covered"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("__starts")).as("n_rep_grams"),
        count(lit(1)).as("n_spans"),
        sum(col("__covered")).as("covered_tokens"))
      .withColumn("coverage",
        (round(col("covered_tokens") / col("n_tokens").cast("double"), 4) + lit(0.0)))
      .orderBy(col("doc_id"))
  }

  /** q87_token_budget — per-language token-budget curation
    * (`CurationOps.tokenBudgetSelect`): highest stopword-ratio
    * (≈ most natural-language) docs per lang until 5 000 cumulative
    * tokens. The deterministic (score desc, doc_id) order makes the
    * selected subset reproducible across engines and task retries.
    */
  def q87TokenBudget(s: SparkSession, dir: String): DataFrame =
    CurationOps.tokenBudgetSelect(
      Tables.parallelize(Tables.documents(s, dir)),
      "lang", "doc_id", "text",
      TextOps.stopwordRatio(col("text")), budget = 5000L)
      .orderBy(col("lang"), col("doc_id"))

  /** q88_doc_frequency — corpus vocabulary statistics
    * (`CurationOps.docFrequency`): tokens present in ≥ 25 % of all
    * documents, with their document frequency and share. One
    * map-side-combined aggregation; the corpus total is a broadcast
    * scalar, not a driver round trip.
    */
  def q88DocFrequency(s: SparkSession, dir: String): DataFrame =
    CurationOps.docFrequency(
      Tables.parallelize(Tables.documents(s, dir)), "text", minFrac = 0.25)
      .orderBy(col("df").desc, col("token"))

  /** q136_prefix_join — EXACT threshold-Jaccard self-join via prefix
    * filtering (`DedupOps.prefixJaccardJoin`, AllPairs/PPJoin family):
    * the lossless counterpart to MinHash-LSH (q27). Tokens rank-encoded
    * by ascending document frequency; only docs sharing one of their
    * n - floor(0.9n) + 1 rarest tokens (plus the size filter) become
    * candidates, and every true pair provably survives — the oracle is
    * the naive all-pairs join, and the hash match IS the recall proof.
    */
  def q136PrefixJoin(s: SparkSession, dir: String): DataFrame =
    DedupOps.prefixJaccardJoin(
      Tables.parallelize(Tables.documents(s, dir))
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("toks")),
      "doc_id", col("toks"), threshold = 0.9)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** q137_bloom_decontaminate — q85's decontamination restated for an
    * eval set too large to broadcast exactly
    * (`DedupOps.bloomContaminationHits`): a constant-size Bloom filter
    * over the eval 4-gram hashes prunes the corpus shingle stream in
    * the scan stage; only the surviving sliver pays the exact shuffle
    * join. Output is exact (FPs die in the re-check), so the oracle is
    * the same overlap SQL as q85's.
    */
  def q137BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, dir))
    DedupOps.bloomContaminationHits(
      docs, docs.filter(col("doc_id") % 25 === 0), "doc_id", "text", n = 4)
      .orderBy(col("doc_id"))
  }

  /** q138_psi_drift — Population Stability Index of o_totalprice between
    * pre-1998 (reference) and 1998+ orders (`StatOps.psi`): decile
    * fences from the reference cohort's own distribution via
    * distributed-selection percentiles (no sort), one binning pass,
    * in-plan densified bin grid, Laplace-smoothed shares. The numeric
    * companion to q112's categorical KL drift.
    */
  def q138PsiDrift(s: SparkSession, dir: String): DataFrame =
    graft.ops.StatOps.psi(
      Tables.orders(s, dir).withColumn("cohort",
        when(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"),
          "ref").otherwise("cur")),
      "cohort", "ref", "o_totalprice", nBins = 10)
      .select(col("cohort"), col("bin"),
        round(col("ref_share"), 6).as("ref_share"),
        round(col("cur_share"), 6).as("cur_share"),
        round(col("psi_term"), 6).as("psi_term"),
        (round(col("psi"), 6) + lit(0.0)).as("psi"))
      .orderBy(col("bin"))

  /** q139_bigram_logprob — bigram language-model quality scoring
    * (`CurationOps.bigramLogProb`): mean conditional log-probability of
    * each doc's token transitions under the corpus's add-one-smoothed
    * bigram model — the transition-aware rung above q118's unigram
    * screen. Bigram generation is a zero-shuffle generator projection;
    * count tables broadcast.
    */
  def q139BigramLogprob(s: SparkSession, dir: String): DataFrame =
    CurationOps.bigramLogProb(
      Tables.parallelize(Tables.documents(s, dir)), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** q143_containment — asymmetric containment decontamination
    * (`DedupOps.containmentHits`): corpus docs holding >= 95 % of an
    * eval doc's DISTINCT token set. The screen q85/q137's contiguous
    * n-gram overlap misses: a short eval item paraphrase-embedded in a
    * long page keeps Jaccard and n-gram counts low while containment
    * stays ~1. Eval side exploded + broadcast; corpus streamed once.
    */
  def q143Containment(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, dir))
    DedupOps.containmentHits(
      docs.filter(col("doc_id") % 25 =!= 0),
      docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id").as("eval_id"), col("text")),
      "doc_id", "eval_id", d => TextOps.tokenSet(col("text")),
      threshold = 0.95)
      .select(col("doc_id"), col("eval_id"),
        round(col("containment"), 4).as("containment"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** q148_quality_vector — the fused quality-feature pass: every cheap
    * per-document quality signal (token counts, type/token ratio,
    * stopword ratio, 3-gram repetition, mean token length) computed in
    * ONE scan-stage projection. Pipelines that score each feature in a
    * separate pass re-read the corpus k times; at 100 TB feature
    * fusion into a single projection is the difference between one
    * scan and five. Codegen CSE shares the tokenization across the
    * feature expressions.
    */
  def q148QualityVector(s: SparkSession, dir: String): DataFrame = {
    val d = CurationOps.withRepetition(
      Tables.parallelize(Tables.documents(s, dir)), "text", n = 3)
    val toks = TextOps.tokens(col("text"))
    d.select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        size(TextOps.tokenSet(col("text"))).cast("long").as("n_distinct"),
        TextOps.stopwordRatio(col("text")).as("stop_ratio"),
        col("rep_frac"),
        round(length(array_join(toks, "")).cast("double") /
          greatest(size(toks), lit(1)), 4).as("mean_token_len"))
      .orderBy(col("doc_id"))
  }

  /** q155_sentences — sentence-level segmentation (the granularity
    * between q97's token windows and whole docs): split on [.!?]+
    * runs, trim, drop empties; per sentence emit its index, word
    * count, and an md5 dedup key (the unit line-level/citation-level
    * dedup operates on). Pure generator projection — no exchange at
    * any scale.
    */
  def q155Sentences(s: SparkSession, dir: String): DataFrame = {
    val sents = filter(
      transform(split(col("text"), "[.!?]+"), x => trim(x)),
      x => length(x) > 0)
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("doc_id"), posexplode(sents))
      .select(col("doc_id"), col("pos").cast("long").as("sent_idx"),
        size(TextOps.tokens(col("col"))).cast("long").as("n_words"),
        md5(col("col")).as("sent_hash"))
      .orderBy(col("doc_id"), col("sent_idx"))
  }

  /** q169_decontaminated_release — the full decontamination pass as one
    * query: corpus docs flagged by EITHER detector (q85's 5-gram
    * overlap OR q143's 0.95 token containment) are anti-joined away,
    * and the release report shows per-language before/after doc and
    * token counts. At 100 TB both detectors broadcast the eval side
    * and stream the corpus once each; the hit set is near-dup-sized,
    * so the anti-join build side stays tiny.
    */
  def q169DecontaminatedRelease(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, dir))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val evalSet = docs.filter(col("doc_id") % 50 === 0)
    val ngramHits = DedupOps.contaminationHits(
      corpus, evalSet, "doc_id", "text", n = 5).select(col("doc_id"))
    val containHits = DedupOps.containmentHits(
      corpus, evalSet.select(col("doc_id").as("eval_id"), col("text")),
      "doc_id", "eval_id", d => TextOps.tokenSet(col("text")),
      threshold = 0.95).select(col("doc_id"))
    val bad = ngramHits.unionByName(containHits).distinct()
    val before = corpus.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_before"))
    val after = corpus.join(bad, Seq("doc_id"), "left_anti")
      .select(col("lang"), TextOps.tokenCount(col("text")).cast("long").as("__nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_after"),
        sum(col("__nt")).as("n_tokens_after"))
    before.join(after, Seq("lang"))
      .withColumn("n_removed", col("n_docs_before") - col("n_docs_after"))
      .orderBy(col("lang"))
  }

  /** q171_boilerplate — cross-document boilerplate scoring: the
    * fraction of each doc's word 5-grams that appear in at least one
    * OTHER doc of the same language (CCNet-style line/paragraph
    * dedup signal, at shingle granularity). Shingle doc-frequencies
    * aggregate map-side; the join back is per (lang, shingle-hash).
    * At 100 TB the df>=2 set is the small side — broadcast it instead
    * of shuffling the full shingle stream twice.
    */
  def q171Boilerplate(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftSparkExtensions.register(s)
    val docs = Tables.parallelize(Tables.documents(s, dir))
    val sh = docs.select(col("lang"), col("doc_id"),
        explode(TextOps.wordShingles(col("text"), 5)).as("__s"))
      .select(col("lang"), col("doc_id"),
        TextOps.hash32(col("__s")).as("sh_hash"))
      .localCheckpoint() // feeds the df agg AND the join back
    val dfreq = sh.groupBy(col("lang"), col("sh_hash"))
      // shingles are distinct within a doc → count == doc frequency
      .agg(count(lit(1)).as("__df"))
    sh.join(dfreq, Seq("lang", "sh_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("__df") >= 2, 1)).as("n_boiler"))
      .withColumn("boiler_frac",
        round(col("n_boiler") / greatest(col("n_shingles"), lit(1)), 4))
      .orderBy(col("doc_id"))
  }

  /** q178_line_dedup — line(sentence)-level NORMALIZED dedup across the
    * corpus (the C4-style pass below q24's doc-level dedup and above
    * q98's chunk dedup): sentences collide on their order-insensitive
    * token-set fingerprint (q23's normalization at line granularity —
    * casing/whitespace/word-order invariant); for every fingerprint
    * appearing more than once, the copy count and the first-occurrence
    * keeper — a `min(struct)` argmax per hash, no corpus-wide window.
    * Generator projection + one hash aggregation is the whole plan at
    * any scale.
    */
  def q178LineDedup(s: SparkSession, dir: String): DataFrame = {
    val sents = filter(
      transform(split(col("text"), "[.!?]+"), x => trim(x)),
      x => length(x) > 0)
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("doc_id"), posexplode(sents))
      .select(TextOps.fingerprint(col("col")).as("sent_hash"), col("doc_id"),
        col("pos").cast("long").as("sent_idx"))
      .groupBy(col("sent_hash"))
      .agg(count(lit(1)).as("n_copies"),
        min(struct(col("doc_id"), col("sent_idx"))).as("__k"))
      .filter(col("n_copies") > 1)
      .select(col("sent_hash"), col("n_copies"),
        col("__k.doc_id").as("keep_doc"), col("__k.sent_idx").as("keep_idx"))
      .orderBy(col("sent_hash"))
  }

  /** q186_mixture_weights — temperature-scaled sampling weights: the
    * multilingual-training recipe w_l ∝ p_l^α (α=0.3 upsamples tail
    * languages) over per-language token shares, with the expected
    * token allocation for a 1M-token budget. One datacard-style
    * aggregation + a langs-sized arithmetic pass — the weights that
    * drive q99's mixture selection.
    */
  def q186MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val byLang = Tables.parallelize(Tables.documents(s, dir))
      .select(col("lang"), TextOps.tokenCount(col("text")).cast("long").as("__nt"))
      .groupBy(col("lang")).agg(sum(col("__nt")).as("n_tokens"))
    val tot = byLang.agg(sum(col("n_tokens")).cast("double").as("__tot"))
    val powed = byLang.crossJoin(broadcast(tot))
      .withColumn("__p", col("n_tokens") / col("__tot"))
      .withColumn("__pa", pow(col("__p"), lit(0.3)))
    val z = powed.agg(sum(col("__pa")).as("__z"))
    powed.crossJoin(broadcast(z))
      .select(col("lang"), col("n_tokens"),
        (round(col("__p"), 6) + lit(0.0)).as("share"),
        (round(col("__pa") / col("__z"), 6) + lit(0.0)).as("weight"),
        (round(col("__pa") / col("__z") * 1000000) + lit(0.0)).cast("long")
          .as("alloc_tokens"))
      .orderBy(col("lang"))
  }

  /** q156_datacard — the corpus "data card": per-language rollup of
    * the statistics a dataset release documents — doc/token counts,
    * exact-duplicate rate, mean quality signals, token length spread.
    * One aggregation over a fused scan-stage projection (q148's
    * feature-fusion shape feeding a groupBy); the exact-dup rate rides
    * the same pass via a count over per-text occurrence counts.
    */
  def q156Datacard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(Tables.documents(s, dir))
    val dupes = docs.groupBy(col("lang"), md5(col("text")).as("__h"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("lang"))
      .agg(sum(col("__c") - 1).as("n_exact_dupes"))
    docs.select(col("lang"),
        TextOps.tokenCount(col("text")).cast("long").as("__nt"),
        TextOps.stopwordRatio(col("text")).as("__sr"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        round(avg(col("__nt")), 2).as("avg_tokens"),
        min(col("__nt")).as("min_tokens"),
        max(col("__nt")).as("max_tokens"),
        round(avg(col("__sr")), 4).as("avg_stop_ratio"))
      .join(dupes, Seq("lang"))
      .withColumn("dup_rate",
        (round(col("n_exact_dupes") / col("n_docs"), 4) + lit(0.0)))
      .orderBy(col("lang"))
  }

  /** q360_bpe_merge — one byte-pair-encoding merge step, the inner
    * loop of tokenizer TRAINING (vs q46's already-trained BPE-ish
    * token counting): collapse the corpus to a word-frequency table,
    * count adjacent symbol pairs weighted by word frequency (the
    * overlapping 2-grams of each word's character sequence), pick the
    * argmax pair, apply the merge, and re-count. Because round-1
    * symbols are single characters, applying the merge is exactly
    * `replace(word, pair, sentinel)` — leftmost non-overlapping, the
    * same greedy order real BPE uses, and bit-identical across
    * engines. The corpus is touched ONCE (the word collapse);
    * everything after runs on the |vocab|-sized frame, which is how a
    * 100 TB tokenizer-training pass actually works (word counts fit,
    * raw text doesn't). Output: top-10 pairs before and after the
    * merge, the merged symbol rendered as `[xy]`.
    */
  def q360BpeMerge(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.parallelize(Tables.documents(s, dir))
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .localCheckpoint() // round-1 count + merge application read this
    // length guard: a word fully collapsed by the merge is 1 char,
    // and sequence(1, 0) is DESCENDING in Spark (phantom pairs) where
    // DuckDB's range(1,1) is empty — see CurationOps.bpeTrain
    def pairCounts(df: DataFrame): DataFrame = df
      .filter(length(col("w")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("f")).as("weighted_count"))
    val r1 = pairCounts(words).localCheckpoint() // top-10 + argmax
    val best = r1.orderBy(col("weighted_count").desc, col("pair"))
      .limit(1).select(col("pair").as("__bp"))
    val r2 = pairCounts(
      words.crossJoin(broadcast(best))
        .select(expr("replace(w, __bp, char(1))").as("w"), col("f")))
      .crossJoin(broadcast(best))
      .select(expr("replace(pair, char(1), '[' || __bp || ']')")
        .as("pair"), col("weighted_count"))
    val w = Window.partitionBy(col("round"))
      .orderBy(col("weighted_count").desc, col("pair"))
    r1.select(lit(1).as("round"), col("pair"), col("weighted_count"))
      .unionByName(r2.select(lit(2).as("round"), col("pair"),
        col("weighted_count")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("round"), col("rank"), col("pair"),
        col("weighted_count"))
      .orderBy(col("round"), col("rank"))
  }


  /** q418_bpe_train — a multi-round BPE TRAINER (Sennrich et al. 2016
    * §3.2), the depth q360's single step lacks: 4 greedy merge rounds
    * unrolled over the word-frequency frame
    * ([[graft.ops.GraphOps.unrolledRounds]], the engine's one BSP
    * fold), each round counting frequency-weighted adjacent symbol
    * pairs, taking the argmax (count desc, pair asc — the canonical
    * deterministic tie-break), collapsing it to a sentinel char(round)
    * across the vocabulary, and recording the merge. Output is the
    * TRAINED MERGE TABLE — round, merged pair rendered with nested
    * brackets (a round-3 pair that merges round-1's output renders
    * `[[th]e]`), and the pair's weighted count at merge time — i.e.
    * the artifact a tokenizer ships. Scale shape identical to q360:
    * the corpus is touched ONCE (word collapse); all 4 rounds run on
    * the |vocab|-sized checkpointed frame, which is why real 100 TB
    * BPE training iterates on word counts, never raw text. The oracle
    * replays the same 4 greedy rounds unrolled (argmax and replace are
    * bit-identical in both engines), so the merge table hash-matches.
    */
  def q418BpeTrain(s: SparkSession, dir: String): DataFrame =
    CurationOps.bpeTrain(
      Tables.parallelize(Tables.documents(s, dir))
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
        .groupBy(col("w")).agg(count(lit(1)).as("f")),
      rounds = 4)

  /** q384_readability — Flesch reading-ease scoring (Flesch 1948; the
    * public-domain readability formula): FRE = 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/word), with sentences
    * counted as terminal-punctuation runs (min 1) and syllables by the
    * classic vowel-group heuristic ([aeiouy]+ runs) — the cheap,
    * codegen-friendly proxy every large-scale text-quality pipeline
    * uses (a dictionary syllabifier can't run at 100 TB). Extends the
    * X4/X77 quality family with the READABILITY axis: q148's fused
    * vector measures noise, this measures audience level. Per-language
    * rollup with the share of "easy" (FRE ≥ 60) docs; one scan-stage
    * pass, all regex counting inside codegen.
    */
  def q384Readability(s: SparkSession, dir: String): DataFrame =
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("lang"),
        size(TextOps.tokens(col("text"))).cast("double").as("__w"),
        greatest(size(expr(
          "regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
          .cast("double").as("__s"),
        size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
          .cast("double").as("__y"))
      .filter(col("__w") > 0)
      .withColumn("__fre", lit(206.835)
        - lit(1.015) * try_divide(col("__w"), col("__s"))
        - lit(84.6) * try_divide(col("__y"), col("__w")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(try_divide(col("__w"), col("__s"))), 4)
          .as("words_per_sentence"),
        round(avg(try_divide(col("__y"), col("__w"))), 4)
          .as("syllables_per_word"),
        round(avg(col("__fre")), 4).as("avg_fre"),
        round(avg((col("__fre") >= 60).cast("double")), 4)
          .as("share_easy"))
      .orderBy(col("lang"))

  /** q385_vocab_richness — unseen-vocabulary estimation: per language,
    * observed type count V, bias-corrected Chao1 richness estimate
    * V + f₁(f₁−1)/(2(f₂+1)) from the singleton/doubleton counts
    * (Chao 1984), and the Good–Turing unseen probability mass f₁/N —
    * "how much vocabulary has this corpus NOT seen yet", the
    * statistical answer to whether more data will keep growing the
    * vocab (the asymptote q268's Heaps-law FIT extrapolates, estimated
    * here nonparametrically from the frequency-of-frequencies). Two
    * map-side-combined aggregations (token counts → count-of-counts);
    * nothing unbounded.
    */
  def q385VocabRichness(s: SparkSession, dir: String): DataFrame =
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("lang"),
        explode(TextOps.tokens(col("text"))).as("__t"))
      .groupBy(col("lang"), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("v_observed"),
        sum(col("__c")).as("n_tokens"),
        count(when(col("__c") === 1, 1)).as("f1"),
        count(when(col("__c") === 2, 1)).as("f2"))
      .select(col("lang"), col("v_observed"), col("n_tokens"),
        col("f1"), col("f2"),
        round(col("v_observed") +
          col("f1") * (col("f1") - 1) /
            (lit(2.0) * (col("f2") + 1)), 2).as("chao1_est"),
        (round(try_divide(col("f1").cast("double"), col("n_tokens")), 6) + lit(0.0))
          .as("gt_unseen_mass"))
      .orderBy(col("lang"))

  val queries: Map[String, Q] = Map(
    "q384_readability" -> (q384Readability _),
    "q385_vocab_richness" -> (q385VocabRichness _),
    "q360_bpe_merge" -> (q360BpeMerge _),
    "q418_bpe_train" -> (q418BpeTrain _),
    "q143_containment" -> (q143Containment _),
    "q148_quality_vector" -> (q148QualityVector _),
    "q155_sentences" -> (q155Sentences _),
    "q156_datacard" -> (q156Datacard _),
    "q169_decontaminated_release" -> (q169DecontaminatedRelease _),
    "q171_boilerplate" -> (q171Boilerplate _),
    "q178_line_dedup" -> (q178LineDedup _),
    "q186_mixture_weights" -> (q186MixtureWeights _),
    "q324_repeated_substrings" -> (q324RepeatedSubstrings _),
    "q85_decontaminate" -> (q85Decontaminate _),
    "q86_repetition" -> (q86Repetition _),
    "q87_token_budget" -> (q87TokenBudget _),
    "q88_doc_frequency" -> (q88DocFrequency _),
    "q136_prefix_join" -> (q136PrefixJoin _),
    "q137_bloom_decontaminate" -> (q137BloomDecontaminate _),
    "q138_psi_drift" -> (q138PsiDrift _),
    "q139_bigram_logprob" -> (q139BigramLogprob _),
  )

  import ExtensionQueries.{toksSql, tokSetSql, stopIn}

  val oracle: Map[String, String] = Map(
    "q384_readability" ->
      s"""WITH d AS (SELECT lang,
        |    len($toksSql)::DOUBLE AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |      ::DOUBLE AS sen,
        |    len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      ::DOUBLE AS syl
        |  FROM documents),
        |f AS (SELECT lang, w, sen, syl,
        |    206.835 - 1.015 * (w / sen) - 84.6 * (syl / w) AS fre
        |  FROM d WHERE w > 0)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |  round(avg(w / sen), 4) AS words_per_sentence,
        |  round(avg(syl / w), 4) AS syllables_per_word,
        |  round(avg(fre), 4) AS avg_fre,
        |  round(avg(CASE WHEN fre >= 60 THEN 1.0 ELSE 0.0 END), 4)
        |    AS share_easy
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "q385_vocab_richness" ->
      s"""WITH t AS (SELECT lang, unnest($toksSql) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, count(*)::BIGINT AS c FROM t
        |  GROUP BY 1, 2),
        |a AS (SELECT lang, count(*)::BIGINT AS v_observed,
        |    sum(c)::BIGINT AS n_tokens,
        |    count(CASE WHEN c = 1 THEN 1 END)::BIGINT AS f1,
        |    count(CASE WHEN c = 2 THEN 1 END)::BIGINT AS f2
        |  FROM c GROUP BY 1)
        |SELECT lang, v_observed, n_tokens, f1, f2,
        |  round(v_observed + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 2)
        |    AS chao1_est,
        |  (round(f1 / nullif(n_tokens, 0)::DOUBLE, 6) + 0.0)
        |    AS gt_unseen_mass
        |FROM a ORDER BY lang""".stripMargin,
    "q360_bpe_merge" ->
      """WITH wr AS (SELECT unnest(string_split_regex(lower(text),
        |    '\s+')) AS w FROM documents),
        |wf AS (SELECT w, count(*)::BIGINT AS f FROM wr
        |  WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        |  GROUP BY 1),
        |p1 AS (SELECT substr(w, i::INT, 2) AS pair,
        |    sum(f)::BIGINT AS weighted_count
        |  FROM wf, unnest(range(1, len(w))) AS u(i) GROUP BY 1),
        |best AS (SELECT pair FROM p1
        |  ORDER BY weighted_count DESC, pair LIMIT 1),
        |wm AS (SELECT replace(w, (SELECT pair FROM best), chr(1)) AS w,
        |    f FROM wf),
        |p2r AS (SELECT substr(w, i::INT, 2) AS pair,
        |    sum(f)::BIGINT AS weighted_count
        |  FROM wm, unnest(range(1, len(w))) AS u(i) GROUP BY 1),
        |p2 AS (SELECT replace(pair, chr(1),
        |    '[' || (SELECT pair FROM best) || ']') AS pair,
        |    weighted_count FROM p2r),
        |u AS (SELECT 1 AS round, pair, weighted_count FROM p1
        |  UNION ALL SELECT 2, pair, weighted_count FROM p2),
        |r AS (SELECT round, pair, weighted_count,
        |    row_number() OVER (PARTITION BY round
        |      ORDER BY weighted_count DESC, pair) AS rank
        |  FROM u)
        |SELECT round, rank, pair, weighted_count FROM r
        |WHERE rank <= 10 ORDER BY round, rank""".stripMargin,
    "q418_bpe_train" ->
      """WITH wr AS (SELECT unnest(string_split_regex(lower(text),
        |    '\s+')) AS w FROM documents),
        |wf AS (SELECT w, count(*)::BIGINT AS f FROM wr
        |  WHERE regexp_matches(w, '^[a-z]+$') AND len(w) >= 2
        |  GROUP BY 1),
        |p1 AS (SELECT substr(w, i::INT, 2) AS pair,
        |    sum(f)::BIGINT AS wc
        |  FROM wf, unnest(range(1, len(w))) AS u(i) GROUP BY 1),
        |b1 AS (SELECT pair, wc FROM p1
        |  ORDER BY wc DESC, pair LIMIT 1),
        |w1 AS (SELECT replace(w, (SELECT pair FROM b1), chr(1)) AS w,
        |    f FROM wf),
        |p2 AS (SELECT substr(w, i::INT, 2) AS pair,
        |    sum(f)::BIGINT AS wc
        |  FROM w1, unnest(range(1, len(w))) AS u(i) GROUP BY 1),
        |b2 AS (SELECT pair, wc FROM p2
        |  ORDER BY wc DESC, pair LIMIT 1),
        |w2 AS (SELECT replace(w, (SELECT pair FROM b2), chr(2)) AS w,
        |    f FROM w1),
        |p3 AS (SELECT substr(w, i::INT, 2) AS pair,
        |    sum(f)::BIGINT AS wc
        |  FROM w2, unnest(range(1, len(w))) AS u(i) GROUP BY 1),
        |b3 AS (SELECT pair, wc FROM p3
        |  ORDER BY wc DESC, pair LIMIT 1),
        |w3 AS (SELECT replace(w, (SELECT pair FROM b3), chr(3)) AS w,
        |    f FROM w2),
        |p4 AS (SELECT substr(w, i::INT, 2) AS pair,
        |    sum(f)::BIGINT AS wc
        |  FROM w3, unnest(range(1, len(w))) AS u(i) GROUP BY 1),
        |b4 AS (SELECT pair, wc FROM p4
        |  ORDER BY wc DESC, pair LIMIT 1)
        |SELECT 1 AS round, (SELECT pair FROM b1) AS pair,
        |  (SELECT wc FROM b1) AS weighted_count
        |WHERE (SELECT pair FROM b1) IS NOT NULL
        |UNION ALL SELECT 2,
        |  replace((SELECT pair FROM b2), chr(1),
        |    '[' || (SELECT pair FROM b1) || ']'),
        |  (SELECT wc FROM b2)
        |WHERE (SELECT pair FROM b2) IS NOT NULL
        |UNION ALL SELECT 3,
        |  replace(replace((SELECT pair FROM b3), chr(2),
        |      '[' || (SELECT pair FROM b2) || ']'), chr(1),
        |    '[' || (SELECT pair FROM b1) || ']'),
        |  (SELECT wc FROM b3)
        |WHERE (SELECT pair FROM b3) IS NOT NULL
        |UNION ALL SELECT 4,
        |  replace(replace(replace((SELECT pair FROM b4), chr(3),
        |        '[' || (SELECT pair FROM b3) || ']'), chr(2),
        |      '[' || (SELECT pair FROM b2) || ']'), chr(1),
        |    '[' || (SELECT pair FROM b1) || ']'),
        |  (SELECT wc FROM b4)
        |WHERE (SELECT pair FROM b4) IS NOT NULL
        |ORDER BY round""".stripMargin,
    "q324_repeated_substrings" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |g AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens, i AS pos,
        |    ('0x' || substr(md5(array_to_string(
        |      list_slice(toks, i + 1, i + 8), ' ')), 1, 8))::BIGINT
        |      AS gh
        |  FROM t, unnest(range(0, greatest(len(toks) - 8, 0) + 1))
        |    AS u(i)),
        |rep AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.n_tokens, g.pos,
        |    least(g.pos + 8, g.n_tokens)::BIGINT AS e
        |  FROM g JOIN rep USING (gh)),
        |w AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM m),
        |isl AS (SELECT *, sum(CASE WHEN pmax IS NULL OR pos >= pmax
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
        |      ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |  FROM w),
        |sp AS (SELECT doc_id, n_tokens, island,
        |    count(*)::BIGINT AS starts,
        |    (max(e) - min(pos))::BIGINT AS covered
        |  FROM isl GROUP BY 1, 2, 3)
        |SELECT doc_id, n_tokens, sum(starts)::BIGINT AS n_rep_grams,
        |  count(*)::BIGINT AS n_spans,
        |  sum(covered)::BIGINT AS covered_tokens,
        |  (round(sum(covered) / n_tokens::DOUBLE, 4) + 0.0) AS coverage
        |FROM sp GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,
    "q169_decontaminated_release" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
        |c AS (SELECT * FROM t WHERE doc_id % 50 <> 0),
        |ev AS (SELECT * FROM t WHERE doc_id % 50 = 0),
        |csh AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 5, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 5), ' ')))) AS s
        |  FROM c),
        |ch AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS sh_hash FROM csh),
        |esh AS (SELECT DISTINCT ('0x' || substr(md5(s), 1, 8))::BIGINT AS sh_hash FROM (
        |    SELECT unnest(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 5, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 5), ' ')))) AS s
        |    FROM ev)),
        |hit1 AS (SELECT DISTINCT ch.doc_id FROM ch JOIN esh USING (sh_hash)),
        |cset AS (SELECT doc_id, list_distinct(toks) AS st FROM c),
        |eset AS (SELECT list_distinct(toks) AS et FROM ev),
        |hit2 AS (SELECT DISTINCT cset.doc_id FROM cset, eset
        |  WHERE len(list_intersect(cset.st, eset.et)) >= len(eset.et) * 0.95 - 1e-9),
        |bad AS (SELECT doc_id FROM hit1 UNION SELECT doc_id FROM hit2),
        |before_t AS (SELECT lang, count(*) AS n_docs_before FROM c GROUP BY lang),
        |after_t AS (SELECT lang, count(*) AS n_docs_after,
        |    sum(len(toks))::BIGINT AS n_tokens_after
        |  FROM c WHERE doc_id NOT IN (SELECT doc_id FROM bad) GROUP BY lang)
        |SELECT lang, n_docs_before, n_docs_after, n_tokens_after,
        |  n_docs_before - n_docs_after AS n_removed
        |FROM before_t JOIN after_t USING (lang) ORDER BY lang""".stripMargin,
    "q171_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
        |sh AS (SELECT lang, doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 5, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 5), ' ')))) AS s
        |  FROM t),
        |h AS (SELECT lang, doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS sh_hash FROM sh),
        |f AS (SELECT lang, sh_hash, count(*) AS df FROM h GROUP BY 1, 2)
        |SELECT h.doc_id, count(*) AS n_shingles,
        |  count(*) FILTER (WHERE f.df >= 2) AS n_boiler,
        |  round((count(*) FILTER (WHERE f.df >= 2))::DOUBLE
        |    / greatest(count(*), 1), 4) AS boiler_frac
        |FROM h JOIN f USING (lang, sh_hash)
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
    "q85_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 5, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 5), ' ')))) AS s
        |  FROM t),
        |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS sh_hash FROM sh),
        |b AS (SELECT DISTINCT sh_hash FROM h WHERE doc_id % 50 = 0)
        |SELECT h.doc_id, count(*) AS n_hits
        |FROM h JOIN b USING (sh_hash)
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
    "q86_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |g AS (SELECT doc_id, greatest(len(toks) - 2, 0)::BIGINT AS n_ngrams,
        |    len(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 3, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')))) AS n_dist
        |  FROM t)
        |SELECT doc_id, n_ngrams,
        |  CASE WHEN n_ngrams > 0
        |       THEN round(1.0 - n_dist::DOUBLE / n_ngrams, 4)
        |       ELSE 0.0 END AS rep_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "q87_token_budget" ->
      s"""WITH t AS (SELECT lang, doc_id, $toksSql AS toks FROM documents),
        |sc AS (SELECT lang, doc_id, len(toks)::BIGINT AS n_tokens,
        |    round(len(list_filter(toks, t -> t IN ${stopIn(TextOps.stopwords)}))::DOUBLE
        |          / greatest(len(toks), 1), 4) AS score
        |  FROM t),
        |c AS (SELECT lang, doc_id, n_tokens,
        |    (sum(n_tokens) OVER (PARTITION BY lang ORDER BY score DESC, doc_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tokens
        |  FROM sc)
        |SELECT lang, doc_id, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 5000 ORDER BY lang, doc_id""".stripMargin,
    "q88_doc_frequency" ->
      s"""WITH tok AS (SELECT doc_id, unnest($tokSetSql) AS token FROM documents),
        |tot AS (SELECT count(*)::DOUBLE AS n FROM documents)
        |SELECT token, count(*) AS df,
        |  round(count(*) / (SELECT n FROM tot), 4) AS df_frac
        |FROM tok GROUP BY token
        |HAVING count(*) >= 0.25 * (SELECT n FROM tot)
        |ORDER BY df DESC, token""".stripMargin,
    "q186_mixture_weights" ->
      s"""WITH t AS (SELECT lang, sum(len($toksSql))::BIGINT AS n_tokens
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT sum(n_tokens)::DOUBLE AS tt FROM t),
         |p AS (SELECT lang, n_tokens, n_tokens / tt AS sh,
         |    pow(n_tokens / tt, 0.3) AS pa FROM t, tot),
         |z AS (SELECT sum(pa) AS zz FROM p)
         |SELECT lang, n_tokens, round(sh, 6) AS share,
         |  (round(pa / zz, 6) + 0.0) AS weight,
         |  (round(pa / zz * 1000000) + 0.0)::BIGINT AS alloc_tokens
         |FROM p, z ORDER BY lang""".stripMargin,
    "q178_line_dedup" ->
      """WITH s AS (SELECT doc_id,
        |    list_filter(list_transform(string_split_regex(text, '[.!?]+'),
        |      x -> trim(x)), x -> len(x) > 0) AS sents
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(sents) AS sent,
        |    generate_subscripts(sents, 1) AS idx FROM s),
        |h AS (SELECT md5(array_to_string(list_sort(list_distinct(
        |      list_filter(string_split_regex(lower(sent), '\s+'),
        |        tk -> len(tk) > 0))), ' ')) AS sent_hash,
        |    doc_id, (idx - 1)::BIGINT AS sent_idx FROM e),
        |g AS (SELECT sent_hash, count(*) AS n_copies FROM h
        |      GROUP BY 1 HAVING count(*) > 1),
        |k AS (SELECT sent_hash, doc_id AS keep_doc, sent_idx AS keep_idx,
        |    row_number() OVER (PARTITION BY sent_hash
        |                       ORDER BY doc_id, sent_idx) AS rn
        |  FROM h)
        |SELECT g.sent_hash, g.n_copies, k.keep_doc, k.keep_idx
        |FROM g JOIN k USING (sent_hash) WHERE k.rn = 1
        |ORDER BY sent_hash""".stripMargin,
    "q155_sentences" ->
      """WITH s AS (SELECT doc_id,
        |    list_filter(list_transform(string_split_regex(text, '[.!?]+'),
        |      x -> trim(x)), x -> len(x) > 0) AS sents
        |  FROM documents),
        |e AS (SELECT doc_id, unnest(sents) AS sent,
        |    generate_subscripts(sents, 1) AS idx FROM s)
        |SELECT doc_id, (idx - 1)::BIGINT AS sent_idx,
        |  len(list_filter(string_split_regex(sent, '\s+'),
        |    tk -> len(tk) > 0))::BIGINT AS n_words,
        |  md5(sent) AS sent_hash
        |FROM e ORDER BY doc_id, sent_idx""".stripMargin,
    "q156_datacard" ->
      s"""WITH t AS (SELECT lang, text, $toksSql AS toks FROM documents),
        |f AS (SELECT lang, len(toks)::BIGINT AS nt,
        |    round(len(list_filter(toks, tk -> tk IN ${stopIn(TextOps.stopwords)}))::DOUBLE
        |          / greatest(len(toks), 1), 4) AS sr
        |  FROM t),
        |d AS (SELECT lang, md5(text) AS h, count(*) AS c FROM documents GROUP BY lang, h),
        |dd AS (SELECT lang, sum(c - 1)::BIGINT AS n_exact_dupes FROM d GROUP BY lang)
        |SELECT f.lang, count(*) AS n_docs, sum(nt)::BIGINT AS n_tokens,
        |  round(avg(nt), 2) AS avg_tokens,
        |  min(nt) AS min_tokens, max(nt) AS max_tokens,
        |  round(avg(sr), 4) AS avg_stop_ratio,
        |  any_value(n_exact_dupes) AS n_exact_dupes,
        |  (round(any_value(n_exact_dupes)::DOUBLE / count(*), 4) + 0.0) AS dup_rate
        |FROM f JOIN dd ON f.lang = dd.lang
        |GROUP BY f.lang ORDER BY f.lang""".stripMargin,
    "q148_quality_vector" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |g AS (SELECT doc_id, toks,
        |    greatest(len(toks) - 2, 0)::BIGINT AS n_ngrams,
        |    len(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 3, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')))) AS n_dist3
        |  FROM t)
        |SELECT doc_id, len(toks)::BIGINT AS n_tokens,
        |  len(list_distinct(toks))::BIGINT AS n_distinct,
        |  round(len(list_filter(toks, tk -> tk IN ${stopIn(TextOps.stopwords)}))::DOUBLE
        |        / greatest(len(toks), 1), 4) AS stop_ratio,
        |  CASE WHEN n_ngrams > 0
        |       THEN round(1.0 - n_dist3::DOUBLE / n_ngrams, 4)
        |       ELSE 0.0 END AS rep_frac,
        |  round(len(array_to_string(toks, ''))::DOUBLE
        |        / greatest(len(toks), 1), 4) AS mean_token_len
        |FROM g ORDER BY doc_id""".stripMargin,
    "q143_containment" ->
      s"""WITH t AS (SELECT doc_id, $tokSetSql AS toks FROM documents),
        |c AS (SELECT * FROM t WHERE doc_id % 25 <> 0),
        |e AS (SELECT doc_id AS eval_id, toks AS etoks FROM t WHERE doc_id % 25 = 0),
        |p AS (SELECT c.doc_id, e.eval_id,
        |    len(list_intersect(c.toks, e.etoks)) AS hits, len(e.etoks) AS esz
        |  FROM c, e)
        |SELECT doc_id, eval_id,
        |  round(hits::DOUBLE / esz, 4) AS containment
        |FROM p WHERE hits >= esz * 0.95 - 1e-9
        |ORDER BY doc_id, eval_id""".stripMargin,
    // the naive all-pairs join: the hash match proves the prefix
    // filter's full recall, not just its precision
    "q136_prefix_join" ->
      s"""WITH t AS (SELECT doc_id, $tokSetSql AS toks FROM documents),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.toks, b.toks))::DOUBLE AS i,
        |    (len(a.toks) + len(b.toks))::DOUBLE AS n2
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, round(i / (n2 - i), 4) AS jaccard
        |FROM p WHERE i / (n2 - i) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    // identical overlap semantics to q85's oracle: the Bloom prune is
    // invisible in the output (4-grams, benches = doc_id % 25)
    "q137_bloom_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      range(0, greatest(len(toks) - 4, 0) + 1),
        |      i -> array_to_string(list_slice(toks, i + 1, i + 4), ' ')))) AS s
        |  FROM t),
        |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS sh_hash FROM sh),
        |b AS (SELECT DISTINCT sh_hash FROM h WHERE doc_id % 25 = 0)
        |SELECT h.doc_id, count(*) AS n_hits
        |FROM h JOIN b USING (sh_hash)
        |GROUP BY h.doc_id ORDER BY h.doc_id""".stripMargin,
    "q138_psi_drift" ->
      """WITH v AS (SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
        |      THEN 'ref' ELSE 'cur' END AS cohort,
        |    o_totalprice::DOUBLE AS val FROM orders),
        |f AS (SELECT quantile_cont(val, 0.1) AS f0, quantile_cont(val, 0.2) AS f1,
        |    quantile_cont(val, 0.3) AS f2, quantile_cont(val, 0.4) AS f3,
        |    quantile_cont(val, 0.5) AS f4, quantile_cont(val, 0.6) AS f5,
        |    quantile_cont(val, 0.7) AS f6, quantile_cont(val, 0.8) AS f7,
        |    quantile_cont(val, 0.9) AS f8
        |  FROM v WHERE cohort = 'ref'),
        |b AS (SELECT cohort,
        |    CASE WHEN val <= f0 THEN 1 WHEN val <= f1 THEN 2
        |         WHEN val <= f2 THEN 3 WHEN val <= f3 THEN 4
        |         WHEN val <= f4 THEN 5 WHEN val <= f5 THEN 6
        |         WHEN val <= f6 THEN 7 WHEN val <= f7 THEN 8
        |         WHEN val <= f8 THEN 9 ELSE 10 END AS bin
        |  FROM v, f),
        |c AS (SELECT cohort, bin, count(*) AS n FROM b GROUP BY cohort, bin),
        |t AS (SELECT cohort, count(*) AS tot FROM b GROUP BY cohort),
        |g AS (SELECT t.cohort, gs.bin, t.tot
        |  FROM t, (SELECT unnest(range(1, 11)) AS bin) gs),
        |sm AS (SELECT g.cohort, g.bin,
        |    (coalesce(c.n, 0) + 0.5) / (g.tot + 5.0) AS share
        |  FROM g LEFT JOIN c ON g.cohort = c.cohort AND g.bin = c.bin),
        |r AS (SELECT bin, share AS ref_share FROM sm WHERE cohort = 'ref'),
        |cu AS (SELECT cohort, bin, share AS cur_share FROM sm WHERE cohort <> 'ref')
        |SELECT cohort, bin, round(ref_share, 6) AS ref_share,
        |  round(cur_share, 6) AS cur_share,
        |  round((cur_share - ref_share) * ln(cur_share / ref_share), 6) AS psi_term,
        |  (round(sum((cur_share - ref_share) * ln(cur_share / ref_share))
        |    OVER (PARTITION BY cohort), 6) + 0.0) AS psi
        |FROM cu JOIN r USING (bin)
        |ORDER BY bin""".stripMargin,
    "q139_bigram_logprob" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |tt AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        |bg AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)),
        |      i -> {'w1': toks[i], 'w2': toks[i + 1]})) AS b
        |  FROM tt),
        |bi AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY w1, w2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
        |vv AS (SELECT count(DISTINCT tok)::DOUBLE AS v
        |  FROM (SELECT unnest($tokSetSql) AS tok FROM documents))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  (round(sum(ln((c2 + 1) / (c1 + v))) / count(*), 4) + 0.0) AS logprob
        |FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
