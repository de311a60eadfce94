package graft.queries

import graft.Tables
import graft.ops.{CurationOps, DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, Q] = Map(
    "q85_decontaminate" -> (q85Decontaminate _),
    "q86_repetition" -> (q86Repetition _),
    "q87_token_budget" -> (q87TokenBudget _),
    "q88_doc_frequency" -> (q88DocFrequency _),
  )

  import ExtensionQueries.{toksSql, tokSetSql, stopIn}

  val oracle: Map[String, String] = Map(
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
  )
}
