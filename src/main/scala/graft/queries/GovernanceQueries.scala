package graft.queries

import graft.Tables
import graft.ops.{PrivacyOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Governance / release-QA manifest (SURVEY.md §2.13 X86-X90): the
  * privacy and audit passes that run between curation and publishing a
  * corpus snapshot — redaction, pseudonymization, entropy QA, lang-id
  * evaluation, and cross-split leakage audit. Each oracle-checked
  * against DuckDB.
  */
object GovernanceQueries {

  type Q = (SparkSession, String) => DataFrame

  /** q157_redact — pattern redaction report (`PrivacyOps.redact`):
    * digit runs in event props masked to `#`, counted per event type.
    * Redaction is a scan-stage projection (regexp_replace +
    * regexp_extract_all, both codegen'd) — at 100 TB the pass is
    * bounded by the read, and the report is one map-side-combined
    * aggregation.
    */
  def q157Redact(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        PrivacyOps.redact(col("props"), "\\d+", "#").as("__r"),
        PrivacyOps.matchCount(col("props"), "\\d+").as("__c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__c")).cast("long").as("n_redactions"),
        countDistinct(col("__r")).as("n_forms"))
      .orderBy(col("event_type"))

  /** q158_pseudonymize — keyed-hash pseudonymization audit
    * (`PrivacyOps.surrogate`): user ids replaced by deterministic md5
    * surrogates; the report proves the mapping is injective in this
    * data (n_users == n_surrogates per type, so joins on the surrogate
    * equal joins on the raw key). Engine-portable — the oracle computes
    * the identical surrogates.
    */
  def q158Pseudonymize(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        PrivacyOps.surrogate(col("user_id"), "pseud").as("__s"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("__s")).as("n_surrogates"))
      .orderBy(col("event_type"))

  /** q159_char_entropy — per-document letter-distribution Shannon
    * entropy (`PrivacyOps.letterEntropy`): the release-QA signal that
    * catches degenerate repeated-character text that length/stopword
    * filters miss. Pure scan-stage projection, no exchange at any
    * scale.
    */
  def q159CharEntropy(s: SparkSession, dir: String): DataFrame =
    Tables.parallelize(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"),
        PrivacyOps.letterCount(col("text")).as("n_letters"),
        round(PrivacyOps.letterEntropy(col("text")), 4).as("entropy"))
      .orderBy(col("doc_id"))

  /** q160_langid_eval — confusion matrix of the stopword-profile
    * lang-id heuristic (q31) against the labeled `lang` column: how a
    * pipeline validates a cheap classifier before trusting it to route
    * 100 TB. Scores + argmax are scan-stage; the matrix is one
    * |langs|²-bounded aggregation.
    */
  def q160LangidEval(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.parallelize(Tables.documents(s, dir))
      .select(col("lang"),
        TextOps.langIdScore(col("text"), "en").as("s_en"),
        TextOps.langIdScore(col("text"), "de").as("s_de"),
        TextOps.langIdScore(col("text"), "es").as("s_es"),
        TextOps.langIdScore(col("text"), "fr").as("s_fr"))
      .withColumn("predicted_lang",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
          col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"),
            "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
    scored.groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  /** q161_split_leak — cross-split contamination audit: exact-dup
    * fingerprints (q23) shared between train/val/test assignments
    * (q131's portable hash split). The leak check every eval pipeline
    * must run — a val doc with a train twin inflates every metric.
    * Fingerprints join on their hash (near-dup-sized, not corpus-
    * sized); pair counts collapse per split pair.
    */
  def q161SplitLeak(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.parallelize(Tables.documents(s, dir))
      .withColumn("bucket",
        pmod(TextOps.hash32(col("doc_id").cast("string"), seed = "split:"),
          lit(10L)))
      .withColumn("split",
        when(col("bucket") < 8, lit("train"))
          .when(col("bucket") === 8, lit("val")).otherwise(lit("test")))
      .withColumn("rank",
        when(col("split") === "train", 0)
          .when(col("split") === "val", 1).otherwise(2))
      .select(col("doc_id"), col("split"), col("rank"),
        TextOps.fingerprint(col("text")).as("fp"))
    val a = d.select(col("fp"), col("split").as("split_a"),
      col("rank").as("__ra"), col("doc_id").as("__ida"))
    val b = d.select(col("fp"), col("split").as("split_b"),
      col("rank").as("__rb"), col("doc_id").as("__idb"))
    a.join(b, Seq("fp"))
      .filter(col("__ra") < col("__rb"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("fp")).as("n_shared_fps"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** q229_k_anonymity — k-anonymity / l-diversity release gate
    * (`PrivacyOps.kAnonymityAudit`, k=5, l=3): customers grouped by
    * the quasi-identifier pair (market segment, nation); account
    * balance sign+magnitude bucket is the sensitive attribute. The
    * audit a pipeline runs before publishing any user-keyed table —
    * classes smaller than k re-identify, k-anonymous classes with
    * uniform sensitive values still disclose. Two-level aggregation,
    * |classes| intermediate rows.
    */
  def q229KAnonymity(s: SparkSession, dir: String): DataFrame =
    PrivacyOps.kAnonymityAudit(
      Tables.customer(s, dir)
        .withColumn("bal_bucket",
          (col("c_acctbal") / lit(2000.0)).cast("int")),
      Seq("c_mktsegment", "c_nationkey"), "bal_bucket", k = 5, l = 3)

  /** q316_dp_counts — seeded Laplace mechanism for differentially
    * private count release (Dwork et al. 2006): per-event-type counts
    * plus Laplace(Δ/ε) noise with sensitivity Δ=1 and ε=1, the noise
    * drawn by inverse-CDF from a deterministic hash uniform
    * u = (h32(key) mod 10⁶ + 0.5)/10⁶ — the seeded-randomness idiom
    * every reproducible-DP pipeline uses (and the reason the oracle
    * can hash-check a "random" mechanism: both engines replay the
    * identical md5-derived draw). Output keeps the true count beside
    * the noisy release because this is the AUDIT view (the published
    * view would project the released column only); the `released`
    * column is the clamped non-negative integer form real DP
    * interfaces emit. One map-side-combined aggregation; the
    * mechanism is pure projection arithmetic over the |types| frame.
    */
  def q316DpCounts(s: SparkSession, dir: String): DataFrame = {
    val eps = 1.0
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("__u",
        (pmod(graft.ops.TextOps.hash32(col("event_type"), "dp:"),
          lit(1000000)) + 0.5) / 1000000.0)
      .withColumn("__x", col("__u") - 0.5)
      .withColumn("__noise",
        -lit(1.0 / eps) * signum(col("__x")) *
          log(lit(1.0) - lit(2.0) * abs(col("__x"))))
      .select(col("event_type"), col("n_true"),
        round(col("__noise"), 4).as("noise"),
        round(col("n_true") + col("__noise"), 4).as("noisy_count"),
        greatest(lit(0L),
          round(col("n_true") + col("__noise"), 0).cast("long"))
          .as("released"),
        lit(eps).as("epsilon"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q316_dp_counts" -> (q316DpCounts _),
    "q229_k_anonymity" -> (q229KAnonymity _),
    "q157_redact" -> (q157Redact _),
    "q158_pseudonymize" -> (q158Pseudonymize _),
    "q159_char_entropy" -> (q159CharEntropy _),
    "q160_langid_eval" -> (q160LangidEval _),
    "q161_split_leak" -> (q161SplitLeak _),
  )

  import ExtensionQueries.{toksSql, tokSetSql, stopIn}

  private def h32(expr: String, seed: String = ""): String =
    s"('0x' || substr(md5('$seed' || $expr), 1, 8))::BIGINT"

  // mirrors PrivacyOps.letterEntropy term-by-term ('a'..'z', same
  // order → bit-identical double sum)
  private val entropySql: String = {
    val total = "greatest(len(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE, 1.0)"
    ('a' to 'z').map { ch =>
      val cnt = s"(len(lower(text)) - len(replace(lower(text), '$ch', '')))::DOUBLE"
      s"CASE WHEN $cnt > 0 THEN -($cnt / $total) * ln($cnt / $total) ELSE 0.0 END"
    }.mkString("(", " + ", ")")
  }

  val oracle: Map[String, String] = Map(
    "q316_dp_counts" ->
      s"""WITH g AS (SELECT event_type, count(*)::BIGINT AS n_true
        |  FROM events GROUP BY 1),
        |n AS (SELECT *,
        |    (${h32("event_type", "dp:")} % 1000000 + 0.5)
        |      / 1000000.0 AS u FROM g),
        |m AS (SELECT event_type, n_true,
        |    -sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        |  FROM n)
        |SELECT event_type, n_true, round(noise, 4) AS noise,
        |  round(n_true + noise, 4) AS noisy_count,
        |  greatest(0, round(n_true + noise, 0)::BIGINT) AS released,
        |  1.0 AS epsilon
        |FROM m ORDER BY event_type""".stripMargin,
    "q229_k_anonymity" ->
      """WITH c AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    count(*) AS sz,
        |    count(DISTINCT trunc(c_acctbal / 2000.0)::INT) AS div
        |  FROM customer GROUP BY 1, 2)
        |SELECT count(*) AS n_classes,
        |  sum(sz)::BIGINT AS n_rows,
        |  min(sz) AS min_class_size,
        |  count(CASE WHEN sz < 5 THEN 1 END) AS classes_below_k,
        |  coalesce(sum(CASE WHEN sz < 5 THEN sz END), 0)::BIGINT
        |    AS rows_below_k,
        |  count(CASE WHEN div < 3 THEN 1 END) AS classes_below_l
        |FROM c""".stripMargin,
    "q157_redact" ->
      """SELECT event_type, count(*) AS n_events,
        |  sum(len(regexp_extract_all(props, '\d+')))::BIGINT AS n_redactions,
        |  count(DISTINCT regexp_replace(props, '\d+', '#', 'g')) AS n_forms
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q158_pseudonymize" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT md5('pseud:' || user_id::VARCHAR)) AS n_surrogates
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q159_char_entropy" ->
      s"""SELECT doc_id, lang,
         |  len(regexp_replace(lower(text), '[^a-z]', '', 'g'))::BIGINT
         |    AS n_letters,
         |  round($entropySql, 4) AS entropy
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q160_langid_eval" ->
      s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
         |s AS (SELECT lang,
         |  len(list_filter(toks, t -> t IN ${stopIn(TextOps.langProfiles("en"))}))::BIGINT AS s_en,
         |  len(list_filter(toks, t -> t IN ${stopIn(TextOps.langProfiles("de"))}))::BIGINT AS s_de,
         |  len(list_filter(toks, t -> t IN ${stopIn(TextOps.langProfiles("es"))}))::BIGINT AS s_es,
         |  len(list_filter(toks, t -> t IN ${stopIn(TextOps.langProfiles("fr"))}))::BIGINT AS s_fr
         |  FROM t),
         |p AS (SELECT lang,
         |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es >= s_fr THEN 'es'
         |       ELSE 'fr' END AS predicted_lang
         |  FROM s)
         |SELECT lang, predicted_lang, count(*) AS n
         |FROM p GROUP BY 1, 2 ORDER BY lang, predicted_lang""".stripMargin,
    "q161_split_leak" ->
      s"""WITH d AS (SELECT doc_id,
         |    ${h32("doc_id::VARCHAR", "split:")} % 10 AS bucket,
         |    md5(array_to_string(list_sort($tokSetSql), ' ')) AS fp
         |  FROM documents),
         |sp AS (SELECT doc_id, fp,
         |    CASE WHEN bucket < 8 THEN 'train' WHEN bucket = 8 THEN 'val'
         |         ELSE 'test' END AS split,
         |    CASE WHEN bucket < 8 THEN 0 WHEN bucket = 8 THEN 1
         |         ELSE 2 END AS rnk
         |  FROM d)
         |SELECT a.split AS split_a, b.split AS split_b,
         |  count(*) AS n_pairs, count(DISTINCT a.fp) AS n_shared_fps
         |FROM sp a JOIN sp b ON a.fp = b.fp AND a.rnk < b.rnk
         |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin,
  )
}
