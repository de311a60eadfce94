package graft.ml

import org.apache.spark.ml.clustering.{LDA, LDAModel}
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, IDF, IDFModel, StopWordsRemover}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topic-model pipeline re-expressing `complaints_narrative_LDA.py`
  * (SURVEY.md §2.12 M18-M21, §3.3): clean → stopword removal →
  * CountVectorizer → IDF → LDA(EM).
  *
  * The reference's two Python UDFs disappear:
  *  - `clean_text` (`complaints_narrative_LDA.py:44-57`) becomes pure
  *    Catalyst expressions (lower/regexp_replace/split/filter) — the
  *    whole cleaning stage stays inside whole-stage codegen;
  *  - `map_termID_to_Word` (`:112-120`) becomes a `transform` HOF over a
  *    vocabulary array literal — no broadcast variable, no udf.
  *
  * The reference feeds TF-IDF weights into EM-LDA
  * (`complaints_narrative_LDA.py:78,93`) — statistically dubious (LDA
  * models counts) but reproduced here as the default for parity;
  * `useTfIdf = false` feeds raw term counts instead.
  */
object TopicPipeline {

  /** Reference `clean_text`: lowercase, drop xxxx-redactions, strip
    * non-alpha chars, drop tokens of length ≤ 1. Pure expressions.
    */
  def cleanText(textCol: String): org.apache.spark.sql.Column =
    filter(
      split(
        regexp_replace(
          regexp_replace(lower(col(textCol)), "x{2,}", " "), // xxxx redactions
          "[^a-z\\s]", " "),
        "\\s+"),
      t => length(t) > 1)

  case class TopicModelResult(
      cv: CountVectorizerModel,
      idf: IDFModel,
      lda: LDAModel,
      transformed: DataFrame)

  /** Fit the full chain on `df(textCol)`. Defaults mirror the reference:
    * k=25, seed=123, EM optimizer, vocab 10k
    * (`complaints_narrative_LDA.py:71,86-87`).
    */
  def fit(df: DataFrame, textCol: String, k: Int = 25, seed: Long = 123L,
          vocabSize: Int = 10000, maxIter: Int = 20,
          useTfIdf: Boolean = true, optimizer: String = "em"): TopicModelResult = {
    val tokens = df.withColumn("tokens", cleanText(textCol))
    val remover = new StopWordsRemover()
      .setInputCol("tokens").setOutputCol("filtered")
    val filtered = remover.transform(tokens)

    val cv = new CountVectorizer().setInputCol("filtered")
      .setOutputCol("raw_features").setVocabSize(vocabSize)
      .fit(filtered)
    val tf = cv.transform(filtered)

    val idf = new IDF().setInputCol("raw_features").setOutputCol("features")
      .fit(tf)
    val tfidf = idf.transform(tf)

    val ldaFeatures = if (useTfIdf) "features" else "raw_features"
    val lda = new LDA().setK(k).setSeed(seed).setOptimizer(optimizer)
      .setMaxIter(maxIter).setFeaturesCol(ldaFeatures)
      .fit(tfidf)
    val out = lda.transform(tfidf)
    TopicModelResult(cv, idf, lda, out)
  }

  /** describeTopics with term indices mapped to words — the reference's
    * broadcast-vocab UDF (`complaints_narrative_LDA.py:108-120`) as a
    * `transform` HOF over the vocabulary literal. Vocabulary arrays are
    * bounded (vocabSize), so the literal is driver-small by construction.
    */
  def topicsWithWords(result: TopicModelResult, maxTermsPerTopic: Int = 10): DataFrame = {
    val vocab = array(result.cv.vocabulary.map(lit).toIndexedSeq: _*)
    result.lda.describeTopics(maxTermsPerTopic)
      .withColumn("termWords",
        transform(col("termIndices"), i => element_at(vocab, i + 1)))
  }
}
