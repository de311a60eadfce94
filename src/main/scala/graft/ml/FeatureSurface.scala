package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.BisectingKMeans
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame

/** The reference's imported-but-unused feature surface (SURVEY.md §2.12
  * M22: `init.py:6`, `company_response_RF.py:32-40`,
  * `complaints_narrative_LDA.py:7-8`) implemented as working builders,
  * so every class a reference user imports exists and composes here.
  *
  * Notably `hashingTfPipeline` is the SCALABLE alternative to the
  * CountVectorizer path in `TopicPipeline`: the hashing trick needs no
  * vocabulary-fit pass (CountVectorizer.fit is a full groupBy-count of
  * every token plus a driver-side top-N vocab broadcast — at 100 TB
  * that vocabulary no longer fits, while HashingTF is stateless and
  * streams).
  */
object FeatureSurface {

  /** RegexTokenizer — the idiomatic replacement for the reference's
    * `clean_text` Python UDF (SURVEY §2.11 D1).
    */
  def regexTokenizer(inputCol: String, outputCol: String): RegexTokenizer =
    new RegexTokenizer().setInputCol(inputCol).setOutputCol(outputCol)
      .setPattern("[^a-z]+").setToLowercase(true).setMinTokenLength(2)

  /** OneHotEncoder over a StringIndexer index — the low-cardinality
    * alternative to frequency encoding (dense dims explode at high
    * cardinality; the reference imports it for exactly that reason and
    * backs off to frequency encoding, `company_response_RF.py:32`).
    */
  def oneHotStages(col: String): Array[org.apache.spark.ml.PipelineStage] =
    Array(
      new StringIndexer().setInputCol(col).setOutputCol(s"${col}_idx")
        .setHandleInvalid("keep"),
      new OneHotEncoder().setInputCol(s"${col}_idx")
        .setOutputCol(s"${col}_onehot"))

  /** MinMaxScaler on an assembled numeric vector (`init.py:6`). */
  def minMaxScaler(inputCol: String, outputCol: String): MinMaxScaler =
    new MinMaxScaler().setInputCol(inputCol).setOutputCol(outputCol)

  /** IndexToString — maps 0-based prediction indices back to label
    * strings (`company_response_RF.py:38`); fixes the reference's
    * class-name misattribution (SURVEY §8.4) by construction.
    */
  def indexToString(inputCol: String, outputCol: String,
                    labels: Array[String]): IndexToString =
    new IndexToString().setInputCol(inputCol).setOutputCol(outputCol)
      .setLabels(labels)

  /** Tokenize → HashingTF → IDF: the vocabulary-free TF-IDF pipeline
    * (`company_response_RF.py:40`). numFeatures is the hash width —
    * collisions trade accuracy for a fixed-size, fit-free term space.
    */
  def hashingTfPipeline(textCol: String, numFeatures: Int = 1 << 12): Pipeline =
    new Pipeline().setStages(Array(
      regexTokenizer(textCol, "tokens"),
      new HashingTF().setInputCol("tokens").setOutputCol("raw_tf")
        .setNumFeatures(numFeatures),
      new IDF().setInputCol("raw_tf").setOutputCol("tfidf")))

  /** Plain whitespace Tokenizer (`complaints_narrative_LDA.py:7`) —
    * lowercases and splits on whitespace; the zero-config cousin of
    * [[regexTokenizer]].
    */
  def tokenizer(inputCol: String, outputCol: String): Tokenizer =
    new Tokenizer().setInputCol(inputCol).setOutputCol(outputCol)

  /** VectorIndexer (`init.py:6`) — scans an assembled vector column and
    * re-encodes any dimension with ≤ maxCategories distinct values as
    * categorical indices, so downstream tree models split them
    * categorically instead of numerically.
    */
  def vectorIndexer(inputCol: String, outputCol: String,
                    maxCategories: Int = 8): VectorIndexer =
    new VectorIndexer().setInputCol(inputCol).setOutputCol(outputCol)
      .setMaxCategories(maxCategories).setHandleInvalid("keep")

  /** BisectingKMeans (`complaints_narrative_LDA.py:8`) — divisive
    * hierarchical clustering; here over embedding vectors, the natural
    * companion to the ANN/IVF index in `ops.VectorOps` (cluster ids =
    * coarse IVF cells).
    */
  def bisectingKMeans(featuresCol: String, k: Int,
                      seed: Long = 42L): BisectingKMeans =
    new BisectingKMeans().setFeaturesCol(featuresCol).setK(k).setSeed(seed)
      .setPredictionCol("cluster")

  /** Fit the hashing TF-IDF pipeline and return the transformed frame —
    * convenience used by specs and ReferenceFlows.
    */
  def tfidfByHashing(df: DataFrame, textCol: String,
                     numFeatures: Int = 1 << 12): DataFrame =
    hashingTfPipeline(textCol, numFeatures).fit(df).transform(df)
}
