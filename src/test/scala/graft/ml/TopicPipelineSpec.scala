package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopicPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cleanText lowercases, strips redactions/non-alpha, drops 1-char") {
    val out = Seq("My card XXXX1234 was charged $50 a lot!!")
      .toDF("t").select(TopicPipeline.cleanText("t"))
      .head().getAs[scala.collection.Seq[String]](0)
    assert(out == Seq("my", "card", "was", "charged", "lot"))
  }

  test("full topic pipeline fits on documents and is seed-stable") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val r = TopicPipeline.fit(docs, "text", k = 3, maxIter = 5, vocabSize = 500)
    // topicDistribution sums to ~1 per doc
    val dist = r.transformed.select("topicDistribution").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(math.abs(dist.toArray.sum - 1.0) < 1e-6)
    assert(dist.size == 3)
    // describeTopics maps term ids to real vocabulary words
    val topics = TopicPipeline.topicsWithWords(r, 5).collect()
    assert(topics.length == 3)
    val words = topics.head.getAs[scala.collection.Seq[String]]("termWords")
    assert(words.forall(r.cv.vocabulary.contains))
    // seed reproducibility of the topic-word matrix
    val r2 = TopicPipeline.fit(docs, "text", k = 3, maxIter = 5, vocabSize = 500)
    assert(r.lda.topicsMatrix.toArray.toSeq == r2.lda.topicsMatrix.toArray.toSeq)
  }

  test("raw-count variant (useTfIdf=false) also fits") {
    val docs = Tables.documents(spark, sf0001).limit(100)
    val r = TopicPipeline.fit(docs, "text", k = 2, maxIter = 3,
      vocabSize = 200, useTfIdf = false)
    assert(r.lda.vocabSize > 0)
  }
}
