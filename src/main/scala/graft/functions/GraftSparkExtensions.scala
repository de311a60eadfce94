package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension entry point: register native functions into any
  * session via `.config("spark.sql.extensions",
  * "graft.functions.GraftSparkExtensions")` (or
  * `.withExtensions(new GraftSparkExtensions)`); they are then callable
  * from SQL and `call_function` on every executor without UDF
  * registration per session.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftSparkExtensions.cosineSim)
  }
}

object GraftSparkExtensions {
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    })

  /** Register directly on an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = cosineSim
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
