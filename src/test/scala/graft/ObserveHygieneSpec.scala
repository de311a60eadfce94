package graft

import org.apache.spark.sql.functions._

/** Regression guard for the q300 ObservationManager hazard: calling
  * `Dataset.observe` materializes the session's lazy ObservationManager
  * field, after which Java-serializing the session (which ML task
  * closures do transitively via trainingSummary) throws
  * NotSerializableException. q300 therefore observes on a throwaway
  * child session; this spec pins both halves of that contract.
  */
class ObserveHygieneSpec extends SparkSpec {

  private def serializes(o: AnyRef): Boolean =
    try {
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(o)
      true
    } catch { case _: java.io.NotSerializableException => false }

  test("q300 leaves the shared session serialization-clean") {
    assert(serializes(spark), "session dirty before q300 — ordering?")
    SparkEntry.queries("q300_observe_metrics")(spark, sf0001).collect()
    assert(serializes(spark),
      "q300 materialized ObservationManager on the caller's session")
  }

  test("observe on THIS session does poison it (the hazard is real)") {
    val s2 = spark.newSession()
    assert(serializes(s2))
    val obs = new org.apache.spark.sql.Observation(
      "hygiene_" + java.util.UUID.randomUUID())
    s2.range(10).observe(obs, count(lit(1)).as("n"))
      .write.format("noop").mode("overwrite").save()
    assert(obs.get("n") == 10L)
    assert(!serializes(s2),
      "Spark fixed the ObservationManager serialization hazard — " +
        "q300's child-session detour can be removed")
  }
}
