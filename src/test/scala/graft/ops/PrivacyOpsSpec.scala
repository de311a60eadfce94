package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  private val emailPat = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  test("redact masks every match, matchCount counts them") {
    val r = Seq("mail a@b.com and c.d@e.org end", "no pii here")
      .toDF("t")
      .select(PrivacyOps.redact(col("t"), emailPat, "[EMAIL]").as("r"),
        PrivacyOps.matchCount(col("t"), emailPat).as("n"))
      .collect()
    assert(r(0).getString(0) == "mail [EMAIL] and [EMAIL] end")
    assert(r(0).getInt(1) == 2)
    assert(r(1).getString(0) == "no pii here")
    assert(r(1).getInt(1) == 0)
  }

  test("redact digit runs collapses each run to one mask") {
    val r = Seq("""{"k": 69, "v": 123}""").toDF("t")
      .select(PrivacyOps.redact(col("t"), "\\d+", "#").as("r"),
        PrivacyOps.matchCount(col("t"), "\\d+").as("n"))
      .head()
    assert(r.getString(0) == """{"k": #, "v": #}""")
    assert(r.getInt(1) == 2)
  }

  test("surrogate is deterministic, keyed, and injective on longs") {
    val df = Seq(1L, 2L, 1L, 42L).toDF("id")
      .select(col("id"), PrivacyOps.surrogate(col("id"), "k1").as("s1"),
        PrivacyOps.surrogate(col("id"), "k2").as("s2"))
    val rows = df.collect()
    // same id → same surrogate; different key → different surrogate
    assert(rows(0).getString(1) == rows(2).getString(1))
    assert(rows(0).getString(1) != rows(0).getString(2))
    assert(df.select(countDistinct(col("id"))).head().getLong(0) ==
      df.select(countDistinct(col("s1"))).head().getLong(0))
  }

  test("letterEntropy: 0 for single-letter text, ln 2 for two balanced") {
    val r = Seq("aaaa", "abab", "a1a2b!B ").toDF("t")
      .select(PrivacyOps.letterEntropy(col("t")).as("h"),
        PrivacyOps.letterCount(col("t")).as("n"))
      .collect()
    assert(r(0).getDouble(0) == 0.0 && r(0).getLong(1) == 4L)
    assert(math.abs(r(1).getDouble(0) - math.log(2)) < 1e-12)
    // case-folded, non-letters ignored: a,a,b,b again
    assert(math.abs(r(2).getDouble(0) - math.log(2)) < 1e-12)
    assert(r(2).getLong(1) == 4L)
  }

  test("letterEntropy is maximal for uniform 26-letter text") {
    val h = Seq(('a' to 'z').mkString).toDF("t")
      .select(PrivacyOps.letterEntropy(col("t")).as("h"))
      .head().getDouble(0)
    assert(math.abs(h - math.log(26)) < 1e-12)
  }

  test("kAnonymityAudit: hand-computed class census") {
    // QI classes: (a,1)x3 all same sensitive -> below l(2);
    // (a,2)x1 -> below k(2) AND below l; (b,1)x4 two values -> passes
    val df = Seq(
      ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s1"),
      ("a", 2, "s1"),
      ("b", 1, "s1"), ("b", 1, "s2"), ("b", 1, "s2"), ("b", 1, "s1"))
      .toDF("qi1", "qi2", "sens")
    val r = PrivacyOps.kAnonymityAudit(df, Seq("qi1", "qi2"), "sens",
      k = 2, l = 2).collect()(0)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("min_class_size") == 1L)
    assert(r.getAs[Long]("classes_below_k") == 1L)
    assert(r.getAs[Long]("rows_below_k") == 1L)
    assert(r.getAs[Long]("classes_below_l") == 2L)
    intercept[IllegalArgumentException] {
      PrivacyOps.kAnonymityAudit(df, Seq("qi1"), "sens", k = 0, l = 1)
    }
  }
}
