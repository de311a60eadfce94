package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Unit tests for the rule's shape-2 soundness guard, built directly on
  * logical plans: the SQL surface cannot seed a nondeterministic
  * projection under a decorrelated LATERAL (the analyzer restricts
  * nondeterministic expressions in subqueries), but the rule is
  * installed session-wide and must stay sound on any plan that merely
  * LOOKS like the decorrelation artifact — e.g. assembled by another
  * rule or a future Spark version. End-to-end fire/refusal tests live
  * in PlanQualitySpec (q392/q318, full-frame-aggregate refusal,
  * kill switch).
  */
class DecorrelatedRankLimitSpec extends SparkSpec {

  private val k = AttributeReference("k", StringType)()
  private val x = AttributeReference("x", DoubleType)()

  /** Filter(rn <= 3, Window([k, x, extra, rn], partition=[k], order=[],
    * Project([k, x, extra], Sort(x DESC global, rel)))) — the
    * decorrelated `LATERAL ... ORDER BY x DESC LIMIT 3` artifact with
    * one extra projected column. */
  private def shape2(extra: Alias): (LogicalPlan, Attribute) = {
    val rel = LocalRelation(k, x)
    val sorted = Sort(Seq(SortOrder(x, Descending)), global = true, rel)
    val proj = Project(Seq(k, x, extra), sorted)
    val rn = Alias(WindowExpression(RowNumber(),
      WindowSpecDefinition(Seq(k), Seq(),
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
      "rn")()
    val win = Window(Seq(k, x, extra.toAttribute, rn), Seq(k), Seq(), proj)
    (Filter(LessThanOrEqual(rn.toAttribute, Literal(3)), win),
      rn.toAttribute)
  }

  private def groupLimits(p: LogicalPlan): Seq[WindowGroupLimit] =
    p.collect { case g: WindowGroupLimit => g }

  test("shape 2 fires on a deterministic projection over the global sort") {
    val (plan, _) = shape2(Alias(Add(x, Literal(1.0)), "m")())
    val rewritten = DecorrelatedRankLimit(plan)
    val limits = groupLimits(rewritten)
    assert(limits.size == 1, s"expected one WindowGroupLimit:\n$rewritten")
    assert(limits.head.limit == 3)
    // the global corpus sort is gone; the numbering order moved into
    // the window's orderSpec
    assert(rewritten.collect { case s: Sort if s.global => s }.isEmpty,
      s"global sort survived:\n$rewritten")
  }

  test("shape 2 REFUSES a nondeterministic projection (dropping the " +
    "sort would reassign its row-order-dependent values)") {
    val (plan, _) = shape2(Alias(MonotonicallyIncreasingID(), "m")())
    val rewritten = DecorrelatedRankLimit(plan)
    assert(groupLimits(rewritten).isEmpty &&
      rewritten.collect { case s: Sort if s.global => s }.nonEmpty,
      s"nondeterministic projection was reordered:\n$rewritten")
  }
}
