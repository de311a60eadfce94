package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native as-of join — the §7(c) whole-operator extension tier: a
  * custom logical node, planner strategy, and physical operator
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * (`GraftSparkExtensions`).
  *
  * Semantics (backward as-of, the reference shape of
  * `EventOps.asofJoin` / q48): for every left row, attach the LATEST
  * right row of the same key with right.ts <= left.ts, or nulls when
  * none exists (left-outer).
  *
  * Physical shape: `requiredChildDistribution` clusters both sides on
  * the key and `requiredChildOrdering` sorts them by (key, ts), so
  * EnsureRequirements/AQE plan exactly the exchanges a sort-merge join
  * would get — then `doExecute` streams both sorted partitions through
  * a single-pass two-pointer merge holding ONE candidate right row.
  * O(|l|+|r|) time, O(1) state — no window LOCF materialization (the
  * union+window form carries every right payload through the sort) and
  * no range-join explosion. At 100 TB both sides shuffle once on the
  * key, identical to the union form's single exchange, but the merge
  * avoids sorting right payloads into the left stream.
  *
  * Keys and timestamps are LongType by contract (ids + epoch-µs) —
  * the wrapper casts; this keeps the hot loop on primitive compares.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    attach: Seq[Attribute],
    toleranceUs: Long = Long.MaxValue) extends BinaryNode {

  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTs.dataType == LongType && rightTs.dataType == LongType,
    "as-of join keys/timestamps must be LongType (cast in the wrapper)")

  override def output: Seq[Attribute] = left.output ++
    attach.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]; injected per-session by
  * `GraftSparkExtensions`.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, attach, tol) =>
      AsofJoinExec(lk, rk, lts, rts, attach, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    attach: Seq[Attribute],
    toleranceUs: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++
    attach.map(_.withNullability(true))

  // cluster both sides on the key: EnsureRequirements inserts the two
  // hash exchanges (and AQE coalesces them consistently, as for SMJ)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // sort each side by (key, ts): the merge consumes both in lockstep
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows pass through in order — downstream sorts on (key, ts)
  // are eliminated
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lOut)
    val lTsB = BindReferences.bindReference(leftTs, lOut)
    val rKeyB = BindReferences.bindReference(rightKey, rOut)
    val rTsB = BindReferences.bindReference(rightTs, rOut)
    val attachExprs: Seq[Expression] = attach
    val outAttrs = output
    // attach fields may be null-filled (left outer): bind the out
    // projection against NULLABLE attach attrs or codegen skips the
    // null check and reads 0/false from the null row
    val inSchema = lOut ++ attach.map(_.withNullability(true))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val attachProj = UnsafeProjection.create(attachExprs, rOut)
      val outProj = UnsafeProjection.create(
        outAttrs.asInstanceOf[Seq[Expression]], inSchema)
      val nullAttach = new GenericInternalRow(attach.length)
      val joined = new JoinedRow

      // one buffered right row + one stored candidate (copied: the
      // underlying UnsafeRow buffers are reused by the sorter)
      var rHead: InternalRow = null
      var rHeadKey = 0L
      var rHeadTs = 0L
      def advanceRight(): Unit = {
        rHead = null
        while (rHead == null && rIter.hasNext) {
          val row = rIter.next()
          val k = rKeyB.eval(row)
          val t = rTsB.eval(row)
          if (k != null && t != null) { // null keys/ts never match
            rHead = row
            rHeadKey = k.asInstanceOf[Long]
            rHeadTs = t.asInstanceOf[Long]
          }
        }
      }
      advanceRight()

      var candKey = 0L
      var candTs = 0L
      var cand: InternalRow = null // copied attach projection
      val tol = toleranceUs

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) {
          joined(lRow, nullAttach)
        } else {
          val lKey = lk.asInstanceOf[Long]
          val lTsV = lt.asInstanceOf[Long]
          // drop right rows for keys already passed; fold in right rows
          // of this key up to the left timestamp (latest wins)
          while (rHead != null && (rHeadKey < lKey ||
              (rHeadKey == lKey && rHeadTs <= lTsV))) {
            if (rHeadKey == lKey) {
              cand = attachProj(rHead).copy()
              candKey = lKey
              candTs = rHeadTs
            }
            advanceRight()
          }
          // staleness fence: the latest candidate only matches while
          // left.ts - right.ts <= tolerance (merge_asof semantics);
          // the subtraction cannot overflow — both are epoch-µs
          if (cand != null && candKey == lKey && lTsV - candTs <= tol)
            joined(lRow, cand)
          else joined(lRow, nullAttach)
        }
      }.map(outProj)
    }
  }
}
