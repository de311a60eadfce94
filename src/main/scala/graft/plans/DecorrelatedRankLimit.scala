package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, DenseRank, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, PredicateHelper, Rank, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.CurrentRow
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

import scala.annotation.tailrec

/** Catalyst optimizer rule (injected via `GraftSparkExtensions`):
  * reinstate the window group-limit under rank filters that Spark's
  * own `InferWindowGroupLimit` refuses because subquery DECORRELATION
  * polluted the Window's expression list.
  *
  * When a LATERAL-correlated subquery contains a ranked window (the
  * SQL-UDTF "top-n per outer row" idiom, q392), `DecorrelateInnerQuery`
  * rewrites the inner plan by appending the correlation key to BOTH
  * the Window's partitionSpec (correct: rank per outer key) and its
  * windowExpressions (as a passthrough `AttributeReference`, so the
  * key stays visible to the domain join above). The built-in
  * `InferWindowGroupLimit` requires `windowExpressions.forall(rankLike)`
  * and therefore bails on that shape — leaving a per-group
  * `row_number` that SORTS the full corpus partition in one task per
  * group before the `rk <= n` filter discards all but n rows. At
  * 100 TB that is a corpus-proportional single-task sort no cluster
  * size can absorb (PERF_NOTES R10.13 measured it).
  *
  * Shape 1 is the built-in rule with exactly one relaxation: a
  * window expression may also be a passthrough `Attribute` that the
  * child already outputs. Such an attribute is per-row and unchanged
  * by the Window operator, so pre-pruning rows below the Window with
  * `WindowGroupLimit(partitionSpec, orderSpec, rankFn, limit)` is
  * semantics-preserving for it — every surviving row keeps its value,
  * and discarded rows are exactly those the rank filter above removes.
  * All non-passthrough expressions must still be rank-like over the
  * node's single (partitionSpec, orderSpec); any other window function
  * (e.g. a partition sum) would observe the dropped rows, so the rule
  * refuses.
  *
  * Shape 2 covers the sibling construct `LATERAL … ORDER BY k LIMIT n`
  * (q318): decorrelation emits an ORDERLESS `row_number` over the
  * correlation key whose numbering rides the row order of a global
  * Sort below — so on top of the single-task group sort, the whole
  * corpus takes a range-shuffle first. The rewrite folds the sort
  * keys into the window's orderSpec (explicitly reproducing the
  * numbering the sort implied), drops the now-dead global sort, and
  * inserts the same WindowGroupLimit.
  *
  * Physical planning then splits the node into the standard
  * Partial (map-side, before the exchange) and Final group-limit
  * pair: each input task forwards at most `limit` rows per group, the
  * shuffle carries O(groups × limit × tasks), and the surviving
  * Window sorts a bounded frame. q392 plan-asserts the rewrite fires
  * (PlanQualitySpec) and its oracle hash is unchanged.
  */
object DecorrelatedRankLimit extends Rule[LogicalPlan] with PredicateHelper {

  /** Rank-like window expression with the standard expanding frame —
    * identical to the built-in rule's test. */
  private def rankLike(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: Rank | _: DenseRank | _: RowNumber,
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        _) => true
    case _ => false
  }

  /** The decorrelation artifact: a bare attribute the child already
    * outputs, passed through the Window unchanged. */
  private def passthrough(e: NamedExpression, child: LogicalPlan): Boolean =
    e match {
      case a: Attribute => child.outputSet.contains(a)
      case _ => false
    }

  /** Tightest rank bound the filter imposes on `attr`, mirroring the
    * built-in rule's extraction (conjuncts only; `<` and reversed `>`
    * shift by one). */
  private def extractLimit(cond: Expression, attr: Attribute): Option[Int] = {
    val limits = splitConjunctivePredicates(cond).collect {
      case EqualTo(e: Attribute, IntegerLiteral(n)) if e.semanticEquals(attr) => n
      case EqualTo(IntegerLiteral(n), e: Attribute) if e.semanticEquals(attr) => n
      case LessThan(e: Attribute, IntegerLiteral(n)) if e.semanticEquals(attr) => n - 1
      case GreaterThan(IntegerLiteral(n), e: Attribute) if e.semanticEquals(attr) => n - 1
      case LessThanOrEqual(e: Attribute, IntegerLiteral(n)) if e.semanticEquals(attr) => n
      case GreaterThanOrEqual(IntegerLiteral(n), e: Attribute) if e.semanticEquals(attr) => n
    }
    if (limits.isEmpty) None else Some(limits.min)
  }

  /** The rule runs inside a fixed-point batch, and later passes can see
    * an inferred filter (e.g. a join-constraint `isnotnull`) spliced
    * between the Window and an already-inserted group limit — so the
    * "already handled" check must look through Filter/Project chains,
    * not just the immediate child, or the limit is inserted twice. */
  @tailrec
  private def alreadyLimited(p: LogicalPlan): Boolean = p match {
    case _: WindowGroupLimit => true
    case f: Filter => alreadyLimited(f.child)
    case pr: Project => alreadyLimited(pr.child)
    case _ => false
  }

  /** Shape 2 (`LATERAL … ORDER BY k LIMIT n`): decorrelation emits a
    * `row_number` with NO orderSpec whose numbering rides the row order
    * of a GLOBAL sort below — detect that sort through an optional
    * projection. */
  private def peelToGlobalSort(p: LogicalPlan): Option[(Option[Project], Sort)] =
    p match {
      case s @ Sort(_, true, _, _) => Some((None, s))
      case pr @ Project(_, s @ Sort(_, true, _, _)) => Some((Some(pr), s))
      case _ => None
    }

  /** Shape 2 eliminates the global Sort, so everything whose VALUE
    * depends on row order must be deterministic: a nondeterministic
    * projection (monotonically_increasing_id, rand, …) or sort key
    * would assign different values once the sort is gone. The rule is
    * installed session-wide — this guard keeps it sound on plans that
    * merely look like the decorrelation artifact. */
  private def deterministicSortChain(p: LogicalPlan): Boolean =
    peelToGlobalSort(p) match {
      case Some((pr, s)) =>
        pr.forall(_.projectList.forall(_.deterministic)) &&
          s.order.forall(_.deterministic)
      case None => false
    }

  /** An orderless `row_number` alias — meaningful only when the input
    * arrives pre-ordered (the decorrelated-LIMIT construct). */
  private def orderlessRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, Seq(),
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // honor the same kill switch as the built-in rule
    if (conf.windowGroupLimitThreshold == -1) return plan
    plan.transform {
      // ---- shape 1: rank filter over a Window whose expression list
      // decorrelation polluted with passthrough attributes ------------
      case f @ Filter(condition,
          w @ Window(windowExpressions, partitionSpec, orderSpec, child, _))
          if orderSpec.nonEmpty && !alreadyLimited(child) &&
            windowExpressions.exists(rankLike) &&
            windowExpressions.exists(e => passthrough(e, child)) &&
            windowExpressions.forall(e =>
              rankLike(e) || passthrough(e, child)) =>
        val limits = windowExpressions.collect {
          case a @ Alias(WindowExpression(rankFn, _), _) =>
            extractLimit(condition, a.toAttribute).map(l => (l, rankFn))
        }.flatten
        if (limits.isEmpty) f
        else {
          // prefer RowNumber (cheapest group-limit mode), then the
          // tightest bound — same tie-break as the built-in rule
          val (rowNum, others) = limits.partition(_._2.isInstanceOf[RowNumber])
          val (limit, rankFn) = (if (rowNum.nonEmpty) rowNum else others).minBy(_._1)
          if (limit > 0 && limit <= conf.windowGroupLimitThreshold) {
            f.copy(child = w.copy(child =
              WindowGroupLimit(partitionSpec, orderSpec, rankFn, limit, child)))
          } else f
        }

      // ---- shape 2: correlated `ORDER BY k LIMIT n` — an orderless
      // row_number numbering the row order of a global Sort below.
      // Two scale defects at once: the global range sort shuffles the
      // whole corpus, and the orderless window denies any group-limit
      // pushdown, leaving each group's full slice in one task. Folding
      // the sort keys into the window's orderSpec reproduces the
      // numbering explicitly (per-group row numbers follow exactly the
      // order the sort fed them in; at sort-key ties both forms are
      // equally nondeterministic), after which the sort itself is dead
      // — SQL guarantees ordering only at the outermost ORDER BY — and
      // a WindowGroupLimit bounds every task at `limit` rows/group. --
      case f @ Filter(condition,
          Window(windowExpressions, partitionSpec, Seq(), wchild, hint))
          if partitionSpec.nonEmpty && !alreadyLimited(wchild) &&
            windowExpressions.count(orderlessRowNumber) == 1 &&
            windowExpressions.forall(e =>
              orderlessRowNumber(e) || passthrough(e, wchild)) &&
            deterministicSortChain(wchild) =>
        val (reProject, sort) = peelToGlobalSort(wchild).get
        val order = sort.order
        val rnAlias = windowExpressions.collectFirst {
          case a @ Alias(WindowExpression(_: RowNumber, _), _) => a
        }.get
        extractLimit(condition, rnAlias.toAttribute) match {
          case Some(limit) if order.nonEmpty && limit > 0 &&
              limit <= conf.windowGroupLimitThreshold =>
            // drop the global sort; keep (and widen) the projection so
            // the sort keys stay visible to the re-ordered window
            val orderRefs = order.flatMap(_.references).distinct
            val newChild = reProject match {
              case Some(pr) =>
                val missing = orderRefs.filterNot(pr.outputSet.contains)
                Project(pr.projectList ++ missing, sort.child)
              case None => sort.child
            }
            val limited = WindowGroupLimit(
              partitionSpec, order, rnAlias.child
                .asInstanceOf[WindowExpression].windowFunction,
              limit, newChild)
            val newExprs = windowExpressions.map {
              case a @ Alias(we @ WindowExpression(_: RowNumber,
                  spec: WindowSpecDefinition), name) =>
                Alias(we.copy(windowSpec = spec.copy(orderSpec = order)),
                  name)(a.exprId, a.qualifier, a.explicitMetadata,
                  a.nonInheritableMetadataKeys)
              case other => other
            }
            val newFilter = f.copy(child =
              Window(newExprs, partitionSpec, order, limited, hint))
            // the subtree's output may have gained the widened sort-key
            // columns — pin the original output for positional parents
            Project(f.output, newFilter)
          case _ => f
        }
    }
  }
}
