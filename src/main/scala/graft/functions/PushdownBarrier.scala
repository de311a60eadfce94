package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Always-false predicate term whose ONLY job is to be nondeterministic.
  *
  * OR-ing this into a filter condition (`Tables.fence`) stops Catalyst
  * from pushing the filter below a repartition (PushPredicateThroughNonJoin
  * explicitly skips nondeterministic conditions) — the supported,
  * version-robust way to pin an EXPENSIVE predicate (JSON parse,
  * tokenization) above the exchange that gives it parallelism.
  *
  * Unlike the previous `rand() < -1.0` spelling, this cannot be broken
  * by a future optimizer learning to fold deterministic-looking
  * rand-comparisons: nondeterminism is declared structurally (the
  * `Nondeterministic` trait ⇒ `deterministic = false`, `foldable =
  * false`), not implied by a function call an optimizer might see
  * through. Codegen emits a bare `false` literal — zero runtime cost.
  */
case class PushdownBarrier() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "pushdown_barrier"
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any = false
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    ev.copy(code = code"", value = FalseLiteral, isNull = FalseLiteral)
}
