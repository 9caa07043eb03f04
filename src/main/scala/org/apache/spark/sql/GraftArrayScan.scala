package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, AnyDataType, ArrayType, DataType}

/** `array_scan(xs, zero, (acc, x) -> step)` — the SCAN (prefix-fold)
  * higher-order function Spark lacks: like `aggregate` but returning
  * the WHOLE accumulator trajectory `[zero, s₁, …, sₘ]` (m+1
  * elements) instead of only the final state.
  *
  * Why it exists: every per-series recursive indicator in this
  * library (MACD/Keltner EMAs, Wilder RSI/ATR/ADX, SuperTrend,
  * Heikin-Ashi, CUSUM, Holt, Holt–Winters) needs all intermediate
  * states, and the only built-in spelling is
  * `aggregate(xs, array(seed), (acc, x) -> concat(acc, array(step)))`
  * — O(m²) element copies per series because `concat` rebuilds the
  * accumulator array on every step (the round-10 verdict's finding
  * #3; the LONG-axis scaling audit quantifies it). This expression
  * evaluates the same lambda per element and buffers each state once
  * — O(m) time and copies, bounded by the bar count like the fold it
  * replaces.
  *
  * Semantics notes:
  *  - the lambda is the SAME Catalyst expression tree the `aggregate`
  *    spelling runs (same integer ops in the same order), so swapping
  *    a fold to a scan cannot change a single emitted value — the
  *    DuckDB oracle gates stay shared and untouched;
  *  - each state is deep-copied out of the lambda's result buffer
  *    (`InternalRow.copyValue`) before the next step may reuse it;
  *  - a null input array yields null; a null zero is carried like any
  *    other accumulator value (parity with `aggregate`, which lets
  *    the lambda decide);
  *  - interpreted-only ([[CodegenFallback]]) exactly like Spark's own
  *    `ArrayAggregate` — higher-order lambdas never whole-stage
  *    codegen, so this costs nothing the fold didn't.
  *
  * Modeled on `ArrayAggregate`
  * (sql/catalyst/expressions/higherOrderFunctions.scala) minus the
  * finish lambda, plus the trajectory buffer. Lives in this package
  * because `AbstractDataType` (the [[HigherOrderFunction]] signature
  * type) is `private[sql]` — the same reason [[GraftSqlBridge]]
  * exists.
  */
case class GraftArrayScan(argument: Expression, zero: Expression,
                          merge: Expression)
  extends Expression with HigherOrderFunction with CodegenFallback
    with TernaryLike[Expression] {

  override def arguments: Seq[Expression] = argument :: zero :: Nil

  override def argumentTypes: Seq[AbstractDataType] = ArrayType :: AnyDataType :: Nil

  override def functions: Seq[Expression] = merge :: Nil

  override def functionTypes: Seq[AbstractDataType] = AnyDataType :: Nil

  override def nullable: Boolean = argument.nullable

  override def dataType: DataType =
    ArrayType(zero.dataType, containsNull = zero.nullable || merge.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    checkArgumentDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess =>
        if (!DataType.equalsStructurally(zero.dataType, merge.dataType,
          ignoreNullability = true)) {
          TypeCheckResult.TypeCheckFailure(
            s"argument 3 requires ${zero.dataType.simpleString} type, " +
              s"however, '${merge.sql}' is of ${merge.dataType.catalogString} type.")
        } else TypeCheckResult.TypeCheckSuccess
      case failure => failure
    }

  override def bindInternal(
      f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): GraftArrayScan = {
    // the accumulator leg is always nullable=true like ArrayAggregate:
    // the zero may be null and the lambda must see it as such
    val ArrayType(elementType, containsNull) = argument.dataType
    copy(merge = f(merge, (zero.dataType, true) :: (elementType, containsNull) :: Nil))
  }

  @transient private lazy val LambdaFunction(_,
    Seq(accVar: NamedLambdaVariable, elementVar: NamedLambdaVariable), _) = merge

  override def eval(input: InternalRow): Any = {
    val arr = argument.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return null
    val Seq(mergeForEval) = functionsForEval
    val n = arr.numElements()
    val out = new Array[Any](n + 1)
    val zeroValue = zero.eval(input)
    out(0) = InternalRow.copyValue(zeroValue)
    accVar.value.set(zeroValue)
    var i = 0
    while (i < n) {
      elementVar.value.set(arr.get(i, elementVar.dataType))
      val next = mergeForEval.eval(input)
      out(i + 1) = InternalRow.copyValue(next)
      // set the COPY, not the raw merge result: a merge whose eval
      // reuses its result buffer (ArrayAggregate copies for the same
      // reason) would otherwise clobber the accumulator while the
      // next step reads it
      accVar.value.set(out(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def first: Expression = argument
  override def second: Expression = zero
  override def third: Expression = merge

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GraftArrayScan =
    copy(argument = newFirst, zero = newSecond, merge = newThird)

  override def nodeName: String = "array_scan"
  override def prettyName: String = "array_scan"
}
