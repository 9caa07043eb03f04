package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Expression, LambdaFunction, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.{GraftArrayScan, GraftSqlBridge}

/** Column-side builders for [[org.apache.spark.sql.GraftArrayScan]]
  * (`array_scan` — the O(m) prefix-fold that replaces the
  * `aggregate(xs, array(seed), (acc, x) -> concat(acc, array(step)))`
  * O(m²) idiom in the recursive-indicator family). Lambdas are
  * constructed the way `org.apache.spark.sql.functions.aggregate`
  * does (fresh [[UnresolvedNamedLambdaVariable]]s resolved by the
  * analyzer's ResolveLambdaVariables), so the function works on ANY
  * SparkSession with no FunctionRegistry installation (Bench/Verify
  * sessions don't carry GraftExtensions).
  */
object ScanExprs {
  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def expr(c: Column): Expression = GraftSqlBridge.expression(c)

  /** `arrayScan(xs, zero)((acc, x) => step)`: the per-element step
    * receives the previous accumulator and the element as Columns and
    * returns the next accumulator; the result Column is the full
    * `[zero, s₁, …, sₘ]` trajectory.
    */
  def arrayScan(xs: Column, zero: Column)
               (step: (Column, Column) => Column): Column = {
    val accVar = UnresolvedNamedLambdaVariable(
      Seq(UnresolvedNamedLambdaVariable.freshVarName("acc")))
    val elemVar = UnresolvedNamedLambdaVariable(
      Seq(UnresolvedNamedLambdaVariable.freshVarName("x")))
    val body = expr(step(col(accVar), col(elemVar)))
    col(GraftArrayScan(expr(xs), expr(zero),
      LambdaFunction(body, Seq(accVar, elemVar))))
  }

  /** SQL-text variant for the recursive-indicator call sites, whose
    * step logic is authored as SQL fragments: the step references the
    * accumulator/element by the CALLER-CHOSEN names (pick names no
    * input column uses — the lambda shadows same-named columns, which
    * is also exactly how a parsed `aggregate(..., (acc, x) -> …)`
    * behaves). The analyzer's ResolveLambdaVariables binds the names,
    * the same path SQL-parsed lambdas take.
    */
  def arrayScanSql(xs: Column, zero: Column, accName: String,
                   xName: String, stepSql: String): Column = {
    val accVar = UnresolvedNamedLambdaVariable(Seq(accName))
    val elemVar = UnresolvedNamedLambdaVariable(Seq(xName))
    // ResolveLambdaVariables only rewrites UnresolvedNamedLambdaVariable
    // nodes — for PARSED lambdas it is the SQL parser that converts
    // body identifiers (AstBuilder.visitLambda's transformUp). This
    // body is parsed standalone, so parse it EAGERLY with the catalyst
    // parser (functions.expr wraps a lazy ColumnNode whose tree isn't
    // visible to a transform here) and mirror that conversion for the
    // two lambda names; everything else stays a plain attribute and
    // resolves against the input columns.
    val names = Set(accName.toLowerCase, xName.toLowerCase)
    val body = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(stepSql).transformUp {
        case a: UnresolvedAttribute if names(a.nameParts.head.toLowerCase) =>
          UnresolvedNamedLambdaVariable(a.nameParts)
      }
    col(GraftArrayScan(expr(xs), expr(zero),
      LambdaFunction(body, Seq(accVar, elemVar))))
  }
}
