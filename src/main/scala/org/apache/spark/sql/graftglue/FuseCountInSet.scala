package org.apache.spark.sql.graftglue

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ArrayFilter, Cast, Expression, In, InSet, LambdaFunction, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule rewriting the natural SQL stopword-count shape
  *
  * {{{ size(filter(toks, t -> array_contains(array('the','a',…), t))) }}}
  *
  * (or the `t IN (…)` / optimizer-converted `InSet` predicate forms) into
  * the native [[CountInSet]] expression.
  *
  * Why a Rule and not just the Column API: graft's own Scala paths already
  * construct [[CountInSet]] directly (see `graft.functions.Text`), but SQL
  * and config-pipeline users write the lambda form — and ONE higher-order
  * function in a projection is CodegenFallback, dropping the WHOLE
  * projection (language ID evaluates this once per language per row) out of
  * whole-stage codegen into interpreted eval. This rule gives the pure-SQL
  * front end the same fused plan the Scala API gets, which is exactly the
  * "declare the logical plan, let the optimizer pick the physical form"
  * contract — the user states set-membership counting; the engine supplies
  * the hash-probe loop.
  *
  * Safety: fires only on the non-legacy `size` (legacy `size(NULL) = -1`
  * differs from [[CountInSet]]'s NULL), only on a one-argument lambda whose
  * predicate is a membership test of the lambda variable itself against
  * foldable string literals, and only on `array<string>` inputs. NULL
  * literals inside the set are dropped: a NULL member can never make the
  * membership predicate TRUE, it can only turn a miss into NULL — and
  * `filter` drops not-true rows either way, so counts are unchanged. The
  * replacement is wrapped in a cast back to `size`'s INT type so the
  * expression tree keeps its schema.
  */
object FuseCountInSet extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case s @ Size(ArrayFilter(arr, LambdaFunction(pred, Seq(v: NamedLambdaVariable), _)), false)
        if isStringArray(arr.dataType) =>
      memberItems(pred, v) match {
        case Some(items) => Cast(CountInSet(arr, items), s.dataType)
        case None => s
      }
  }

  private def isStringArray(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  /** The literal membership set, if `pred` is a set-membership test of
    * exactly the lambda variable `v`; None leaves the expression alone.
    */
  private def memberItems(pred: Expression, v: NamedLambdaVariable): Option[Seq[String]] =
    pred match {
      case ArrayContains(lit, e)
          if e.semanticEquals(v) && lit.foldable && isStringArray(lit.dataType) =>
        lit.eval() match {
          case a: ArrayData =>
            Some(a.toArray[UTF8String](StringType).toSeq.collect {
              case s: UTF8String => s.toString
            })
          case _ => None // a NULL literal array: leave the (degenerate) HOF form
        }
      case In(e, list)
          if e.semanticEquals(v) && list.nonEmpty &&
            list.forall(l => l.foldable && l.dataType == StringType) =>
        Some(list.map(_.eval()).collect { case s: UTF8String => s.toString })
      case InSet(e, hset) if e.semanticEquals(v) && e.dataType == StringType =>
        Some(hset.toSeq.collect { case s: UTF8String => s.toString })
      case _ => None
    }
}
