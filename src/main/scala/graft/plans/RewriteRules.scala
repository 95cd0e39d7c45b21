package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.expressions.FloatDotProduct

/** Optimizer rewrites for graft's declarative kernels (the
  * `injectOptimizerRule` leg of `graft.ext.GraftExtensions` — functions
  * and expressions are the other legs).
  *
  * `RewriteHofDotProduct` recognizes the readable higher-order dot
  * product `VectorFunctions.dot` literally writes —
  * {{{ aggregate(zip_with(a, b, (x, y) => x·y), 0.0, (acc, v) => acc+v) }}}
  * — and swaps in the native [[FloatDotProduct]] kernel. HOF lambdas
  * evaluate INTERPRETED (never whole-stage codegen), so the declarative
  * form pays a per-element virtual-call tree; the kernel is one fused
  * loop. With the rule installed, a user writing the obvious thing gets
  * kernel speed — the same contract Catalyst itself applies to
  * comprehension-style SQL.
  *
  * Fires only when BOTH sides are ARRAY<FLOAT> with non-nullable
  * elements: that is the kernel's input contract, and a null element
  * must keep the HOF's null-propagation semantics rather than the
  * kernel's primitive read.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def nonNullFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, false) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** x·y with the DOUBLE upcasts `VectorFunctions.dot` inserts. */
  private def isCastedVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(inner, DoubleType, _, _) => isVar(inner, v)
      case _ => isVar(e, v)
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(xe, ye, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(acce, ve, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
          if nonNullFloatArray(a) && nonNullFloatArray(b) &&
            isCastedVar(xe, x) && isCastedVar(ye, y) &&
            isVar(acce, acc) && isVar(ve, v) && isVar(fin, fv) =>
        FloatDotProduct(a, b)
    }
}
