package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: fuse the portable higher-order-function dot product
  *
  *   `aggregate(zip_with(a, b, (x, y) => x * y), 0d, (acc, v) => acc + v)`
  *
  * into the native codegen'd [[graft.functions.DotProduct]] expression.
  * Users (and the reference-parity queries) write the declarative HOF form
  * — Catalyst swaps in the fused single-loop implementation (no zipped
  * intermediate array, no lambda closures; 1.5–1.9x measured by
  * graft.MicroBench), the exact "declare the plan, let the optimizer pick
  * the physical strategy" posture the engine is built on.
  *
  * Semantics-preserving by construction:
  *   - identical left-to-right fold order → bit-identical results;
  *   - mismatched lengths: zip_with pads with null → product null → sum
  *     null, and DotProduct returns null — same;
  *   - null input arrays → null on both paths;
  *   - null ELEMENTS null the whole sum on both paths (DotProduct emits
  *     the per-element null check only when the static schema has
  *     `containsNull = true`, so clean columns pay nothing).
  *
  * Wired declaratively via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or imperatively via
  * `spark.experimental.extraOptimizations`.
  */
object DotProductFusion extends Rule[LogicalPlan] {

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _) =>
      v.exprId == v2.exprId
    case _ => false
  }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(
            a,
            b,
            LambdaFunction(
              Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
              Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable),
              _)),
          Literal(zero, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable, el: NamedLambdaVariable, _),
            Seq(lacc: NamedLambdaVariable, lel: NamedLambdaVariable),
            _),
          finish)
        // +0.0 only (raw-bits check): -0.0 == 0.0 under IEEE, but an empty
        // array folds to the seed itself — HOF would return -0.0 where
        // DotProduct returns +0.0, breaking the bit-identity contract
        if zero != null &&
          java.lang.Double.doubleToRawLongBits(zero.asInstanceOf[Double]) == 0L &&
          x.exprId == lx.exprId && y.exprId == ly.exprId &&
          acc.exprId == lacc.exprId && el.exprId == lel.exprId &&
          isIdentityFinish(finish) &&
          doubleArray(a) && doubleArray(b) =>
      DotProduct(a, b)
  }
}
