package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two ARRAY<DOUBLE> columns.
  *
  * The built-in composition `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * (SURVEY.md X-3) is semantically identical but materializes the zipped
  * product array and evaluates two lambda closures per row. This expression
  * fuses the whole thing into one codegen'd loop over the unsafe array
  * data — no intermediate allocation, stays inside whole-stage codegen.
  * Same left-to-right fold order as the HOF version and DuckDB's
  * `list_dot_product`, so results are bit-identical and oracle checks are
  * unaffected.
  *
  * Null contract: null array → null result (BinaryExpression default);
  * MISMATCHED lengths → null, matching the HOF twin exactly (zip_with pads
  * the shorter side with nulls, which nulls the aggregate) — a truncated
  * partial dot product would silently mask bad-ingest rows instead of
  * dropping them. Elements are assumed non-null (embedding columns).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // return type inferred: AbstractDataType is private[sql], but Seq is
  // covariant so Seq[ArrayType] satisfies the override
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Registration for [[DotProduct]] — both paths Spark supports:
  *
  *   - `GraftFunctions.register(spark)`: imperative, idempotent, used by
  *     the query layer (sessions the driver creates without our conf).
  *   - `GraftExtensions`: declarative, for
  *     `--conf spark.sql.extensions=graft.functions.GraftExtensions` —
  *     the production wiring on a real cluster.
  *
  * After registration the function is visible to SQL (`graft_dot(a, b)`)
  * and to the DataFrame API via `call_function`.
  */
object GraftFunctions {

  val dotInfo: ExpressionInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProduct(a, b)
    case args =>
      throw new IllegalArgumentException(s"graft_dot expects 2 arguments, got ${args.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_dot", dotBuilder, "built-in")

  /** DataFrame-side handle (requires register() on the active session). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("graft_dot"), GraftFunctions.dotInfo, GraftFunctions.dotBuilder))
}
