package graft.functions

import org.apache.spark.sql.{Column, GraftSqlAccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{array, coalesce}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a token array — the codegen'd loop form of
  *
  *   CASE WHEN size(t) >= n
  *        THEN transform(sequence(0, size(t) - n),
  *                       i -> concat_ws(' ', t[i], ..., t[i + n - 1]))
  *        ELSE array() END
  *
  * which is the shingle/bigram step under every near-dup, decontamination
  * and n-gram-frequency operator. The HOF composition is CORRECT but
  * interpreted: ArrayTransform evaluates its lambda via the interpreted
  * expression path per ELEMENT (no whole-stage codegen inside the lambda),
  * and `sequence` materializes an index array per row just to drive it.
  * On the corpus scan — the part of these operators that is linear in
  * corpus bytes, i.e. THE cost at 100 TB — that interpreted per-element
  * dispatch is the hot path. This expression replaces the whole
  * composition with one fused, JIT-able loop (the round-9 [[SignBits]]
  * treatment, applied to the text side).
  *
  * Bit-identical to the composition for every input:
  *   - n-gram i = `concat_ws(' ', t[i], ..., t[i+n-1])` — built with the
  *     same [[UTF8String.concatWs]] the builtin's codegen calls, including
  *     its null-element rule (null tokens are SKIPPED, not stringified;
  *     `split` never produces them, but the contract is preserved).
  *   - fewer than `n` tokens → empty array (the CASE's ELSE arm).
  *   - null token array → null here; call sites that need the CASE's
  *     null→empty coercion use [[GraftNgrams.ngrams]], which restores it
  *     with a codegen'd `coalesce`.
  * The DuckDB oracle keeps its own n-gram derivation — same strings, so
  * hash checks are unaffected.
  */
case class GraftNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"graft_ngrams window must be >= 1, got $n")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[ArrayData]
    val sz = t.numElements()
    if (sz < n) new GenericArrayData(new Array[Any](0))
    else {
      val out = new Array[Any](sz - n + 1)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= sz - n) {
        var j = 0
        while (j < n) {
          parts(j) = if (t.isNullAt(i + j)) null else t.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(GraftNgrams.Sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      val gen = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val sep = ctx.addReferenceObj("sep", GraftNgrams.Sep, u8)
      val sz = ctx.freshName("sz")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $sz = $t.numElements();
         |if ($sz < $n) {
         |  ${ev.value} = new $gen(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$sz - ${n - 1}];
         |  $u8[] $parts = new $u8[$n];
         |  for (int $i = 0; $i <= $sz - $n; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $t.isNullAt($i + $j) ? null : $t.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $u8.concatWs($sep, $parts);
         |  }
         |  ${ev.value} = new $gen($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftNgrams {
  private[functions] val Sep: UTF8String = UTF8String.fromString(" ")

  /** Column handle with the original CASE's null contract restored: a null
    * token array yields an EMPTY n-gram array (the ELSE arm — `size(null)`
    * is null, so the CASE fell through). Builds the expression directly
    * (no registry needed at helper call sites); `graft_ngrams` is also
    * registered for SQL use alongside the vector functions.
    */
  def ngrams(t: Column, n: Int): Column =
    coalesce(
      GraftSqlAccess.column(GraftNgrams(GraftSqlAccess.expression(t), n)),
      array().cast("array<string>"))
}
