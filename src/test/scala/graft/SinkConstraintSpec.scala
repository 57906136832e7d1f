package graft

import graft.sources.SinkConstraint
import graft.sources.SinkConstraint.{And, Cmp, Or}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pure (no Spark) coverage of the CHECK-constraint predicate language:
  * grammar, precedence, three-valued evaluation, DDL-time admission.
  */
class SinkConstraintSpec extends AnyFunSuite {

  private val table = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("shard", IntegerType),
    StructField("body", StringType),
    StructField("score", DoubleType)))

  private def eval(pred: String, vals: Any*): Option[Boolean] =
    SinkConstraint.compile(pred, table)(i => vals(i))

  test("parse: AND binds tighter than OR; parentheses override") {
    assert(SinkConstraint.parse("doc_id = 1 OR shard = 2 AND shard = 3") ===
      Or(Cmp("doc_id", "=", 1L), And(Cmp("shard", "=", 2L), Cmp("shard", "=", 3L))))
    assert(SinkConstraint.parse("(doc_id = 1 OR shard = 2) AND shard = 3") ===
      And(Or(Cmp("doc_id", "=", 1L), Cmp("shard", "=", 2L)), Cmp("shard", "=", 3L)))
  }

  test("parse: all comparison operators, negative and decimal literals, strings") {
    assert(SinkConstraint.parse("doc_id >= -5") === Cmp("doc_id", ">=", -5L))
    assert(SinkConstraint.parse("score < 0.25") === Cmp("score", "<", 0.25))
    assert(SinkConstraint.parse("body <> 'x y'") === Cmp("body", "<>", "x y"))
    assert(SinkConstraint.parse("body != ''") === Cmp("body", "!=", ""))
  }

  test("parse errors are loud and name the problem") {
    def bad(p: String, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](SinkConstraint.parse(p))
      assert(e.getMessage.contains(frag), s"$p → ${e.getMessage}")
    }
    bad("body = 'oops", "unterminated")
    bad("doc_id = 1 extra", "trailing")
    bad("doc_id % 2", "unexpected character")
    bad("doc_id = ", "unexpected end")
    bad("(doc_id = 1", "unexpected end")
    bad("(doc_id = 1 doc_id = 2)", "expected ')'")
    bad("AND = 1", "expected column")
  }

  test("references: every named column, through nesting") {
    assert(SinkConstraint.references("(doc_id > 0 AND shard < 16) OR score >= 0.5") ===
      Set("doc_id", "shard", "score"))
  }

  test("compile admission: unknown column / cross-type comparison refused") {
    val e1 = intercept[Exception](SinkConstraint.compile("missing > 0", table))
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[Exception](SinkConstraint.compile("body > 3", table))
    assert(e2.getMessage.contains("string column"))
    val e3 = intercept[Exception](SinkConstraint.compile("doc_id = 'x'", table))
    assert(e3.getMessage.contains("numeric column"))
  }

  test("eval: numeric comparisons coerce int/long/double to one axis") {
    assert(eval("doc_id > 10", 11L, 0, "", 0.0) === Some(true))
    assert(eval("shard <= 3", 0L, 3, "", 0.0) === Some(true))
    assert(eval("score = 0.5", 0L, 0, "", 0.5) === Some(true))
    assert(eval("doc_id < 2.5", 2L, 0, "", 0.0) === Some(true))
    assert(eval("doc_id < 2.5", 3L, 0, "", 0.0) === Some(false))
  }

  test("eval: string comparisons are binary-lexicographic") {
    assert(eval("body >= 'b'", 0L, 0, "ba", 0.0) === Some(true))
    assert(eval("body < 'b'", 0L, 0, "a", 0.0) === Some(true))
    assert(eval("body <> ''", 0L, 0, "", 0.0) === Some(false))
    // supplementary-plane values compare in SPARK's UTF-8 order (round
    // 16): U+1F600 sorts ABOVE fullwidth A (U+FF21) — Java's UTF-16
    // unit order inverts this pair, and the write-path enforcement must
    // agree with the ADD-time Spark-SQL validation
    assert(eval("body > 'Ａ'", 0L, 0, "😀", 0.0) === Some(true))
    assert(eval("body < 'Ａ'", 0L, 0, "😀", 0.0) === Some(false))
  }

  test("parse: NOT and IS [NOT] NULL") {
    assert(SinkConstraint.parse("NOT doc_id = 1") ===
      SinkConstraint.Not(Cmp("doc_id", "=", 1L)))
    assert(SinkConstraint.parse("score IS NULL") ===
      SinkConstraint.NullTest("score", isNull = true))
    assert(SinkConstraint.parse("score IS NOT NULL OR shard = 0") ===
      Or(SinkConstraint.NullTest("score", isNull = false), Cmp("shard", "=", 0L)))
    val e = intercept[IllegalArgumentException](SinkConstraint.parse("score IS 5"))
    assert(e.getMessage.contains("expected NULL"), e.getMessage)
    assert(SinkConstraint.references("NOT (score IS NULL)") === Set("score"))
  }

  test("eval: IS NOT NULL is the NOT NULL constraint — definite, rejects null cells") {
    // plain `score > 0` ADMITS null (UNKNOWN passes a CHECK)...
    assert(eval("score > 0", 0L, 0, "", null) === None)
    // ...IS NOT NULL is definite FALSE on null — the only way to reject it
    assert(eval("score IS NOT NULL", 0L, 0, "", null) === Some(false))
    assert(eval("score IS NOT NULL", 0L, 0, "", 1.5) === Some(true))
    assert(eval("score IS NULL", 0L, 0, "", null) === Some(true))
    // NOT is Kleene: NOT UNKNOWN stays UNKNOWN (still passes the CHECK)
    assert(eval("NOT score > 0", 0L, 0, "", null) === None)
    assert(eval("NOT shard = 3", 0L, 3, "", 0.0) === Some(false))
    assert(eval("NOT (shard = 3 AND doc_id = 1)", 9L, 3, "", 0.0) === Some(true))
  }

  test("eval: integral-vs-integral compares with EXACT Long ordering above 2^53") {
    // 2^53 and 2^53+1 collapse to the same Double; the write path must
    // agree with the ADD-time Spark-SQL validation, which is exact
    val p53 = 9007199254740992L // 2^53
    assert(eval(s"doc_id >= ${p53 + 1}", p53, 0, "", 0.0) === Some(false))
    assert(eval(s"doc_id = ${p53 + 1}", p53, 0, "", 0.0) === Some(false))
    assert(eval(s"doc_id = ${p53 + 1}", p53 + 1, 0, "", 0.0) === Some(true))
    assert(eval(s"doc_id < ${p53 + 1}", p53, 0, "", 0.0) === Some(true))
    // mixed double/long still compares on the double axis (Spark's rule)
    assert(eval("score >= 2.5", 0L, 0, "", 2.5) === Some(true))
    assert(eval(s"score > $p53", 0L, 0, "", p53.toDouble) === Some(false))
  }

  test("eval: three-valued Kleene logic — NULL passes a CHECK unless forced FALSE") {
    // NULL comparison → UNKNOWN
    assert(eval("score > 0", 0L, 0, "", null) === None)
    // UNKNOWN AND FALSE = FALSE; UNKNOWN OR TRUE = TRUE; else UNKNOWN
    assert(eval("score > 0 AND shard < 0", 0L, 5, "", null) === Some(false))
    assert(eval("score > 0 OR shard >= 0", 0L, 5, "", null) === Some(true))
    assert(eval("score > 0 AND shard >= 0", 0L, 5, "", null) === None)
    assert(eval("score > 0 OR shard < 0", 0L, 5, "", null) === None)
  }
}
