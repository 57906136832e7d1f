package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** CHECK constraints for the shard sink — Delta Lake's
  * `ALTER TABLE … ADD CONSTRAINT <name> CHECK (<pred>)` semantics,
  * spelled through table properties (Spark core has no ADD CONSTRAINT
  * statement; Delta ships one via a parser extension):
  *
  * {{{
  * ALTER TABLE t SET   TBLPROPERTIES ('graft.constraint.<name>' = '<pred>')
  * ALTER TABLE t UNSET TBLPROPERTIES ('graft.constraint.<name>')
  * }}}
  *
  * The predicate language is the conservative, engine-portable class the
  * sink can evaluate identically on the write path (per `InternalRow`,
  * executor-side) and in SQL (the ADD-time full-table validation runs as
  * an ordinary distributed Spark job over the connector scan):
  * comparisons of a table column against a literal (`=  <>  !=  <  <=
  * >  >=`), `col IS NULL` / `col IS NOT NULL` (the spelling of Delta's
  * NOT NULL column constraint), combined with `NOT` / `AND` / `OR` and
  * parentheses. Numeric columns compare numerically, string columns
  * compare lexicographically (binary, both engines' default collation
  * for ASCII bodies).
  *
  * NULL semantics are Delta's / ANSI's: a constraint is violated only
  * when its predicate evaluates to FALSE — a NULL outcome passes, so
  * nullable evolved columns admit null cells unless the constraint says
  * otherwise. Evaluation is three-valued end to end ([[eval]] returns
  * `Option[Boolean]`, `None` = UNKNOWN) with Kleene AND/OR.
  *
  * Parsing doubles as admission: [[compile]] rejects unknown columns,
  * type-incompatible literals and anything outside the grammar at DDL
  * time, so the write-path compile (from the carried-forward manifest
  * string) can never fail mid-job.
  */
object SinkConstraint {

  sealed trait Expr
  final case class Cmp(col: String, op: String, lit: Any) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  /** `col IS NULL` (isNull = true) / `col IS NOT NULL` — the spelling of
    * Delta's NOT NULL column constraint in this grammar; always definite
    * (never UNKNOWN), which is what makes `score IS NOT NULL` actually
    * reject null cells where `score > 0` admits them.
    */
  final case class NullTest(col: String, isNull: Boolean) extends Expr

  /** Column names a predicate references (rename/drop guards). */
  def references(pred: String): Set[String] = {
    def refs(e: Expr): Set[String] = e match {
      case Cmp(c, _, _) => Set(c)
      case NullTest(c, _) => Set(c)
      case And(l, r) => refs(l) ++ refs(r)
      case Or(l, r) => refs(l) ++ refs(r)
      case Not(e) => refs(e)
    }
    refs(parse(pred))
  }

  /** Compile `pred` against the table schema to a row checker. The
    * accessor `get(i)` yields table column `i`'s value (null | Long |
    * Int | Double | String); the result is `Some(false)` exactly when
    * the row VIOLATES the constraint.
    */
  def compile(pred: String, table: StructType): (Int => Any) => Option[Boolean] = {
    val ast = parse(pred)
    def bind(e: Expr): (Int => Any) => Option[Boolean] = e match {
      case Cmp(col, op, lit) =>
        require(table.fieldNames.contains(col),
          s"CHECK constraint references unknown column '$col' " +
            s"(table: ${table.fieldNames.mkString(", ")})")
        val i = table.fieldIndex(col)
        val isStr = table.fields(i).dataType == StringType
        (isStr, lit) match {
          case (true, s: String) =>
            // string comparison in SPARK's order (UTF-8 bytes), not
            // Java's (UTF-16 units): the ADD-time validation of existing
            // rows runs through Spark SQL, and the two enforcement
            // points must evaluate identically on supplementary-plane
            // data — same discipline as the envelope comparisons
            get => Option(get(i)).map { v =>
              val c = SinkColStats.utf8Cmp(v.asInstanceOf[String], s)
              applyOp(op, c)
            }
          case (false, _: String) => throw new IllegalArgumentException(
            s"CHECK constraint compares numeric column '$col' to a string literal")
          case (true, _) => throw new IllegalArgumentException(
            s"CHECK constraint compares string column '$col' to a numeric literal")
          case (false, n) =>
            // integral column vs integral literal compares with EXACT Long
            // ordering: coercing both sides to Double loses precision above
            // 2^53 and would let the executor write path disagree with the
            // ADD-time Spark-SQL validation (which is exact) — the two
            // enforcement points must evaluate identically
            get => Option(get(i)).map { v =>
              val c = (v, n) match {
                case (l: Long, m: Long) => java.lang.Long.compare(l, m)
                case (ii: Int, m: Long) => java.lang.Long.compare(ii.toLong, m)
                case (l: Long, d: Double) => java.lang.Double.compare(l.toDouble, d)
                case (ii: Int, d: Double) => java.lang.Double.compare(ii.toDouble, d)
                case (dd: Double, m: Long) => java.lang.Double.compare(dd, m.toDouble)
                case (dd: Double, d: Double) => java.lang.Double.compare(dd, d)
                case (other, _) => throw new IllegalStateException(
                  s"unexpected value $other for numeric column '$col'")
              }
              applyOp(op, c)
            }
        }
      case And(l, r) =>
        val (bl, br) = (bind(l), bind(r))
        get => (bl(get), br(get)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        val (bl, br) = (bind(l), bind(r))
        get => (bl(get), br(get)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(e) =>
        val be = bind(e)
        get => be(get).map(!_) // Kleene: NOT UNKNOWN = UNKNOWN
      case NullTest(col, isNull) =>
        require(table.fieldNames.contains(col),
          s"CHECK constraint references unknown column '$col' " +
            s"(table: ${table.fieldNames.mkString(", ")})")
        val i = table.fieldIndex(col)
        get => Some((get(i) == null) == isNull)
    }
    bind(ast)
  }

  /** No-constraints fast path: a single shared no-op. */
  val NoCheck: (InternalRow, Array[Int]) => Unit = (_, _) => ()

  /** Executor-side write-path enforcement. Built lazily INSIDE each
    * [[org.apache.spark.sql.connector.write.DataWriter]] from the
    * `(name, pred)` strings the driver pinned at write-build time (plain
    * strings serialize into the factory; compiled closures never cross
    * the wire). `colIdx(i)` maps table column `i` to its physical ordinal
    * in the incoming row — the same mapping `serializeRow` uses, so the
    * checked values are exactly the persisted ones. Violation = predicate
    * IS FALSE (Delta/ANSI: NULL passes); the thrown error names the
    * constraint and fails the task, which aborts the job before any
    * manifest flip — a constrained table can never commit a violating row.
    */
  def enforcer(cks: Seq[(String, String)], table: StructType)
      : (InternalRow, Array[Int]) => Unit =
    if (cks.isEmpty) NoCheck
    else {
      val compiled = cks.map { case (n, p) => (n, p, compile(p, table)) }
      val types: Array[DataType] = table.fields.map(_.dataType)
      (row, colIdx) => {
        val get: Int => Any = i => {
          val ord = colIdx(i)
          // ord < 0 = column absent from the incoming frame (mergeSchema
          // write null-fills it) — evaluates as NULL, same as the cell
          if (ord < 0 || ord >= row.numFields || row.isNullAt(ord)) null
          else types(i) match {
            case LongType => row.getLong(ord)
            case IntegerType => row.getInt(ord)
            case DoubleType => row.getDouble(ord)
            case StringType => row.getUTF8String(ord).toString
            case dt => throw new IllegalStateException(
              s"CHECK constraint over unsupported column type $dt")
          }
        }
        compiled.foreach { case (n, p, f) =>
          if (f(get).contains(false))
            throw new IllegalArgumentException(
              s"CHECK constraint $n violated: a written row fails ($p)")
        }
      }
    }

  private def applyOp(op: String, cmp: Int): Boolean = op match {
    case "=" => cmp == 0
    case "<>" | "!=" => cmp != 0
    case "<" => cmp < 0
    case "<=" => cmp <= 0
    case ">" => cmp > 0
    case ">=" => cmp >= 0
  }

  // --- recursive-descent parser ------------------------------------------

  private sealed trait Tok
  private final case class TIdent(s: String) extends Tok
  private final case class TNum(v: Any) extends Tok // Long | Double
  private final case class TStr(s: String) extends Tok
  private final case class TOp(s: String) extends Tok
  private case object TLParen extends Tok
  private case object TRParen extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"CHECK constraint parse error at $i in '$s': $msg")
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == '\'') {
        val end = s.indexOf('\'', i + 1)
        if (end < 0) fail("unterminated string literal")
        out += TStr(s.substring(i + 1, end)); i = end + 1
      } else if (c.isLetter || c == '_') {
        val j = Iterator.from(i).find(k =>
          k >= s.length || !(s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')).get
        out += TIdent(s.substring(i, j)); i = j
      } else if (c.isDigit || (c == '-' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        val j = Iterator.from(i + 1).find(k =>
          k >= s.length || !(s.charAt(k).isDigit || s.charAt(k) == '.')).get
        val t = s.substring(i, j)
        out += TNum(if (t.contains('.')) t.toDouble else t.toLong); i = j
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (two == "<>" || two == "!=" || two == "<=" || two == ">=") {
          out += TOp(two); i += 2
        } else if (c == '=' || c == '<' || c == '>') {
          out += TOp(c.toString); i += 1
        } else fail(s"unexpected character '$c'")
      }
    }
    out.result()
  }

  def parse(pred: String): Expr = {
    var toks = tokenize(pred)
    def fail(msg: String) =
      throw new IllegalArgumentException(s"CHECK constraint parse error in '$pred': $msg")
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => fail("unexpected end of predicate")
    }
    def kw(t: Tok, k: String): Boolean = t match {
      case TIdent(s) => s.equalsIgnoreCase(k)
      case _ => false
    }
    def expr(): Expr = {
      var l = term()
      while (peek.exists(kw(_, "OR"))) { next(); l = Or(l, term()) }
      l
    }
    def term(): Expr = {
      var l = factor()
      while (peek.exists(kw(_, "AND"))) { next(); l = And(l, factor()) }
      l
    }
    def factor(): Expr = next() match {
      case TLParen =>
        val e = expr()
        next() match {
          case TRParen => e
          case other => fail(s"expected ')', got $other")
        }
      case t if kw(t, "NOT") => Not(factor())
      case TIdent(col) if !col.equalsIgnoreCase("AND") && !col.equalsIgnoreCase("OR") =>
        next() match {
          case TOp(op) => next() match {
            case TNum(v) => Cmp(col, op, v)
            case TStr(v) => Cmp(col, op, v)
            case other => fail(s"expected literal after '$col $op', got $other")
          }
          case t if kw(t, "IS") => next() match {
            case t2 if kw(t2, "NULL") => NullTest(col, isNull = true)
            case t2 if kw(t2, "NOT") => next() match {
              case t3 if kw(t3, "NULL") => NullTest(col, isNull = false)
              case other => fail(s"expected NULL after '$col IS NOT', got $other")
            }
            case other => fail(s"expected NULL or NOT NULL after '$col IS', got $other")
          }
          case other => fail(s"expected comparison operator or IS after '$col', got $other")
        }
      case other => fail(s"expected column, NOT or '(', got $other")
    }
    val e = expr()
    if (toks.nonEmpty) fail(s"trailing tokens: ${toks.mkString(" ")}")
    e
  }
}
