package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar normalization operators (SURVEY.md §2.6, F-1..F-5, P-7).
  *
  * Re-expresses the reference's pt-BR numeric cleanup
  * (/root/reference/main.py:101–104): `strip()` → drop thousands dot →
  * decimal comma→dot → `float(...)`, with `+`/`%` stripped for percents.
  * Order matters: dots must be removed BEFORE the comma becomes a dot.
  *
  * Implemented as pure `Column` expressions (no UDFs) so whole-stage codegen
  * applies and the same text can be pasted into the DuckDB oracle SQL.
  * `try_cast` (not `cast`) reproduces main.py:116–117's drop-on-parse-failure
  * semantics under Spark 4's ANSI mode: bad input → NULL, then an explicit
  * `isNotNull` filter makes the row drop a real relational filter (P-7).
  */
object Normalize {

  /** F-1: pt-BR number "1.234,56" → 1234.56; unparseable → NULL.
    * Takes the column NAME so the exact same SQL text also runs in DuckDB.
    */
  def ptBrNumber(colName: String): Column =
    expr(s"try_cast(replace(replace(trim($colName), '.', ''), ',', '.') AS DOUBLE)")

  /** F-2: pt-BR percent "+1,25%" → 1.25, "-0,50%" → -0.5; unparseable → NULL. */
  def ptBrPercent(colName: String): Column =
    expr(
      s"try_cast(replace(replace(replace(replace(trim($colName), '.', ''), ',', '.'), '+', ''), '%', '') AS DOUBLE)")

  /** The same expressions as ANSI SQL fragments for the DuckDB oracle —
    * kept textually adjacent so Spark and oracle can never drift.
    */
  def ptBrNumberSql(col: String): String =
    s"TRY_CAST(replace(replace(trim($col), '.', ''), ',', '.') AS DOUBLE)"

  def ptBrPercentSql(col: String): String =
    s"TRY_CAST(replace(replace(replace(replace(trim($col), '.', ''), ',', '.'), '+', ''), '%', '') AS DOUBLE)"

  /** F-5 / J-4: keyed classification with default (main.py:52–84,106).
    * A literal-map probe compiled to a Catalyst map literal; missing keys
    * fall back to `default` (reference: "Diversificado" / country default).
    * `try_element_at` (not `element_at`) because ANSI `element_at` throws on
    * missing map keys.
    */
  def classify(key: Column, mapping: Map[String, String], default: String): Column =
    coalesce(try_element_at(typedLit(mapping), key), lit(default))
}
