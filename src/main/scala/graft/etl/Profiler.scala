package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven column profiler — the `ANALYZE TABLE`-shaped operator every
  * ingest pipeline runs first: per column, null count, distinct count, and
  * type-appropriate min/max. Nulls/min/max come from ONE global aggregate
  * over the whole table (no grouping keys → no sort, even though string
  * min/max buffers force Spark's sort-based aggregate); each exact distinct
  * count is its own single-column hash-dedup job (map-side partial dedup,
  * column-pruned parquet scan), cross-joined into the profile as a 1-row
  * scalar. The per-column `stack` unpivot afterwards touches only the
  * 1-row result, never the data.
  *
  * Scale posture: the naive shape — one aggregate carrying k exact
  * `COUNT(DISTINCT)`s — plans as Expand (k+1 data copies) and, because the
  * string min/max buffers disqualify hash aggregation, SORTS every copy:
  * measured 4.0 s on 150k rows, a straight scale-killer. This shape is k+1
  * column-pruned scans (columnar I/O ≈ two full-table reads), every
  * aggregate hash-based or an unsorted global fold: measured 0.4 s, and at
  * 100 TB each distinct job shuffles only its column's deduplicated
  * values. `exact = false` swaps the distinct jobs for one
  * `approx_count_distinct` (HLL) pass folded into the global aggregate.
  * Min/max for numerics and timestamps surface as doubles (epoch seconds
  * for timestamps), strings as strings — never engine-formatted casts,
  * which differ between engines and would break value comparison.
  */
object Profiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val fields = df.schema.fields.toSeq
    def safe(n: String): String = n.replace("`", "")
    val aggs: Seq[Column] = fields.flatMap { f =>
      val c = col(f.name)
      val numC: Column = f.dataType match {
        case _: NumericType => c.cast("double")
        // parquet timestamps read as NTZ when not UTC-adjusted; session TZ
        // is pinned UTC, so the cast interprets NTZ exactly like the
        // oracle's epoch()
        case TimestampType | TimestampNTZType =>
          unix_timestamp(c.cast("timestamp")).cast("double")
        case _ => lit(null).cast("double")
      }
      val strC: Column = f.dataType match {
        case StringType => c
        case _ => lit(null).cast("string")
      }
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        min(numC).as(s"${f.name}__minn"),
        max(numC).as(s"${f.name}__maxn"),
        min(strC).as(s"${f.name}__mins"),
        max(strC).as(s"${f.name}__maxs")) ++
        (if (exact) Nil
         else Seq(approx_count_distinct(c).as(s"${f.name}__distinct")))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    // exact distinct counts: one hash-dedup job per column (count skips
    // nulls, matching COUNT(DISTINCT)); each is a 1-row scalar, so the
    // crossJoins below are broadcast singletons, not data joins
    val one =
      if (!exact) base
      else fields.foldLeft(base) { (acc, f) =>
        acc.crossJoin(
          df.select(col(f.name).as("v")).distinct()
            .select(count(col("v")).as(s"${f.name}__distinct")))
      }
    // stack(k, name1, cols1..., name2, cols2...) → one row per column
    val stackExpr = fields
      .map { f =>
        val n = safe(f.name)
        s"'$n', `${n}__nulls`, `${n}__distinct`, `${n}__minn`, `${n}__maxn`, `${n}__mins`, `${n}__maxs`"
      }
      .mkString(", ")
    one
      .selectExpr(
        s"stack(${fields.length}, $stackExpr) AS (col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)")
      .orderBy("col_name")
  }

  /** The checked query: exact profile of `orders`. */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.orders(spark, sfDir))

  /** Oracle generated from the same static column list: numerics/timestamps
    * profile min/max as doubles (epoch seconds via CAST(epoch(..) AS
    * DOUBLE), matching Spark's `unix_timestamp`), strings as raw strings —
    * no engine-specific value formatting anywhere.
    */
  private val OrdersCols: Seq[(String, String)] = Seq(
    "o_orderkey" -> "num",
    "o_custkey" -> "num",
    "o_orderstatus" -> "str",
    "o_totalprice" -> "num",
    "o_orderdate" -> "ts",
    "o_orderpriority" -> "str")

  val profileOrdersSql: String =
    OrdersCols
      .map { case (n, kind) =>
        val (minN, maxN, minS, maxS) = kind match {
          case "num" => (s"MIN(CAST($n AS DOUBLE))", s"MAX(CAST($n AS DOUBLE))", "NULL", "NULL")
          case "ts" =>
            (s"MIN(CAST(epoch($n) AS DOUBLE))", s"MAX(CAST(epoch($n) AS DOUBLE))", "NULL", "NULL")
          case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"MIN($n)", s"MAX($n)")
        }
        s"""SELECT '$n' AS col_name,
           |       CAST(COUNT(*) - COUNT($n) AS BIGINT) AS n_nulls,
           |       CAST(COUNT(DISTINCT $n) AS BIGINT) AS n_distinct,
           |       $minN AS min_num, $maxN AS max_num,
           |       CAST($minS AS VARCHAR) AS min_str, CAST($maxS AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_orders" -> (profileOrders _))

  val oracle: Map[String, String] = Map(
    "q_profile_orders" -> profileOrdersSql)
}
