package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed exact-global-cumsum technique — ONE definition for the
  * three call sites that replaced single-partition global windows with it
  * (`q_histogram` deciles, `t_perplexity_buckets` tertiles,
  * `t_token_budget` running token sum; rounds 6 and 10):
  *
  *   1. ~`nProbes` range cutpoints from the approx-percentile sketch — a
  *      driver-side control plane of a few doubles. Sketch accuracy
  *      affects only partition BALANCE, never any result value.
  *   2. one exact per-range aggregate of the weight (COUNT for ranks,
  *      SUM for weighted cumsums; ≤`nProbes`+1 rows collected) →
  *      prefix-sum offsets on the driver.
  *   3. scan-side range tag, then a window PARTITIONED BY range: exact
  *      global cumsum = offset(range) + within-range running sum. The
  *      tag is `value <= cut` (or `>=` descending), so ORDER ties never
  *      straddle a cutpoint and per-range sums + offsets ARE the global
  *      ones — bit-identical to the single global window the oracles
  *      re-derive, with `nProbes`-way parallelism instead of one task.
  *
  * With `weight = lit(1L)` the cumsum IS the 1-based global rank
  * (`row_number` over the same order), from which [[ntileFromRank]]
  * reproduces ANSI NTILE semantics exactly.
  */
object RangedCumsum {

  /** Adds `outCol` = exact global running sum of `weight` over the total
    * order (`valueCol` asc/desc, `tieCol` asc); also returns the exact
    * total weight mass (already aggregated for the offsets — the NTILE
    * formula needs it, and returning it saves callers a second pass).
    * `keepRangeIf(offset)` lets a caller drop whole ranges whose START
    * already fails its predicate BEFORE their sort runs (e.g. a budget
    * cut: most of a 100 TB corpus never sorts); the default keeps
    * everything.
    */
  def withGlobalCumsum(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      weight: Column,
      outCol: String,
      descending: Boolean = false,
      nProbes: Int = 32,
      keepRangeIf: Long => Boolean = _ => true): (DataFrame, Long) = {
    val v = col(valueCol)
    val probes = (1 until nProbes).map(_.toDouble / nProbes).toArray
    val cutsAsc = df.stat.approxQuantile(valueCol, probes, 0.001).distinct.sorted
    val cuts = if (descending) cutsAsc.reverse else cutsAsc
    val rangeCol = cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((c, i), els) =>
        when(if (descending) v >= c else v <= c, lit(i)).otherwise(els)
    }
    val ranged = df.withColumn("__rng", rangeCol)
    val mass = ranged.groupBy("__rng").agg(sum(weight).cast("bigint").as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = mass.keys.toSeq.sorted.map { r => val o = acc; acc += mass(r); r -> o }
    val live = offsets.filter { case (_, o) => keepRangeIf(o) }
    val offCol = live.foldLeft(lit(0L): Column) {
      case (els, (r, o)) => when(col("__rng") === r, lit(o)).otherwise(els)
    }
    val w = Window.partitionBy("__rng")
      .orderBy(if (descending) v.desc else v.asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged
      .where(col("__rng").isin(live.map(_._1): _*))
      .withColumn(outCol, sum(weight).over(w).cast("bigint") + offCol)
      .drop("__rng")
    (out, acc)
  }

  /** ANSI NTILE bucket from the 1-based global rank: base size q = N/n,
    * first r = N mod n buckets hold q+1 rows. `div` keeps the arithmetic
    * in exact integer space. Degenerate N < n: bucket = rank.
    */
  def ntileFromRank(rankCol: String, total: Long, nBuckets: Int): Column = {
    val q = total / nBuckets
    val r = total % nBuckets
    if (q == 0) col(rankCol)
    else when(col(rankCol) <= lit(r * (q + 1)), expr(s"($rankCol - 1) div ${q + 1} + 1"))
      .otherwise(expr(s"$r + ($rankCol - 1 - ${r * (q + 1)}) div $q + 1"))
  }
}
