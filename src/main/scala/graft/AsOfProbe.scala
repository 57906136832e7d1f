package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: native merge as-of vs the composed per-column-window twin on
  * the MULTI-PAYLOAD shape (`q_asof_payload` / `asofPayloadComposed`) —
  * the case the native operator exists for. Single-payload numbers live in
  * BASELINE.md's r10 probe (composed edges native there).
  * Run: sbt "runMain graft.AsOfProbe [sfDir] [reps]".
  */
object AsOfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.model.Tables.events(spark, sfDir).count() // warm footer/JIT

    import org.apache.spark.sql.functions.{col, sum, xxhash64}
    // consume EVERY output column (hash-sum) — a bare count() lets Catalyst
    // prune the window/join payload entirely and times a different plan
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
        .head.getDecimal(0).longValue()
    def time(name: String)(f: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-22s min=${times.map(_._1).min}%.3f s  " +
        s"reps=${times.map(t => f"${t._1}%.3f").mkString(",")}  hash=${times.head._2}")
    }
    time("payload_native")(
      force(graft.queries.JoinQueries.asofPayloadNative(spark, sfDir)))
    time("payload_composed")(
      force(graft.queries.JoinQueries.asofPayloadComposed(spark, sfDir)))

    // Synthetic scale probe: the sf0.1 events table (~20k purchases) is
    // constant-factor territory. The asymptotic separation is sort volume:
    // the composed union sorts (|L|+|R|) rows at the FULL combined width
    // (each union row carries both sides' columns, half of them null),
    // while the native merge sorts each side at its own width. nRows per
    // side + a 6-column right payload makes that visible.
    import org.apache.spark.sql.functions._
    val n = sys.env.getOrElse("SPARK_GRAFT_ASOF_N", "4000000").toLong
    val nKeys = 100000L
    val left = spark.range(n).select(
      (col("id") % nKeys).as("k"),
      (col("id") * 7919L % 1000000L).as("t"),
      col("id").as("l_id"))
    val right = spark.range(n).select(
      (col("id") % nKeys).as("rk"),
      (col("id") * 104729L % 1000000L).as("rt"),
      col("id").as("p1"), (col("id") * 2).as("p2"), (col("id") * 3).as("p3"),
      (col("id") % 97).cast("double").as("p4"),
      concat(lit("tag"), col("id") % 1000).as("p5"),
      (col("id") % 2 === 0).as("p6"))
    time(s"synth_native(n=$n)")(
      force(graft.plans.AsOfJoinPlan
        .asOf(left, left("k"), left("t"), right, right("rk"), right("rt"))))
    val payload = Seq("rt", "p1", "p2", "p3", "p4", "p5", "p6")
    val lNull = left.select(
      col("k"), col("t"), col("l_id"),
      lit(null).cast("long").as("rt"),
      lit(null).cast("long").as("p1"), lit(null).cast("long").as("p2"),
      lit(null).cast("long").as("p3"), lit(null).cast("double").as("p4"),
      lit(null).cast("string").as("p5"), lit(null).cast("boolean").as("p6"),
      lit(1).as("is_l"))
    val rNull = right.select(
      col("rk").as("k"), col("rt").as("t"), lit(null).cast("long").as("l_id"),
      col("rt"), col("p1"), col("p2"), col("p3"), col("p4"), col("p5"), col("p6"),
      lit(0).as("is_l"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(col("t"), col("is_l"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    time(s"synth_composed(n=$n)")(
      force(lNull.unionByName(rNull)
        .select((col("l_id") +: col("is_l") +:
          payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c + "_m"))): _*)
        .where(col("is_l") === 1)))
    spark.stop()
  }
}
