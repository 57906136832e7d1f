package graft

import graft.functions.GraftNgrams
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark: interpreted HOF n-gram composition
  * (`transform(sequence(...), i -> concat_ws(' ', t[i], ...))`) vs the
  * fused codegen'd [[graft.functions.GraftNgrams]] loop, on a synthetic
  * corpus large enough that the SCAN — not fixed job overhead — binds,
  * which is the regime every shingle/bigram operator lives in at real
  * scale (the checked sf0.1 corpus is far below it).
  * Run: sbt "runMain graft.NgramBench [nRows] [tokensPerDoc]".
  */
object NgramBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val toks = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~`toks` pseudo-word tokens per row, distinct enough to defeat
    // dictionary tricks; materialize the TOKEN ARRAY via a cheap split so
    // both candidates start from the same column shape the operators use
    val docs = spark.range(n).select(
      split(concat_ws(" ",
        (0 until toks).map(i => conv((col("id") * 31 + i).cast("string"), 10, 36)): _*), " ")
        .as("t"))

    // the pre-round-20 composition, verbatim
    def hofNgrams(t: Column, k: Int): Column =
      when(size(t) >= k,
        transform(sequence(lit(0), size(t) - k), i =>
          concat_ws(" ", (0 until k).map(j => element_at(t, i + j + 1)): _*)))
        .otherwise(array().cast("array<string>"))

    def time(name: String, c: => Column): Double = {
      // count + max(length) over the exploded n-grams: forces every string
      // to materialize without shuffling them (partial agg only). A FRESH
      // DataFrame per rep — re-collecting one Dataset would reuse its
      // AQE-materialized stages and time nothing.
      def df = docs.select(explode(c).as("g")).agg(count(lit(1)), max(length(col("g"))))
      val r = df.collect()(0) // warm: plan + JIT
      val sec = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$name%-12s $sec%8.3f s   (ngrams ${r.getLong(0)}, maxlen ${r.getInt(1)})")
      sec
    }

    for (k <- Seq(2, 3)) {
      val h = time(s"hof n=$k", hofNgrams(col("t"), k))
      val f = time(s"fused n=$k", GraftNgrams.ngrams(col("t"), k))
      println(f"n=$k: fused is ${h / f}%.2fx the HOF path on $n rows x $toks tokens")
    }
    spark.stop()
  }
}
