package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round-12 VERDICT #5): decompose the streaming-lifecycle fixed
  * cost that ~11 `s_*` parity queries each pay in the bench. A MINIMAL
  * lifecycle — docgen stream → noop-ish memory sink, no parity math —
  * is timed at 1 and at 4 micro-batches, repeated; the 1-batch time is the
  * pure start/checkpoint/stop cost, the slope per extra batch is the
  * micro-batch overhead (offset+commit log writes + per-batch planning).
  * Real lifecycle cost ≈ fixed + batches×slope + the actual work, so
  * bench totals become decomposable without guessing.
  *
  *   sbt "runMain graft.StreamCostProbe [reps]"
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def lifecycle(nBatches: Int, stateParts: Int = cpus.toInt): Double = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", stateParts)
      val nDocs = 2000L // tiny: the WORK should be negligible next to the overhead
      val sink = s"scp_${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = s.readStream.format("graft.sources.DocGenSource")
        .option("numDocs", nDocs.toString)
        .option("numPartitions", "2")
        .option("streamBatchSize", (nDocs / nBatches + 1).toString)
        .load()
        .groupBy("shard").count()
        .writeStream.outputMode("complete").format("memory").queryName(sink).start()
      try q.processAllAvailable() finally q.stop()
      s.sql(s"DROP VIEW IF EXISTS $sink")
      (System.nanoTime() - t0) / 1e9
    }

    // JIT warm-up lifecycle (untimed)
    lifecycle(2)
    for (parts <- Seq(cpus.toInt, 8, 4); b <- Seq(1, 4)) {
      val times = (1 to reps).map(_ => lifecycle(b, parts))
      println(f"[parts=$parts batches=$b] min=${times.min}%.3f s median=${times.sorted.apply(reps / 2)}%.3f s all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
