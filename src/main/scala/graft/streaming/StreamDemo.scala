package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Runnable micro-batch demo: stream an events-parquet landing directory
  * through the watermarked hourly-window aggregation and print the totals.
  *
  *   sbt "runMain graft.streaming.StreamDemo /path/to/landing-dir"
  *
  * Uses Trigger.AvailableNow (process everything present, then stop) — the
  * batch-backfill mode; drop the trigger for continuous micro-batches.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/probe_stream")
    val dedup = args.contains("--dedup")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val events = EventStreaming.parquetEventStream(spark, dir).drop("props")
    if (args.contains("--join")) {
      // stream-stream interval join: clicks and purchases as two streams
      val clicks = EventStreaming.parquetEventStream(spark, dir)
        .where(col("event_type") === "click")
      val purchases = EventStreaming.parquetEventStream(spark, dir)
        .where(col("event_type") === "purchase")
      val q = EventStreaming.clickToPurchaseJoin(clicks, purchases)
        .writeStream.outputMode("append").format("memory").queryName("ssj")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val t = spark.table("ssj")
      println("stream joined pairs=" + t.count() +
        " distinct purchases=" + t.select("purchase_id").distinct().count())
    } else {
      val src = if (dedup) EventStreaming.dedupedEvents(events) else events
      val q = EventStreaming.windowedCounts(src)
        .writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("wc")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val t = spark.table("wc")
      // coalesce: sum over an empty sink table is NULL, not 0
      println("stream windows=" + t.count() +
        " events=" + t.agg(coalesce(sum(col("n_events")), lit(0L))).head.getLong(0))
    }
    spark.stop()
  }
}
