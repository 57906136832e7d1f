package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata (TESTDATA.md / FIXTURES.md §B).
  *
  * All queries read through here so the scan layer stays in one place:
  * `spark.read.parquet` gives us the vectorized reader, column pruning and
  * predicate pushdown for free — at 100 TB the same call pattern works over a
  * partitioned table root (Spark splits files into `maxPartitionBytes` tasks).
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = read(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "lineitem")
  /** The events table is written with TIMESTAMP(NANOS) parquet timestamps,
    * which Spark's vectorized reader rejects outright. Read nanos as raw
    * longs (legacy conf) and rebuild a µs timestamp with integer arithmetic
    * (`DIV`, not `/` — a double division would lose precision above 2^53 ns).
    * The testdata carries no sub-µs precision, so the conversion is lossless.
    * ONE definition shared by batch and streaming reads
    * (EventStreaming.parquetEventStream) so the two plans cannot diverge.
    */
  val NanosTsToMicrosExpr = "timestamp_micros(ts DIV 1000)"

  def readEventsAsNanoLongs(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    readEventsAsNanoLongs(spark)
    read(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(NanosTsToMicrosExpr))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view (events through its
    * nanos-safe reader) — the one-call catalog for `spark.sql` sessions.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    AllTables.foreach { t =>
      val df = if (t == "events") events(spark, sfDir) else read(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
}
