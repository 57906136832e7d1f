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
  /** The events table's `ts` column has been written three different ways
    * across testdata generations: TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — readable only as raw longs via the legacy conf),
    * microsecond TIMESTAMP_NTZ (isAdjustedToUTC=false), and plain TIMESTAMP.
    * The reader adapts on the actual file schema instead of assuming one
    * encoding, so a testdata regeneration can't break every events query:
    *   - LongType (nanos legacy conf active) → rebuild a µs timestamp with
    *     integer arithmetic (`DIV`, not `/` — double division loses precision
    *     above 2^53 ns; the testdata carries no sub-µs precision).
    *   - TimestampNTZType → cast to session-TZ TimestampType. The session TZ
    *     is pinned UTC everywhere (Bench/Verify/specs), so the instant is
    *     unchanged and matches the LTZ values the oracle hashes.
    *   - TimestampType → pass through.
    * ONE definition shared by batch and streaming reads
    * (EventStreaming.parquetEventStream) so the two plans cannot diverge.
    */
  val NanosTsToMicrosExpr = "timestamp_micros(ts DIV 1000)"

  def readEventsAsNanoLongs(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Contract schema for a not-yet-populated events landing zone (stream
    * startup before the first file arrives — inference has nothing to
    * read, so ONE encoding must be assumed). `ts TIMESTAMP_NTZ` matches
    * what the current generator writes (µs, isAdjustedToUTC=false);
    * [[adaptEventTs]] normalizes it exactly as it would an inferred
    * schema. A landing zone fed in a different historical encoding
    * (TIMESTAMP(NANOS) / plain TIMESTAMP) passes an explicit schema to
    * `parquetEventStream` instead — a parquet INT64 column cannot be read
    * under a mismatched logical type, so no single fallback can cover all
    * three.
    */
  val eventStreamDdl: String =
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  def adaptEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr(NanosTsToMicrosExpr))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other — expected BIGINT (nanos), TIMESTAMP_NTZ or TIMESTAMP")
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = {
    readEventsAsNanoLongs(spark)
    adaptEventTs(read(spark, sfDir, "events"))
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
