package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable multimodal-plumbing example:
  *
  *   sbt "runMain graft.multimodal.MediaDemo <sfDir> <outDir>"
  *
  * Builds the synthetic media table, writes it partitioned by kind, then
  * runs the batched decode → resize → frame-sample stubs and prints the
  * shape of each stage.
  */
object MediaDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/media_demo"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val items = Media.mediaTable(spark, sfDir)
    Media.writePartitionedByKind(items, outDir)
    val videoScan = spark.read.parquet(outDir).where(col("kind") === "video")
    // structural pruning check (not a plan-string substring, which breaks
    // silently on plan-format changes): find the scan node, ask it directly
    val pruned = videoScan.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.partitionFilters.nonEmpty
    }.exists(identity)
    println("partitioned: kinds=" +
      spark.read.parquet(outDir).select("kind").distinct().count() +
      " videoOnly=" + videoScan.count() +
      " pruned=" + pruned)
    val feats = Media.extractFeatures(items)
    val resized = Media.resizeStub(feats, maxDim = 16)
    val maxDim = resized.agg(coalesce(max(greatest(col("width"), col("height"))), lit(0)))
      .head.getInt(0)
    println("features=" + feats.count() + " resizedMaxDim=" + maxDim)
    val frames = Media.frameSampleStub(items, everyNth = 2)
    println("videoFrames=" + frames.count())
    spark.stop()
  }
}
