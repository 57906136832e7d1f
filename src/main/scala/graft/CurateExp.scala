package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev experiment: isolate WHY `t_curate` degrades from ~19 s to 60–160 s
  * depending on prior JVM activity (round-5 diagnosis). One mode per JVM:
  *
  *   sbt "runMain graft.CurateExp <persist|lcp|plain> <sfDir> <nRuns>"
  *
  * - persist: the shipped implementation (exact stage persist())
  * - lcp:     exact stage localCheckpoint() — truncates lineage, no
  *            CacheManager entry, no repeated AQE replan of the prefix
  * - plain:   no materialization at all (recompute cascade)
  */
object CurateExp {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("persist")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val nRuns = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcMs: Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime

    import graft.text._
    val docs = graft.model.Tables.documents(spark, sfDir)
    docs.count() // warm-up

    def curateWith(materialize: DataFrame => DataFrame): DataFrame = {
      val cfg = CorpusPipeline.PinnedConfig
      val train = CorpusPipeline.trainWithMirrors(docs)
      val evalD = CorpusPipeline.evalSlice(docs)
      val quality = train.where(TextOps.qualityColumn(col("text")) >= cfg.minQuality)
      val contaminated = Dedup.decontaminateOf(quality, evalD)
        .where(col("n_shared_shingles") > cfg.maxSharedShingles)
        .select(col("doc_id"))
      val clean = quality.join(contaminated, Seq("doc_id"), "left_anti")
      val exact = materialize {
        val cols = clean.columns
        clean
          .groupBy(md5(col("text").cast("binary")).as("__graft_fp"))
          .agg(min_by(struct(cols.map(col): _*), col("doc_id")).as("__graft_canon"))
          .select(cols.map(c => col(s"__graft_canon.$c").as(c)): _*)
      }
      val dupIds = Dedup.minhashPairsOf(exact, cfg.nearDupJaccard)
        .select(col("d2").as("doc_id")).distinct()
      val nearDeduped = exact.join(dupIds, Seq("doc_id"), "left_anti")
      TextOps.chunksOf(nearDeduped)
        .select(
          col("doc_id"), col("chunk_idx"),
          concat_ws(" ", col("chunk")).as("text"),
          size(col("chunk")).cast("bigint").as("n_tokens"))
        .withColumn("split", graft.etl.Sampling.splitColumn(col("doc_id")))
        .orderBy("doc_id", "chunk_idx")
    }

    val mat: DataFrame => DataFrame = mode match {
      case "persist" | "persist_clear" => _.persist()
      case "lcp"                       => _.localCheckpoint()
      case "plain"                     => identity
    }
    for (i <- 1 to nRuns) {
      val (g0, j0) = (gcMs, jitMs)
      val t0 = System.nanoTime()
      val n = curateWith(mat).count()
      val rt = Runtime.getRuntime
      val cachedRdds = spark.sparkContext.getPersistentRDDs.size
      println(f"[$mode run $i] rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"gc=+${gcMs - g0} ms jit=+${jitMs - j0} ms cachedRdds=$cachedRdds " +
        f"heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%d MB")
      if (mode == "persist_clear") spark.catalog.clearCache()
    }
    spark.stop()
  }
}
