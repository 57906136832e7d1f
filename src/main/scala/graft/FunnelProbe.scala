package graft

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: attribute `t_curate` / minhash time at sf0.1 to real CPU vs
  * codegen+JIT overhead, per physical stage.
  *
  *   sbt "runMain graft.FunnelProbe <sfDir>"
  *
  * Prints per-piece: wall, executor CPU vs run time per stage (a stage
  * whose runTime >> cpuTime is starved, not computing), Janino compilation
  * count/time deltas (codegen cache misses), and HotSpot JIT time delta.
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String, runMs: Long, cpuMs: Long, gcMs: Long, tasks: Int)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        stages.add(St(s.stageInfo.name.take(60), m.executorRunTime,
          m.executorCpuTime / 1000000, m.jvmGCTime, s.stageInfo.numTasks)); ()
      }
    })

    def jitMs: Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def janinoCount: Long = cg.METRIC_COMPILATION_TIME.getCount
    def janinoMeanMs: Double = cg.METRIC_COMPILATION_TIME.getSnapshot.getMean

    def probe(label: String)(f: => Long): Unit = {
      stages.clear()
      val (j0, c0) = (jitMs, janinoCount)
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      val ss = stages.asScala.toSeq.sortBy(-_.runMs)
      println(f"[$label] n=$n wall=$wall%.2f s jit=+${jitMs - j0} ms " +
        f"janino=+${janinoCount - c0} classes (mean ${janinoMeanMs}%.0f ms) stages=${ss.size}")
      ss.take(8).foreach(s =>
        println(f"    run=${s.runMs}%7d ms cpu=${s.cpuMs}%7d ms gc=${s.gcMs}%5d ms tasks=${s.tasks}%3d  ${s.name}"))
    }

    import graft.text._
    import org.apache.spark.sql.functions._
    val docs = graft.model.Tables.documents(spark, sfDir)
    docs.count() // warm-up

    val exact = docs.where(col("doc_id") % 10 =!= 9).persist()
    probe("materialize_input")(exact.count())
    probe("minhash_1")(Dedup.minhashPairsOf(exact, 0.5).count())
    probe("minhash_2")(Dedup.minhashPairsOf(exact, 0.5).count())
    // pieces of minhashPairsOf, separately
    probe("perdoc_agg_only") {
      val shm = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), explode(Dedup.shinglesExpr).as("sh"))
        .withColumn("h", xxhash64(col("sh")))
      val minAggs = (0 until Dedup.NumHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"mh$i"))
      shm.groupBy("doc_id")
        .agg(array_sort(collect_set(col("h"))).as("hs"), minAggs: _*)
        .count()
    }
    probe("full_curate_prod")(CorpusPipeline.curateQuery(spark, sfDir).count())
    probe("full_curate_again")(CorpusPipeline.curateQuery(spark, sfDir).count())
    probe("full_curate_third")(CorpusPipeline.curateQuery(spark, sfDir).count())
    spark.stop()
  }
}
