package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall-clock of the curation funnel (the round-4
  * `t_curate` audit — PLANS.md §14).
  *
  *   sbt "runMain graft.ProfileFunnel <sfDir>"
  *
  * Runs curate in audit mode (every stage persisted + counted, so the
  * deltas between funnel callbacks are true per-stage costs), then times
  * the individual heavy candidates standalone against the SAME persisted
  * dedup output, to show where the composed run's time actually goes.
  */
object ProfileFunnel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.text._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warm-up: footers + codegen
    graft.model.Tables.documents(spark, sfDir).count()

    var last = System.nanoTime()
    time("curate_audit_total") {
      CorpusPipeline.curate(
        CorpusPipeline.trainWithMirrors(graft.model.Tables.documents(spark, sfDir)),
        CorpusPipeline.evalSlice(graft.model.Tables.documents(spark, sfDir)),
        CorpusPipeline.PinnedConfig,
        { case (stage, n) =>
          val now = System.nanoTime()
          println(f"  stage $stage%-15s n=$n%-6d +${(now - last) / 1e9}%.2f s")
          last = now
        }).count()
    }
    time("curate_prod_total")(
      CorpusPipeline.curateQuery(spark, sfDir).count())
    time("curate_prod_again")(
      CorpusPipeline.curateQuery(spark, sfDir).count())
    spark.stop()
  }
}
