package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: count ShuffleExchangeExec nodes in every checked query's
  * static physical plan — the evidence base for ScaleGuardSpec's shuffle
  * budget. Run: sbt "runMain graft.ShuffleCensus <sfDir> [name...]".
  */
object ShuffleCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      // exchanges are inserted by EnsureRequirements in the executedPlan
      // preparations; AQE off so the static executedPlan carries them
      // directly (no AdaptiveSparkPlanExec wrapper to unwrap)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.executedPlan
          val n = plan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
          }.size
          println(s"CENSUS $name $n")
        } catch { case e: Throwable => println(s"CENSUS $name ERR ${e.getMessage}") }
      }
    spark.stop()
  }
}
