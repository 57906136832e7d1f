package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one (or every) named
  * query — the evidence base for PLANS.md.
  *
  *   sbt "runMain graft.PlanDump <sfDir> [queryName]"
  *
  * Note: queries that drive multiple jobs (e.g. the bigram two-pass or the
  * x3 centroid job) only show the plan of the RETURNED DataFrame; the
  * preparatory job's plan is visible by explaining its building block
  * directly.
  *
  * With a third arg `exec`, the query is RUN first and the AQE-final
  * executed plan is printed instead of the static one — the only plan in
  * which runtime exchange/stage reuse (ReusedExchange, ReusedSubquery) is
  * visible, and therefore the evidence that duplicated static subtrees do
  * or do not re-execute.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = args.lift(1)
    val exec = args.lift(2).contains("exec")
    // SPARK_GRAFT_CPUS lets the dump replicate the driver's local[32]
    // shape — exchange-reuse behavior can differ with partition count
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_ == name) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try {
          val df = fn(spark, sfDir)
          if (exec) {
            val t0 = System.nanoTime()
            // collect() executes THIS DataFrame's QueryExecution (count()
            // would build a separate one, leaving df's adaptive plan
            // unexecuted → isFinalPlan=false and no ReusedExchange visible)
            val n = df.collect().length
            println(s"[exec ${(System.nanoTime() - t0) / 1e9} sec, $n rows]")
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        } catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
