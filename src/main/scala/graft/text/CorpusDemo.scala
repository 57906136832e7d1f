package graft.text

import org.apache.spark.sql.SparkSession

/** Runnable curation-funnel demo:
  *
  *   sbt "runMain graft.text.CorpusDemo <sfDir> [minQuality] [maxSharedShingles]"
  *
  * Treats doc_id >= 290 as the held-out eval set, curates the rest through
  * [[CorpusPipeline.curate]], and prints the funnel plus the split mix of
  * the resulting chunks.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minQuality = args.lift(1).map(_.toDouble).getOrElse(0.0)
    val maxShared = args.lift(2).map(_.toLong).getOrElse(1000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, sfDir)
    val out = CorpusPipeline.curate(
      docs.where(org.apache.spark.sql.functions.col("doc_id") < 290),
      docs.where(org.apache.spark.sql.functions.col("doc_id") >= 290),
      CorpusPipeline.Config(minQuality = minQuality, maxSharedShingles = maxShared),
      { case (stage, n) => println(f"$stage%-16s $n%6d") })
    out.groupBy("split").count().orderBy("split").show()
    spark.stop()
  }
}
