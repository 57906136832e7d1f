package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate → one JVM-wide
  * session; shuffle.partitions kept at core count per the scale guide).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // unique warehouse per JVM: managed-table locations (bucketed-write
      // tests) must not leak across runs — a stale dir under the repo's
      // spark-warehouse/ makes saveAsTable throw LOCATION_ALREADY_EXISTS
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  def sf001 = "/root/testdata/sf0.001"
}
