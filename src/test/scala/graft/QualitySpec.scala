package graft

import graft.etl.Checks
import graft.queries.{EventQueries, RelQueries}
import graft.vec.VectorOps
import org.apache.spark.sql.functions._

/** Round-6 additions: the data-quality audit, ANN recall harness,
  * exact-moment statistics, and cohort retention.
  */
class QualitySpec extends SparkSpec {

  test("dataQuality: referential rules agree with direct anti-join counts") {
    val df = Checks.dataQuality(spark, sf001)
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size === 8)
    assert(rows.values.forall(_ >= 0L))
    val cust = graft.model.Tables.customer(spark, sf001)
    val ord = graft.model.Tables.orders(spark, sf001)
    val expected = cust
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows("customers_without_orders") === expected)
    // synthetic star data is referentially closed on the fact side
    assert(rows("orders_without_customer") === 0L)
    assert(rows("orders_null_custkey") === 0L)
  }

  test("annRecall: one row per method, hits within [0, k]") {
    val rows = VectorOps.annRecall(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("ivf", "lsh", "pq"))
    rows.foreach { r =>
      val k = r.getInt(1)
      val hits = r.getLong(2)
      assert(k === 20)
      assert(hits >= 0L && hits <= k.toLong, s"${r.getString(0)}: hits=$hits")
    }
  }

  test("semanticDedup: annotates every LSH pair exactly once") {
    val pairs = VectorOps.simJoinLsh(spark, sf001).count()
    val annotated = VectorOps.semanticDedup(spark, sf001)
    assert(annotated.count() === pairs)
    assert(annotated.columns.toSeq === Seq("v1", "v2", "sim", "same_text"))
  }

  test("statsAgg: correlations bounded, group counts partition lineitem") {
    val df = RelQueries.statsAgg(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = graft.model.Tables.lineitem(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum === total)
    rows.foreach { r =>
      val corr = r.getDouble(2)
      assert(corr >= -1.0 && corr <= 1.0, s"corr out of range: $corr")
    }
  }

  test("cohortRetention: offset-0 cells cover every distinct user exactly once") {
    val df = EventQueries.cohortRetention(spark, sf001)
    val rows = df.collect()
    assert(rows.forall(_.getLong(1) >= 0L))
    // every user is active in their own first week, in exactly one cohort
    val week0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = graft.model.Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(week0 === users)
  }
}
