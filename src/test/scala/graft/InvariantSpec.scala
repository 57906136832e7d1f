package graft

import graft.queries.{RelQueries, RefQueries}
import org.apache.spark.sql.functions._

/** Cross-operator invariants on the real testdata: relationships that must
  * hold between independent query results regardless of data content —
  * a second correctness net beside the DuckDB oracle (which checks each
  * query in isolation, never their mutual consistency).
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("rollup: grand total row equals the sum of detail rows") {
    val r = RelQueries.ordersRollup(spark, sf001).collect()
    val details = r.filter(_.getLong(0) == 0L)
    val grand = r.filter(_.getLong(0) == 3L)
    assert(grand.length === 1)
    assert(grand.head.getLong(3) === details.map(_.getLong(3)).sum)
    assert(math.abs(grand.head.getDouble(4) - details.map(_.getDouble(4)).sum) < 1e-6)
  }

  test("cube contains rollup exactly (rollup's grouping sets are a subset)") {
    val cube = RelQueries.ordersCube(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val rollup = RelQueries.ordersRollup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rollup.subsetOf(cube))
    // cube's extra sets are exactly gid=2 (status aggregated away)
    assert((cube -- rollup).forall(_._1 == 2L))
    assert((cube -- rollup).nonEmpty)
  }

  test("pivot: per-status pivoted counts sum to the plain group counts") {
    val piv = RelQueries.ordersPivot(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    val plain = graft.model.Tables.orders(spark, sf001)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(piv === plain)
  }

  test("set ops: |intersect| + |except| == |h1 distinct|; union is a superset of both") {
    val r = RelQueries.setOps(spark, sf001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(r("both_halves").intersect(r("h1_only")).isEmpty)
    assert((r("both_halves") ++ r("h1_only")).subsetOf(r("either")))
    assert(r("both_halves").nonEmpty && r("h1_only").nonEmpty)
  }

  test("semi + anti partition the customer set exactly") {
    val r = RelQueries.semiAntiCustomers(spark, sf001).collect()
    val total = r.map(row => row.getLong(1) + row.getLong(2)).sum
    assert(total === graft.model.Tables.customer(spark, sf001).count())
  }

  test("scd2: consecutive duplicates collapse; validity intervals tile the timeline") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 0L, "A"),
      (1L, "2024-01-01 01:00:00", 1L, "A"), // same state → same version
      (1L, "2024-01-01 02:00:00", 2L, "B"),
      (1L, "2024-01-01 03:00:00", 3L, "A"), // A returns → NEW version, not merged
      (2L, "2024-01-01 00:30:00", 4L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = graft.queries.EventQueries.scd2HistoryOf(events)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.get(3).toString,
        Option(x.get(4)).map(_.toString), x.getLong(5)))
    assert(r.map(t => (t._1, t._2, t._3, t._6)).toSeq === Seq(
      (1L, 1L, "A", 2L), (1L, 2L, "B", 1L), (1L, 3L, "A", 1L), (2L, 1L, "C", 1L)))
    // intervals tile: each version's valid_to equals the next valid_from;
    // only the last version per user is open-ended
    val u1 = r.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.init.zip(u1.tail).forall { case (a, b) => a._5.contains(b._4) })
    assert(u1.last._5.isEmpty && r.filter(_._1 == 2L).head._5.isEmpty)
  }

  test("flagship top-10 is a prefix of the unlimited ordering") {
    val top10 = RefQueries.flagshipTop10(spark, sf001)
      .select("nome").as[String].collect().toSeq
    val full = RefQueries.flagshipTop10(spark, sf001).limit(1000000)
      .select("nome").as[String].collect().toSeq
    assert(top10 === full.take(10))
  }
}
