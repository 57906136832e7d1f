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

  test("flagship top-10 is a prefix of the unlimited ordering") {
    val top10 = RefQueries.flagshipTop10(spark, sf001)
      .select("nome").as[String].collect().toSeq
    val full = RefQueries.flagshipTop10(spark, sf001).limit(1000000)
      .select("nome").as[String].collect().toSeq
    assert(top10 === full.take(10))
  }
}
