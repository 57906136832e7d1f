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

  test("dataQuality: every rule bites on planted violations") {
    import spark.implicits._
    val cust = Seq((1L, "a"), (2L, "b"), (9L, "orphan-cust"))
      .toDF("c_custkey", "c_name")
    // custkey 7 is an orphan; order 100 is duplicated; one null custkey
    val ord = Seq(
      (100L, Option(1L)), (100L, Option(1L)), (101L, Option(2L)),
      (102L, Option(7L)), (103L, None))
      .toDF("o_orderkey", "o_custkey")
    // lineitem 999 is an orphan; one bad quantity, one bad price, one bad discount
    val li = Seq(
      (100L, 5.0, 10.0, 0.05), (101L, -2.0, 10.0, 0.05),
      (101L, 5.0, 0.0, 1.5), (999L, 5.0, 10.0, 0.05))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = Checks.dataQualityOf(cust, ord, li)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("customers_without_orders") === 1L) // custkey 9
    assert(got("orders_without_customer") === 1L) // custkey 7 (null has its own rule)
    assert(got("lineitems_without_order") === 1L) // orderkey 999
    assert(got("duplicate_order_keys") === 1L) // one extra row of key 100
    assert(got("orders_null_custkey") === 1L)
    assert(got("lineitem_nonpositive_quantity") === 1L)
    assert(got("lineitem_nonpositive_price") === 1L)
    assert(got("lineitem_discount_out_of_range") === 1L)
  }

  test("dataQuality: NULL dim-side keys neither collapse nor inflate the orphan rules") {
    import spark.implicits._
    // NULL keys on BOTH sides of every referential rule. Without the
    // IS NOT NULL guards (Spark probe filters / oracle inner NOT IN
    // selects) one NULL dim key makes SQL's NOT IN three-valued and
    // collapses the orphan count to 0, while a NULL probe key counts as
    // an orphan in the anti-join but is dropped by NOT IN. Fixed
    // semantics both sides: NULL keys belong to the null-key rules only.
    val cust = Seq(Option(1L) -> "a", Option(2L) -> "b",
      Option(9L) -> "orphan", (None: Option[Long]) -> "null-key")
      .toDF("c_custkey", "c_name")
    val ord = Seq(
      (Option(100L), Option(1L)), (Option(101L), Option(2L)),
      (Option(102L), Option(7L)), (Option(103L), None: Option[Long]),
      (None: Option[Long], Option(1L)))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (Option(100L), 5.0, 10.0, 0.05), (Option(999L), 5.0, 10.0, 0.05),
      (None: Option[Long], 5.0, 10.0, 0.05))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = Checks.dataQualityOf(cust, ord, li)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("customers_without_orders") === 1L) // 9 only; NULL dim key is no orphan
    assert(got("orders_without_customer") === 1L) // 7 only; NULL probe has its own rule
    assert(got("lineitems_without_order") === 1L) // 999 only; NULL probe dropped
    assert(got("orders_null_custkey") === 1L)
  }

  test("statsAgg: moment-sum corr agrees with Spark's corr()") {
    import org.apache.spark.sql.functions.{corr => sparkCorr}
    val exact = RelQueries.statsAgg(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val builtin = graft.model.Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(sparkCorr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (flag, v) =>
      // 1e-5, not 1e-6: the query rounds to 6 dp (5e-7 of budget consumed
      // by rounding alone) and the textbook moment formula loses digits to
      // cancellation as n grows — the test cross-validates the formula,
      // not double ULPs
      assert(math.abs(v - builtin(flag)) < 1e-5, s"$flag: $v vs ${builtin(flag)}")
    }
  }

  test("annRecall: one row per method, hits within [0, k]") {
    val rows = VectorOps.annRecall(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("ivf", "ivfpq", "ivfpq_res", "lsh", "pq"))
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

  test("dataMixture: bottleneck source saturates, no source oversamples") {
    val rows = graft.etl.Sampling.dataMixture(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (tokensIn, docsKept, tokensKept) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(tokensKept <= tokensIn, s"${r.getString(0)} oversampled")
      assert(docsKept >= 0L)
    }
    // the binding source (min T_s*W/w_s) keeps rate exactly 1 — all tokens
    val w = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigW = w.values.sum
    val binding = rows.minBy(r => r.getLong(2) * bigW / w(r.getString(0)))
    assert(binding.getLong(4) === binding.getLong(2),
      s"binding source ${binding.getString(0)} should keep every token")
  }

  test("mixtureTemperature: scarcest source kept whole; kept shares flatter than input shares") {
    val rows = graft.etl.Sampling.mixtureTemperature(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), s"${r.getString(0)} oversampled")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0, r.toString)
    }
    // the anchor (min input tokens) has rate 1.0: every doc kept (b16 max
    // is 65535 < 65536.0)
    val anchor = rows.minBy(_.getLong(1))
    assert(anchor.getDouble(2) === 1.0)
    assert(anchor.getLong(4) === anchor.getLong(1),
      s"anchor ${anchor.getString(0)} should keep every token")
    // the α=0.5 point, in its NOISE-FREE form: the keep rate is strictly
    // monotone-decreasing in source size (1/√T), so bigger sources are
    // always downsampled harder — the aggregate share ratio itself is
    // sampling-noisy at this SF (16-bit buckets over small counts) and
    // is NOT a stable assertion
    val bySize = rows.sortBy(_.getLong(1))
    bySize.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) >= b.getDouble(2),
        s"rate not monotone: ${a.getString(0)}=${a.getDouble(2)} vs ${b.getString(0)}=${b.getDouble(2)}")
    }
    // and the EXPECTED kept mass tracks rate·input within binomial noise
    rows.foreach { r =>
      val expected = r.getDouble(2) * r.getLong(1)
      val sd = 4 * math.sqrt(math.max(1.0, expected)) * 60 // ~60 tokens/doc
      assert(math.abs(r.getLong(4) - expected) < math.max(sd, 0.25 * r.getLong(1)),
        s"${r.getString(0)}: kept=${r.getLong(4)} far from expected=$expected")
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
