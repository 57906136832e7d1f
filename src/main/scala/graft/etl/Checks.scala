package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality constraint audit — the pre-ingest gate every production
  * pipeline runs before trusting a batch (the Deequ/`CHECK`-constraint
  * shape): each rule produces an exact violation COUNT, so the whole audit
  * is hash-checkable and cheap to alert on. Rules cover the three failure
  * classes that matter at ingest:
  *
  *   - referential integrity (orphaned facts / childless dims) — anti-join
  *     counts. Dim-side probes broadcast; the fact-side anti-join shuffles
  *     on the key it would shuffle on anyway.
  *   - key integrity (nulls, duplicates) — one hash aggregate on the key.
  *   - domain ranges (non-positive quantities, discount outside [0,1]) —
  *     map-side conditional counts folded into ONE scan per table; no
  *     shuffle beyond a 1-row aggregate.
  *
  * Scale posture: every rule is a count — no row-level violation samples
  * cross the wire here (a production variant adds a capped
  * per-rule sample; the counts stay the contract). Scans are column-pruned
  * to the checked columns. At 100 TB each anti-join is a keyed shuffle the
  * downstream star build performs regardless, so the audit rides the same
  * exchange shape it validates.
  */
object Checks {

  /** The audit: one row per rule, `(check_name, n_violations)`, violation
    * counts exact. Domain rules for the same table fold into one scan;
    * referential rules are anti-join counts.
    */
  def dataQuality(spark: SparkSession, sfDir: String): DataFrame =
    dataQualityOf(
      Tables.customer(spark, sfDir),
      Tables.orders(spark, sfDir),
      Tables.lineitem(spark, sfDir))

  /** The rule engine over arbitrary star-shaped inputs — unit-testable
    * with planted violations (the shipped testdata is referentially clean,
    * so the spec proves each rule BITES, not just that it returns zero).
    */
  def dataQualityOf(cust: DataFrame, ord: DataFrame, li: DataFrame): DataFrame = {

    // referential integrity: anti-join counts (keyed shuffle, never a scan
    // of the other side's payload columns)
    // null keys are their OWN rule below — ALL THREE orphan rules count
    // non-null probe keys only, so the Spark anti-join and the oracle's
    // NOT IN (which silently drops rows when the probe is NULL) agree
    // even on dirty data
    val customersWithoutOrders = cust.select("c_custkey").where(col("c_custkey").isNotNull)
      .join(ord.select("o_custkey"), col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("customers_without_orders").as("check_name"), col("n_violations"))
    val ordersWithoutCustomer = ord.select("o_custkey").where(col("o_custkey").isNotNull)
      .join(cust.select("c_custkey"), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_without_customer").as("check_name"), col("n_violations"))
    val lineitemsWithoutOrder = li.select("l_orderkey").where(col("l_orderkey").isNotNull)
      .join(ord.select("o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitems_without_order").as("check_name"), col("n_violations"))

    // key integrity: duplicate orderkeys = extra rows beyond the first per
    // key (one hash aggregate; 0 when the key is truly unique)
    val duplicateOrderKeys = ord.groupBy("o_orderkey")
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - lit(1)), lit(0L)).as("n_violations"))
      .select(lit("duplicate_order_keys").as("check_name"), col("n_violations"))

    // domain ranges: ONE column-pruned scan of lineitem for all three rules
    val liDomain = li.agg(
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("lineitem_nonpositive_quantity"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("lineitem_nonpositive_price"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L))
        .as("lineitem_discount_out_of_range"))
    val liDomainRows = liDomain.selectExpr(
      """stack(3,
        |  'lineitem_nonpositive_quantity', lineitem_nonpositive_quantity,
        |  'lineitem_nonpositive_price', lineitem_nonpositive_price,
        |  'lineitem_discount_out_of_range', lineitem_discount_out_of_range
        |) AS (check_name, n_violations)""".stripMargin)

    // null keys: folded into one orders scan
    val ordNullKey = ord.agg(
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("orders_null_custkey").as("check_name"), col("n_violations"))

    Seq(customersWithoutOrders, ordersWithoutCustomer, lineitemsWithoutOrder,
      duplicateOrderKeys, liDomainRows, ordNullKey)
      .reduce(_ union _)
      .orderBy("check_name")
  }

  val dataQualitySql: String =
    """SELECT * FROM (
      |  SELECT 'customers_without_orders' AS check_name,
      |         (SELECT COUNT(*) FROM customer
      |          WHERE c_custkey IS NOT NULL
      |            AND c_custkey NOT IN
      |              (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL))::BIGINT AS n_violations
      |  UNION ALL
      |  SELECT 'orders_without_customer',
      |         (SELECT COUNT(*) FROM orders
      |          WHERE o_custkey IS NOT NULL
      |            AND o_custkey NOT IN
      |              (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL))::BIGINT
      |  UNION ALL
      |  SELECT 'lineitems_without_order',
      |         (SELECT COUNT(*) FROM lineitem
      |          WHERE l_orderkey IS NOT NULL
      |            AND l_orderkey NOT IN
      |              (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL))::BIGINT
      |  UNION ALL
      |  SELECT 'duplicate_order_keys',
      |         (SELECT COALESCE(SUM(c - 1), 0)
      |          FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
      |          WHERE c > 1)::BIGINT
      |  UNION ALL
      |  SELECT 'lineitem_nonpositive_quantity',
      |         (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)::BIGINT
      |  UNION ALL
      |  SELECT 'lineitem_nonpositive_price',
      |         (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)::BIGINT
      |  UNION ALL
      |  SELECT 'lineitem_discount_out_of_range',
      |         (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)::BIGINT
      |  UNION ALL
      |  SELECT 'orders_null_custkey',
      |         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)::BIGINT
      |) ORDER BY check_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_data_quality" -> (dataQuality _))

  val oracle: Map[String, String] = Map(
    "q_data_quality" -> dataQualitySql)
}
