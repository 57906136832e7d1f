package graft.queries

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-way join / temporal-join operators beyond the reference's two
  * broadcast dim joins: a TPC-H-Q5-shaped fact⋈fact rollup (the shape that
  * dominates at 100 TB), per-brand top-k over `part`, a supplier⋈nation
  * rollup, and an as-of join (last click before each purchase) — the
  * operator Spark lacks natively, composed from union + running-max window
  * so it needs ONE shuffle on the key, never a range cross-join.
  */
object JoinQueries {

  /** Q5-shaped revenue rollup: lineitem⋈orders (shuffle join on orderkey,
    * AQE-planned) ⋈ customer (shuffle) ⋈ nation⋈region (broadcast). The
    * date predicate pushes into the orders parquet scan; only join keys and
    * the revenue operands are read. At 1000 executors the two big joins
    * hash-partition on their keys and the dims never shuffle.
    */
  def revenueByRegion(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .where(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name").as("r_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"))
      .orderBy("r_name")
  }

  val revenueByRegionSql: String =
    """SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** W-3 over `part`: top-3 parts per brand by retail price. */
  def topkPartsPerBrand(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(desc("p_retailprice"), asc("p_partkey"))
    Tables.part(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy("p_brand", "rn")
  }

  val topkPartsPerBrandSql: String =
    """SELECT p_brand, rn, p_partkey, p_name, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_name, p_retailprice,
      |         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
      |  FROM part
      |) WHERE rn <= 3
      |ORDER BY p_brand, rn""".stripMargin

  /** supplier⋈nation rollup — completes table coverage; broadcast dim. */
  def supplierByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables.supplier(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("n_name")
  }

  val supplierByNationSql: String =
    """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** As-of join: for each purchase, the most recent click at-or-before it by
    * the same user. Spark has no ASOF JOIN; the scalable composition is
    * union-the-streams + running-max window — one shuffle on user_id,
    * linear scan per partition (vs the naive range-join blowup). Ties at
    * identical ts resolve inclusively (click ≤ purchase), matching the
    * oracle's correlated max subquery exactly.
    */
  def asofClickBeforePurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // clicks sort before purchases at the same ts so <= semantics hold
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), when(col("event_type") === "click", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("prev_click_ts"))
      .orderBy("event_id")
  }

  val asofClickBeforePurchaseSql: String =
    """SELECT a.event_id, a.user_id, a.ts,
      |       (SELECT max(b.ts) FROM events b
      |        WHERE b.user_id = a.user_id AND b.event_type = 'click' AND b.ts <= a.ts) AS prev_click_ts
      |FROM events a
      |WHERE a.event_type = 'purchase'
      |ORDER BY a.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_revenue_by_region" -> (revenueByRegion _),
    "q_topk_parts_brand" -> (topkPartsPerBrand _),
    "q_supplier_by_nation" -> (supplierByNation _),
    "q_asof_join" -> (asofClickBeforePurchase _))

  val oracle: Map[String, String] = Map(
    "q_revenue_by_region" -> revenueByRegionSql,
    "q_topk_parts_brand" -> topkPartsPerBrandSql,
    "q_supplier_by_nation" -> supplierByNationSql,
    "q_asof_join" -> asofClickBeforePurchaseSql)
}
