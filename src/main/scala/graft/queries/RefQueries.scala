package graft.queries

import graft.etl.{Dims, Normalize}
import graft.model.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity operator queries (SURVEY.md §2.1–2.6).
  *
  * Each query has a matching ANSI-SQL oracle in [[oracle]] (DuckDB 1.0).
  * Determinism contract (SURVEY.md §7.5): every query ends in a total-order
  * sort (PK tiebreakers), no wall-clock values, DOUBLE aggregates computed
  * exactly via DECIMAL then cast back to DOUBLE so Spark's partial-aggregate
  * order can never diverge from DuckDB's single-threaded sum.
  */
object RefQueries {

  /** Flagship — the reference's one analytic query `obter_top_10_indices`
    * (/root/reference/main.py:149–157): project with aliases (P-1), equality
    * + IN-list predicates ANDed (P-2..P-4), two dim equi-joins (J-1/J-2),
    * ORDER BY DESC LIMIT 10 (W-1/W-2) — transliterated onto
    * customer⋈nation⋈region. Dims are broadcast-sized, so Catalyst plans
    * BroadcastHashJoin ×2 + TakeOrderedAndProject: per-partition top-k heaps,
    * no global sort, no full shuffle — the plan that survives 100 TB.
    * Unlike main.py:155 the sort carries a total tiebreaker (`nome`).
    */
  def flagshipTop10(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .where(r("r_name") === "ASIA" && n("n_name").isin("NATION_2", "NATION_17"))
      .select(
        c("c_name").as("nome"),
        n("n_name").as("pais"),
        r("r_name").as("setor"),
        c("c_acctbal").as("maxima"))
      .orderBy(desc("maxima"), asc("nome"))
      .limit(10)
  }

  val flagshipSql: String =
    """SELECT c_name AS nome, n_name AS pais, r_name AS setor, c_acctbal AS maxima
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND n_name IN ('NATION_2', 'NATION_17')
      |ORDER BY maxima DESC, nome
      |LIMIT 10""".stripMargin

  /** S-5/P-5: point lookup — indexed single-row probe re-expressed as a
    * pushed-down parquet filter (shows up as PushedFilters in the scan).
    */
  def pointLookup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .where(col("c_name") === "Customer#000000042")
      .orderBy("c_custkey")

  val pointLookupSql: String =
    "SELECT * FROM customer WHERE c_name = 'Customer#000000042' ORDER BY c_custkey"

  /** S-2: per-source multiplexing (main.py:46–50,163–165) — three tagged
    * scans unioned into ONE lazy plan instead of three sequential passes.
    */
  def unionMultiplex(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    def batch(seg: String, tag: String) =
      c.where(col("c_mktsegment") === seg)
        .select(col("c_custkey"), col("c_acctbal"), lit(tag).as("batch"))
    batch("FURNITURE", "b1")
      .unionByName(batch("MACHINERY", "b2"))
      .unionByName(batch("AUTOMOBILE", "b3"))
      .groupBy("batch")
      .agg(
        count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"))
      .orderBy("batch")
  }

  val unionMultiplexSql: String =
    """SELECT batch, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM (
      |  SELECT c_custkey, c_acctbal, 'b1' AS batch FROM customer WHERE c_mktsegment = 'FURNITURE'
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal, 'b2' AS batch FROM customer WHERE c_mktsegment = 'MACHINERY'
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal, 'b3' AS batch FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |)
      |GROUP BY batch
      |ORDER BY batch""".stripMargin

  /** A-1: distinct on a dimension domain (unique-constraint analogue,
    * main.py:27,32). Map-side-combined hash aggregate at scale.
    */
  def distinctSegments(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select("c_mktsegment").distinct().orderBy("c_mktsegment")

  val distinctSegmentsSql: String =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  /** W-3: top-k per group (README.md:49's promised generalization) — ranking
    * window, one shuffle on the group key; heap-per-group at scale.
    */
  def topkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_mktsegment", "rn")
  }

  val topkPerGroupSql: String =
    """SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
      |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer
      |) WHERE rn <= 5
      |ORDER BY c_mktsegment, rn""".stripMargin

  /** Wide aggregation (TPC-H Q1 shape) — the bench headline. Partial
    * aggregation map-side, tiny shuffle (|flags×status| groups). Sums are
    * DECIMAL-exact then cast to DOUBLE: associativity-proof vs the oracle.
    */
  def lineitemAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        // multiply in DECIMAL, not DOUBLE-then-round: the operands are exact
        // 2dp values, so decimal×decimal is exact and engine-independent
        // (double→decimal rounding of the *product* differs between Spark
        // HALF_UP and DuckDB round-half-even).
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val lineitemAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Fact⋈dim⋈dim rollup: revenue per nation. Broadcast the dims, shuffle
    * only for the final small-key aggregate.
    */
  def ordersByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(o("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  val ordersByNationSql: String =
    """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** J-3: get-or-create, set-based (main.py:124–135 rewritten per §3.3):
    * distinct incoming keys, anti-join existing, deterministic fresh ids.
    */
  def getOrCreateDims(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val existing = Seq((1L, "src0"), (2L, "src1"), (3L, "src2")).toDF("id", "nome")
    val incoming = Tables.documents(spark, sfDir).select(col("source").as("nome"))
    val fresh = Dims.newEntries(incoming, existing, "nome")
    Dims.withSequentialIds(fresh, "nome", 3L).select("id", "nome").orderBy("nome")
  }

  val getOrCreateDimsSql: String =
    """WITH existing(id, nome) AS (VALUES (1, 'src0'), (2, 'src1'), (3, 'src2')),
      |inc AS (SELECT DISTINCT source AS nome FROM documents),
      |fresh AS (SELECT nome FROM inc WHERE nome NOT IN (SELECT nome FROM existing))
      |SELECT CAST(3 + ROW_NUMBER() OVER (ORDER BY nome) AS BIGINT) AS id, nome
      |FROM fresh ORDER BY nome""".stripMargin

  /** J-3 scale path: get-or-create over a HUGE key domain, where the
    * row_number surrogate of [[getOrCreateDims]] (a single-partition
    * window — fine for dimension domains, wrong for e.g. a URL or user-id
    * domain at 100 TB) is replaced by a scan-side content hash
    * ([[Dims.withHashIds60]]): no shuffle, no window, ids stable across
    * batches by construction. The collision guard every hash-keyed dim
    * load ships with is part of the result: `n_keys_for_id` counts keys
    * per id (a map-side-combinable aggregate on the new 8-byte key) and
    * must be 1 everywhere — a collision would surface as a hash-compare
    * mismatch AND a visible 2 in the column. Customer names play the
    * huge domain (one key per entity — the domain GROWS with the data,
    * unlike the 64-value part/nation vocabularies); the anti-join models
    * the keys already loaded.
    */
  def getOrCreateHashKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val existing = cust.where(col("c_custkey") < 100).select(col("c_name"))
    val fresh = Dims.newEntries(cust.select(col("c_name")), existing, "c_name")
    val ids = Dims.withHashIds60(fresh, "c_name").select(col("c_name").as("key"), col("id"))
    val coll = ids.groupBy("id").agg(count(lit(1)).as("n_keys_for_id"))
    ids.join(coll, "id")
      .select(col("key"), col("id"), col("n_keys_for_id"))
      .orderBy("key")
  }

  val getOrCreateHashKeysSql: String =
    """WITH existing AS (SELECT c_name FROM customer WHERE c_custkey < 100),
      |inc AS (SELECT DISTINCT c_name FROM customer),
      |fresh AS (
      |  SELECT c_name FROM inc
      |  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.c_name = inc.c_name)),
      |ids AS (
      |  SELECT c_name AS key, ('0x' || substr(md5(c_name), 1, 15))::BIGINT AS id
      |  FROM fresh),
      |coll AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_keys_for_id FROM ids GROUP BY id)
      |SELECT key, id, n_keys_for_id FROM ids JOIN coll USING (id)
      |ORDER BY key""".stripMargin

  /** J-4/F-5: literal-map classification with default (main.py:52–84,106)
    * — a Catalyst map literal probed per row (constant-folded, no join at
    * all), with the reference's fall-back default semantics.
    */
  def mapClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val sectorOf = Map(
      "NATION_0" -> "Primário",
      "NATION_5" -> "Primário",
      "NATION_1" -> "Secundário",
      "NATION_6" -> "Secundário",
      "NATION_2" -> "Terciário")
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .withColumn("setor", Normalize.classify(n("n_name"), sectorOf, "Diversificado"))
      .groupBy(n("n_name").as("n_name"), col("setor"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("n_name")
  }

  val mapClassifySql: String =
    """SELECT n_name,
      |  CASE n_name
      |    WHEN 'NATION_0' THEN 'Primário' WHEN 'NATION_5' THEN 'Primário'
      |    WHEN 'NATION_1' THEN 'Secundário' WHEN 'NATION_6' THEN 'Secundário'
      |    WHEN 'NATION_2' THEN 'Terciário' ELSE 'Diversificado'
      |  END AS setor,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2
      |ORDER BY n_name""".stripMargin

  /** S-4/S-7: the SQL entry point — tables registered as temp views (the
    * engine's "catalog"), the flagship expressed in pure ANSI SQL through
    * `spark.sql`. Plans identically to the DataFrame version (same Catalyst
    * pipeline), proving the two surfaces are one engine.
    */
  def sqlApi(spark: SparkSession, sfDir: String): DataFrame = {
    Seq("customer", "nation", "region")
      .foreach(t => Tables.read(spark, sfDir, t).createOrReplaceTempView(t))
    spark.sql(flagshipSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_flagship_top10" -> (flagshipTop10 _),
    "q_sql_api" -> (sqlApi _),
    "q_point_lookup" -> (pointLookup _),
    "q_union_multiplex" -> (unionMultiplex _),
    "q_distinct_segments" -> (distinctSegments _),
    "q_topk_per_group" -> (topkPerGroup _),
    "q_lineitem_agg" -> (lineitemAgg _),
    "q_orders_by_nation" -> (ordersByNation _),
    "q_getorcreate_dims" -> (getOrCreateDims _),
    "q_getorcreate_hashkeys" -> (getOrCreateHashKeys _),
    "q_map_classify" -> (mapClassify _))

  val oracle: Map[String, String] = Map(
    "q_flagship_top10" -> flagshipSql,
    "q_sql_api" -> flagshipSql,
    "q_point_lookup" -> pointLookupSql,
    "q_union_multiplex" -> unionMultiplexSql,
    "q_distinct_segments" -> distinctSegmentsSql,
    "q_topk_per_group" -> topkPerGroupSql,
    "q_lineitem_agg" -> lineitemAggSql,
    "q_orders_by_nation" -> ordersByNationSql,
    "q_getorcreate_dims" -> getOrCreateDimsSql,
    "q_getorcreate_hashkeys" -> getOrCreateHashKeysSql,
    "q_map_classify" -> mapClassifySql)
}
