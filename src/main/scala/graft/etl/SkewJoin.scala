package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §"shuffle/partitioning" scale
  * posture; AQE's skew-join split handles moderate skew automatically —
  * salting is the explicit tool for pathological keys, e.g. one user_id
  * holding 10% of a 100 TB fact table).
  *
  * Mechanics: the large side gets a deterministic salt in [0, n) derived
  * from a row-unique column (NOT rand() — re-runs must produce identical
  * plans/results for the oracle), widening the hot key across n reducers;
  * the small side is replicated n times with every salt value. Join on
  * (key, salt) then drop the salt. Result set identical to the unsalted
  * join; the shuffle is n-way wider on the hot key.
  */
object SkewJoin {

  /** @param saltSource a row-unique column on `large` (a PK) so salt values
    *                    spread uniformly and deterministically.
    */
  def saltedJoin(
      large: DataFrame,
      largeKey: String,
      small: DataFrame,
      smallKey: String,
      saltSource: Column,
      nSalts: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltSource), lit(nSalts)).cast("int"))
    val replicated = small.withColumn("__salt", explode(array((0 until nSalts).map(lit): _*)))
    salted
      .join(replicated, salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Driver-checked: lineitem⋈supplier through the salted path, rolled up
    * by nation. The oracle is the PLAIN join + rollup — so the hash match
    * PROVES salting is semantics-preserving (the whole point of the
    * technique: widen the hot key's shuffle n-way, change nothing else).
    * The per-row salt is derived from (l_orderkey, l_linenumber) — the
    * fact table's PK — so re-runs are bit-identical.
    */
  def skewJoinRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
    saltedJoin(li, "l_suppkey", s, "s_suppkey",
        struct(col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("s_nationkey").as("nation"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy("nation")
  }

  val skewJoinRollupSql: String =
    """SELECT s_nationkey AS nation, CAST(COUNT(*) AS BIGINT) AS n_items,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY nation""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_join" -> (skewJoinRollup _))

  val oracle: Map[String, String] = Map(
    "q_skew_join" -> skewJoinRollupSql)
}
