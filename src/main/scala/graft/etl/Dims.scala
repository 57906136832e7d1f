package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J-3: set-based get-or-create for dimension tables.
  *
  * The reference probes-then-inserts one value at a time with a commit per
  * fact row (/root/reference/main.py:124–135,147) — an N+1 pattern. The
  * scalable re-expression is per BATCH, not per row:
  *
  *   new = incoming.distinct  ANTI-JOIN  existing  →  append
  *
  * i.e. MERGE-INTO-when-not-matched. One shuffle for the distinct, one
  * broadcast/anti join — O(batch) instead of O(rows × round-trips). At
  * 100 TB the `distinct` is a map-side-combined hash aggregate and the
  * anti join broadcasts whichever side is small (dimension domains are).
  */
object Dims {

  /** Values of `keyCol` present in `incoming` but not in `existing`. */
  def newEntries(incoming: DataFrame, existing: DataFrame, keyCol: String): DataFrame =
    incoming
      .select(col(keyCol))
      .distinct()
      .join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")

  /** Deterministic surrogate keys (SURVEY.md §7.4): `row_number` over the
    * key's total order, offset past the existing max id. Never
    * `monotonically_increasing_id` — it changes across runs and breaks the
    * oracle hash-compare. Dimension domains are small by definition, so the
    * single-partition window is fine; for huge domains use
    * `xxhash64(key)` instead (collision-checked), which needs no window.
    */
  def withSequentialIds(newDims: DataFrame, keyCol: String, startAfter: Long): DataFrame =
    newDims.withColumn(
      "id",
      (row_number().over(Window.orderBy(col(keyCol))) + lit(startAfter)).cast("bigint"))

  /** Scale-path surrogate key: stable content hash, no shuffle, no window. */
  def withHashIds(newDims: DataFrame, keyCol: String): DataFrame =
    newDims.withColumn("id", xxhash64(col(keyCol)))

  /** Oracle-checkable scale-path surrogate key: the 60-bit md5-derived
    * content hash ([[graft.text.TextOps.md5Hash60]]). Same scale property
    * as [[withHashIds]] — scan-side, no shuffle, no window — but md5 is
    * bytewise identical in every engine, so the id VALUES themselves are
    * driver-hash-checked against DuckDB (`q_getorcreate_hashkeys`);
    * xxhash64 stays available as the cheapest Spark-private variant.
    */
  def withHashIds60(newDims: DataFrame, keyCol: String): DataFrame =
    newDims.withColumn("id", graft.text.TextOps.md5Hash60(col(keyCol)))

  /** Full get-or-create: existing dim table (id, key) + incoming keys →
    * updated dim table with new keys appended under fresh sequential ids.
    */
  def getOrCreate(existing: DataFrame, incoming: DataFrame, keyCol: String): DataFrame = {
    val maxId = existing.agg(coalesce(max(col("id")), lit(0L))).head().getLong(0)
    val fresh = withSequentialIds(newEntries(incoming, existing, keyCol), keyCol, maxId)
      .select(col("id"), col(keyCol))
    existing.select(col("id"), col(keyCol)).unionByName(fresh)
  }
}
