package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the plain parquet scan (SURVEY.md S-1/S-3):
  * partitioned layouts, bucketed tables, and text formats with explicit
  * schemas. These are the write-side patterns that decide read-side cost at
  * 100 TB:
  *
  *   - `partitionBy(col)` → directory-level partition pruning: a filter on
  *     the partition column skips whole directories before any IO.
  *   - `bucketBy(n, key)` → co-located joins/aggregations: two tables
  *     bucketed on the same key by the same n join with ZERO shuffle.
  *   - CSV/JSON always with an explicit schema — inference reads the data
  *     twice and guesses types (the reference's main.py:167 mistake).
  */
object Sinks {

  /** Hive-style partitioned parquet: one directory per distinct value of
    * each partition column. Keep partition columns low-cardinality
    * (thousands of dirs, not millions — small-files death otherwise).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted managed table. Requires saveAsTable (bucket metadata
    * lives in the catalog). Joining two tables bucketed on the same key
    * with the same bucket count plans SortMergeJoin with no Exchange.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** CSV read with an explicit schema — no inference pass, no type guessing. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
