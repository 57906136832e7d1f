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

  /** Bucketed + sorted table at an EXPLICIT location (external table) —
    * same co-location contract as [[writeBucketed]] but the data lands at
    * `path` instead of the session warehouse, so ephemeral metastores
    * (fresh per JVM here) can re-register over a pre-existing directory
    * without managed-location conflicts.
    */
  def writeBucketedAt(
      df: DataFrame, table: String, path: String, bucketCol: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Driver-checked co-located join+aggregate over bucketed layouts — the
    * write-side decision that deletes the two big exchanges a fact⋈dim →
    * per-key rollup otherwise pays. Customer and orders are both written
    * bucketed 8 ways on the customer key; the join then needs no shuffle
    * (both sides' bucket layout IS the required clustering) and the
    * per-customer aggregate rides the same layout (grouping on a superset
    * of the bucket key satisfies its clustering too), so the only data
    * movement in the whole plan is the final top-10 TakeOrdered — at
    * 100 TB this is the difference between re-shuffling the fact table
    * per query and reading it join-ready (SourcesSpec pins the
    * no-Exchange plan; this entry pins the semantics against the plain
    *-join oracle). Temp tables/paths are per-sfDir and overwritten each
    * run; stale locations from prior JVMs are cleared first.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // collision-free per-sfDir suffix: md5 of the full path (a 32-bit
    // hashCode can collide across dirs, silently sharing tables/paths)
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft_bucketed_$sfx").getPath
    val (cT, oT) = (s"graft_bkt_c_$sfx", s"graft_bkt_o_$sfx")
    spark.sql(s"DROP TABLE IF EXISTS $cT")
    spark.sql(s"DROP TABLE IF EXISTS $oT")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    writeBucketedAt(
      graft.model.Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name")),
      cT, s"$base/c", "c_custkey", 8)
    writeBucketedAt(
      graft.model.Tables.orders(spark, sfDir)
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
      oT, s"$base/o", "c_custkey", 8)
    spark.table(cT).join(spark.table(oT), "c_custkey")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
      .orderBy(desc("total_spent"), col("c_custkey"))
      .limit(10)
  }

  val bucketedJoinSql: String =
    """SELECT c_custkey, c_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY total_spent DESC, c_custkey LIMIT 10""".stripMargin

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** CSV read with an explicit schema — no inference pass, no type guessing. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** ORC: the other columnar format (predicate pushdown + column pruning
    * work the same as parquet through the vectorized ORC reader).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Driver-facing format roundtrip: a lineitem key slice written to CSV,
    * JSON, and ORC, read back through the explicit-schema readers above,
    * and audited per format — row count, an order-independent `bit_xor`
    * key fingerprint, and a string-column count (proves VARCHAR survives
    * the text formats, not just numerics). The DuckDB oracle computes the
    * SAME audit three times straight from parquet, so a row lost, a key
    * corrupted, or a flag mangled by ANY of the three format paths breaks
    * the hash — the source/sink surface moves from unit-tested to
    * driver-checked. Temp output is per-sfDir and overwritten each run
    * (bench reruns are idempotent).
    */
  def formatRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val slice = graft.model.Tables.lineitem(spark, sfDir)
      .where(col("l_orderkey") % 50 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_returnflag"))
    val tmp = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_roundtrip_" + Integer.toHexString(sfDir.hashCode)).getPath
    writeCsv(slice, s"$tmp/csv")
    writeJson(slice, s"$tmp/json")
    writeOrc(slice, s"$tmp/orc")
    def audit(df: DataFrame, fmt: String): DataFrame =
      df.agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(l_orderkey * 10 + l_linenumber)").as("key_xor"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_flag_r"))
        .select(lit(fmt).as("format"), col("n_rows"), col("key_xor"), col("n_flag_r"))
    audit(readCsv(spark, s"$tmp/csv", slice.schema), "csv")
      .union(audit(readJson(spark, s"$tmp/json", slice.schema), "json"))
      .union(audit(readOrc(spark, s"$tmp/orc"), "orc"))
      .orderBy("format")
  }

  val formatRoundtripSql: String = {
    def audit(fmt: String): String =
      s"""SELECT '$fmt' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       bit_xor(l_orderkey * 10 + l_linenumber) AS key_xor,
         |       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_r
         |FROM lineitem WHERE l_orderkey % 50 = 0""".stripMargin
    Seq("csv", "json", "orc").map(audit).mkString("", "\nUNION ALL\n", "\nORDER BY format")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_format_roundtrip" -> (formatRoundtrip _),
    "q_bucketed_join" -> (bucketedJoin _),
    "q_dsv2_scan" -> (DocGen.dsv2Scan _),
    "q_dsv2_columnar" -> (DocGen.dsv2Columnar _),
    "q_dsv2_agg_pushdown" -> (DocGen.dsv2AggPushdown _),
    "q_dsv2_shard_rollup" -> (DocGen.dsv2ShardRollup _),
    "q_dsv2_spj" -> (DocGen.dsv2Spj _),
    "q_dsv2_spj_bucket" -> (DocGen.dsv2SpjBucket _),
    "q_dsv2_metadata_cols" -> (DocGen.dsv2MetadataCols _),
    "q_dsv2_catalog_function" -> (DocGen.dsv2CatalogFunction _),
    "q_dsv2_runtime_filter" -> (DocGen.dsv2RuntimeFilter _),
    "q_dsv2_write_roundtrip" -> (ShardSink.writeRoundtrip _),
    "q_dsv2_delete" -> (ShardSink.deleteRoundtrip _),
    "q_dsv2_delete_mor" -> (ShardSink.morDeleteRoundtrip _),
    "q_dsv2_merge_mor" -> (ShardSink.mergeMorRoundtrip _),
    "q_dsv2_cdf" -> (ShardSink.changeFeedReport _),
    "q_dsv2_cdf_update" -> (ShardSink.changeFeedUpdate _),
    "q_dsv2_merge_full" -> (ShardSink.mergeFullSyncCow _),
    "q_dsv2_merge_full_mor" -> (ShardSink.mergeFullSyncMor _),
    "s_dsv2_cdc_parity" -> (ShardSink.cdcStreamParity _),
    "s_dsv2_replica_sync" -> (ShardSink.replicaSyncParity _),
    "q_dsv2_merge" -> (ShardSink.mergeRoundtrip _),
    "s_shardsink_stream_parity" -> (ShardSink.streamWriteParity _),
    "s_shardsink_tail_parity" -> (ShardSink.tailParity _),
    "q_dsv2_time_travel" -> (ShardSink.timeTravel _),
    "q_dsv2_time_travel_ts" -> (ShardSink.timeTravelTs _),
    "q_dsv2_compact" -> (ShardSink.compactRoundtrip _),
    "q_dsv2_history" -> (ShardSink.historyReport _),
    "q_dsv2_stats_prune" -> (ShardSink.statsPrune _),
    "q_dsv2_range_prune" -> (ShardSink.rangePrune _),
    "q_dsv2_count_meta" -> (ShardSink.countMeta _),
    "q_dsv2_minmax_meta" -> (ShardSink.minMaxMeta _),
    "q_dsv2_evolve" -> (ShardSink.schemaEvolution _),
    "q_dsv2_constraints" -> (ShardSink.constraintsReport _),
    "q_dsv2_sink_spj" -> (ShardSink.sinkSpj _),
    "q_dsv2_clone" -> (ShardSink.cloneReport _),
    "q_dsv2_meta_tables" -> (ShardSink.metaTablesReport _),
    "q_dsv2_ctas" -> (ShardSink.ctasReport _),
    "q_dsv2_manifest_segments" -> (ShardSink.manifestSegmentsReport _),
    "q_dsv2_auto_evolve" -> (ShardSink.autoEvolveReport _),
    "q_dsv2_seg_envelope" -> (ShardSink.segEnvelopeReport _),
    "q_dsv2_count_pruned" -> (ShardSink.countPrunedReport _),
    "q_dsv2_groupby_meta" -> (ShardSink.groupByMetaReport _),
    "q_dsv2_sink_dpp" -> (ShardSink.sinkDppReport _),
    "q_dsv2_bloom_lookup" -> (ShardSink.bloomLookupReport _),
    "q_dsv2_optimize_binpack" -> (ShardSink.binPackReport _),
    "q_dsv2_auto_compact" -> (ShardSink.autoCompactReport _),
    "q_dsv2_mv_refresh" -> (SinkMatView.mvRefreshReport _),
    "q_dsv2_col_skipping" -> (SinkColStats.colSkippingReport _),
    "s_mv_stream_parity" -> (SinkMatView.mvStreamParity _),
    "q_dsv2_mv_groups" -> (SinkMatView.mvGroupsReport _),
    "q_dsv2_mv_dist" -> (SinkMvDist.mvDistReport _),
    "q_dsv2_mv_join" -> (SinkMvJoin.mvJoinReport _),
    "q_dsv2_mv_restore" -> (SinkMatView.mvRestoreReport _),
    "q_dsv2_mv_join_dist" -> (SinkMvDist.mvJoinDistReport _),
    "s_mvjoin_stream_parity" -> (SinkMvDist.mvJoinStreamParity _),
    "q_dsv2_mv_snowflake" -> (SinkMvDist.mvSnowflakeReport _),
    "s_mvsnow_stream_parity" -> (SinkMvDist.mvSnowflakeStreamParity _),
    "q_dsv2_mv_rewrite" -> (SinkMvRewrite.mvRewriteReport _),
    "q_dsv2_mv_filter_rewrite" -> (SinkMvRewrite.mvFilterRewriteReport _),
    "q_dsv2_mv_distinct_rewrite" -> (SinkMvRewrite.mvDistinctRewriteReport _),
    "q_dsv2_mv_sql_ddl" -> (SinkMvDdl.mvSqlDdlReport _),
    "q_dsv2_mv_dimtail_rewrite" -> (SinkMvRewrite.mvDimTailRewriteReport _),
    "q_dsv2_mv_join_rewrite" -> (SinkMvRewrite.mvJoinRewriteReport _),
    "q_dsv2_mv_snow_rewrite" -> (SinkMvRewrite.mvSnowRewriteReport _),
    "q_dsv2_mv_auto_rebucket" -> (SinkMvDist.mvAutoRebucketReport _),
    "q_dsv2_zorder_cols" -> (SinkColStats.zorderColsReport _),
    "q_dsv2_meta_col_minmax" -> (SinkColStats.metaColMinMaxReport _),
    "q_dsv2_restore" -> (ShardSink.restoreReport _),
    "q_dsv2_replace_where" -> (ShardSink.replaceWhereReport _),
    "q_dsv2_vacuum" -> (ShardSink.vacuumReport _),
    "q_dsv2_zorder" -> (ShardSink.zorderRoundtrip _),
    "q_dsv2_tags" -> (ShardSink.tagsReport _),
    "s_dsv2_stream_parity" -> (DocGen.dsv2StreamParity _))

  val oracle: Map[String, String] = Map(
    "q_format_roundtrip" -> formatRoundtripSql,
    "q_bucketed_join" -> bucketedJoinSql,
    "q_dsv2_scan" -> DocGen.dsv2ScanSql,
    "q_dsv2_columnar" -> DocGen.dsv2ColumnarSql,
    "q_dsv2_agg_pushdown" -> DocGen.dsv2AggPushdownSql,
    "q_dsv2_shard_rollup" -> DocGen.dsv2ShardRollupSql,
    "q_dsv2_spj" -> DocGen.dsv2SpjSql,
    "q_dsv2_spj_bucket" -> DocGen.dsv2SpjBucketSql,
    "q_dsv2_metadata_cols" -> DocGen.dsv2MetadataColsSql,
    "q_dsv2_catalog_function" -> DocGen.dsv2CatalogFunctionSql,
    "q_dsv2_runtime_filter" -> DocGen.dsv2RuntimeFilterSql,
    "q_dsv2_write_roundtrip" -> ShardSink.writeRoundtripSql,
    "q_dsv2_delete" -> ShardSink.deleteRoundtripSql,
    "q_dsv2_delete_mor" -> ShardSink.morDeleteRoundtripSql,
    "q_dsv2_merge_mor" -> ShardSink.mergeMorRoundtripSql,
    "q_dsv2_cdf" -> ShardSink.changeFeedReportSql,
    "q_dsv2_cdf_update" -> ShardSink.changeFeedUpdateSql,
    "q_dsv2_merge_full" -> ShardSink.mergeFullSyncSql,
    "q_dsv2_merge_full_mor" -> ShardSink.mergeFullSyncSql,
    "s_dsv2_cdc_parity" -> ShardSink.cdcStreamParitySql,
    "s_dsv2_replica_sync" -> ShardSink.replicaSyncParitySql,
    "q_dsv2_merge" -> ShardSink.mergeRoundtripSql,
    "s_shardsink_stream_parity" -> ShardSink.streamWriteParitySql,
    "s_shardsink_tail_parity" -> ShardSink.tailParitySql,
    "q_dsv2_time_travel" -> ShardSink.timeTravelSql,
    "q_dsv2_time_travel_ts" -> ShardSink.timeTravelTsSql,
    "q_dsv2_compact" -> ShardSink.compactRoundtripSql,
    "q_dsv2_history" -> ShardSink.historyReportSql,
    "q_dsv2_stats_prune" -> ShardSink.statsPruneSql,
    "q_dsv2_range_prune" -> ShardSink.rangePruneSql,
    "q_dsv2_count_meta" -> ShardSink.countMetaSql,
    "q_dsv2_minmax_meta" -> ShardSink.minMaxMetaSql,
    "q_dsv2_evolve" -> ShardSink.schemaEvolutionSql,
    "q_dsv2_constraints" -> ShardSink.constraintsReportSql,
    "q_dsv2_sink_spj" -> ShardSink.sinkSpjSql,
    "q_dsv2_clone" -> ShardSink.cloneReportSql,
    "q_dsv2_meta_tables" -> ShardSink.metaTablesReportSql,
    "q_dsv2_ctas" -> ShardSink.ctasReportSql,
    "q_dsv2_manifest_segments" -> ShardSink.manifestSegmentsReportSql,
    "q_dsv2_auto_evolve" -> ShardSink.autoEvolveReportSql,
    "q_dsv2_seg_envelope" -> ShardSink.segEnvelopeReportSql,
    "q_dsv2_count_pruned" -> ShardSink.countPrunedReportSql,
    "q_dsv2_groupby_meta" -> ShardSink.groupByMetaReportSql,
    "q_dsv2_sink_dpp" -> ShardSink.sinkDppReportSql,
    "q_dsv2_bloom_lookup" -> ShardSink.bloomLookupReportSql,
    "q_dsv2_optimize_binpack" -> ShardSink.binPackReportSql,
    "q_dsv2_auto_compact" -> ShardSink.autoCompactReportSql,
    "q_dsv2_mv_refresh" -> SinkMatView.mvRefreshReportSql,
    "q_dsv2_col_skipping" -> SinkColStats.colSkippingReportSql,
    "s_mv_stream_parity" -> SinkMatView.mvStreamParitySql,
    "q_dsv2_mv_groups" -> SinkMatView.mvGroupsReportSql,
    "q_dsv2_mv_dist" -> SinkMvDist.mvDistReportSql,
    "q_dsv2_mv_join" -> SinkMvJoin.mvJoinReportSql,
    "q_dsv2_mv_restore" -> SinkMatView.mvRestoreReportSql,
    "q_dsv2_mv_join_dist" -> SinkMvDist.mvJoinDistReportSql,
    "s_mvjoin_stream_parity" -> SinkMvDist.mvJoinStreamParitySql,
    "q_dsv2_mv_snowflake" -> SinkMvDist.mvSnowflakeReportSql,
    "s_mvsnow_stream_parity" -> SinkMvDist.mvSnowflakeStreamParitySql,
    "q_dsv2_mv_rewrite" -> SinkMvRewrite.mvRewriteReportSql,
    "q_dsv2_mv_filter_rewrite" -> SinkMvRewrite.mvFilterRewriteReportSql,
    "q_dsv2_mv_distinct_rewrite" -> SinkMvRewrite.mvDistinctRewriteReportSql,
    "q_dsv2_mv_sql_ddl" -> SinkMvDdl.mvSqlDdlReportSql,
    "q_dsv2_mv_dimtail_rewrite" -> SinkMvRewrite.mvDimTailRewriteReportSql,
    "q_dsv2_mv_join_rewrite" -> SinkMvRewrite.mvJoinRewriteReportSql,
    "q_dsv2_mv_snow_rewrite" -> SinkMvRewrite.mvSnowRewriteReportSql,
    "q_dsv2_mv_auto_rebucket" -> SinkMvDist.mvAutoRebucketReportSql,
    "q_dsv2_zorder_cols" -> SinkColStats.zorderColsReportSql,
    "q_dsv2_meta_col_minmax" -> SinkColStats.metaColMinMaxReportSql,
    "q_dsv2_restore" -> ShardSink.restoreReportSql,
    "q_dsv2_replace_where" -> ShardSink.replaceWhereReportSql,
    "q_dsv2_vacuum" -> ShardSink.vacuumReportSql,
    "q_dsv2_zorder" -> ShardSink.zorderRoundtripSql,
    "q_dsv2_tags" -> ShardSink.tagsReportSql,
    "s_dsv2_stream_parity" -> DocGen.dsv2StreamParitySql)

  /** PERMISSIVE CSV read: malformed lines land in `_corrupt_record` instead
    * of failing the job — the source-level twin of the reference's
    * drop-on-parse-failure (main.py:116–117 / SURVEY.md P-7). Callers
    * filter `_corrupt_record IS NULL` to drop (observable count) or keep
    * the column for quarantine-table routing. At 100 TB a FAILFAST job
    * dying at hour 9 on one bad line is the alternative — don't.
    * Note: Spark rejects queries touching ONLY `_corrupt_record` on the
    * raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or materialize
    * the parse before corrupt-only filters.
    */
  def readCsvPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  /** Small-file compaction: rewrite a directory (e.g. a streaming sink's
    * accumulated micro-batch files) into `nFiles` files via a staging dir +
    * swap. The operational follow-up to foreachBatch sinks — thousands of
    * tiny parquet files are the classic streaming-landing-zone pathology
    * (footer-per-file planning cost, tiny row groups).
    */
  def compact(spark: SparkSession, path: String, nFiles: Int): Unit = {
    val staging = path + "__compacting"
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"failed to clear $old")
    if (!fs.rename(target, old))
      throw new java.io.IOException(s"failed to move $target aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(staging), target))
      throw new java.io.IOException(s"failed to swap compacted files into $target")
    fs.delete(old, true)
  }

  /** JDBC source — the Spark-native replacement for the reference's
    * SQLAlchemy/Postgres read path (main.py:15, engine over DB_URL). The
    * partitioning contract is what makes it a PARALLEL scan instead of one
    * executor dragging the whole table through a single connection:
    * `partitionColumn` + `lowerBound`/`upperBound` + `numPartitions` split
    * the table into numPartitions range-predicate queries (`WHERE col >= lo
    * AND col < hi`), one per task, so 1000 executors each pull their slice.
    * Pick a roughly uniform numeric/date column (a surrogate key); bounds
    * only steer the split points — rows outside them are still read by the
    * first/last partition. No live DB ships in this container, so the
    * plumbing is unit-tested via the reader's declared options (see
    * SourcesSpec); the call shape is the production one.
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Map[String, String] = Map.empty): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    require(lowerBound < upperBound, "lowerBound must be < upperBound")
    val reader = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
  }

  /** JDBC sink — batch append, replacing the reference's per-row
    * session.add + COMMIT loop (main.py:130–147) with one transaction per
    * PARTITION: each task opens one connection and writes its rows in
    * `batchsize`-row batches (the two-round-trips-per-row pathology becomes
    * ~rows/batchsize round trips per executor). `numPartitions` caps
    * concurrent connections so 1000 tasks don't stampede the database —
    * coalesce (not repartition: no shuffle) down to it.
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      numPartitions: Int = 8,
      batchSize: Int = 10000,
      props: Map[String, String] = Map.empty): Unit = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    val writer = df.coalesce(numPartitions).write
      .format("jdbc")
      .mode(SaveMode.Append)
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
    props.foreach { case (k, v) => writer.option(k, v) }
    writer.save()
  }

  /** Range-partitioned, sorted-within-file layout: rows globally ordered on
    * `sortCol` across `nFiles` files. Parquet stores per-row-group min/max
    * on every column; with sorted data a range predicate on `sortCol` skips
    * whole row groups/files at scan time — the poor-man's index, and the
    * single highest-leverage layout decision for a 100 TB fact table.
    */
  def writeSorted(df: DataFrame, path: String, sortCol: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, df(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
