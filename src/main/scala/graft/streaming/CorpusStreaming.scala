package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest for the training-corpus pipeline: the scan-side stages
  * of [[graft.text.CorpusPipeline]] (quality gate, exact dedup, chunking)
  * run INCREMENTALLY over a document stream — the shape that curates an
  * append-only crawl landing zone continuously instead of in nightly
  * batches. Stage mapping:
  *
  *   - quality filter and chunking are stateless projections — identical
  *     Column expressions as the batch twins ([[graft.text.TextOps]]), so
  *     batch-vs-stream parity is by construction;
  *   - exact dedup becomes `dropDuplicatesWithinWatermark` on the md5
  *     fingerprint: state holds one 16-byte key per UNIQUE document seen
  *     within the watermark horizon, so state size tracks the late-data
  *     window, not the corpus (the only exact dedup that survives an
  *     unbounded stream). Cross-horizon re-crawls are caught downstream by
  *     the batch fingerprint join ([[graft.text.Dedup.exactDedup]]) — the
  *     standard lambda split;
  *   - near-dup WITHIN the watermark horizon runs in-stream as the
  *     band-bucket approximation ([[nearDupStream]]): per-row minhash
  *     signatures (no aggregation — [[graft.text.Dedup.rowMinhashSig]]),
  *     band keys deduped within the watermark, survivors = docs keeping
  *     ALL their band keys. State is one entry per distinct band key per
  *     horizon — bounded by arrival rate, not corpus size. CROSS-horizon
  *     near-dup stays batch: corpus-global band buckets are exactly what
  *     bounded streaming state cannot hold, so the lambda handoff
  *     (StreamingSpec) feeds stream survivors to the batch funnel.
  *
  * At 1000 executors the dedup state is hash-partitioned by fingerprint;
  * everything else is narrow.
  */
object CorpusStreaming {

  case class Doc(doc_id: Long, ingest_ts: Timestamp, text: String)

  /** quality gate → watermarked fingerprint dedup → chunk counts.
    * Returns an append-mode streamable frame:
    * (doc_id, ingest_ts, n_tokens, quality, fp).
    */
  def curateStream(docs: DataFrame, minQuality: Double): DataFrame =
    docs
      .where(graft.text.TextOps.qualityColumn(col("text")) >= minQuality)
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
      .select(
        col("doc_id"),
        col("ingest_ts"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        graft.text.TextOps.qualityColumn(col("text")).as("quality"),
        col("fp"))

  /** Within-horizon streaming NEAR-dup: the bounded-state band-bucket
    * approximation of MinHash+LSH dedup. Two chained stateful stages
    * (supported operator chain in append mode):
    *
    *   1. each doc's [[graft.text.Dedup.rowMinhashSig]] signature — a pure
    *      projection, no aggregation — explodes into its
    *      `NumHashes/BandSize` band keys, and
    *      `dropDuplicatesWithinWatermark` keeps each band key's FIRST
    *      owner within the horizon;
    *   2. a tumbling-window count per doc: a doc survives iff it kept ALL
    *      its band keys (losing any key means an earlier in-horizon doc
    *      agreed with it on a full band of minhashes — the LSH candidate
    *      rule).
    *
    * Approximation contract, stated honestly: candidates are NOT
    * exact-Jaccard verified in-stream (band agreement at J≈0.5 fires ~J⁴
    * per band, so lower-similarity false positives are possible and
    * dropped docs' remaining keys keep absorbing later arrivals —
    * transitive keep-one, like the batch cluster closure); within one
    * micro-batch the surviving owner of a contested key is
    * arrival-ordered, not min-id (a stream has no global order). The
    * precision-critical pass stays the batch funnel's verified near-dup —
    * this stage exists to shed the recrawl/mirror duplicate mass BEFORE
    * it lands in the corpus. State: one band key per distinct
    * (band, bucket) per horizon plus the open windows' per-doc counts —
    * both bounded by arrival rate. Emits (doc_id, window_start) in append
    * mode once the watermark closes the doc's window.
    */
  /** Driver-visible batch-twin equivalence: [[curateStream]] actually RUNS
    * (MemoryStream → quality gate → watermarked fingerprint dedup → memory
    * sink, the documents slice fed in three micro-batches so dedup state
    * crosses batch boundaries) and its output is diffed against the batch
    * semantics — distinct (fp, n_tokens, quality) over the quality-passing
    * slice. The projection is winner-independent by construction: docs
    * contesting a fingerprint have IDENTICAL text, so every column is the
    * same whichever arrival the stream keeps, and the one-row report
    * (n_stream, n_batch, n_diff) is deterministic and ORACLE-HASHABLE —
    * DuckDB re-derives n_batch as COUNT(DISTINCT md5(text)) and asserts
    * n_diff = 0, so a streaming-semantics drift fails the driver's hash
    * gate, not just a unit test. The collect feeding the MemoryStream is
    * the bounded 300-doc test slice (harness plumbing, not the operator);
    * production streams read a source, they are not fed from batch.
    */
  def streamBatchParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val MinQuality = graft.text.CorpusPipeline.PinnedConfig.minQuality
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val slice = graft.model.Tables.documents(spark, sfDir)
      .where(col("doc_id") < 300).select(col("doc_id"), col("text"))
      .collect()
      .map(r => Doc(r.getLong(0), new Timestamp(base + r.getLong(0) * 1000L), r.getString(1)))
      .sortBy(_.doc_id)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Doc]
    val sinkName = s"sbp_${sinkCounter.incrementAndGet()}"
    // Size STATE partitioning to the stream, not the batch-analytics
    // width: a streaming micro-batch commits one state store per shuffle
    // partition per stateful operator, so at local[32] a 300-doc stream
    // pays 32x the store overhead for zero parallelism win. The session
    // value is restored after the run (streams pin their state
    // partitioning at query start, so the override can't leak into a
    // running production stream).
    // The override must hold until the FIRST micro-batch has planned
    // (state partitioning pins itself then, not at start()), so it wraps
    // the whole bounded run and is restored after stop().
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partKey)
    try {
      spark.conf.set(partKey, "4")
      val q = curateStream(input.toDF(), MinQuality)
        .select(col("fp"), col("n_tokens"), col("quality"))
        .writeStream.outputMode("append").format("memory").queryName(sinkName).start()
      try {
        slice.grouped(math.max(1, slice.length / 3 + 1)).foreach { chunk =>
          input.addData(chunk.toSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set(partKey, prevParts)
    val streamed = spark.table(sinkName)
    val batch = graft.model.Tables.documents(spark, sfDir)
      .where(col("doc_id") < 300)
      .where(graft.text.TextOps.qualityColumn(col("text")) >= MinQuality)
      .select(
        md5(col("text").cast("binary")).as("fp"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        graft.text.TextOps.qualityColumn(col("text")).as("quality"))
      .distinct()
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    Seq((streamed.count(), batch.count(), nDiff))
      .toDF("n_stream", "n_batch", "n_diff")
  }

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  lazy val streamBatchParitySql: String = {
    val mq = graft.text.CorpusPipeline.PinnedConfig.minQuality
    s"""SELECT n AS n_stream, n AS n_batch, CAST(0 AS BIGINT) AS n_diff
       |FROM (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n
       |      FROM documents
       |      WHERE doc_id < 300 AND ${graft.text.TextOps.qualitySqlExpr("text")} >= $mq)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_batch_parity" -> (streamBatchParity _))

  val oracle: Map[String, String] = Map(
    "s_stream_batch_parity" -> streamBatchParitySql)

  def nearDupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame = {
    import graft.text.Dedup
    val nBands = Dedup.NumHashes / Dedup.BandSize
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withColumn("sig", Dedup.rowMinhashSig(col("text")))
      .withWatermark("ingest_ts", horizon)
      .select(
        col("doc_id"),
        col("ingest_ts"),
        explode(Dedup.rowBandKeys(col("sig"), col("fp"))).as("band_key"))
      .dropDuplicatesWithinWatermark("band_key")
      .groupBy(window(col("ingest_ts"), horizon), col("doc_id"))
      .agg(count(lit(1)).as("n_kept"))
      .where(col("n_kept") === nBands)
      .select(col("doc_id"), col("window.start").as("window_start"))
  }
}
