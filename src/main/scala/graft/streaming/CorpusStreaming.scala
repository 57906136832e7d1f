package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
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
  *   - near-dup (MinHash) stays batch: LSH banding needs corpus-global
  *     band buckets, which no bounded-state streaming operator provides.
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
}
