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
    val streamed = runBoundedStream(
      spark, slice.grouped(math.max(1, slice.length / 3 + 1)).map(_.toSeq).toSeq)(
      in => curateStream(in, MinQuality).select(col("fp"), col("n_tokens"), col("quality")))
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

  /** Shared bounded-stream harness for the parity queries: runs `plan`
    * over a MemoryStream fed `chunks` (one micro-batch each, so state
    * crosses batch boundaries), into a uniquely-named memory sink, and
    * returns the sink table. `spark.sql.shuffle.partitions` is held at 4
    * for the whole run — a streaming micro-batch commits one state store
    * per shuffle partition per stateful operator, so a bounded test
    * stream at local[32] would pay 32× the store overhead for zero
    * parallelism win; the override must survive until the FIRST
    * micro-batch has planned (state partitioning pins itself then, not
    * at start()), and is restored after stop.
    */
  private[streaming] def runBoundedStream[A: org.apache.spark.sql.Encoder](
      spark: SparkSession,
      chunks: Seq[Seq[A]],
      outputMode: String = "append")(plan: DataFrame => DataFrame): DataFrame = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[A]
    val sinkName = s"graft_parity_${sinkCounter.incrementAndGet()}"
    val partKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partKey)
    try {
      spark.conf.set(partKey, "4")
      val q = plan(input.toDF()).writeStream
        .outputMode(outputMode).format("memory").queryName(sinkName).start()
      try {
        chunks.foreach { c =>
          input.addData(c)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set(partKey, prevParts)
    spark.table(sinkName)
  }

  /** Driver-visible [[nearDupStream]] parity, HASH-checked. The stream's
    * only nondeterminism is contested-band-key ownership WITHIN a
    * micro-batch, so the harness feeds id-ordered chunks split so that
    * docs sharing a band key never co-batch — arrival order equals id
    * order exactly where it matters, ownership becomes min-doc_id, and
    * the survivor set equals a pure batch rule: a doc survives iff it is
    * the min-id owner of ALL its band keys. The
    * oracle re-derives that rule in DuckDB from the SAME generated
    * minhash-signature CTEs the x2 oracle uses (signature → band keys →
    * min owner → BOOL_AND ownership), so the emitted
    * (n_stream, n_batch, n_diff=0) row hash-checks streaming near-dup
    * semantics end to end. A far-future sentinel advances the watermark
    * so append mode closes the slice's window (the sentinel's own window
    * stays open — never emitted, and arriving last it can steal no
    * ownership).
    */
  def nearDupStreamParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.text.Dedup
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime // hour-aligned
    val slice = graft.model.Tables.documents(spark, sfDir)
      .where(nearDupParitySlice)
      .select(col("doc_id"), col("text")).collect()
      .map(r => Doc(r.getLong(0), new Timestamp(base + (r.getLong(0) % 3000) * 1000L), r.getString(1)))
      .sortBy(_.doc_id)
    // batch min-owner rule over the same slice, same band-key expression.
    // localCheckpoint: the 32-seed signature expression tree is large, and
    // FIVE downstream consumers (partner collect, owners, survivors, both
    // exceptAll sides) would each re-analyze and re-evaluate it —
    // materializing the 8·|slice| key rows once cuts it out of every
    // downstream plan.
    val keyRows = graft.model.Tables.documents(spark, sfDir)
      .where(nearDupParitySlice)
      .select(
        col("doc_id"),
        explode(Dedup.rowBandKeys(
          Dedup.rowMinhashSig(col("text")),
          md5(col("text").cast("binary")))).as("band_key"))
      .localCheckpoint(true)
    // Chunked feeding that preserves arrival-order determinism with
    // O(contested) micro-batches instead of O(docs): within-batch
    // ownership of a contested key is arrival-arbitrary, so docs SHARING
    // a band key must not co-chunk — everyone else rides along. Chunks
    // stay consecutive in id order, so a contested key's min-id holder
    // always lands in an earlier micro-batch and stream ownership is
    // exactly the batch min-id rule. The collect is the 8·|slice| key
    // list — harness plumbing over the bounded slice.
    val partners = {
      val m = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      keyRows.collect().groupBy(_.getString(1)).values.filter(_.length > 1).foreach { rows =>
        val ids = rows.map(_.getLong(0)).toSet
        ids.foreach(i => m(i) = m(i) ++ (ids - i))
      }
      m
    }
    val chunks = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Doc])
    slice.foreach { d =>
      if (chunks.last.exists(x => partners(d.doc_id).contains(x.doc_id)))
        chunks += scala.collection.mutable.ArrayBuffer.empty[Doc]
      chunks.last += d
    }
    val sentinel = Seq(Doc(999999999L, new Timestamp(base + 3 * 3600 * 1000L),
      "graft nearDup parity watermark sentinel text shared with nothing"))
    val streamed = runBoundedStream(
      spark, chunks.filter(_.nonEmpty).map(_.toSeq).toSeq :+ sentinel)(nearDupStream(_))
      .select(col("doc_id"))
    val owners = keyRows.groupBy("band_key").agg(min(col("doc_id")).as("owner"))
    val batch = keyRows.join(owners, "band_key")
      .groupBy("doc_id")
      .agg(max(when(col("doc_id") =!= col("owner"), 1).otherwise(0)).as("lost"))
      .where(col("lost") === 0).select(col("doc_id"))
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    Seq((streamed.count(), batch.count(), nDiff))
      .toDF("n_stream", "n_batch", "n_diff")
  }

  /** Slice bounds chosen so the slice CONTAINS a planted near-dup pair at
    * the oracle-checked SF (docs 152/178 share band keys at sf0.01) —
    * with no in-slice contest every doc trivially keeps all its keys and
    * the hash gate would verify only plumbing; with one, the stream must
    * DROP the later arrival's contested keys and DuckDB independently
    * decides which docs survive. (`% 3000` in the event-time offset keeps
    * any slice inside one tumbling window regardless of id magnitude.)
    */
  val NearDupParityLo = 150L
  val NearDupParityHi = 186L

  private def nearDupParitySlice: org.apache.spark.sql.Column =
    col("doc_id") >= NearDupParityLo && col("doc_id") < NearDupParityHi

  /** DuckDB twin: signatures via the generated minhash CTE chain
    * ([[graft.text.Dedup.minhashPairsCtes]] — only the CTEs up to `sig`
    * are referenced; unreferenced CTEs are not evaluated), band keys with
    * the exact [[graft.text.Dedup.rowBandKeys]] formula (full md5 hex of
    * the ':'-joined band minhashes; ':uniq:' fingerprint fallback for
    * shingle-less docs), then min-owner / own-all-keys survival.
    */
  lazy val nearDupStreamParitySql: String = {
    import graft.text.Dedup
    val src =
      s"(SELECT doc_id, text FROM documents WHERE doc_id >= $NearDupParityLo AND doc_id < $NearDupParityHi)"
    val nBands = Dedup.NumHashes / Dedup.BandSize
    val bandKeySelects = (0 until nBands).map { b =>
      val joined = (0 until Dedup.BandSize)
        .map(r => s"CAST(mh${b * Dedup.BandSize + r} AS VARCHAR)")
        .mkString(" || ':' || ")
      s"  SELECT doc_id, '$b' || ':' || md5($joined) AS band_key FROM mp_sig"
    }.mkString("\n  UNION ALL\n")
    val uniqSelects = (0 until nBands)
      .map(b => s"  SELECT doc_id, '$b' || ':uniq:' || md5(text) AS band_key FROM shortdoc")
      .mkString("\n  UNION ALL\n")
    s"""WITH ${Dedup.minhashPairsCtes(src, Dedup.MinhashThreshold)},
       |shortdoc AS (
       |  SELECT doc_id, text FROM $src d
       |  WHERE len(string_split(text, ' ')) < 3),
       |nk AS (
       |$bandKeySelects
       |  UNION ALL
       |$uniqSelects),
       |own AS (SELECT band_key, MIN(doc_id) AS owner FROM nk GROUP BY band_key),
       |sv AS (
       |  SELECT nk.doc_id FROM nk JOIN own USING (band_key)
       |  GROUP BY nk.doc_id HAVING BOOL_AND(nk.doc_id = own.owner))
       |SELECT n AS n_stream, n AS n_batch, CAST(0 AS BIGINT) AS n_diff
       |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sv)""".stripMargin
  }

  lazy val streamBatchParitySql: String = {
    val mq = graft.text.CorpusPipeline.PinnedConfig.minQuality
    s"""SELECT n AS n_stream, n AS n_batch, CAST(0 AS BIGINT) AS n_diff
       |FROM (SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n
       |      FROM documents
       |      WHERE doc_id < 300 AND ${graft.text.TextOps.qualitySqlExpr("text")} >= $mq)""".stripMargin
  }

  /** MemoryStream row for the model-serving parity — (doc_id, text). */
  case class ScoreDoc(doc_id: Long, text: String)

  /** Online model serving, hash-checked: documents ARRIVE as a stream and
    * are scored with the TRAINED quality classifier entirely scan-side —
    * the deployed model is 9 driver-collected scalars (train-time moments
    * + weights, [[graft.text.QualityModel.servingParams]] — the bounded
    * control plane a real serving path broadcasts), so scoring is a
    * STATELESS projection: no join, no state store, embarrassing
    * parallelism at any ingest rate. The production detail under test is
    * that serve-time standardization must use TRAIN-time moments — the
    * classic training/serving-skew bug — and the parity proves it: served
    * scores are bit-identical to the batch chain's (`n_diff = 0` over the
    * full (doc_id, p) relation), because [[graft.text.QualityModel
    * .scoreText]] shares the feature expressions, rounding points, and
    * fold order with the training plan. The oracle re-derives n_docs and
    * the keep-count from the SAME unrolled training CTEs.
    */
  def modelServingParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (m, s, wts, b) = graft.text.QualityModel.servingParams(spark, sfDir)
    val rows = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[ScoreDoc].collect().sortBy(_.doc_id)
    val streamed = runBoundedStream(
      spark,
      rows.grouped(math.max(1, rows.length / 3 + 1)).map(_.toSeq).toSeq) { in =>
      in.select(
        col("doc_id"),
        graft.text.QualityModel.scoreText(m, s, wts, b)(col("text")).as("p"))
    }
    val batch = graft.text.QualityModel.scoredDocs(spark, sfDir)
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed
      .agg(
        count(lit(1)),
        sum(when(col("p") >= 0.5, 1L).otherwise(0L)))
      .collect().head
    Seq((totals.getLong(0), totals.getLong(1), nDiff))
      .toDF("n_docs", "n_keep", "n_diff")
  }

  lazy val modelServingParitySql: String =
    s"""WITH ${graft.text.QualityModel.modelSqlCtes},
       |pf AS (SELECT doc_id, ${graft.text.QualityModel.sigmoidSql} AS p
       |       FROM z, ${graft.text.QualityModel.wFinal})
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |       CAST(0 AS BIGINT) AS n_diff
       |FROM pf""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_batch_parity" -> (streamBatchParity _),
    "s_neardup_stream_parity" -> (nearDupStreamParity _),
    "s_model_serving_parity" -> (modelServingParity _))

  val oracle: Map[String, String] = Map(
    "s_stream_batch_parity" -> streamBatchParitySql,
    "s_neardup_stream_parity" -> nearDupStreamParitySql,
    "s_model_serving_parity" -> modelServingParitySql)

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
