package graft.multimodal

import graft.model.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief: "multimodal columns").
  *
  * Media payloads are opaque `BINARY` columns with typed metadata riding
  * alongside — the schema/partitioning pattern for image/audio/video at
  * 100 TB (payload bytes stay columnar in parquet; metadata prunes). The
  * decode step is a clearly-marked STUB (no codec libs in this container):
  * [[decodeStub]] derives deterministic fake features from the bytes, while
  * the Spark-side plumbing — schema, `Dataset[T]` encoders, batched
  * `mapPartitions` (the Scala analogue of `mapInPandas` batch shape),
  * partition sizing — is real and tested.
  */
object Media {

  /** An opaque media payload + typed metadata. */
  case class MediaItem(media_id: Long, kind: String, content: Array[Byte], n_bytes: Int)

  /** Extracted features (what a real decoder/CNN stub would emit). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      feat: Array[Float])

  /** STUB decoder: a real implementation would call an image/audio codec
    * here (per-partition init, batch decode). This fake is deterministic:
    * dimensions and features derive only from the payload bytes.
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Array[Float]) = {
    val w = 1 + (java.lang.Byte.toUnsignedInt(content(0)) % 64)
    val h = 1 + (java.lang.Byte.toUnsignedInt(content(1)) % 64)
    val feat = content.take(8).map(b => java.lang.Byte.toUnsignedInt(b) / 255.0f)
    (w, h, feat)
  }

  /** Synthesize a media table from `documents`: payload = md5 bytes of the
    * text (deterministic stand-in for real image bytes), kind cycled.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")), (col("doc_id") % 3 + 1).cast("int"))
          .as("kind"),
        unhex(md5(col("text").cast("binary"))).as("content"))
      .withColumn("n_bytes", length(col("content")).cast("int"))
      .as[MediaItem]
  }

  /** Batched per-partition feature extraction — the `mapInPandas` shape in
    * Scala: iterate the partition in fixed-size batches so a real codec
    * amortizes model/handle init per batch, not per row.
    */
  def extractFeatures(items: Dataset[MediaItem], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real impl: decoder.decodeBatch(batch.map(_.content))
        batch.map { m =>
          val (w, h, feat) = decodeStub(m.content)
          MediaFeatures(m.media_id, m.kind, m.n_bytes, w, h, feat)
        }
      }
    }
  }

  /** STUB resize: a real implementation hands the batch to an image codec;
    * the deterministic fake scales the stub dimensions and re-derives
    * features. Signature/batching shape is the real contract.
    */
  def resizeStub(items: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { m =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(m.width, m.height))
      m.copy(
        width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    })
  }

  /** STUB frame-sample for video payloads: a real impl decodes every Nth
    * frame; the fake derives one MediaItem per sampled "frame" from the
    * payload bytes. Shows the 1→N explode shape (flatMap in batches) that
    * a frame sampler needs — output partitioning stays with the input.
    */
  def frameSampleStub(items: Dataset[MediaItem], everyNth: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").mapPartitions(_.flatMap { m =>
      val nFrames = 1 + java.lang.Byte.toUnsignedInt(m.content(2)) % 8
      (0 until nFrames by everyNth).map { f =>
        m.copy(
          media_id = m.media_id * 1000 + f,
          kind = "frame",
          content = m.content.map(b => (b ^ f).toByte))
      }
    })
  }

  /** Partition-by-kind layout: payload bytes stay columnar per kind so a
    * kind-filtered decode job never reads the other modalities' bytes —
    * the metadata-prunes-payload pattern for multimodal tables at 100 TB.
    */
  def writePartitionedByKind(items: Dataset[MediaItem], path: String): Unit =
    items.write.mode("overwrite").partitionBy("kind").parquet(path)

  /** Driver-facing query: features rolled up per kind. Every output column
    * is an exact integer (counts and sums of byte-derived ints), so despite
    * flowing through `mapPartitions`, the whole pipeline is hash-checkable:
    * the DuckDB oracle re-derives the stub's math from `md5(text)` bytes in
    * SQL (payload byte k = hex pair 2k+1 of the digest). `sum_feat0_255`
    * proves the float feature array survives the Dataset round-trip —
    * `round(feat[0]·255)` recovers the source byte exactly (relative float32
    * error ≤ 2⁻²⁴ ≪ 0.5), keeping the check integer-exact in both engines.
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(round(element_at(col("feat"), 1) * 255).cast("long")).as("sum_feat0_255"))
      .orderBy("kind")

  /** Driver-facing query over [[frameSampleStub]]: every sampled frame of
    * every video payload, as (frame_id, b0, n_bytes) rows. Hash-checkable
    * despite the typed flatMap: frame ids are arithmetic on the parent id,
    * `b0` is the first payload byte after the per-frame XOR, and the DuckDB
    * twin re-derives both from the `md5(text)` hex digits plus
    * `range(0, n_frames, 2)` — so the 1→N explode shape (the thing a real
    * frame sampler needs from the engine) is verified end to end, not just
    * unit-tested.
    */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    frameSampleStub(mediaTable(spark, sfDir), everyNth = 2)
      .map(m => (m.media_id, java.lang.Byte.toUnsignedInt(m.content(0)).toLong, m.n_bytes.toLong))
      .toDF("frame_id", "b0", "n_bytes")
      .orderBy("frame_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_features" -> (mediaFeatures _),
    "m_frame_sample" -> (frameSample _))

  /** DuckDB twin: re-derives [[decodeStub]]'s byte math from `md5(text)` —
    * payload = `unhex(md5(text))`, so payload byte k is hex chars
    * [2k+1, 2k+2] of the digest; width/height/feat0 follow [[decodeStub]].
    */
  val oracle: Map[String, String] = Map(
    "m_media_features" ->
      """WITH m AS (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |         ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0,
        |         ('0x' || substr(md5(text), 3, 2))::BIGINT AS b1
        |  FROM documents)
        |SELECT kind,
        |       count(*) AS n_items,
        |       CAST(count(*) * 16 AS BIGINT) AS total_bytes,
        |       CAST(sum(1 + (b0 % 64)) AS BIGINT) AS sum_width,
        |       CAST(sum(1 + (b1 % 64)) AS BIGINT) AS sum_height,
        |       CAST(sum(b0) AS BIGINT) AS sum_feat0_255
        |FROM m GROUP BY kind ORDER BY kind""".stripMargin,
    // Twin of frameSample: videos are doc_id % 3 = 2 (element_at is
    // 1-indexed on the kind seq); payload byte k = hex pair [2k+1, 2k+2] of
    // md5(text); n_frames = 1 + (byte2 % 8); sampled f = range(0,n,2);
    // b0 of a frame = xor(byte0, f) because the stub XORs every payload
    // byte with the frame index.
    "m_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(text), 1, 2))::BIGINT AS b0,
        |         ('0x' || substr(md5(text), 5, 2))::BIGINT AS b2
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT v.doc_id * 1000 + f.f AS frame_id,
        |       xor(v.b0, f.f) AS b0,
        |       CAST(16 AS BIGINT) AS n_bytes
        |FROM v, unnest(range(0, 1 + (v.b2 % 8), 2)) AS f(f)
        |ORDER BY frame_id""".stripMargin)
}
