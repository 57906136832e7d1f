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

  /** Driver-facing query: features rolled up per kind (rows-only check —
    * mapPartitions output is not SQL-expressible for the oracle).
    */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width").cast("double")), 6).as("avg_width"),
        round(avg(element_at(col("feat"), 1).cast("double")), 6).as("avg_feat0"))
      .orderBy("kind")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_media_features" -> (mediaFeatures _))
}
