package graft.text

import graft.etl.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The training-corpus curation funnel, end to end — the pipeline the
  * individual operators exist FOR, composed in the canonical order:
  *
  *   quality filter → eval decontamination → exact dedup → near-dup drop
  *   (MinHash+LSH) → chunk → train/val/test split
  *
  * Each stage is one of the library's tested operators; this object only
  * sequences them and reports the funnel (docs surviving per stage), so a
  * user gets the whole curation run in one call without re-plumbing. All
  * stages are hash-deterministic: the same input corpus yields the same
  * curated set on any cluster, any day (the property that makes data
  * lineage auditable).
  *
  * Scale posture is inherited from the stages: quality scoring is
  * scan-side arithmetic, decontamination a broadcast probe, exact dedup a
  * hash aggregate, near-dup an LSH-banded candidate join (never O(n²)),
  * chunking scan-side, splitting a projection. No stage collects the
  * corpus to the driver; `funnel` counts are the only driver-side values.
  */
object CorpusPipeline {

  case class Config(
      minQuality: Double = 0.5,
      maxSharedShingles: Long = 0L, // 0 = drop on ANY eval overlap
      nearDupJaccard: Double = 0.5)

  /** One curation run. `docs`/`evalDocs` need (doc_id, text, n_chars).
    * Returns the curated, chunked, split corpus; `funnel` receives
    * (stage → surviving doc count) for the audit log.
    */
  def curate(
      docs: DataFrame,
      evalDocs: DataFrame,
      cfg: Config = Config(),
      funnel: ((String, Long)) => Unit = _ => ()): DataFrame = {
    funnel(("input", docs.count()))

    // 1. quality: keep docs at or above the score threshold
    val scored = docs.withColumn(
      "quality",
      TextOps.qualityColumn(col("text")))
    val quality = scored.where(col("quality") >= cfg.minQuality).drop("quality")
    funnel(("quality", quality.count()))

    // 2. decontaminate: drop docs overlapping the eval set
    val contaminated = Dedup.decontaminateOf(quality, evalDocs)
      .where(col("n_shared_shingles") > cfg.maxSharedShingles)
      .select(col("doc_id"))
    val clean = quality.join(contaminated, Seq("doc_id"), "left_anti")
    funnel(("decontaminated", clean.count()))

    // 3. exact dedup: one canonical doc per identical text
    val exact = clean
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("text").orderBy("doc_id")))
      .where(col("rk") === 1).drop("rk")
    funnel(("exact_dedup", exact.count()))

    // 4. near-dup: drop the higher-id member of every MinHash+LSH pair at
    // or above the Jaccard threshold (keep-first policy, deterministic)
    val dupIds = Dedup.minhashPairsOf(exact, cfg.nearDupJaccard)
      .select(col("d2").as("doc_id")).distinct()
    val nearDeduped = exact.join(dupIds, Seq("doc_id"), "left_anti")
    funnel(("near_dedup", nearDeduped.count()))

    // 5. chunk to training windows, 6. stamp the split
    val out = TextOps.chunksOf(nearDeduped)
      .select(
        col("doc_id"),
        col("chunk_idx"),
        concat_ws(" ", col("chunk")).as("text"),
        size(col("chunk")).cast("bigint").as("n_tokens"))
      .withColumn("split", Sampling.splitColumn(col("doc_id")))
    funnel(("chunks", out.count()))
    out
  }
}
