package graft.streaming

import graft.model.Tables
import graft.vec.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming side of the ANN-index maintenance story (`x3_ivf_delta` /
  * `x3_pq_delta` are its batch shapes): a production embedding ingest
  * assigns every ARRIVING vector to the served quantizer scan-side and
  * accumulates per-cluster populations — the live counters a drift
  * monitor watches between retrains.
  *
  * The assignment is a STATELESS projection (the centroid set is a
  * broadcast-sized literal, [[graft.vec.VectorOps.clusterAssignment]] —
  * no join, no state store), so the only stateful operator is the
  * per-cluster count. That is the cheapest possible streaming shape: at
  * 100 TB/day the ingest parallelizes embarrassingly and state is one
  * counter row per cluster, independent of throughput.
  */
object VectorStreaming {

  /** MemoryStream row — mirrors the embeddings table's (vec_id, embedding)
    * columns; label is irrelevant to assignment.
    */
  case class EmbRow(vec_id: Long, embedding: Seq[Float])

  val ParityChunks = 3

  /** Driver-visible parity row: the bounded stream's FINAL per-cluster
    * populations (max of the monotone update-mode counter) must equal the
    * batch assignment of the same vectors under the same memoized
    * quantizer — `n_diff = 0`. Counts are commutative, so any chunking
    * is deterministic. The oracle re-trains the quantizer through
    * [[graft.vec.VectorOps.kmeansCteChain]] (the chain every IVF oracle
    * shares) and re-derives the per-cluster counts independently.
    */
  def ivfAssignParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cents = VectorOps.kmeansCentroids(spark, sfDir) // memoized trained index
    val embDouble = col("embedding").cast("array<double>")
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .as[EmbRow].collect().sortBy(_.vec_id)
    val streamed = CorpusStreaming.runBoundedStream(
      spark,
      rows.grouped(math.max(1, rows.length / ParityChunks + 1)).map(_.toSeq).toSeq,
      outputMode = "update") { in =>
      in.withColumn("cluster", VectorOps.clusterAssignment(embDouble, cents))
        .groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
    }
      .groupBy("cluster")
      .agg(max(col("n_vecs")).as("n_vecs")) // final update of a monotone counter
    val batch = Tables.embeddings(spark, sfDir)
      .withColumn("cluster", VectorOps.clusterAssignment(embDouble, cents))
      .groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed.agg(count(lit(1)), sum(col("n_vecs"))).collect().head
    Seq((totals.getLong(0), totals.getLong(1), nDiff))
      .toDF("n_clusters", "n_vecs", "n_diff")
  }

  lazy val ivfAssignParitySql: String = {
    val last = s"cents${VectorOps.KmeansIters}"
    s"""WITH ${VectorOps.kmeansCteChain},
       |a AS (
       |  SELECT e.vec_id, c.clabel AS cluster,
       |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |           ORDER BY ${VectorOps.kmeansD2Sql}, c.clabel) AS rn
       |  FROM embeddings e CROSS JOIN $last c)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |       CAST(SUM(n) AS BIGINT) AS n_vecs,
       |       CAST(0 AS BIGINT) AS n_diff
       |FROM (SELECT cluster, COUNT(*) AS n FROM a WHERE rn = 1 GROUP BY cluster)""".stripMargin
  }

  /** Driver-visible parity for the CROSS-corpus near-dup screen
    * ([[graft.vec.VectorOps.semanticDelta]] is the batch twin): delta
    * vectors ARRIVE as a stream, are band-keyed scan-side
    * ([[graft.vec.VectorOps.vecBandArray]] — stateless, no state store),
    * and probe the served base-side index via a STREAM-STATIC join; exact
    * cosine verifies candidates in the same micro-batch. The only
    * difference from the batch screen is delta-side bucket capping: the
    * stream has no cross-delta bucket state (each arriving vector probes
    * independently), so parity is exact whenever no delta bucket exceeds
    * [[graft.text.Dedup.MaxBandBucket]] — true by orders of magnitude on
    * the checked corpora, and the production posture anyway (the cap
    * exists to bound batch pair explosions, not ingest probes).
    *
    * Output: (n_pairs, n_flagged, n_diff) — pair count, distinct flagged
    * delta vectors, and the exceptAll diff against the batch screen.
    */
  def semanticDeltaParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val embDouble = col("embedding").cast("array<double>")
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), embDouble.as("emb"))
    val base = e.where(col("vec_id") < VectorOps.VecDeltaSplit)
    // the served index: capped (band, bits) rows with the member embedding
    // attached — built once (localCheckpoint), probed per micro-batch
    val index = VectorOps.lshVecBuckets(base, graft.text.Dedup.MaxBandBucket)
      .join(base.select(col("vec_id"), col("emb").as("base_emb")), Seq("vec_id"))
      .withColumnRenamed("vec_id", "base_id")
      .localCheckpoint(true)
    val rows = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") >= VectorOps.VecDeltaSplit)
      .select(col("vec_id"), col("embedding"))
      .as[EmbRow].collect().sortBy(_.vec_id)
    val streamed = CorpusStreaming.runBoundedStream(
      spark,
      rows.grouped(math.max(1, rows.length / ParityChunks + 1)).map(_.toSeq).toSeq) { in =>
      in.select(col("vec_id").as("delta_id"), embDouble.as("emb"))
        .select(col("delta_id"), col("emb"),
          explode(VectorOps.vecBandArray(col("emb"))).as("bb"))
        .select(col("delta_id"), col("emb"),
          col("bb.band").as("band"), col("bb.bits").as("bits"))
        .join(index, Seq("band", "bits"))
        .where(VectorOps.cosine(col("emb"), col("base_emb")) >= VectorOps.SimJoinThreshold)
        .select(col("delta_id"), col("base_id"),
          round(VectorOps.cosine(col("emb"), col("base_emb")), 6).as("sim"))
    }.distinct() // bands agreeing on a pair emit it once per band
    val batch = VectorOps.semanticDelta(spark, sfDir)
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed
      .agg(count(lit(1)), countDistinct(col("delta_id"))).collect().head
    Seq((totals.getLong(0), totals.getLong(1), nDiff))
      .toDF("n_pairs", "n_flagged", "n_diff")
  }

  lazy val semanticDeltaParitySql: String =
    s"""WITH ${VectorOps.semanticDeltaCtes}
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |       CAST(COUNT(DISTINCT delta_id) AS BIGINT) AS n_flagged,
       |       CAST(0 AS BIGINT) AS n_diff
       |FROM sx_pairs""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_ivf_assign_parity" -> (ivfAssignParity _),
    "s_semantic_delta_parity" -> (semanticDeltaParity _))

  val oracle: Map[String, String] = Map(
    "s_ivf_assign_parity" -> ivfAssignParitySql,
    "s_semantic_delta_parity" -> semanticDeltaParitySql)
}
