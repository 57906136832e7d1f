package graft.etl

import graft.etl.Normalize._
import org.apache.spark.sql.{AnalysisException, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's operational loop (/root/reference/main.py:159–177) as a
  * reusable, idempotent batch API: parse → drop unparseable → classify →
  * get-or-create dims against the PERSISTED dimension tables → append
  * FK-resolved facts. Re-running with the same batch appends facts (the
  * reference's data_coleta accumulation, main.py:44) but never duplicates
  * or renumbers a dimension row — the unique-constraint semantics
  * (main.py:27,32) enforced set-based.
  *
  * Everything is one lazy plan per run: the per-row Postgres round-trips of
  * the reference (main.py:130–147) become two broadcast joins; at 100 TB
  * the fact batch streams through executors while the dims stay
  * driver-negligible.
  */
object Pipeline {

  /** Parquet locations of the star schema (the "database"). */
  case class StarPaths(pais: String, setor: String, fato: String)

  private val dimSchema = StructType.fromDDL("id BIGINT, nome STRING")

  private def readOrEmpty(spark: SparkSession, path: String, schema: StructType): DataFrame =
    try spark.read.schema(schema).parquet(path)
    catch { case _: AnalysisException => spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema) }

  /** Normalize + drop + classify — the Transform stage, shared with the
    * oracle-checked EtlQueries.starBuild.
    */
  def transform(
      raw: DataFrame,
      brazilSectorOf: Map[String, String],
      countrySectorOf: Map[String, String]): DataFrame = {
    val parsed = raw
      .withColumn("valor_atual", ptBrNumber("valor_atual_s"))
      .withColumn("maxima", ptBrNumber("maxima_s"))
      .withColumn("minima", ptBrNumber("minima_s"))
      .withColumn("variacao", ptBrPercent("variacao_s"))
      .where(
        col("valor_atual").isNotNull && col("maxima").isNotNull &&
          col("minima").isNotNull && col("variacao").isNotNull)
    parsed.withColumn(
      "setor",
      when(col("pais") === "Brasil", classify(col("nome"), brazilSectorOf, "Diversificado"))
        .otherwise(classify(col("pais"), countrySectorOf, "Primário")))
  }

  /** One Extract→Load run. Returns (paisCount, setorCount, factTableTotal)
    * — the third element is the CUMULATIVE fact-table row count after the
    * append (the accumulation the reference's repeated runs produce), not
    * this run's delta.
    */
  def run(
      spark: SparkSession,
      raw: DataFrame,
      paths: StarPaths,
      brazilSectorOf: Map[String, String] = Map.empty,
      countrySectorOf: Map[String, String] = Map.empty,
      collectedAt: org.apache.spark.sql.Column = current_timestamp()): (Long, Long, Long) = {
    // persist: the batch feeds 3+ actions (two dim upserts, the fact
    // append); without it the raw source would be re-scanned per action —
    // wasted work AND a consistency window if the source dir changes
    // mid-run (facts would FK-resolve against dims from another snapshot)
    val batch = transform(raw, brazilSectorOf, countrySectorOf).persist()
    try {
      // get-or-create per dimension, against persisted state (J-3, set-based)
      def upsertDim(path: String, incoming: DataFrame): DataFrame = {
        // two-phase write: the updated dim depends on the existing files, so
        // materialize to a staging dir first, then swap in. Hadoop FS ops
        // report failure via return value, not exceptions — check them. The
        // swap order is crash-safe: the old table is moved ASIDE (not
        // deleted) before the staged one moves in, so at no point is the
        // dimension absent-with-no-recovery; a crash mid-swap leaves either
        // the old table or both old+staging on disk, never neither — and the
        // recovery rename below completes an interrupted swap on the next
        // run BEFORE reading existing ids (otherwise a post-crash run would
        // see an empty dim, renumber ids from 1, and orphan appended facts).
        val staging = new org.apache.hadoop.fs.Path(path + "__staging")
        val target = new org.apache.hadoop.fs.Path(path)
        val old = new org.apache.hadoop.fs.Path(path + "__old")
        val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(target) && fs.exists(old) && !fs.rename(old, target))
          throw new java.io.IOException(s"failed to restore $old after interrupted swap")
        val existing = readOrEmpty(spark, path, dimSchema)
        val updated = Dims.getOrCreate(existing, incoming, "nome")
        updated.write.mode(SaveMode.Overwrite).parquet(staging.toString)
        if (fs.exists(old) && !fs.delete(old, true))
          throw new java.io.IOException(s"failed to clear previous $old")
        if (fs.exists(target) && !fs.rename(target, old))
          throw new java.io.IOException(s"failed to move old dim aside at $target")
        if (!fs.rename(staging, target))
          throw new java.io.IOException(s"failed to swap staged dim into $target")
        fs.delete(old, true) // best-effort cleanup; stale __old is recovered next run
        spark.read.schema(dimSchema).parquet(path)
      }

      val pais = upsertDim(paths.pais, batch.select(col("pais").as("nome")))
      val setor = upsertDim(paths.setor, batch.select(col("setor").as("nome")))

      // FK-resolve + append facts (S-3 batch append, not per-row commits).
      // data_coleta stamps each fact row with the collection time (F-6,
      // main.py:44 `default=datetime.utcnow`); tests pass a frozen literal
      // for determinism, the operational default is current_timestamp().
      // Schema note: fact dirs written before data_coleta existed hold
      // mixed-schema files after this append; the count read below uses
      // mergeSchema so the union schema is authoritative regardless of
      // which footer Spark samples — external readers of a mixed dir
      // should do the same (or run a one-time backfill rewrite).
      batch
        .join(broadcast(pais.withColumnRenamed("id", "pais_id")), col("pais") === pais("nome"))
        .join(broadcast(setor.withColumnRenamed("id", "setor_id")), col("setor") === setor("nome"))
        .select(
          batch("nome"), col("pais_id"), col("setor_id"),
          col("valor_atual"), col("maxima"), col("minima"), col("variacao"))
        .withColumn("data_coleta", collectedAt.cast("timestamp"))
        .write.mode(SaveMode.Append).parquet(paths.fato)

      (pais.count(), setor.count(),
        spark.read.option("mergeSchema", "true").parquet(paths.fato).count())
    } finally batch.unpersist()
  }
}
