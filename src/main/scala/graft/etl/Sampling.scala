package graft.etl

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting — the assignment operators a
  * training-data pipeline runs before anything else (held-out eval splits,
  * per-class subsamples, debug slices). Everything here is HASH-determined,
  * never RNG-determined: `df.sample()`/`rand()` give a different subset per
  * run, per partitioning, and per Spark version, which silently breaks
  * train/test hygiene (yesterday's test row is today's training row). A
  * hash of a stable key gives the same verdict for the same row on any
  * cluster, any day, any engine — and because md5 is bit-identical across
  * Spark and DuckDB, every operator here is oracle-hash-checkable.
  *
  * Scale posture: both operators are one codegen'd projection (split) or
  * one window shuffle on the group key (sample); no RNG state, no driver
  * participation, no extra scan. The per-group top-k sample plans through
  * `WindowGroupLimit` (PLANS.md §10): each map task keeps ≤ k rows per
  * group before the exchange.
  */
object Sampling {

  /** Hash bucket in [0, 256) as the first two hex chars of md5(key).
    * Fixed-width lowercase hex compares identically as a STRING in every
    * engine, so the split predicate needs no hex-to-int parsing anywhere —
    * the same `< 'cc'` comparison runs in Spark and DuckDB byte-for-byte.
    */
  private def bucketHex(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  // bucket 256 (a cumulative fraction of exactly 100%) must compare ABOVE
  // every 2-hex-char bucket — f"%02x" would yield the 3-char "100", which
  // sorts BELOW "c0" lexicographically and silently collapses the range
  private def boundHex(bucket: Int): String = if (bucket >= 256) "g" else f"$bucket%02x"

  /** Deterministic train/val/test assignment from a stable key: bucket =
    * first byte of md5(key), split by cumulative fraction boundaries
    * (granularity 1/256 ≈ 0.4 % — documented rounding, not hidden). Same
    * row → same split, forever, on every engine.
    */
  def splitColumn(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(
      trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split: trainPct=$trainPct valPct=$valPct (need >=0 and sum <=100)")
    val trainBound = boundHex((256 * trainPct) / 100)
    val valBound = boundHex((256 * trainPct) / 100 + (256 * valPct) / 100)
    val b = bucketHex(key)
    when(b < trainBound, "train").when(b < valBound, "val").otherwise("test")
  }

  /** The hex bucket boundaries [[splitColumn]] compares against, public so
    * oracle-SQL generators elsewhere can inline the byte-identical CASE
    * (one formula, no drift between the Spark and SQL sides).
    */
  def splitBoundsHex(trainPct: Int = 80, valPct: Int = 10): (String, String) =
    (boundHex((256 * trainPct) / 100),
      boundHex((256 * trainPct) / 100 + (256 * valPct) / 100))

  /** Split-assignment audit over orders: rows and exact fraction per split
    * — the query a pipeline runs to prove split hygiene before training.
    */
  def splitCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(splitColumn(col("o_orderkey")).as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n"))
      .withColumn(
        "pct",
        round(col("n").cast("double") / sum(col("n")).over(Window.partitionBy()).cast("double"), 6))
      .orderBy("split")

  val splitCountsSql: String = {
    val trainBound = boundHex((256 * 80) / 100)
    val valBound = boundHex((256 * 80) / 100 + (256 * 10) / 100)
    s"""WITH s AS (
       |  SELECT CASE WHEN b < '$trainBound' THEN 'train'
       |              WHEN b < '$valBound' THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM (SELECT substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS b FROM orders))
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
       |       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS pct
       |FROM s GROUP BY split ORDER BY split""".stripMargin
  }

  /** Deterministic per-group k-sample: bottom-k by md5(key) within each
    * group — hash order is uniform over the keys, so this IS a uniform
    * sample, but a reproducible one (the anti-`rand()` property above).
    * Plans as Window + WindowGroupLimit: ≤ k rows per group cross the
    * exchange.
    */
  def sampledPerGroup(df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("sample_rank", row_number().over(w)).where(col("sample_rank") <= k)
  }

  /** 5 deterministic customers per market segment. */
  def samplePerSegment(spark: SparkSession, sfDir: String): DataFrame =
    sampledPerGroup(Tables.customer(spark, sfDir), "c_mktsegment", "c_custkey", 5)
      .select(col("c_mktsegment"), col("sample_rank"), col("c_custkey"))
      .orderBy("c_mktsegment", "sample_rank")

  val samplePerSegmentSql: String =
    """SELECT c_mktsegment, sample_rank, c_custkey FROM (
      |  SELECT c_mktsegment, c_custkey,
      |         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS sample_rank
      |  FROM customer)
      |WHERE sample_rank <= 5
      |ORDER BY c_mktsegment, sample_rank""".stripMargin

  /** Data-mixture sampling — the mixing step of every pretraining corpus
    * build: given per-source target weights, downsample each source so the
    * output hits the target TOKEN proportions, bounded by the scarcest
    * source (no source oversamples: rate ≤ 1). The whole derivation is
    * integer-exact rational arithmetic, so the selection is
    * hash-reproducible on any engine:
    *
    *   T_s = tokens in source s;  w_s = weight;  W = Σ w_s
    *   O   = min_s floor(T_s·W / w_s)        (achievable output scale)
    *   keep doc d of source s  iff  b16(d)·W·T_s < O·w_s·65536
    *
    * where b16 is the first-4-hex-chars md5 bucket of doc_id (16-bit, the
    * same hash-not-RNG rule as [[splitColumn]]). The keep-rule is one
    * DECIMAL comparison per row — no RNG, no driver round-trip; the
    * per-source aggregates are 20 rows broadcast back onto the scan. The
    * comparison operands are cast to bounded DECIMALs (b16 < 2^16 is 5
    * digits, bigw ≤ ~60 is 2, T_s gets 22 digits ≈ 10^22 tokens — far
    * past any corpus), so the products stay ≤ 34 digits inside
    * DECIMAL(38,0) arithmetic in BOTH engines and the selection is exact
    * at any scale — int64 operands would wrap silently once per-source
    * tokens pass ~2.3e12. Weights here derive from the source name
    * (1 + suffix mod 3) so the check exercises unequal targets without a
    * config table.
    *
    * Output: per-source audit (weight, tokens in, docs/tokens kept) — the
    * achieved-vs-target report a mixture run is judged by.
    */
  def dataMixture(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      // fused digest-byte read (graft.functions.GraftMd5Top) — bit-identical
      // to conv(substring(md5(...),1,4),16,10); the DuckDB twin keeps the
      // hex spelling
      graft.functions.GraftMd5.top(col("doc_id").cast("string"), 4).as("b16"))
    val per = docs.groupBy("source")
      .agg(sum(col("n_tokens")).as("t"))
      .withColumn("w", regexp_extract(col("source"), "(\\d+)$", 1).cast("long") % 3 + 1)
    val tot = per.agg(sum(col("w")).as("bigw"))
    val osc = per.crossJoin(broadcast(tot))
      .agg(min(expr("t * bigw div w")).as("o_scaled"))
    val rates = per.crossJoin(broadcast(tot)).crossJoin(broadcast(osc))
    val kept = docs
      .join(broadcast(rates), "source")
      .where(
        col("b16").cast("decimal(6,0)") * col("bigw").cast("decimal(4,0)")
          * col("t").cast("decimal(22,0)") <
          col("o_scaled").cast("decimal(26,0)") * col("w").cast("decimal(2,0)")
            * lit(65536L).cast("decimal(6,0)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs_kept"), sum(col("n_tokens")).as("n_tokens_kept"))
    rates.select(col("source"), col("w"), col("t").as("n_tokens_in"))
      .join(kept, Seq("source"), "left")
      .select(
        col("source"), col("w"), col("n_tokens_in"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"))
      .orderBy("source")
  }

  val dataMixtureSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS b16
      |  FROM documents),
      |per AS (
      |  SELECT source, SUM(n_tokens)::BIGINT AS t,
      |         (CAST(regexp_extract(source, '(\d+)$', 1) AS BIGINT) % 3 + 1) AS w
      |  FROM d GROUP BY source),
      |tot AS (SELECT SUM(w)::BIGINT AS bigw FROM per),
      |osc AS (SELECT MIN(t * bigw // w)::BIGINT AS o_scaled FROM per, tot),
      |kept AS (
      |  SELECT d.source, COUNT(*)::BIGINT AS n_docs_kept,
      |         SUM(d.n_tokens)::BIGINT AS n_tokens_kept
      |  FROM d JOIN per USING (source), tot, osc
      |  WHERE d.b16::DECIMAL(6,0) * tot.bigw::DECIMAL(4,0) * per.t::DECIMAL(22,0)
      |        < osc.o_scaled::DECIMAL(26,0) * per.w::DECIMAL(2,0) * 65536::DECIMAL(6,0)
      |  GROUP BY d.source)
      |SELECT per.source, per.w, per.t AS n_tokens_in,
      |       COALESCE(kept.n_docs_kept, 0)::BIGINT AS n_docs_kept,
      |       COALESCE(kept.n_tokens_kept, 0)::BIGINT AS n_tokens_kept
      |FROM per LEFT JOIN kept USING (source)
      |ORDER BY per.source""".stripMargin

  /** TEMPERATURE-flattened mixture (α = 0.5, the Llama-style `T^α`
    * source re-weighting): sampling mass ∝ T_s^α means per-doc keep rate
    * ∝ T_s^(α−1) = 1/√T_s — big sources are downsampled hard, scarce
    * sources kept whole. Anchoring the rate at the SCARCEST source
    * (rate_s = √(T_min/T_s) ≤ 1, no oversampling) removes every
    * cross-source FLOAT aggregate from the derivation: T_min is an
    * integer MIN, and each source's threshold is one division + one
    * `sqrt` + one multiply on identical operands in identical order —
    * IEEE-exact cross-engine per the repo float rules, so the kept SET
    * (not just its size) sits under the hash gate with no rounding
    * boundary anywhere (the b16-vs-threshold compare is between
    * bit-identical doubles). Keep rule: b16(doc) < √(T_min/T_s)·65536,
    * b16 the 16-bit md5 bucket — deterministic, no RNG state, same
    * hash-not-RNG rule as every sampler here.
    */
  def mixtureTemperature(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      // fused digest-byte read (graft.functions.GraftMd5Top) — bit-identical
      // to conv(substring(md5(...),1,4),16,10); the DuckDB twin keeps the
      // hex spelling
      graft.functions.GraftMd5.top(col("doc_id").cast("string"), 4).as("b16"))
    val per = docs.groupBy("source").agg(sum(col("n_tokens")).as("t"))
    val tmin = per.agg(min(col("t")).as("tmin"))
    val rates = per.crossJoin(broadcast(tmin))
      .withColumn("thr",
        sqrt(col("tmin").cast("double") / col("t").cast("double")) * lit(65536.0))
    val kept = docs
      .join(broadcast(rates.select(col("source"), col("thr"))), "source")
      .where(col("b16").cast("double") < col("thr"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("n_tokens_kept"),
        expr("bit_xor(doc_id)").as("xor_kept"))
    rates
      .select(
        col("source"), col("t").as("n_tokens_in"),
        round(sqrt(col("tmin").cast("double") / col("t").cast("double")), 6).as("rate"))
      .join(kept, Seq("source"), "left")
      .select(
        col("source"), col("n_tokens_in"), col("rate"),
        coalesce(col("n_docs_kept"), lit(0L)).as("n_docs_kept"),
        coalesce(col("n_tokens_kept"), lit(0L)).as("n_tokens_kept"),
        col("xor_kept"))
      .orderBy("source")
  }

  val mixtureTemperatureSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS b16
      |  FROM documents),
      |per AS (SELECT source, SUM(n_tokens)::BIGINT AS t FROM d GROUP BY source),
      |tm AS (SELECT MIN(t)::BIGINT AS tmin FROM per),
      |rates AS (
      |  SELECT source, t,
      |         sqrt(CAST(tmin AS DOUBLE) / CAST(t AS DOUBLE)) * 65536.0 AS thr,
      |         ROUND(sqrt(CAST(tmin AS DOUBLE) / CAST(t AS DOUBLE)), 6) AS rate
      |  FROM per, tm),
      |kept AS (
      |  SELECT d.source, COUNT(*)::BIGINT AS n_docs_kept,
      |         SUM(d.n_tokens)::BIGINT AS n_tokens_kept,
      |         bit_xor(d.doc_id) AS xor_kept
      |  FROM d JOIN rates USING (source)
      |  WHERE CAST(d.b16 AS DOUBLE) < rates.thr
      |  GROUP BY d.source)
      |SELECT rates.source, rates.t AS n_tokens_in, rates.rate,
      |       COALESCE(kept.n_docs_kept, 0)::BIGINT AS n_docs_kept,
      |       COALESCE(kept.n_tokens_kept, 0)::BIGINT AS n_tokens_kept,
      |       kept.xor_kept
      |FROM rates LEFT JOIN kept USING (source)
      |ORDER BY rates.source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_split_counts" -> (splitCounts _),
    "t_sample_per_group" -> (samplePerSegment _),
    "t_data_mixture" -> (dataMixture _),
    "t_mixture_temperature" -> (mixtureTemperature _))

  val oracle: Map[String, String] = Map(
    "t_split_counts" -> splitCountsSql,
    "t_sample_per_group" -> samplePerSegmentSql,
    "t_data_mixture" -> dataMixtureSql,
    "t_mixture_temperature" -> mixtureTemperatureSql)
}
