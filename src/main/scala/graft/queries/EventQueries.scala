package graft.queries

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators: JSON/semi-structured extraction, batch event-time
  * windows (SURVEY.md X-7), sessionization via `lag`, and exact/approx
  * distinct (X-8). Batch shapes here mirror the Structured Streaming
  * equivalents in [[graft.streaming.EventStreaming]] — same groupBy(window)
  * plan, so semantics are oracle-checked in batch and reused in streaming.
  */
object EventQueries {

  /** Extract the numeric `k` from the `props` JSON string. Uses a codegen'd
    * `regexp_extract` (no UDF); at scale this stays inside whole-stage
    * codegen on the scan projection. (`from_json` works too; regex keeps the
    * oracle byte-identical.)
    */
  private def kCol: org.apache.spark.sql.Column = {
    val s = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
    when(s === "", lit(null)).otherwise(s).cast("int")
  }

  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", kCol)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        (sum(col("k")).cast("double") / count(col("k")).cast("double")).as("avg_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS INT) AS k
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(k) AS BIGINT) AS sum_k,
      |       CAST(SUM(k) AS DOUBLE) / CAST(COUNT(k) AS DOUBLE) AS avg_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** X-7: tumbling event-time window aggregation (batch). `window()` aligns
    * to the epoch exactly like DuckDB's `time_bucket`. At scale: one shuffle
    * on (window), partial aggregation map-side; streaming adds a watermark
    * (see EventStreaming.windowedCounts — same logical shape).
    */
  def hourlyWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("n_events"), col("sum_value"))
      .orderBy("hour_start")

  val hourlyWindowsSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1 ORDER BY hour_start""".stripMargin

  /** X-7: SLIDING (hopping) event-time windows — 1-hour windows advancing
    * every 15 minutes, so each event lands in exactly 4 overlapping
    * windows (60/15). `window(ts, len, slide)` expands the event to its
    * window set ON THE SCAN (a generated-column explode, no join), then
    * aggregates — one shuffle on window start, partial agg map-side, same
    * plan family as the tumbling query. The overlap factor multiplies
    * shuffled rows by len/slide (4× here): at 100 TB that constant is the
    * cost knob a pipeline owner tunes via the slide, and it is visible in
    * this plan rather than hidden in a per-event UDF loop. Oracle: DuckDB
    * has no hopping bucket, so the window set is re-derived as
    * `time_bucket(15 min, ts) - j*15min` for j=0..3 via a 4-row cross
    * join — every window start within (ts - 1 hour, ts].
    */
  def slidingWindows(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("n_events"), col("n_users"), col("sum_value"))
      .orderBy("win_start")

  val slidingWindowsSql: String =
    """WITH ev AS (
      |  SELECT time_bucket(INTERVAL '15 minutes', ts)
      |           - j.k * INTERVAL '15 minutes' AS win_start,
      |         user_id, value
      |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS j(k))
      |SELECT win_start,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM ev GROUP BY 1 ORDER BY win_start""".stripMargin

  /** X-7b: sessionization — 30-minute inactivity gap starts a new session.
    * `lag` over (user_id, ts) with an event_id tiebreaker for determinism;
    * one shuffle on user_id. Timestamp comparison is exact (µs), identical
    * in both engines — no epoch-seconds truncation.
    */
  def sessionCounts(spark: SparkSession, sfDir: String): DataFrame =
    sessionCountsOf(Tables.events(spark, sfDir))

  /** Per-user (n_events, n_sessions) over an arbitrary events frame — the
    * batch sessionization body, shared with the streaming parity query.
    */
  def sessionCountsOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("new_session")).as("n_sessions"))
      .orderBy("user_id")
  }

  val sessionCountsSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |                OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                       + INTERVAL '30 minutes'
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(new_session) AS BIGINT) AS n_sessions
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** X-8 (exact side): per-type exact distinct users — the oracle-checkable
    * variant. The approx twin below trades exactness for mergeable HLL
    * sketches, the right call at 100 TB.
    */
  def distinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val distinctUsersSql: String =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** X-8 (approx side): DETERMINISTIC approx distinct via a KMV
    * (bottom-k / k-minimum-values) sketch — the round-18 upgrade from
    * `approx_count_distinct`'s opaque HLL to a sketch the DuckDB oracle
    * re-derives bit-for-bit (the treatment `x5_approx_top_words` got in
    * round 17). Values hash through the pinned md5-60 family
    * ([[graft.text.TextOps.md5Hash60]]); per group the k = 256 SMALLEST
    * distinct hashes are kept and the estimate is the classic KMV
    * (k − 1) / F(h_k) with F the fraction of the 2⁶⁰ hash space below the
    * k-th minimum — i.e. (k − 1) · 2⁶⁰ / h_k. A group with fewer than k
    * distinct hashes is exact by construction. `n_exact` rides along so
    * the estimate's error is itself under the hash gate.
    *
    * Scale shape: the `row_number ≤ k` rank filter compiles to
    * WindowGroupLimit — per-partition bottom-k heaps BEFORE the single
    * group-key exchange — so executor memory is O(k · groups/partition)
    * and the shuffle carries ≤ k rows per group regardless of corpus
    * size; the sketch is mergeable (union of bottom-k sets, re-cut at k),
    * which is what makes it a sketch and not a sort.
    */
  def approxDistinctUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val K = 256
    val h = Tables.events(spark, sfDir)
      .select(col("event_type"),
        graft.text.TextOps.md5Hash60(col("user_id").cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    h.withColumn("rk", row_number().over(w)).where(col("rk") <= K)
      .groupBy("event_type")
      .agg(count(lit(1)).as("d"),
        max(when(col("rk") === K, col("h"))).as("hk"))
      .join(Tables.events(spark, sfDir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact")), "event_type")
      .select(
        col("event_type"),
        when(col("d") < K, col("d").cast("double"))
          .otherwise(round(
            lit((K - 1).toDouble) * lit(math.pow(2.0, 60)) / col("hk").cast("double"), 4))
          .as("n_users_kmv"),
        col("n_exact"))
      .orderBy("event_type")
  }

  /** DuckDB re-derivation of the KMV estimate: same md5-60 family, same
    * bottom-256 cut, same (k−1)·2⁶⁰/h_k arithmetic (2⁶⁰ and 255·2⁶⁰ are
    * exactly representable doubles; the division is one IEEE op in both
    * engines), same exact-below-k short-circuit.
    */
  val approxDistinctUsersSql: String =
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |r AS (
      |  SELECT event_type, h,
      |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      |  FROM h),
      |s AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
      |         MAX(CASE WHEN rk = 256 THEN h END) AS hk
      |  FROM r WHERE rk <= 256 GROUP BY event_type),
      |x AS (
      |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      |  FROM events GROUP BY event_type)
      |SELECT s.event_type,
      |       CASE WHEN d < 256 THEN CAST(d AS DOUBLE)
      |            ELSE ROUND(255.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE), 4)
      |       END AS n_users_kmv,
      |       x.n_exact
      |FROM s JOIN x USING (event_type) ORDER BY event_type""".stripMargin

  /** Telemetry anomaly gate — per-type 3σ outlier counts from
    * decimal-EXACT moments (the [[graft.queries.RelQueries.statsAgg]]
    * discipline: Σx and Σx² as DECIMAL sums cast to double at the end,
    * so mean/σ are reproducible at any partitioning). Two passes: a
    * 5-row stats aggregate broadcast back onto the scan, then a
    * conditional count — the shape that flags sensor glitches before
    * they poison downstream aggregates. The z-comparison operands
    * (raw double value, derived mean/σ) are identical expressions in
    * both engines, so the boundary is exact.
    */
  def anomalyZscore(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val x = col("value").cast("decimal(18,2)")
    val nD = col("n").cast("double")
    val stats = ev.groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(x * x).cast("double").as("sx2"))
      .select(
        col("event_type"), col("n"),
        (col("sx") / nD).as("mean"),
        sqrt((col("sx2") - col("sx") * col("sx") / nD) / nD).as("std"))
    ev.join(broadcast(stats), "event_type")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(abs(col("value") - col("mean")) > lit(3.0) * col("std"), 1L).otherwise(0L))
          .as("n_outliers"),
        round(min(col("mean")), 6).as("mean_value"),
        round(min(col("std")), 6).as("std_value"))
      .orderBy("event_type")
  }

  val anomalyZscoreSql: String =
    """WITH s AS (
      |  SELECT event_type, COUNT(*)::BIGINT AS n,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2
      |  FROM events GROUP BY event_type),
      |st AS (
      |  SELECT event_type, n,
      |         sx / CAST(n AS DOUBLE) AS mean,
      |         sqrt((sx2 - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS std
      |  FROM s)
      |SELECT e.event_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CASE WHEN abs(e.value - st.mean) > 3.0 * st.std THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |       ROUND(MIN(st.mean), 6) AS mean_value,
      |       ROUND(MIN(st.std), 6) AS std_value
      |FROM events e JOIN st USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin

  /** Schema-declared JSON parsing — `from_json` with an explicit struct
    * schema (the production path for semi-structured columns; unlike the
    * regex variant it extends to nested fields and arrays). Null-safe:
    * malformed JSON yields NULL k, counted separately.
    */
  def jsonSchema(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("parsed", from_json(col("props"), lit("k INT")))
      .groupBy("event_type")
      .agg(
        count(col("parsed.k")).as("n_with_k"),
        sum(when(col("parsed.k").isNull, 1).otherwise(0)).as("n_null_k"),
        max(col("parsed.k")).as("max_k"),
        min(col("parsed.k")).as("min_k"))
      .orderBy("event_type")

  val jsonSchemaSql: String =
    """SELECT event_type,
      |  CAST(COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_with_k,
      |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact percentiles per type — Spark's `percentile` and DuckDB's
    * `quantile_cont` share the same linear-interpolation definition;
    * round(6) absorbs the final-ulp difference. The 100 TB variant is
    * `approx_percentile` (t-digest sketches, mergeable); exact is the
    * oracle-checkable twin.
    */
  def percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy("event_type")

  val percentilesSql: String =
    """SELECT event_type,
      |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(value, 0.9), 6) AS p90,
      |  ROUND(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sketch twin of [[percentiles]] — round-18 upgrade from
    * `approx_percentile`'s randomized t-digest to DETERMINISTIC
    * hash-sampled order statistics, fully re-derivable in SQL (the same
    * KMV treatment as [[approxDistinctUsers]]): per event type, the
    * k = 1024 rows whose md5-60 row-key hash is smallest form a uniform
    * (but pinned) sample, and each quantile is linearly interpolated
    * between the sample's order statistics at pos = (n−1)·q — exactly
    * `percentile`'s definition applied to the sample. A group with fewer
    * than k rows degenerates to the exact percentile by construction.
    *
    * Scale shape: the `row_number ≤ k` cut compiles to WindowGroupLimit
    * (per-partition bottom-k heaps before ONE exchange), the sample is
    * mergeable (union, re-cut at k), and the order statistics run over
    * ≤ k rows per group — bounded memory at any corpus size, no global
    * sort. The interpolation operands (sample values, (n−1)·q doubles)
    * are identical expressions in both engines → bit-identical under
    * round(6).
    */
  def approxPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val K = 1024
    // the sample cut is a row_number, so its ORDER BY must be a TOTAL
    // order: on the 60-bit hash alone, a duplicate event_id (or a hash
    // collision) makes the k-boundary pick engine-dependent and the two
    // sides could sample different rows (advice fix) — event_id then
    // value break every tie deterministically in BOTH engines (rows
    // still tied agree on value, so the selection is immaterial)
    val wH = Window.partitionBy("event_type")
      .orderBy(col("h"), col("event_id"), col("value"))
    val sample = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"), col("event_id"),
        graft.text.TextOps.md5Hash60(col("event_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(wH)).where(col("rk") <= K)
    val wV = Window.partitionBy("event_type").orderBy("value")
    val ranked = sample
      .withColumn("rn", row_number().over(wV))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
    def ordStats(q: Double, tag: String): Seq[Column] = {
      val pos = (col("n") - 1L).cast("double") * lit(q)
      val lo = floor(pos).cast("long")
      Seq(
        max(when(col("rn") === lo + 1L, col("value"))).as(s"_lo_$tag"),
        max(when(col("rn") === lo + 2L, col("value"))).as(s"_hi_$tag"))
    }
    val qs = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val aggCols = qs.flatMap { case (q, t) => ordStats(q, t) } :+ max(col("n")).as("n_sample")
    def interp(q: Double, tag: String): Column = {
      val pos = (col("n_sample") - 1L).cast("double") * lit(q)
      val frac = pos - floor(pos)
      round(col(s"_lo_$tag") +
        frac * (coalesce(col(s"_hi_$tag"), col(s"_lo_$tag")) - col(s"_lo_$tag")), 6)
        .as(s"${tag}_kmv")
    }
    ranked.groupBy("event_type")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("event_type") +: qs.map { case (q, t) => interp(q, t) } :+ col("n_sample"): _*)
      .orderBy("event_type")
  }

  /** DuckDB re-derivation: same pinned sample (bottom-1024 by md5-60 of
    * event_id), same order statistics, same (n−1)·q interpolation.
    */
  val approxPercentilesSql: String =
    """WITH s AS (
      |  SELECT event_type, value,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT,
      |                    event_id, value) AS rk
      |  FROM events),
      |k AS (SELECT event_type, value FROM s WHERE rk <= 1024),
      |r AS (
      |  SELECT event_type, value,
      |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
      |         COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM k),
      |a AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN value END) AS lo50,
      |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 2 THEN value END) AS hi50,
      |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 THEN value END) AS lo90,
      |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 2 THEN value END) AS hi90,
      |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 THEN value END) AS lo99,
      |    MAX(CASE WHEN rn = CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 2 THEN value END) AS hi99,
      |    CAST(MAX(n) AS BIGINT) AS n_sample
      |  FROM r GROUP BY event_type)
      |SELECT event_type,
      |  ROUND(lo50 + (CAST(n_sample - 1 AS DOUBLE) * 0.5
      |    - FLOOR(CAST(n_sample - 1 AS DOUBLE) * 0.5)) * (COALESCE(hi50, lo50) - lo50), 6) AS p50_kmv,
      |  ROUND(lo90 + (CAST(n_sample - 1 AS DOUBLE) * 0.9
      |    - FLOOR(CAST(n_sample - 1 AS DOUBLE) * 0.9)) * (COALESCE(hi90, lo90) - lo90), 6) AS p90_kmv,
      |  ROUND(lo99 + (CAST(n_sample - 1 AS DOUBLE) * 0.99
      |    - FLOOR(CAST(n_sample - 1 AS DOUBLE) * 0.99)) * (COALESCE(hi99, lo99) - lo99), 6) AS p99_kmv,
      |  n_sample
      |FROM a ORDER BY event_type""".stripMargin

  /** Time-series gap fill + last-observation-carried-forward: the resample
    * operator metric/feature pipelines need (sparse event stream → dense
    * hourly series per key). An hourly spine (distinct users × the global
    * hour range — both sides derived IN-plan: the range is a broadcast
    * 1-row aggregate, the user list a distinct over the capped slice;
    * nothing reaches the driver) left-joins the observed hourly aggregates;
    * missing hours surface as n_events = 0 and a NULL sum, and `filled`
    * carries the last observed (rounded) sum forward per user via
    * `last(ignoreNulls)` over an unbounded-preceding row frame — one
    * shuffle on user_id, linear per partition, the same running-window
    * shape as the as-of join. Hours before a user's first observation stay
    * NULL (nothing to carry), exactly as in the oracle's
    * `last_value IGNORE NULLS`.
    *
    * At 100 TB the spine explode is |keys| × |buckets| rows of three
    * columns — partition by key so the window never re-shuffles, and bound
    * the bucket range per key (a per-key min/max join) if global range ×
    * sparse keys would dominate; here the global range is the honest shape
    * (every user spans the month).
    */
  def gapFillLocf(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id") < 5)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"), col("value"))
    val hourly = ev
      .groupBy("user_id", "hour")
      .agg(
        count(lit(1)).as("n_obs"),
        round(sum(col("value").cast("decimal(38,18)")).cast("double"), 6).as("sv"))
    val range = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val spine = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(range))
      .select(
        col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(hourly, Seq("user_id", "hour"), "left")
      .select(
        col("user_id"), col("hour"),
        coalesce(col("n_obs"), lit(0L)).as("n_events"),
        last(col("sv"), ignoreNulls = true).over(w).as("filled"))
      .orderBy("user_id", "hour")
  }

  val gapFillLocfSql: String =
    """WITH ev AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, value
      |  FROM events WHERE user_id < 5),
      |hourly AS (
      |  SELECT user_id, hour, CAST(COUNT(*) AS BIGINT) AS n_obs,
      |         ROUND(CAST(SUM(CAST(value AS DECIMAL(38,18))) AS DOUBLE), 6) AS sv
      |  FROM ev GROUP BY user_id, hour),
      |r AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1 FROM ev),
      |spine AS (
      |  SELECT u.user_id, unnest(generate_series(r.h0, r.h1, INTERVAL 1 HOUR)) AS hour
      |  FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN r)
      |SELECT s.user_id, s.hour,
      |       COALESCE(h.n_obs, 0) AS n_events,
      |       last_value(h.sv IGNORE NULLS) OVER (
      |         PARTITION BY s.user_id ORDER BY s.hour
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM spine s LEFT JOIN hourly h USING (user_id, hour)
      |ORDER BY user_id, hour""".stripMargin

  /** Ordered conversion funnel view → click → purchase: a user advances a
    * stage only with an event STRICTLY AFTER their first qualifying event
    * of the previous stage ("click after first view"). The stage time is
    * min(ts | stage ∧ ts > prev) — and since the earliest previous-stage
    * time bounds all others, one whole-partition min per stage suffices:
    * three CHAINED window mins on the same user_id partitioning = ONE
    * shuffle total (Spark chains same-key Window operators without
    * re-exchanging), then a 1-row conditional count. No self-joins, no
    * per-user sequence materialization — the shape that funnels a 100 TB
    * event log.
    */
  def funnelStages(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val tsc = col("ts")
    Tables.events(spark, sfDir)
      .select(col("user_id"), tsc, col("event_type"))
      .withColumn("tv", min(when(col("event_type") === "view", tsc)).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" && tsc > col("tv"), tsc)).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" && tsc > col("tc"), tsc)).over(w))
      .agg(
        countDistinct(when(col("tv").isNotNull, col("user_id"))).as("n_view"),
        countDistinct(when(col("tc").isNotNull, col("user_id"))).as("n_view_click"),
        countDistinct(when(col("tp").isNotNull, col("user_id"))).as("n_full_funnel"))
  }

  val funnelStagesSql: String =
    """WITH w1 AS (
      |  SELECT user_id, ts, event_type,
      |         MIN(CASE WHEN event_type = 'view' THEN ts END)
      |           OVER (PARTITION BY user_id) AS tv
      |  FROM events),
      |w2 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > tv THEN ts END)
      |              OVER (PARTITION BY user_id) AS tc
      |  FROM w1),
      |w3 AS (
      |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > tc THEN ts END)
      |              OVER (PARTITION BY user_id) AS tp
      |  FROM w2)
      |SELECT CAST(COUNT(DISTINCT CASE WHEN tv IS NOT NULL THEN user_id END) AS BIGINT) AS n_view,
      |       CAST(COUNT(DISTINCT CASE WHEN tc IS NOT NULL THEN user_id END) AS BIGINT) AS n_view_click,
      |       CAST(COUNT(DISTINCT CASE WHEN tp IS NOT NULL THEN user_id END) AS BIGINT) AS n_full_funnel
      |FROM w3""".stripMargin

  /** SCD2 change-history collapse — the warehouse-side twin of the
    * reference's get-or-create dimension handling: where get-or-create
    * keeps ONE row per key, type-2 history keeps one row per (key, value
    * epoch) with validity bounds, which is how a dimension that changes
    * over time is loaded at scale (CDC stream → collapse consecutive
    * duplicates → version + valid_from/valid_to).
    *
    * Shape: change detection is lag() over (user_id | ts, event_id) — the
    * event_id tiebreak makes the order total, so version numbering is
    * deterministic; version = running sum of change flags on the SAME
    * window partitioning, so Spark chains the two Window operators over one
    * shuffle; the collapse is a (user_id, version)-keyed aggregate and
    * valid_to is a lead() on the already-collapsed (small) history. One
    * exchange of the event slice, one of the collapsed history — nothing
    * all-pairs, nothing driver-side. The user_id < 100 slice bounds the
    * checked output; the operator itself is slice-free.
    */
  def scd2HistoryOf(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val collapsed = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(wOrd))
      .withColumn("chg", when(col("prev").isNull || col("prev") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wOrd))
      .groupBy(col("user_id"), col("version"))
      .agg(
        min(col("event_type")).as("state"), // constant within the version
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    collapsed
      .withColumn(
        "valid_to",
        lead(col("valid_from"), 1).over(Window.partitionBy("user_id").orderBy("version")))
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy("user_id", "version")
  }

  def scd2History(spark: SparkSession, sfDir: String): DataFrame =
    scd2HistoryOf(Tables.events(spark, sfDir).where(col("user_id") < 100))

  val scd2HistorySql: String =
    """WITH src AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events WHERE user_id < 100),
      |flagged AS (
      |  SELECT *, CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END AS chg
      |  FROM src),
      |versioned AS (
      |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
      |  FROM flagged),
      |collapsed AS (
      |  SELECT user_id, CAST(version AS BIGINT) AS version,
      |         MIN(event_type) AS state,
      |         MIN(ts) AS valid_from,
      |         CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM versioned GROUP BY user_id, version)
      |SELECT user_id, version, state, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
      |       n_events
      |FROM collapsed ORDER BY user_id, version""".stripMargin

  /** Cohort retention — the product-analytics staple: bucket every user by
    * first-seen day, then count distinct users active k weeks after their
    * cohort date. Two hash aggregates (first-seen per user, then distinct
    * users per (cohort, offset)) joined on user_id; all outputs exact
    * integers/dates, so fully hash-checked. Scale posture: both aggregates
    * and the join shuffle on user_id — AQE coalesces the second stage; the
    * (cohort, offset) matrix is days×weeks tiny regardless of corpus size.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val cohorts = e.groupBy("user_id").agg(min(col("d")).as("cohort_day"))
    e.join(cohorts, "user_id")
      .select(
        col("user_id"),
        col("cohort_day"),
        (datediff(col("d"), col("cohort_day")) / lit(7)).cast("long").as("week_offset"))
      .groupBy("cohort_day", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "week_offset")
  }

  val cohortRetentionSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
      |f AS (SELECT user_id, MIN(d) AS cohort_day FROM e GROUP BY user_id)
      |SELECT cohort_day,
      |       CAST((e.d - f.cohort_day) // 7 AS BIGINT) AS week_offset,
      |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM e JOIN f USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Event-sequence transition matrix (first-order Markov counts): for
    * every ordered pair of consecutive events per user — ts order,
    * event_id tiebreak, the sessionizer's total order — count transitions,
    * distinct users making them, and the row-normalized probability
    * P(to·from). The behavioral-analytics shape behind next-action
    * prediction features and anomaly screening (an unseen transition is
    * signal), and relationally a lag-window + two-level aggregate: the
    * (from, to, user) level makes the distinct-user count a plain COUNT
    * (no countDistinct), and the probability is one integer-exact window
    * sum over the ≤|types|² matrix — all shuffles keyed by user_id then by
    * the 8-byte-ish type pair. Scales: the lag window partitions by user
    * (bounded per-user history), the matrix itself is tiny at any corpus
    * size.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val t = Tables.events(spark, sfDir)
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
    t.groupBy(col("from_type"), col("event_type").as("to_type"), col("user_id"))
      .agg(count(lit(1)).as("n_u"))
      .groupBy("from_type", "to_type")
      .agg(
        sum("n_u").cast("bigint").as("n_transitions"),
        count(lit(1)).cast("bigint").as("n_users"))
      .withColumn(
        "p",
        round(
          col("n_transitions").cast("double") /
            sum(col("n_transitions")).over(Window.partitionBy("from_type")).cast("double"),
          6))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsSql: String =
    """WITH t AS (
      |  SELECT user_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
      |         event_type AS to_type
      |  FROM events),
      |l1 AS (
      |  SELECT from_type, to_type, user_id, COUNT(*) AS n_u
      |  FROM t WHERE from_type IS NOT NULL GROUP BY from_type, to_type, user_id),
      |l2 AS (
      |  SELECT from_type, to_type,
      |         CAST(SUM(n_u) AS BIGINT) AS n_transitions,
      |         CAST(COUNT(*) AS BIGINT) AS n_users
      |  FROM l1 GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n_transitions, n_users,
      |       ROUND(CAST(n_transitions AS DOUBLE)
      |             / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
      |FROM l2 ORDER BY from_type, to_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_event_transitions" -> (eventTransitions _),
    "q_retention" -> (cohortRetention _),
    "q_scd2_history" -> (scd2History _),
    "q_gapfill" -> (gapFillLocf _),
    "q_funnel_stages" -> (funnelStages _),
    "q_json_extract" -> (jsonExtract _),
    "q_json_schema" -> (jsonSchema _),
    "q_hourly_windows" -> (hourlyWindows _),
    "q_sliding_windows" -> (slidingWindows _),
    "q_session_counts" -> (sessionCounts _),
    "x8_distinct_users" -> (distinctUsers _),
    "q_anomaly_zscore" -> (anomalyZscore _),
    "x8_approx_distinct" -> (approxDistinctUsers _),
    "x9_percentiles" -> (percentiles _),
    "x9_approx_percentiles" -> (approxPercentiles _))

  val oracle: Map[String, String] = Map(
    "q_event_transitions" -> eventTransitionsSql,
    "q_retention" -> cohortRetentionSql,
    "q_scd2_history" -> scd2HistorySql,
    "q_gapfill" -> gapFillLocfSql,
    "q_funnel_stages" -> funnelStagesSql,
    "q_json_extract" -> jsonExtractSql,
    "q_json_schema" -> jsonSchemaSql,
    "q_hourly_windows" -> hourlyWindowsSql,
    "q_sliding_windows" -> slidingWindowsSql,
    "q_session_counts" -> sessionCountsSql,
    "x8_distinct_users" -> distinctUsersSql,
    "q_anomaly_zscore" -> anomalyZscoreSql,
    "x9_percentiles" -> percentilesSql,
    "x8_approx_distinct" -> approxDistinctUsersSql,
    "x9_approx_percentiles" -> approxPercentilesSql)
}
