package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** INCREMENTALLY-MAINTAINED MATERIALIZED VIEWS over a ShardSink table,
  * driven by the table's exact change feed — the Delta/Snowflake
  * "incremental MV refresh" shape (Delta documents the same recipe as a
  * hand-rolled CDF-apply loop; here it is a first-class primitive).
  *
  * An MV is `SELECT <group>, agg1, agg2, … FROM t GROUP BY <group>` for a
  * declared list of aggregates over integral expressions:
  * `count` / `sum(e)` / `bit_xor(e)` / `min(e)` / `max(e)`. `create`
  * computes it once with a FULL distributed scan pinned at the source's
  * current manifest version; every later `refresh` reads ONLY the change
  * feed of the commits since the last refresh — `(lastV, currentV]` via
  * the `changeFeedFrom`/`changeFeedTo` options — and folds the signed
  * delta into the stored state. Refresh cost is O(changed rows), never
  * O(table): at the 100 TB design point the nightly rollup of a landing
  * zone that appended 0.1% re-reads 0.1%.
  *
  * Incremental math, per group:
  *   - count:  n' = n + Σ sign        (sign = +1 insert/update_postimage,
  *                                            -1 delete/update_preimage)
  *   - sum:    s' = s + Σ sign·v      (nulls absent on both sides, exactly
  *                                     SQL's sum-ignores-null)
  *   - bit_xor: x' = x ⊕ xor(all change values) — xor is its own inverse,
  *             so inserts add and deletes retract with the SAME fold
  *   - min/max: inserts extend directly (min(state, posMin)); a DELETE of
  *             the current extreme is NOT invertible from the aggregate
  *             alone, so such groups go DIRTY and their extremes are
  *             recomputed by ONE pruned scan at the target version,
  *             filtered to the dirty groups (shard-clustered tables prune
  *             that scan to the dirty groups' files). An update whose
  *             pre- and post-image carry the same extreme value does NOT
  *             dirty the group (posMin ≤ negMin ⇒ the floor cannot rise).
  *
  * State is a versioned blob in the MV's own directory: `_mv.v<N>.json`,
  * flipped with the SAME fresh-name election the table's manifest commit
  * uses ([[SinkFs.moveFresh]]) — a crash mid-refresh leaves the previous
  * state intact and a lost race re-reads and retries (idempotent: the
  * delta is re-derived from the immutable commit log). State size is
  * O(|groups|) — the MV's own result cardinality, small by definition for
  * a reporting rollup; the per-refresh `collect()` is the same bounded
  * control-plane shape as the table's 1-row agg heads.
  *
  * Exactness inherits the change feed's contract: merge-on-read DML and
  * appends derive exactly from the manifest diff; copy-on-write DML needs
  * `cdf.enabled` on the table (a refresh over a non-derivable commit
  * fails loudly, never silently drifts). All aggregate expressions are
  * cast to BIGINT — integer math only, no float drift under the oracle's
  * hash gate.
  */
object SinkMatView {

  /** One declared aggregate: result column `name`, `kind` ∈
    * count|sum|xor|min|max, `e` a Spark-SQL expression over the table's
    * columns (ignored for count). Expressions must be deterministic and
    * integral-valued (they are cast to BIGINT).
    */
  final case class MvAgg(name: String, kind: String, e: String = "")

  final case class RefreshStats(
      fromV: Long, toV: Long, changeRows: Long, dirtyGroups: Long,
      mvVersion: Long, applied: Boolean)

  // "dsum" (round 18): an EXACT-DECIMAL sum over a fractional column —
  // per-row values cast to DECIMAL(24,6), partials held as DECIMAL(30,6)
  // so the incremental fold (including retractions) is exact arithmetic;
  // a double-typed partial would drift (a + b − b ≠ a in IEEE). Exposed
  // to readers as DOUBLE. Distributed ([[SinkMvDist]]) state only — the
  // blob MVs' Long-cell codec cannot hold it and rejects it at create.
  // "dmin"/"dmax"/"smin"/"smax" (round 19): TYPED extremes — min/max
  // over DOUBLE and STRING columns. Same net-grain fold and the same
  // clean-or-dirty decision table as the BIGINT extremes (comparisons,
  // not arithmetic — no precision caveat); only the value-grain cast and
  // the state cell type differ. Distributed state only, like dsum.
  private val Kinds =
    Set("count", "sum", "xor", "min", "max", "dsum", "dmin", "dmax", "smin", "smax")

  /** The kinds whose state cells outgrow the blob MVs' Long-cell codec —
    * distributed ([[SinkMvDist]]) state only.
    */
  private[sources] val DistOnlyKinds = Set("dsum", "dmin", "dmax", "smin", "smax")
  private[sources] def isExtremeKind(k: String): Boolean =
    k == "min" || k == "max" || k == "dmin" || k == "dmax" || k == "smin" || k == "smax"
  private[sources] def isMinKind(k: String): Boolean =
    k == "min" || k == "dmin" || k == "smin"
  /** The type an extreme slot's value-grain fold compares in. */
  private[sources] def extremeValueType(k: String): DataType = k match {
    case "min" | "max" => LongType
    case "dmin" | "dmax" => DoubleType
    case _ => StringType
  }

  /** dsum slot storage type (state cells + fold arithmetic). */
  private[sources] val DsumCell: DecimalType = DecimalType(30, 6)
  /** dsum per-row input cast — six fractional digits, exact for the
    * money/metric-shaped doubles a rollup MV sums; values needing more
    * precision should sum a scaled BIGINT instead.
    */
  private[sources] val DsumIn: DecimalType = DecimalType(24, 6)
  private val StateV = """_mv\.v(\d+)\.json""".r

  // ---- state model -------------------------------------------------------

  /** `rows`: group-value tuple (raw value strings; null = SQL NULL
    * group) → `2 × |aggs|` cells: one VALUE per agg (None = SQL NULL)
    * followed by one NON-NULL COUNTER per agg. The counters exist for
    * sum/xor exactness: SQL's `sum(e)` is NULL exactly when no non-null
    * value remains, and that is not derivable from the running value
    * (retracting the last non-null contribution leaves 0, not NULL) —
    * so the fold maintains `nn` alongside and nulls the value when it
    * reaches zero. min/max re-derive NULL-ness through their dirty
    * recompute; count is never NULL. `pred` ("" = none) is the MV's
    * WHERE clause: only rows satisfying it contribute, on the full
    * build AND on every change row (an update whose pre-image matched
    * and whose post-image does not is a net retraction — filtered-MV
    * semantics fall out of the signed fold).
    */
  private final case class MvState(
      src: String, groups: Seq[String], gtypes: Seq[String], pred: String,
      srcV: Long, aggs: Seq[MvAgg], rows: Map[List[String], Array[Option[Long]]])

  private def escape(s: String): String =
    s.flatMap {
      case '%' => "%25"
      case '\t' => "%09"
      case '\n' => "%0A"
      case c => c.toString
    }
  private def unescape(s: String): String =
    s.replace("%09", "\t").replace("%0A", "\n").replace("%25", "%")

  private def headerJson(st: MvState): String = {
    val aggs = st.aggs
      .map(a => s"""{"n":"${a.name}","k":"${a.kind}","e":"${a.e}"}""")
      .mkString("[", ",", "]")
    s"""{"src":"${st.src}","group":"${st.groups.mkString(",")}",""" +
      s""""gtype":"${st.gtypes.mkString(",")}","pred":"${st.pred}",""" +
      s""""srcV":${st.srcV},"aggs":$aggs}"""
  }

  private val HeaderRe =
    ("""\{"src":"([^"]*)","group":"([^"]*)","gtype":"([^"]*)",""" +
      """"pred":"([^"]*)","srcV":(\d+),"aggs":\[(.*)\]\}""").r
  private val AggRe = """\{"n":"([^"]*)","k":"([^"]*)","e":"([^"]*)"\}""".r

  private[sources] def cell(v: Option[Long]): String = v.map(_.toString).getOrElse("")
  private[sources] def uncell(s: String): Option[Long] =
    if (s.isEmpty) None else Some(s.toLong)

  /** Group cells: escaped value, or the unambiguous null marker ("%N"
    * cannot collide — escape() rewrites a literal '%' to "%25").
    */
  private[sources] def gcell(v: String): String = if (v == null) "%N" else escape(v)
  private[sources] def ungcell(s: String): String = if (s == "%N") null else unescape(s)

  private def writeState(mvDir: String, version: Long, st: MvState): Unit = {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(mvDir, s"_mv.tmp-$nonce")
    val w = SinkFs.create(tmp)
    try {
      w.write(headerJson(st)); w.write("\n")
      // deterministic row order: the blob's bytes are a function of the
      // state, not of HashMap iteration — diffable, digest-stable
      st.rows.toSeq.sortBy(_._1.map(gcell).mkString("\t")).foreach { case (g, vs) =>
        w.write((g.map(gcell) ++ vs.map(cell)).mkString("\t")); w.write("\n")
      }
    } finally w.close()
    val dest = new Path(mvDir, s"_mv.v$version.json")
    try SinkFs.moveFresh(tmp, dest)
    catch {
      case e: IllegalArgumentException =>
        SinkFs.delete(tmp)
        throw MvConflict(mvDir, version, e.getMessage)
    }
  }

  final case class MvConflict(mvDir: String, version: Long, msg: String)
    extends RuntimeException(
      s"concurrent MV refresh lost the flip to _mv.v$version.json at $mvDir: $msg")

  /** Highest committed state version, 0 when the MV does not exist. The
    * MV directory is tiny (one blob per refresh) — a listing is fine.
    */
  def currentVersion(mvDir: String): Long =
    SinkFs.listFileNames(new Path(mvDir)).collect {
      case StateV(n) => n.toLong
    }.foldLeft(0L)(math.max)

  private def readState(mvDir: String): MvState = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no materialized view at $mvDir (create it first)")
    readStateAt(mvDir, v)
  }

  private def readStateAt(mvDir: String, v: Long): MvState = {
    val lines = SinkFs.readLines(new Path(mvDir, s"_mv.v$v.json"))
    val (src, groups, gtypes, pred, srcV, aggs) = lines.head match {
      case HeaderRe(s, g, t, pr, sv, as) =>
        val parsed = AggRe.findAllMatchIn(as)
          .map(m => MvAgg(m.group(1), m.group(2), m.group(3))).toSeq
        (s, g.split(",", -1).toSeq, t.split(",", -1).toSeq, pr, sv.toLong, parsed)
      case other => sys.error(s"unparseable MV state header at $mvDir: $other")
    }
    val g = groups.length
    val rows = lines.tail.map { l =>
      val cs = l.split("\t", -1)
      require(cs.length == 2 * aggs.length + g, s"torn MV state row at $mvDir: $l")
      cs.take(g).map(ungcell).toList -> cs.drop(g).map(uncell)
    }.toMap
    MvState(src, groups, gtypes, pred, srcV, aggs, rows)
  }

  /** Source-version watermark of the MV's current state — what the MV
    * provably reflects (reads at or before this version agree with a
    * full recompute there).
    */
  def lastSourceVersion(mvDir: String): Long = readState(mvDir).srcV

  /** Retention for the MV's own version ladder: every refresh writes a
    * new state blob and a long-lived continuously-maintained view would
    * otherwise accumulate one file per refresh FOREVER (the same
    * unbounded-litter class the sink's vacuum closed for segments).
    * Keeps the newest `retainVersions` states (min 1 — the current state
    * is never a candidate) and deletes the rest plus any orphaned
    * `_mv.tmp-*` bodies from crashed flips. Time travel below the swept
    * horizon then fails with the ordinary missing-version error. Returns
    * the swept file names.
    */
  def vacuum(
      mvDir: String, retainVersions: Int = 1,
      olderThanMillis: Long = 7L * 24 * 3600 * 1000L): Seq[String] =
    sweepStateLadder(mvDir, currentVersion(mvDir), retainVersions,
      olderThanMillis, { case StateV(n) => n.toLong }, "_mv.tmp-")

  /** The ONE retention core every blob-state MV ladder shares (this
    * object's and [[SinkMvJoin]]'s; [[SinkMvDist]] adds segment rules on
    * top of the same policy): keep the newest `retainVersions` states,
    * sweep the rest plus AGE-GATED tmp litter from crashed flips (a
    * concurrent refresh's in-flight tmp body is younger and survives;
    * olderThanMillis = 0 sweeps everything and is only safe with no
    * refresh in flight). `versionOf` is the ladder's file-name matcher.
    */
  private[sources] def sweepStateLadder(
      mvDir: String, cur: Long, retainVersions: Int, olderThanMillis: Long,
      versionOf: PartialFunction[String, Long], tmpPrefix: String): Seq[String] = {
    require(retainVersions >= 1, "an MV must retain at least its current state")
    require(cur > 0L, s"no materialized view at $mvDir")
    val floor = math.max(1L, cur - retainVersions + 1L)
    val dirPath = new Path(mvDir)
    val fs = SinkFs.fsOf(dirPath)
    val cutoff = System.currentTimeMillis() - olderThanMillis
    val swept = SinkFs.listFileNames(dirPath).filter { n =>
      versionOf.andThen(_ < floor).applyOrElse(n, (x: String) =>
        x.startsWith(tmpPrefix) &&
          fs.getFileStatus(new Path(mvDir, x)).getModificationTime <= cutoff)
    }.sorted
    swept.foreach(n => SinkFs.delete(new Path(mvDir, n)))
    swept
  }

  // ---- plumbing ----------------------------------------------------------

  private[sources] def srcAt(spark: SparkSession, srcDir: String, v: Long): DataFrame =
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", srcDir).option("versionAsOf", v).load()

  private[sources] def changes(
      spark: SparkSession, srcDir: String, fromV: Long, toV: Long): DataFrame =
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", srcDir).option("readChangeFeed", "true")
      .option("changeFeedFrom", fromV).option("changeFeedTo", toV).load()

  private[sources] def gtypeOf(dt: DataType): String = dt match {
    case IntegerType => "int"
    case LongType => "long"
    case StringType => "string"
    case other =>
      throw new IllegalArgumentException(
        s"unsupported MV group column type $other (int/long/string)")
  }
  private[sources] def gvalue(gtype: String, s: String): Any = gtype match {
    case "int" => s.toInt
    case "long" => s.toLong
    case _ => s
  }
  private[sources] def gdt(gtype: String): DataType = gtype match {
    case "int" => IntegerType
    case "long" => LongType
    case _ => StringType
  }

  private[sources] def aggColumn(a: MvAgg): org.apache.spark.sql.Column = a.kind match {
    case "count" => count(lit(1)).as(a.name)
    case "sum" => sum(expr(a.e).cast(LongType)).as(a.name)
    case "xor" => expr(s"bit_xor(cast((${a.e}) as bigint))").as(a.name)
    case "dsum" => sum(expr(a.e).cast(DsumIn)).cast(DsumCell).as(a.name)
    case k if isExtremeKind(k) =>
      val v = expr(a.e).cast(extremeValueType(k))
      (if (isMinKind(k)) min(v) else max(v)).as(a.name)
  }

  private def badChars(e: String): Boolean =
    e.exists(c => c == '"' || c == '\n' || c == '\r' || c == '\t')

  private[sources] def validate(groups: Seq[String], aggs: Seq[MvAgg], pred: String): Unit = {
    require(groups.nonEmpty, "an MV needs at least one group column")
    require(groups.distinct.length == groups.length, s"duplicate group columns: $groups")
    require(aggs.nonEmpty, "an MV needs at least one aggregate")
    // group liveness (drop at zero, resurrect on re-insert) derives from
    // the count — a count-less view could keep phantom groups whose
    // every row was retracted
    require(aggs.exists(_.kind == "count"),
      "an MV must include a count aggregate (group liveness derives from it)")
    val names = aggs.map(_.name)
    require(names.distinct.length == names.length, s"duplicate agg names: $names")
    // quotes break the header JSON; control characters break the
    // line-oriented state blob — reject at definition time, not at the
    // first unreadable refresh
    require(!badChars(pred), "the MV predicate must not contain quotes/newlines/tabs")
    aggs.foreach { a =>
      require(Kinds(a.kind), s"unknown MV agg kind '${a.kind}' (${Kinds.mkString("/")})")
      require(a.name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid agg name '${a.name}'")
      require(a.kind == "count" || a.e.nonEmpty, s"agg ${a.name}: ${a.kind} needs an expression")
      require(!badChars(a.e), s"agg ${a.name}: expression must not contain quotes/newlines/tabs")
      require(!groups.contains(a.name), s"agg ${a.name} collides with a group column")
    }
  }

  /** The MV's WHERE clause applied to any frame with the source's data
    * columns — the full build, the change rows, the dirty recompute.
    */
  private[sources] def filtered(df: DataFrame, pred: String): DataFrame =
    if (pred.isEmpty) df else df.where(expr(pred))

  /** Group-key extraction from a collected aggregation row whose first
    * `g` columns are the group columns (null group values stay null).
    */
  private[sources] def keyOf(r: Row, g: Int): List[String] =
    (0 until g).map(i => if (r.isNullAt(i)) null else r.get(i).toString).toList

  /** The dirty-group recompute filter: OR of per-group conjunctions,
    * typed literals so source pruning (shard stats, column envelopes)
    * still engages on the recompute scan.
    */
  private[sources] def groupFilter(
      groups: Seq[String], gtypes: Seq[String],
      keys: Seq[List[String]]): org.apache.spark.sql.Column =
    keys.map { parts =>
      groups.zip(gtypes).zip(parts).map { case ((c, t), p) =>
        if (p == null) col(c).isNull else col(c) === lit(gvalue(t, p))
      }.reduce(_ && _)
    }.reduce(_ || _)

  // ---- create ------------------------------------------------------------

  /** Full-scan creation, pinned at the source's CURRENT manifest version
    * (the scan reads `versionAsOf` that pin, so commits racing the create
    * are cleanly excluded and picked up by the first refresh). Returns
    * the pinned source version.
    */
  def create(
      spark: SparkSession, srcDir: String, mvDir: String,
      group: String, aggs: Seq[MvAgg]): Long =
    create(spark, srcDir, mvDir, Seq(group), aggs, where = "")

  /** Generalized creation: `SELECT g1, …, gk, aggs… FROM src [WHERE
    * pred] GROUP BY g1, …, gk`. NULL group values form their own group,
    * SQL-style.
    */
  def create(
      spark: SparkSession, srcDir: String, mvDir: String,
      groups: Seq[String], aggs: Seq[MvAgg], where: String): Long = {
    validate(groups, aggs, where)
    aggs.find(a => DistOnlyKinds(a.kind)).foreach(a => sys.error(
      s"${a.kind} needs typed state cells — supported by the DISTRIBUTED MV (SinkMvDist) only"))
    require(currentVersion(mvDir) == 0L, s"materialized view already exists at $mvDir")
    val srcV = ShardSink.currentManifestVersion(srcDir)
    require(srcV > 0L, s"no committed version at $srcDir — create the MV after the first commit")
    val schema = ShardSink.schemaAtVersion(srcDir, srcV)
    groups.foreach(g => require(schema.fieldNames.contains(g),
      s"group column '$g' not in ${schema.fieldNames.mkString(",")}"))
    val gtypes = groups.map(g => gtypeOf(schema(g).dataType))
    val g = groups.length
    val nnCols = aggs.map { a =>
      if (a.kind == "sum" || a.kind == "xor")
        count(when(expr(a.e).isNotNull, 1)).as(s"_nn_${a.name}")
      else lit(0L).as(s"_nn_${a.name}")
    }
    val full = filtered(srcAt(spark, srcDir, srcV), where)
      .groupBy(groups.map(col): _*)
      .agg(aggColumn(aggs.head), aggs.tail.map(aggColumn) ++ nnCols: _*)
      .collect() // bounded: the MV's result cardinality
    val na = aggs.length
    val rows = full.map { r =>
      keyOf(r, g) -> (0 until 2 * na)
        .map(i => if (r.isNullAt(i + g)) None else Some(r.getLong(i + g))).toArray
    }.toMap
    writeState(mvDir, 1L, MvState(srcDir, groups, gtypes, where, srcV, aggs, rows))
    srcV
  }

  // ---- refresh -----------------------------------------------------------

  /** Incremental refresh to the source's current version. Reads ONLY the
    * change feed of `(state.srcV, currentV]`; recomputes min/max for the
    * (usually few) groups whose recorded extreme was removed, via one
    * scan pruned to those groups. Retries a lost state-flip race by
    * re-reading (the winner may already have covered the window).
    */
  def refresh(spark: SparkSession, srcDir: String): RefreshStats =
    refresh(spark, srcDir, mvDirOf(srcDir))

  def refresh(spark: SparkSession, srcDir: String, mvDir: String): RefreshStats = {
    var attempt = 0
    while (true) {
      // pin the state version NOW: the flip targets stateV+1, so a
      // competing refresh that lands first surfaces as MvConflict (and a
      // re-read shows its coverage) — never a silently regressed
      // watermark written over a newer state
      val stateV = currentVersion(mvDir)
      require(stateV > 0L, s"no materialized view at $mvDir (create it first)")
      val st = readStateAt(mvDir, stateV)
      require(st.src == srcDir,
        s"MV at $mvDir materializes ${st.src}, not $srcDir")
      val toV = ShardSink.currentManifestVersion(srcDir)
      if (toV <= st.srcV)
        return RefreshStats(st.srcV, st.srcV, 0L, 0L, stateV, applied = false)
      try return refreshOnce(spark, srcDir, mvDir, st, stateV, toV)
      catch {
        case _: MvConflict if attempt < 5 => attempt += 1 // re-read, re-derive
        case c: MvConflict => throw c
      }
    }
    sys.error("unreachable")
  }

  /** One-shot interleave for the concurrency spec: runs after the delta
    * is derived but before the state flip — the window a competing
    * refresh can win (the spec runs a REAL refresh inside it and asserts
    * the loser retries into a no-op instead of double-applying).
    */
  private[sources] val refreshBarrier =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** Default MV location: a sibling directory — keeps the MV's blobs out
    * of the table directory (whose listings and vacuum sweeps must stay
    * table-only).
    */
  def mvDirOf(srcDir: String): String = srcDir.stripSuffix("/") + ".mv"

  /** STREAMING maintenance: apply ONE micro-batch of change rows (the
    * CDF stream delivers one commit per trigger) to the MV — the
    * `foreachBatch` body of a continuously-maintained rollup. Exactly
    * once across replays by the state's own watermark: a batch at or
    * below `srcV` is a recorded no-op (the flip that covered it already
    * committed), a batch more than one commit ahead fails loudly (the
    * stream delivers versions in order; a gap means a skipped commit and
    * a silently wrong view). The fold itself is the batch refresh's —
    * same net-grain extremes, same pruned dirty recompute at `toV`.
    */
  def refreshFromChanges(
      spark: SparkSession, srcDir: String, mvDir: String,
      ch: DataFrame, toV: Long): RefreshStats = {
    var attempt = 0
    while (true) {
      val stateV = currentVersion(mvDir)
      require(stateV > 0L, s"no materialized view at $mvDir (create it first)")
      val st = readStateAt(mvDir, stateV)
      require(st.src == srcDir, s"MV at $mvDir materializes ${st.src}, not $srcDir")
      if (toV <= st.srcV) // replayed or pre-create commit: already covered
        return RefreshStats(st.srcV, st.srcV, 0L, 0L, stateV, applied = false)
      if (toV > st.srcV + 1L) {
        // a NO-DATA commit (OPTIMIZE / ZORDER / ALTER / constraint DDL)
        // derives an EMPTY change feed, so it never arrives as a
        // micro-batch and the stream jumps from the last data commit
        // straight to this one. Fast-forwarding the watermark across the
        // gap is safe exactly when the skipped window is PROVABLY
        // change-free: re-derive it from the immutable commit log and
        // require zero rows. Anything else is a genuinely skipped data
        // commit and still fails loudly — the alternative is a silently
        // wrong view.
        val gapRows =
          changes(spark, srcDir, st.srcV, toV - 1L).limit(1).count()
        require(gapRows == 0L,
          s"streaming MV gap at $mvDir: batch carries commit $toV but the " +
            s"view reflects ${st.srcV} and commits (${st.srcV}, ${toV - 1L}] " +
            "carry change rows — commits must apply in order")
      }
      val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      val cached = ch.persist()
      try return refreshFolds(spark, srcDir, mvDir, st, stateV, toV, cached, sign)
      catch {
        case _: MvConflict if attempt < 5 => attempt += 1
        case c: MvConflict => throw c
      } finally { cached.unpersist(); () }
    }
    sys.error("unreachable")
  }

  private def refreshOnce(
      spark: SparkSession, srcDir: String, mvDir: String,
      st: MvState, stateV: Long, toV: Long): RefreshStats = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    // the delta is read ONCE from disk and cached: the row-grain fold and
    // each extreme's value-grain fold are separate aggregations over it
    val ch = changes(spark, srcDir, st.srcV, toV).persist()
    try refreshFolds(spark, srcDir, mvDir, st, stateV, toV, ch, sign)
    finally { ch.unpersist(); () }
  }

  private def refreshFolds(
      spark: SparkSession, srcDir: String, mvDir: String,
      st: MvState, stateV: Long, toV: Long,
      ch: DataFrame, sign: org.apache.spark.sql.Column): RefreshStats = {
    val outcome = foldChanges(
      st.groups, st.aggs, filtered(ch, st.pred), sign, st.rows,
      // dirty-group recompute: ONE scan at the target version, pruned to
      // exactly those groups (shard-clustered files make this cheap)
      (dirtyKeys, dirtyAggIdx) => {
        val aggsToFix = dirtyAggIdx.map(i => aggColumn(st.aggs(i)))
        filtered(srcAt(spark, srcDir, toV), st.pred)
          .where(groupFilter(st.groups, st.gtypes, dirtyKeys))
          .groupBy(st.groups.map(col): _*)
          .agg(aggsToFix.head, aggsToFix.tail: _*)
          .collect() // bounded: |dirty groups|
      })
    val barrier = refreshBarrier.getAndSet(null)
    if (barrier != null) barrier()
    val next = stateV + 1L
    writeState(mvDir, next, st.copy(srcV = toV, rows = outcome.rows))
    RefreshStats(st.srcV, toV, outcome.changeRows, outcome.dirtyGroups, next,
      applied = true)
  }

  private[sources] final case class FoldOutcome(
      rows: Map[List[String], Array[Option[Long]]],
      changeRows: Long, dirtyGroups: Long)

  /** The MV fold core, definition-agnostic: takes the PRE-FILTERED,
    * signed change frame (any frame carrying the group columns and the
    * aggregate expressions' inputs — a table's change feed, or a join
    * MV's delta⋈dim contribution rows), the prior state rows, and a
    * recompute callback `(dirtyKeys, dirtyAggIdx) => rows` that
    * re-aggregates exactly the dirty groups at the refresh target
    * (single-table scan or join — the caller knows). Returns the folded
    * rows; the caller owns state layout, watermarks, and the flip.
    */
  private[sources] def foldChanges(
      groups: Seq[String], aggs: Seq[MvAgg],
      chF: DataFrame, sign: org.apache.spark.sql.Column,
      prior: Map[List[String], Array[Option[Long]]],
      recompute: (Seq[List[String]], Seq[Int]) => Array[Row]): FoldOutcome = {
    // row-grain pass: count/sum/xor are LINEAR — every change row folds
    // independently of any other
    val deltaCols = aggs.zipWithIndex.flatMap { case (a, i) =>
      a.kind match {
        case "count" => Seq(sum(sign).as(s"d$i"))
        case "sum" => Seq(
          sum(sign * expr(a.e).cast(LongType)).as(s"d$i"),
          // signed count of NON-NULL contributions: SQL's sum/xor are
          // NULL exactly when this reaches zero
          sum(sign * when(expr(a.e).isNotNull, 1L).otherwise(0L)).as(s"d${i}_nn"))
        case "xor" => Seq(
          expr(s"bit_xor(cast((${a.e}) as bigint))").as(s"d$i"),
          sum(sign * when(expr(a.e).isNotNull, 1L).otherwise(0L)).as(s"d${i}_nn"))
        case _ => Seq.empty // extremes fold at value grain below
      }
    }
    val countIdx = aggs.indexWhere(_.kind == "count")
    val g = groups.length
    val deltaRows = chF
      .groupBy(groups.map(col): _*)
      .agg(sum(sign).as("_dn"), count(lit(1)).as("_rows") +: deltaCols: _*)
      .collect() // bounded: groups TOUCHED by the window, ≤ MV cardinality
    // value-grain pass, one per distinct extreme expression: net(g, v) =
    // Σ sign over rows with that value — an in-window insert+delete of
    // the same value (and an in-place update's pre/post pair) cancels to
    // net 0 and VANISHES, so `pos` (net additions) are values that
    // genuinely survive the window and `neg` (net removals) genuinely
    // left. That makes the extreme fold exact where row-grain min/max
    // candidates could not distinguish "inserted then deleted" from
    // "inserted and kept".
    val extremeExprs = aggs.filter(a => a.kind == "min" || a.kind == "max")
      .map(_.e).distinct
    // expr → group key → (posMin, posMax, negMin, negMax)
    val extremes: Map[String, Map[List[String], (Option[Long], Option[Long], Option[Long], Option[Long])]] =
      extremeExprs.map { e =>
        val per = chF
          .groupBy(groups.map(col) :+ expr(e).cast(LongType).as("_mv_v"): _*)
          .agg(sum(sign).as("_mv_net"))
          .groupBy(groups.map(col): _*)
          .agg(
            min(when(col("_mv_net") > 0L, col("_mv_v"))).as("_pos_min"),
            max(when(col("_mv_net") > 0L, col("_mv_v"))).as("_pos_max"),
            min(when(col("_mv_net") < 0L, col("_mv_v"))).as("_neg_min"),
            max(when(col("_mv_net") < 0L, col("_mv_v"))).as("_neg_max"))
          .collect()
        def opt(r: Row, c: String): Option[Long] =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        e -> per.map(r => keyOf(r, g) ->
          (opt(r, "_pos_min"), opt(r, "_pos_max"), opt(r, "_neg_min"), opt(r, "_neg_max"))).toMap
      }.toMap
    var changeRows = 0L
    val na = aggs.length
    val merged = scala.collection.mutable.Map[List[String], Array[Option[Long]]]()
    prior.foreach { case (k, vs) => merged(k) = vs.clone() }
    // groups whose min/max can no longer be derived incrementally → one
    // pruned recompute scan below; (groupKey → set of dirty agg indices)
    val dirty = scala.collection.mutable.Map[List[String], Set[Int]]()
    deltaRows.foreach { r =>
      val gk = keyOf(r, g)
      changeRows += r.getAs[Long]("_rows")
      val dn = r.getAs[Long]("_dn")
      val had = merged.contains(gk)
      val state = merged.getOrElseUpdate(gk, Array.fill(2 * na)(None))
      val oldN = if (countIdx >= 0 && had) state(countIdx).getOrElse(0L) else -1L
      aggs.zipWithIndex.foreach { case (a, i) =>
        def opt(c: String): Option[Long] =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        a.kind match {
          case "count" =>
            state(i) = Some(state(i).getOrElse(0L) + dn)
          case "sum" =>
            val nn = state(na + i).getOrElse(0L) + opt(s"d${i}_nn").getOrElse(0L)
            state(na + i) = Some(nn)
            state(i) =
              if (nn == 0L) None // SQL: sum over no non-null values is NULL
              else Some(state(i).getOrElse(0L) + opt(s"d$i").getOrElse(0L))
          case "xor" =>
            val nn = state(na + i).getOrElse(0L) + opt(s"d${i}_nn").getOrElse(0L)
            state(na + i) = Some(nn)
            state(i) =
              if (nn == 0L) None
              else Some(state(i).getOrElse(0L) ^ opt(s"d$i").getOrElse(0L))
          case "min" | "max" =>
            val (pMin, pMax, nMin, nMax) =
              extremes(a.e).getOrElse(gk, (None, None, None, None))
            val (pos, neg) =
              if (a.kind == "min") (pMin, nMin) else (pMax, nMax)
            state(i) = foldExtreme(state(i), pos, neg, had, gk, i, dirty,
              isMin = a.kind == "min")
        }
      }
      // sanity of the signed fold: a group that existed and whose count
      // reaches zero has had every row retracted — it leaves the view
      val newN = if (countIdx >= 0) state(countIdx).getOrElse(0L) else 1L
      if (countIdx >= 0 && newN == 0L) { merged.remove(gk); dirty.remove(gk) }
      else if (countIdx >= 0) require(newN > 0L,
        s"MV fold drove group '$gk' count negative ($oldN -> $newN): change feed incomplete?")
    }
    // recompute extremes for dirty surviving groups with ONE pruned pass
    // supplied by the caller (single-table scan or join)
    val dirtyKeys = dirty.keys.toSeq.sortBy(_.map(gcell).mkString("\t"))
    if (dirtyKeys.nonEmpty) {
      val dirtyAggIdx = dirty.values.flatten.toSet.toSeq.sorted
      val fixed = recompute(dirtyKeys, dirtyAggIdx)
      fixed.foreach { r =>
        val gk = keyOf(r, g)
        val state = merged(gk)
        dirtyAggIdx.zipWithIndex.foreach { case (ai, k) =>
          if (dirty(gk).contains(ai))
            state(ai) = if (r.isNullAt(k + g)) None else Some(r.getLong(k + g))
        }
      }
    }
    FoldOutcome(merged.toMap, changeRows, dirtyKeys.length.toLong)
  }

  /** The extreme-fold decision table over NET-grain window extremes
    * (`pos` = best net-ADDED value, `neg` = best net-REMOVED value; an
    * in-window insert+delete of the same value — including an in-place
    * update's pre/post pair — nets to zero and appears in neither).
    * Min shown; max is the mirror:
    *   - group unseen by the state: every surviving row is a net
    *     addition, so `pos` IS the extreme — exact, never dirty
    *   - no net removal → the floor can only fall: min(state, pos)
    *   - net removal strictly ABOVE the recorded floor → the recorded
    *     row's value survives: min(state, pos) stays exact
    *   - net removal AT/BELOW the recorded floor, but a net addition at
    *     or below the removed value (`pos ≤ neg`) establishes the new
    *     exact floor: pos ≤ neg ≤ state and everything else ≥ state →
    *     min = pos
    *   - otherwise the true floor is unknowable from aggregates alone
    *     (the removed value may or may not have had surviving twins) →
    *     DIRTY, recomputed by the pruned per-group scan
    */
  private def foldExtreme(
      state: Option[Long], pos: Option[Long], neg: Option[Long],
      had: Boolean, g: List[String], i: Int,
      dirty: scala.collection.mutable.Map[List[String], Set[Int]],
      isMin: Boolean): Option[Long] = {
    def better(a: Long, b: Long): Long = if (isMin) math.min(a, b) else math.max(a, b)
    def touches(s: Long, n: Long): Boolean = if (isMin) n <= s else n >= s
    def covers(p: Long, n: Long): Boolean = if (isMin) p <= n else p >= n
    val clean: Option[Long] = (state, pos) match {
      case (Some(s), Some(p)) => Some(better(s, p))
      case (Some(s), None) => Some(s)
      case (None, p) => p
    }
    val isDirty =
      if (!had) false // window-local group: pos is exact by construction
      else (state, neg) match {
        case (Some(s), Some(n)) if touches(s, n) =>
          !pos.exists(p => covers(p, n)) // a net addition re-covers the floor?
        case (None, Some(_)) => true // extreme unknown (all-null state), rows retracted
        case _ => false
      }
    if (isDirty) { dirty(g) = dirty.getOrElse(g, Set.empty) + i; state }
    else clean
  }

  // ---- read --------------------------------------------------------------

  /** The MV contents as a DataFrame: `(group, agg1, agg2, …)`. Reads the
    * state blob only — NEVER the source table; this is the whole point.
    * `asOf` time-travels the MV itself (state versions are retained like
    * manifest versions).
    */
  def read(spark: SparkSession, mvDir: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(mvDir))
    require(v > 0L, s"no materialized view at $mvDir")
    val st = readStateAt(mvDir, v)
    val schema = StructType(
      st.groups.zip(st.gtypes).map { case (gName, t) =>
        StructField(gName, gdt(t), nullable = true)
      } ++ st.aggs.map(a => StructField(a.name, LongType, nullable = true)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    st.rows.toSeq.sortBy(_._1.map(gcell).mkString("\t")).foreach { case (k, vs) =>
      val gs = st.gtypes.zip(k).map { case (t, p) =>
        if (p == null) null else gvalue(t, p)
      }
      // first |aggs| cells are the values; the rest are the fold's
      // internal non-null counters
      rows.add(Row.fromSeq(gs ++ vs.take(st.aggs.length).map(_.map(Long.box).orNull).toSeq))
    }
    spark.createDataFrame(rows, schema)
  }

  // ---- driver-checked query ----------------------------------------------

  /** Driver-checked INCREMENTAL MV REFRESH (round 15): create a per-shard
    * rollup MV (count / sum / xor / min / max of doc_id, sum of body
    * length) after two ingest commits, then drive the source through an
    * in-place UPDATE (pre/post images; min/max must NOT dirty — the
    * fast-path), a tail DELETE (every shard's recorded max removed → the
    * pruned dirty-recompute path), a whole-shard DELETE (group-drop), and
    * a late APPEND (direct extreme extension + group resurrection) — one
    * incremental refresh after each. The final result is the MV state
    * crossed with the refresh bookkeeping (refresh count, change rows
    * consumed, dirty recomputes, MV/source versions), every cell
    * re-derived by DuckDB from the same windows — so the INCREMENTAL fold
    * equals the full recompute under the hash gate, not just row counts.
    */
  def mvRefreshReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mv:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmv_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mv", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mv.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mv.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mv.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mv.cdf.enabled", "true")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2400").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_mv.docs_mv").append()
    val dir = new java.io.File(root, "docs_mv").getPath
    val mvDir = mvDirOf(dir)
    append(0L, 800L) // v1
    append(800L, 2000L) // v2
    create(s, dir, mvDir, "shard", Seq(
      MvAgg("n_docs", "count"),
      MvAgg("sum_ids", "sum", "doc_id"),
      MvAgg("xor_ids", "xor", "doc_id"),
      MvAgg("min_doc", "min", "doc_id"),
      MvAgg("max_doc", "max", "doc_id"),
      MvAgg("sum_len", "sum", "length(body)")))
    // v3: in-place update (600 change rows, 0 dirty — doc_id unchanged)
    s.sql("UPDATE graft_mv.docs_mv SET body = concat(body, '!') WHERE doc_id < 300")
    val r1 = refresh(s, dir, mvDir)
    // v4: tail delete (500 rows) — every shard's max is in [1500,2000) → 16 dirty
    s.sql("DELETE FROM graft_mv.docs_mv WHERE doc_id >= 1500")
    val r2 = refresh(s, dir, mvDir)
    // v5: whole-shard delete — shard 3 empties and leaves the view
    s.sql("DELETE FROM graft_mv.docs_mv WHERE shard = 3")
    val r3 = refresh(s, dir, mvDir)
    // v6: late append — maxes extend in-place, shard 3 resurrects
    append(2000L, 2400L)
    val r4 = refresh(s, dir, mvDir)
    val stats = Seq(r1, r2, r3, r4)
    read(s, mvDir)
      .withColumn("n_refreshes", lit(stats.count(_.applied).toLong))
      .withColumn("change_rows", lit(stats.map(_.changeRows).sum))
      .withColumn("dirty_groups", lit(stats.map(_.dirtyGroups).sum))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("src_version", lit(lastSourceVersion(mvDir)))
      .orderBy("shard")
  }

  /** Driver-checked MV ACROSS RESTORE + replaceWhere (round 16): the two
    * history-bending commit kinds a reporting MV must survive. A tail
    * MOR DELETE dirties every shard's max (pruned recompute); RESTORE to
    * v1 surfaces the resurrected rows as plain inserts in the feed (the
    * r14 exact-through-restore contract) and the fold re-extends the
    * extremes on the fast path; a `replaceWhere` on shard 3 drops the
    * shard and re-lands a third of it in ONE commit — net retractions
    * including the recorded max, one dirty group. Final per-shard view +
    * bookkeeping under the DuckDB hash gate.
    */
  def mvRestoreReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvr:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvr_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mvr", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvr.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvr.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvr.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvr.cdf.enabled", "true")
    def src = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "1200").option("numPartitions", "2").load()
    src.writeTo("graft_mvr.docs_mvr").append() // v1
    val dir = new java.io.File(root, "docs_mvr").getPath
    val mvDir = mvDirOf(dir)
    create(s, dir, mvDir, "shard", Seq(
      MvAgg("n_docs", "count"),
      MvAgg("sum_ids", "sum", "doc_id"),
      MvAgg("xor_ids", "xor", "doc_id"),
      MvAgg("min_doc", "min", "doc_id"),
      MvAgg("max_doc", "max", "doc_id")))
    s.sql("DELETE FROM graft_mvr.docs_mvr WHERE doc_id >= 900") // v2
    val r1 = refresh(s, dir, mvDir)
    s.sql("ALTER TABLE graft_mvr.docs_mvr SET TBLPROPERTIES ('graft.restore' = '1')") // v3
    val r2 = refresh(s, dir, mvDir)
    src.where(col("shard") === 3 && ((col("doc_id") - 3L) / 16L) % 3L === 0L)
      .writeTo("graft_mvr.docs_mvr").overwrite(col("shard") === 3) // v4
    val r3 = refresh(s, dir, mvDir)
    val stats = Seq(r1, r2, r3)
    read(s, mvDir)
      .withColumn("n_refreshes", lit(stats.count(_.applied).toLong))
      .withColumn("change_rows", lit(stats.map(_.changeRows).sum))
      .withColumn("dirty_groups", lit(stats.map(_.dirtyGroups).sum))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("src_version", lit(lastSourceVersion(mvDir)))
      .orderBy("shard")
  }

  /** DuckDB re-derivation: after restore the table is v1's 0..1199; the
    * replaceWhere keeps only every third shard-3 row (k ≡ 0 mod 3 of
    * doc = 3 + 16k). Constants: 3 refreshes; 300 (tail delete) + 300
    * (restore resurrections) + 100 (75 drops + 25 re-inserts) = 700
    * change rows; 16 + 0 + 1 dirty; MV v4 = create + 3; source v4.
    */
  val mvRestoreReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard
      |  FROM range(0, 1200) t(doc_id)
      |  WHERE doc_id % 16 <> 3 OR ((doc_id - 3) / 16) % 3 = 0)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(3 AS BIGINT) AS n_refreshes,
      |       CAST(700 AS BIGINT) AS change_rows,
      |       CAST(17 AS BIGINT) AS dirty_groups,
      |       CAST(4 AS BIGINT) AS mv_version,
      |       CAST(4 AS BIGINT) AS src_version
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked MULTI-COLUMN + PREDICATE MV (round 15): the
    * generalized definition — `GROUP BY (lang, shard)` (48 groups, an
    * evolved string column composed with the layout column) under a
    * WHERE clause (`length(body) = 32`). The UPDATE commit is the
    * predicate-CROSSING case filtered MVs exist for: its pre-images
    * match the predicate and its post-images (33-char bodies) do not, so
    * the signed fold nets to a pure retraction and the updated rows
    * LEAVE the view while staying in the table. The MOR delete then
    * dirties every group's max (the pruned recompute also runs under the
    * predicate). Final view + lifecycle constants under the hash gate;
    * the watermark/currency cells are derived, not wall-clock.
    */
  def mvGroupsReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvg:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvg_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mvg", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvg.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvg.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvg.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvg.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2000").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    docs(0L, 0L).writeTo("graft_mvg.docs_mvg").append() // bootstrap the table
    s.sql("ALTER TABLE graft_mvg.docs_mvg ADD COLUMN lang STRING")
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi)
        .withColumn("lang", concat(lit("l"), (col("doc_id") % 3).cast("string")))
        .writeTo("graft_mvg.docs_mvg").append()
    ingest(0L, 800L)
    ingest(800L, 2000L)
    val dir = new java.io.File(root, "docs_mvg").getPath
    val mvDir = mvDirOf(dir)
    create(s, dir, mvDir, Seq("lang", "shard"), Seq(
      MvAgg("n_docs", "count"),
      MvAgg("sum_ids", "sum", "doc_id"),
      MvAgg("xor_ids", "xor", "doc_id"),
      MvAgg("max_doc", "max", "doc_id")),
      where = "length(body) = 32")
    // predicate-crossing update: rows stay in the TABLE, leave the VIEW
    s.sql("UPDATE graft_mvg.docs_mvg SET body = concat(body, '!') WHERE doc_id < 300")
    val r1 = refresh(s, dir, mvDir)
    s.sql("DELETE FROM graft_mvg.docs_mvg WHERE doc_id >= 1500")
    val r2 = refresh(s, dir, mvDir)
    val stats = Seq(r1, r2)
    read(s, mvDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_groups"), sum(col("n_docs")).as("n_docs"),
        sum(col("sum_ids")).as("sum_ids"), expr("bit_xor(xor_ids)").as("xor_ids"),
        max(col("max_doc")).as("max_doc"))
      .withColumn("n_refreshes", lit(stats.count(_.applied).toLong))
      .withColumn("change_rows", lit(stats.map(_.changeRows).sum))
      .withColumn("dirty_groups", lit(stats.map(_.dirtyGroups).sum))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("watermark_current",
        lit(if (lastSourceVersion(mvDir) ==
          ShardSink.currentManifestVersion(dir)) 1L else 0L))
      .orderBy("lang")
  }

  /** DuckDB re-derivation: the view's final rows are docs in [300, 1500)
    * (0..299 crossed out of the predicate via the body update; ≥1500
    * deleted), grouped by (lang, shard) — rolled up per lang for a
    * compact 3-row gate. Constants: 2 refreshes; 300 pre-image rows (the
    * post-images are predicate-filtered) + 500 deletes = 800 change
    * rows; all 48 groups' maxes sat in the deleted tail → 48 dirty; MV
    * v3 = create + 2 refreshes; watermark current.
    */
  val mvGroupsReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         'l' || CAST(doc_id % 3 AS VARCHAR) AS lang
      |  FROM range(300, 1500) t(doc_id)),
      |pg AS (
      |  SELECT lang, shard, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(doc_id) AS BIGINT) AS s, bit_xor(doc_id) AS x,
      |         CAST(MAX(doc_id) AS BIGINT) AS m
      |  FROM g GROUP BY lang, shard)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |       CAST(SUM(n) AS BIGINT) AS n_docs, CAST(SUM(s) AS BIGINT) AS sum_ids,
      |       bit_xor(x) AS xor_ids, CAST(MAX(m) AS BIGINT) AS max_doc,
      |       CAST(2 AS BIGINT) AS n_refreshes,
      |       CAST(800 AS BIGINT) AS change_rows,
      |       CAST(48 AS BIGINT) AS dirty_groups,
      |       CAST(3 AS BIGINT) AS mv_version,
      |       CAST(1 AS BIGINT) AS watermark_current
      |FROM pg GROUP BY lang ORDER BY lang""".stripMargin

  /** Driver-checked STREAMING MV MAINTENANCE (round 15): the same
    * 6-commit lifecycle, maintained CONTINUOUSLY — the change feed is
    * tailed one commit per trigger and every micro-batch lands through
    * [[refreshFromChanges]] in a `foreachBatch` loop, the recipe Delta
    * documents for streaming aggregate maintenance. The create-time
    * watermark (source v2) makes the first two streamed commits recorded
    * NO-OPS (already covered by the full build) — the exactly-once
    * dedup a replayed batch takes too — and the last four fold
    * incrementally, dirty recomputes included. The final view, the
    * applied/skipped split, the version ladder AND a zero row-diff
    * against a from-scratch aggregate of the source all sit under the
    * hash gate.
    */
  def mvStreamParity(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvs:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvs_$sfx")
    SinkFs.deleteRecursively(root)
    val s = graft.streaming.StreamTune.session(spark)
    s.conf.set("spark.sql.catalog.graft_mvs", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvs.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvs.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvs.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvs.cdf.enabled", "true")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2400").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_mvs.docs_mvs").append()
    val dir = new java.io.File(root, "docs_mvs").getPath
    val mvDir = mvDirOf(dir)
    append(0L, 800L) // v1
    append(800L, 2000L) // v2
    create(s, dir, mvDir, "shard", Seq(
      MvAgg("n_docs", "count"),
      MvAgg("sum_ids", "sum", "doc_id"),
      MvAgg("xor_ids", "xor", "doc_id"),
      MvAgg("min_doc", "min", "doc_id"),
      MvAgg("max_doc", "max", "doc_id")))
    s.sql("UPDATE graft_mvs.docs_mvs SET body = concat(body, '!') WHERE doc_id < 300") // v3
    s.sql("DELETE FROM graft_mvs.docs_mvs WHERE doc_id >= 1500") // v4
    s.sql("DELETE FROM graft_mvs.docs_mvs WHERE shard = 3") // v5
    append(2000L, 2400L) // v6
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    val skipped = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = s.readStream.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("readChangeFeed", "true").load()
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        val vs = batch.agg(
          min(col("_commit_version")), max(col("_commit_version"))).collect().head
        if (!vs.isNullAt(0)) {
          require(vs.getLong(0) == vs.getLong(1),
            "the CDF stream delivers one commit per trigger")
          val st = refreshFromChanges(s, dir, mvDir, batch, vs.getLong(0))
          (if (st.applied) applied else skipped).incrementAndGet()
          ()
        }
      }.start()
    try q.processAllAvailable() finally q.stop()
    val full = s.read.format("graft.sources.ShardSinkSource")
      .option("path", dir).load()
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    val mv = read(s, mvDir)
    val nDiff = mv.exceptAll(full).union(full.exceptAll(mv)).count()
    mv.withColumn("n_applied", lit(applied.get()))
      .withColumn("n_skipped", lit(skipped.get()))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("src_version", lit(lastSourceVersion(mvDir)))
      .withColumn("n_diff", lit(nDiff))
      .orderBy("shard")
  }

  val mvStreamParitySql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard
      |  FROM range(0, 2400) t(doc_id)
      |  WHERE (doc_id < 1500 AND doc_id % 16 <> 3) OR doc_id >= 2000)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(4 AS BIGINT) AS n_applied,
      |       CAST(2 AS BIGINT) AS n_skipped,
      |       CAST(5 AS BIGINT) AS mv_version,
      |       CAST(6 AS BIGINT) AS src_version,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  /** DuckDB re-derivation: the final live set is
    * `(doc_id < 1500 AND shard <> 3) OR doc_id >= 2000` with bodies
    * `md5(id) || '!'` below 300 — the MV per-shard rollup over exactly
    * that, plus the lifecycle constants (4 refreshes; 600+500+94+400
    * change rows — 94 = |{id < 1500 : id ≡ 3 (mod 16)}|; 16 dirty
    * max-recomputes from the tail delete; MV v5 = create + 4 refreshes;
    * source v6).
    */
  val mvRefreshReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         CAST(CASE WHEN doc_id < 300 THEN 33 ELSE 32 END AS BIGINT) AS blen
      |  FROM range(0, 2400) t(doc_id)
      |  WHERE (doc_id < 1500 AND doc_id % 16 <> 3) OR doc_id >= 2000)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(SUM(blen) AS BIGINT) AS sum_len,
      |       CAST(4 AS BIGINT) AS n_refreshes,
      |       CAST(1594 AS BIGINT) AS change_rows,
      |       CAST(16 AS BIGINT) AS dirty_groups,
      |       CAST(5 AS BIGINT) AS mv_version,
      |       CAST(6 AS BIGINT) AS src_version
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin
}
