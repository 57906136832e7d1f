package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DISTRIBUTED materialized-view state (round 16) — the scale rung above
  * [[SinkMatView]]'s driver-resident blob. Same definition surface
  * (`SELECT g1..gk, count/sum/xor/min/max… FROM t [WHERE pred] GROUP BY`),
  * same change-feed-driven incremental fold, same signed net-grain
  * extreme math — but the state lives as BUCKETED TSV SEGMENTS in the
  * MV directory and every refresh is a DISTRIBUTED plan:
  *
  *   state(touched buckets)  FULL OUTER JOIN (null-safe)  Δ(change feed)
  *     → fold columns (count/sum/xor linear; min/max clean-or-dirty)
  *     → dirty groups re-aggregated by ONE pruned source join
  *     → rewritten bucket segments;  untouched buckets CARRY FORWARD
  *       by reference into the new header
  *
  * Driver involvement per refresh is O(buckets), never O(groups): the
  * only rows ever collected are the ≤ `buckets` distinct bucket ids the
  * delta touches (pinned by [[driverRowsCollected]] and its spec). A
  * per-user or per-document grain MV over a 100 TB events table — the
  * case the blob design could not serve — keeps its millions of groups
  * on the executors end to end; the driver moves a handful of files and
  * flips a header whose size is O(segment files).
  *
  * Commit protocol: segment files are written under job-unique names
  * FIRST, then the tiny versioned header `_mvd.v<N>.json` (definition +
  * watermark + file refs) flips with the same fresh-name election the
  * table manifest uses — a crash leaves the previous version intact plus
  * sweepable orphans, a lost race retries against the winner's state
  * ([[SinkMatView.MvConflict]] semantics). Exactness inherits the change
  * feed's contract, identically to the blob MV.
  */
object SinkMvDist {
  import SinkMatView.{MvAgg, MvConflict, RefreshStats}

  private val StateV = """_mvd\.v(\d+)\.json""".r
  private val HeaderRe =
    ("""\{"src":"([^"]*)","group":"([^"]*)","gtype":"([^"]*)",""" +
      """"pred":"([^"]*)","srcV":(\d+),"buckets":(\d+),"aggs":\[(.*)\]\}""").r
  private val HeaderJoinRe =
    ("""\{"src":"([^"]*)","group":"([^"]*)","gtype":"([^"]*)",""" +
      """"pred":"([^"]*)","srcV":(\d+),"buckets":(\d+),""" +
      """"dim":"([^"]*)","fk":"([^"]*)","pk":"([^"]*)","dimV":(\d+),"aggs":\[(.*)\]\}""").r
  private val AggRe = """\{"n":"([^"]*)","k":"([^"]*)","e":"([^"]*)"\}""".r

  /** One-shot interleave hook: runs after the fold is derived but before
    * the segment write + header flip — the window a competing refresh
    * can win (the spec asserts the loser retries into a no-op).
    */
  private[sources] val refreshBarrier =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** Total rows materialized on the driver by create/refresh control
    * flow — the observability hook for the scale contract: its growth is
    * bounded by `buckets` per refresh, independent of group cardinality
    * (spec-pinned at two grains).
    */
  val driverRowsCollected = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A JOIN definition (round 16): the MV materializes
    * `fact ⋈ dim ON fk = pk` with dim columns under the `d_` prefix —
    * [[SinkMvJoin]]'s delta-join decomposition over [[SinkMvDist]]'s
    * distributed bucketed state, so a per-user-grain star-schema rollup
    * needs neither a driver-resident view nor a full rescan.
    */
  private[sources] final case class MvdJoin(dim: String, fk: String, pk: String, dimV: Long)

  private final case class MvdState(
      src: String, groups: Seq[String], gtypes: Seq[String], pred: String,
      srcV: Long, buckets: Int, aggs: Seq[MvAgg], refs: Seq[(Int, String)],
      join: Option[MvdJoin] = None)

  // ---- header ------------------------------------------------------------

  private def headerJson(st: MvdState): String = {
    val aggs = st.aggs
      .map(a => s"""{"n":"${a.name}","k":"${a.kind}","e":"${a.e}"}""")
      .mkString("[", ",", "]")
    val join = st.join.map(j =>
      s""""dim":"${j.dim}","fk":"${j.fk}","pk":"${j.pk}","dimV":${j.dimV},""").getOrElse("")
    s"""{"src":"${st.src}","group":"${st.groups.mkString(",")}",""" +
      s""""gtype":"${st.gtypes.mkString(",")}","pred":"${st.pred}",""" +
      s""""srcV":${st.srcV},"buckets":${st.buckets},$join"aggs":$aggs}"""
  }

  private def writeHeader(mvDir: String, version: Long, st: MvdState): Unit = {
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(mvDir, s"_mvd.tmp-$nonce")
    val w = SinkFs.create(tmp)
    try {
      w.write(headerJson(st)); w.write("\n")
      st.refs.sortBy(r => (r._1, r._2)).foreach { case (b, f) =>
        w.write(s"$b\t$f"); w.write("\n")
      }
    } finally w.close()
    val dest = new Path(mvDir, s"_mvd.v$version.json")
    try SinkFs.moveFresh(tmp, dest)
    catch {
      case e: IllegalArgumentException =>
        SinkFs.delete(tmp)
        throw MvConflict(mvDir, version, e.getMessage)
    }
  }

  def currentVersion(mvDir: String): Long =
    SinkFs.listFileNames(new Path(mvDir)).collect {
      case StateV(n) => n.toLong
    }.foldLeft(0L)(math.max)

  private def readHeaderAt(mvDir: String, v: Long): MvdState = {
    val lines = SinkFs.readLines(new Path(mvDir, s"_mvd.v$v.json"))
    def refsOf: Seq[(Int, String)] = lines.tail.map { l =>
      val i = l.indexOf('\t')
      (l.substring(0, i).toInt, l.substring(i + 1))
    }
    def aggsOf(as: String): Seq[MvAgg] = AggRe.findAllMatchIn(as)
      .map(m => MvAgg(m.group(1), m.group(2), m.group(3))).toSeq
    lines.head match {
      case HeaderJoinRe(s, g, t, pr, sv, b, dim, fk, pk, dv, as) =>
        MvdState(s, g.split(",", -1).toSeq, t.split(",", -1).toSeq, pr,
          sv.toLong, b.toInt, aggsOf(as), refsOf,
          Some(MvdJoin(dim, fk, pk, dv.toLong)))
      case HeaderRe(s, g, t, pr, sv, b, as) =>
        MvdState(s, g.split(",", -1).toSeq, t.split(",", -1).toSeq, pr,
          sv.toLong, b.toInt, aggsOf(as), refsOf)
      case other => sys.error(s"unparseable distributed-MV header at $mvDir: $other")
    }
  }

  def lastSourceVersion(mvDir: String): Long = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir (create it first)")
    readHeaderAt(mvDir, v).srcV
  }

  /** The state segment files of a version — (bucket, file) refs; exposed
    * the way table formats expose their manifests (carry-forward and
    * vacuum behavior is observable, not implied).
    */
  def stateFiles(mvDir: String, v: Long): Seq[(Int, String)] =
    readHeaderAt(mvDir, v).refs

  // ---- row codec (Spark-expression twins of the blob's escape/gcell) ------

  private def escCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "%", "%25"), "\t", "%09"), "\n", "%0A")
  private def unescCol(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c, "%09", "\t"), "%0A", "\n"), "%25", "%")
  private def gcellCol(c: Column): Column =
    when(c.isNull, lit("%N")).otherwise(escCol(c.cast(StringType)))
  private def ungcellCol(c: Column, gtype: String): Column =
    when(c === "%N", lit(null).cast(StringType)).otherwise(unescCol(c))
      .cast(SinkMatView.gdt(gtype))
  /** Long-or-empty value cell, ANSI-safe in both directions. */
  private def cellCol(c: Column): Column =
    coalesce(c.cast(StringType), lit(""))
  private def uncellCol(c: Column): Column =
    when(c === "", lit(null).cast(StringType)).otherwise(c).cast(LongType)

  /** The deterministic group→bucket map, computable on ANY frame carrying
    * the group columns (state rows, delta rows, source rows): xxhash64 of
    * the null-marked, escaped key string. Both sides of every join derive
    * it the same way, so bucket-pruned reads can never miss a group.
    */
  private def bucketCol(st: MvdState, keys: Seq[Column]): Column =
    pmod(xxhash64(concat_ws("", keys.map(gcellCol): _*)), lit(st.buckets))
      .cast(IntegerType)

  private def slotV(i: Int) = s"_v$i"
  private def slotC(i: Int) = s"_c$i"

  private def stateSchema(st: MvdState): StructType =
    StructType(
      st.groups.zip(st.gtypes).map { case (n, t) =>
        StructField(n, SinkMatView.gdt(t), nullable = true)
      } ++ (0 until st.aggs.length).flatMap(i => Seq(
        StructField(slotV(i), LongType, nullable = true),
        StructField(slotC(i), LongType, nullable = true))))

  /** Distributed scan of the state segments (optionally bucket-pruned —
    * file = bucket, so the prune is a file-list filter, zero data IO for
    * untouched buckets).
    */
  private def stateDf(
      spark: SparkSession, mvDir: String, st: MvdState,
      onlyBuckets: Option[Set[Int]]): DataFrame = {
    val refs = onlyBuckets match {
      case Some(bs) => st.refs.filter(r => bs.contains(r._1))
      case None => st.refs
    }
    val schema = stateSchema(st)
    if (refs.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val paths = refs.map { case (_, f) => new Path(mvDir, f).toString }
    val cells = split(col("value"), "\t", -1)
    val g = st.groups.length
    val gcols = st.groups.zip(st.gtypes).zipWithIndex.map { case ((n, t), i) =>
      ungcellCol(element_at(cells, i + 1), t).as(n)
    }
    val vcols = (0 until 2 * st.aggs.length).map { j =>
      val name = if (j < st.aggs.length) slotV(j) else slotC(j - st.aggs.length)
      uncellCol(element_at(cells, g + j + 1)).as(name)
    }
    spark.read.text(paths: _*).select(gcols ++ vcols: _*)
  }

  /** Write a state frame's rows as bucket-pure segment files: a
    * partitioned text write to a job-unique staging dir, then a driver
    * move of O(files) parts into the MV dir under version-unique names.
    * Returns the (bucket, file) refs. The frame must carry the group
    * columns and the 2×|aggs| slots.
    */
  private def writeSegments(
      mvDir: String, version: Long, st: MvdState, state: DataFrame): Seq[(Int, String)] = {
    val na = st.aggs.length
    val lineCells =
      st.groups.map(n => gcellCol(col(n))) ++
        (0 until na).map(i => cellCol(col(slotV(i)))) ++
        (0 until na).map(i => cellCol(col(slotC(i))))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(mvDir, s"_mvd.stage-$nonce")
    state
      .withColumn("_b", bucketCol(st, st.groups.map(col)))
      .select(concat_ws("\t", lineCells: _*).as("value"), col("_b"))
      // cluster by bucket BEFORE the dynamic-partition write: one task
      // per bucket writes one file, instead of every upstream partition
      // opening a file per bucket (≤ tasks × buckets small files and a
      // committer pass over all of them)
      .repartition(math.max(1, st.buckets), col("_b"))
      .write.partitionBy("_b").mode("overwrite").text(staging.toString)
    val fs = SinkFs.fsOf(staging)
    val refs = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    try {
      fs.listStatus(staging).filter(_.isDirectory).foreach { d =>
        val b = d.getPath.getName.stripPrefix("_b=").toInt
        fs.listStatus(d.getPath).filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .zipWithIndex.foreach { case (p, k) =>
            val name = s"state-v$version-b$b-$nonce-$k.tsv"
            SinkFs.moveOver(p.getPath, new Path(mvDir, name))
            refs += ((b, name))
          }
      }
    } finally { fs.delete(staging, true); () }
    refs.toSeq
  }

  /** The state slot columns a full build aggregates into: per agg, its
    * VALUE slot and its non-null COUNTER slot (sum/xor need the counter
    * for SQL NULL-ness; the rest carry 0) — one builder shared by the
    * single-table and join creates.
    */
  private def aggSlots(aggs: Seq[MvAgg]): (Seq[Column], Seq[Column]) = (
    aggs.zipWithIndex.map { case (a, i) => SinkMatView.aggColumn(a).as(slotV(i)) },
    aggs.zipWithIndex.map { case (a, i) =>
      if (a.kind == "sum" || a.kind == "xor")
        count(when(expr(a.e).isNotNull, 1)).as(slotC(i))
      else lit(0L).as(slotC(i))
    })

  // ---- create --------------------------------------------------------------

  /** Full-scan creation pinned at the source's current version — the
    * blob MV's contract, but the aggregation result is WRITTEN
    * DISTRIBUTED, never collected.
    */
  def create(
      spark: SparkSession, srcDir: String, mvDir: String,
      groups: Seq[String], aggs: Seq[MvAgg], where: String = "",
      buckets: Int = 16): Long = {
    SinkMatView.validate(groups, aggs, where)
    require(buckets >= 1 && buckets <= 4096, s"buckets out of range: $buckets")
    require(currentVersion(mvDir) == 0L,
      s"distributed materialized view already exists at $mvDir")
    val srcV = ShardSink.currentManifestVersion(srcDir)
    require(srcV > 0L, s"no committed version at $srcDir — create the MV after the first commit")
    val schema = ShardSink.schemaAtVersion(srcDir, srcV)
    groups.foreach(g => require(schema.fieldNames.contains(g),
      s"group column '$g' not in ${schema.fieldNames.mkString(",")}"))
    val gtypes = groups.map(g => SinkMatView.gtypeOf(schema(g).dataType))
    val st = MvdState(srcDir, groups, gtypes, where, srcV, buckets, aggs, Nil)
    val (aggCols, nnCols) = aggSlots(aggs)
    val full = SinkMatView.filtered(SinkMatView.srcAt(spark, srcDir, srcV), where)
      .groupBy(groups.map(col): _*)
      .agg(aggCols.head, aggCols.tail ++ nnCols: _*)
    val refs = writeSegments(mvDir, 1L, st, full)
    writeHeader(mvDir, 1L, st.copy(refs = refs))
    srcV
  }

  /** JOIN-MV creation over DISTRIBUTED state: `SELECT groups, aggs FROM
    * fact ⋈ dim ON fk = pk [WHERE pred] GROUP BY`, dim columns under the
    * `d_` prefix ([[SinkMvJoin]]'s definition surface, this object's
    * bucketed-segment state) — the per-user-grain star-schema rollup
    * neither feature alone could serve. Returns (factV, dimV).
    */
  def createJoin(
      spark: SparkSession, factDir: String, dimDir: String, mvDir: String,
      fk: String, pk: String, groups: Seq[String], aggs: Seq[MvAgg],
      where: String = "", buckets: Int = 16): (Long, Long) = {
    SinkMatView.validate(groups, aggs, where)
    require(buckets >= 1 && buckets <= 4096, s"buckets out of range: $buckets")
    require(currentVersion(mvDir) == 0L,
      s"distributed materialized view already exists at $mvDir")
    val factV = ShardSink.currentManifestVersion(factDir)
    val dimV = ShardSink.currentManifestVersion(dimDir)
    require(factV > 0L && dimV > 0L,
      s"create the join MV after both tables' first commits ($factDir v$factV, $dimDir v$dimV)")
    val fSchema = ShardSink.schemaAtVersion(factDir, factV)
    val dSchema = ShardSink.schemaAtVersion(dimDir, dimV)
    require(fSchema.fieldNames.contains(fk), s"join key '$fk' not in fact ${fSchema.fieldNames.mkString(",")}")
    require(dSchema.fieldNames.contains(pk), s"join key '$pk' not in dim ${dSchema.fieldNames.mkString(",")}")
    val gtypes = SinkMvJoin.resolveJoinGtypes(fSchema, dSchema, groups)
    val dim = SinkMatView.srcAt(spark, dimDir, dimV)
    SinkMvJoin.requireUniqueKeys(dim, pk, dim.select(col(pk)))
    val st = MvdState(factDir, groups, gtypes, where, factV, buckets, aggs, Nil,
      Some(MvdJoin(dimDir, fk, pk, dimV)))
    val (aggCols, nnCols) = aggSlots(aggs)
    val full = SinkMatView.filtered(
      SinkMvJoin.joinedFrame(
        SinkMatView.srcAt(spark, factDir, factV), SinkMvJoin.dimView(dim), fk, pk), where)
      .groupBy(groups.map(col): _*)
      .agg(aggCols.head, aggCols.tail ++ nnCols: _*)
    val refs = writeSegments(mvDir, 1L, st, full)
    writeHeader(mvDir, 1L, st.copy(refs = refs))
    (factV, dimV)
  }

  /** (fact watermark, dim watermark) of a distributed JOIN MV. */
  def lastSourceVersions(mvDir: String): (Long, Long) = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    val j = st.join.getOrElse(
      throw new IllegalArgumentException(s"the MV at $mvDir is single-table"))
    (st.srcV, j.dimV)
  }

  // ---- refresh ---------------------------------------------------------------

  /** Refresh to the source's (and, for a join MV, the dim's) current
    * version. The returned stats' from/to versions are FACT-centric: a
    * dim-only window folds with fromV == toV and applied = true —
    * progress of both watermarks is read via [[lastSourceVersions]].
    */
  def refresh(spark: SparkSession, srcDir: String, mvDir: String): RefreshStats = {
    var attempt = 0
    while (true) {
      val stateV = currentVersion(mvDir)
      require(stateV > 0L, s"no distributed materialized view at $mvDir (create it first)")
      val st = readHeaderAt(mvDir, stateV)
      require(st.src == srcDir, s"MV at $mvDir materializes ${st.src}, not $srcDir")
      val toV = ShardSink.currentManifestVersion(srcDir)
      val dimTo = st.join.map(j => ShardSink.currentManifestVersion(j.dim))
      if (toV <= st.srcV && st.join.zip(dimTo).forall { case (j, dv) => dv <= j.dimV })
        return RefreshStats(st.srcV, st.srcV, 0L, 0L, stateV, applied = false)
      try return st.join match {
        case Some(j) => joinRefreshOnce(spark, mvDir, st, j, stateV, toV, dimTo.get)
        case None => refreshOnce(spark, srcDir, mvDir, st, stateV, toV)
      }
      catch {
        case _: MvConflict if attempt < 5 => attempt += 1 // re-read, re-derive
        case c: MvConflict => throw c
      }
    }
    sys.error("unreachable")
  }

  /** Null-safe equi-join on the group columns: the right side's keys are
    * renamed `_r_<k>` (caller reads them back under that name). NULL
    * group values match NULL — SQL's grouping identity, not its equality.
    */
  private def nsJoin(
      l: DataFrame, r: DataFrame, keys: Seq[String], how: String): DataFrame = {
    val rr = keys.foldLeft(r)((df, k) => df.withColumnRenamed(k, s"_r_$k"))
    val cond = keys.map(k => l(k) <=> rr(s"_r_$k")).reduce(_ && _)
    l.join(rr, cond, how)
  }

  /** STREAMING maintenance for the distributed MV — the `foreachBatch`
    * body, exactly-once by the header watermark like the blob MV's:
    * replayed batches are recorded no-ops, a gap fast-forwards only
    * after the skipped window is PROVEN change-free (no-data commits:
    * OPTIMIZE/ZORDER/ALTER), and a gap hiding a data commit fails
    * loudly. The fold itself is the batch refresh's distributed plan.
    */
  def refreshFromChanges(
      spark: SparkSession, srcDir: String, mvDir: String,
      ch: DataFrame, toV: Long): RefreshStats = {
    var attempt = 0
    while (true) {
      val stateV = currentVersion(mvDir)
      require(stateV > 0L, s"no distributed materialized view at $mvDir (create it first)")
      val st = readHeaderAt(mvDir, stateV)
      require(st.src == srcDir, s"MV at $mvDir materializes ${st.src}, not $srcDir")
      require(st.join.isEmpty,
        "streaming maintenance drives a SINGLE table's change feed; a join MV " +
          "refreshes from both tables via refresh()")
      if (toV <= st.srcV) // replayed or pre-create commit: already covered
        return RefreshStats(st.srcV, st.srcV, 0L, 0L, stateV, applied = false)
      if (toV > st.srcV + 1L) {
        val gapRows =
          SinkMatView.changes(spark, srcDir, st.srcV, toV - 1L).limit(1).count()
        require(gapRows == 0L,
          s"streaming MV gap at $mvDir: batch carries commit $toV but the " +
            s"view reflects ${st.srcV} and commits (${st.srcV}, ${toV - 1L}] " +
            "carry change rows — commits must apply in order")
      }
      val cached = ch.persist()
      try return foldBatch(spark, mvDir, st, stateV, cached,
        SinkMvJoin.signOf(col("_change_type")),
        () => SinkMatView.filtered(SinkMatView.srcAt(spark, srcDir, toV), st.pred),
        st.copy(srcV = toV), st.srcV, toV)
      catch {
        case _: MvConflict if attempt < 5 => attempt += 1
        case c: MvConflict => throw c
      } finally { cached.unpersist(); () }
    }
    sys.error("unreachable")
  }

  private def refreshOnce(
      spark: SparkSession, srcDir: String, mvDir: String,
      st: MvdState, stateV: Long, toV: Long): RefreshStats = {
    val ch = SinkMatView.changes(spark, srcDir, st.srcV, toV).persist()
    try foldBatch(spark, mvDir, st, stateV, ch,
      SinkMvJoin.signOf(col("_change_type")),
      () => SinkMatView.filtered(SinkMatView.srcAt(spark, srcDir, toV), st.pred),
      st.copy(srcV = toV), st.srcV, toV)
    finally { ch.unpersist(); () }
  }

  /** The JOIN refresh (round 16): the same delta-join decomposition as
    * [[SinkMvJoin]] — [Δd ⋈ f@old] ∪ [Δf ⋈ d'@new], signed — feeding
    * the DISTRIBUTED fold; the dirty recompute is a fact⋈dim join at
    * the target versions. Uniqueness of changed dim keys is re-checked
    * per window, as in the blob join MV.
    */
  private def joinRefreshOnce(
      spark: SparkSession, mvDir: String, st: MvdState, j: MvdJoin,
      stateV: Long, factTo: Long, dimTo: Long): RefreshStats = {
    // parts expose their snapshots' OWN columns and union by name with
    // null-fill — a column added between the watermarks is NULL in the
    // old-snapshot part, which is what those rows held there (a fixed
    // newest-schema column list would fail to resolve on the pinned old
    // snapshot and wedge the refresh — review fix, same as SinkMvJoin)
    val parts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (dimTo > j.dimV) {
      val dCh = SinkMatView.changes(spark, j.dim, j.dimV, dimTo)
        .withColumn("_sign", SinkMvJoin.signOf(col("_change_type")))
      val dChPrefixed = SinkMvJoin.dimView(dCh, extra = Seq("_sign"))
      SinkMvJoin.requireUniqueKeys(
        SinkMatView.srcAt(spark, j.dim, dimTo), j.pk,
        dChPrefixed.select(col(s"d_${j.pk}").as(j.pk)))
      parts += SinkMvJoin.joinedFrame(
        SinkMatView.srcAt(spark, st.src, st.srcV), dChPrefixed, j.fk, j.pk)
    }
    if (factTo > st.srcV) {
      val fCh = SinkMatView.changes(spark, st.src, st.srcV, factTo)
        .withColumn("_sign", SinkMvJoin.signOf(col("_change_type")))
        .drop("_change_type", "_commit_version")
      parts += SinkMvJoin.joinedFrame(
        fCh, SinkMvJoin.dimView(SinkMatView.srcAt(spark, j.dim, dimTo)), j.fk, j.pk)
    }
    val ch = parts.reduce(_.unionByName(_, allowMissingColumns = true)).persist()
    try foldBatch(spark, mvDir, st, stateV, ch, col("_sign"),
      () => SinkMatView.filtered(
        SinkMvJoin.joinedFrame(
          SinkMatView.srcAt(spark, st.src, factTo),
          SinkMvJoin.dimView(SinkMatView.srcAt(spark, j.dim, dimTo)),
          j.fk, j.pk), st.pred),
      st.copy(srcV = factTo, join = Some(j.copy(dimV = dimTo))), st.srcV, factTo)
    finally { ch.unpersist(); () }
  }

  /** The distributed fold over ONE pre-signed change frame. `sign` and
    * the dirty-recompute source are injected so the single-table path
    * (change feed + table scan) and the join path (delta-join
    * contributions + fact⋈dim scan) share every line of the fold;
    * `nextSt` carries the advanced watermark(s) into the header flip.
    */
  private def foldBatch(
      spark: SparkSession, mvDir: String,
      st: MvdState, stateV: Long, ch: DataFrame,
      sign: Column, recomputeSrc: () => DataFrame,
      nextSt: MvdState, fromV: Long, toV: Long): RefreshStats = {
    val na = st.aggs.length
    val keys = st.groups
    val next = stateV + 1L
    locally {
      val chF = SinkMatView.filtered(ch, st.pred)
      // ---- the linear (row-grain) delta: one distributed aggregation
      val deltaCols = st.aggs.zipWithIndex.flatMap { case (a, i) =>
        a.kind match {
          case "count" => Seq(sum(sign).as(s"_d$i"))
          case "sum" => Seq(
            sum(sign * expr(a.e).cast(LongType)).as(s"_d$i"),
            sum(sign * when(expr(a.e).isNotNull, 1L).otherwise(0L)).as(s"_dn$i"))
          case "xor" => Seq(
            expr(s"bit_xor(cast((${a.e}) as bigint))").as(s"_d$i"),
            sum(sign * when(expr(a.e).isNotNull, 1L).otherwise(0L)).as(s"_dn$i"))
          case _ => Seq.empty
        }
      }
      var delta = chF
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("_chrows"), deltaCols: _*)
      // ---- the value-grain extreme deltas, one per distinct expression
      val extremeExprs = st.aggs.filter(a => a.kind == "min" || a.kind == "max")
        .map(_.e).distinct
      extremeExprs.zipWithIndex.foreach { case (e, j) =>
        val per = chF
          .groupBy(keys.map(col) :+ expr(e).cast(LongType).as("_mv_v"): _*)
          .agg(sum(sign).as("_net"))
          .groupBy(keys.map(col): _*)
          .agg(
            min(when(col("_net") > 0L, col("_mv_v"))).as(s"_pmin$j"),
            max(when(col("_net") > 0L, col("_mv_v"))).as(s"_pmax$j"),
            min(when(col("_net") < 0L, col("_mv_v"))).as(s"_nmin$j"),
            max(when(col("_net") < 0L, col("_mv_v"))).as(s"_nmax$j"))
        val joined = nsJoin(delta, per, keys, "left")
        delta = joined.select(
          keys.map(joined(_)) ++ delta.columns.filterNot(keys.contains).map(joined(_)) ++
            Seq(s"_pmin$j", s"_pmax$j", s"_nmin$j", s"_nmax$j").map(joined(_)): _*)
      }
      val deltaC = delta.persist()
      try {
        // the ONLY driver materializations: per-bucket rollups (≤ buckets
        // rows — touched ids and the window's change-row total in ONE
        // job) and one scalar — never rows proportional to groups
        val perBucket = deltaC
          .groupBy(bucketCol(st, keys.map(col)).as("_b"))
          .agg(sum("_chrows").as("_n"))
          .collect()
        val touched = perBucket.map(_.getInt(0)).toSet
        driverRowsCollected.addAndGet(touched.size.toLong)
        if (touched.isEmpty) {
          // change-free window (no-data commits / everything
          // predicate-filtered): advance the watermark, carry all refs
          writeHeader(mvDir, next, nextSt)
          return RefreshStats(fromV, toV, 0L, 0L, next, applied = true)
        }
        val changeRows = perBucket.map(_.getLong(1)).sum

        // ---- fold: state(touched) ⟗ delta, null-safe on the group key
        val state = stateDf(spark, mvDir, st, Some(touched))
          .withColumn("_present", lit(1))
        val j = nsJoin(state, deltaC.withColumn("_dpresent", lit(1)), keys, "full_outer")
        val had = j("_present").isNotNull
        def keyOut(k: String, i: Int): Column = coalesce(j(k), j(s"_r_$k")).as(k)
        val exprIdx = extremeExprs.zipWithIndex.toMap
        val countIdx = st.aggs.indexWhere(_.kind == "count")
        val foldCols = scala.collection.mutable.ArrayBuffer[Column]()
        val dirtyFlags = scala.collection.mutable.ArrayBuffer[Column]()
        st.aggs.zipWithIndex.foreach { case (a, i) =>
          val sv = j(slotV(i)); val sc = j(slotC(i))
          a.kind match {
            case "count" =>
              val n = coalesce(sv, lit(0L)) + coalesce(j(s"_d$i"), lit(0L))
              // the blob fold's incomplete-feed sentinel, distributed:
              // a negative count means retractions for rows the state
              // never saw — fail the refresh, never write the drift
              foldCols += when(n < 0L, expr(
                "raise_error('MV fold drove a group count negative: change feed incomplete?')")
                .cast(LongType)).otherwise(n).as(slotV(i))
              foldCols += lit(0L).as(slotC(i))
            case "sum" =>
              val nn = coalesce(sc, lit(0L)) + coalesce(j(s"_dn$i"), lit(0L))
              foldCols += when(nn === 0L, lit(null).cast(LongType))
                .otherwise(coalesce(sv, lit(0L)) + coalesce(j(s"_d$i"), lit(0L)))
                .as(slotV(i))
              foldCols += nn.as(slotC(i))
            case "xor" =>
              val nn = coalesce(sc, lit(0L)) + coalesce(j(s"_dn$i"), lit(0L))
              foldCols += when(nn === 0L, lit(null).cast(LongType))
                .otherwise(coalesce(sv, lit(0L)).bitwiseXOR(coalesce(j(s"_d$i"), lit(0L))))
                .as(slotV(i))
              foldCols += nn.as(slotC(i))
            case "min" | "max" =>
              val ji = exprIdx(a.e)
              val isMin = a.kind == "min"
              val pos = if (isMin) j(s"_pmin$ji") else j(s"_pmax$ji")
              val neg = if (isMin) j(s"_nmin$ji") else j(s"_nmax$ji")
              val clean = if (isMin) least(sv, pos) else greatest(sv, pos)
              def touches(s: Column, n: Column) = if (isMin) n <= s else n >= s
              def covers(p: Column, n: Column) = if (isMin) p <= n else p >= n
              // the blob's foldExtreme decision table, column-for-column
              val dirty = had && (
                (sv.isNotNull && neg.isNotNull && touches(sv, neg) &&
                  !(pos.isNotNull && covers(pos, neg))) ||
                  (sv.isNull && neg.isNotNull))
              foldCols += clean.as(slotV(i))
              foldCols += lit(0L).as(slotC(i))
              dirtyFlags += coalesce(dirty, lit(false)).as(s"_dirty$i")
          }
        }
        val folded0 = j.select(
          keys.zipWithIndex.map { case (k, i) => keyOut(k, i) } ++
            foldCols ++ dirtyFlags: _*)
        // liveness: a group whose count reached zero leaves the view
        val folded = folded0.where(col(slotV(countIdx)) > 0L).persist()
        try {
          val dirtyAggIdx = st.aggs.zipWithIndex
            .filter { case (a, _) => a.kind == "min" || a.kind == "max" }.map(_._2)
          val anyDirty =
            if (dirtyAggIdx.isEmpty) lit(false)
            else dirtyAggIdx.map(i => col(s"_dirty$i")).reduce(_ || _)
          val dirtyKeys = folded.where(anyDirty).select(keys.map(col): _*)
          val nDirty = dirtyKeys.count()
          driverRowsCollected.incrementAndGet()
          // ---- dirty extremes: ONE pruned recompute join at toV — the
          // source scan keeps its file skipping (the dirty keys arrive as
          // a join side, typically broadcast), and only dirty groups
          // re-aggregate
          val fixed: Option[DataFrame] =
            if (nDirty == 0L) None
            else {
              val src = recomputeSrc()
              val jj = nsJoin(src, dirtyKeys.distinct(), keys, "inner")
              Some(jj
                .groupBy(keys.map(jj(_)): _*)
                .agg(
                  dirtyAggIdx.map(i =>
                    SinkMatView.aggColumn(st.aggs(i)).as(s"_fx$i")).head,
                  dirtyAggIdx.drop(1).map(i =>
                    SinkMatView.aggColumn(st.aggs(i)).as(s"_fx$i")): _*))
            }
          val finalState = fixed match {
            case None => folded.select(
              (keys.map(col) ++
                (0 until na).map(i => col(slotV(i))) ++
                (0 until na).map(i => col(slotC(i)))): _*)
            case Some(fx) =>
              val jf = nsJoin(folded, fx, keys, "left")
              jf.select(
                (keys.map(jf(_)) ++
                  (0 until na).map { i =>
                    if (dirtyAggIdx.contains(i))
                      when(jf(s"_dirty$i"), jf(s"_fx$i")).otherwise(jf(slotV(i)))
                        .as(slotV(i))
                    else jf(slotV(i)).as(slotV(i))
                  } ++
                  (0 until na).map(i => jf(slotC(i)).as(slotC(i)))): _*)
          }
          // one-shot interleave for the concurrency spec — the window a
          // competing refresh can win (same hook as the blob MV's)
          val barrier = refreshBarrier.getAndSet(null)
          if (barrier != null) barrier()
          // ---- write touched buckets, carry the rest by reference
          val written = writeSegments(mvDir, next, st, finalState)
          val carried = st.refs.filterNot(r => touched.contains(r._1))
          writeHeader(mvDir, next, nextSt.copy(refs = written ++ carried))
          RefreshStats(fromV, toV, changeRows, nDirty, next, applied = true)
        } finally { folded.unpersist(); () }
      } finally { deltaC.unpersist(); () }
    }
  }

  // ---- read / vacuum -------------------------------------------------------

  /** The MV contents as a DISTRIBUTED DataFrame `(groups…, aggs…)` —
    * reads the state segments only, never the source.
    */
  def read(spark: SparkSession, mvDir: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(currentVersion(mvDir))
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    stateDf(spark, mvDir, st, None).select(outputProjection(st): _*)
  }

  // ---- driver-checked query ------------------------------------------------

  /** Driver-checked DISTRIBUTED MV STATE (round 16): a per-`uid` grain
    * rollup (1200 groups — the cardinality class the blob MV keeps on
    * the driver; here every group lives in bucketed state segments and
    * the driver only ever collects bucket ids). Lifecycle: two ingests,
    * create, an in-place UPDATE whose net extremes dirty every updated
    * group's `min_len` (300-group distributed recompute), a tail DELETE
    * that removes 500 groups' recorded `max_doc` (500 more), and a late
    * append that extends extremes on the clean fast-path. The final
    * 1200-row view plus the refresh bookkeeping sits under the DuckDB
    * hash gate — the incremental distributed fold equals a full
    * recompute, value for value.
    */
  def mvDistReport(
      spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvd:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvd_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mvd", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvd.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvd.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvd.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvd.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2400").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    docs(0L, 0L).writeTo("graft_mvd.docs_mvd").append() // v1: bootstrap
    s.sql("ALTER TABLE graft_mvd.docs_mvd ADD COLUMN uid BIGINT") // v2
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi)
        .withColumn("uid", (col("doc_id") % 1200L).cast("long"))
        .writeTo("graft_mvd.docs_mvd").append()
    ingest(0L, 800L) // v3
    ingest(800L, 2000L) // v4
    val dir = new java.io.File(root, "docs_mvd").getPath
    val mvDir = dir + ".mvd"
    create(s, dir, mvDir, Seq("uid"), Seq(
      MvAgg("n_docs", "count"),
      MvAgg("sum_ids", "sum", "doc_id"),
      MvAgg("xor_ids", "xor", "doc_id"),
      MvAgg("max_doc", "max", "doc_id"),
      MvAgg("sum_len", "sum", "length(body)"),
      MvAgg("min_len", "min", "length(body)")), buckets = 8)
    // v5: min_len's 32 is net-removed, 33 does not re-cover → 300 dirty
    s.sql("UPDATE graft_mvd.docs_mvd SET body = concat(body, '!') WHERE doc_id < 300")
    // v6: uids 300..799 lose doc uid+1200 — their recorded max → 500 dirty
    s.sql("DELETE FROM graft_mvd.docs_mvd WHERE doc_id >= 1500")
    // ONE refresh covers BOTH commits: the multi-commit window folds the
    // two dirty classes (min via update, max via delete) in one pass
    val r1 = refresh(s, dir, mvDir)
    // v7: uids 800..1199 regain a row; extremes extend on the fast path
    ingest(2000L, 2400L)
    val r2 = refresh(s, dir, mvDir)
    val stats = Seq(r1, r2)
    read(s, mvDir)
      .withColumn("n_refreshes", lit(stats.count(_.applied).toLong))
      .withColumn("change_rows", lit(stats.map(_.changeRows).sum))
      .withColumn("dirty_groups", lit(stats.map(_.dirtyGroups).sum))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("src_version", lit(lastSourceVersion(mvDir)))
      .orderBy("uid")
  }

  /** DuckDB re-derivation: the live set is `doc_id < 1500 OR doc_id >=
    * 2000` with 33-char bodies below 300, grouped per uid = doc_id %
    * 1200 — plus the lifecycle constants (2 refreshes — the first covers
    * the UPDATE + DELETE window in one fold; 1100 + 400 change rows;
    * 300 + 500 dirty recomputes in that one pass; MV v3 = create + 2;
    * source v7 = bootstrap + ALTER + 2 ingests + UPDATE + DELETE +
    * append).
    */
  val mvDistReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 1200 AS uid,
      |         CAST(CASE WHEN doc_id < 300 THEN 33 ELSE 32 END AS BIGINT) AS blen
      |  FROM range(0, 2400) t(doc_id)
      |  WHERE doc_id < 1500 OR doc_id >= 2000)
      |SELECT uid, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(SUM(blen) AS BIGINT) AS sum_len,
      |       CAST(MIN(blen) AS BIGINT) AS min_len,
      |       CAST(2 AS BIGINT) AS n_refreshes,
      |       CAST(1500 AS BIGINT) AS change_rows,
      |       CAST(800 AS BIGINT) AS dirty_groups,
      |       CAST(3 AS BIGINT) AS mv_version,
      |       CAST(7 AS BIGINT) AS src_version
      |FROM g GROUP BY uid ORDER BY uid""".stripMargin

  /** Driver-checked DISTRIBUTED JOIN MV (round 16): the round's two MV
    * features composed — `fact ⋈ dim GROUP BY (d_region, uid)` at
    * per-uid grain (hundreds of groups across region splits) with state
    * in bucketed segments and BOTH change feeds folding distributed: a
    * fact tail-DELETE (dirty extremes recomputed through a pruned
    * fact⋈dim join), a dim UPDATE that moves every shard-5 row between
    * region groups with no rescan, and a late fact append against the
    * updated dim. The full group table plus lifecycle bookkeeping sits
    * under the DuckDB hash gate.
    */
  def mvJoinDistReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvjd:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvjd_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mvjd", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvjd.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvjd.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvjd.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvjd.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2400").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    docs(0L, 0L).writeTo("graft_mvjd.dim_mvjd").append() // d1
    s.sql("ALTER TABLE graft_mvjd.dim_mvjd ADD COLUMN region STRING") // d2
    docs(0L, 16L)
      .withColumn("region", concat(lit("r"), (col("doc_id") % 3).cast("string")))
      .writeTo("graft_mvjd.dim_mvjd").append() // d3: all 16 keys mapped
    docs(0L, 0L).writeTo("graft_mvjd.fact_mvjd").append() // f1
    s.sql("ALTER TABLE graft_mvjd.fact_mvjd ADD COLUMN uid BIGINT") // f2
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi).withColumn("uid", (col("doc_id") % 300L).cast("long"))
        .writeTo("graft_mvjd.fact_mvjd").append()
    ingest(0L, 1200L) // f3
    val factDir = new java.io.File(root, "fact_mvjd").getPath
    val dimDir = new java.io.File(root, "dim_mvjd").getPath
    val mvDir = factDir + ".mvjd"
    createJoin(s, factDir, dimDir, mvDir, fk = "shard", pk = "doc_id",
      groups = Seq("d_region", "uid"), aggs = Seq(
        MvAgg("n_docs", "count"),
        MvAgg("sum_ids", "sum", "doc_id"),
        MvAgg("xor_ids", "xor", "doc_id"),
        MvAgg("max_doc", "max", "doc_id")), buckets = 8)
    s.sql("DELETE FROM graft_mvjd.fact_mvjd WHERE doc_id >= 900") // f4
    val r1 = refresh(s, factDir, mvDir)
    s.sql("UPDATE graft_mvjd.dim_mvjd SET region = 'rX' WHERE doc_id = 5") // d4
    val r2 = refresh(s, factDir, mvDir)
    ingest(1200L, 1500L) // f5
    val r3 = refresh(s, factDir, mvDir)
    val stats = Seq(r1, r2, r3)
    val (fv, dv) = lastSourceVersions(mvDir)
    read(s, mvDir)
      .withColumn("n_refreshes", lit(stats.count(_.applied).toLong))
      .withColumn("change_rows", lit(stats.map(_.changeRows).sum))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("fact_version", lit(fv))
      .withColumn("dim_version", lit(dv))
      .orderBy("d_region", "uid")
  }

  /** DuckDB re-derivation: live fact rows are `doc_id < 900 OR 1200 <=
    * doc_id < 1500`; uid = doc % 300; the region of shard s is rX for 5
    * (the dim update — applied to pre-existing AND late-appended rows
    * alike), else r(s % 3). Constants: 3 refreshes; 300 (tail delete,
    * all shards dim-mapped) + 112 (dim update: 56 live shard-5 rows × ±)
    * + 300 (append) = 712 change rows; MV v4 = create + 3; fact v5, dim
    * v4.
    */
  val mvJoinDistReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 300 AS uid,
      |         CASE WHEN doc_id % 16 = 5 THEN 'rX'
      |              ELSE 'r' || CAST((doc_id % 16) % 3 AS VARCHAR) END AS d_region
      |  FROM range(0, 1500) t(doc_id)
      |  WHERE doc_id < 900 OR doc_id >= 1200)
      |SELECT d_region, uid, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(3 AS BIGINT) AS n_refreshes,
      |       CAST(712 AS BIGINT) AS change_rows,
      |       CAST(4 AS BIGINT) AS mv_version,
      |       CAST(5 AS BIGINT) AS fact_version,
      |       CAST(4 AS BIGINT) AS dim_version
      |FROM g GROUP BY d_region, uid ORDER BY d_region, uid""".stripMargin

  /** O(one bucket) POINT READ of the view — the KV-probe pattern over MV
    * state: the key's bucket is derived with the SAME Spark expression
    * the writers use (evaluated on a one-row frame, so it can never
    * drift from the write-side hash), and only that bucket's segment
    * files are opened. A per-user-grain rollup answers a single-user
    * probe reading one segment, not the view. `key` gives one value per
    * group column (null = the NULL group).
    */
  def lookup(spark: SparkSession, mvDir: String, key: Seq[Any]): DataFrame = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    require(key.length == st.groups.length,
      s"lookup key has ${key.length} values for ${st.groups.length} group columns")
    val keySchema = StructType(st.groups.zip(st.gtypes).map { case (n, t) =>
      StructField(n, SinkMatView.gdt(t), nullable = true)
    })
    val keyDf = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row.fromSeq(key)),
      keySchema)
    val b = keyDf.select(bucketCol(st, st.groups.map(col)).as("_b"))
      .collect().head.getInt(0)
    driverRowsCollected.incrementAndGet()
    val pred = st.groups.zip(key).map { case (g, kv) =>
      if (kv == null) col(g).isNull else col(g) === lit(kv)
    }.reduce(_ && _)
    stateDf(spark, mvDir, st, Some(Set(b)))
      .where(pred)
      .select(outputProjection(st): _*)
  }

  /** The view's USER-FACING projection (groups, then each agg's value
    * slot under its declared name) — one definition for read and lookup.
    */
  private def outputProjection(st: MvdState): Seq[Column] =
    st.groups.map(col) ++
      st.aggs.zipWithIndex.map { case (a, i) => col(slotV(i)).as(a.name) }

  /** Re-bucket the state into `newBuckets` segments — the maintenance op
    * for a view whose group cardinality outgrew its bucket count (fat
    * buckets make every refresh rewrite outsized files) or shrank below
    * it (needless small files). ONE distributed rewrite of the whole
    * state under the new bucket function, flipped as a new version with
    * UNCHANGED watermarks — refreshes before and after see the same
    * view; only the carry-forward granularity changes. Races with a
    * concurrent refresh resolve by the ordinary flip election.
    */
  def rebucket(spark: SparkSession, mvDir: String, newBuckets: Int): Unit = {
    require(newBuckets >= 1 && newBuckets <= 4096, s"buckets out of range: $newBuckets")
    var attempt = 0
    while (true) {
      val stateV = currentVersion(mvDir)
      require(stateV > 0L, s"no distributed materialized view at $mvDir")
      val st = readHeaderAt(mvDir, stateV)
      if (st.buckets == newBuckets) {
        // a lost race against a concurrent rebucket to the SAME count is
        // the desired state, not an error (review fix); only a first
        // attempt on an already-matching MV refuses as a misuse signal
        if (attempt > 0) return
        throw new IllegalArgumentException(
          s"the MV at $mvDir already has $newBuckets buckets")
      }
      val newSt = st.copy(buckets = newBuckets)
      val full = stateDf(spark, mvDir, st, None)
      try {
        val refs = writeSegments(mvDir, stateV + 1L, newSt, full)
        writeHeader(mvDir, stateV + 1L, newSt.copy(refs = refs))
        return
      } catch {
        case _: MvConflict if attempt < 5 => attempt += 1
        case c: MvConflict => throw c
      }
    }
  }

  /** Sweep superseded headers and every state segment no RETAINED header
    * references, plus aged staging/tmp litter from crashed flips. Carried
    * (shared) segments survive as long as any retained version lists
    * them. Age-gating protects an in-flight refresh's already-moved
    * segments, exactly like the table vacuum's tmp rule.
    */
  def vacuum(
      mvDir: String, retainVersions: Int = 1,
      olderThanMillis: Long = 7L * 24 * 3600 * 1000L): Seq[String] = {
    require(retainVersions >= 1, "an MV must retain at least its current state")
    val cur = currentVersion(mvDir)
    require(cur > 0L, s"no distributed materialized view at $mvDir")
    val floor = math.max(1L, cur - retainVersions + 1L)
    val dirPath = new Path(mvDir)
    val fs = SinkFs.fsOf(dirPath)
    val cutoff = System.currentTimeMillis() - olderThanMillis
    val names = SinkFs.listFileNames(dirPath)
    // a prior tighter vacuum may have swept versions above today's floor:
    // only read headers that still EXIST (review fix — a missing header
    // is already-swept history, not an error)
    val present: Set[Long] = names.collect { case StateV(n) => n.toLong }.toSet
    val referenced: Set[String] =
      (floor to cur).filter(present)
        .flatMap(v => readHeaderAt(mvDir, v).refs.map(_._2)).toSet
    val swept = names.filter {
      case StateV(n) => n.toLong < floor
      case n if n.startsWith("state-") =>
        !referenced.contains(n) &&
          fs.getFileStatus(new Path(mvDir, n)).getModificationTime <= cutoff
      case n => n.startsWith("_mvd.tmp-") &&
        fs.getFileStatus(new Path(mvDir, n)).getModificationTime <= cutoff
    }.sorted
    swept.foreach(n => SinkFs.delete(new Path(mvDir, n)))
    // crashed staging DIRECTORIES (listFileNames sees files only)
    val stages = fs.listStatus(dirPath).filter(s => s.isDirectory &&
      s.getPath.getName.startsWith("_mvd.stage-") &&
      s.getModificationTime <= cutoff)
    stages.foreach(s => fs.delete(s.getPath, true))
    swept ++ stages.map(_.getPath.getName).sorted
  }
}
