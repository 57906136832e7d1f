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
  // "hashv" (absent in pre-round-17 headers → 1) versions the group→bucket
  // hash INPUT: v1 joined key cells with the control char U+0001, which
  // escCol does NOT escape, so multi-column keys containing that literal
  // char shared a hash input (deterministic on both read/write sides, so correct, but
  // adversarially skewable); v2 joins cells with a TAB, which gcellCol
  // escapes OUT of cell content, so the input is unambiguous for every key
  // shape. Existing MVs keep their persisted assignment until a `rebucket`
  // migrates them.
  private val HeaderRe =
    ("""\{"src":"([^"]*)","group":"([^"]*)","gtype":"([^"]*)",""" +
      """"pred":"([^"]*)","srcV":(\d+),"buckets":(\d+),(?:"hashv":(\d+),)?"aggs":\[(.*)\]\}""").r
  private val HeaderJoinRe =
    ("""\{"src":"([^"]*)","group":"([^"]*)","gtype":"([^"]*)",""" +
      """"pred":"([^"]*)","srcV":(\d+),"buckets":(\d+),(?:"hashv":(\d+),)?""" +
      """"dim":"([^"]*)","fk":"([^"]*)","pk":"([^"]*)","dimV":(\d+),"aggs":\[(.*)\]\}""").r
  private val HeaderDimsRe =
    ("""\{"src":"([^"]*)","group":"([^"]*)","gtype":"([^"]*)",""" +
      """"pred":"([^"]*)","srcV":(\d+),"buckets":(\d+),(?:"hashv":(\d+),)?""" +
      """"dims":\[(.*)\],"aggs":\[(.*)\]\}""").r
  private val DimRe =
    """\{"dim":"([^"]*)","fk":"([^"]*)","pk":"([^"]*)","pfx":"([^"]*)","dimV":(\d+)\}""".r
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

  /** Same-count rebuckets answered as idempotent no-ops — the misuse
    * observability stat (a caller repeatedly "rebucketing" to the current
    * count is suspicious but never wrong; see [[rebucket]]).
    */
  val rebucketNoops = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A JOIN definition (round 16): the MV materializes
    * `fact ⋈ dim ON fk = pk` with dim columns under the `d_` prefix —
    * [[SinkMvJoin]]'s delta-join decomposition over [[SinkMvDist]]'s
    * distributed bucketed state, so a per-user-grain star-schema rollup
    * needs neither a driver-resident view nor a full rescan.
    */
  private[sources] final case class MvdJoin(
      dim: String, fk: String, pk: String, dimV: Long, pfx: String = "d_")

  private final case class MvdState(
      src: String, groups: Seq[String], gtypes: Seq[String], pred: String,
      srcV: Long, buckets: Int, aggs: Seq[MvAgg], refs: Seq[(Int, String)],
      joins: Seq[MvdJoin] = Nil, hashv: Int = 2) {
    /** Each dim's refresh/recompute window view (fromV = its watermark). */
    def windows(tos: Seq[Long]): Seq[SinkMvJoin.DimWindow] =
      joins.zip(tos).map { case (j, to) =>
        SinkMvJoin.DimWindow(j.dim, j.fk, j.pk, j.pfx, j.dimV, to)
      }
  }

  // ---- header ------------------------------------------------------------

  private def headerJson(st: MvdState): String = {
    val aggs = st.aggs
      .map(a => s"""{"n":"${a.name}","k":"${a.kind}","e":"${a.e}"}""")
      .mkString("[", ",", "]")
    // single classic-prefix dim keeps the round-16 inline shape (existing
    // headers stay readable byte-for-byte); snowflakes write a dims array
    val join = st.joins match {
      case Nil => ""
      case Seq(j) if j.pfx == "d_" =>
        s""""dim":"${j.dim}","fk":"${j.fk}","pk":"${j.pk}","dimV":${j.dimV},"""
      case many => many.map(j =>
        s"""{"dim":"${j.dim}","fk":"${j.fk}","pk":"${j.pk}","pfx":"${j.pfx}","dimV":${j.dimV}}""")
        .mkString("\"dims\":[", ",", "],")
    }
    s"""{"src":"${st.src}","group":"${st.groups.mkString(",")}",""" +
      s""""gtype":"${st.gtypes.mkString(",")}","pred":"${st.pred}",""" +
      s""""srcV":${st.srcV},"buckets":${st.buckets},"hashv":${st.hashv},$join"aggs":$aggs}"""
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
    def hv(s: String): Int = if (s == null) 1 else s.toInt
    def dimsOf(ds: String): Seq[MvdJoin] = DimRe.findAllMatchIn(ds)
      .map(m => MvdJoin(m.group(1), m.group(2), m.group(3), m.group(5).toLong,
        pfx = m.group(4))).toSeq
    lines.head match {
      case HeaderJoinRe(s, g, t, pr, sv, b, h, dim, fk, pk, dv, as) =>
        MvdState(s, g.split(",", -1).toSeq, t.split(",", -1).toSeq, pr,
          sv.toLong, b.toInt, aggsOf(as), refsOf,
          Seq(MvdJoin(dim, fk, pk, dv.toLong)), hashv = hv(h))
      case HeaderDimsRe(s, g, t, pr, sv, b, h, ds, as) =>
        MvdState(s, g.split(",", -1).toSeq, t.split(",", -1).toSeq, pr,
          sv.toLong, b.toInt, aggsOf(as), refsOf, dimsOf(ds), hashv = hv(h))
      case HeaderRe(s, g, t, pr, sv, b, h, as) =>
        MvdState(s, g.split(",", -1).toSeq, t.split(",", -1).toSeq, pr,
          sv.toLong, b.toInt, aggsOf(as), refsOf, hashv = hv(h))
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
  /** Value-or-empty cell, ANSI-safe in both directions. Decimal cells
    * round-trip exactly: cast-to-string renders the full scale
    * ("12.340000") and the typed cast parses it back bit-for-bit.
    */
  private def cellCol(c: Column): Column =
    coalesce(c.cast(StringType), lit(""))
  private def uncellCol(c: Column, dt: DataType = LongType): Column =
    when(c === "", lit(null).cast(StringType)).otherwise(c).cast(dt)

  /** The deterministic group→bucket map, computable on ANY frame carrying
    * the group columns (state rows, delta rows, source rows): xxhash64 of
    * the null-marked, escaped key string. Both sides of every join derive
    * it the same way, so bucket-pruned reads can never miss a group.
    * hashv 2 joins cells with a TAB — escaped out of gcellCol output, so
    * the hash input is unambiguous for every key shape; hashv 1 used
    * \u0001, which escCol does not escape, so keys containing a literal
    * \u0001 shared an input (deterministic on both sides, hence correct,
    * but adversarially skewable). Persisted assignments stay on hashv 1
    * until a rebucket migrates the MV.
    */
  private def bucketCol(st: MvdState, keys: Seq[Column]): Column =
    pmod(xxhash64(concat_ws(if (st.hashv >= 2) "\t" else "\u0001",
      keys.map(gcellCol): _*)), lit(st.buckets)).cast(IntegerType)

  private def slotV(i: Int) = s"_v$i"
  private def slotC(i: Int) = s"_c$i"

  /** Value-slot storage type: BIGINT for every round-16 kind, exact
    * DECIMAL for dsum (round 18), DOUBLE/STRING for the typed extremes
    * (round 19) — the counter slots stay BIGINT.
    */
  private[sources] def slotType(a: MvAgg): DataType = a.kind match {
    case "dsum" => SinkMatView.DsumCell
    case "dmin" | "dmax" => DoubleType
    case "smin" | "smax" => StringType
    case _ => LongType
  }

  private def stateSchema(st: MvdState): StructType =
    StructType(
      st.groups.zip(st.gtypes).map { case (n, t) =>
        StructField(n, SinkMatView.gdt(t), nullable = true)
      } ++ st.aggs.zipWithIndex.flatMap { case (a, i) => Seq(
        StructField(slotV(i), slotType(a), nullable = true),
        StructField(slotC(i), LongType, nullable = true)) })

  /** Distributed scan of the state segments (optionally bucket-pruned —
    * file = bucket, so the prune is a file-list filter, zero data IO for
    * untouched buckets). Reads through [[MvStateSource]] (round 19): the
    * segment set is pinned here at PLAN time, and a segment a concurrent
    * vacuum swept before EXECUTION fails with the named
    * [[MvStateSweptException]] instead of a raw missing-file error —
    * the failure surface the rewrite's registration contract documents.
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
    val cells = split(col("value"), "\t", -1)
    val g = st.groups.length
    val gcols = st.groups.zip(st.gtypes).zipWithIndex.map { case ((n, t), i) =>
      ungcellCol(element_at(cells, i + 1), t).as(n)
    }
    val vcols = (0 until 2 * st.aggs.length).map { j =>
      val cell = element_at(cells, g + j + 1)
      if (j < st.aggs.length) {
        val dt = slotType(st.aggs(j))
        // STRING value slots ride the group-cell codec (escaped content
        // + the unambiguous %N null marker — an empty-string VALUE must
        // not collide with NULL the way the numeric cells' "" does)
        if (dt == StringType) ungcellCol(cell, "string").as(slotV(j))
        else uncellCol(cell, dt).as(slotV(j))
      } else uncellCol(cell, LongType).as(slotC(j - st.aggs.length))
    }
    spark.read.format("graft.sources.MvStateSource")
      .option("mvDir", mvDir)
      .option("files", refs.map(_._2).mkString(","))
      .load()
      .select(gcols ++ vcols: _*)
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
        (0 until na).map { i =>
          // string slots: escaped + %N, mirroring the read side
          if (slotType(st.aggs(i)) == StringType) gcellCol(col(slotV(i)))
          else cellCol(col(slotV(i)))
        } ++
        (0 until na).map(i => cellCol(col(slotC(i))))
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // cluster by bucket, then write the segments DIRECTLY from the tasks
    // (tmp name → rename, the sink writer's own pattern) instead of a
    // full Spark dynamic-partition text write: the Hadoop committer costs
    // a staging tree, a per-file commit rename, a `.crc` sidecar and (no
    // native lib) a forked chmod per file+dir, every refresh, to land
    // ≤ `buckets` tiny TSV files. One file per bucket per task either
    // way; a retried task truncates and re-renames the same tmp name, so
    // the last completed attempt's (deterministic) content wins.
    val mvDirStr = mvDir
    val refs = state
      .withColumn("_b", bucketCol(st, st.groups.map(col)))
      .select(col("_b").cast(IntegerType), concat_ws("\t", lineCells: _*))
      .repartition(math.max(1, st.buckets), col("_b"))
      .rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val open = scala.collection.mutable.Map[Int, java.io.BufferedWriter]()
        rows.foreach { r =>
          val b = r.getInt(0)
          val w = open.getOrElseUpdate(b,
            SinkFs.create(new Path(mvDirStr, s"_mvd.tmp-$nonce-p$pid-b$b")))
          w.write(r.getString(1)); w.write("\n")
        }
        open.foreach(_._2.close())
        open.keysIterator.map { b =>
          val name = s"state-v$version-b$b-$nonce-$pid.tsv"
          SinkFs.moveOver(
            new Path(mvDirStr, s"_mvd.tmp-$nonce-p$pid-b$b"), new Path(mvDirStr, name))
          (b, name)
        }.toList.iterator
      }.collect().toSeq
    refs
  }

  /** The state slot columns a full build aggregates into: per agg, its
    * VALUE slot and its non-null COUNTER slot (sum/xor need the counter
    * for SQL NULL-ness; the rest carry 0) — one builder shared by the
    * single-table and join creates.
    */
  private def aggSlots(aggs: Seq[MvAgg]): (Seq[Column], Seq[Column]) = (
    aggs.zipWithIndex.map { case (a, i) => SinkMatView.aggColumn(a).as(slotV(i)) },
    aggs.zipWithIndex.map { case (a, i) =>
      if (a.kind == "sum" || a.kind == "xor" || a.kind == "dsum")
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
    val (fv, dvs) = createSnowflake(spark, factDir, mvDir,
      Seq(SnowDim(dimDir, fk, pk, "d_")), groups, aggs, where, buckets)
    (fv, dvs.head)
  }

  /** One dim of a snowflake definition: its table, the join key `fk`
    * (resolving against the fact or an EARLIER dim's prefixed columns —
    * the chain), its unique key `pk`, and its column prefix.
    */
  final case class SnowDim(dim: String, fk: String, pk: String, pfx: String)

  /** SNOWFLAKE-MV creation (round 17): `SELECT groups, aggs FROM fact ⋈
    * dim1 ⋈ … ⋈ dimk [WHERE pred] GROUP BY` over DISTRIBUTED state, each
    * dim's columns under its declared prefix and each dim carrying its
    * own watermark. Joins apply in declaration order; a later dim's `fk`
    * may name an earlier dim's prefixed column (the snowflake chain).
    * Returns (factV, per-dim versions).
    */
  def createSnowflake(
      spark: SparkSession, factDir: String, mvDir: String, dims: Seq[SnowDim],
      groups: Seq[String], aggs: Seq[MvAgg],
      where: String = "", buckets: Int = 16): (Long, Seq[Long]) = {
    SinkMatView.validate(groups, aggs, where)
    require(buckets >= 1 && buckets <= 4096, s"buckets out of range: $buckets")
    require(dims.nonEmpty, "a join MV needs at least one dim")
    val pfxes = dims.map(_.pfx)
    require(pfxes.distinct.length == pfxes.length, s"duplicate dim prefixes: $pfxes")
    pfxes.foreach(p => require(p.matches("[A-Za-z][A-Za-z0-9]*_"),
      s"dim prefix '$p' must be alphanumeric ending in '_'"))
    require(currentVersion(mvDir) == 0L,
      s"distributed materialized view already exists at $mvDir")
    val factV = ShardSink.currentManifestVersion(factDir)
    require(factV > 0L, s"create the join MV after the fact's first commit ($factDir)")
    val fSchema = ShardSink.schemaAtVersion(factDir, factV)
    val dimVs = dims.map(d => ShardSink.currentManifestVersion(d.dim))
    dims.zip(dimVs).foreach { case (d, v) =>
      require(v > 0L, s"create the join MV after every dim's first commit (${d.dim})") }
    val dSchemas = dims.zip(dimVs).map { case (d, v) =>
      ShardSink.schemaAtVersion(d.dim, v) }
    // each fk resolves against the columns AVAILABLE at its join step:
    // the fact's, plus every earlier dim's prefixed names
    dims.zipWithIndex.foldLeft(fSchema.fieldNames.toSet) { case (avail, (d, i)) =>
      require(avail.contains(d.fk),
        s"join key '${d.fk}' of ${d.dim} resolves against none of ${avail.toSeq.sorted.mkString(",")}")
      require(dSchemas(i).fieldNames.contains(d.pk),
        s"join key '${d.pk}' not in dim ${dSchemas(i).fieldNames.mkString(",")}")
      avail ++ dSchemas(i).fieldNames.map(c => s"${d.pfx}$c")
    }
    val gtypes = resolveSnowGtypes(fSchema, dims.map(_.pfx).zip(dSchemas), groups)
    dims.zip(dimVs).foreach { case (d, v) =>
      val dim = SinkMatView.srcAt(spark, d.dim, v)
      SinkMvJoin.requireUniqueKeys(dim, d.pk, dim.select(col(d.pk)))
    }
    val joins = dims.zip(dimVs).map { case (d, v) => MvdJoin(d.dim, d.fk, d.pk, v, d.pfx) }
    val st = MvdState(factDir, groups, gtypes, where, factV, buckets, aggs, Nil, joins)
    val (aggCols, nnCols) = aggSlots(aggs)
    val full = SinkMatView.filtered(
      SinkMvJoin.joinedAt(spark, factDir, factV, st.windows(dimVs)), where)
      .groupBy(groups.map(col): _*)
      .agg(aggCols.head, aggCols.tail ++ nnCols: _*)
    val refs = writeSegments(mvDir, 1L, st, full)
    writeHeader(mvDir, 1L, st.copy(refs = refs))
    (factV, dimVs)
  }

  /** Group-type resolution across a dim chain: a group column resolves
    * against the first dim whose prefix matches (stripped name in that
    * dim's schema), else against the fact.
    */
  private def resolveSnowGtypes(
      fSchema: StructType, dims: Seq[(String, StructType)],
      groups: Seq[String]): Seq[String] =
    groups.map { g =>
      dims.collectFirst {
        case (pfx, sch) if g.startsWith(pfx) && sch.fieldNames.contains(g.stripPrefix(pfx)) =>
          SinkMatView.gtypeOf(sch(g.stripPrefix(pfx)).dataType)
      }.getOrElse {
        require(fSchema.fieldNames.contains(g),
          s"group column '$g' resolves in neither fact (${fSchema.fieldNames.mkString(",")}) " +
            s"nor any dim prefix (${dims.map(_._1).mkString(",")})")
        SinkMatView.gtypeOf(fSchema(g).dataType)
      }
    }

  /** (fact watermark, dim watermark) of a distributed single-dim JOIN MV. */
  def lastSourceVersions(mvDir: String): (Long, Long) = {
    val (fv, dvs) = lastSourceVersionsAll(mvDir)
    require(dvs.length == 1,
      s"the MV at $mvDir has ${dvs.length} dims — use lastSourceVersionsAll")
    (fv, dvs.head)
  }

  /** (fact watermark, per-dim watermarks in declaration order). */
  def lastSourceVersionsAll(mvDir: String): (Long, Seq[Long]) = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    require(st.joins.nonEmpty, s"the MV at $mvDir is single-table")
    (st.srcV, st.joins.map(_.dimV))
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
      val dimTos = st.joins.map(j => ShardSink.currentManifestVersion(j.dim))
      if (toV <= st.srcV && st.joins.zip(dimTos).forall { case (j, dv) => dv <= j.dimV })
        return RefreshStats(st.srcV, st.srcV, 0L, 0L, stateV, applied = false)
      try return (
        if (st.joins.nonEmpty) joinRefreshOnce(spark, mvDir, st, stateV, toV, dimTos)
        else refreshOnce(spark, srcDir, mvDir, st, stateV, toV))
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
    *
    * JOIN MVs (round 17) stream too: `srcDir` names WHICH side's change
    * feed the batch came from — each source runs its own CDF stream with
    * its own watermark in the header, and the delta-join decomposition
    * applies one single-source window per batch: a dim batch is
    * `[Δd ⋈ f@factV]` (the fact watermark is fixed while only the dim
    * moves), a fact batch is `[Δf ⋈ d@dimV]`. Interleavings compose
    * exactly because every window is pinned at the OTHER side's current
    * header watermark — the same telescoping as the batch refresh, one
    * commit at a time. Gap fast-forward and replay dedup are per-source.
    * The returned stats' (fromV, toV) are the MOVED source's window —
    * a dim batch reports the dim versions it advanced, not the
    * unchanged fact watermark (advice fix).
    */
  def refreshFromChanges(
      spark: SparkSession, srcDir: String, mvDir: String,
      ch: DataFrame, toV: Long): RefreshStats = {
    var attempt = 0
    while (true) {
      val stateV = currentVersion(mvDir)
      require(stateV > 0L, s"no distributed materialized view at $mvDir (create it first)")
      val st = readHeaderAt(mvDir, stateV)
      val dimIdx = st.joins.indexWhere(_.dim == srcDir)
      val isDim = st.src != srcDir && dimIdx >= 0
      require(st.src == srcDir || isDim,
        s"MV at $mvDir materializes ${st.src}" +
          st.joins.map(j => s" ⋈ ${j.dim}").mkString + s", not $srcDir")
      val fromV = if (isDim) st.joins(dimIdx).dimV else st.srcV
      if (toV <= fromV) // replayed or pre-create commit: already covered
        return RefreshStats(fromV, fromV, 0L, 0L, stateV, applied = false)
      if (toV > fromV + 1L) {
        val gapRows =
          SinkMatView.changes(spark, srcDir, fromV, toV - 1L).limit(1).count()
        require(gapRows == 0L,
          s"streaming MV gap at $mvDir: batch carries commit $toV of $srcDir " +
            s"but the view reflects $fromV and commits ($fromV, ${toV - 1L}] " +
            "carry change rows — commits must apply in order per source")
      }
      // (contribution, dirty-recompute source, advanced watermarks). Every
      // path folds the DELIVERED batch frame directly — the stream already
      // materialized this commit's change rows, so re-deriving them from
      // the log would only add a read (phase-timed in PLANS.md §38.2).
      // Only the batch's own source moves; every other source is pinned at
      // its header watermark, so the join paths are ONE call into the
      // shared contributionStream core with the batch passed as the moved
      // source's delta override — the streaming path shares every line of
      // the join algebra (telescoping order, uniqueness guard, prefix
      // handling) with the batch refresh.
      val signed = ch.withColumn("_sign", SinkMvJoin.signOf(col("_change_type")))
      val (contrib, recompute, nextSt) =
        if (st.joins.isEmpty)
          (signed.drop("_change_type", "_commit_version"),
            () => SinkMatView.filtered(SinkMatView.srcAt(spark, srcDir, toV), st.pred),
            st.copy(srcV = toV))
        else {
          val wins = st.joins.zipWithIndex.map { case (jj, k) =>
            if (isDim && k == dimIdx)
              SinkMvJoin.DimWindow(jj.dim, jj.fk, jj.pk, jj.pfx, fromV, toV,
                delta = Some(signed))
            else SinkMvJoin.DimWindow(jj.dim, jj.fk, jj.pk, jj.pfx, jj.dimV, jj.dimV)
          }
          val factTo = if (isDim) st.srcV else toV
          val nextJoins =
            if (isDim) st.joins.updated(dimIdx, st.joins(dimIdx).copy(dimV = toV))
            else st.joins
          (SinkMvJoin.contributionStream(spark, st.src, st.srcV, factTo, wins,
            factDelta = if (isDim) None else Some(signed)),
            () => SinkMatView.filtered(
              SinkMvJoin.joinedAt(spark, st.src, factTo, wins), st.pred),
            st.copy(srcV = factTo, joins = nextJoins))
        }
      val cached = contrib.persist()
      // stats carry the MOVED source's (fromV, toV): a dim batch used to
      // report the unchanged fact watermark twice, so callers/monitoring
      // could not see which dim version the applied batch advanced to
      // (advice fix) — fact batches are unchanged
      try return foldBatch(spark, mvDir, st, stateV, cached, col("_sign"),
        recompute, nextSt, fromV, toV)
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

  /** The JOIN refresh: the delta-join decomposition — one signed window
    * per changed source, composed in declaration order — feeding the
    * DISTRIBUTED fold ([[SinkMvJoin.contributionStream]]: one core, two
    * state backends, any dim-chain length); the dirty recompute is the
    * full fact⋈dims join at the target versions. Uniqueness of changed
    * dim keys is re-checked per window, as in the blob join MV.
    */
  private def joinRefreshOnce(
      spark: SparkSession, mvDir: String, st: MvdState,
      stateV: Long, factTo: Long, dimTos: Seq[Long]): RefreshStats = {
    val wins = st.windows(dimTos)
    val ch = SinkMvJoin.contributionStream(spark, st.src, st.srcV, factTo, wins).persist()
    try foldBatch(spark, mvDir, st, stateV, ch, col("_sign"),
      () => SinkMatView.filtered(
        SinkMvJoin.joinedAt(spark, st.src, factTo, wins), st.pred),
      st.copy(srcV = factTo,
        joins = st.joins.zip(dimTos).map { case (j, dv) => j.copy(dimV = dv) }),
      st.srcV, factTo)
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
          case "dsum" => Seq(
            sum(sign * expr(a.e).cast(SinkMatView.DsumIn))
              .cast(SinkMatView.DsumCell).as(s"_d$i"),
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
      // ---- the value-grain extreme deltas, one per distinct
      // (expression, value type) — the typed kinds (round 19) fold the
      // same way, comparing in their own type
      val extremeKeys = st.aggs.filter(a => SinkMatView.isExtremeKind(a.kind))
        .map(a => (a.e, SinkMatView.extremeValueType(a.kind))).distinct
      extremeKeys.zipWithIndex.foreach { case ((e, dt), j) =>
        val per = chF
          .groupBy(keys.map(col) :+ expr(e).cast(dt).as("_mv_v"): _*)
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
        val exprIdx = extremeKeys.zipWithIndex.toMap
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
            case "dsum" =>
              val zero = lit(0).cast(SinkMatView.DsumCell)
              val nn = coalesce(sc, lit(0L)) + coalesce(j(s"_dn$i"), lit(0L))
              // exact decimal addition — retractions restore the partial
              // bit-for-bit, which double arithmetic cannot promise
              foldCols += when(nn === 0L, lit(null).cast(SinkMatView.DsumCell))
                .otherwise((coalesce(sv, zero) + coalesce(j(s"_d$i"), zero))
                  .cast(SinkMatView.DsumCell))
                .as(slotV(i))
              foldCols += nn.as(slotC(i))
            case "xor" =>
              val nn = coalesce(sc, lit(0L)) + coalesce(j(s"_dn$i"), lit(0L))
              foldCols += when(nn === 0L, lit(null).cast(LongType))
                .otherwise(coalesce(sv, lit(0L)).bitwiseXOR(coalesce(j(s"_d$i"), lit(0L))))
                .as(slotV(i))
              foldCols += nn.as(slotC(i))
            case k if SinkMatView.isExtremeKind(k) =>
              val ji = exprIdx((a.e, SinkMatView.extremeValueType(k)))
              val isMin = SinkMatView.isMinKind(k)
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
            .filter { case (a, _) => SinkMatView.isExtremeKind(a.kind) }.map(_._2)
          val anyDirty =
            if (dirtyAggIdx.isEmpty) lit(false)
            else dirtyAggIdx.map(i => col(s"_dirty$i")).reduce(_ || _)
          val dirtyKeys = folded.where(anyDirty).select(keys.map(col): _*)
          // an extreme-less MV can never dirty — skip the count job
          // entirely (one Spark job per fold across every sum/count-only
          // lifecycle; round-19 harness hygiene)
          val nDirty =
            if (dirtyAggIdx.isEmpty) 0L
            else { driverRowsCollected.incrementAndGet(); dirtyKeys.count() }
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
    // base tables (d1–d3: the 16-key region dim; f1–f3: the 1200-doc
    // uid-grain fact) copied from the JVM-shared star fixture — same
    // commits, versions and content as the inline build (round 19)
    SinkFixtures.starInto(s, root.getPath, "dim_mvjd", "fact_mvjd")
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi).withColumn("uid", (col("doc_id") % 300L).cast("long"))
        .writeTo("graft_mvjd.fact_mvjd").append()
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

  /** Driver-checked STREAMING JOIN-MV MAINTENANCE (round 17): the
    * distributed fact⋈dim MV maintained CONTINUOUSLY from BOTH change
    * feeds — each table's CDF stream lands its commits through
    * [[refreshFromChanges]] in its own `foreachBatch` loop, one
    * single-source window per batch ([Δf ⋈ d@dimV] / [Δd ⋈ f@factV]),
    * with per-source watermarks in the header. Exercised: a create-time
    * coverage no-op on the dim stream, an empty-commit (OPTIMIZE)
    * fast-forward gap on the fact feed (the compaction is also the CDF
    * retention horizon — the fact stream delivers from it onward), a
    * fact tail-DELETE (dirty extremes through the pruned join
    * recompute), a fact append, and a dim UPDATE that moves every
    * shard-5 row between region groups with no rescan. The
    * final per-(region, uid) view, the applied/skipped split, both
    * watermarks AND a zero row-diff against a from-scratch join all sit
    * under the DuckDB hash gate.
    */
  def mvJoinStreamParity(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvjs:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvjs_$sfx")
    SinkFs.deleteRecursively(root)
    val s = graft.streaming.StreamTune.session(spark)
    s.conf.set("spark.sql.catalog.graft_mvjs", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvjs.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvjs.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvjs.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvjs.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2400").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    // base tables (d1–d3, f1–f3) from the JVM-shared star fixture —
    // identical commits/versions to the inline build (round 19)
    SinkFixtures.starInto(s, root.getPath, "dim_mvjs", "fact_mvjs")
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi).withColumn("uid", (col("doc_id") % 300L).cast("long"))
        .writeTo("graft_mvjs.fact_mvjs").append()
    val factDir = new java.io.File(root, "fact_mvjs").getPath
    val dimDir = new java.io.File(root, "dim_mvjs").getPath
    val mvDir = factDir + ".mvjs"
    createJoin(s, factDir, dimDir, mvDir, fk = "shard", pk = "doc_id",
      groups = Seq("d_region", "uid"), aggs = Seq(
        MvAgg("n_docs", "count"),
        MvAgg("sum_ids", "sum", "doc_id"),
        MvAgg("xor_ids", "xor", "doc_id"),
        MvAgg("max_doc", "max", "doc_id")), buckets = 8)
    // the compact lands FIRST: it is both the no-data gap the stream must
    // fast-forward across AND the CDF retention horizon (feeds below a
    // compaction are released, so the stream delivers from it onward —
    // data commits the stream must replay have to come after)
    ShardSink.compact(factDir) // f4: no-data commit — never a batch
    s.sql("DELETE FROM graft_mvjs.fact_mvjs WHERE doc_id >= 900") // f5
    ingest(1200L, 1500L) // f6
    s.sql("UPDATE graft_mvjs.dim_mvjs SET region = 'rX' WHERE doc_id = 5") // d4
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    val skipped = new java.util.concurrent.atomic.AtomicLong(0L)
    // one stream per SOURCE, drained sequentially (fact first) so the
    // lifecycle constants are deterministic; each batch carries ONE
    // commit of its own feed and folds under that source's watermark
    def drain(dir: String): Unit = {
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
    }
    drain(factDir)
    drain(dimDir)
    val (fv, dv) = lastSourceVersions(mvDir)
    val d = SinkMatView.srcAt(s, dimDir, dv)
      .select(col("doc_id").as("_pk"), col("region").as("d_region"))
    val full = SinkMatView.srcAt(s, factDir, fv)
      .join(d, col("shard") === col("_pk"))
      .groupBy(col("d_region"), col("uid"))
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
        expr("bit_xor(doc_id)").as("xor_ids"), max("doc_id").as("max_doc"))
    val mv = read(s, mvDir)
    val nDiff = mv.exceptAll(full).union(full.exceptAll(mv)).count()
    mv.withColumn("n_applied", lit(applied.get()))
      .withColumn("n_skipped", lit(skipped.get()))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("fact_version", lit(fv))
      .withColumn("dim_version", lit(dv))
      .withColumn("n_diff", lit(nDiff))
      .orderBy("d_region", "uid")
  }

  /** DuckDB re-derivation: live fact rows are `doc_id < 900 OR 1200 <=
    * doc_id < 1500`; uid = doc % 300; region of shard s is rX for 5 (the
    * streamed dim update, folded last against the final fact), else
    * r(s % 3). Constants: 3 applied (the fact DELETE — arriving over the
    * compact's provably-empty (3,4] gap — the fact append, and the dim
    * update) + 1 skipped (d3, covered by the create; the fact stream
    * starts at the compaction horizon, so f3 is never delivered); MV v4
    * = create + 3; fact v6 = bootstrap + ALTER + ingest + OPTIMIZE +
    * DELETE + append; dim v4 = bootstrap + ALTER + map + update; diff 0.
    * Change rows: 300 (delete) + 300 (append) + 2 × 75 live shard-5 rows
    * (dim update: 56 in [0,900) + 19 in [1200,1500)) = 750 — not output
    * (the per-batch splits are already pinned by n_applied + the hash
    * over every group row).
    */
  val mvJoinStreamParitySql: String =
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
      |       CAST(3 AS BIGINT) AS n_applied,
      |       CAST(1 AS BIGINT) AS n_skipped,
      |       CAST(4 AS BIGINT) AS mv_version,
      |       CAST(6 AS BIGINT) AS fact_version,
      |       CAST(4 AS BIGINT) AS dim_version,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM g GROUP BY d_region, uid ORDER BY d_region, uid""".stripMargin

  /** Driver-checked STREAMING SNOWFLAKE-MV MAINTENANCE (round 18): the
    * three-source chain MV of [[mvSnowflakeReport]] maintained
    * CONTINUOUSLY from THREE change feeds — fact, dim1 and dim2 each run
    * their own CDF stream landing commits through [[refreshFromChanges]],
    * one single-source window per batch, per-source watermarks in the
    * header. The both-dims-in-one-interleave window of the batch gate
    * appears here as consecutive single-source batches (d1's update folds
    * pinned at the header's d2 version, then d2's update folds against
    * the ALREADY-ADVANCED d1 — the same telescoping, one commit at a
    * time), and the fact feed crosses a compaction-horizon commit (the
    * compact is both the no-data gap the stream fast-forwards over and
    * the CDF retention floor the stream starts from). The final
    * per-(zone, region, uid) view, the applied/skipped split, all THREE
    * watermarks and a zero row-diff against a from-scratch chain join
    * sit under the DuckDB hash gate.
    */
  def mvSnowflakeStreamParity(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvss:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvss_$sfx")
    SinkFs.deleteRecursively(root)
    val s = graft.streaming.StreamTune.session(spark)
    s.conf.set("spark.sql.catalog.graft_mvss", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvss.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvss.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvss.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvss.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2400").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    // base tables (e1–e3: zone dim2; d1–d4: region/catk dim1; f1–f3: the
    // 1200-doc uid-grain fact) from the JVM-shared snowflake fixture —
    // identical commits/versions to the inline build (round 19)
    SinkFixtures.snowInto(s, root.getPath, "dim2_mvss", "dim1_mvss", "fact_mvss")
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi).withColumn("uid", (col("doc_id") % 150L).cast("long"))
        .writeTo("graft_mvss.fact_mvss").append()
    val factDir = new java.io.File(root, "fact_mvss").getPath
    val d1Dir = new java.io.File(root, "dim1_mvss").getPath
    val d2Dir = new java.io.File(root, "dim2_mvss").getPath
    val mvDir = factDir + ".mvss"
    createSnowflake(s, factDir, mvDir,
      Seq(
        SnowDim(d1Dir, fk = "shard", pk = "doc_id", pfx = "d1_"),
        SnowDim(d2Dir, fk = "d1_catk", pk = "doc_id", pfx = "d2_")),
      groups = Seq("d2_zone", "d1_region", "uid"), aggs = Seq(
        MvAgg("n_docs", "count"),
        MvAgg("sum_ids", "sum", "doc_id"),
        MvAgg("xor_ids", "xor", "doc_id"),
        MvAgg("max_doc", "max", "doc_id")), buckets = 8)
    // the compact lands FIRST: the no-data gap the fact stream
    // fast-forwards across AND its CDF retention horizon
    ShardSink.compact(factDir) // f4: no-data commit — never a batch
    s.sql("DELETE FROM graft_mvss.fact_mvss WHERE doc_id >= 900") // f5
    ingest(1200L, 1400L) // f6
    s.sql("UPDATE graft_mvss.dim1_mvss SET region = 'rX' WHERE doc_id = 7") // d5
    s.sql("UPDATE graft_mvss.dim2_mvss SET zone = 'zX' WHERE doc_id = 1") // e4
    val applied = new java.util.concurrent.atomic.AtomicLong(0L)
    val skipped = new java.util.concurrent.atomic.AtomicLong(0L)
    // one stream per SOURCE, drained sequentially (fact, then the dims in
    // chain order) so the lifecycle constants are deterministic; each
    // batch carries ONE commit of its own feed and folds with every
    // OTHER source pinned at its header watermark
    def drain(dir: String): Unit = {
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
    }
    drain(factDir)
    drain(d1Dir)
    drain(d2Dir)
    val (fv, dvs) = lastSourceVersionsAll(mvDir)
    val full = SinkMatView.filtered(
      SinkMvJoin.joinedAt(s, factDir, fv, Seq(
        SinkMvJoin.DimWindow(d1Dir, "shard", "doc_id", "d1_", dvs.head, dvs.head),
        SinkMvJoin.DimWindow(d2Dir, "d1_catk", "doc_id", "d2_", dvs(1), dvs(1)))), "")
      .groupBy(col("d2_zone"), col("d1_region"), col("uid"))
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
        expr("bit_xor(doc_id)").as("xor_ids"), max("doc_id").as("max_doc"))
    val mv = read(s, mvDir)
    val nDiff = mv.exceptAll(full).union(full.exceptAll(mv)).count()
    mv.withColumn("n_applied", lit(applied.get()))
      .withColumn("n_skipped", lit(skipped.get()))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("fact_version", lit(fv))
      .withColumn("dim1_version", lit(dvs.head))
      .withColumn("dim2_version", lit(dvs(1)))
      .withColumn("n_diff", lit(nDiff))
      .orderBy("d2_zone", "d1_region", "uid")
  }

  /** DuckDB re-derivation: live fact rows are `doc_id < 900 OR 1200 <=
    * doc_id < 1400`; uid = doc % 150; shard s = doc % 16 maps region rX
    * for 7 (the streamed d1 update) else r(s % 3), and zone zX for catk
    * s % 4 = 1 (the streamed d2 update) else z((s % 4) % 2). Constants:
    * 4 applied (the fact DELETE — arriving over the compact's
    * provably-empty gap — the fact append, and one update per dim) + 2
    * skipped (d4 and e3, both covered by the create; the fact stream
    * starts at the compaction horizon, so f3 is never delivered); MV v5
    * = create + 4; fact v6 = bootstrap + ALTER + ingest + OPTIMIZE +
    * DELETE + append; dim1 v5 = bootstrap + 2 ALTERs + map + update;
    * dim2 v4 = bootstrap + ALTER + map + update; diff 0.
    */
  val mvSnowflakeStreamParitySql: String =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 150 AS uid, doc_id % 16 AS s
      |  FROM range(0, 1400) t(doc_id)
      |  WHERE doc_id < 900 OR doc_id >= 1200),
      |m AS (
      |  SELECT doc_id, uid,
      |         CASE WHEN s = 7 THEN 'rX' ELSE 'r' || CAST(s % 3 AS VARCHAR) END AS d1_region,
      |         CASE WHEN s % 4 = 1 THEN 'zX' ELSE 'z' || CAST((s % 4) % 2 AS VARCHAR) END AS d2_zone
      |  FROM g)
      |SELECT d2_zone, d1_region, uid, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(4 AS BIGINT) AS n_applied,
      |       CAST(2 AS BIGINT) AS n_skipped,
      |       CAST(5 AS BIGINT) AS mv_version,
      |       CAST(6 AS BIGINT) AS fact_version,
      |       CAST(5 AS BIGINT) AS dim1_version,
      |       CAST(4 AS BIGINT) AS dim2_version,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM m GROUP BY d2_zone, d1_region, uid
      |ORDER BY d2_zone, d1_region, uid""".stripMargin

  /** Driver-checked SNOWFLAKE MV (round 17): `fact ⋈ dim1 ⋈ dim2 GROUP BY
    * (d2_zone, d1_region, uid)` — a CHAIN join (dim2 keys off dim1's
    * `catk` column, not the fact) over distributed bucketed state, with
    * one watermark per source and deltas composed in declaration order.
    * Lifecycle: a fact tail-DELETE (dirty extremes recomputed through the
    * full chain join, pruned), then BOTH dim updates land in ONE refresh
    * window — the case the fixed composition order exists for (Δd1 joins
    * d2@OLD, Δd2 joins d1@NEW) — shard-7 rows move region groups and
    * every catk-1 shard's rows move zone groups, no rescan; finally a
    * fact append against both evolved dims. The full group table plus
    * lifecycle bookkeeping sits under the DuckDB hash gate.
    */
  def mvSnowflakeReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvsn:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvsn_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mvsn", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvsn.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mvsn.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvsn.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_mvsn.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2400").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    // base tables (e1–e3, d1–d4, f1–f3) from the JVM-shared snowflake
    // fixture — identical commits/versions to the inline build (round 19)
    SinkFixtures.snowInto(s, root.getPath, "dim2_mvsn", "dim1_mvsn", "fact_mvsn")
    def ingest(lo: Long, hi: Long): Unit =
      docs(lo, hi).withColumn("uid", (col("doc_id") % 150L).cast("long"))
        .writeTo("graft_mvsn.fact_mvsn").append()
    val factDir = new java.io.File(root, "fact_mvsn").getPath
    val d1Dir = new java.io.File(root, "dim1_mvsn").getPath
    val d2Dir = new java.io.File(root, "dim2_mvsn").getPath
    val mvDir = factDir + ".mvsn"
    createSnowflake(s, factDir, mvDir,
      Seq(
        SnowDim(d1Dir, fk = "shard", pk = "doc_id", pfx = "d1_"),
        SnowDim(d2Dir, fk = "d1_catk", pk = "doc_id", pfx = "d2_")),
      groups = Seq("d2_zone", "d1_region", "uid"), aggs = Seq(
        MvAgg("n_docs", "count"),
        MvAgg("sum_ids", "sum", "doc_id"),
        MvAgg("xor_ids", "xor", "doc_id"),
        MvAgg("max_doc", "max", "doc_id")), buckets = 8)
    s.sql("DELETE FROM graft_mvsn.fact_mvsn WHERE doc_id >= 900") // f4
    val r1 = refresh(s, factDir, mvDir)
    // BOTH dim windows fold in ONE refresh, composed in order
    s.sql("UPDATE graft_mvsn.dim1_mvsn SET region = 'rX' WHERE doc_id = 7") // d5
    s.sql("UPDATE graft_mvsn.dim2_mvsn SET zone = 'zX' WHERE doc_id = 1") // e4
    val r2 = refresh(s, factDir, mvDir)
    ingest(1200L, 1400L) // f5
    val r3 = refresh(s, factDir, mvDir)
    val stats = Seq(r1, r2, r3)
    val (fv, dvs) = lastSourceVersionsAll(mvDir)
    read(s, mvDir)
      .withColumn("n_refreshes", lit(stats.count(_.applied).toLong))
      .withColumn("change_rows", lit(stats.map(_.changeRows).sum))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("fact_version", lit(fv))
      .withColumn("dim1_version", lit(dvs.head))
      .withColumn("dim2_version", lit(dvs(1)))
      .orderBy("d2_zone", "d1_region", "uid")
  }

  /** DuckDB re-derivation: live fact rows are `doc_id < 900 OR 1200 <=
    * doc_id < 1400`; uid = doc % 150; shard s = doc % 16 maps region rX
    * for 7 else r(s % 3), and zone zX for catk s % 4 = 1 else
    * z((s % 4) % 2). Constants: 3 refreshes; change rows 300 (tail
    * delete through the chain) + 562 in the one double-dim window (the
    * d1 update: 56 live shard-7 rows × ±, joined against d2@OLD; the d2
    * update: live catk-1 rows — shards 1/5/9/13 → 57+56+56+56 = 225 —
    * × ±, joined against d1@NEW) + 200 (append) = 1062; MV v4 = create
    * + 3; fact v5; dim1 v5 (bootstrap + 2 ALTERs + map + update); dim2
    * v4 (bootstrap + ALTER + map + update).
    */
  val mvSnowflakeReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 150 AS uid, doc_id % 16 AS s
      |  FROM range(0, 1400) t(doc_id)
      |  WHERE doc_id < 900 OR doc_id >= 1200),
      |m AS (
      |  SELECT doc_id, uid,
      |         CASE WHEN s = 7 THEN 'rX' ELSE 'r' || CAST(s % 3 AS VARCHAR) END AS d1_region,
      |         CASE WHEN s % 4 = 1 THEN 'zX' ELSE 'z' || CAST((s % 4) % 2 AS VARCHAR) END AS d2_zone
      |  FROM g)
      |SELECT d2_zone, d1_region, uid, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(3 AS BIGINT) AS n_refreshes,
      |       CAST(1062 AS BIGINT) AS change_rows,
      |       CAST(4 AS BIGINT) AS mv_version,
      |       CAST(5 AS BIGINT) AS fact_version,
      |       CAST(5 AS BIGINT) AS dim1_version,
      |       CAST(4 AS BIGINT) AS dim2_version
      |FROM m GROUP BY d2_zone, d1_region, uid
      |ORDER BY d2_zone, d1_region, uid""".stripMargin

  /** A single-table MV definition + raw slot-level state, consumed by the
    * automatic query-rewrite rule ([[SinkMvRewrite]]): the distributed
    * state frame carries the group columns plus, per aggregate i, its
    * value slot `_v<i>` and non-null counter `_c<i>` — enough to
    * re-derive every aggregate EXACTLY (including SQL NULL-ness) after
    * folding a change-feed tail on top.
    */
  private[sources] final case class MvSlots(
      state: DataFrame, src: String, groups: Seq[String], gtypes: Seq[String],
      aggs: Seq[MvAgg], pred: String, srcV: Long, joins: Seq[MvdJoin]) {
    def isJoin: Boolean = joins.nonEmpty
    def slotValue(i: Int): String = slotV(i)
    def slotCounter(i: Int): String = slotC(i)
  }

  private[sources] def slotState(spark: SparkSession, mvDir: String): MvSlots = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    MvSlots(stateDf(spark, mvDir, st, None), st.src, st.groups, st.gtypes,
      st.aggs, st.pred, st.srcV, st.joins)
  }

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
    // validate/coerce each key value against its group column's declared
    // type BEFORE building the probe frame: a mismatched value (e.g. a
    // Long for an int column) would otherwise surface as an opaque
    // encoder error deep in createDataFrame (review fix). Lossless
    // numeric widening/narrowing is accepted; anything else names the
    // column and the expected type.
    val coerced: Seq[Any] = st.groups.zip(st.gtypes).zip(key).map {
      case (_, null) => null
      case ((_, "int"), v: java.lang.Integer) => v
      case ((n, "int"), v: java.lang.Long) =>
        require(v.longValue == v.intValue,
          s"lookup key for group column '$n' (int) out of range: $v")
        Int.box(v.intValue)
      case ((_, "long"), v: java.lang.Long) => v
      case ((_, "long"), v: java.lang.Integer) => Long.box(v.longValue)
      case ((_, "string"), v: String) => v
      case ((n, t), v) => throw new IllegalArgumentException(
        s"lookup key for group column '$n' expects $t, got ${v.getClass.getSimpleName}: $v")
    }
    val keySchema = StructType(st.groups.zip(st.gtypes).map { case (n, t) =>
      StructField(n, SinkMatView.gdt(t), nullable = true)
    })
    val keyDf = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row.fromSeq(coerced)),
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
      st.aggs.zipWithIndex.map { case (a, i) =>
        // dsum reads back as DOUBLE (the type the summed column had);
        // the exact decimal is internal state discipline, not the API
        if (a.kind == "dsum") col(slotV(i)).cast(DoubleType).as(a.name)
        else col(slotV(i)).as(a.name)
      }

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
      if (st.buckets == newBuckets && st.hashv >= 2) {
        // the desired end state already holds (same count, current hash
        // input) — an IDEMPOTENT no-op on every attempt, not just after a
        // lost flip: a concurrent rebucket to the same count that commits
        // before this caller's first header read must not turn into an
        // error one flip earlier than the identical race would succeed
        // (review fix). The misuse signal is a counter, not an exception.
        rebucketNoops.incrementAndGet()
        return
      }
      // same count + hashv 1 falls through: the rewrite IS the migration
      // to the v2 (tab-separated) bucket hash input
      val newSt = st.copy(buckets = newBuckets, hashv = 2)
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

  /** Definition + state summary for the `.mvs` census ([[SinkMvDdl]],
    * round 19) — header fields plus segment-count/bytes, no data IO.
    */
  private[sources] final case class MvDescribe(
      src: String, groups: Seq[String], pred: String, srcV: Long,
      buckets: Int, aggs: Seq[MvAgg], nSegments: Int, stateBytes: Long,
      mvVersion: Long)

  private[sources] def describe(mvDir: String): MvDescribe = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    MvDescribe(st.src, st.groups, st.pred, st.srcV, st.buckets, st.aggs,
      st.refs.size, bucketStats(mvDir).map(_._3).sum, v)
  }

  /** Per-bucket state-segment METADATA — (bucket, n_files, bytes) from
    * file status only, zero data IO: the policy input for
    * [[autoRebucket]], exposed the way the table format exposes its
    * partitions metadata table. Bytes proxy rows (fixed-width TSV cells),
    * so the growth/skew thresholds need no state scan.
    */
  def bucketStats(mvDir: String): Seq[(Int, Int, Long)] = {
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    // ONE directory listing, not one status RPC per segment — on an
    // object store per-file round trips would dominate the "metadata
    // only" promise (review fix). A referenced-but-missing segment is
    // corruption and fails loudly.
    val fs = SinkFs.fsOf(new Path(mvDir))
    val sizes: Map[String, Long] = fs.listStatus(new Path(mvDir))
      .filter(_.isFile).map(f => f.getPath.getName -> f.getLen).toMap
    st.refs.groupBy(_._1).toSeq.map { case (b, files) =>
      (b, files.size, files.map(f => sizes.getOrElse(f._2,
        sys.error(s"state segment ${f._2} referenced by v$v is missing at $mvDir"))).sum)
    }.sortBy(_._1)
  }

  /** STATS-TRIGGERED auto-rebucket — the dist-MV analogue of the table's
    * auto-compact: a view whose group cardinality outgrew its bucket
    * count makes every refresh rewrite outsized segment files, so when
    * the MEAN bucket size crosses `targetBytesPerBucket` the state is
    * rebucketed to the power-of-two count that brings it back under
    * target (capped at `maxBuckets`); a max/mean ratio past `skewFactor`
    * (adversarial key clustering) doubles the count instead. Returns the
    * new bucket count when triggered, None otherwise — an untriggered
    * call costs O(segment files) driver metadata reads and nothing else.
    * Query results are IDENTICAL before and after (rebucket changes only
    * carry-forward granularity; spec- and gate-pinned).
    */
  def autoRebucket(
      spark: SparkSession, mvDir: String, targetBytesPerBucket: Long,
      skewFactor: Double = 4.0, maxBuckets: Int = 4096): Option[Int] = {
    require(targetBytesPerBucket > 0L, "targetBytesPerBucket must be positive")
    // rebucket itself enforces <= 4096; a larger caller cap must clamp
    // here instead of crashing mid-policy (review fix)
    val cap = math.min(maxBuckets, 4096)
    val v = currentVersion(mvDir)
    require(v > 0L, s"no distributed materialized view at $mvDir")
    val st = readHeaderAt(mvDir, v)
    val stats = bucketStats(mvDir)
    val total = stats.map(_._3).sum
    val mean = total.toDouble / math.max(1, st.buckets)
    val maxBytes = stats.map(_._3).foldLeft(0L)(math.max)
    def pow2ceil(x: Long): Int = {
      var n = 1
      while (n < x && n < cap) n <<= 1
      // the last shift may overshoot a non-power-of-two cap (review fix)
      math.min(n, cap)
    }
    val want = pow2ceil(math.ceil(total.toDouble / targetBytesPerBucket).toLong)
    if (mean > targetBytesPerBucket && want > st.buckets) {
      rebucket(spark, mvDir, want)
      Some(want)
    } else if (st.buckets > 1 && st.buckets < cap &&
      maxBytes > skewFactor * math.max(1.0, mean)) {
      val n = math.min(cap, st.buckets * 2)
      rebucket(spark, mvDir, n)
      Some(n)
    } else None
  }

  /** Driver-checked AUTO-REBUCKET (round 17): a per-doc-grain MV born
    * with 2 buckets outgrows them through two ingest windows; the policy
    * triggers ONE metadata-driven rebucket (mean bucket bytes over
    * target → next power of two), after which the view answers
    * identically (asOf time travel across the flip is part of the
    * gate: n_diff compares the pre-rebucket version against the current
    * read). A second policy call is a recorded non-trigger.
    */
  def mvAutoRebucketReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvar:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvar_$sfx")
    SinkFs.deleteRecursively(root)
    val dir = new java.io.File(root, "docs_mvar").getPath
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2400").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir).mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 400L) // v1: small enough for 2 buckets
    create(s, dir, mvDir, Seq("doc_id"), Seq(
      MvAgg("n_docs", "count"),
      MvAgg("sum_len", "sum", "length(body)")), buckets = 2)
    append(400L, 2400L) // v2: 6x growth
    refresh(s, dir, mvDir) // MV v2
    val before = bucketStats(mvDir)
    val vBefore = currentVersion(mvDir)
    // ~2400 rows × ~15 TSV bytes ≫ 2 × 4 KiB → the growth trigger fires
    val triggered = autoRebucket(s, mvDir, targetBytesPerBucket = 4096L)
    val after = bucketStats(mvDir)
    val again = autoRebucket(s, mvDir, targetBytesPerBucket = 4096L)
    val pre = read(s, mvDir, asOf = Some(vBefore))
    val cur = read(s, mvDir)
    val nDiff = cur.exceptAll(pre).union(pre.exceptAll(cur)).count()
    cur
      .groupBy((col("doc_id") % 16L).as("shard"))
      .agg(count(lit(1)).as("n_groups"), sum("n_docs").as("n_docs"),
        sum("sum_len").as("sum_len"))
      .withColumn("buckets_before", lit(before.map(_._1).toSet.size.toLong))
      .withColumn("rebucketed", lit(if (triggered.isDefined) 1L else 0L))
      .withColumn("buckets_after_ge8",
        lit(if (after.map(_._1).toSet.size >= 8) 1L else 0L))
      .withColumn("retriggered", lit(if (again.isDefined) 1L else 0L))
      .withColumn("mv_version", lit(currentVersion(mvDir)))
      .withColumn("n_diff", lit(nDiff))
      .orderBy("shard")
  }

  /** DuckDB re-derivation: 2400 per-doc groups (count 1, 32-char bodies)
    * rolled up per doc % 16. Constants: 2 populated buckets before; the
    * policy triggers once (2400 × ~15 B ≫ 2 × 4 KiB) to ≥ 8 buckets and
    * does NOT re-trigger at the new layout; MV v3 = create + refresh +
    * rebucket; time travel across the flip shows 0 row diff.
    */
  val mvAutoRebucketReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 16 AS shard FROM range(0, 2400) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_groups,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(COUNT(*) * 32 AS BIGINT) AS sum_len,
      |       CAST(2 AS BIGINT) AS buckets_before,
      |       CAST(1 AS BIGINT) AS rebucketed,
      |       CAST(1 AS BIGINT) AS buckets_after_ge8,
      |       CAST(0 AS BIGINT) AS retriggered,
      |       CAST(3 AS BIGINT) AS mv_version,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

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
