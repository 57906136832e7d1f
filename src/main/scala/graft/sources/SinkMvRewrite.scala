package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** MV-AWARE AUTOMATIC QUERY REWRITE (round 17) — the capability gap
  * between "has MVs" and "uses MVs": a user writing the plain
  *
  *   `SELECT g…, count(*), sum(e)… FROM base_table GROUP BY g…`
  *
  * against a [[ShardSink]] base table is transparently answered from a
  * REGISTERED distributed MV's state plus the change-feed tail of any
  * commits past the MV watermark — the base table's data files are never
  * opened (spec-pinned by the data-file read counter). This is the same
  * `Rule[LogicalPlan]` rung as [[graft.plans.DotProductFusion]]: wire it
  * per-session via `spark.experimental.extraOptimizations` (or an
  * extensions `injectOptimizerRule`).
  *
  * Matching is deliberately CONSERVATIVE — a non-match always falls back
  * to the base scan, which is always correct:
  *   - the aggregate's child is the bare relation (possibly under a
  *     column-pruning Project) of a registered table, read UNPINNED (a
  *     `versionAsOf` read is never rewritten — the MV reflects the
  *     current watermark, and version-pinned scans are exactly what the
  *     MV machinery's own recomputes issue, which must never
  *     self-rewrite);
  *   - the MV is single-table; a predicate-bearing MV matches a query
  *     whose residual WHERE is SEMANTICALLY the MV's predicate (the MV
  *     pred is re-resolved and re-OPTIMIZED against the same table in a
  *     nested plan, so inferred not-null conjuncts and constant foldings
  *     land on both sides before the conjunct-set comparison — no
  *     textual paren/spacing fragility); an unfiltered query never
  *     matches a predicate MV and vice versa;
  *   - the group-by columns are a SUBSET of the MV's group columns (any
  *     order, possibly empty — a global aggregate): state rows are
  *     complete per-fine-group partials, so a coarser rollup re-aggregates
  *     them exactly (counts/sums/xors fold linearly with their non-null
  *     counters; a min of fine-group mins IS the coarse min);
  *   - every aggregate maps to a declared MV aggregate: `count(*)` /
  *     `count(1)` to the count slot, `sum/min/max/bit_xor(e)` to the
  *     slot whose expression matches textually after normalization.
  *
  * The rewritten plan is  state slots ∪ signed tail → one re-aggregation:
  * per group, count = Σ(state count, tail signs); sum/xor re-derive SQL
  * NULL-ness from the non-null counters the state already carries
  * (`_c<i>` + tail non-null signs — retracting the last non-null
  * contribution yields NULL, not 0); a group whose count reaches zero
  * leaves the result. Extremes (min/max) are only derivable from state
  * alone when the tail is EMPTY — a tail with retractions could have
  * removed the recorded extreme — so a query touching min/max rewrites
  * only at a current watermark; otherwise it falls back to the base scan.
  *
  * At 100 TB this converts every dashboard-shaped rollup over a slowly
  * appending fact table from a full scan into an O(|MV| + |tail|) read.
  */
object SinkMvRewrite extends Rule[LogicalPlan] {

  /** base table dir → distributed-MV dirs (a table may carry several
    * MVs at different groups/predicates; the CHEAPEST whose definition
    * subsumes the query wins — see the cost model in [[tryRewrite]]).
    * Registration is explicit, and it is a CONTRACT the caller vouches
    * for:
    *   - each MV's change-feed prerequisites hold for the table (cdf
    *     enabled for CoW DML etc.);
    *   - while any registered table is being queried, the registered
    *     MVs' state is not vacuumed below their current version and the
    *     table's change feeds at/after each MV watermark are not
    *     compacted away. The rewritten plan pins state segment refs and
    *     the tail window at OPTIMIZATION time (the horizon check runs
    *     there); a concurrent refresh+vacuum or compaction between
    *     planning and execution would fail the query at execution
    *     instead of falling back. Run maintenance with the table
    *     unregistered, or with retention covering in-flight queries —
    *     the same discipline every snapshot-pinning table format asks
    *     of its vacuum (advice fix: contract documented).
    */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, List[String]]()

  /** Rewrites applied — observability + the spec's assertion hook. */
  val rewrites = new java.util.concurrent.atomic.AtomicLong(0L)

  def register(tableDir: String, mvDir: String): Unit = {
    registry.merge(tableDir, List(mvDir),
      (old, add) => (old ++ add).distinct)
    ()
  }
  def unregister(tableDir: String): Unit = { registry.remove(tableDir); () }

  // re-entrancy guard: building the replacement plan triggers a nested
  // optimization (of the state ∪ tail aggregate) that must not itself
  // attempt rewrites
  private val inRewrite = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || inRewrite.get()) return plan
    plan.transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        peel(child, None) match {
          case Some((filterCond, rel)) =>
            baseTable(rel) match {
              case Some(t) if t.pinnedVersion.isEmpty =>
                // an optimizer rule must NEVER break the query: a stale
                // registration (renamed column, swept MV dir, corrupt
                // header) bails to the base scan instead of escaping
                // (review fix). ONE registry read — a containsKey-then-get
                // pair races a concurrent unregister into an NPE inside
                // the optimizer (advice fix)
                Option(registry.get(t.tableDir)) match {
                  case Some(mvDirs) =>
                    mvDirs.iterator
                      .map(mvDir =>
                        try tryRewrite(agg, groupExprs, aggExprs, filterCond, rel,
                          t.tableDir, mvDir)
                        catch { case scala.util.control.NonFatal(e) =>
                          if (sys.props.contains("graft.mvrw.debug")) e.printStackTrace()
                          None })
                      .collectFirst { case Some(p) => p }
                      .getOrElse(agg)
                  case None => agg
                }
              case _ => agg
            }
          case None => agg
        }
    }
  }

  /** Peel column-pruning Projects and AT MOST one Filter off the
    * aggregate's child, in whatever order the optimizer stacked them
    * (pruning typically lands ABOVE the filter), down to the relation.
    */
  private def peel(plan: LogicalPlan, cond: Option[Expression])
      : Option[(Option[Expression], LogicalPlan)] = plan match {
    case Project(es, c) if es.forall(_.isInstanceOf[AttributeReference]) =>
      peel(c, cond)
    case Filter(f, c) if cond.isEmpty => peel(c, Some(f))
    case r: DataSourceV2Relation => Some((cond, r))
    case r: DataSourceV2ScanRelation => Some((cond, r))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Does the query's residual filter equal the MV's predicate? Decided
    * SEMANTICALLY: the MV pred string is analyzed AND optimized against a
    * fresh read of the same table (under the re-entrancy guard), so both
    * sides carry the same inferred not-null conjuncts and foldings; its
    * attributes are then mapped by name onto the query relation's and the
    * conjunct SETS must match under semanticEquals. Any shape surprise
    * (pred folded away, consumed into the scan, unmappable attribute)
    * answers false — never a wrong rewrite.
    */
  private def predMatches(
      spark: SparkSession, tableDir: String, pred: String,
      cond: Expression, rel: LogicalPlan): Boolean = {
    val fresh = spark.read.format("graft.sources.ShardSinkSource")
      .option("path", tableDir).load().where(expr(pred))
    val mvConj = fresh.queryExecution.optimizedPlan match {
      case Filter(c, _) =>
        val byName = rel.output.map(a => a.name -> a).toMap
        try conjuncts(c.transform {
          case a: AttributeReference =>
            byName.getOrElse(a.name, return false)
        })
        catch { case _: scala.runtime.NonLocalReturnControl[_] => return false }
      case _ => return false
    }
    val qConj = conjuncts(cond)
    mvConj.forall(mc => qConj.exists(_.semanticEquals(mc))) &&
      qConj.forall(qc => mvConj.exists(_.semanticEquals(qc)))
  }

  /** The bare registered relation under an optional column-pruning
    * Project — anything else (filters, joins, expressions) bails. A
    * ScanRelation additionally proves its scan is FULL and UNPRUNED:
    * ShardSink can CONSUME a predicate into file-exact pruning (the
    * Filter node disappears from the plan entirely), so the absence of a
    * Filter above the relation is not evidence the aggregate covers the
    * whole table — the scan itself must testify (review fix; an
    * agg-pushdown or otherwise foreign scan class bails the same way).
    */
  private def baseTable(plan: LogicalPlan): Option[ShardSinkTable] = plan match {
    case r: DataSourceV2Relation => r.table match {
      case t: ShardSinkTable => Some(t)
      case _ => None
    }
    case r: DataSourceV2ScanRelation => (r.relation.table, r.scan) match {
      case (t: ShardSinkTable, sc: ShardSinkScan) if sc.isFullUnprunedScan => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def norm(sql: String): String =
    sql.toLowerCase.replace("`", "").replace(" ", "")

  /** Map one query aggregate function onto the index of a declared MV
    * aggregate, or None (→ no rewrite).
    */
  private def mvAggIndex(
      f: AggregateFunction, aggs: Seq[SinkMatView.MvAgg]): Option[Int] = {
    def byKind(kind: String, e: Expression): Option[Int] = {
      val n = norm(e.sql)
      val i = aggs.indexWhere(a => a.kind == kind && norm(a.e) == n)
      if (i >= 0) Some(i) else None
    }
    f match {
      case Count(Seq(Literal(1, _))) => Some(aggs.indexWhere(_.kind == "count")).filter(_ >= 0)
      // try_sum must NOT map: on Long overflow it returns NULL while the
      // MV's refresh-time ANSI sum slot errored (or vice versa) — a
      // silent semantics change in the overflow corner (advice fix)
      case Sum(e, ctx) if ctx.evalMode != EvalMode.TRY => byKind("sum", e)
      case Min(e) => byKind("min", e)
      case Max(e) => byKind("max", e)
      case BitXorAgg(e) => byKind("xor", e)
      case _ => None
    }
  }

  private def tryRewrite(
      agg: Aggregate, groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression],
      filterCond: Option[Expression], rel: LogicalPlan,
      tableDir: String, mvDir: String): Option[LogicalPlan] = {
    val spark = SparkSession.active
    if (SinkMvDist.currentVersion(mvDir) == 0L) return None
    val mv = SinkMvDist.slotState(spark, mvDir)
    if (mv.isJoin || mv.src != tableDir) return None
    // cheap structural screens first — the semantic predicate match costs
    // a nested analyze+optimize, so it runs only when the shape already
    // fits (review fix); the (pred, filter) presence must agree either way
    if (mv.pred.nonEmpty != filterCond.nonEmpty) return None
    // group columns: plain attributes forming a SUBSET of the MV's
    // groups — state rows are complete fine-group partials, so any
    // coarser rollup (including the global aggregate) re-derives exactly
    val groupNames = groupExprs.map {
      case a: AttributeReference => a.name
      case _ => return None
    }
    if (!groupNames.toSet.subsetOf(mv.groups.toSet) || groupNames.distinct != groupNames)
      return None
    // each output is a group attr or a mappable aggregate
    val countSlot = mv.aggs.indexWhere(_.kind == "count") // validate() guarantees ≥ 0
    sealed trait Out
    case class GroupOut(name: String) extends Out
    case class AggOut(mvIdx: Int, name: String) extends Out
    val outs: Seq[Out] = aggExprs.map {
      case a: AttributeReference if groupNames.contains(a.name) => GroupOut(a.name)
      // the LongType guard is load-bearing: MV slots hold per-row BIGINT
      // casts, so a textual match over a non-integral column (sum of a
      // DOUBLE) would silently return truncated values — only aggregates
      // that already produce BIGINT may map (review fix)
      case al @ Alias(ae @ AggregateExpression(f, Complete, false, None, _), name)
          if ae.dataType == LongType =>
        mvAggIndex(f, mv.aggs) match {
          case Some(i) => AggOut(i, name)
          case None => return None
        }
      case _ => return None
    }
    (mv.pred.nonEmpty, filterCond) match {
      case (true, Some(c)) =>
        val ok = {
          inRewrite.set(java.lang.Boolean.TRUE)
          try predMatches(spark, tableDir, mv.pred, c, rel)
          finally inRewrite.set(java.lang.Boolean.FALSE)
        }
        if (!ok) return None
      case _ => // plain MV, plain query
    }
    val needed = outs.collect { case AggOut(i, _) => i }.distinct
    val hasExtreme = needed.exists(i =>
      mv.aggs(i).kind == "min" || mv.aggs(i).kind == "max")
    val toV = ShardSink.currentManifestVersion(tableDir)
    if (toV < mv.srcV) return None // table behind the MV: inconsistent registration
    val hasTail = toV > mv.srcV
    // a tail may contain retractions, which can remove a recorded
    // extreme — extremes rewrite only at a current watermark
    if (hasExtreme && hasTail) return None
    // the tail must still be DERIVABLE: compaction releases change feeds
    // below its horizon, and a spliced expired-range scan would fail the
    // user's query at execution instead of falling back (review fix —
    // same bound changePartitions enforces)
    if (hasTail && mv.srcV + 1L < ShardSink.horizonOf(tableDir)) return None

    inRewrite.set(java.lang.Boolean.TRUE)
    try {
      val slots = needed ++ (if (needed.contains(countSlot)) Nil else Seq(countSlot))
      // state part: per needed agg, its value + counter slot
      val statePart = mv.state.select(
        mv.groups.map(col) ++ slots.flatMap(i => Seq(
          col(mv.slotValue(i)).as(s"_p$i"), col(mv.slotCounter(i)).as(s"_pn$i"))): _*)
      // tail part: one signed contribution row per change row
      val unioned =
        if (!hasTail) statePart
        else {
          val sign = SinkMvJoin.signOf(col("_change_type"))
          val tail = SinkMatView.filtered(
            SinkMatView.changes(spark, tableDir, mv.srcV, toV), mv.pred).select(
            mv.groups.map(col) ++ slots.flatMap { i =>
              val a = mv.aggs(i)
              val (v, nn) = a.kind match {
                case "count" => (sign, lit(0L))
                case "sum" => (sign * expr(a.e).cast(LongType),
                  sign * when(expr(a.e).isNotNull, 1L).otherwise(0L))
                case "xor" => (expr(a.e).cast(LongType),
                  sign * when(expr(a.e).isNotNull, 1L).otherwise(0L))
                case _ => return None // extremes never reach here with a tail
              }
              Seq(v.as(s"_p$i"), nn.as(s"_pn$i"))
            }: _*)
          statePart.unionByName(tail)
        }
      val aggCols = slots.map { i =>
        val a = mv.aggs(i)
        a.kind match {
          // coalesce for the GLOBAL aggregate over an empty view: SQL
          // returns one row with count 0, and sum-over-nothing is NULL
          case "count" => coalesce(sum(col(s"_p$i")), lit(0L)).as(s"_r$i")
          case "sum" => when(sum(col(s"_pn$i")) === 0L, lit(null).cast(LongType))
            .otherwise(sum(col(s"_p$i"))).as(s"_r$i")
          case "xor" => when(sum(col(s"_pn$i")) === 0L, lit(null).cast(LongType))
            .otherwise(expr(s"bit_xor(_p$i)")).as(s"_r$i")
          case "min" => min(col(s"_p$i")).as(s"_r$i")
          case "max" => max(col(s"_p$i")).as(s"_r$i")
        }
      }
      val grouped = unioned
        .groupBy(groupNames.map(col): _*) // the QUERY's (possibly coarser) grain
        .agg(aggCols.head, aggCols.tail: _*)
      // group liveness, as in the fold — a coarse group whose total count
      // reached zero has no base rows and leaves; the GLOBAL aggregate
      // keeps its single row (SQL returns (0, NULL, …) over no rows)
      val compensated =
        if (groupNames.isEmpty) grouped
        else grouped.where(col(s"_r$countSlot") > 0L)
      val shaped = compensated.select(outs.map {
        case GroupOut(n) => col(n)
        case AggOut(i, n) => col(s"_r$i").as(n)
      }: _*)
      // splice: a fully-OPTIMIZED subplan (the extraOptimizations batch
      // runs after V2 pushdown — an analyzed-only DSv2 tail relation
      // would reach the planner unconverted), projected back onto the
      // original Aggregate's output attribute ids
      val sub = shaped.queryExecution.optimizedPlan
      val proj = sub.output.zip(agg.output).map { case (n, o) =>
        Alias(if (n.dataType == o.dataType) n else Cast(n, o.dataType), o.name)(
          exprId = o.exprId)
      }
      rewrites.incrementAndGet()
      Some(Project(proj, sub))
    } finally inRewrite.set(java.lang.Boolean.FALSE)
  }

  // ---- driver-checked query ------------------------------------------------

  /** Driver-checked MV-AWARE REWRITE (round 17): a per-shard rollup MV
    * over an 800-doc table, registered for rewrite; the user's PLAIN
    * GROUP BY over the base table is then answered twice — once with a
    * STALE watermark (a 200-doc tail commit compensates through the
    * change feed; linear aggregates only) and once AFTER a refresh (full
    * rewrite including the extreme, with ZERO base data files opened —
    * the counter delta is an output column under the hash gate). A
    * SECOND registered MV carries a WHERE predicate, and the query
    * writing the semantically-equal WHERE routes to it — the multi-MV registry picks the matching
    * definition. All three result sets, the rewrite count, and the
    * file-open count are re-derived by DuckDB.
    */
  def mvRewriteReport(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mvrw:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmvrw_$sfx")
    SinkFs.deleteRecursively(root)
    val dir = new java.io.File(root, "docs_mvrw").getPath
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "1200").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir).mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 800L) // v1
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      SinkMatView.MvAgg("n_docs", "count"),
      SinkMatView.MvAgg("sum_ids", "sum", "doc_id"),
      SinkMatView.MvAgg("xor_ids", "xor", "doc_id"),
      SinkMatView.MvAgg("max_doc", "max", "doc_id")), buckets = 8)
    val mvDirP = dir + ".mvdp"
    SinkMvDist.create(s, dir, mvDirP, Seq("shard"), Seq(
      SinkMatView.MvAgg("q3_n", "count"),
      SinkMatView.MvAgg("q3_sum", "sum", "doc_id")),
      // % 3, not % 2: shard = doc % 16 makes doc-parity shard-correlated
      // (even docs land only on even shards), and the gate wants every
      // shard to carry a q3 row
      where = "doc_id % 3 = 0", buckets = 8)
    register(dir, mvDir)
    register(dir, mvDirP)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      def base = s.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load()
      val r0 = rewrites.get()
      append(800L, 1000L) // v2: the un-refreshed tail
      // STALE-watermark query: linear aggregates compensate via the tail
      val q1 = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("q1_n"), sum("doc_id").as("q1_sum"),
          expr("bit_xor(doc_id)").as("q1_xor"))
      val got1 = q1.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      SinkMvDist.refresh(s, dir, mvDir) // MV → v2
      // CURRENT-watermark query: full rewrite incl. the extreme; base
      // data files must stay closed
      val q2 = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
          expr("bit_xor(doc_id)").as("xor_ids"), max("doc_id").as("max_doc"))
      val c0 = ShardSink.dataFileReadCount.get()
      val got2 = q2.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val q2Files = ShardSink.dataFileReadCount.get() - c0
      // predicate-MV leg: the equal WHERE (conjunctless, but written on
      // the query side through the DataFrame API) routes to the second
      // MV; its watermark is stale by the tail commit, compensated
      val q3 = base.where(expr("doc_id % 3 = 0")).groupBy(col("shard"))
        .agg(count(lit(1)).as("q3_n"), sum("doc_id").as("q3_sum"))
      val got3 = q3.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // GLOBAL-aggregate leg: no GROUP BY at all — the empty group set is
      // a subset of every MV's, so the shard MV's partials re-roll to one
      // row
      val g = base.agg(count(lit(1)).as("g_n"), sum("doc_id").as("g_sum"))
        .collect().head
      val nRewrites = rewrites.get() - r0
      import s.implicits._
      val df1 = got1.toSeq.toDF("shard", "q1_n", "q1_sum", "q1_xor")
      val df3 = got3.toSeq.toDF("shard", "q3_n", "q3_sum")
      got2.toSeq.toDF("shard", "n_docs", "sum_ids", "xor_ids", "max_doc")
        .join(df1, "shard").join(df3, "shard")
        .withColumn("g_n", lit(g.getLong(0)))
        .withColumn("g_sum", lit(g.getLong(1)))
        .withColumn("n_rewrites", lit(nRewrites))
        .withColumn("q2_files_opened", lit(q2Files))
        .orderBy("shard")
    } finally {
      unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }



  /** DuckDB re-derivation: all three queries aggregate docs 0..999 per
    * shard (q1 via state ∪ tail compensation, q2 via pure state, q3 the
    * predicate MV — doc_id multiples of three, tail-compensated under
    * the same predicate), plus a GLOBAL (group-less) aggregate answered
    * from the shard MV's partials. Constants: 4 rewrites (the refresh's
    * own internal scans are version-pinned and never rewrite); q2 opened
    * 0 base data files.
    */
  val mvRewriteReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard
      |  FROM range(0, 1000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc,
      |       CAST(COUNT(*) AS BIGINT) AS q1_n,
      |       CAST(SUM(doc_id) AS BIGINT) AS q1_sum,
      |       bit_xor(doc_id) AS q1_xor,
      |       CAST(COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS q3_n,
      |       CAST(SUM(doc_id) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS q3_sum,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS g_n,
      |       (SELECT CAST(SUM(doc_id) AS BIGINT) FROM g) AS g_sum,
      |       CAST(4 AS BIGINT) AS n_rewrites,
      |       CAST(0 AS BIGINT) AS q2_files_opened
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin
}
