package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlAccess, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the one relational operator the reference domain
  * (financial time series: "the index value in effect at time t") wants
  * that Spark's built-in operators lack, implemented at the WHOLE-OPERATOR
  * rung of the extension ladder (SURVEY.md build rules: compose if
  * possible, Expression if scalar, LogicalPlan + Strategy + SparkPlan when
  * the semantics are a join shape): for each left row, attach the matching
  * right row with the greatest `rightTime <= leftTime` for the same key,
  * null-extended when none exists.
  *
  * The repo already ships the COMPOSED form (`q_asof_join` — union +
  * running-max window, queries/JoinQueries.scala): that is the right
  * answer when the payload is one column. The native operator earns its
  * keep when the right row's WHOLE payload must come along (the window
  * composition needs one running `max(struct)` per payload column or a
  * re-join on the matched timestamp): here it is a single co-partitioned
  * merge — each side shuffled ONCE on the key, sorted within partitions,
  * then a linear two-pointer scan per partition with O(1) state (the one
  * buffered candidate row). No pair space, no re-join, no per-column
  * windows — the plan a 100 TB tick-store join needs.
  *
  * Execution contract (all enforced by Spark, not by convention):
  *   - `requiredChildDistribution` = ClusteredDistribution(key) on both
  *     sides → EnsureRequirements co-partitions them exactly as it does
  *     for SortMergeJoin;
  *   - `requiredChildOrdering` = (key asc, time asc) on both sides →
  *     EnsureRequirements inserts the per-partition sorts;
  *   - the merge then never looks back: left (key, time) is
  *     lexicographically nondecreasing, so the right pointer only
  *     advances — one pass, one candidate row of state.
  *
  * Null semantics: a null key or time on the left yields the null-extended
  * row; null-keyed/timed right rows match nothing (SQL comparison rules).
  * With duplicate right (key, time) pairs the surviving candidate is the
  * last in sort order — callers needing full determinism under such
  * duplicates should fold a tiebreak into `rightTime` (the checked query's
  * output is duplicate-insensitive either way).
  */
object AsOfJoinPlan {

  /** Logical node: output = left columns + right columns (nullable). */
  case class AsOfJoin(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression)
    extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Physical merge as-of join. */
  case class AsOfJoinExec(
      leftKey: Expression,
      rightKey: Expression,
      leftTime: Expression,
      rightTime: Expression,
      left: SparkPlan,
      right: SparkPlan)
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val out = output
      val lk = leftKey
      val rk = rightKey
      val lt = leftTime
      val rt = rightTime
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // Hot path is fully code-generated: each side's (key, time) is
        // computed by ONE UnsafeProjection per row (no interpreted
        // Expression.eval), and comparisons run through generated
        // orderings over the projected 2-column rows — `ktOrd` is the
        // lexicographic (key, time) compare driving the merge, `keyOrd`
        // reads ordinal 0 only for the match check. Nulls never reach the
        // comparators (checked via isNullAt below), so the generated
        // nulls-first convention is unobservable.
        val lKT = UnsafeProjection.create(Seq(
          BindReferences.bindReference(lk, lOut),
          BindReferences.bindReference(lt, lOut)))
        val rKT = UnsafeProjection.create(Seq(
          BindReferences.bindReference(rk, rOut),
          BindReferences.bindReference(rt, rOut)))
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
        val ktOrd =
          RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType, lt.dataType))
        val rBuf = rIter.buffered
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow
        val resultProj = UnsafeProjection.create(out, out)
        // the ONE row of cross-iteration state: the best (greatest-time)
        // right row seen so far for its key, copied out of the reused
        // iterator/projection buffers
        var candidate: InternalRow = null
        var candidateKT: InternalRow = null
        new Iterator[InternalRow] {
          override def hasNext: Boolean = lIter.hasNext
          override def next(): InternalRow = {
            val l = lIter.next()
            val lkt = lKT(l)
            if (lkt.isNullAt(0) || lkt.isNullAt(1))
              return resultProj(joined(l, nullRight))
            // advance right through every row at-or-before (key, time):
            // lexicographic (rk < lk) ∨ (rk = lk ∧ rt ≤ lt)
            var done = false
            while (!done && rBuf.hasNext) {
              val rkt = rKT(rBuf.head)
              if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
                rBuf.next() // unmatched by SQL comparison rules; skip
              } else if (ktOrd.compare(rkt, lkt) <= 0) {
                candidate = rBuf.next().copy()
                candidateKT = rkt.copy()
              } else done = true
            }
            val matched =
              candidate != null && keyOrd.compare(candidateKT, lkt) == 0
            resultProj(joined(l, if (matched) candidate else nullRight))
          }
        }
      }
    }
  }

  /** Planner strategy: one custom logical node → one custom exec. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Install the strategy on `experimental.extraStrategies` (idempotent
    * against itself; a session ALSO configured with GraftExtensions'
    * `injectPlannerStrategy` would carry a second copy there — harmless,
    * the strategy only matches the one custom node, but prefer one wiring
    * per session). The check-and-append is synchronized on the session:
    * `extraStrategies` is a plain var, so two concurrent asOf() builders
    * could otherwise interleave read-modify-write and drop an append.
    */
  def ensureStrategy(spark: SparkSession): Unit = spark.synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** User-facing builder: `asOf(left, key, t)(right, key, t)` — columns
    * must belong to the two frames. Misuse fails HERE, not as silently
    * wrong rows: mismatched key/time types would hash the two sides
    * differently (equal keys land in different partitions → every row
    * null-extends) and break the comparator, and a self-join without
    * aliasing duplicates exprIds so the output projection would bind
    * right columns to left ordinals.
    */
  def asOf(
      left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    // Float/double keys are canonicalized (-0.0 → 0.0, NaN → one NaN) the
    // same way NormalizeFloatingNumbers treats built-in join keys — the
    // optimizer rule cannot see this custom node, and without it equal
    // float keys can hash into different partitions while the merge
    // ordering treats them as equal (rows silently null-extend). Applied
    // to times too: ordering-only, but canonical NaN keeps the merge total.
    val (lk, rk) = (
      GraftSqlAccess.normalizeFloats(GraftSqlAccess.expression(leftKey)),
      GraftSqlAccess.normalizeFloats(GraftSqlAccess.expression(rightKey)))
    val (lt, rt) = (
      GraftSqlAccess.normalizeFloats(GraftSqlAccess.expression(leftTime)),
      GraftSqlAccess.normalizeFloats(GraftSqlAccess.expression(rightTime)))
    // MapType (and anything else Spark cannot sort) has no ordering — the
    // physical node's requiredChildOrdering would fail deep in planning;
    // fail at the API instead.
    for ((e, role) <- Seq(lk -> "left key", rk -> "right key",
        lt -> "left time", rt -> "right time"))
      require(RowOrdering.isOrderable(e.dataType),
        s"as-of $role type ${e.dataType} is not orderable")
    require(
      org.apache.spark.sql.types.DataType.equalsStructurally(
        lk.dataType, rk.dataType, ignoreNullability = true),
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(
      org.apache.spark.sql.types.DataType.equalsStructurally(
        lt.dataType, rt.dataType, ignoreNullability = true),
      s"as-of time types differ: ${lt.dataType} vs ${rt.dataType}")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    require(
      lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of sides share attributes (self-join without aliasing) — " +
        "re-select/alias one side so every output column is distinct")
    GraftSqlAccess.ofRows(spark, AsOfJoin(lPlan, rPlan, lk, rk, lt, rt))
  }
}
