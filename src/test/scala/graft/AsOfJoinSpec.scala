package graft

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.functions._

/** Round-10 native AS-OF join (LogicalPlan + SparkStrategy + SparkPlan —
  * the whole-operator rung of the extension ladder). Semantics pinned on a
  * hand-built micro-case, the physical contract pinned on the plan, and
  * corpus-scale parity pinned against the composed window form that
  * `q_asof_join` ships.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asOfNative(
      l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsOfJoinPlan.asOf(l, l("k"), l("t"), r, r("rk"), r("rt"))

  test("asOf: micro-case — inclusive ties, no-match nulls, null keys/times") {
    val left = Seq(
      (Option(1L), Option(10L), "L10"),
      (Option(1L), Option(20L), "L20"),
      (Option(2L), Option(5L), "L5"),
      (Option(3L), Option(7L), "L7"),
      (None: Option[Long], Option(9L), "LnullK"),
      (Option(1L), None: Option[Long], "LnullT"))
      .toDF("k", "t", "ltag")
    val right = Seq(
      (Option(1L), Option(5L), "a"),
      (Option(1L), Option(15L), "b"),
      (Option(1L), Option(20L), "c"),
      (Option(2L), Option(6L), "x"),
      (None: Option[Long], Option(1L), "nk"),
      (Option(1L), None: Option[Long], "nt"))
      .toDF("rk", "rt", "rtag")
    val got = asOfNative(left, right)
      .select(col("ltag"), col("rtag"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === Map(
      "L10" -> Some("a"),     // 5 <= 10 < 15
      "L20" -> Some("c"),     // tie at 20 is inclusive
      "L5" -> None,           // key 2's only click is at 6 > 5
      "L7" -> None,           // key 3 has no right rows
      "LnullK" -> None,       // null key matches nothing
      "LnullT" -> None))      // null time matches nothing
  }

  test("asOf: physical plan is the custom exec with co-partitioned sorted children") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, "a")).toDF("rk", "rt", "rtag")
    val plan = asOfNative(left, right).queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix — the custom operator
    // renders as "AsOfJoin <keys>"
    assert(plan.contains("AsOfJoin "), plan)
    // EnsureRequirements must have inserted the key exchanges + sorts —
    // the operator DECLARES its needs rather than trusting its inputs
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("asOf: struct-typed time gives deterministic tiebreaks among equal timestamps") {
    // two right rows at the same (key, time): a bare time column leaves the
    // winner to partition-sort order; a STRUCT time (ts, id) makes it the
    // max id — the generated row ordering handles struct comparison, so
    // composite as-of keys need no operator change
    val left = Seq((1L, 10L, 99L)).toDF("k", "ts", "lid")
      .select(col("k"), struct(col("ts"), col("lid")).as("t"))
    val right = Seq((1L, 10L, 7L, "seven"), (1L, 10L, 9L, "nine"), (1L, 11L, 1L, "late"))
      .toDF("rk", "rts", "rid", "tag")
      .select(col("rk"), struct(col("rts"), col("rid")).as("rt"), col("tag"))
    val got = AsOfJoinPlan.asOf(left, left("k"), left("t"), right, right("rk"), right("rt"))
      .select("tag").collect().map(_.getString(0))
    // (10, 99) bounds both (10,7) and (10,9) but not (11,1): winner = (10,9)
    assert(got.toSeq === Seq("nine"))
  }

  test("asOf: misuse fails fast — mismatched types and unaliased self-joins") {
    val l = Seq((1, 10L)).toDF("k", "t") // Int key
    val r = Seq((1L, 5L)).toDF("rk", "rt") // Long key
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOf(l, l("k"), l("t"), r, r("rk"), r("rt"))
    }
    assert(e.getMessage.contains("key types differ"))
    val same = Seq((1L, 10L)).toDF("k", "t")
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOf(same, same("k"), same("t"), same, same("k"), same("t"))
    }
    assert(e2.getMessage.contains("share attributes"))
  }

  test("asOf: double keys are float-normalized — -0.0 and 0.0 are ONE key") {
    // NormalizeFloatingNumbers never sees a custom logical node, so asOf()
    // canonicalizes float keys itself; without it -0.0 and 0.0 hash into
    // different partitions and this match silently null-extends
    val left = Seq((-0.0d, 10L, "L")).toDF("k", "t", "ltag")
    val right = Seq((0.0d, 5L, "match")).toDF("rk", "rt", "rtag")
    val got = asOfNative(left, right).select("rtag").collect().map(_.getString(0))
    assert(got.toSeq === Seq("match"))
  }

  test("asOf: unorderable (map-typed) keys fail fast at the API") {
    val l = Seq((Map(1 -> 2), 10L)).toDF("k", "t")
    val r = Seq((Map(1 -> 2), 5L)).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asOf(l, l("k"), l("t"), r, r("rk"), r("rt"))
    }
    assert(e.getMessage.contains("not orderable"))
  }

  test("asOf: multi-payload corpus parity — native merge vs per-column window twin") {
    val native = graft.queries.JoinQueries.asofPayloadNative(spark, sf001)
    val composed = graft.queries.JoinQueries.asofPayloadComposed(spark, sf001)
    assert(native.count() === composed.count())
    assert(
      native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native multi-payload as-of diverges from the composed window twin")
  }

  test("asOf: corpus parity with the composed window form (q_asof_join)") {
    val ev = graft.model.Tables.events(spark, sf001)
      .where(col("event_type").isin("click", "purchase"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("k_event"), col("user_id").as("k"), col("ts").as("t"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("rk"), col("ts").as("rt"))
    val native = AsOfJoinPlan
      .asOf(purchases, purchases("k"), purchases("t"), clicks, clicks("rk"), clicks("rt"))
      .select(
        col("k_event").as("event_id"), col("k").as("user_id"),
        col("t").as("ts"), col("rt").as("prev_click_ts"))
    val composed = graft.queries.JoinQueries.asofClickBeforePurchase(spark, sf001)
    assert(native.count() === composed.count())
    assert(
      native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native as-of diverges from the composed window form")
  }
}
