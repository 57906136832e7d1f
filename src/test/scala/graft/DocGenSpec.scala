package graft

import graft.sources.{DocGen, DocGenRange, DocGenScan, DocGenScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan, LessThanOrEqual, StringContains}
import org.apache.spark.sql.types.StructType

/** Round-10 DataSource V2 connector: pushdown arithmetic, partition
  * planning, and column pruning pinned at the ScanBuilder level, and the
  * end-to-end plan pinned through the DataFrame API.
  */
class DocGenSpec extends SparkSpec {

  private def load() = spark.read.format("graft.sources.DocGenSource")
    .option("numDocs", "1000").option("numPartitions", "4").load()

  test("pushdown: doc_id bounds tighten the scan range; residuals only for foreign filters") {
    val b = new DocGenScanBuilder(1000L, 4)
    val residual = b.pushFilters(Array(
      GreaterThanOrEqual("doc_id", 100L),
      LessThan("doc_id", 420L),
      StringContains("body", "ab"))) // not ours — must come back
    assert(residual.toSeq === Seq(StringContains("body", "ab")))
    assert(b.pushedFilters().length === 2)
    val scan = b.build().asInstanceOf[DocGenScan]
    assert(scan.lo === 100L && scan.hi === 420L)
    // 320 ids over 4 partitions → 4 × 80-wide contiguous ranges
    val parts = scan.planInputPartitions().map(_.asInstanceOf[DocGenRange])
    assert(parts.length === 4)
    assert(parts.head === DocGenRange(100L, 180L) && parts.last.end === 420L)
  }

  test("pushdown: contradictory bounds plan ZERO partitions (pruned before any task)") {
    val b = new DocGenScanBuilder(1000L, 4)
    b.pushFilters(Array(GreaterThanOrEqual("doc_id", 800L), LessThan("doc_id", 100L)))
    assert(b.build().asInstanceOf[DocGenScan].planInputPartitions().isEmpty)
  }

  test("pushdown: EqualTo plans a single one-row range") {
    val b = new DocGenScanBuilder(1000L, 4)
    b.pushFilters(Array(EqualTo("doc_id", 42L)))
    val parts = b.build().asInstanceOf[DocGenScan].planInputPartitions()
    assert(parts.toSeq === Seq(DocGenRange(42L, 43L)))
  }

  test("column pruning reaches the reader; pruned body is never materialized") {
    val b = new DocGenScanBuilder(10L, 1)
    b.pruneColumns(new StructType().add("doc_id", "long"))
    val scan = b.build().asInstanceOf[DocGenScan]
    assert(scan.readSchema().fieldNames.toSeq === Seq("doc_id"))
    val reader = scan.createReaderFactory()
      .createReader(scan.planInputPartitions().head)
    assert(reader.next())
    assert(reader.get().numFields === 1)
  }

  test("end to end: range filter pushes into the source, no post-scan Filter survives") {
    val df = load().where(col("doc_id") >= 100L && col("doc_id") < 420L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[100,420)"), plan)
    assert(!plan.contains("Filter "), s"pushed filter re-evaluated post-scan:\n$plan")
    assert(df.count() === 320L)
  }

  test("micro-batch stream: multiple batches, exactly-once row totals") {
    val q = spark.readStream.format("graft.sources.DocGenSource")
      .option("numDocs", "100").option("numPartitions", "2").option("streamBatchSize", "30")
      .load()
      .writeStream.outputMode("append").format("memory").queryName("dsv2_mb").start()
    try q.processAllAvailable() finally q.stop()
    // 30+30+30+10: the offset advances one batch per latestOffset call,
    // so the drain is genuinely multi-batch
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3, q.recentProgress.mkString("\n"))
    assert(spark.table("dsv2_mb").count() === 100L)
    assert(spark.table("dsv2_mb").select("doc_id").distinct().count() === 100L)
  }

  test("stream/batch parity rollup returns the pinned totals") {
    val r = DocGen.dsv2StreamParity(spark, sf001).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((16L, 20000L, 0L)))
  }

  test("pushdown: Long.MaxValue bounds saturate instead of wrapping") {
    val gt = new DocGenScanBuilder(1000L, 4)
    gt.pushFilters(Array(org.apache.spark.sql.sources.GreaterThan("doc_id", Long.MaxValue)))
    assert(gt.build().asInstanceOf[DocGenScan].planInputPartitions().isEmpty,
      "doc_id > Long.MaxValue must select nothing")
    val le = new DocGenScanBuilder(1000L, 4)
    le.pushFilters(Array(LessThanOrEqual("doc_id", Long.MaxValue)))
    val scan = le.build().asInstanceOf[DocGenScan]
    assert(scan.lo === 0L && scan.hi === 1000L, "doc_id <= Long.MaxValue selects everything")
  }

  test("micro-batch admission control is stateless: end = f(start), parse is pure") {
    val s = new graft.sources.DocGenMicroBatchStream(0L, 100L, 2, 30L, Array("doc_id"))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    def pos(o: org.apache.spark.sql.connector.read.streaming.Offset) =
      o.asInstanceOf[graft.sources.DocGenOffset].pos
    val lim = s.getDefaultReadLimit
    // the batch end is a pure function of the start Spark passes — restart
    // recovery needs no instance cursor, and re-asking from the same start
    // yields the same end (no hidden advance)
    assert(pos(s.latestOffset(graft.sources.DocGenOffset(0L), lim)) === 30L)
    assert(pos(s.latestOffset(graft.sources.DocGenOffset(0L), lim)) === 30L)
    assert(pos(s.latestOffset(graft.sources.DocGenOffset(60L), lim)) === 90L)
    assert(pos(s.latestOffset(graft.sources.DocGenOffset(90L), lim)) === 100L)
    // a smaller engine-provided limit is honored
    assert(pos(s.latestOffset(graft.sources.DocGenOffset(0L), ReadLimit.maxRows(7L))) === 7L)
    // deserializeOffset is a PURE parse: inspecting an offset (e.g. reading
    // the offset log) must not move anything
    s.deserializeOffset("60")
    assert(pos(s.latestOffset(graft.sources.DocGenOffset(0L), lim)) === 30L)
    assert(pos(s.reportLatestOffset()) === 100L)
  }

  test("shardRanges: closed-form per-shard progressions tile the interval exactly") {
    for ((lo, hi) <- Seq((0L, 160L), (777L, 44444L), (5L, 6L), (15L, 17L), (10L, 10L))) {
      val ranges = DocGen.shardRanges(lo, hi)
      // every id in [lo, hi) appears in exactly one shard's progression
      val ids = ranges.flatMap { case (s, first, last) =>
        assert(first % 16 === s && last % 16 === s && first >= lo && last < hi)
        first.to(last, 16)
      }
      assert(ids.sorted.toSeq === (lo until hi).toSeq, s"[$lo,$hi)")
    }
  }

  test("aggregate pushdown: closed-form answer, NO aggregate node in the plan") {
    val df = DocGen.dsv2AggPushdown(spark, sf001)
    val aggNodes = df.queryExecution.sparkPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggNodes.isEmpty,
      s"aggregation was not completely pushed:\n${df.queryExecution.sparkPlan}")
    assert(df.queryExecution.sparkPlan.toString.contains("pushedAggregates=count,min,max"),
      df.queryExecution.sparkPlan.toString)
    // cross-check the interval arithmetic against an actual row scan
    val expected = load()
      .where(col("doc_id") >= 100L && col("doc_id") < 420L)
      .groupBy("shard")
      .agg(count(col("doc_id")).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
    val pushed = spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "1000").load()
      .where(col("doc_id") >= 100L && col("doc_id") < 420L)
      .groupBy("shard")
      .agg(count(col("doc_id")).as("n"), min("doc_id").as("mn"), max("doc_id").as("mx"))
    assert(pushed.exceptAll(expected).isEmpty && expected.exceptAll(pushed).isEmpty)
  }

  test("aggregate pushdown declines what it cannot answer (bit_xor scans rows)") {
    val df = spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "1000").load()
      .groupBy("shard").agg(expr("bit_xor(doc_id)").as("x"))
    val aggNodes = df.queryExecution.sparkPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }
    assert(aggNodes.nonEmpty, "non-pushable aggregate must still plan an aggregation")
  }

  test("partitionBy=shard reports KeyGroupedPartitioning: per-shard agg has no shuffle") {
    // the query function no longer mutates shared-session conf (round-12
    // ADVICE: drivers set it at session construction) — scope it here the
    // way the storage-partitioned-join test below does
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val old = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      val df = DocGen.dsv2ShardRollup(spark, sf001)
      val plan = df.queryExecution.sparkPlan
      assert(!plan.toString.contains("Exchange hashpartitioning"),
        s"shard-keyed scan still shuffled for the per-shard aggregate:\n$plan")
      // and the result matches the contiguous-range read of the same slice
      val expected = spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", DocGen.DefaultNumDocs.toString).load()
        .where(col("doc_id") >= 2000L && col("doc_id") < 35000L)
        .groupBy(col("shard"))
        .agg(
          expr("bit_xor(doc_id)").as("xor_ids"),
          sum(when(substring(col("body"), 1, 1) === "f", 1L).otherwise(0L)).as("n_body_f"))
        .orderBy("shard")
      assert(df.collect().toSeq === expected.collect().toSeq)
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("columnar read: plan carries ColumnarToRow; rows identical to the row reader") {
    def read(columnar: Boolean) = spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "5000").option("columnar", columnar.toString).load()
      .where(col("doc_id") >= 100L && col("doc_id") < 4600L)
    val colDf = read(columnar = true)
    val plan = colDf.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar scan must plan the vectorized transition:\n$plan")
    assert(!read(columnar = false).queryExecution.executedPlan.toString
      .contains("ColumnarToRow"), "row mode must not claim columnar support")
    // byte-identical output incl. the md5 bodies, and pushdown still works
    // (pruned range visible in the scan description either way)
    assert(plan.contains("range=[100,4600)"), plan)
    assert(colDf.exceptAll(read(columnar = false)).isEmpty)
    assert(read(columnar = false).exceptAll(colDf).isEmpty)
    // column pruning reaches the columnar reader too: a 1-column project
    // never computes bodies (same contract as the row path)
    val pruned = read(columnar = true).select("doc_id")
    val desc = pruned.queryExecution.executedPlan.toString
    assert(desc.contains("columns=doc_id"), desc)
    assert(pruned.agg(expr("bit_xor(doc_id)")).head.getLong(0) ===
      read(columnar = false).select("doc_id").agg(expr("bit_xor(doc_id)")).head.getLong(0))
  }

  test("runtime filtering: a broadcast dim's shard values prune shard partitions at execution") {
    DocGen.lastRuntimeFilter.set(null)
    val df = DocGen.dsv2RuntimeFilter(spark, sf001)
    // the optimized plan must carry the dynamic-pruning subquery on the scan
    assert(df.queryExecution.executedPlan.toString.toLowerCase.contains("dynamicpruning"),
      df.queryExecution.executedPlan.toString)
    val rows = df.collect()
    // the dim keeps region keys 0..3 → only those shards survive the join
    assert(rows.map(_.getInt(0)).toSeq === (0 to 3))
    // and the engine actually DELIVERED the dim's shard set to the scan —
    // execution-time pruning, not just a planned subquery
    assert(DocGen.lastRuntimeFilter.get() === Set(0, 1, 2, 3),
      s"runtime filter not delivered: ${DocGen.lastRuntimeFilter.get()}")
    // pruned partition planning: the same scan state plans 5 partitions
    val b = new DocGenScanBuilder(1000L, 4, shardKeyed = true)
    val scan = b.build().asInstanceOf[DocGenScan]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("shard", Array(1, 5, 9))))
    val parts = scan.planInputPartitions()
    assert(parts.length === 3)
    assert(parts.map(_.asInstanceOf[graft.sources.DocGenShardPartition].shard).toSet === Set(1, 5, 9))
  }

  test("storage-partitioned join: the CHECKED q_dsv2_spj plan has ZERO hash exchanges") {
    // round 12: promoted from an inline spec construction to the checked
    // query itself — dsv2Spj builds in its own newSession() with the SPJ
    // confs session-local, so this shared session's conf is untouched and
    // the plan assert pins exactly what Verify/Bench execute
    val df = DocGen.dsv2Spj(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"storage-partitioned join still shuffled:\n$plan")
    // constraint propagation + pushdown tightened BOTH scans to the
    // intersection [20000, 30000) — visible in the scan description
    assert(plan.contains("range=[20000,30000)"), plan)
    // per-shard totals: 10000 joined ids, 625 per shard
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).sum === 10000L)
    assert(rows.length === 16)
    // and the caller's session kept its conf (no leak from the query)
    assert(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      .forall(_ != "-1"))
  }

  test("bucket-transform SPJ: catalog-resolved bucket(8, doc_id), zero exchanges below the join") {
    val df = DocGen.dsv2SpjBucket(spark, sf001)
    // the inner newSession keeps AQE at its default, so the executed plan
    // is an AdaptiveSparkPlanExec whose subtree collect() cannot see —
    // assert on the printed initial plan, as the identity-SPJ test does
    // (tree prints top-down: "above the join" = smaller string index)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    val hashIdx = plan.indexOf("Exchange hashpartitioning")
    val smjIdx = plan.indexOf("SortMergeJoin")
    // exactly ONE hash exchange — the ≤8-group rollup above the join; the
    // SPJ claim is no exchange anywhere BELOW the join (each bucket's
    // partition pair joins in place)
    assert(hashIdx >= 0 && plan.indexOf("Exchange hashpartitioning", hashIdx + 1) < 0,
      s"expected exactly one hash exchange (the final rollup):\n$plan")
    assert(hashIdx < smjIdx,
      s"bucket-transform storage-partitioned join still shuffled below the join:\n$plan")
    // both scans went through the catalog's bucket transform and were
    // tightened to the window intersection by constraint propagation
    assert(plan.sliding("keyed=bucket(8,doc_id)".length).count(_ == "keyed=bucket(8,doc_id)") === 2, plan)
    assert(plan.sliding("range=[20000,30000)".length).count(_ == "range=[20000,30000)") === 2, plan)
    // 10000 joined ids over 8 buckets, 1250 each
    val rows = df.collect()
    assert(rows.length === 8)
    assert(rows.map(_.getLong(1)).sum === 10000L)
    // the catalog's canonical bucket function itself: literal-first
    // argument order per the V2 transform convention
    assert(graft.sources.DocGenBucketFunction.produceResult(
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](8, 20003L))) === 3)
  }

  test("bucket SPJ with MISMATCHED partition values: pushPartValues fills missing buckets, no shuffle") {
    // side B (5 docs) plans only buckets 0–4; side A (60000 docs) has all
    // 8 — without pushPartValues the grouped partitionings are
    // incompatible and Spark would shuffle. With it, A's extra buckets
    // pair against injected EMPTY partitions and the join stays in place.
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_docgen", classOf[graft.sources.DocGenCatalog].getName)
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val a = s.read.table("graft_docgen.docs_60000_b8").select(col("doc_id").as("a_id"))
    val b = s.read.table("graft_docgen.docs_5_b8").select(col("doc_id").as("b_id"))
    val df = a.join(b, col("a_id") === col("b_id")).orderBy("a_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"mismatched-value SPJ still shuffled:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq === (0L until 5L).toSeq)
    // catalog hygiene: unknown identifiers fail cleanly
    val cat = new graft.sources.DocGenCatalog()
    cat.initialize("c", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    import org.apache.spark.sql.connector.catalog.Identifier
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException](
      cat.loadTable(Identifier.of(Array.empty, "nope")))
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException](
      cat.loadFunction(Identifier.of(Array.empty, "nope")))
  }

  test("generated rows match the documented formula") {
    val row = load().where(col("doc_id") === 7L).collect().head
    assert(row.getLong(0) === 7L)
    assert(row.getInt(1) === 7)
    assert(row.getString(2) === DocGen.bodyOf(7L))
    assert(DocGen.bodyOf(7L).length === 32)
  }
}
