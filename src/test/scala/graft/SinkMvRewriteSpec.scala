package graft

import graft.sources.{ShardSink, SinkMvDist, SinkMvRewrite}
import graft.sources.SinkMatView.MvAgg
import org.apache.spark.sql.functions._

/** Round-17 MV-AWARE QUERY REWRITE ([[SinkMvRewrite]]): a plain GROUP BY
  * over a registered ShardSink base table is transparently answered from
  * the distributed MV's state (+ change-feed tail) — pinned here by the
  * data-file read counter (base files NOT opened), the rewrite counter,
  * and value parity against the un-rewritten scan. Conservative bails:
  * version-pinned reads, extreme aggregates over a stale watermark,
  * unregistered tables.
  */
class SinkMvRewriteSpec extends SparkSpec {

  private def freshDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getPath
  }

  private def append(s: org.apache.spark.sql.SparkSession, dir: String, lo: Long, hi: Long): Unit =
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "1200").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir).mode(org.apache.spark.sql.SaveMode.Append).save()

  test("registered MV answers matching aggregates; base data files stay closed") {
    val dir = freshDir("mvrw")
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    append(s, dir, 0L, 800L) // v1
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      MvAgg("n", "count"), MvAgg("sd", "sum", "doc_id"),
      MvAgg("x", "xor", "doc_id"), MvAgg("hi", "max", "doc_id")), buckets = 4)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      def base = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // current watermark: full rewrite including the extreme — ZERO base
      // data files opened, and the plan carries no base-table scan
      val q1 = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"), max("doc_id").as("hi"))
      val r0 = SinkMvRewrite.rewrites.get()
      val c0 = ShardSink.dataFileReadCount.get()
      val got1 = canon(q1.collect())
      assert(ShardSink.dataFileReadCount.get() - c0 === 0L,
        "rewritten aggregate opened base data files")
      assert(SinkMvRewrite.rewrites.get() === r0 + 1L)
      assert(!q1.queryExecution.executedPlan.toString.contains("ShardSinkScan["),
        "rewritten plan still scans the base table")
      val want1 = canon(spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load().groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"), max("doc_id").as("hi"))
        .collect())
      assert(got1 === want1)
      // stale watermark: LINEAR aggregates compensate through the tail —
      // only the tail commit's files open
      val filesBefore = graft.sources.SinkTestAccess.resolveBase(dir)._2.length
      append(s, dir, 800L, 900L) // v2, not yet refreshed into the MV
      val tailFiles = graft.sources.SinkTestAccess.resolveBase(dir)._2.length - filesBefore
      val q2 = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"),
          expr("bit_xor(doc_id)").as("x"))
      val c1 = ShardSink.dataFileReadCount.get()
      val got2 = canon(q2.collect())
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L)
      assert(ShardSink.dataFileReadCount.get() - c1 <= tailFiles.toLong,
        "tail compensation read more than the tail commit")
      val want2 = canon(spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load().groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"),
          expr("bit_xor(doc_id)").as("x")).collect())
      assert(got2 === want2)
      // an EXTREME over a stale watermark must NOT rewrite (a tail
      // retraction could have removed the recorded extreme) — falls back
      val q3 = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"), max("doc_id").as("hi"))
      val got3 = canon(q3.collect())
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L, "extreme-over-tail was rewritten")
      assert(got3 === canon(spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load().groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"), max("doc_id").as("hi"))
        .collect()))
      // version-pinned reads never rewrite (the MV machinery's own
      // recompute shape)
      val qPinned = s.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).option("versionAsOf", 1).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"))
      qPinned.collect()
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L, "pinned read was rewritten")
      // a residual filter bails (the MV has no predicate)
      base.where(col("doc_id") < 10L).groupBy(col("shard"))
        .agg(count(lit(1)).as("n")).collect()
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L, "filtered aggregate was rewritten")
      // a filter CONSUMED by file-exact pruning leaves NO Filter node in
      // the plan — the scan itself must testify it is unpruned, or the
      // rewrite would answer a shard-3 query with every shard (review
      // fix). Compaction makes the layout shard-pure, which is exactly
      // when ShardSink consumes a one-shard predicate.
      // catch the MV up BEFORE compacting: compaction is the CDF
      // retention horizon, so an un-refreshed window would expire
      SinkMvDist.refresh(s, dir, mvDir)
      ShardSink.compact(dir)
      SinkMvDist.refresh(s, dir, mvDir) // fast-forward over the no-data commit
      val qc = base.where(col("shard") === 3).groupBy(col("shard"))
        .agg(count(lit(1)).as("n"))
      val rBefore = SinkMvRewrite.rewrites.get()
      val gotC = qc.collect()
      assert(SinkMvRewrite.rewrites.get() === rBefore, "consumed-filter aggregate was rewritten")
      assert(gotC.length === 1 && gotC.head.getInt(0) === 3, gotC.mkString(","))
      assert(!qc.queryExecution.optimizedPlan.toString.contains("Filter"),
        "expected the shard predicate to be CONSUMED by file pruning — " +
          "the regression this test exists for did not engage")
      // the UNFILTERED aggregate still rewrites after compaction (the
      // full scan is unpruned). A SUM rides along so ShardSink's own
      // metadata agg pushdown — which claims pure count/min/max rollups
      // on the compacted layout before this rule ever sees them, an even
      // cheaper answer — does not swallow the Aggregate node
      val qf = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
      qf.collect()
      assert(SinkMvRewrite.rewrites.get() === rBefore + 1L)
      // unregistering restores the base scan — on a FRESH frame (an
      // already-executed DataFrame reuses its cached plan, so re-running
      // q1 would prove nothing — review fix), pinned by the plan shape
      SinkMvRewrite.unregister(dir)
      val rFinal = SinkMvRewrite.rewrites.get()
      val qU = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
      qU.collect()
      assert(SinkMvRewrite.rewrites.get() === rFinal, "unregistered table was rewritten")
      assert(qU.queryExecution.executedPlan.toString.contains("ShardSinkScan["),
        "unregistered query did not return to the base scan")
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }

  test("coarser GROUP BYs and the global aggregate re-roll the MV's fine-group partials") {
    val dir = freshDir("mvrw_coarse")
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    append(s, dir, 0L, 600L)
    // per-(shard, doc bucket) grain — the query rolls it up coarser
    SinkMvDist.create(s, dir, mvDir, Seq("shard", "doc_id"), Seq(
      MvAgg("n", "count"), MvAgg("sd", "sum", "doc_id"),
      MvAgg("hi", "max", "doc_id")), buckets = 8)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      def base = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
      val r0 = SinkMvRewrite.rewrites.get()
      // coarser: GROUP BY shard over the (shard, doc_id)-grain MV —
      // extremes are exact at the coarse grain (min of fine mins)
      val qc = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"), max("doc_id").as("hi"))
      val c0 = ShardSink.dataFileReadCount.get()
      val gotC = qc.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(SinkMvRewrite.rewrites.get() === r0 + 1L, "coarser rollup did not rewrite")
      assert(ShardSink.dataFileReadCount.get() - c0 === 0L)
      val wantC = spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load().groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"), max("doc_id").as("hi"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(gotC === wantC)
      // global: no GROUP BY at all
      val qg = base.agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
      val gotG = qg.collect().head
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L, "global aggregate did not rewrite")
      assert(gotG.getLong(0) === 600L && gotG.getLong(1) === (599L * 600L) / 2L)
      // a group column OUTSIDE the MV's set still bails
      base.groupBy(col("body")).agg(count(lit(1)).as("n")).collect()
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L, "non-subset grouping was rewritten")
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }

  test("a stale MV whose tail expired under compaction falls back to the base scan") {
    val dir = freshDir("mvrw_hz")
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    append(s, dir, 0L, 400L) // v1
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      MvAgg("n", "count"), MvAgg("sd", "sum", "doc_id")), buckets = 4)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      append(s, dir, 400L, 500L) // v2: un-refreshed tail
      ShardSink.compact(dir) // v3: horizon = 3 — the (1, 3] feed expired
      val r0 = SinkMvRewrite.rewrites.get()
      val q = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
      // the rule must BAIL, not splice an expired change-feed scan that
      // fails the user's query at execution (review fix)
      val got = q.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(SinkMvRewrite.rewrites.get() === r0, "expired-tail MV was rewritten")
      val want = spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }

  test("a non-integral aggregate never maps to a BIGINT MV slot") {
    val root = java.nio.file.Files.createTempDirectory("mvrw_typ").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.mvrwt", classOf[graft.sources.ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.mvrwt.root", root)
    s.conf.set("spark.sql.catalog.mvrwt.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "400").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    docs(0L, 0L).writeTo("mvrwt.docs").append()
    s.sql("ALTER TABLE mvrwt.docs ADD COLUMN score DOUBLE")
    docs(0L, 300L).withColumn("score", col("doc_id") / 4.0).writeTo("mvrwt.docs").append()
    val dir = new java.io.File(root, "docs").getPath
    val mvDir = dir + ".mvd"
    // the MV folds sum(cast(score AS BIGINT)) — per-row truncation. A
    // query's sum(score) (a DOUBLE sum) matches the slot TEXTUALLY but
    // must NOT rewrite: the truncated slot is not the double sum
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      MvAgg("n", "count"), MvAgg("sc", "sum", "score")), buckets = 4)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      val r0 = SinkMvRewrite.rewrites.get()
      val got = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("score").as("sc"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(SinkMvRewrite.rewrites.get() === r0,
        "a DOUBLE sum was rewritten to the truncated BIGINT slot")
      val want = spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("score").as("sc"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want)
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }

  test("try_sum never maps to the MV's ANSI sum slot") {
    val dir = freshDir("mvrw_try")
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    append(s, dir, 0L, 300L)
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      MvAgg("n", "count"), MvAgg("sd", "sum", "doc_id")), buckets = 4)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      def base = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
      val r0 = SinkMvRewrite.rewrites.get()
      // try_sum(doc_id) matches the sum slot TEXTUALLY but differs in the
      // Long-overflow corner (NULL vs error) — it must fall back (advice
      // fix r18); plain sum in the same query shape still rewrites
      val gotTry = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), expr("try_sum(doc_id)").as("sd"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(SinkMvRewrite.rewrites.get() === r0, "try_sum was rewritten to the ANSI slot")
      val gotSum = base.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(SinkMvRewrite.rewrites.get() === r0 + 1L)
      assert(gotTry === gotSum)
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }

  test("a predicate-bearing MV matches the semantically-equal query WHERE") {
    val dir = freshDir("mvrw_pred")
    val mvDir = dir + ".mvd"
    val s = spark.newSession()
    append(s, dir, 0L, 600L)
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      MvAgg("n", "count"), MvAgg("sd", "sum", "doc_id")),
      where = "doc_id % 2 = 0 AND length(body) = 32", buckets = 4)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      def base = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
      def canon(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      // the same predicate — written with different spacing/order than the
      // definition — rewrites, base files stay closed
      val q = base.where(expr("length(body) = 32 AND doc_id % 2 = 0"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
      val r0 = SinkMvRewrite.rewrites.get()
      val c0 = ShardSink.dataFileReadCount.get()
      val got = canon(q.collect())
      assert(SinkMvRewrite.rewrites.get() === r0 + 1L, "predicate MV did not rewrite")
      assert(ShardSink.dataFileReadCount.get() - c0 === 0L)
      val want = canon(spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load()
        .where(expr("doc_id % 2 = 0 AND length(body) = 32"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
        .collect())
      assert(got === want)
      // tail compensation honors the predicate (a FRESH frame — an
      // already-optimized plan stays pinned to its snapshot, as any DSv2
      // scan does)
      append(s, dir, 600L, 700L)
      val q2 = base.where(expr("length(body) = 32 AND doc_id % 2 = 0"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
      val got2 = canon(q2.collect())
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L)
      assert(got2 === canon(spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).load()
        .where(expr("doc_id % 2 = 0 AND length(body) = 32"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("doc_id").as("sd"))
        .collect()))
      // a DIFFERENT predicate must not match, in either direction
      base.where(expr("doc_id % 2 = 1 AND length(body) = 32"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n")).collect()
      base.where(expr("doc_id % 2 = 0")).groupBy(col("shard"))
        .agg(count(lit(1)).as("n")).collect()
      base.groupBy(col("shard")).agg(count(lit(1)).as("n")).collect()
      assert(SinkMvRewrite.rewrites.get() === r0 + 2L,
        "a non-matching predicate (or no predicate) was rewritten against a predicate MV")
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }

  test("group liveness and NULL-ness survive the state ∪ tail compensation") {
    val root = java.nio.file.Files.createTempDirectory("mvrw_null").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.mvrwn", classOf[graft.sources.ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.mvrwn.root", root)
    s.conf.set("spark.sql.catalog.mvrwn.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.mvrwn.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.mvrwn.cdf.enabled", "true")
    def docs(lo: Long, hi: Long) = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "600").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    docs(0L, 0L).writeTo("mvrwn.docs").append()
    s.sql("ALTER TABLE mvrwn.docs ADD COLUMN val BIGINT") // NULL for doc < 300
    docs(0L, 300L).writeTo("mvrwn.docs").append()
    docs(300L, 400L).withColumn("val", col("doc_id")).writeTo("mvrwn.docs").append()
    val dir = new java.io.File(root, "docs").getPath
    val mvDir = dir + ".mvd"
    SinkMvDist.create(s, dir, mvDir, Seq("shard"), Seq(
      MvAgg("n", "count"), MvAgg("sv", "sum", "val")), buckets = 4)
    SinkMvRewrite.register(dir, mvDir)
    try {
      s.experimental.extraOptimizations = Seq(SinkMvRewrite)
      // the tail: delete every row carrying a non-null `val` AND all of
      // shard 3 — sum must go back to NULL (not 0) where the last
      // non-null contribution retracts, and shard 3 must LEAVE the result
      s.sql("DELETE FROM mvrwn.docs WHERE doc_id >= 300 OR shard = 3")
      val r0 = SinkMvRewrite.rewrites.get()
      val got = s.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("val").as("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toSet
      assert(SinkMvRewrite.rewrites.get() === r0 + 1L, "tail compensation did not rewrite")
      val want = spark.read.format("graft.sources.ShardSinkSource").option("path", dir).load()
        .groupBy(col("shard")).agg(count(lit(1)).as("n"), sum("val").as("sv"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) null else Long.box(r.getLong(2)))).toSet
      assert(got === want)
      assert(!got.exists(_._1 == 3), "emptied group survived the compensation")
      assert(got.forall(_._3 == null), "sum over all-null groups must be NULL, not 0")
    } finally {
      SinkMvRewrite.unregister(dir)
      s.experimental.extraOptimizations = Nil
    }
  }
}
