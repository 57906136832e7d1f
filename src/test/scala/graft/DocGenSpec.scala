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

  test("micro-batch offsets ratchet forward on recovery (no re-served rows)") {
    val s = new graft.sources.DocGenMicroBatchStream(0L, 100L, 2, 30L, Array("doc_id"))
    assert(s.latestOffset().asInstanceOf[graft.sources.DocGenOffset].pos === 30L)
    // restart path: Spark hands back the committed offset from the log —
    // the cursor must resume FROM it, never regress behind it
    s.deserializeOffset("60")
    assert(s.latestOffset().asInstanceOf[graft.sources.DocGenOffset].pos === 90L)
    s.commit(graft.sources.DocGenOffset(90L))
    assert(s.latestOffset().asInstanceOf[graft.sources.DocGenOffset].pos === 100L)
  }

  test("generated rows match the documented formula") {
    val row = load().where(col("doc_id") === 7L).collect().head
    assert(row.getLong(0) === 7L)
    assert(row.getInt(1) === 7)
    assert(row.getString(2) === DocGen.bodyOf(7L))
    assert(DocGen.bodyOf(7L).length === 32)
  }
}
