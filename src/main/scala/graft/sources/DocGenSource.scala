package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector — the remaining Spark extension surface after
  * expressions (`graft.functions`), optimizer rules (`DotProductFusion`)
  * and whole-plan operators (`AsOfJoinPlan`): a custom table that
  * PARTICIPATES in planning instead of being a dumb row pump. The table is
  * a deterministic synthetic document corpus (doc_id → md5-derived body —
  * the crawl-simulator a 100 TB ingest pipeline uses for soak tests, and
  * deliberately derivable in DuckDB SQL so the whole connector is
  * hash-checkable end to end):
  *
  *   - **filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *     predicates on `doc_id` tighten the generated [lo, hi) interval
  *     INSIDE the source — accepted filters return no residual, so the
  *     plan carries no post-scan Filter for them;
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *     reader materializes only the requested fields (`body`, the
  *     expensive one, is never computed when pruned away);
  *   - **partition planning**: the surviving interval splits into
  *     `numPartitions` contiguous ranges — pushdown therefore IS
  *     partition pruning (a fully-filtered range plans zero partitions).
  *
  * Scale posture: partitions are independent closed-form ranges (no
  * driver-side row data, no skew — ranges are equal-width), the reader is
  * O(1) state, and every planning decision is visible in `Scan.description`
  * for plan-level tests. Registered by fully-qualified class name:
  * `spark.read.format("graft.sources.DocGenSource")`.
  */
class DocGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocGen.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocGenTable(
      properties.getOrDefault("numDocs", DocGen.DefaultNumDocs.toString).toLong,
      properties.getOrDefault("numPartitions", DocGen.DefaultNumPartitions.toString).toInt,
      properties.getOrDefault("streamBatchSize", DocGen.DefaultStreamBatchSize.toString).toLong)
}

object DocGen {
  val DefaultNumDocs = 60000L
  val DefaultNumPartitions = 8
  val DefaultStreamBatchSize = 5000L

  /** doc_id, shard = doc_id % 16, body = md5 hex of the decimal id —
    * cheap, deterministic, and byte-identical to DuckDB's
    * `md5(CAST(doc_id AS VARCHAR))`.
    */
  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("shard", IntegerType, nullable = false)
    .add("body", StringType, nullable = false)

  private val HexChars = "0123456789abcdef".toCharArray

  /** Per-row hot path: reuse one thread-local digest and a table-driven
    * hex encoder (a fresh MessageDigest + 16 Formatter calls per row would
    * dominate the generation cost the connector exists to benchmark).
    */
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def bodyOf(docId: Long): String = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(docId.toString.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Driver-checked exercise of the connector: a doc_id range predicate
    * (pushed into the source — the plan carries no post-scan Filter for
    * it) + per-shard rollup over all three columns. The DuckDB oracle
    * re-derives the ENTIRE table from `range()` + the same md5 formula,
    * so the connector's generation, pushdown arithmetic, and pruning are
    * all under the hash gate. sfDir-independent by design (the source is
    * synthetic); constant cost at every SF.
    */
  def dsv2Scan(spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", DefaultNumDocs.toString)
      .option("numPartitions", DefaultNumPartitions.toString)
      .load()
      .where(col("doc_id") >= 1000L && col("doc_id") < 26000L)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(substring(col("body"), 1, 1) === "a", 1L).otherwise(0L)).as("n_body_a"))
      .orderBy("shard")
  }

  val dsv2ScanSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS body
      |  FROM range(1000, 26000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN substring(body, 1, 1) = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_body_a
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  private val streamSinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Micro-batch parity for the connector's streaming mode: the SAME
    * generated corpus drains as a 4-micro-batch stream (latestOffset
    * advances one `streamBatchSize` per call — genuinely multi-batch,
    * state crosses batch boundaries in the complete-mode aggregate) and
    * the final per-shard (count, bit_xor) table must equal the batch
    * read's — `n_diff = 0` is under the hash gate, with DuckDB
    * re-deriving the totals from `range()`.
    */
  def dsv2StreamParity(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val nDocs = 20000L
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("shard")).agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"))
    val sink = s"graft_dsv2_stream_${streamSinkCounter.incrementAndGet()}"
    val q = rollup(
      spark.readStream.format("graft.sources.DocGenSource")
        .option("numDocs", nDocs.toString)
        .option("numPartitions", "4")
        .option("streamBatchSize", (nDocs / 4 + 1).toString)
        .load())
      .writeStream.outputMode("complete").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sink)
    val batch = rollup(
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", nDocs.toString).option("numPartitions", "4").load())
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed.agg(count(lit(1)), sum(col("n_docs"))).collect().head
    import spark.implicits._
    Seq((totals.getLong(0), totals.getLong(1), nDiff))
      .toDF("n_shards", "n_docs", "n_diff")
  }

  val dsv2StreamParitySql: String =
    """WITH g AS (SELECT CAST(doc_id % 16 AS INT) AS shard FROM range(0, 20000) t(doc_id))
      |SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM g""".stripMargin
}

class DocGenTable(numDocs: Long, numPartitions: Int, streamBatchSize: Long)
  extends Table with SupportsRead {
  override def name(): String = s"docgen($numDocs)"
  override def schema(): StructType = DocGen.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocGenScanBuilder(numDocs, numPartitions, streamBatchSize)
}

/** Mutable planning state: the [lo, hi) interval tightened by every
  * accepted `doc_id` predicate, and the pruned schema.
  */
class DocGenScanBuilder(
    numDocs: Long, numPartitions: Int, streamBatchSize: Long = DocGen.DefaultStreamBatchSize)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = numDocs
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = DocGen.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThan("doc_id", _: Long) => true
      case GreaterThanOrEqual("doc_id", _: Long) => true
      case LessThan("doc_id", _: Long) => true
      case LessThanOrEqual("doc_id", _: Long) => true
      case EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    // saturating +1: v = Long.MaxValue must clamp, not wrap (a wrapped
    // bound with no residual would silently return wrong rows)
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    ours.foreach {
      case GreaterThan("doc_id", v: Long) =>
        lo = math.max(lo, succ(v)); if (v == Long.MaxValue) hi = lo // > MAX: empty
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long) => hi = math.min(hi, succ(v))
      case EqualTo("doc_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, succ(v))
      case _ =>
    }
    accepted = ours
    residual // range semantics are exact — accepted filters need no re-check
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    DocGenScan(lo, math.max(lo, hi), numPartitions, required, streamBatchSize)
}

case class DocGenRange(start: Long, end: Long) extends InputPartition

case class DocGenScan(
    lo: Long, hi: Long, numPartitions: Int, required: StructType,
    streamBatchSize: Long = DocGen.DefaultStreamBatchSize)
  extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"DocGenScan[range=[$lo,$hi), partitions=$numPartitions, columns=${required.fieldNames.mkString(",")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    DocGenScan.split(lo, hi, numPartitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(required.fieldNames)

  /** Micro-batch form: the same rows drain as a bounded stream,
    * `streamBatchSize` ids per batch — the connector's ingest-simulation
    * mode. Offsets are plain positions in [lo, hi]; each batch plans the
    * same contiguous-range partitions the batch path uses.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DocGenMicroBatchStream(lo, hi, numPartitions, streamBatchSize, required.fieldNames)
}

object DocGenScan {
  def split(lo: Long, hi: Long, numPartitions: Int): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty // fully pruned: ZERO partitions planned
    val width = math.max(1L, (n + numPartitions - 1) / numPartitions)
    (lo until hi by width).map(s => DocGenRange(s, math.min(hi, s + width))).toArray
  }
}

/** Position offset in the generated id space. */
case class DocGenOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

class DocGenMicroBatchStream(
    lo: Long, hi: Long, numPartitions: Int, batchSize: Long, fields: Array[String])
  extends MicroBatchStream {
  // latestOffset advances one batch per call (the rate-source pattern), so
  // a drain via processAllAvailable genuinely exercises MULTI-batch
  // execution instead of one giant batch. The cursor is RESTART-SAFE: any
  // offset Spark hands back from the checkpoint log (deserializeOffset on
  // recovery, commit after each batch) ratchets `served` forward, so a
  // restarted query resumes from the committed position instead of
  // regressing the offset log and re-serving rows.
  private var served = lo
  private def ratchet(pos: Long): Unit = synchronized {
    served = math.max(served, math.min(hi, pos))
  }
  override def initialOffset(): Offset = DocGenOffset(lo)
  override def latestOffset(): Offset = synchronized {
    served = math.min(hi, served + batchSize)
    DocGenOffset(served)
  }
  override def deserializeOffset(json: String): Offset = {
    val pos = json.trim.toLong
    ratchet(pos)
    DocGenOffset(pos)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    DocGenScan.split(
      start.asInstanceOf[DocGenOffset].pos, end.asInstanceOf[DocGenOffset].pos, numPartitions)
  override def createReaderFactory(): PartitionReaderFactory =
    new DocGenReaderFactory(fields)
  override def commit(end: Offset): Unit = ratchet(end.asInstanceOf[DocGenOffset].pos)
  override def stop(): Unit = ()
}

class DocGenReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[DocGenRange]
    new PartitionReader[InternalRow] {
      private var cur = r.start - 1
      override def next(): Boolean = { cur += 1; cur < r.end }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(fields.length)
        var i = 0
        while (i < fields.length) {
          fields(i) match {
            case "doc_id" => row.update(i, cur)
            case "shard" => row.update(i, (cur % 16).toInt)
            case "body" => row.update(i, UTF8String.fromString(DocGen.bodyOf(cur)))
          }
          i += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
