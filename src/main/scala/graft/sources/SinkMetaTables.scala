package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES over a shard-sink landing zone: the
  * manifest state, SQL-queryable through the catalog's extra identifier
  * level — `SELECT * FROM <cat>.<table>.files` (also `history`, `tags`,
  * `constraints`), exactly Iceberg's `db.table.files` spelling. A
  * landing-zone operator audits layout health (file sizes after
  * compaction, delete-vector presence, cloned-in foreign files), the
  * commit trail, and the governance state (tags, CHECK constraints)
  * with plain SQL — no API, no driver code.
  *
  * Everything is manifest-derived, driver-tiny (one row per file /
  * commit / tag / constraint — control-plane cardinality even at
  * 100 TB, where the same query over millions of files would be a real
  * distributed scan of the manifest store; the one-partition shape here
  * matches the harness's single-JSON manifests).
  */
object ShardSinkMetaTable {
  val Kinds: Set[String] = Set("files", "history", "tags", "constraints")

  def schemaOf(kind: String): StructType = kind match {
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("shard_min", IntegerType, nullable = true),
      StructField("shard_max", IntegerType, nullable = true),
      StructField("doc_min", LongType, nullable = true),
      StructField("doc_max", LongType, nullable = true),
      StructField("has_deletes", BooleanType, nullable = false),
      StructField("foreign", BooleanType, nullable = false)))
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("rows_added", LongType, nullable = false),
      StructField("ts_millis", LongType, nullable = true)))
    case "tags" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
    case "constraints" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("predicate", StringType, nullable = false)))
  }

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  def rowsOf(dir: String, kind: String): Seq[Array[Any]] = kind match {
    case "files" =>
      ShardSink.committedEntries(dir).map { e =>
        Array[Any](
          u(e.file), e.rows,
          if (e.hasStats) e.shardMin else null,
          if (e.hasStats) e.shardMax else null,
          if (e.hasDocStats) e.docMin else null,
          if (e.hasDocStats) e.docMax else null,
          e.hasDeletes, ShardSink.isForeign(e.file))
      }
    case "history" =>
      ShardSink.history(dir).map { case (v, op, rows, added) =>
        Array[Any](v, u(op), rows, added,
          ShardSink.manifestTsAt(dir, v).map(Long.box).orNull)
      }
    case "tags" =>
      ShardSink.listTags(dir).map { case (n, v) => Array[Any](u(n), v) }
    case "constraints" =>
      ShardSink.currentConstraints(dir).map { case (n, p) =>
        Array[Any](u(n), u(p))
      }
  }
}

case class ShardSinkMetaRows(rows: Seq[Array[Any]]) extends InputPartition

class ShardSinkMetaTable(dir: String, kind: String) extends Table with SupportsRead {
  override def name(): String = s"shardsink_meta($dir, $kind)"
  override def schema(): StructType = ShardSinkMetaTable.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = ShardSinkMetaTable.schemaOf(kind)
      override def description(): String = s"ShardSinkMetaScan[$dir, $kind]"
      override def toBatch: Batch = this
      // rows materialize at PLAN time (driver, manifest-only): the scan
      // snapshot is consistent even if a commit lands mid-query
      override def planInputPartitions(): Array[InputPartition] =
        Array(ShardSinkMetaRows(ShardSinkMetaTable.rowsOf(dir, kind)))
      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val rs = partition.asInstanceOf[ShardSinkMetaRows].rows
          new PartitionReader[InternalRow] {
            private var i = -1
            override def next(): Boolean = { i += 1; i < rs.size }
            override def get(): InternalRow = {
              val vs = rs(i)
              val row = new GenericInternalRow(vs.length)
              var c = 0
              while (c < vs.length) { row.update(c, vs(c)); c += 1 }
              row
            }
            override def close(): Unit = ()
          }
        }
    }
}
