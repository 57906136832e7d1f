package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{
  Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder,
  DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsDelta, Write,
  WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path — the one connector direction DocGenSource
  * (read-side) leaves unexercised: a landing-zone sink with the
  * manifest-commit protocol every real distributed sink uses.
  *
  * Transactional contract (the point of the exercise):
  *   - each task's [[DataWriter]] streams rows to a PRIVATE temp file
  *     (`_tmp/<query>-p<partition>-a<attempt>`) — no reader can observe it;
  *   - task commit returns the temp path + row count as the commit
  *     message; task abort deletes the temp file — a failed/retried task
  *     leaves NOTHING visible (speculative duplicates die the same way:
  *     Spark's output-commit coordinator admits one winner per partition);
  *   - driver [[BatchWrite.commit]] renames the winners to job-unique
  *     `part-b<queryId>-<n>.tsv` names and THEN writes the next VERSIONED
  *     manifest (`_manifest.v<N>.json`, highest N wins — see
  *     [[ShardSink.writeManifestAt]]): visibility of the whole job is one
  *     atomic rename to a fresh name, so readers either see the complete
  *     committed file set or the previous version — a crash mid-commit
  *     can never make committed data invisible. Append MERGES the prior
  *     manifest's entries (jobs accumulate); truncate replaces them and
  *     deletes the orphans after the flip. [[BatchWrite.abort]] deletes
  *     the temps.
  *
  * The READ path trusts only the manifest: unmanifested files (from a
  * crashed job, a concurrent writer, an aborted attempt) are invisible.
  * One InputPartition per committed file preserves write parallelism.
  *
  * Fixed 3-column contract (doc_id BIGINT, shard INT, body STRING — the
  * docgen crawl's landing schema), TSV; bodies may not contain
  * tab/newline (validated at write — the md5-hex bodies never do).
  * `q_dsv2_write_roundtrip` drives write→manifest→read end-to-end under
  * the DuckDB hash gate.
  *
  * All IO goes through the Hadoop FileSystem API ([[SinkFs]]), so the
  * same commit sequence runs on HDFS (atomic rename) as on the local FS
  * used in tests. Known caveat, stated rather than hidden: on S3A-style
  * object stores rename is copy+delete (production there would swap the
  * final move for a conditional PUT). The round-12 delete-then-rename
  * manifest replacement — whose crash window degraded the whole table to
  * invisible — was retired in round 13 for version-numbered manifests
  * with fresh-name renames: no replace window exists at all.
  */
class ShardSinkSource extends TableProvider {
  // a time-travel read option pins the TABLE to that version, so the
  // reported schema is the per-version one (evolution-aware travel, same
  // contract as the catalog's VERSION AS OF path)
  private def asOfOf(path: String, get: String => String): Option[Long] =
    ShardSink.resolveAsOfOpts(path, Option(get("versionAsOf")),
      Option(get("timestampAsOf")), Option(get("tag")))
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("shard sink requires a 'path' option"))
    if (options.getBoolean("readChangeFeed", false)) ShardSink.changeSchemaOf(path)
    else asOfOf(path, options.get).map(ShardSink.schemaAtVersion(path, _))
      .getOrElse(ShardSink.tableSchema(path))
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "shard sink requires a 'path' option")
    // Delta's readChangeFeed spelling: the CDF is a DIFFERENT table shape
    // (change metadata columns), so it gets its own Table incarnation
    if ("true".equalsIgnoreCase(properties.get("readChangeFeed")))
      new ShardSinkChangeTable(path)
    else new ShardSinkTable(path,
      asOf = asOfOf(path, properties.get),
      deleteMode = Option(properties.get("delete.mode")).getOrElse("copy-on-write"),
      rloMode = Option(properties.get("rlo.mode")).getOrElse("copy-on-write"),
      cdfEnabled = "true".equalsIgnoreCase(properties.get("cdf.enabled")),
      // Delta's writer option: `.option("mergeSchema", "true")` lets an
      // append/overwrite carry NEW columns — resolved by name, persisted
      // in the same commit as the rows (see ShardSinkTable.newWriteBuilder)
      acceptAnySchema = "true".equalsIgnoreCase(properties.get("mergeSchema")),
      // Delta's autoOptimize: `.option("autoCompact", "<rowsPerFile>")`
      // runs a binPack pass after each successful append — a no-op when
      // everything is already in band, so steady-state appends pay once
      autoCompact = Option(properties.get("autoCompact")).map(_.toLong))
  }
}

/** The change-feed incarnation of a landing zone
  * (`option("readChangeFeed", "true")`): batch reads versions
  * (`changeFeedFrom`, `changeFeedTo`] (defaults 0, current); streaming
  * tails one commit's changes per trigger. See
  * [[ShardSink.changePartitions]] for exactly which commits are change
  * events.
  */
class ShardSinkChangeTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"shardsink_changes($path)"
  override def schema(): StructType = ShardSink.changeSchemaOf(path)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ShardSinkChangeScan(
        path,
        Option(options.get("changeFeedFrom")).map(_.toLong).getOrElse(0L),
        Option(options.get("changeFeedTo")).map(_.toLong))
    }
}

/** @param deleteMode `copy-on-write` (default: straddling files are
  *   rewritten, [[ShardSink.deleteWhereImpl]]) or `merge-on-read`
  *   (delete vectors, [[ShardSink.morDeleteImpl]]) — the same knob
  *   Iceberg spells `write.delete.mode`, here a table/catalog option.
  * @param rloMode strategy for SQL UPDATE / MERGE (and rewrite-DELETE):
  *   `copy-on-write` (default: group-based
  *   [[ShardSinkRowLevelOperation]], affected files rewritten whole) or
  *   `merge-on-read` (delta-based [[ShardSinkDeltaOperation]]: deletes
  *   and updates land as positional delete vectors plus an append of the
  *   new rows — Iceberg's `write.update.mode`/`write.merge.mode`).
  * @param cdfEnabled Delta's `enableChangeDataFeed` as a table/catalog
  *   option, default OFF like Delta's: when on, commits whose row-level
  *   changes cannot be derived from the manifest diff (CoW DML, delta
  *   updates) write their change record at commit time
  *   ([[ShardSink.writeCdcSidecar]]) so `readChangeFeed` is exact — CoW
  *   rewrites pay the extra driver-side diff ONLY when the table opts
  *   in. When off, a later change-feed read over a CoW-DML version
  *   fails loudly (never silently misses rows), and delta updates
  *   surface collapsed as delete+insert (complete, just unpaired).
  */
class ShardSinkTable(
    path: String, asOf: Option[Long] = None, deleteMode: String = "copy-on-write",
    rloMode: String = "copy-on-write", cdfEnabled: Boolean = false,
    acceptAnySchema: Boolean = false, pendingSchema: Option[StructType] = None,
    // the persisted schema the PENDING shape was merged from (staged
    // REPLACE): the write's concurrent-ALTER guard pins THIS, not a
    // re-read — see the basisSchema note in newWriteBuilder
    pendingBasis: Option[String] = None,
    autoCompact: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"shardsink($path)"

  /** Backing directory + version pin, read by the MV-rewrite rule to
    * match registered base tables (a version-pinned read is never
    * rewritten — the MV reflects the CURRENT watermark, and pinned scans
    * are exactly what the MV machinery's own recomputes use).
    */
  def tableDir: String = path
  def pinnedVersion: Option[Long] = asOf

  /** [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]]:
    * SQL UPDATE / MERGE INTO (and the copy-on-write fallback for DELETEs
    * outside the metadata-only predicate class). `rlo.mode` picks the
    * strategy: group-based copy-on-write ([[ShardSinkRowLevelOperation]])
    * or delta-based merge-on-read ([[ShardSinkDeltaOperation]]). With
    * SupportsDelete also present Spark picks the cheaper path per
    * statement: metadata delete when `canDeleteWhere` accepts, row-level
    * rewrite otherwise.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    rloMode match {
      case "merge-on-read" => () => new ShardSinkDeltaOperation(path, info.command(), cdfEnabled)
      case "copy-on-write" => () => new ShardSinkRowLevelOperation(path, info.command(), cdfEnabled)
      case other => throw new IllegalArgumentException(
        s"unknown rlo.mode '$other' (copy-on-write | merge-on-read)")
    }

  /** [[org.apache.spark.sql.connector.catalog.SupportsMetadataColumns]]:
    * the positional row identity of the lakehouse formats — `_file` (the
    * committed file's manifest name) and `_pos` (the physical 0-based row
    * position inside it, stable under merge-on-read vectors because
    * vector positions are physical too). The delta operation's
    * [[ShardSinkDeltaOperation.rowId]] keys on exactly these, and any
    * read can project them for provenance.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String = "committed file (manifest name)"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_pos"
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.LongType
        override def isNullable: Boolean = false
        override def comment(): String = "physical 0-based row position in _file"
      })
  /** The version-pinned schema: a time-travelled table reads under the
    * schema AS OF that version (rows appended post-evolution are
    * invisible there anyway, so the old shape is the truthful one).
    * `pendingSchema` (a staged REPLACE that evolves columns) overrides:
    * the stage must report the TARGET shape so Spark projects the
    * replacement query into it — the evolution itself is persisted only
    * by the staged write's own commit (see [[ShardSinkWrite]]).
    */
  override def schema(): StructType = pendingSchema.getOrElse(asOf match {
    case Some(v) => ShardSink.schemaAtVersion(path, v)
    case None => ShardSink.tableSchema(path)
  })

  /** `SHOW TBLPROPERTIES <cat>.<t>` surface: the table state the
    * manifest carries — current version, retention horizon, CHECK
    * constraints (under the same `graft.constraint.<name>` keys the DDL
    * uses, so SHOW output is re-runnable DDL), tags, and the DML modes
    * in force. Driver-tiny, manifest-only.
    */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("graft.version", ShardSink.currentManifestVersion(path).toString)
    m.put("graft.horizon", ShardSink.horizonOf(path).toString)
    m.put("delete.mode", deleteMode)
    m.put("rlo.mode", rloMode)
    m.put("cdf.enabled", cdfEnabled.toString)
    ShardSink.currentConstraints(path).foreach { case (n, p) =>
      m.put(s"graft.constraint.$n", p)
    }
    ShardSink.listTags(path).foreach { case (n, v) =>
      m.put(s"graft.tag.$n", v.toString)
    }
    m
  }
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.STREAMING_WRITE)
    // mergeSchema writes: Spark's by-position output check would reject
    // the wider frame before the connector ever saw it — declare
    // ACCEPT_ANY_SCHEMA (Delta's approach) and do NAME-based resolution
    // + evolution admission in newWriteBuilder instead
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }

  /** [[org.apache.spark.sql.connector.catalog.SupportsDelete]]: SQL
    * `DELETE FROM <catalog>.<table> WHERE …` handled by the connector —
    * metadata-only when the predicate aligns with the shard-whole file
    * layout, rewrite-under-new-name otherwise; see
    * [[ShardSink.deleteWhereImpl]]. Unsupported predicates (e.g. on
    * `body`) are rejected HERE so Spark raises a clean error instead of
    * the sink guessing.
    */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    ShardSink.deletePredicate(filters).isDefined
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    deleteMode match {
      case "merge-on-read" => ShardSink.morDeleteImpl(path, filters)
      case "copy-on-write" => ShardSink.deleteWhereImpl(path, filters, cdfEnabled)
      case other => throw new IllegalArgumentException(
        s"unknown delete.mode '$other' (copy-on-write | merge-on-read)")
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // ONE persisted-schema read feeds expect, evolveTo AND the write's
    // concurrent-ALTER pin (review fix: three separate reads left a
    // window where an ALTER landing between them made the guard compare
    // against the post-ALTER schema and pass — the evolving commit then
    // silently reverted the concurrent evolution)
    val persisted = ShardSink.tableSchema(path)
    val expect = pendingSchema.getOrElse(persisted)
    val incoming = info.schema()
    val exact = incoming.fields.map(f => (f.name, f.dataType)).sameElements(
      expect.fields.map(f => (f.name, f.dataType)))
    // WRITE-SIDE AUTO SCHEMA EVOLUTION (round 15 — Delta's mergeSchema):
    // under ACCEPT_ANY_SCHEMA the incoming frame resolves by NAME — new
    // columns are admitted as nullable evolution, missing evolved
    // columns null-fill, and the widened schema is persisted IN THE SAME
    // manifest flip as the rows (never a separate ALTER commit a crash
    // could strand). Without the option the exact-schema contract holds.
    val (target, colMap) =
      if (exact) (expect, null: Array[Int])
      else {
        require(acceptAnySchema,
          s"shard sink expects ${expect.simpleString}, got ${incoming.simpleString}")
        ShardSink.resolveWriteSchema(expect, incoming)
      }
    // the evolution (or a staged REPLACE's pending schema) rides the
    // write's own commit — compare against what is PERSISTED now
    val evolveTo = {
      val t = ShardSink.schemaString(target)
      if (t == ShardSink.schemaString(persisted)) None else Some(t)
    }
    // what the target was DERIVED from: the stage-time schema for a
    // staged REPLACE's merge, the just-read persisted schema otherwise
    val basis = pendingBasis.getOrElse(ShardSink.schemaString(persisted))
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsOverwrite {
      // SaveMode.Overwrite maps here: the new job's manifest REPLACES the
      // old one (old files become invisible the instant it lands), and
      // commit() then deletes the orphaned previous files — visibility
      // flips atomically, physical cleanup follows
      private var doTruncate = false
      // FILTERED OVERWRITE (Delta's replaceWhere / dynamic-partition
      // backfill): `writeTo(t).overwrite(cond)` atomically replaces the
      // rows matching `cond` with the incoming data in ONE commit —
      // drop side via the DELETE WHERE copy-on-write core (metadata-only
      // for shard-aligned predicates), insert side the ordinary
      // clustered append, one manifest flip covering both
      private var replaceFilters: Option[Array[org.apache.spark.sql.sources.Filter]] = None
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
        if (filters.exists(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
          doTruncate = true // overwrite(true) IS a truncate
        else {
          // fail at PLAN time on unsupported predicates, not mid-commit
          require(ShardSink.deletePredicate(filters).isDefined,
            s"unsupported overwrite predicate for shard sink: ${filters.mkString(", ")} " +
              "(supported: doc_id/shard comparisons and conjunctions)")
          replaceFilters = Some(filters)
        }
        this
      }
      override def build(): Write =
        new ShardSinkWrite(path, info.queryId(), doTruncate, target,
          replaceFilters, cdfEnabled, colMap = colMap, evolveTo = evolveTo,
          basisSchema = basis, autoCompact = autoCompact)
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // time travel, all the spellings: SQL `VERSION AS OF n` /
    // `VERSION AS OF 'tag'` / `TIMESTAMP AS OF ts` arrive via
    // [[ShardSinkCatalog.loadTable]] overloads (the table-level asOf);
    // the `versionAsOf` / `timestampAsOf` / `tag` read options arrive
    // here. Timestamps resolve to the newest version committed
    // at-or-before the instant; tags resolve through their ref file.
    val v = ShardSink.resolveAsOfOpts(path, Option(options.get("versionAsOf")),
      Option(options.get("timestampAsOf")), Option(options.get("tag")))
      .orElse(asOf)
    // STATS-BASED FILE SKIPPING (round 13): shard-constraining conjuncts
    // prune whole files against the manifest's per-file shard range before
    // any data IO — file-granular only, so every filter is also returned
    // as a residual for Spark to re-apply row-level (pruning can keep a
    // file that still contains non-matching rows).
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
      private var prune: Option[Set[Int]] = None
      private var pruneDocs: Option[(Long, Long)] = None
      private var prunePoints: Option[Set[Long]] = None
      // generic per-column envelope predicates ([[SinkColStats]]) — file
      // skipping on ANY eligible payload column; always residual (a kept
      // file may still hold non-matching rows), never consumption-eligible
      private var pruneColPreds: Seq[SinkColStats.ColPred] = Nil
      private var used: Array[Filter] = Array.empty
      private var sawFilters = false
      // filters CONSUMED by file-exact pruning (returned empty from
      // pushFilters): the built scan carries them so a downstream plan
      // analysis (the MV-rewrite rule) can reconstruct the predicate a
      // consumed Filter node no longer testifies to
      private var consumedF: Seq[Filter] = Nil
      // FILE-EXACT FILTER CONSUMPTION (round 15): when every pushed
      // filter is in the shard/doc class AND the manifest proves every
      // kept file is ALL-match (stats fully inside the predicate — the
      // shard-pure compacted layout makes this the common case for
      // shard-keyed predicates), the filters are consumed here: no
      // residual, the row scan reads exactly the matching rows, and —
      // the point — a COUNT/MIN/MAX on top stays eligible for the
      // manifest-only push. `SELECT count(*) WHERE shard IN (…)` on a
      // compacted landing zone is then zero data IO, the
      // partition-pruned count every table format special-cases. The
      // scan pins the version resolved HERE so the claim cannot rot
      // under a concurrent commit (snapshot isolation, like Delta).
      private var pinnedV: Option[Long] = v
      // ONE manifest resolution shared by the consumption proof and the
      // aggregate soundness gates (review fix: this was resolved up to
      // three times per planned query — and the gates validated against
      // a version the unpinned scan would NOT read, letting the purity
      // claim rot under a concurrent commit). prune/pruneDocs are set by
      // pushFilters before any aggregate call, so caching is safe.
      private var resolvedOnce: Option[(Option[Long], Seq[SinkEntry])] = None
      private def resolveForProof(): (Option[Long], Seq[SinkEntry]) =
        resolvedOnce.getOrElse {
          val pv = v.orElse(Some(ShardSink.currentManifestVersion(path)))
          // prunePoints rides the proof too: a bloom-pruned file contains
          // NO sought id, so excluding it from the all-match set (and
          // from a consumed count/min/max) is exact — and it keeps the
          // PLANNING read at O(bloom-positive segments), which is the
          // whole point on a point lookup over a segmented manifest
          val r = (pv, ShardSink.entriesAsOfPruned(path, pv, prune, pruneDocs,
            prunePoints))
          resolvedOnce = Some(r)
          r
        }
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        sawFilters = filters.nonEmpty
        prune = ShardSink.shardPruneSet(filters)
        pruneDocs = ShardSink.docPruneRange(filters)
        prunePoints = ShardSink.docPointSet(filters)
        // compiled once per filter: the flattened preds drive pruning and
        // the per-filter view drives the pushed-filter report
        val colPredsPerFilter = filters.map(f => SinkColStats.predsOf(Array(f), table))
        pruneColPreds = colPredsPerFilter.toSeq.flatten
        used = filters.zip(colPredsPerFilter).collect {
          case (f, ps) if ShardSink.oneShardSet(f).isDefined ||
            ShardSink.oneDocInterval(f).isDefined || ps.nonEmpty => f
        }
        // consumption eligibility: every filter understood EXACTLY —
        // shard filters are exact by construction (value sets, not
        // hulls), doc filters only in the convex class (review fix:
        // `oneDocInterval` HULLS In/Or — sound for skipping, WRONG for
        // consumption: `doc_id IN (0, 399)` hulls to [0,399] and a file
        // fully inside the hull is NOT all-match). IsNotNull on the
        // non-nullable core columns is trivially true.
        val understood = filters.forall {
          case org.apache.spark.sql.sources.IsNotNull("doc_id" | "shard" | "body") => true
          case f => ShardSink.oneShardSet(f).isDefined ||
            ShardSink.exactDocInterval(f)
        }
        if (sawFilters && understood) {
          val (pv, kept) = resolveForProof()
          val exact = kept.forall { e =>
            prune.forall(s => e.hasStats &&
              (e.shardMin to e.shardMax).forall(s.contains)) &&
              pruneDocs.forall { case (lo, hi) =>
                e.hasDocStats && e.docMin >= lo && e.docMax <= hi }
          }
          if (exact) {
            pinnedV = pv
            used = filters
            consumedF = filters.toSeq
            sawFilters = false // fully applied by file pruning
            return Array.empty
          }
        }
        filters // all residual: skipping decides which FILES to read
      }
      override def pushedFilters(): Array[Filter] = used
      // column pruning doubles as the metadata-column channel: a read
      // projecting `_file`/`_pos` arrives here with them appended
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      // the version-pinned schema: positional layout for the reader AND
      // the unpruned default projection
      private val table: StructType = v match {
        case Some(ver) => ShardSink.schemaAtVersion(path, ver)
        case None => ShardSink.tableSchema(path)
      }
      private var required: StructType = table
      /** METADATA-ONLY COUNT (round 13): an unfiltered, ungrouped
        * `COUNT(*)` (or COUNT of a non-nullable column) is answered
        * straight from the manifest's live-row bookkeeping — zero data
        * IO, the `SELECT COUNT(*)` every table format special-cases.
        * Filters disqualify (this scan applies none itself); Spark only
        * attempts the push when no post-scan filter remains, and the
        * guard keeps the contract local.
        */
      /** METADATA-ONLY AGGREGATES (rounds 13/14/15): an ungrouped
        * COUNT(*) / COUNT(non-nullable col) answers from the manifest's
        * live-row bookkeeping, and MIN/MAX over the stats columns
        * (doc_id, shard) answer from the per-file ranges — zero data IO
        * either way, the `SELECT COUNT(*)/MIN/MAX` every table format
        * special-cases. Residual filters disqualify (this scan applies
        * none itself) — but filters CONSUMED by the file-exact pruning
        * path above stay eligible: the builder proved every kept file is
        * all-match, so the pruned entries' bookkeeping IS the filtered
        * answer. MIN/MAX additionally require every (kept) entry to
        * carry the stat AND no delete vectors anywhere: a vector may
        * have killed exactly the extreme row, making the file-level
        * range an over-approximation — COUNT stays eligible because
        * live-row counts are maintained through vector growth.
        *
        * GROUP BY shard (round 15): on a compacted layout where EVERY
        * kept entry is shard-PURE (s0 == s1 — rows never cross files
        * within a shard), the per-shard rollup is exactly the per-file
        * bookkeeping summed by shard: `SELECT shard, count(*) GROUP BY
        * shard` answers from the manifest with zero data IO, the
        * partition-level rollup a 100 TB landing zone is asked for
        * hourly. Straddling entries disqualify (a file's rows cannot be
        * attributed to one group), and a shard whose live rows all died
        * to vectors emits NO group row — group-by over zero rows has no
        * group.
        */
      private def metaAggs(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
          : Option[(Boolean, Seq[ShardSinkMetaAgg])] = {
        import org.apache.spark.sql.connector.expressions.NamedReference
        import org.apache.spark.sql.connector.expressions.aggregate._
        def col1(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
          e match {
            case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames.head)
            case _ => None
          }
        val grouped = agg.groupByExpressions() match {
          case Array() => Some(false)
          case Array(e) if col1(e).contains("shard") => Some(true)
          case _ => None
        }
        if (sawFilters || grouped.isEmpty || agg.aggregateExpressions().isEmpty) None
        else {
          val specs = agg.aggregateExpressions().toSeq.map {
            case _: CountStar => Some(MetaCount)
            case c: Count if !c.isDistinct =>
              col1(c.column).flatMap {
                case "doc_id" | "shard" | "body" => Some(MetaCount) // non-null core
                case n => payloadStatCol(n).map(_ => MetaCountCol(n))
              }
            case m: Min => col1(m.column).flatMap {
              case "doc_id" => Some(MetaMinDoc)
              case "shard" => Some(MetaMinShard)
              case n => payloadStatCol(n).map { dt => MetaMinCol(n, dt) }
            }
            case m: Max => col1(m.column).flatMap {
              case "doc_id" => Some(MetaMaxDoc)
              case "shard" => Some(MetaMaxShard)
              case n => payloadStatCol(n).map { dt => MetaMaxCol(n, dt) }
            }
            case _ => None
          }
          if (specs.exists(_.isEmpty)) None
          else {
            val out = specs.flatten
            val g = grouped.get
            // soundness gates, resolved ONCE and version-PINNED (review
            // fix: validating purity/no-deletes against the current
            // version and then executing unpinned let a concurrent
            // commit rot the claim between plan and run): grouped pushes
            // need shard-pure entries, MIN/MAX need full stats and zero
            // delete vectors
            if (!g && out.forall(_ == MetaCount)) Some((g, out))
            else {
              val (_, entries) = resolveForProof()
              val pure = !g ||
                entries.forall(e => e.hasStats && e.shardMin == e.shardMax)
              val docShard = out.exists(a =>
                a == MetaMinDoc || a == MetaMaxDoc ||
                  a == MetaMinShard || a == MetaMaxShard)
              val minmaxOk = !docShard ||
                entries.forall(e => e.hasStats && e.hasDocStats && !e.hasDeletes)
              // payload MIN/MAX: every entry must carry the column's
              // envelope under the column's own tag, vectors-free —
              // the same over-approximation argument as doc/shard
              val payloadCols = out.collect {
                case MetaMinCol(n, dt) => (n, SinkColStats.tagOf(dt).get)
                case MetaMaxCol(n, dt) => (n, SinkColStats.tagOf(dt).get)
              }.distinct
              // COUNT(col) additionally needs the null count in every
              // entry (round-16 tokens; legacy envelopes stay min/max-only)
              val countCols = out.collect { case MetaCountCol(n) => n }.distinct
              val payloadOk = (payloadCols.isEmpty && countCols.isEmpty) ||
                entries.forall { e =>
                  !e.hasDeletes && e.cs.nonEmpty && {
                    val m = SinkColStats.decode(e.cs)
                    payloadCols.forall { case (n, t) => m.get(n).exists(_.t == t) } &&
                      countCols.forall(n => m.get(n).exists(_.nc.isDefined))
                  }
                }
              if (pure && minmaxOk && payloadOk) Some((g, out)) else None
            }
          }
        }
      }
      /** A payload column eligible for envelope-answered MIN/MAX: in the
        * pinned schema, stat-typed. doc_id/shard use the dedicated specs.
        */
      private def payloadStatCol(n: String)
          : Option[org.apache.spark.sql.types.DataType] =
        if (!table.fieldNames.contains(n)) None
        else {
          val dt = table(n).dataType
          SinkColStats.tagOf(dt).map(_ => dt)
        }
      private var pushedMeta: Option[(Boolean, Seq[ShardSinkMetaAgg])] = None
      override def supportCompletePushDown(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
        metaAggs(agg).isDefined
      override def pushAggregation(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
        metaAggs(agg) match {
          case some @ Some((g, out)) =>
            pushedMeta = some
            // pin the gated pushes to the version the gate validated —
            // the scan then reads exactly the proven snapshot
            if (g || out.exists(_ != MetaCount)) pinnedV = resolveForProof()._1
            true
          case None => false
        }
      override def build(): Scan = pushedMeta match {
        case Some((g, specs)) =>
          new ShardSinkCountScan(path, pinnedV, specs, prune, pruneDocs,
            prunePoints = prunePoints, groupByShard = g)
        case None =>
          new ShardSinkScan(path, pinnedV, prune, required, pruneDocs, table, prunePoints,
            pruneColPreds, consumedF)
      }
    }
  }
}

/** The pushed metadata-only aggregate shapes ([[ShardSinkCountScan]]):
  * live-row COUNT from the manifest bookkeeping; MIN/MAX over the stats
  * columns from the per-file ranges (eligibility — full stats, zero
  * delete vectors — is decided at push time).
  */
sealed trait ShardSinkMetaAgg extends Serializable
case object MetaCount extends ShardSinkMetaAgg
case object MetaMinDoc extends ShardSinkMetaAgg
case object MetaMaxDoc extends ShardSinkMetaAgg
case object MetaMinShard extends ShardSinkMetaAgg
case object MetaMaxShard extends ShardSinkMetaAgg
/** MIN/MAX over a PAYLOAD column, answered from the per-entry column
  * envelopes ([[SinkColStats]]) — eligible only when every kept entry
  * carries the column's stat with the column's own type tag and no
  * delete vectors exist (a vector may have killed exactly the extreme
  * row; an envelope min over non-null values IS SQL's null-ignoring
  * MIN). `dt` is the column's catalyst type: the pushed aggregate's
  * output schema must match it exactly.
  */
case class MetaMinCol(name: String, dt: org.apache.spark.sql.types.DataType)
  extends ShardSinkMetaAgg
case class MetaMaxCol(name: String, dt: org.apache.spark.sql.types.DataType)
  extends ShardSinkMetaAgg
/** COUNT over a nullable PAYLOAD column (round 16): live rows minus the
  * recorded per-file null counts — eligible only when every kept entry
  * carries the column's null count and no delete vectors exist (a
  * vector shrinks `rows` but not the write-time `nc`, so the
  * subtraction would drift; the gate keeps it exact).
  */
case class MetaCountCol(name: String) extends ShardSinkMetaAgg

/** The manifest-aggregate scan: one partition, every value resolved at
  * plan time on the driver from the (possibly version-pinned) manifest —
  * COUNTs from live-row bookkeeping, MIN/MAX from per-file stat ranges.
  * Ungrouped: one row (empty table: COUNT 0, MIN/MAX null). Grouped by
  * shard (builder proved every kept entry shard-pure): one row per shard
  * with live rows, the per-group values summed/min'd/max'd over that
  * shard's entries — a shard whose rows all died emits no group row.
  */
class ShardSinkCountScan(
    path: String, asOf: Option[Long], specs: Seq[ShardSinkMetaAgg],
    pruneShards: Option[Set[Int]] = None,
    pruneDocs: Option[(Long, Long)] = None,
    prunePoints: Option[Set[Long]] = None,
    groupByShard: Boolean = false)
  extends Scan with Batch {
  import org.apache.spark.sql.types.{IntegerType, LongType}
  override def readSchema(): StructType = {
    // contract: group-by columns first, then one column per aggregate
    val base =
      if (groupByShard) new StructType().add("shard", IntegerType, nullable = false)
      else new StructType()
    specs.zipWithIndex.foldLeft(base) { case (st, (sp, i)) =>
      sp match {
        case MetaCount => st.add(s"count_$i", LongType, nullable = false)
        case MetaMinDoc | MetaMaxDoc =>
          st.add(s"agg_$i", LongType, nullable = !groupByShard)
        case MetaMinShard | MetaMaxShard =>
          st.add(s"agg_$i", IntegerType, nullable = !groupByShard)
        case MetaMinCol(_, dt) => st.add(s"agg_$i", dt, nullable = !groupByShard)
        case MetaMaxCol(_, dt) => st.add(s"agg_$i", dt, nullable = !groupByShard)
        case MetaCountCol(_) => st.add(s"count_$i", LongType, nullable = false)
      }
    }
  }
  override def description(): String =
    s"ShardSinkCountScan[$path, manifest-only count/minmax" +
      (if (groupByShard) ", groupBy=shard" else "") +
      asOf.map(v => s", versionAsOf=$v").getOrElse("") +
      pruneShards.map(s => s", pruneShards=${s.toSeq.sorted.mkString("{", ",", "}")}")
        .getOrElse("") +
      pruneDocs.map { case (lo, hi) => s", pruneDocs=[$lo,$hi]" }.getOrElse("") + "]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // the SAME validation the row scan applies: out-of-range fails
    // loudly, and an expired snapshot's count is an error even though
    // the manifest alone could "answer" it — count and collect must
    // agree on validity (spec-pinned). Prune args arrive only from the
    // file-exact filter-consumption path, where the builder proved every
    // kept entry is ALL-match — summing their live rows IS the filtered
    // count.
    val entries =
      ShardSink.entriesAsOfPruned(path, asOf, pruneShards, pruneDocs, prunePoints)
    asOf.foreach(v => ShardSink.requireSnapshotLive(path, v, entries))
    // a clone whose source was vacuumed must not answer a stale
    // manifest-only count — same count/collect validity agreement
    ShardSink.requireForeignLive(path, entries)
    // the pushed payload MIN/MAX fold: per entry, the envelope's bound
    // for the column (push-time gating proved every entry carries it);
    // typed exactly as the output schema demands (strings → UTF8String).
    // Each entry's cs decodes ONCE per plan, shared across specs/groups.
    lazy val csDecoded: Map[String, Map[String, SinkColStats.ColStat]] =
      entries.map(e => e.file -> SinkColStats.decode(e.cs)).toMap
    def colBound(es: Seq[SinkEntry], n: String,
        dt: org.apache.spark.sql.types.DataType, isMin: Boolean): Any = {
      if (es.isEmpty) return null
      val t = SinkColStats.tagOf(dt).get
      // boundless (all-null) entries contribute no values — exactly
      // SQL's null-ignoring MIN/MAX; every entry boundless → NULL
      val raws = es.flatMap(e => {
        val st = csDecoded(e.file)(n)
        Option(if (isMin) st.lo else st.hi)
      })
      if (raws.isEmpty) return null
      val raw = if (isMin) raws.min(SinkColStats.orderFor(t))
        else raws.max(SinkColStats.orderFor(t))
      dt match {
        case org.apache.spark.sql.types.IntegerType => raw.toInt
        case org.apache.spark.sql.types.LongType => raw.toLong
        case org.apache.spark.sql.types.DoubleType => raw.toDouble
        case _ => org.apache.spark.unsafe.types.UTF8String.fromString(raw)
      }
    }
    def aggsOf(es: Seq[SinkEntry]): Seq[Any] = specs.map {
      case MetaCount => es.map(_.rows).sum: Any
      case MetaMinDoc => if (es.isEmpty) null else es.map(_.docMin).min
      case MetaMaxDoc => if (es.isEmpty) null else es.map(_.docMax).max
      case MetaMinShard => if (es.isEmpty) null else es.map(_.shardMin).min
      case MetaMaxShard => if (es.isEmpty) null else es.map(_.shardMax).max
      case MetaMinCol(n, dt) => colBound(es, n, dt, isMin = true)
      case MetaMaxCol(n, dt) => colBound(es, n, dt, isMin = false)
      // push-time gating proved: no delete vectors (rows == written) and
      // every entry carries the column's null count — COUNT(col) is the
      // live rows minus the recorded nulls, zero data IO
      case MetaCountCol(n) =>
        es.map(e => e.rows - csDecoded(e.file)(n).nc.get).sum: Any
    }
    val rows: Array[Array[Any]] =
      if (groupByShard)
        entries.groupBy(_.shardMin).toSeq.sortBy(_._1)
          .filter { case (_, es) => es.map(_.rows).sum > 0L } // no rows, no group
          .map { case (s, es) => ((s: Any) +: aggsOf(es)).toArray }
          .toArray
      else Array(aggsOf(entries).toArray)
    Array(ShardSinkCountPartition(rows))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val rows = partition.asInstanceOf[ShardSinkCountPartition].rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = {
          val vs = rows(i)
          val row = new GenericInternalRow(vs.length)
          vs.zipWithIndex.foreach { case (v, j) => row.update(j, v) }
          row
        }
        override def close(): Unit = ()
      }
    }
}

case class ShardSinkCountPartition(rows: Array[Array[Any]]) extends InputPartition

/** Hadoop-FileSystem IO layer: every read/write/rename/delete the sink
  * performs, resolved per-path so `file:`, `hdfs:` and compatible schemes
  * all work; executors build their own Configuration (classpath
  * core-site), the standard connector pattern.
  */
private[sources] object SinkFs {
  import org.apache.hadoop.fs.{FileSystem, Path}

  // ONE shared Configuration: each `new Configuration()` re-parses the
  // default XML resources on first property access (~ms), and fsOf runs
  // on every manifest/header/hint touch — thousands of times per
  // multi-commit lifecycle. Configuration is read-only here and
  // thread-safe for reads; FileSystem.get caches instances per scheme.
  private val hadoopConf = new org.apache.hadoop.conf.Configuration()

  def fsOf(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Local (`file:`/schemeless) fast path. Hadoop's LocalFileSystem is a
    * ChecksumFileSystem and, with no native library loaded (this
    * container), permissioned creates FORK a `chmod` per file and every
    * create/read pays a `.crc` sidecar write/verify — measured as a
    * visible slice of every multi-commit lifecycle. Local paths therefore
    * go straight through java.io/java.nio (same bytes, same rename/
    * visibility semantics — [[moveFresh]] already special-cases local);
    * any real scheme (hdfs://, s3a://) keeps the Hadoop FS API path.
    */
  private def localOf(p: Path): Option[java.io.File] = {
    val u = p.toUri
    if (u.getScheme == null || u.getScheme == "file") Some(new java.io.File(u.getPath))
    else None
  }

  def exists(p: Path): Boolean = localOf(p) match {
    case Some(f) => f.exists()
    case None => fsOf(p).exists(p)
  }

  def delete(p: Path): Unit = localOf(p) match {
    case Some(f) => f.delete(); ()
    case None => fsOf(p).delete(p, false); ()
  }

  def create(p: Path): java.io.BufferedWriter = localOf(p) match {
    case Some(f) =>
      val parent = f.getParentFile
      if (parent != null && !parent.isDirectory) { parent.mkdirs(); () }
      new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(f, false), "UTF-8"))
    case None =>
      val fs = fsOf(p)
      fs.mkdirs(p.getParent)
      new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(p, true), "UTF-8"))
  }

  /** Raw input stream; throws java.io.FileNotFoundException on a missing
    * file on BOTH paths (callers map it to their named errors).
    */
  def open(p: Path): java.io.InputStream = localOf(p) match {
    case Some(f) => new java.io.FileInputStream(f)
    case None => fsOf(p).open(p)
  }

  def readString(p: Path): String = {
    val in = open(p)
    try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
  }

  def readLines(p: Path): Seq[String] =
    readString(p).split("\n", -1).toSeq.filter(_.nonEmpty)

  def listFileNames(dir: Path): Seq[String] = localOf(dir) match {
    case Some(d) =>
      val fs = d.listFiles()
      if (fs == null) Seq.empty else fs.toSeq.filter(_.isFile).map(_.getName)
    case None =>
      val fs = fsOf(dir)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.filter(_.isFile).map(_.getPath.getName)
  }

  /** Recursive local delete — the one copy of the helper every
    * fixture-building query used to inline.
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Move src over dest: atomic rename where the FS provides it (HDFS,
    * POSIX); the delete-first REPLACE window degrades to "file absent",
    * never to partial content (the src is fully written before the move).
    * Used for DATA files, whose destination names are job-unique — the
    * manifest flip uses [[moveFresh]] so it never opens this window.
    */
  def moveOver(src: Path, dest: Path): Unit = (localOf(src), localOf(dest)) match {
    case (Some(s), Some(d)) =>
      java.nio.file.Files.move(s.toPath, d.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    case _ =>
      val fs = fsOf(dest)
      if (fs.exists(dest)) fs.delete(dest, false)
      require(fs.rename(src, dest), s"rename failed: $src -> $dest")
  }

  /** Move to a name that must NOT exist — the winner-election primitive
    * of the whole commit protocol: of N writers racing the same manifest
    * version, exactly ONE must land and the rest must fail loudly.
    * On HDFS-like stores a plain rename IS that primitive (rename fails
    * when the destination exists, atomically). POSIX rename REPLACES the
    * destination, so on local paths an exists-check + rename is a TOCTOU
    * hole (two racers can both "win", the second silently burying the
    * first commit — caught by the 4-way concurrent append spec); there
    * the election is a hard LINK to the destination, which the kernel
    * fails with EEXIST atomically, followed by deleting the source.
    */
  def moveFresh(src: Path, dest: Path): Unit = {
    val scheme = dest.toUri.getScheme
    if (scheme == null || scheme == "file") {
      val s = java.nio.file.Paths.get(src.toUri.getPath)
      val d = java.nio.file.Paths.get(dest.toUri.getPath)
      try {
        java.nio.file.Files.createLink(d, s)
        java.nio.file.Files.delete(s)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalArgumentException(
            s"rename to fresh name failed (concurrent writer?): $src -> $dest")
      }
    } else {
      val fs = fsOf(dest)
      require(!fs.exists(dest) && fs.rename(src, dest),
        s"rename to fresh name failed (concurrent writer?): $src -> $dest")
    }
  }
}

/** One committed file's manifest entry: name, LIVE rows, (when known) the
  * shard range its rows span — written by every commit path since round
  * 13 and absent from older manifests (parse degrades to stats-unknown,
  * which every consumer must treat as "may contain anything") — and
  * (merge-on-read deletes) the file's current delete vector: a tiny
  * sidecar file of 0-based row positions every reader must skip. `rows`
  * counts LIVE rows (physical minus deleted), so statistics, history
  * deltas and admission decisions all see the table a reader sees.
  */
case class SinkEntry(
    file: String, rows: Long, shardMin: Int = -1, shardMax: Int = -1,
    dv: String = "", docMin: Long = -1L, docMax: Long = -1L,
    bf: String = "", cs: String = "") {
  def hasStats: Boolean = shardMin >= 0
  def hasDocStats: Boolean = docMax >= 0L
  def hasDeletes: Boolean = dv.nonEmpty
  /** Conservative: unknown stats always intersect. (A delete vector can
    * only narrow the true range — the recorded superset stays sound for
    * may-contain pruning.)
    */
  def mayContainShard(shards: Set[Int]): Boolean =
    !hasStats || shards.exists(v => v >= shardMin && v <= shardMax)
  /** Same conservatism for the doc_id range stats ("d0"/"d1"): unknown
    * always intersects; a recorded range is a sound superset under
    * merge-on-read vectors.
    */
  def mayContainDocRange(lo: Long, hi: Long): Boolean =
    !hasDocStats || (docMin <= hi && docMax >= lo)
  /** Point-lookup skipping via the per-file doc_id bloom ("bf"): an
    * absent bloom always reads; a present one skips the file only when
    * EVERY sought id is definitely absent. Sound under delete vectors
    * (they only remove rows) — false positives cost a read, a false
    * skip is impossible.
    */
  def mayContainDocPoints(points: Set[Long]): Boolean =
    bf.isEmpty || points.exists(v => DocBloom.mayContain(bf, v))
  /** Per-COLUMN envelope skipping ("cs", round 15 — see [[SinkColStats]]):
    * a file whose recorded min/max for some predicate column cannot
    * intersect the pushed predicate is skipped. Absent stats (whole
    * entry or per column) always read; under delete vectors the recorded
    * envelope is a live-superset — sound for may-contain, like the
    * shard range.
    */
  def mayMatchCols(preds: Seq[SinkColStats.ColPred]): Boolean =
    SinkColStats.mayMatch(cs, preds)
}

object ShardSink {
  import org.apache.hadoop.fs.Path

  /** VERSIONED manifests (round 13): the committed view is the
    * HIGHEST-numbered `_manifest.v<N>.json`. Every flip writes a body to
    * a temp name and renames it to a FRESH version name — plain atomic
    * rename, no delete, so the old delete-then-rename replace window
    * (whose crash degraded the WHOLE table to invisible) no longer
    * exists: a crash mid-flip leaves the previous version intact and the
    * operation simply never happened. Version-hint discovery is how real
    * table formats (Iceberg et al.) solve the same problem. Superseded
    * versions are RETAINED as the table's commit log (time travel, the
    * version-tail stream, CDF and history all read them); only a legacy
    * unversioned `_manifest.json` (pre-round-13 dirs, still read when no
    * versioned file exists) is cleaned up after a flip.
    */
  private val ManifestV = """_manifest\.v(\d+)\.json""".r

  /** Commit clock: every manifest version records its commit timestamp
    * (epoch millis, `"ts"` key) for `TIMESTAMP AS OF` resolution.
    * Injectable for deterministic tests and oracle-checked queries — the
    * same frozen-literal discipline F-6 uses for `current_timestamp`
    * (SURVEY §7.5): wall-clock values never reach an oracle compare.
    */
  @volatile private var clockOverride: Option[() => Long] = None
  def setCommitClock(c: Option[() => Long]): Unit = clockOverride = c
  private def commitTimeMillis(): Long =
    clockOverride.map(_()).getOrElse(System.currentTimeMillis())

  /** VERSION-HINT discovery (round 15, Iceberg's `version-hint.text`):
    * every flip also overwrites `_manifest.hint` with its version —
    * best-effort, NOT part of the commit (the flip's atomic rename is) —
    * and discovery reads the hint and probes FORWARD until the first
    * missing version instead of listing the directory. The hint is only
    * ever a LOWER BOUND: it is written after a successful flip (never
    * for a lost race), racing writers can overwrite each other with the
    * smaller value (the probe recovers), a crash between flip and hint
    * leaves it one behind (ditto), and a missing or torn hint falls back
    * to the full listing. Soundness never depends on the hint; only
    * cost does. WHY: `currentManifestVersion` runs at every query plan
    * and every commit, and the listing enumerates EVERY file in the
    * table directory — on the million-file table the rest of the
    * manifest layer is built for, that is O(table) driver IO per query
    * for a single number. With the hint it is one small read + O(commits
    * since the hint) existence probes.
    */
  /** The ONE resolution of the three time-travel read options —
    * `versionAsOf` / `timestampAsOf` / `tag`, at most one — shared by the
    * path-based source (schema + table pinning) and the scan builder, so
    * the spellings and errors can never diverge between the surfaces.
    */
  private[sources] def resolveAsOfOpts(
      path: String, vOpt: Option[String], tsOpt: Option[String],
      tagOpt: Option[String]): Option[Long] = {
    require(Seq(vOpt, tsOpt, tagOpt).count(_.isDefined) <= 1,
      "specify at most one of versionAsOf, timestampAsOf, tag")
    vOpt.map(_.toLong)
      .orElse(tsOpt.map(s => versionAtTimestamp(path, parseTsMillis(s))))
      .orElse(tagOpt.map(t => resolveTag(path, t)))
  }

  def currentManifestVersion(dir: String): Long = {
    val hinted = try {
      val hp = new Path(dir, "_manifest.hint")
      if (!SinkFs.exists(hp)) -1L
      else {
        val v = SinkFs.readString(hp).trim.toLong
        if (v > 0L && SinkFs.exists(new Path(dir, s"_manifest.v$v.json"))) v else -1L
      }
    } catch { case _: Exception => -1L }
    if (hinted > 0L) {
      var cur = hinted
      while (SinkFs.exists(new Path(dir, s"_manifest.v${cur + 1}.json"))) cur += 1
      cur
    } else {
      manifestListCount.incrementAndGet()
      SinkFs.listFileNames(new Path(dir))
        .collect { case ManifestV(n) => n.toLong }
        .foldLeft(0L)(math.max)
    }
  }

  /** Observability: full-listing fallbacks taken by [[currentManifestVersion]]
    * — the spec pins that hinted discovery does NOT list the directory.
    */
  private[sources] val manifestListCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Best-effort, post-flip: a plain overwrite-create (no tmp/rename
    * dance — the hint is advisory, a torn read falls back to listing).
    */
  private def writeHint(dir: String, version: Long): Unit =
    try {
      val w = SinkFs.create(new Path(dir, "_manifest.hint"))
      try w.write(version.toString) finally w.close()
    } catch { case _: Exception => () } // the commit already happened

  def manifestPath(dir: String): Path = {
    val v = currentManifestVersion(dir)
    if (v > 0L) new Path(dir, s"_manifest.v$v.json")
    else new Path(dir, "_manifest.json") // legacy fallback (may not exist)
  }

  /** Driver-checked write→commit→read round trip: the generated corpus
    * [0, 20000) flows through the V2 writer (4 task files + manifest
    * commit), is read back through the manifest-trusting scan, and rolls
    * up per shard — the DuckDB oracle re-derives the same totals from
    * `range()`, so the whole write path (task files, commit renames,
    * manifest, read-back parse) sits under the hash gate. The landing dir
    * is wiped first: each run is its own complete job.
    */
  def writeRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    // driver-side temp landing dir for the checked query (local by
    // construction; the sink itself is FS-agnostic via SinkFs)
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_shardsink_$sfx")
    SinkFs.deleteRecursively(dir)
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "20000").option("numPartitions", "4").load()
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath)
      .mode(org.apache.spark.sql.SaveMode.Append)
      .save()
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(substring(col("body"), 1, 1) === "a", 1L).otherwise(0L)).as("n_body_a"))
      .orderBy("shard")
  }

  /** The tenth streaming lifecycle, and the connector matrix's last cell
    * (batch read / stream read / batch write / STREAM write): the docgen
    * corpus drains as a 4-micro-batch stream INTO the shard sink (one
    * epoch commit per batch, manifest accumulating), is read back through
    * the manifest-trusting batch scan, and must match the direct batch
    * read row-for-row — n_diff = 0 under the hash gate, totals re-derived
    * by DuckDB from range().
    */
  def streamWriteParity(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val nDocs = 20000L
    val dir = java.nio.file.Files.createTempDirectory("graft_shardsink_stream").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shardsink_ckpt").toFile
    val q = spark.readStream.format("graft.sources.DocGenSource")
      .option("numDocs", nDocs.toString)
      .option("numPartitions", "4")
      .option("streamBatchSize", (nDocs / 4 + 1).toString)
      .load()
      .writeStream.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath)
      .option("checkpointLocation", ckpt.getPath)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
    val batch = spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", nDocs.toString).option("numPartitions", "4").load()
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed
      .agg(countDistinct(col("shard")), count(lit(1)), expr("bit_xor(doc_id)"))
      .collect().head
    import spark.implicits._
    Seq((totals.getLong(0), totals.getLong(1), totals.getLong(2), nDiff))
      .toDF("n_shards", "n_docs", "xor_ids", "n_diff")
  }

  val streamWriteParitySql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 20000) t(doc_id))
      |SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM g""".stripMargin

  val writeRoundtripSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS body
      |  FROM range(0, 20000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN substring(body, 1, 1) = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_body_a
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked SQL DELETE through the connector (round 13 — the
    * row-level-operations rung of the V2 surface): the corpus lands via
    * `writeTo` on a [[ShardSinkCatalog]] table, then
    * `DELETE FROM … WHERE shard < 4 OR doc_id >= 18000` runs through
    * [[ShardSinkTable.deleteWhere]] — the shard leg drops shard-whole
    * files as pure metadata (the clustered write layout earning its keep),
    * the doc_id leg forces partial-file rewrites under fresh names — and
    * the read-back rollup must match DuckDB re-deriving the surviving
    * rows from `range()`. The whole DML path (predicate compilation,
    * metadata drop, rewrite, manifest flip) sits under the hash gate.
    */
  def deleteRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcat_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_sink", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root.getPath)
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "20000").option("numPartitions", "4").load()
      .writeTo("graft_sink.docs_del").append()
    s.sql("DELETE FROM graft_sink.docs_del WHERE shard < 4 OR doc_id >= 18000")
    s.read.table("graft_sink.docs_del")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(substring(col("body"), 1, 1) === "a", 1L).otherwise(0L)).as("n_body_a"))
      .orderBy("shard")
  }

  val deleteRoundtripSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS body
      |  FROM range(0, 20000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN substring(body, 1, 1) = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_body_a
      |FROM g WHERE NOT (shard < 4 OR doc_id >= 18000)
      |GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked MERGE-ON-READ DELETE (round 13 —
    * [[ShardSink.morDeleteImpl]]): the same corpus lands via a catalog
    * configured `delete.mode=merge-on-read`, then TWO successive DELETEs
    * run — the first marks a tail window, the second (an OR of a doc_id
    * window and a whole shard) lands on files that already carry vectors,
    * exercising the union path. No data file is written or removed: each
    * DELETE is one manifest flip plus tiny position sidecars, and the
    * read-back rollup (vector subtraction at scan time) must match DuckDB
    * re-deriving the survivors from `range()`. The MOR-specific layout
    * invariants (data files byte-identical, vectors present, snapshots
    * before the delete still readable) are pinned in ShardSinkSpec.
    */
  def morDeleteRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mor:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmor_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mor", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mor.delete.mode", "merge-on-read")
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "20000").option("numPartitions", "4").load()
      .writeTo("graft_mor.docs_mor").append()
    s.sql("DELETE FROM graft_mor.docs_mor WHERE doc_id >= 15000")
    s.sql("DELETE FROM graft_mor.docs_mor WHERE doc_id < 2000 OR shard = 11")
    s.read.table("graft_mor.docs_mor")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(substring(col("body"), 1, 1) === "a", 1L).otherwise(0L)).as("n_body_a"))
      .orderBy("shard")
  }

  val morDeleteRoundtripSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS body
      |  FROM range(0, 20000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN substring(body, 1, 1) = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_body_a
      |FROM g WHERE NOT (doc_id >= 15000) AND NOT (doc_id < 2000 OR shard = 11)
      |GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked SQL UPDATE + MERGE INTO through the group-based
    * row-level operation (round 13): the corpus lands via the catalog,
    * an UPDATE upper-cases every shard ≥ 12 body, then a three-clause
    * MERGE against a crawl delta deletes matched ids < 19000, rewrites
    * the remaining matched bodies (suffix `!`), and inserts the
    * not-matched tail. Every rewrite is copy-on-write through
    * [[ShardSinkReplaceDataWrite]] (replacement files swap in under one
    * manifest flip) and the final per-shard rollup — including how many
    * bodies are upper-cased and how many carry the merge suffix — must
    * match DuckDB re-deriving the whole edit history from `range()`.
    */
  def mergeRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("merge:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcat_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_sink", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root.getPath)
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "20000").option("numPartitions", "4").load()
      .writeTo("graft_sink.docs_m").append()
    s.sql("UPDATE graft_sink.docs_m SET body = upper(body) WHERE shard >= 12")
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "22000").option("numPartitions", "4").load()
      .where(col("doc_id") >= 18000L)
      .createOrReplaceTempView("graft_merge_src")
    s.sql(
      """MERGE INTO graft_sink.docs_m t USING graft_merge_src s ON t.doc_id = s.doc_id
        |WHEN MATCHED AND s.doc_id < 19000 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET body = concat(s.body, '!')
        |WHEN NOT MATCHED THEN INSERT (doc_id, shard, body) VALUES (s.doc_id, s.shard, s.body)
        |""".stripMargin)
    s.read.table("graft_sink.docs_m")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(col("body") =!= lower(col("body")), 1L).otherwise(0L)).as("n_upper"),
        sum(when(col("body").endsWith("!"), 1L).otherwise(0L)).as("n_merged"))
      .orderBy("shard")
  }

  val mergeRoundtripSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         CASE WHEN doc_id >= 20000 THEN md5(CAST(doc_id AS VARCHAR))
      |              WHEN doc_id >= 19000 THEN md5(CAST(doc_id AS VARCHAR)) || '!'
      |              WHEN doc_id % 16 >= 12 THEN upper(md5(CAST(doc_id AS VARCHAR)))
      |              ELSE md5(CAST(doc_id AS VARCHAR)) END AS body
      |  FROM range(0, 22000) t(doc_id)
      |  WHERE doc_id < 18000 OR doc_id >= 19000)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN body <> lower(body) THEN 1 ELSE 0 END) AS BIGINT) AS n_upper,
      |       CAST(SUM(CASE WHEN body LIKE '%!' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked DELTA-BASED UPDATE + MERGE (round 13 —
    * [[ShardSinkDeltaOperation]], `rlo.mode=merge-on-read`): the SAME
    * edit script as [[mergeRoundtrip]] — upper-case UPDATE, three-clause
    * MERGE with delete/update/insert legs — but every edit lands as
    * positional delete vectors plus appended `part-u` files; no original
    * file is rewritten (pinned in ShardSinkSpec). The rollup must equal
    * the copy-on-write run's oracle exactly: strategy changes the
    * physical layout, never the answer.
    */
  def mergeMorRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("mergemor:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkdmor_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_dmor", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dmor.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_dmor.rlo.mode", "merge-on-read")
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "20000").option("numPartitions", "4").load()
      .writeTo("graft_dmor.docs_dm").append()
    s.sql("UPDATE graft_dmor.docs_dm SET body = upper(body) WHERE shard >= 12")
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "22000").option("numPartitions", "4").load()
      .where(col("doc_id") >= 18000L)
      .createOrReplaceTempView("graft_dmerge_src")
    s.sql(
      """MERGE INTO graft_dmor.docs_dm t USING graft_dmerge_src s ON t.doc_id = s.doc_id
        |WHEN MATCHED AND s.doc_id < 19000 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET body = concat(s.body, '!')
        |WHEN NOT MATCHED THEN INSERT (doc_id, shard, body) VALUES (s.doc_id, s.shard, s.body)
        |""".stripMargin)
    s.read.table("graft_dmor.docs_dm")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(col("body") =!= lower(col("body")), 1L).otherwise(0L)).as("n_upper"),
        sum(when(col("body").endsWith("!"), 1L).otherwise(0L)).as("n_merged"))
      .orderBy("shard")
  }

  /** Same derivation as [[mergeRoundtripSql]]: the strategy (delta vs
    * group rewrite) must be answer-invariant.
    */
  val mergeMorRoundtripSql: String = mergeRoundtripSql

  /** Driver-checked FULL-SYNC MERGE (round 14): all FOUR clause kinds —
    * matched-delete, matched-update, not-matched-insert, and the
    * round-13-missing `WHEN NOT MATCHED BY SOURCE` delete+update pair
    * (the standard "make target mirror source" shape). Target rows the
    * source no longer carries are deleted below 2000 and upper-case
    * flagged below 4000; the oracle re-derives the complete edit script
    * from `range()`. Runs through the strategy given by `rlo` so the
    * copy-on-write and merge-on-read twins share one derivation.
    */
  private def mergeFullSync(
      spark: org.apache.spark.sql.SparkSession, rlo: String, tag: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest((tag + ":fullsync").getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkfs_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    val cat = s"graft_fs_$tag"
    s.conf.set(s"spark.sql.catalog.$cat", classOf[ShardSinkCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.root", root.getPath)
    s.conf.set(s"spark.sql.catalog.$cat.rlo.mode", rlo)
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "20000").option("numPartitions", "4").load()
      .writeTo(s"$cat.docs_fs").append()
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "25000").option("numPartitions", "4").load()
      .where(col("doc_id") >= 10000L)
      .createOrReplaceTempView(s"graft_fs_src_$tag")
    s.sql(
      s"""MERGE INTO $cat.docs_fs t USING graft_fs_src_$tag s ON t.doc_id = s.doc_id
         |WHEN MATCHED AND s.doc_id < 12000 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET body = concat(s.body, '!')
         |WHEN NOT MATCHED THEN INSERT (doc_id, shard, body) VALUES (s.doc_id, s.shard, s.body)
         |WHEN NOT MATCHED BY SOURCE AND t.doc_id < 2000 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE AND t.doc_id < 4000 THEN UPDATE SET body = upper(t.body)
         |""".stripMargin)
    s.read.table(s"$cat.docs_fs")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(col("body") =!= lower(col("body")), 1L).otherwise(0L)).as("n_upper"),
        sum(when(col("body").endsWith("!"), 1L).otherwise(0L)).as("n_merged"))
      .orderBy("shard")
  }

  def mergeFullSyncCow(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    mergeFullSync(spark, "copy-on-write", "cow")

  def mergeFullSyncMor(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame =
    mergeFullSync(spark, "merge-on-read", "mor")

  val mergeFullSyncSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         CASE WHEN doc_id >= 12000 AND doc_id < 20000
      |                THEN md5(CAST(doc_id AS VARCHAR)) || '!'
      |              WHEN doc_id < 4000 THEN upper(md5(CAST(doc_id AS VARCHAR)))
      |              ELSE md5(CAST(doc_id AS VARCHAR)) END AS body
      |  FROM range(0, 25000) t(doc_id)
      |  WHERE doc_id >= 2000 AND (doc_id < 10000 OR doc_id >= 12000))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN body <> lower(body) THEN 1 ELSE 0 END) AS BIGINT) AS n_upper,
      |       CAST(SUM(CASE WHEN body LIKE '%!' THEN 1 ELSE 0 END) AS BIGINT) AS n_merged
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked VERSION-TAIL streaming read (round 13 — the last
    * connector matrix cell: the sink as a streaming SOURCE): three Append
    * jobs land three manifest versions, then a micro-batch stream tails
    * the table one version per trigger ([[ShardSinkTailStream]] — each
    * batch is the file delta between consecutive retained manifests) into
    * a complete-mode rollup that must equal the batch read row-for-row;
    * the oracle re-derives the totals from `range()` and pins `n_diff=0`
    * and the version count, so the retention, version-diff, and replayed
    * offsets all sit under the hash gate.
    */
  def tailParity(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("tail:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinktail_$sfx")
    SinkFs.deleteRecursively(dir)
    val sparkTuned = graft.streaming.StreamTune.session(spark)
    def append(lo: Long, hi: Long): Unit =
      sparkTuned.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 500L); append(500L, 1200L); append(1200L, 2000L)
    val nVersions = currentManifestVersion(dir.getPath)
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("shard")).agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"))
    val sink = s"graft_sinktail_${streamSinkCounter.incrementAndGet()}"
    val q = rollup(
      sparkTuned.readStream.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath).load())
      .writeStream.outputMode("complete").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = sparkTuned.table(sink)
    val batch = rollup(
      sparkTuned.read.format("graft.sources.ShardSinkSource").option("path", dir.getPath).load())
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed.agg(count(lit(1)), sum(col("n_docs"))).collect().head
    import spark.implicits._
    Seq((totals.getLong(0), totals.getLong(1), nDiff, nVersions))
      .toDF("n_shards", "n_docs", "n_diff", "n_versions")
  }

  private val streamSinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Driver-checked TIME TRAVEL (round 13): three Appends land manifest
    * versions 1–3; `VERSION AS OF 2` (SQL, resolved via
    * [[ShardSinkCatalog.loadTable(ident, version)]]) must read EXACTLY
    * the snapshot after the second commit — rows appended later are
    * invisible, rows present then are all there. The oracle re-derives
    * the v2 window from `range()`; a spec additionally pins the
    * `versionAsOf` read-option spelling and the out-of-range failure.
    */
  def timeTravel(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("travel:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcat_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_sink", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root.getPath)
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_sink.docs_tt").append()
    append(0L, 500L); append(500L, 1200L); append(1200L, 2000L)
    s.sql(
      """SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       bit_xor(doc_id) AS xor_ids
        |FROM graft_sink.docs_tt VERSION AS OF 2
        |GROUP BY shard ORDER BY shard""".stripMargin)
  }

  val timeTravelSql: String =
    """SELECT CAST(doc_id % 16 AS INT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids
      |FROM range(0, 1200) t(doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** Driver-checked `TIMESTAMP AS OF` (round 14): three Appends commit
    * under an INJECTED deterministic clock (one minute apart — the
    * frozen-literal discipline, so the oracle never sees wall clock),
    * then SQL `TIMESTAMP AS OF timestamp_millis(…)` pointing between the
    * second and third commits must resolve to version 2 exactly
    * ([[versionAtTimestamp]]: newest commit at-or-before the instant).
    * `timestamp_millis` keeps the resolution timezone-free; the
    * read-option spelling, the before-first-commit loud failure and the
    * past-last-commit latest-read are spec-pinned.
    */
  def timeTravelTs(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("travelts:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinktts_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_tts", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tts.root", root.getPath)
    val base = 1700000000000L
    val tick = new java.util.concurrent.atomic.AtomicLong(base)
    setCommitClock(Some(() => tick.addAndGet(60000L)))
    try {
      def append(lo: Long, hi: Long): Unit =
        s.read.format("graft.sources.DocGenSource")
          .option("numDocs", "2000").option("numPartitions", "2").load()
          .where(col("doc_id") >= lo && col("doc_id") < hi)
          .writeTo("graft_tts.docs_tts").append()
      append(0L, 500L); append(500L, 1200L); append(1200L, 2000L)
      // commits at base+60s/+120s/+180s; +150s lands between v2 and v3
      s.sql(
        s"""SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       bit_xor(doc_id) AS xor_ids
           |FROM graft_tts.docs_tts TIMESTAMP AS OF timestamp_millis(${base + 150000L})
           |GROUP BY shard ORDER BY shard""".stripMargin)
    } finally setCommitClock(None)
  }

  val timeTravelTsSql: String = timeTravelSql

  val tailParitySql: String =
    """WITH g AS (SELECT CAST(doc_id % 16 AS INT) AS shard FROM range(0, 2000) t(doc_id))
      |SELECT CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       CAST(0 AS BIGINT) AS n_diff,
      |       CAST(3 AS BIGINT) AS n_versions
      |FROM g""".stripMargin

  /** Driver-checked CHANGE DATA FEED (round 13 — the Delta-CDF analogue
    * [[changePartitions]] makes exact): two Appends land insert commits,
    * two merge-on-read DELETEs land delete commits (the second also
    * exercising the vector-diff and possible fully-dead-entry paths),
    * then `option("readChangeFeed","true")` reads the full change log
    * and rolls it up by (commit version, change type). Every cell —
    * including the per-commit xor of changed doc_ids — is re-derived by
    * DuckDB from the same windows, so which ROWS changed in which COMMIT
    * sits under the hash gate, not just final state.
    */
  def changeFeedReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("cdf:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcdf_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_cdf", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cdf.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_cdf.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_cdf.docs_cdf").append()
    append(0L, 800L); append(800L, 2000L)
    s.sql("DELETE FROM graft_cdf.docs_cdf WHERE doc_id >= 1500")
    s.sql("DELETE FROM graft_cdf.docs_cdf WHERE shard = 3")
    s.read.format("graft.sources.ShardSinkSource")
      .option("path", new java.io.File(root, "docs_cdf").getPath)
      .option("readChangeFeed", "true").load()
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(doc_id)").as("xor_ids"))
      .orderBy("_commit_version", "_change_type")
  }

  val changeFeedReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 2000) t(doc_id)),
      |ch AS (
      |  SELECT 1 AS v, 'insert' AS ct, doc_id FROM g WHERE doc_id < 800
      |  UNION ALL SELECT 2, 'insert', doc_id FROM g WHERE doc_id >= 800
      |  UNION ALL SELECT 3, 'delete', doc_id FROM g WHERE doc_id >= 1500
      |  UNION ALL SELECT 4, 'delete', doc_id FROM g WHERE shard = 3 AND doc_id < 1500)
      |SELECT CAST(v AS BIGINT) AS _commit_version, ct AS _change_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows, bit_xor(doc_id) AS xor_ids
      |FROM ch GROUP BY 1, 2 ORDER BY _commit_version, _change_type""".stripMargin

  /** Driver-checked STREAMING CDC tail (round 13): the same 4-commit
    * history, tailed via `readStream` + `readChangeFeed` one commit per
    * trigger over the durable version offsets; the drained change rows
    * must equal the batch change feed row-for-row (n_diff = 0), with
    * totals re-derived by DuckDB. This is the CDC consumption loop a
    * downstream index/aggregate maintains itself from — inserts AND
    * merge-on-read deletes, exactly once per commit.
    */
  def cdcStreamParity(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("cdcs:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcdcs_$sfx")
    SinkFs.deleteRecursively(root)
    val s = graft.streaming.StreamTune.session(spark)
    s.conf.set("spark.sql.catalog.graft_cdc", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cdc.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_cdc.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_cdc.docs_cdc").append()
    append(0L, 800L); append(800L, 2000L)
    s.sql("DELETE FROM graft_cdc.docs_cdc WHERE doc_id >= 1500")
    s.sql("DELETE FROM graft_cdc.docs_cdc WHERE shard = 3")
    val dir = new java.io.File(root, "docs_cdc").getPath
    val sink = s"graft_cdc_${streamSinkCounter.incrementAndGet()}"
    val q = s.readStream.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("readChangeFeed", "true").load()
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = s.table(sink)
    val batch = s.read.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("readChangeFeed", "true").load()
    val nDiff = streamed.exceptAll(batch).union(batch.exceptAll(streamed)).count()
    val totals = streamed.agg(
      count(lit(1)),
      sum(when(col("_change_type") === "insert", 1L).otherwise(0L)),
      sum(when(col("_change_type") === "delete", 1L).otherwise(0L)),
      countDistinct(col("_commit_version"))).collect().head
    import spark.implicits._
    Seq((totals.getLong(0), totals.getLong(1), totals.getLong(2), totals.getLong(3), nDiff))
      .toDF("n_changes", "n_inserts", "n_deletes", "n_commits", "n_diff")
  }

  val cdcStreamParitySql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 2000) t(doc_id)),
      |ch AS (
      |  SELECT 'insert' AS ct FROM g
      |  UNION ALL SELECT 'delete' FROM g WHERE doc_id >= 1500
      |  UNION ALL SELECT 'delete' FROM g WHERE shard = 3 AND doc_id < 1500)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_changes,
      |       CAST(SUM(CASE WHEN ct = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserts,
      |       CAST(SUM(CASE WHEN ct = 'delete' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
      |       CAST(4 AS BIGINT) AS n_commits,
      |       CAST(0 AS BIGINT) AS n_diff
      |FROM ch""".stripMargin

  /** Driver-checked CDF UPDATE PRE/POST-IMAGES (round 14 — the Delta CDF
    * update shape the round-13 feed collapsed to delete+insert): a
    * merge-on-read UPDATE commits its change record with exact
    * `update_preimage`/`update_postimage` pairs (recorded by the delta
    * writer's native update path), followed by a MOR DELETE that stays
    * derivation-only. The rollup pins, per (commit, change type), the row
    * count, the doc_id xor AND how many rows carry the post-update body —
    * so preimages carrying old bodies and postimages new ones sits under
    * the hash gate, not just the counts.
    */
  def changeFeedUpdate(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("cdfu:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcdfu_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_cdfu", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cdfu.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_cdfu.rlo.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_cdfu.delete.mode", "merge-on-read")
    s.conf.set("spark.sql.catalog.graft_cdfu.cdf.enabled", "true")
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2000").option("numPartitions", "2").load()
      .writeTo("graft_cdfu.docs_cu").append() // v1: 2000 inserts
    s.sql("UPDATE graft_cdfu.docs_cu SET body = upper(body) WHERE doc_id < 300") // v2
    s.sql("DELETE FROM graft_cdfu.docs_cu WHERE doc_id >= 1800") // v3
    s.read.format("graft.sources.ShardSinkSource")
      .option("path", new java.io.File(root, "docs_cu").getPath)
      .option("readChangeFeed", "true").load()
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(col("body") =!= lower(col("body")), 1L).otherwise(0L)).as("n_upper"))
      .orderBy("_commit_version", "_change_type")
  }

  val changeFeedUpdateSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 2000) t(doc_id)),
      |ch AS (
      |  SELECT 1 AS v, 'insert' AS ct, doc_id, 0 AS up FROM g
      |  UNION ALL SELECT 2, 'update_preimage', doc_id, 0 FROM g WHERE doc_id < 300
      |  UNION ALL SELECT 2, 'update_postimage', doc_id, 1 FROM g WHERE doc_id < 300
      |  UNION ALL SELECT 3, 'delete', doc_id, 0 FROM g WHERE doc_id >= 1800)
      |SELECT CAST(v AS BIGINT) AS _commit_version, ct AS _change_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows, bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(up) AS BIGINT) AS n_upper
      |FROM ch GROUP BY 1, 2 ORDER BY _commit_version, _change_type""".stripMargin

  /** Driver-checked TAGS (round 14): Iceberg named refs — tag the
    * post-ingest snapshot (`SET TBLPROPERTIES ('graft.tag.x'='v')`),
    * DELETE, then compact with ZERO retained versions: the tag must
    * hold the retention horizon so the tagged snapshot stays exactly
    * readable through `VERSION AS OF 'tag'` while the current rollup
    * reflects the delete — both rollups and the held horizon under one
    * hash gate.
    */
  def tagsReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("tags:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinktag_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_tag", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tag.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_tag.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_tag.docs_tag").append()
    append(0L, 800L) // v1
    s.sql("ALTER TABLE graft_tag.docs_tag SET TBLPROPERTIES ('graft.tag.ingest_v1' = '1')")
    append(800L, 2000L) // v2
    s.sql("DELETE FROM graft_tag.docs_tag WHERE doc_id >= 1500") // v3
    val dir = new java.io.File(root, "docs_tag").getPath
    compact(dir) // v4, retain 0 — but the tag holds the horizon at 1
    val tagged = s.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_tag, bit_xor(doc_id) AS xor_tag
        |FROM graft_tag.docs_tag VERSION AS OF 'ingest_v1'""".stripMargin)
    val cur = s.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_cur, bit_xor(doc_id) AS xor_cur
        |FROM graft_tag.docs_tag""".stripMargin)
    tagged.crossJoin(cur).withColumn("hz", lit(horizonOf(dir)))
  }

  val tagsReportSql: String =
    """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM range(0, 800)) AS n_tag,
      |       (SELECT bit_xor(doc_id) FROM range(0, 800) t(doc_id)) AS xor_tag,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM range(0, 1500)) AS n_cur,
      |       (SELECT bit_xor(doc_id) FROM range(0, 1500) t(doc_id)) AS xor_cur,
      |       CAST(1 AS BIGINT) AS hz""".stripMargin

  /** Driver-checked CDC REPLICA SYNC (round 14): the downstream loop the
    * change feed EXISTS for — tail table A's feed one commit per
    * trigger and maintain replica B with one MERGE per micro-batch
    * (Delta documents exactly this CDF-apply recipe): postimages and
    * inserts upsert, deletes delete, preimages drop. This is also WHY
    * update pre/post PAIRING matters: collapsed delete+insert of the
    * same doc in one batch would hit MERGE's multiple-source-rows error
    * — the paired feed applies cleanly. History: two appends, a
    * merge-on-read DELETE, a delta UPDATE; the final replica must equal
    * the source row-for-row (n_diff = 0, exceptAll both ways) with the
    * rollup re-derived by DuckDB.
    */
  def replicaSyncParity(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("rsync:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkrsync_$sfx")
    SinkFs.deleteRecursively(root)
    val s = graft.streaming.StreamTune.session(spark)
    Seq("graft_rsrc", "graft_rdst").foreach { cat =>
      s.conf.set(s"spark.sql.catalog.$cat", classOf[ShardSinkCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.root", root.getPath)
      s.conf.set(s"spark.sql.catalog.$cat.delete.mode", "merge-on-read")
      s.conf.set(s"spark.sql.catalog.$cat.rlo.mode", "merge-on-read")
      s.conf.set(s"spark.sql.catalog.$cat.cdf.enabled", "true")
    }
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_rsrc.docs_src").append()
    append(0L, 800L); append(800L, 2000L)                           // v1, v2
    s.sql("DELETE FROM graft_rsrc.docs_src WHERE doc_id >= 1500")    // v3
    s.sql("UPDATE graft_rsrc.docs_src SET body = upper(body) WHERE doc_id < 300") // v4
    val srcDir = new java.io.File(root, "docs_src").getPath
    val q = s.readStream.format("graft.sources.ShardSinkSource")
      .option("path", srcDir).option("readChangeFeed", "true").load()
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.createOrReplaceTempView("ch_sync")
        batch.sparkSession.sql(
          """MERGE INTO graft_rdst.docs_dst d
            |USING (SELECT doc_id, shard, body, _change_type FROM ch_sync
            |       WHERE _change_type != 'update_preimage') c
            |ON d.doc_id = c.doc_id
            |WHEN MATCHED AND c._change_type = 'delete' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET d.shard = c.shard, d.body = c.body
            |WHEN NOT MATCHED AND c._change_type != 'delete'
            |  THEN INSERT (doc_id, shard, body) VALUES (c.doc_id, c.shard, c.body)
            |""".stripMargin)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val src = s.read.table("graft_rsrc.docs_src")
    val dst = s.read.table("graft_rdst.docs_dst")
    val nDiff = dst.exceptAll(src).union(src.exceptAll(dst)).count()
    val totals = dst.agg(
      count(lit(1)),
      expr("bit_xor(doc_id)"),
      sum(when(col("body") =!= lower(col("body")), 1L).otherwise(0L))).collect().head
    import spark.implicits._
    Seq((totals.getLong(0), totals.getLong(1), totals.getLong(2), nDiff))
      .toDF("n_docs", "xor_ids", "n_upper", "n_diff")
  }

  val replicaSyncParitySql: String =
    """WITH fin AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id < 300 THEN 1 ELSE 0 END AS up
      |  FROM range(0, 2000) t(doc_id) WHERE doc_id < 1500)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(up) AS BIGINT) AS n_upper, CAST(0 AS BIGINT) AS n_diff
      |FROM fin""".stripMargin

  /** Driver-checked RESTORE (round 14): Delta `RESTORE TABLE` / Iceberg
    * rollback as a NEW commit — the bad-deploy undo button. Two appends,
    * a merge-on-read DELETE, a restore to the pre-delete snapshot
    * (SQL spelling `SET TBLPROPERTIES ('graft.restore'='2')`), then a
    * second DELETE on the restored state. The change feed is read across
    * ALL five commits and rolled up by (version, change type) — so the
    * restore's exact CDC semantics sit under the hash gate: the shrunk
    * delete vectors surface the resurrected rows as `insert` events at
    * the restore version (positions only — zero write amplification),
    * and the post-restore DELETE applies to the restored live set.
    * Every cell re-derived by DuckDB from the known windows.
    */
  def restoreReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("rst:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkrst_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_rst", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rst.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_rst.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_rst.docs_rst").append()
    append(0L, 800L)    // v1
    append(800L, 2000L) // v2
    s.sql("DELETE FROM graft_rst.docs_rst WHERE doc_id >= 1500") // v3: MOR vectors
    s.sql("ALTER TABLE graft_rst.docs_rst SET TBLPROPERTIES ('graft.restore' = '2')") // v4
    s.sql("DELETE FROM graft_rst.docs_rst WHERE shard = 3") // v5: on restored state
    s.read.format("graft.sources.ShardSinkSource")
      .option("path", new java.io.File(root, "docs_rst").getPath)
      .option("readChangeFeed", "true").load()
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(doc_id)").as("xor_ids"))
      .orderBy("_commit_version", "_change_type")
  }

  val restoreReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 2000) t(doc_id)),
      |ch AS (
      |  SELECT 1 AS v, 'insert' AS ct, doc_id FROM g WHERE doc_id < 800
      |  UNION ALL SELECT 2, 'insert', doc_id FROM g WHERE doc_id >= 800
      |  UNION ALL SELECT 3, 'delete', doc_id FROM g WHERE doc_id >= 1500
      |  UNION ALL SELECT 4, 'insert', doc_id FROM g WHERE doc_id >= 1500
      |  UNION ALL SELECT 5, 'delete', doc_id FROM g WHERE shard = 3)
      |SELECT CAST(v AS BIGINT) AS _commit_version, ct AS _change_type,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows, bit_xor(doc_id) AS xor_ids
      |FROM ch GROUP BY 1, 2 ORDER BY _commit_version, _change_type""".stripMargin

  /** Driver-checked FILTERED OVERWRITE (round 14): Delta's
    * `replaceWhere` — the partition-backfill idiom a landing zone lives
    * on (re-ingest one source/day atomically). `writeTo(t).overwrite
    * (cond)` drops the rows matching `cond` and lands the incoming data
    * in ONE commit: the drop side is the DELETE WHERE copy-on-write core
    * (metadata-only for shard-aligned predicates over the shard-whole
    * clustered files), the insert side the ordinary clustered append,
    * one manifest flip covering both. Delta's constraint holds too:
    * inserted rows must match the predicate, or the commit refuses. The
    * query re-ingests shard 3 with transformed bodies, then shrinks the
    * doc_id>=1800 window to [1800,1900) — the final per-shard rollup
    * (counts, id xors, transformed-body counts) pins both replaces and
    * their interaction under the hash gate.
    */
  def replaceWhereReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("ow:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkow_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_ow", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ow.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_ow.cdf.enabled", "true")
    def src = s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2000").option("numPartitions", "2").load()
    src.writeTo("graft_ow.docs_ow").append() // v1
    src.where(col("shard") === 3)
      .select(col("doc_id"), col("shard"), upper(col("body")).as("body"))
      .writeTo("graft_ow.docs_ow").overwrite(col("shard") === 3) // v2: re-ingest shard 3
    src.where(col("doc_id") >= 1800L && col("doc_id") < 1900L)
      .writeTo("graft_ow.docs_ow").overwrite(col("doc_id") >= 1800L) // v3: shrink the tail
    s.read.table("graft_ow.docs_ow")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(col("body") =!= lower(col("body")), 1L).otherwise(0L)).as("n_upper"))
      .orderBy("shard")
  }

  /** Shard-3 bodies are upper ONLY below 1800: the v3 window replace
    * re-ingested [1800,1900) with original-case bodies.
    */
  val replaceWhereReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 2000) t(doc_id)),
      |fin AS (
      |  SELECT doc_id, shard,
      |         CASE WHEN shard = 3 AND doc_id < 1800 THEN 1 ELSE 0 END AS up
      |  FROM g WHERE doc_id < 1900)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_rows, bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(up) AS BIGINT) AS n_upper
      |FROM fin GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked SCHEMA EVOLUTION (round 14): the first thing a real
    * landing-zone user does after a month — add columns. v1 lands the
    * 3-column corpus; two `ALTER TABLE … ADD COLUMN`s widen the schema
    * (pure metadata flips — no data file touched); a post-evolution
    * append writes 5-column rows. The merged read must null-fill the
    * added columns for pre-evolution rows and carry real values for new
    * ones — the rollup groups by the added `lang` (nulls coalesced for
    * cross-engine ordering) and sums the added `score`, so the
    * null-fill boundary and both added-column payloads sit under the
    * hash gate. Old-snapshot-under-old-schema is spec-pinned.
    */
  def schemaEvolution(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("evolve:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkev_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_ev", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ev.root", root.getPath)
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2000").option("numPartitions", "2").load()
      .where(col("doc_id") < 1200L)
      .writeTo("graft_ev.docs_ev").append() // v1: 3 columns
    s.sql("ALTER TABLE graft_ev.docs_ev ADD COLUMN lang STRING")  // v2
    s.sql("ALTER TABLE graft_ev.docs_ev ADD COLUMN score BIGINT") // v3
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "2000").option("numPartitions", "2").load()
      .where(col("doc_id") >= 1200L)
      .withColumn("lang", when(col("shard") < 8, "pt").otherwise("en"))
      .withColumn("score", col("doc_id") % 100L)
      .writeTo("graft_ev.docs_ev").append() // v4: 5 columns
    s.read.table("graft_ev.docs_ev")
      .groupBy(coalesce(col("lang"), lit("-")).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(col("score")).as("sum_score"),
        sum(when(col("score").isNull, 1L).otherwise(0L)).as("n_null_score"))
      .orderBy("lang")
  }

  val schemaEvolutionSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         CASE WHEN doc_id >= 1200
      |              THEN (CASE WHEN doc_id % 16 < 8 THEN 'pt' ELSE 'en' END) END AS lang,
      |         CASE WHEN doc_id >= 1200 THEN doc_id % 100 END AS score
      |  FROM range(0, 2000) t(doc_id))
      |SELECT COALESCE(lang, '-') AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(score) AS BIGINT) AS sum_score,
      |       CAST(SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_score
      |FROM g GROUP BY 1 ORDER BY lang""".stripMargin

  /** CHECK-constraint lifecycle under the hash gate: ADD validates
    * existing rows (a violated ADD refuses), admitted constraints are
    * enforced on appends and UPDATE postimages (violating jobs abort with
    * nothing committed), NULL passes (ANSI), UNSET lifts exactly one
    * constraint while the rest stay in force. `n_rejected` counts the
    * refusals the run OBSERVED — if enforcement ever goes quiet the
    * counter drops and the hash breaks, and if a rejected write leaks
    * rows the content aggregates break.
    */
  def constraintsReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("constraints:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkck_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_ck", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ck.root", root.getPath)
    def docs(lo: Long, hi: Long): org.apache.spark.sql.DataFrame =
      s.range(lo, hi).select(
        col("id").as("doc_id"),
        (col("id") % 16L).cast("int").as("shard"),
        concat(lit("body"), col("id")).as("body"))
    def chain(t: Throwable): String = {
      val sb = new StringBuilder
      var c: Throwable = t
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    var rejected = 0L
    def expectRefused(frag: String)(op: => Unit): Unit =
      try { op; () } catch {
        case t: Throwable if chain(t).contains(frag) => rejected += 1L
      }
    docs(0L, 2000L).writeTo("graft_ck.docs_ck").append() // v1
    s.sql("ALTER TABLE graft_ck.docs_ck SET TBLPROPERTIES " +
      "('graft.constraint.valid_shard' = 'shard >= 0 AND shard < 16')") // v2
    // refused: rows 0..499 violate — the DDL never lands
    expectRefused("existing rows violate")(s.sql(
      "ALTER TABLE graft_ck.docs_ck SET TBLPROPERTIES " +
        "('graft.constraint.big_ids' = 'doc_id >= 500')"))
    docs(2000L, 2400L).writeTo("graft_ck.docs_ck").append() // v3: passes
    // violating append: every row lands shard -1 — job aborts, no commit
    expectRefused("CHECK constraint valid_shard")(
      docs(5000L, 5010L).withColumn("shard", lit(-1))
        .writeTo("graft_ck.docs_ck").append())
    s.sql("ALTER TABLE graft_ck.docs_ck ADD COLUMN score BIGINT") // v4
    s.sql("ALTER TABLE graft_ck.docs_ck SET TBLPROPERTIES " +
      "('graft.constraint.pos_score' = 'score > 0')") // v5
    docs(2400L, 2500L).writeTo("graft_ck.docs_ck").append() // v6: null score PASSES
    // copy-on-write UPDATE: violating postimage aborts the whole rewrite
    expectRefused("CHECK constraint pos_score")(
      s.sql("UPDATE graft_ck.docs_ck SET score = -5 WHERE doc_id = 200"))
    s.sql("UPDATE graft_ck.docs_ck SET score = 50 WHERE doc_id < 100") // valid
    // UNSET lifts valid_shard only: a negative shard now lands while
    // pos_score is still enforced on the same row (null score → passes)
    s.sql("ALTER TABLE graft_ck.docs_ck UNSET TBLPROPERTIES ('graft.constraint.valid_shard')")
    docs(9000L, 9001L).withColumn("shard", lit(-2))
      .writeTo("graft_ck.docs_ck").append()
    s.read.table("graft_ck.docs_ck").agg(
      count(lit(1)).as("n_docs"),
      expr("bit_xor(doc_id)").as("xor_ids"),
      sum(when(col("shard") < 0, 1L).otherwise(0L)).as("n_neg_shard"),
      sum(when(col("score") === 50L, 1L).otherwise(0L)).as("n_score50"),
      sum(when(col("score").isNull, 1L).otherwise(0L)).as("n_null_score"))
      .withColumn("n_rejected", lit(rejected))
  }

  val constraintsReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         CASE WHEN doc_id < 100 THEN 50 END AS score
      |  FROM range(0, 2500) t(doc_id)
      |  UNION ALL SELECT 9000, -2, NULL)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN shard < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg_shard,
      |       CAST(SUM(CASE WHEN score = 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_score50,
      |       CAST(SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_score,
      |       CAST(3 AS BIGINT) AS n_rejected
      |FROM g""".stripMargin

  /** SHARD-GROUPED sink reads under the hash gate: two compacted sink
    * tables (every committed file shard-pure, manifest-proven) join on
    * (shard, doc_id) and roll up per shard with ZERO shuffle exchanges —
    * the scan reports [[KeyGroupedPartitioning]](identity(shard)), the
    * SPJ machinery pairs each shard's files across the tables, and the
    * post-join aggregate rides the same clustering. This is the read-side
    * payoff of the clustered write + compaction layout: a 100 TB landing
    * zone consumed like a bucketed table instead of re-shuffled per
    * query. Tables build once per JVM ([[graft.util.Memo]] — the
    * build-once-query-many shape); the timed body is the join itself.
    * ShardSinkSpec pins the zero-exchange plan AND the uncompacted
    * fallback (mixed-shard files degrade to a normal shuffled join, never
    * a wrong answer).
    */
  def sinkSpj(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (dirA, dirB) = graft.util.Memo.cached("sinkSpjTables", spark, sfDir) {
      val sfx = java.security.MessageDigest.getInstance("MD5")
        .digest(("sinkspj:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
      def build(tag: String, lo: Long, hi: Long): String = {
        val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkspj_${tag}_$sfx")
        SinkFs.deleteRecursively(root)
        spark.read.format("graft.sources.DocGenSource")
          .option("numDocs", "4500").option("numPartitions", "2").load()
          .where(col("doc_id") >= lo && col("doc_id") < hi)
          .write.format("graft.sources.ShardSinkSource")
          .option("path", root.getPath).mode(org.apache.spark.sql.SaveMode.Append).save()
        compact(root.getPath) // one shard-pure file per shard → eligible
        root.getPath
      }
      (build("a", 0L, 3000L), build("b", 1500L, 4500L))
    }
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def side(dir: String) = s.read.format("graft.sources.ShardSinkSource")
      .option("path", dir).load()
    val a = side(dirA).select(
      col("shard").as("a_shard"), col("doc_id").as("a_id"), col("body").as("a_body"))
    val b = side(dirB).select(col("shard").as("b_shard"), col("doc_id").as("b_id"))
    a.join(b, col("a_shard") === col("b_shard") && col("a_id") === col("b_id"))
      .groupBy(col("a_shard").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(a_id)").as("xor_ids"),
        sum(when(substring(col("a_body"), 1, 1) === "a", 1L).otherwise(0L)).as("n_body_a"))
      .orderBy("shard")
  }

  val sinkSpjSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS body
      |  FROM range(1500, 3000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN substring(body, 1, 1) = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_body_a
      |FROM g GROUP BY shard ORDER BY shard""".stripMargin

  /** SHALLOW CLONE under the hash gate: clone the source AT VERSION 1
    * through the SQL spelling, diverge BOTH tables (merge-on-read
    * deletes + a source append — MOR divergence never deletes data
    * files, so it is clone-safe; CoW rewrites / compaction / vacuum on
    * the source are the documented clone-breaking hazard, spec-pinned),
    * and report both tables' final rollups PLUS the zero-copy proof: the
    * clone's directory holds ZERO local data files even after its own
    * vector-based DML (`n_local_data_files` — a copied clone or a
    * rewriting delete would make it jump).
    */
  def cloneReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("clone:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcl_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_cl", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cl.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_cl.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2100").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_cl.docs_src").append()
    append(0L, 1200L)    // src v1
    append(1200L, 2000L) // src v2
    val srcDir = new java.io.File(root, "docs_src").getPath
    s.sql("ALTER TABLE graft_cl.docs_clone SET TBLPROPERTIES " +
      s"('graft.clone' = '$srcDir@1')") // the v1 snapshot: docs 0..1199
    val cloneDir = new java.io.File(root, "docs_clone").getPath
    // divergence, all clone-safe MOR: the clone vectors rows out of the
    // source's files (local .pos, foreign .tsv untouched), the source
    // vectors + appends without deleting anything the clone references
    s.sql("DELETE FROM graft_cl.docs_clone WHERE doc_id < 100")
    s.sql("DELETE FROM graft_cl.docs_src WHERE doc_id >= 1000")
    append(2000L, 2100L) // src v4: invisible to the clone
    val localData = SinkFs.listFileNames(new org.apache.hadoop.fs.Path(cloneDir))
      .count(_.endsWith(".tsv"))
    val srcAgg = s.read.table("graft_cl.docs_src").agg(
      count(lit(1)).as("n_src"), expr("bit_xor(doc_id)").as("xor_src"))
    val clAgg = s.read.table("graft_cl.docs_clone").agg(
      count(lit(1)).as("n_clone"), expr("bit_xor(doc_id)").as("xor_clone"))
    srcAgg.crossJoin(clAgg)
      .withColumn("n_local_data_files", lit(localData.toLong))
  }

  val cloneReportSql: String =
    """WITH src AS (
      |  SELECT doc_id FROM range(0, 1000) t(doc_id)
      |  UNION ALL SELECT doc_id FROM range(2000, 2100) t(doc_id)),
      |cl AS (SELECT doc_id FROM range(100, 1200) t(doc_id))
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM src) AS n_src,
      |       (SELECT bit_xor(doc_id) FROM src) AS xor_src,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM cl) AS n_clone,
      |       (SELECT bit_xor(doc_id) FROM cl) AS xor_clone,
      |       CAST(0 AS BIGINT) AS n_local_data_files""".stripMargin

  /** METADATA TABLES under the hash gate: a lifecycle (append → MOR
    * delete → ADD CONSTRAINT validated over the vectored live rows →
    * chunked compaction) audited ENTIRELY through the SQL metadata
    * surface — `<cat>.<t>.files` proves the chunked layout (file count =
    * Σ ceil(liveRowsPerShard / target), all shard-pure, live row total
    * and doc extremes match the range math), `.history` proves the
    * op-stamped commit trail, `.tags` / `.constraints` the governance
    * state. The oracle re-derives the file math from range() — a wrong
    * chunk split, a lost vector fold or a missed op marker all break the
    * hash.
    */
  def metaTablesReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("meta:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmt_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_mt", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mt.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_mt.delete.mode", "merge-on-read")
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "800").option("numPartitions", "2").load()
      .writeTo("graft_mt.docs_mt").append() // v1 append
    s.sql("DELETE FROM graft_mt.docs_mt WHERE doc_id < 40") // v2 delete (MOR)
    // validated over the LIVE (vector-subtracted) rows: passes post-delete
    s.sql("ALTER TABLE graft_mt.docs_mt SET TBLPROPERTIES " +
      "('graft.constraint.live_ids' = 'doc_id >= 40')") // v3 addConstraint
    val dir = new java.io.File(root, "docs_mt").getPath
    compact(dir, retainVersions = 9, targetRowsPerFile = 25L) // v4 compact
    s.sql("ALTER TABLE graft_mt.docs_mt SET TBLPROPERTIES ('graft.tag.audited' = '4')")
    val files = s.read.table("graft_mt.docs_mt.files").agg(
      count(lit(1)).as("n_files"),
      sum(col("n_rows")).as("n_file_rows"),
      countDistinct(col("shard_min")).as("n_shards"),
      min(col("doc_min")).as("min_doc"),
      max(col("doc_max")).as("max_doc"))
    val hist = s.read.table("graft_mt.docs_mt.history").agg(
      count(lit(1)).as("n_versions"),
      concat_ws(",", sort_array(collect_set(col("op")))).as("ops"))
    val tags = s.read.table("graft_mt.docs_mt.tags")
      .agg(count(lit(1)).as("n_tags"))
    val cks = s.read.table("graft_mt.docs_mt.constraints").agg(
      count(lit(1)).as("n_constraints"),
      concat_ws(",", sort_array(collect_set(col("predicate")))).as("predicates"))
    // partitions (round 16): post-compact every file is shard-pure, so
    // the rollup is exactly 16 shard rows, zero NULL-shard straddlers
    val parts = s.read.table("graft_mt.docs_mt.partitions").agg(
      count(lit(1)).as("n_partitions"),
      sum(col("n_rows")).as("n_part_rows"),
      sum(col("n_files")).as("n_part_files"),
      // ROWS in the NULL-shard straddler rollup (0 when compacted), not
      // the 0/1 presence of the rollup row itself — review fix
      sum(when(col("shard").isNull, col("n_rows")).otherwise(0L)).as("n_straddler_rows"))
    files.crossJoin(hist).crossJoin(tags).crossJoin(cks).crossJoin(parts)
  }

  val metaTablesReportSql: String =
    """WITH live AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard
      |  FROM range(40, 800) t(doc_id)),
      |per_shard AS (SELECT shard, COUNT(*) AS n FROM live GROUP BY shard)
      |SELECT (SELECT CAST(SUM(CAST(CEIL(n / 25.0) AS BIGINT)) AS BIGINT) FROM per_shard) AS n_files,
      |       (SELECT CAST(SUM(n) AS BIGINT) FROM per_shard) AS n_file_rows,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM per_shard) AS n_shards,
      |       (SELECT MIN(doc_id) FROM live) AS min_doc,
      |       (SELECT MAX(doc_id) FROM live) AS max_doc,
      |       CAST(4 AS BIGINT) AS n_versions,
      |       'addConstraint,append,compact,delete' AS ops,
      |       CAST(1 AS BIGINT) AS n_tags,
      |       CAST(1 AS BIGINT) AS n_constraints,
      |       'doc_id >= 40' AS predicates,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM per_shard) AS n_partitions,
      |       (SELECT CAST(SUM(n) AS BIGINT) FROM per_shard) AS n_part_rows,
      |       (SELECT CAST(SUM(CAST(CEIL(n / 25.0) AS BIGINT)) AS BIGINT) FROM per_shard) AS n_part_files,
      |       CAST(0 AS BIGINT) AS n_straddler_rows""".stripMargin

  /** CTAS/RTAS under the hash gate: `CREATE TABLE … AS SELECT` derives a
    * new landing zone (with an EVOLVED extra column persisted through
    * the fresh table's schema flips) from an existing one, the derived
    * table is a full citizen (CoW DELETE runs on it), and
    * `REPLACE TABLE … AS SELECT` swaps a table's content wholesale —
    * the analyzer's existence gate rides the directory-based
    * [[ShardSinkCatalog.tableExists]].
    */
  def ctasReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("ctas:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkct_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_ct", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ct.root", root.getPath)
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "1500").option("numPartitions", "2").load()
      .writeTo("graft_ct.docs_src").append()
    s.sql("CREATE TABLE graft_ct.docs_scored AS " +
      "SELECT doc_id, shard, body, doc_id % 97 AS score " +
      "FROM graft_ct.docs_src WHERE doc_id < 1000")
    s.sql("DELETE FROM graft_ct.docs_scored WHERE score >= 90")
    s.sql("CREATE TABLE graft_ct.docs_swap AS " +
      "SELECT * FROM graft_ct.docs_src WHERE doc_id < 200")
    s.sql("REPLACE TABLE graft_ct.docs_swap AS " +
      "SELECT * FROM graft_ct.docs_src WHERE doc_id >= 1300")
    val scored = s.read.table("graft_ct.docs_scored").agg(
      count(lit(1)).as("n_docs"),
      expr("bit_xor(doc_id)").as("xor_ids"),
      sum(col("score")).as("sum_score"))
    val swap = s.read.table("graft_ct.docs_swap").agg(
      count(lit(1)).as("n_swap"),
      expr("bit_xor(doc_id)").as("xor_swap"))
    scored.crossJoin(swap)
  }

  val ctasReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 97 AS score FROM range(0, 1000) t(doc_id)
      |  WHERE doc_id % 97 < 90),
      |r AS (SELECT doc_id FROM range(1300, 1500) t(doc_id))
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n_docs,
      |       (SELECT bit_xor(doc_id) FROM g) AS xor_ids,
      |       (SELECT CAST(SUM(score) AS BIGINT) FROM g) AS sum_score,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM r) AS n_swap,
      |       (SELECT bit_xor(doc_id) FROM r) AS xor_swap""".stripMargin

  /** TWO-LEVEL MANIFESTS under the driver's hash gate (the specs pin
    * the mechanics; this puts the layout itself under DuckDB): the whole
    * append/append/MOR-delete lifecycle runs with segmentTarget = 1 —
    * every version a manifest list over single-entry segments — and the
    * content aggregates must match the same range() math the
    * single-blob layout produces, plus structural booleans: v2 is
    * two-level and references EVERY v1 segment unchanged (append reuse).
    * The target is restored in a finally: the rest of the suite keeps
    * the default layout.
    */
  def manifestSegmentsReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("segs:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinksg_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_sg", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sg.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_sg.delete.mode", "merge-on-read")
    val prevTarget = segmentTarget
    setSegmentTarget(1)
    try {
      def append(lo: Long, hi: Long): Unit =
        s.read.format("graft.sources.DocGenSource")
          .option("numDocs", "1600").option("numPartitions", "2").load()
          .where(col("doc_id") >= lo && col("doc_id") < hi)
          .writeTo("graft_sg.docs_sg").append()
      append(0L, 500L)     // v1: may stay inline (one coalesced file)
      append(500L, 1100L)  // v2: ≥2 entries → two-level
      append(1100L, 1600L) // v3: blind append — v2's segments all reuse
      s.sql("DELETE FROM graft_sg.docs_sg WHERE doc_id < 50") // v4: vector
      val dir = new java.io.File(root, "docs_sg").getPath
      val v2 = segmentRefsAt(dir, 2L).map(_.name)
      val v3 = segmentRefsAt(dir, 3L).map(_.name)
      val v4 = segmentRefsAt(dir, 4L).map(_.name)
      val twoLevel = v2.nonEmpty && v3.nonEmpty && v4.nonEmpty
      val appendReused = v2.nonEmpty && v2.forall(v3.contains)
      s.read.table("graft_sg.docs_sg").agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"))
        .withColumn("two_level", lit(if (twoLevel) 1L else 0L))
        .withColumn("append_reused_all_v1_segments", lit(if (appendReused) 1L else 0L))
    } finally setSegmentTarget(prevTarget)
  }

  val manifestSegmentsReportSql: String =
    """WITH g AS (SELECT doc_id FROM range(50, 1600) t(doc_id))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, bit_xor(doc_id) AS xor_ids,
      |       CAST(1 AS BIGINT) AS two_level,
      |       CAST(1 AS BIGINT) AS append_reused_all_v1_segments
      |FROM g""".stripMargin

  /** WRITE-SIDE AUTO SCHEMA EVOLUTION under the driver's hash gate
    * (round 15): a `mergeSchema` append adds a `lang` column — schema
    * and rows land in ONE commit (no separate ALTER version) — then a
    * narrower REORDERED frame appends by name-resolution with the
    * evolved column null-filled. The aggregates must match the same
    * range() math in DuckDB; `evolve_rode_commits` pins the structural
    * claim (exactly one manifest version per append).
    */
  def autoEvolveReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("aev:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkaev_$sfx")
    SinkFs.deleteRecursively(dir)
    def docs(lo: Long, hi: Long) = spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "1500").option("numPartitions", "2").load()
      .where(col("doc_id") >= lo && col("doc_id") < hi)
    docs(0L, 600L).write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath)
      .mode(org.apache.spark.sql.SaveMode.Append).save() // v1: 3-column
    docs(600L, 1200L)
      .withColumn("lang", concat(lit("l"), (col("doc_id") % 3).cast("string")))
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save() // v2: evolves lang
    docs(1200L, 1500L).select("body", "shard", "doc_id") // reordered, no lang
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save() // v3: null-fills
    val oneCommitPerAppend = currentManifestVersion(dir.getPath) == 3L &&
      tableSchema(dir.getPath).fieldNames.sameElements(
        Array("doc_id", "shard", "body", "lang"))
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("evolve_rode_commits", lit(if (oneCommitPerAppend) 1L else 0L))
  }

  val autoEvolveReportSql: String =
    """WITH l AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id >= 600 AND doc_id < 1200
      |              THEN 'l' || CAST(doc_id % 3 AS VARCHAR) END AS lang
      |  FROM range(0, 1500) t(doc_id))
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang,
      |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(1 AS BIGINT) AS evolve_rode_commits
      |FROM l""".stripMargin

  /** SEGMENT-ENVELOPE PRUNING under the driver's hash gate (round 15):
    * compaction into shard-pure chunks makes every segment ref carry a
    * tight envelope; a pushed `shard = 3` scan must then read only the
    * matching segments — `pruned_whole_segments` pins that the physical
    * segment reads stayed below the census while the row aggregates
    * match DuckDB exactly.
    */
  def segEnvelopeReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("env:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkenv_$sfx")
    SinkFs.deleteRecursively(dir)
    val prevTarget = segmentTarget
    setSegmentTarget(1)
    try {
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "400").option("numPartitions", "2").load()
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
      compact(dir.getPath, targetRowsPerFile = 25L) // 16 shard-pure segments
      val total = segmentRefsAt(dir.getPath, currentManifestVersion(dir.getPath)).size
      clearSegmentCacheForTest()
      val before = segmentReadCount.get()
      val r = spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath).load()
        .where(col("shard") === 3)
        .agg(count(lit(1)).as("n_docs"), expr("bit_xor(doc_id)").as("xor_ids"))
        .head()
      val misses = segmentReadCount.get() - before
      val pruned = total >= 16 && misses >= 1L && misses < total.toLong
      spark.range(1).select(
        lit(r.getLong(0)).as("n_docs"),
        lit(r.getLong(1)).as("xor_ids"),
        lit(if (pruned) 1L else 0L).as("pruned_whole_segments"))
    } finally setSegmentTarget(prevTarget)
  }

  val segEnvelopeReportSql: String =
    """WITH g AS (SELECT doc_id FROM range(0, 400) t(doc_id) WHERE doc_id % 16 = 3)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, bit_xor(doc_id) AS xor_ids,
      |       CAST(1 AS BIGINT) AS pruned_whole_segments
      |FROM g""".stripMargin

  /** FILTERED METADATA-ONLY AGGREGATES under the driver's hash gate
    * (round 15): on the shard-pure compacted layout a `shard IN (…)`
    * (or chunk-aligned doc-range) predicate is FILE-exact, so COUNT /
    * MIN / MAX answer straight from the pruned manifest entries — zero
    * data IO, Iceberg/Delta's partition-pruned count. `meta_only` pins
    * the structural claim: both filtered aggregations planned as the
    * manifest-only [[ShardSinkCountScan]].
    */
  def countPrunedReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("cpr:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcpr_$sfx")
    SinkFs.deleteRecursively(dir)
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "400").option("numPartitions", "2").load()
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath)
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    compact(dir.getPath, targetRowsPerFile = 10L) // shard-pure 10-row chunks
    def table = spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
    val byShard = table.where(col("shard").isin(2, 3))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
    // chunk ranges per shard s: [s, s+144] [s+160, s+304] [s+320, s+384]
    // — doc_id >= 160 prunes every first chunk whole and full-matches
    // the rest, so the count stays metadata-only
    val tail = table.where(col("doc_id") >= 160L).agg(count(lit(1)).as("n_tail"))
    val metaOnly =
      byShard.queryExecution.executedPlan.toString.contains("ShardSinkCountScan") &&
        tail.queryExecution.executedPlan.toString.contains("ShardSinkCountScan")
    val r1 = byShard.head()
    val r2 = tail.head()
    spark.range(1).select(
      lit(r1.getLong(0)).as("n_docs"),
      lit(r1.getLong(1)).as("min_doc"),
      lit(r1.getLong(2)).as("max_doc"),
      lit(r2.getLong(0)).as("n_tail"),
      lit(if (metaOnly) 1L else 0L).as("meta_only"))
  }

  val countPrunedReportSql: String =
    """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM range(0, 400) t(doc_id)
      |        WHERE doc_id % 16 IN (2, 3)) AS n_docs,
      |       (SELECT MIN(doc_id) FROM range(0, 400) t(doc_id)
      |        WHERE doc_id % 16 IN (2, 3)) AS min_doc,
      |       (SELECT MAX(doc_id) FROM range(0, 400) t(doc_id)
      |        WHERE doc_id % 16 IN (2, 3)) AS max_doc,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM range(0, 400) t(doc_id)
      |        WHERE doc_id >= 160) AS n_tail,
      |       CAST(1 AS BIGINT) AS meta_only""".stripMargin

  /** BLOOM POINT-LOOKUP SKIPPING under the driver's hash gate (round
    * 15): an UNCLUSTERED landing zone (hash-partitioned writes, every
    * file's doc range spans the whole table, so range stats prune
    * nothing) answers `doc_id = K` and `doc_id IN (…)` touching only the
    * files whose per-entry bloom can't rule the ids out.
    * `bloom_pruned` pins the physical claim: fewer data files opened
    * than the census, on a layout where ranges alone would read all.
    */
  def bloomLookupReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("blm:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkblm_$sfx")
    SinkFs.deleteRecursively(dir)
    // 8 ingest batches of interleaved residue slices: every file's doc
    // range spans ~the whole table, so range stats cannot prune a point
    // lookup — exactly the ingest-ordered landing zone shape
    (0 until 8).foreach { i =>
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "1").load()
        .where(col("doc_id") % 8 === i.toLong)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    }
    val census = committedEntries(dir.getPath).size
    def table = spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
    val before = dataFileReadCount.get()
    val hit = table.where(col("doc_id") === 1337L).collect()
    val openedEq = dataFileReadCount.get() - before
    val b4in = dataFileReadCount.get()
    val nIn = table.where(col("doc_id").isin(3L, 777L, 1999L)).count()
    val openedIn = dataFileReadCount.get() - b4in
    val pruned = census >= 8 &&
      openedEq >= 1L && openedEq < census.toLong &&
      openedIn >= 1L && openedIn < census.toLong
    spark.range(1).select(
      lit(hit.head.getLong(0)).as("doc_id"),
      lit(hit.head.getInt(1)).as("shard"),
      lit(hit.head.getString(2)).as("body"),
      lit(nIn).as("n_in"),
      lit(if (pruned && hit.length == 1) 1L else 0L).as("bloom_pruned"))
  }

  val bloomLookupReportSql: String =
    """SELECT CAST(1337 AS BIGINT) AS doc_id, CAST(1337 % 16 AS INT) AS shard,
      |       md5('1337') AS body, CAST(3 AS BIGINT) AS n_in,
      |       CAST(1 AS BIGINT) AS bloom_pruned""".stripMargin

  /** BIN-PACKING COMPACTION under the driver's hash gate (round 15):
    * Delta's `OPTIMIZE` shape — a second maintenance pass on a table
    * whose first pass already produced in-band shard-pure chunks must
    * rewrite ONLY the fresh ingest, keeping yesterday's chunks verbatim.
    * `kept_verbatim` pins the physical claim (every first-pass chunk's
    * entry name survives the second pass) while the row aggregates match
    * the same range() math in DuckDB.
    */
  def binPackReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("bpk:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkbpk_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(lo: Long, hi: Long): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "1000").option("numPartitions", "1").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 800L)
    compact(dir.getPath, targetRowsPerFile = 50L) // 16 in-band 50-row chunks
    val firstPass = committedEntries(dir.getPath).map(_.file).toSet
    append(800L, 1000L) // the day's ingest: one small straddling file
    compact(dir.getPath, targetRowsPerFile = 50L, binPack = true)
    val after = committedEntries(dir.getPath)
    val keptVerbatim = firstPass.subsetOf(after.map(_.file).toSet) &&
      after.forall(e => e.hasStats && e.shardMin == e.shardMax)
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(doc_id)").as("xor_ids"),
        countDistinct(col("shard")).as("n_shards"))
      .withColumn("kept_verbatim", lit(if (keptVerbatim) 1L else 0L))
  }

  val binPackReportSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, bit_xor(doc_id) AS xor_ids,
      |       CAST(COUNT(DISTINCT doc_id % 16) AS BIGINT) AS n_shards,
      |       CAST(1 AS BIGINT) AS kept_verbatim
      |FROM range(0, 1000) t(doc_id)""".stripMargin

  /** AUTO-COMPACT under the driver's hash gate (round 15): three
    * appends with `.option("autoCompact", "50")` — each append's own
    * maintenance pass re-packs whatever fell out of band, so the table
    * never accumulates straddling ingest files. `auto_packed` pins the
    * structural claim: after the third append every committed file is
    * shard-pure with no operator ever calling compact() explicitly, and
    * the version log shows one maintenance commit riding each append.
    */
  def autoCompactReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("acp:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkacp_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(lo: Long, hi: Long): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "1000").option("numPartitions", "1").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath).option("autoCompact", "50")
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 800L); append(800L, 900L); append(900L, 1000L)
    val entries = committedEntries(dir.getPath)
    val packed = entries.forall(e => e.hasStats && e.shardMin == e.shardMax) &&
      currentManifestVersion(dir.getPath) == 6L // 3 appends + 3 maintenance
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(doc_id)").as("xor_ids"))
      .withColumn("auto_packed", lit(if (packed) 1L else 0L))
  }

  val autoCompactReportSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, bit_xor(doc_id) AS xor_ids,
      |       CAST(1 AS BIGINT) AS auto_packed
      |FROM range(0, 1000) t(doc_id)""".stripMargin

  /** GROUPED METADATA-ONLY AGGREGATES under the driver's hash gate
    * (round 15): on a compacted shard-pure layout `SELECT shard,
    * count(*), min(doc_id), max(doc_id) GROUP BY shard` answers entirely
    * from the manifest's per-file bookkeeping — the hourly
    * partition-level rollup of a 100 TB landing zone with zero data IO.
    * `meta_only` pins the structural claim (the grouped plan is the
    * manifest scan, no aggregate node reads rows).
    */
  def groupByMetaReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("gbm:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkgbm_$sfx")
    SinkFs.deleteRecursively(dir)
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "400").option("numPartitions", "2").load()
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath)
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    compact(dir.getPath, targetRowsPerFile = 10L) // several shard-pure files per shard
    val grouped = spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
    val metaOnly =
      grouped.queryExecution.executedPlan.toString.contains("ShardSinkCountScan")
    grouped.withColumn("meta_only", lit(if (metaOnly) 1L else 0L)).orderBy("shard")
  }

  val groupByMetaReportSql: String =
    """SELECT CAST(doc_id % 16 AS INT) AS shard,
      |       CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
      |       CAST(1 AS BIGINT) AS meta_only
      |FROM range(0, 400) t(doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** RUNTIME FILE PRUNING (DPP on the lakehouse table) under the
    * driver's hash gate (round 15): the compacted sink fact joins a
    * selectively-filtered small dim on `shard`; the dim broadcasts, and
    * at execution Spark hands its shard values back through
    * `SupportsRuntimeFiltering` — whole manifest files for the other 12
    * shards vanish before any task launches. `dpp_pruned` pins the
    * physical claim: the delivered filter was exactly the dim's shard
    * set AND the scan opened fewer data files than the census.
    */
  def sinkDppReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("dpp:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkdpp_$sfx")
    SinkFs.deleteRecursively(dir)
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", "4000").option("numPartitions", "4").load()
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath)
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    compact(dir.getPath, targetRowsPerFile = 250L) // 16 shard-pure files
    val census = committedEntries(dir.getPath).size
    val fact = spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
    // the dim-side predicate is what makes DPP fire (Spark only prunes
    // when the build side is itself selectively filtered)
    val dim = graft.model.Tables.region(spark, sfDir)
      .where(col("r_regionkey") < 4)
      .select(col("r_regionkey").cast("int").as("shard_key"), col("r_name"))
    val joined = fact.join(broadcast(dim), fact("shard") === dim("shard_key"))
      .groupBy(col("shard"), col("r_name"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(doc_id)").as("xor_ids"))
    lastRuntimeFilter.set(null)
    val before = dataFileReadCount.get()
    val rows = joined.collect()
    val opened = dataFileReadCount.get() - before
    val pruned = lastRuntimeFilter.get() == Set(0, 1, 2, 3) &&
      opened >= 4L && opened < census.toLong
    import spark.implicits._
    rows.map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        if (pruned) 1L else 0L))
      .toSeq.sortBy(_._1)
      .toDF("shard", "r_name", "n_docs", "xor_ids", "dpp_pruned")
  }

  val sinkDppReportSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard
      |  FROM range(0, 4000) t(doc_id))
      |SELECT shard, r_name, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids, CAST(1 AS BIGINT) AS dpp_pruned
      |FROM g JOIN region ON shard = CAST(r_regionkey AS INT) AND r_regionkey < 4
      |GROUP BY shard, r_name ORDER BY shard""".stripMargin

  private val compactCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** COMPACTION — the small-files maintenance op every landing zone
    * accumulates toward: many small committed files (one per append job ×
    * write partition) consolidate into ONE shard-pure, id-sorted file per
    * shard, published as a new manifest version. Row content is untouched
    * (values are the oracle's business); the layout becomes the best case
    * for every later operation — shard stats exact per file, shard-keyed
    * deletes pure metadata, reads one partition per shard. Output names
    * use the `part-c` prefix, which the version-tail stream does NOT
    * treat as appended data — a tailer sees compaction as a no-op instead
    * of a full re-emit. Runs driver-side like the DELETE rewrite (a
    * control-plane op; a 100 TB deployment submits the per-shard merges
    * as a job — the manifest protocol is identical).
    *
    * RETENTION semantics (round 14 — the configurable horizon Iceberg
    * spells expire-snapshots): `retainVersions = N` keeps the last N
    * pre-compaction snapshots fully readable — their files, delete
    * vectors and change sidecars survive the sweep, and the new manifest
    * records the moved horizon (`"hz"`, [[horizonOf]]). Time travel,
    * change-feed ranges and tail positions OLDER than the horizon fail
    * loudly with the horizon in the message — never a raw FileNotFound
    * mid-job, never silently-wrong data. The default N = 0 is the
    * round-13 behavior: only the compacted snapshot remains.
    */
  /** `targetRowsPerFile`: 0 (default) keeps the one-file-per-shard
    * layout — right at harness sizes, WRONG at 100 TB, where a single
    * shard's consolidated file would be terabytes and one task would
    * read it. A positive target chunks each shard's id-sorted rows into
    * ≤target files, every chunk still shard-pure with exact doc-range
    * stats, so shard-grouped reads stay eligible (the V2 bucketing
    * machinery groups a shard's chunks into one task) and doc-range
    * pruning gets FINER — a point lookup reads one chunk, not the whole
    * shard. A production deployment always sets this (it is Delta
    * OPTIMIZE's maxFileSize, in rows).
    */
  /** Consolidate the table's files into shard-pure, doc-sorted chunks,
    * folding delete vectors. `binPack = false` (default) rewrites the
    * WHOLE live census — total clustering, the behavior every earlier
    * round pinned. `binPack = true` is Delta's `OPTIMIZE` shape: a file
    * that is already shard-pure, vector-free and WELL-SIZED (rows in
    * [⌈target/2⌉, target], the bin-packing band) — and locally owned —
    * is kept VERBATIM, name and bytes untouched; only the small, the
    * straddling, the vectored and the cloned-in files read and rewrite.
    * At 100 TB this is the difference between a maintenance pass that
    * rewrites the table and one that rewrites the day's ingest: cost is
    * O(unoptimized), and the steady state converges (yesterday's chunks
    * are all in-band, today's appends are not). Rewritten output smaller
    * than the band (a shard's ingest tail) packs again on a later pass —
    * Delta behaves the same way.
    */
  def compact(
      dir: String, retainVersions: Int = 0, targetRowsPerFile: Long = 0L,
      binPack: Boolean = false): Unit = {
    require(targetRowsPerFile <= Int.MaxValue.toLong,
      s"targetRowsPerFile $targetRowsPerFile exceeds the per-file row ceiling (2^31-1)")
    require(!binPack || targetRowsPerFile > 0L,
      "binPack compaction needs a targetRowsPerFile band")
    // base pinned at read; a commit landing mid-compaction (whose rows
    // would be silently un-compacted away) re-bases over blind appends
    // and aborts loudly on conflicting DML — data wins
    val (baseV, entries) = resolveBase(dir)
    if (entries.isEmpty) return
    requireForeignLive(dir, entries)
    val minKeep = if (binPack) (targetRowsPerFile + 1L) / 2L else Long.MaxValue
    val (kept, toRewrite) = entries.partition(e =>
      binPack && e.hasStats && e.shardMin == e.shardMax && !e.hasDeletes &&
        e.rows >= minKeep && e.rows <= targetRowsPerFile &&
        !isForeign(e.file))
    if (toRewrite.isEmpty) {
      // everything in band: no rewrite — but the caller's retention
      // request still stands (review fix: a steady-state table's nightly
      // `compact(retainVersions = N, binPack = true)` must still expire
      // old versions, or the files a previous pass superseded are held
      // forever). Publish a horizon-only commit (census unchanged)
      // exactly when advancing the horizon would RELEASE at least one
      // file — anything weaker leaks, anything stronger never converges
      // (each horizon commit is itself a version, so an idle table would
      // commit forever chasing its own tail).
      val hz = horizonOf(dir)
      val tagFloor = listTags(dir).map(_._2).minOption.getOrElse(Long.MaxValue)
      val wouldHz = math.min(tagFloor,
        math.max(hz, math.max(1L, (baseV + 1L) - retainVersions)))
      if (wouldHz > hz) {
        def refsOf(v: Long): Set[String] =
          (entriesAtVersion(dir, v)
            .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil)) ++
            manifestCdcAt(dir, v)).toSet
        val keepAfter = (wouldHz to baseV).flatMap(refsOf).toSet ++
          entries.flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil))
        val releasable = (math.max(1L, hz) until wouldHz).flatMap(refsOf).toSet -- keepAfter
        if (releasable.nonEmpty)
          publishCompaction(dir, baseV, entries, kept,
            compactCounter.incrementAndGet(), retainVersions)
      }
      return
    }
    val byShard = scala.collection.mutable.Map
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Long, String)]]
    toRewrite.foreach { e =>
      // live view: compaction FOLDS merge-on-read delete vectors — the
      // consolidated files carry only surviving rows and no vectors
      liveLines(dir, e).foreach { l =>
        val c = l.split("\t", 3)
        byShard.getOrElseUpdate(c(1).toInt, scala.collection.mutable.ArrayBuffer.empty)
          .append((c(0).toLong, l))
      }
    }
    val gen = compactCounter.incrementAndGet()
    // rewrites re-derive the per-column envelopes from the surviving
    // rows (schema pinned at the compaction base — older files simply
    // have shorter rows, whose missing cells the accumulator skips)
    val csTable = schemaAtVersion(dir, baseV)
    val newEntries = byShard.toSeq.sortBy(_._1).flatMap { case (shard, rows) =>
      val sorted = rows.sortBy(_._1)
      val chunks =
        if (targetRowsPerFile <= 0L) Seq(sorted.toSeq)
        else sorted.grouped(targetRowsPerFile.toInt).map(_.toSeq).toSeq
      chunks.zipWithIndex.map { case (chunk, k) =>
        val nf =
          if (chunks.size == 1) s"part-c$gen-s$shard.tsv"
          else s"part-c$gen-s$shard-$k.tsv"
        val tmp = new Path(dir, s"_tmp/$nf")
        val w = SinkFs.create(tmp)
        val bloom = DocBloom.empty()
        val csAcc = new SinkColStats.LineAcc(csTable)
        try chunk.foreach { case (d, l) =>
          DocBloom.insert(bloom, d); csAcc.addLine(l); w.write(l); w.write("\n")
        }
        finally w.close()
        SinkFs.moveOver(tmp, new Path(dir, nf))
        SinkEntry(nf, chunk.size.toLong, shard, shard, "",
          chunk.head._1, chunk.last._1, bf = DocBloom.encode(bloom),
          cs = csAcc.encode())
      }
    }
    // priorEntries = the FULL pinned base: the re-base intact check must
    // cover kept files too (an interloper's vector on a kept file would
    // otherwise be silently dropped by the carried-verbatim entry), and
    // the sweep spares them because the new manifest references them
    publishCompaction(dir, baseV, entries, kept ++ newEntries, gen, retainVersions)
  }

  /** Deterministic interleave hook for the re-base specs: runs ONCE just
    * before the publish flip (after inputs were read and rewritten) —
    * the window a concurrent commit would land in on a real deployment,
    * impossible to schedule reliably with threads alone.
    */
  private[sources] val compactBarrier =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** The shared publish tail of [[compact]] and [[compactZOrder]]: flip
    * the consolidated entries in with the moved horizon, then sweep ONLY
    * what no retained version references — data files, delete vectors
    * and change sidecars of versions at-or-above the horizon all
    * survive, so every promised snapshot/feed range stays exactly
    * readable (expiry below the horizon is enforced by the readers).
    *
    * CONFLICT RE-BASE (round 15): at 100 TB a compaction runs minutes to
    * hours — aborting it because a blind append landed mid-flight would
    * make maintenance unschedulable, so a lost flip race resolves like
    * Iceberg/Delta commit conflicts: re-read the current census, and if
    * every pinned INPUT entry is still present byte-identical (no DML
    * touched what this rewrite consolidated), the interloper commits are
    * pure additions — carry their entries forward verbatim and retry the
    * flip one version up. Anything that changed an input (vector growth,
    * CoW rewrite, truncate, restore, another compaction) still aborts
    * loudly: the consolidated files were derived from a snapshot that no
    * longer tells the truth. Data wins; maintenance adapts.
    */
  private def publishCompaction(
      dir: String, baseV: Long, priorEntries: Seq[SinkEntry],
      newEntries: Seq[SinkEntry], gen: Long, retainVersions: Int,
      opName: String = "compact"): Unit = {
    Option(compactBarrier.getAndSet(null)).foreach(_.apply())
    val oldHz = horizonOf(dir)
    // tags HOLD the horizon (Iceberg refs pin snapshots against
    // expiration): the horizon never moves past the oldest tagged
    // version, so tagged snapshots stay readable until dropped
    val tagFloor = listTags(dir).map(_._2).minOption.getOrElse(Long.MaxValue)
    val inputFiles = priorEntries.map(_.file).toSet
    var curBase = baseV
    var carried: Seq[SinkEntry] = Nil
    var attempt = 0
    var committed = false
    var newV = 0L
    var newHz = 0L
    while (!committed) {
      newV = curBase + 1
      newHz = math.min(tagFloor,
        math.max(horizonOf(dir), math.max(1L, newV - retainVersions)))
      try {
        writeManifestAt(dir, newEntries ++ carried,
          if (attempt == 0) s"c$gen" else s"c$gen-r$attempt", newV,
          horizon = Some(newHz), op = Some(opName))
        committed = true
      } catch {
        case ShardSinkConflict(_, v) =>
          attempt += 1
          val (nv, cur) = resolveBase(dir)
          val curByFile = cur.map(e => e.file -> e).toMap
          val inputsIntact =
            priorEntries.forall(e => curByFile.get(e.file).contains(e))
          if (!inputsIntact || attempt > 20)
            throw new IllegalStateException(
              s"ShardSink concurrent-writer conflict at $dir: version $v was " +
                s"committed while this $opName (base version $baseV) was in " +
                (if (!inputsIntact)
                  "flight and changed the operation's input files; the " +
                    "operation aborted loudly and the concurrent commit is " +
                    "intact — re-run against the new table state"
                 else "flight and kept conflicting through 20 re-base " +
                   "attempts; aborted loudly — re-run"))
          // pure additions: carry the interlopers' entries forward
          carried = cur.filterNot(e => inputFiles.contains(e.file))
          curBase = nv
      }
    }
    val keep: Set[String] = (newHz to newV).flatMap { v =>
      entriesAtVersion(dir, v)
        .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil)) ++
        manifestCdcAt(dir, v)
    }.toSet
    // EVERYTHING the newly-expired versions referenced is releasable,
    // not just the rewritten census (review follow-up: a file superseded
    // in an EARLIER retained version — a MOR-dropped data file, a
    // pre-compaction append a previous retaining pass held — leaked
    // forever once the horizon finally moved past it, because only
    // priorEntries were swept)
    val expiredRefs: Set[String] = (math.max(1L, oldHz) until newHz).flatMap { v =>
      entriesAtVersion(dir, v)
        .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil))
    }.toSet
    // foreign (cloned-in) files are the SOURCE's property: dropping the
    // entry is the whole removal — compacting a clone MATERIALIZES it
    deleteOwned(dir,
      (priorEntries.map(_.file).toSet ++ expiredRefs).toSeq.filterNot(keep))
    SinkFs.listFileNames(new Path(dir)).filter(f =>
      (f.startsWith("del-") && f.endsWith(".pos")) ||
        (f.startsWith("cdc-") && f.endsWith(".tsv")))
      .filterNot(keep)
      .foreach(f => SinkFs.delete(new Path(dir, f)))
  }

  /** Z-ORDER compaction (round 14): Delta's `OPTIMIZE … ZORDER BY
    * (shard, doc_id)` — MULTI-dimensional clustering so BOTH filter
    * dimensions prune files. Plain [[compact]] makes shard-pure files:
    * shard filters prune perfectly, but a doc_id range must read every
    * shard's file. Here rows sort by the Morton interleave of the shard
    * with the doc_id's position in its value range — both normalized to
    * 4 bits so neither dimension dominates the order (the classic
    * zero-padded interleave would let the wider doc_id drown the shard
    * bits) — then chunk into `rowsPerFile` files. Each file covers a
    * small shard-range × doc-range rectangle with exact per-file stats,
    * so a filter on EITHER column skips most files and a conjunction
    * skips multiplicatively. Same commit protocol, vector folding and
    * retention semantics as [[compact]]; `part-c` names keep the
    * tail/CDF no-op semantics. Runs driver-side like every maintenance
    * rewrite — a 100 TB deployment submits the sort as a job (one range
    * exchange over z-values); the manifest protocol is identical.
    */
  def compactZOrder(
      dir: String, rowsPerFile: Int, retainVersions: Int = 0): Unit = {
    val (baseV, entries) = resolveBase(dir)
    if (entries.isEmpty) return
    // same shallow-clone guard as plain compact: a vacuumed source must
    // surface as the named error, not a raw FileNotFound mid-rewrite
    requireForeignLive(dir, entries)
    val rows = entries.flatMap { e =>
      liveLines(dir, e).map { l =>
        val c = l.split("\t", 3); (c(0).toLong, c(1).toInt, l)
      }
    }
    val minDoc = rows.iterator.map(_._1).min
    val span = math.max(1L, rows.iterator.map(_._1).max - minDoc + 1L)
    def morton(doc: Long, shard: Int): Int = {
      val db = (((doc - minDoc) << 4) / span).toInt // doc quantile, 0..15
      var z = 0
      var i = 0
      while (i < 4) {
        z |= ((db >> i) & 1) << (2 * i + 1)
        z |= ((shard >> i) & 1) << (2 * i)
        i += 1
      }
      z
    }
    val gen = compactCounter.incrementAndGet()
    val csTable = schemaAtVersion(dir, baseV)
    val sorted = rows.sortBy { case (d, s, _) => (morton(d, s), d) }
    val newEntries = sorted.grouped(math.max(1, rowsPerFile)).zipWithIndex.map {
      case (chunk, i) =>
        val nf = s"part-c$gen-z$i.tsv"
        val tmp = new Path(dir, s"_tmp/$nf")
        val w = SinkFs.create(tmp)
        val bloom = DocBloom.empty()
        val csAcc = new SinkColStats.LineAcc(csTable)
        try chunk.foreach { case (d, _, l) =>
          DocBloom.insert(bloom, d); csAcc.addLine(l); w.write(l); w.write("\n")
        }
        finally w.close()
        SinkFs.moveOver(tmp, new Path(dir, nf))
        SinkEntry(nf, chunk.size.toLong,
          chunk.iterator.map(_._2).min, chunk.iterator.map(_._2).max, "",
          chunk.iterator.map(_._1).min, chunk.iterator.map(_._1).max,
          bf = DocBloom.encode(bloom), cs = csAcc.encode())
    }.toSeq
    publishCompaction(dir, baseV, entries, newEntries, gen, retainVersions,
      opName = "zorder")
  }

  /** GENERALIZED Z-ORDER — `OPTIMIZE … ZORDER BY (c1, c2, …)` for
    * ARBITRARY columns (round 15): interleaves 4-bit EXACT-RANK quantiles
    * of each key column (long/int/double/string; doc_id and shard
    * included) into a Morton code and rewrites the table into chunks
    * sorted by it. The payoff is the per-column envelopes
    * ([[SinkColStats]]): after clustering, every chunk's min/max for
    * each key column is TIGHT, so pushed predicates on ANY of them prune
    * files — the multi-dimensional locality Delta's ZORDER BY buys, here
    * feeding the manifest skip instead of parquet row groups. Rank
    * quantiles (not linear interpolation) make the bucketing skew-proof:
    * 16 equal-POPULATION buckets per dimension regardless of value
    * distribution. NULLs sort into bucket 0 (they reach no envelope, but
    * they cluster together so non-null chunks stay tight). Runs
    * driver-side like [[compactZOrder]] — a cluster deployment would
    * sample ranks and range-partition the rewrite as a job; the manifest
    * protocol under test is identical.
    */
  def compactZOrderBy(
      dir: String, rowsPerFile: Int, cols: Seq[String],
      retainVersions: Int = 0): Unit = {
    require(cols.nonEmpty && cols.size <= 8,
      s"ZORDER BY takes 1..8 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate ZORDER BY columns: $cols")
    val (baseV, entries) = resolveBase(dir)
    if (entries.isEmpty) return
    requireForeignLive(dir, entries)
    val table = schemaAtVersion(dir, baseV)
    val keyCols: Seq[(Int, Char)] = cols.map { c =>
      require(table.fieldNames.contains(c),
        s"ZORDER BY column '$c' not in ${table.fieldNames.mkString(",")}")
      val i = table.fieldIndex(c)
      val tag = SinkColStats.tagOf(table.fields(i).dataType).getOrElse(
        throw new IllegalArgumentException(
          s"ZORDER BY column '$c' has unsupported type ${table.fields(i).dataType}"))
      (i, tag)
    }
    val rows: Seq[(Array[String], String)] = entries.flatMap { e =>
      liveLines(dir, e).map(l => (l.split("\t", -1), l))
    }
    def cellOf(cells: Array[String], i: Int): String =
      if (i < cells.length && cells(i) != NullCell) cells(i) else null
    def ordOf(tag: Char): Ordering[String] = SinkColStats.orderFor(tag)
    // exact rank → 16 equal-population buckets per dimension
    val bucketMaps: Seq[scala.collection.Map[String, Int]] = keyCols.map { case (i, tag) =>
      val ds = rows.iterator.map(r => cellOf(r._1, i)).filter(_ != null)
        .toArray.distinct.sorted(ordOf(tag))
      ds.iterator.zipWithIndex
        .map { case (v, k) => v -> (k * 16 / math.max(1, ds.length)) }
        .toMap
    }
    val n = keyCols.length
    // Long-typed Morton code: 8 columns × 4 bits reaches bit 31, which
    // would be an Int's sign bit and invert the curve's upper half
    def zOf(cells: Array[String]): Long = {
      var z = 0L
      var c = 0
      while (c < n) {
        val cell = cellOf(cells, keyCols(c)._1)
        val b = if (cell == null) 0 else bucketMaps(c)(cell)
        var bit = 0
        while (bit < 4) {
          z |= ((b >> bit) & 1).toLong << (bit * n + c)
          bit += 1
        }
        c += 1
      }
      z
    }
    val gen = compactCounter.incrementAndGet()
    // doc_id tie-break keeps the layout deterministic (ids are unique)
    val sorted = rows.sortBy { case (cells, _) => (zOf(cells), cells(0).toLong) }
    val newEntries = sorted.grouped(math.max(1, rowsPerFile)).zipWithIndex.map {
      case (chunk, i) =>
        val nf = s"part-c$gen-z$i.tsv"
        val tmp = new Path(dir, s"_tmp/$nf")
        val w = SinkFs.create(tmp)
        val bloom = DocBloom.empty()
        val csAcc = new SinkColStats.LineAcc(table)
        try chunk.foreach { case (cells, l) =>
          DocBloom.insert(bloom, cells(0).toLong); csAcc.addLine(l)
          w.write(l); w.write("\n")
        }
        finally w.close()
        SinkFs.moveOver(tmp, new Path(dir, nf))
        SinkEntry(nf, chunk.size.toLong,
          chunk.iterator.map(_._1(1).toInt).min, chunk.iterator.map(_._1(1).toInt).max, "",
          chunk.iterator.map(_._1(0).toLong).min, chunk.iterator.map(_._1(0).toLong).max,
          bf = DocBloom.encode(bloom), cs = csAcc.encode())
    }.toSeq
    publishCompaction(dir, baseV, entries, newEntries, gen, retainVersions,
      opName = "zorder")
  }

  /** VACUUM — sweep files NO manifest version references: the garbage a
    * crashed or aborted job leaves (data files renamed into place whose
    * manifest flip never happened are invisible forever — correct, but
    * they hold disk). The reference set is every data file, delete
    * vector and change sidecar of EVERY manifest version still on disk
    * (compaction already swept what expired below the horizon), so
    * nothing any reader was promised can ever be vacuumed. Delta's
    * retention guard applies: only files whose modification time is at
    * least `olderThanMillis` old are candidates — a concurrent writer's
    * renamed-but-not-yet-committed files are younger and survive (7-day
    * default, Delta's; 0 sweeps everything and is only safe with no
    * write in flight — offline maintenance and tests). `_`-prefixed
    * names (manifests, `_tmp/`) are never candidates: temps are
    * attempt-unique and cleaned by their own writers/aborts. Returns the
    * swept names, oldest-lexicographic order.
    */
  def vacuum(dir: String, olderThanMillis: Long = 7L * 24 * 3600 * 1000L): Seq[String] = {
    val p = new Path(dir)
    val fs = SinkFs.fsOf(p)
    if (!fs.exists(p)) return Seq.empty
    val statuses = fs.listStatus(p).toSeq.filter(_.isFile)
    val versions = statuses.map(_.getPath.getName).collect { case ManifestV(n) => n.toLong }
    val refd: Set[String] = versions.flatMap { v =>
      entriesAtVersion(dir, v)
        .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil)) ++
        manifestCdcAt(dir, v)
    }.toSet
    // segment files NO version's manifest list references — a crashed
    // writer's orphans (written before the list flip that never
    // happened), or a conflict loser whose in-handler cleanup died. The
    // age guard protects an IN-FLIGHT commit's fresh segments exactly as
    // it protects its renamed data files. `.tmp` siblings of a crashed
    // mid-segment write are never referenced either, so the same rule
    // sweeps them.
    val refdSegs: Set[String] =
      versions.flatMap(v => segmentRefsAt(dir, v).map(_.name)).toSet
    val now = System.currentTimeMillis()
    val swept = statuses.filter { st =>
      val f = st.getPath.getName
      val sweepable =
        if (f.startsWith("_manifest.seg-")) !refdSegs.contains(f)
        else !f.startsWith("_") && !refd.contains(f)
      sweepable && now - st.getModificationTime >= olderThanMillis
    }.map(_.getPath.getName).sorted
    swept.foreach(f => SinkFs.delete(new Path(dir, f)))
    swept
  }

  /** Driver-checked VACUUM (round 14): two Appends, then two planted
    * orphans impersonating a crashed job's leftovers (a renamed data
    * file whose manifest flip never happened, and its delete vector).
    * `vacuum(dir, 0)` must sweep exactly the two orphans and nothing
    * else — the live rollup afterwards is byte-identical to the
    * committed windows, with the sweep count and the remaining-orphan
    * count pinned in the same checked row.
    */
  def vacuumReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("vac:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkvac_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(lo: Long, hi: Long): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 1200L); append(1200L, 2000L)
    // a crashed job's trace: renamed into place, never manifested
    Seq("part-bcrashed-0.tsv" -> "9999\t9\torphan row", "del-crashed.pos" -> "0")
      .foreach { case (n, content) =>
        val w = SinkFs.create(new Path(dir.getPath, n))
        try { w.write(content); w.write("\n") } finally w.close()
      }
    val swept = vacuum(dir.getPath, olderThanMillis = 0L)
    val left = SinkFs.listFileNames(new Path(dir.getPath))
      .count(f => f.contains("crashed"))
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(doc_id)").as("xor_ids"))
      .withColumn("n_swept", lit(swept.size.toLong))
      .withColumn("n_orphans_left", lit(left.toLong))
  }

  val vacuumReportSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, bit_xor(doc_id) AS xor_ids,
      |       CAST(2 AS BIGINT) AS n_swept, CAST(0 AS BIGINT) AS n_orphans_left
      |FROM range(0, 2000) t(doc_id)""".stripMargin

  /** Driver-checked COMPACTION (round 13): three fragmented Appends,
    * compact, read back — the rollup must be BYTE-IDENTICAL to the
    * uncompacted oracle (compaction may touch layout, never values), and
    * the emitted layout report pins one-file-per-shard with exact stats.
    */
  def compactRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("compact:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcompact_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(lo: Long, hi: Long): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 500L); append(500L, 1200L); append(1200L, 2000L)
    compact(dir.getPath)
    val entries = committedEntries(dir.getPath)
    // layout invariants folded into the CHECKED row: every file shard-pure
    // with exact stats, one file per shard
    val shardPure = entries.forall(e => e.hasStats && e.shardMin == e.shardMax)
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"))
      .withColumn("n_files", lit(entries.size.toLong))
      .withColumn("shard_pure", lit(shardPure))
      .orderBy("shard")
  }

  val compactRoundtripSql: String =
    """SELECT CAST(doc_id % 16 AS INT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(16 AS BIGINT) AS n_files, TRUE AS shard_pure
      |FROM range(0, 2000) t(doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** Driver-checked Z-ORDER compaction (round 14): three fragmented
    * Appends, `compactZOrder` into 16 rectangle files, read back — the
    * per-shard rollup must be BYTE-IDENTICAL to the uncompacted oracle
    * (layout may change, values never), and the pruning contract is
    * folded into the checked row as booleans: a shard-only filter, a
    * doc-range-only filter AND their conjunction must each plan at most
    * half / half / a quarter of the files — the multi-dimensional
    * skipping plain shard-pure compaction cannot give (its doc_id
    * filters read every shard's file).
    */
  def zorderRoundtrip(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("zorder:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkzord_$sfx")
    SinkFs.deleteRecursively(dir)
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false") // planned files == rdd partitions
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 500L); append(500L, 1200L); append(1200L, 2000L)
    compactZOrder(dir.getPath, rowsPerFile = 125) // 2000 rows -> 16 files
    val nFiles = committedEntries(dir.getPath).size
    def read = s.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
    val shardPlanned = read.where(col("shard") === 2).rdd.getNumPartitions
    val docPlanned = read.where(col("doc_id") >= 500L && col("doc_id") < 1000L)
      .rdd.getNumPartitions
    val bothPlanned = read.where(col("shard") === 2
      && col("doc_id") >= 500L && col("doc_id") < 1000L).rdd.getNumPartitions
    read
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), expr("bit_xor(doc_id)").as("xor_ids"))
      .withColumn("n_files", lit(nFiles.toLong))
      .withColumn("shard_prunes", lit(shardPlanned * 2 <= nFiles))
      .withColumn("doc_prunes", lit(docPlanned * 2 <= nFiles))
      .withColumn("both_prune_more", lit(bothPlanned * 4 <= nFiles))
      .orderBy("shard")
  }

  val zorderRoundtripSql: String =
    """SELECT CAST(doc_id % 16 AS INT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids, CAST(16 AS BIGINT) AS n_files,
      |       TRUE AS shard_prunes, TRUE AS doc_prunes, TRUE AS both_prune_more
      |FROM range(0, 2000) t(doc_id)
      |GROUP BY 1 ORDER BY shard""".stripMargin

  /** Driver-checked TABLE HISTORY (round 13): the lakehouse
    * `DESCRIBE HISTORY` analogue over the retained version log — one row
    * per manifest version with its committed row total and the row DELTA
    * vs the previous version (the per-commit audit an ingest dashboard
    * reads). Three Appends of known windows make every cell
    * deterministic; the oracle re-derives the cumulative totals from the
    * same windows.
    */
  /** DESCRIBE HISTORY under the hash gate (extended round 14 with the
    * per-commit OPERATION column — Delta's `operation` field): every
    * commit path now stamps its `"op"` marker, so the version log reads
    * as an audit trail — append, delete, alter, restore, compact here;
    * truncate/replaceWhere/rewrite/delta/streamingUpdate/clone/
    * addConstraint/dropConstraint/zorder on their paths. Rows stay
    * manifest-derived (no data IO): a restore's +200 and a compaction's
    * ±0 are visible next to their operation names.
    */
  def historyReport(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("history:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkhist_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_h", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_h.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_h.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_h.docs_h").append()
    append(0L, 500L)     // v1 append  +500
    append(500L, 1200L)  // v2 append  +700
    s.sql("DELETE FROM graft_h.docs_h WHERE doc_id >= 1000") // v3 delete -200
    s.sql("ALTER TABLE graft_h.docs_h ADD COLUMN note STRING") // v4 alter ±0
    s.sql("ALTER TABLE graft_h.docs_h SET TBLPROPERTIES ('graft.restore' = '2')") // v5 +200
    val dir = new java.io.File(root, "docs_h").getPath
    compact(dir, retainVersions = 9) // v6 compact ±0
    import s.implicits._
    history(dir).toDF("version", "op", "n_rows", "rows_added").orderBy("version")
  }

  /** (version, operation, total rows, rows added vs previous version)
    * per retained manifest — driver-tiny (one row per commit); pre-op
    * manifests read as "write".
    */
  def history(dir: String): Seq[(Long, String, Long, Long)] = {
    val current = currentManifestVersion(dir)
    // ONE manifest parse per version: the previous total folds forward
    var prev = 0L
    (1L to current).map { v =>
      val rows = entriesAtVersion(dir, v).map(_.rows).sum
      val row = (v, manifestOpAt(dir, v).getOrElse("write"), rows, rows - prev)
      prev = rows
      row
    }
  }

  val historyReportSql: String =
    """SELECT * FROM (VALUES
      |  (CAST(1 AS BIGINT), 'append',  CAST(500 AS BIGINT),  CAST(500 AS BIGINT)),
      |  (CAST(2 AS BIGINT), 'append',  CAST(1200 AS BIGINT), CAST(700 AS BIGINT)),
      |  (CAST(3 AS BIGINT), 'delete',  CAST(1000 AS BIGINT), CAST(-200 AS BIGINT)),
      |  (CAST(4 AS BIGINT), 'alter',   CAST(1000 AS BIGINT), CAST(0 AS BIGINT)),
      |  (CAST(5 AS BIGINT), 'restore', CAST(1200 AS BIGINT), CAST(200 AS BIGINT)),
      |  (CAST(6 AS BIGINT), 'compact', CAST(1200 AS BIGINT), CAST(0 AS BIGINT)))
      |  t(version, op, n_rows, rows_added)
      |ORDER BY version""".stripMargin

  /** Driver-checked STATS-BASED FILE SKIPPING (round 13): four Appends
    * land narrow shard windows (the per-source ingest layout a landing
    * zone actually has), then a read filtered on `shard IN (…) AND
    * doc_id < …` goes through the pushed-filter prune — the shard
    * conjunct drops every file whose manifest shard range cannot match
    * BEFORE any data IO, the doc_id conjunct is residual and applied
    * row-level by Spark. Values re-derived by DuckDB from `range()`;
    * the pruning itself (planned-partition counts, conservative
    * stats-unknown behavior) is pinned in ShardSinkSpec where the
    * session's partition count is controlled.
    */
  def statsPrune(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("statsprune:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkprune_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(loShard: Int, hiShard: Int): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "20000").option("numPartitions", "4").load()
        .where(col("shard") >= loShard && col("shard") < hiShard)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0, 4); append(4, 8); append(8, 12); append(12, 16)
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .where(col("shard").isin(2, 7, 13) && col("doc_id") < 18000)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"),
        sum(when(substring(col("body"), 1, 1) === "a", 1L).otherwise(0L)).as("n_body_a"))
      .orderBy("shard")
  }

  val statsPruneSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard,
      |         md5(CAST(doc_id AS VARCHAR)) AS body
      |  FROM range(0, 20000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids,
      |       CAST(SUM(CASE WHEN substring(body, 1, 1) = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_body_a
      |FROM g WHERE shard IN (2, 7, 13) AND doc_id < 18000
      |GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked DOC-RANGE FILE SKIPPING (round 13): four Appends
    * land consecutive doc_id windows (the time-ordered crawl-batch
    * layout a landing zone naturally has), then a read filtered on a
    * doc_id interval AND a shard set goes through BOTH prunes — files
    * outside the interval hull or the shard set are dropped before any
    * data IO; values re-derived by DuckDB from `range()`. Partition
    * counts and the statistics report are pinned in ShardSinkSpec.
    */
  def rangePrune(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("rangeprune:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkrange_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(lo: Long, hi: Long): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "20000").option("numPartitions", "4").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(0L, 5000L); append(5000L, 10000L); append(10000L, 15000L); append(15000L, 20000L)
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .where(col("doc_id") >= 6000L && col("doc_id") < 13000L && col("shard") < 8)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(doc_id)").as("xor_ids"))
      .orderBy("shard")
  }

  val rangePruneSql: String =
    """WITH g AS (
      |  SELECT doc_id, CAST(doc_id % 16 AS INT) AS shard FROM range(0, 20000) t(doc_id))
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |       bit_xor(doc_id) AS xor_ids
      |FROM g WHERE doc_id >= 6000 AND doc_id < 13000 AND shard < 8
      |GROUP BY shard ORDER BY shard""".stripMargin

  /** Driver-checked METADATA-ONLY COUNT (round 13): `SELECT COUNT(*)`
    * answered from the manifest's live-row bookkeeping with ZERO data IO
    * ([[ShardSinkCountScan]]) — including after a merge-on-read DELETE
    * (the live counts must be maintained, not the physical ones) and
    * against a time-travelled version. The plan shape (count scan, one
    * partition, no data files) is pinned in ShardSinkSpec.
    */
  def countMeta(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("countmeta:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkcount_$sfx")
    SinkFs.deleteRecursively(root)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_cnt", classOf[ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cnt.root", root.getPath)
    s.conf.set("spark.sql.catalog.graft_cnt.delete.mode", "merge-on-read")
    def append(lo: Long, hi: Long): Unit =
      s.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .writeTo("graft_cnt.docs_cnt").append()
    append(0L, 800L); append(800L, 2000L)
    s.sql("DELETE FROM graft_cnt.docs_cnt WHERE doc_id >= 1500")
    val dir = new java.io.File(root, "docs_cnt").getPath
    val live = s.read.format("graft.sources.ShardSinkSource")
      .option("path", dir).load()
      .agg(expr("count(*)").as("n_live"))
    val atV2 = s.read.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("versionAsOf", "2").load()
      .agg(expr("count(*)").as("n_v2"))
    live.crossJoin(atV2)
  }

  val countMetaSql: String =
    """SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM range(0, 2000) t(doc_id)
      |        WHERE NOT doc_id >= 1500) AS n_live,
      |       CAST(2000 AS BIGINT) AS n_v2""".stripMargin

  /** Driver-checked metadata-only MIN/MAX (round 14): the companion to
    * `q_dsv2_count_meta` — an unfiltered, ungrouped
    * COUNT/MIN/MAX(doc_id, shard) rollup answers straight from the
    * manifest's per-file stat ranges, ZERO data IO (Iceberg answers
    * these from its manifests the same way). Eligibility is conservative
    * — any delete vector anywhere refuses the MIN/MAX push (the vector
    * may have killed exactly the extreme row) and the plan falls back to
    * the row scan, spec-pinned. Two appends of known windows make every
    * cell a literal for the oracle.
    */
  def minMaxMeta(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sfx = java.security.MessageDigest.getInstance("MD5")
      .digest(("minmax:" + sfDir).getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sinkmm_$sfx")
    SinkFs.deleteRecursively(dir)
    def append(lo: Long, hi: Long): Unit =
      spark.read.format("graft.sources.DocGenSource")
        .option("numDocs", "2000").option("numPartitions", "2").load()
        .where(col("doc_id") >= lo && col("doc_id") < hi)
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir.getPath)
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    append(100L, 900L); append(900L, 1700L)
    spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir.getPath).load()
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        min(col("shard")).as("min_shard"), max(col("shard")).as("max_shard"))
  }

  val minMaxMetaSql: String =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
      |       CAST(MIN(doc_id % 16) AS INT) AS min_shard,
      |       CAST(MAX(doc_id % 16) AS INT) AS max_shard
      |FROM range(100, 1700) t(doc_id)""".stripMargin

  /** Committed (file, rows) pairs, from the manifest only. Missing
    * manifest = no committed data (an in-flight or crashed job), never an
    * error.
    */
  def committedFilesWithRows(dir: String): Seq[(String, Long)] =
    committedEntries(dir).map(e => (e.file, e.rows))

  /** Full manifest entries incl. per-file shard statistics. Missing
    * stats (pre-stats manifests, recovered entries) parse as unknown.
    */
  def committedEntries(dir: String): Seq[SinkEntry] =
    // one retry, for the LEGACY file only: versioned manifests are
    // retained forever, but a writer's post-flip cleanup deletes a legacy
    // unversioned `_manifest.json` we may have just resolved —
    // re-listing finds the versioned successor
    try committedEntriesOnce(dir)
    catch { case _: java.io.FileNotFoundException => committedEntriesOnce(dir) }

  private def committedEntriesOnce(dir: String): Seq[SinkEntry] = {
    val mf = manifestPath(dir)
    if (!SinkFs.exists(mf)) Seq.empty
    else parseManifestBlob(dir, SinkFs.readString(mf))
  }

  /** TWO-LEVEL MANIFESTS (round 14) — the layout that survives millions
    * of files: above [[segmentTarget]] entries, a version's blob stops
    * inlining the file list and instead references immutable SEGMENT
    * files (`"segs":[{"f":"_manifest.seg-<tag>-<k>.json","n":N},…]`,
    * Iceberg's manifest-list shape). Commit cost becomes O(changed):
    * [[writeSegments]] REUSES every previous segment whose entry set is
    * untouched (a blind append rewrites nothing — it adds one new
    * segment; a vector growth rewrites exactly the segment holding that
    * entry), so a million-file table's append writes a few KB, not the
    * whole census. Segments are `_`-prefixed (exempt from vacuum and
    * data-file classification), written BEFORE the list flip (a lost
    * race orphans only invisible litter), immutable once referenced
    * (cacheable forever — [[segmentCache]]), and format-mixable per
    * version: a table crosses the threshold whenever a commit does,
    * and old single-blob versions keep reading. The default target
    * keeps harness-scale tables single-blob; [[setSegmentTarget]] is
    * both the production tuning knob and the test hook.
    */
  private val segmentTargetRef = new java.util.concurrent.atomic.AtomicInteger(512)
  def setSegmentTarget(n: Int): Unit = {
    require(n >= 1, s"segment target must be >= 1, got $n")
    segmentTargetRef.set(n)
  }
  def segmentTarget: Int = segmentTargetRef.get()

  /** A manifest-list entry: the segment's file name, its entry count,
    * and an ENVELOPE — the min/max of the per-file shard/doc stats over
    * every entry inside (Iceberg's manifest-list partition summaries).
    * The envelope lets [[entriesAsOfPruned]] skip reading WHOLE segments
    * a pushed filter rules out: a 2,000-segment table answers a pruned
    * scan by opening the handful of matching segments, not the census —
    * O(matching) driver IO instead of O(files/segmentTarget). Sentinels
    * (-1) mean unknown (an entry without stats inside, or a pre-envelope
    * manifest): unknown always reads — conservative, same contract as
    * [[SinkEntry]].
    */
  private[sources] final case class SegmentRef(
      name: String, n: Int, shardMin: Int = -1, shardMax: Int = -1,
      docMin: Long = -1L, docMax: Long = -1L, bf: String = "",
      cs: String = "") {
    def hasStats: Boolean = shardMin >= 0
    def hasDocStats: Boolean = docMax >= 0L
    def mayContainShard(shards: Set[Int]): Boolean =
      !hasStats || shards.exists(v => v >= shardMin && v <= shardMax)
    def mayContainDocRange(lo: Long, hi: Long): Boolean =
      !hasDocStats || (docMin <= hi && docMax >= lo)
    /** Whole-SEGMENT point skipping: the ref bloom is the bitwise OR of
      * the member files' blooms — a sought id definitely absent from the
      * union is absent from every member, so the segment goes unread.
      * On a compacted stripe layout (every segment's doc RANGE overlaps
      * every other's) this is what keeps `doc_id = K` at O(1 segment)
      * driver IO instead of O(segments). Absent = read, as everywhere.
      */
    def mayContainDocPoints(points: Set[Long]): Boolean =
      bf.isEmpty || points.exists(v => DocBloom.mayContain(bf, v))
    /** Whole-SEGMENT per-column skipping: the ref's merged envelope
      * ([[SinkColStats.mergeEnvelopes]], all-or-silent) answers pushed
      * payload predicates before the segment is even read — the same
      * driver-IO win the shard/doc envelope buys, for `lang = 'pt'`
      * instead of `shard = 3`. Absent = read, as everywhere.
      */
    def mayMatchCols(preds: Seq[SinkColStats.ColPred]): Boolean =
      SinkColStats.mayMatch(cs, preds)
    def json: String = {
      val stats = if (hasStats) s""","s0":$shardMin,"s1":$shardMax""" else ""
      val docs = if (hasDocStats) s""","d0":$docMin,"d1":$docMax""" else ""
      val bloom = if (bf.nonEmpty) s""","b":"$bf"""" else ""
      val cse = if (cs.nonEmpty) s""","cs":"$cs"""" else ""
      s"""{"f":"$name","n":$n$stats$docs$bloom$cse}"""
    }
  }

  private val SegRef =
    ("""\{"f":"([^"]+)","n":(\d+)(?:,"s0":(-?\d+),"s1":(-?\d+))?""" +
      """(?:,"d0":(-?\d+),"d1":(-?\d+))?(?:,"b":"([^"]*)")?""" +
      """(?:,"cs":"([^"]*)")?\}""").r

  private def parseSegRefs(blob: String): Seq[SegmentRef] =
    SegRef.findAllMatchIn(blob).map { m =>
      val (s0, s1) =
        if (m.group(3) == null) (-1, -1) else (m.group(3).toInt, m.group(4).toInt)
      val (d0, d1) =
        if (m.group(5) == null) (-1L, -1L) else (m.group(5).toLong, m.group(6).toLong)
      SegmentRef(m.group(1), m.group(2).toInt, s0, s1, d0, d1,
        if (m.group(7) == null) "" else m.group(7),
        if (m.group(8) == null) "" else m.group(8))
    }.toSeq

  private[sources] def segmentRefsAt(dir: String, version: Long): Seq[SegmentRef] =
    if (version <= 0L) Seq.empty
    else {
      val p = new Path(dir, s"_manifest.v$version.json")
      if (!SinkFs.exists(p)) Seq.empty
      else {
        val blob = SinkFs.readString(p)
        if (!blob.contains("\"segs\":[")) Seq.empty
        else parseSegRefs(blob)
      }
    }

  // immutable-once-referenced: safe to cache across the JVM. LRU at the
  // cap (access-ordered LinkedHashMap) — a full clear would force a
  // re-read STORM on the next query of a table sitting just above the
  // cap, which is exactly the design-point table the layout exists for.
  private val segmentCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), Seq[SinkEntry]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Seq[SinkEntry]]): Boolean =
        size() > 4096
    })
  /** Physical segment-file reads (cache misses) — the observability hook
    * the envelope-pruning spec pins its "whole segments were skipped"
    * assertion on.
    */
  private[sources] val segmentReadCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test/observability hook: the shard set most recently delivered to a
    * sink scan via [[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]]
    * — lets specs and the checked query pin that DPP actually fired (the
    * pruning is invisible in the final rows by design).
    */
  val lastRuntimeFilter = new java.util.concurrent.atomic.AtomicReference[Set[Int]](null)

  /** Data TSV files physically opened by sink readers — the "how many
    * files did this query actually read" proof runtime pruning and
    * point-lookup skipping assertions pin (local-mode observability; on
    * a cluster the same signal is the scan's input-file metrics).
    */
  val dataFileReadCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private[sources] def clearSegmentCacheForTest(): Unit = segmentCache.clear()
  /** Executor-callable segment read for the DISTRIBUTED metadata-table
    * scan (round 16): segments are immutable once referenced, so a
    * reader on any host sees exactly the snapshot the driver planned.
    */
  private[sources] def readSegmentEntries(dir: String, name: String): Seq[SinkEntry] =
    readSegment(dir, name)

  private def readSegment(dir: String, name: String): Seq[SinkEntry] = {
    val key = (dir, name)
    val cached = segmentCache.get(key)
    if (cached != null) cached
    else {
      // racing reads of the same immutable file are idempotent — no lock
      segmentReadCount.incrementAndGet()
      val es = parseEntries(SinkFs.readString(new Path(dir, name)))
      segmentCache.put(key, es)
      es
    }
  }

  private def entryJson(e: SinkEntry): String = {
    val stats = if (e.hasStats) s""","s0":${e.shardMin},"s1":${e.shardMax}""" else ""
    val docs = if (e.hasDocStats) s""","d0":${e.docMin},"d1":${e.docMax}""" else ""
    val dv = if (e.hasDeletes) s""","dv":"${e.dv}"""" else ""
    val bf = if (e.bf.nonEmpty) s""","bf":"${e.bf}"""" else ""
    // per-column envelopes ([[SinkColStats]]): string bounds are base64
    // inside the token, so the value is regex-safe by construction
    val cs = if (e.cs.nonEmpty) s""","cs":"${e.cs}"""" else ""
    s"""{"file":"${e.file}","rows":${e.rows}$stats$docs$dv$bf$cs}"""
  }

  /** The envelope of a segment's entries: set only when EVERY entry
    * carries the stat (a partial envelope could claim a range an
    * unknown entry exceeds — same all-or-silent rule as the reported
    * column statistics).
    */
  private def envelopeOf(es: Seq[SinkEntry]): (Int, Int, Long, Long) = {
    val (s0, s1) =
      if (es.nonEmpty && es.forall(_.hasStats))
        (es.map(_.shardMin).min, es.map(_.shardMax).max)
      else (-1, -1)
    val (d0, d1) =
      if (es.nonEmpty && es.forall(_.hasDocStats))
        (es.map(_.docMin).min, es.map(_.docMax).max)
      else (-1L, -1L)
    (s0, s1, d0, d1)
  }

  /** Write one fresh segment: body to a `.tmp` sibling, then a
    * [[SinkFs.moveFresh]] ELECTION into the final name — never an
    * overwrite-create. Combined with the per-attempt nonce in the name
    * this makes "immutable once referenced" a guarantee, not a
    * convention: a colliding writer (two JVMs whose per-process counters
    * generated the same tag) fails its link with EEXIST instead of
    * silently clobbering a segment a committed version already
    * references.
    */
  private def writeSegmentFile(
      dir: String, tag: String, nonce: String, k: Int,
      entries: Seq[SinkEntry]): SegmentRef = {
    val name = s"_manifest.seg-$tag-$nonce-$k.json"
    val tmp = new Path(dir, s"$name.tmp")
    val w = SinkFs.create(tmp)
    try w.write(entries.map(entryJson).mkString("""{"files":[""", ",", "]}"))
    finally w.close()
    SinkFs.moveFresh(tmp, new Path(dir, name))
    val (s0, s1, d0, d1) = envelopeOf(entries)
    SegmentRef(name, entries.size, s0, s1, d0, d1, DocBloom.union(entries.map(_.bf)),
      SinkColStats.mergeEnvelopes(entries.map(_.cs)))
  }

  /** The O(changed) commit core: previous segments whose entries are ALL
    * still wanted are referenced as-is; partially-surviving segments
    * rewrite with just their survivors; entries no previous segment
    * covers (the commit's additions) chunk into fresh segments.
    * Returns the refs (reused + fresh, with envelopes) AND the fresh
    * names alone — a lost manifest race must delete exactly the fresh
    * ones (they are attempt-unique and referenced by nothing; the reused
    * names belong to committed history).
    */
  private def writeSegments(
      dir: String, desired: Seq[SinkEntry], tag: String,
      version: Long): (Seq[SegmentRef], Seq[String]) = {
    val target = segmentTargetRef.get()
    // attempt-unique nonce: segment names must be collision-proof across
    // JVMs/restarts (compaction/DDL tags come from per-process counters)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val desiredSet = desired.toSet
    val covered = scala.collection.mutable.Set.empty[SinkEntry]
    val out = Seq.newBuilder[SegmentRef]
    val fresh = Seq.newBuilder[String]
    var k = 0
    segmentRefsAt(dir, version - 1).foreach { ref =>
      val es = readSegment(dir, ref.name)
      val kept = es.filter(e => desiredSet.contains(e) && !covered.contains(e))
      if (kept.nonEmpty) {
        if (kept.size == es.size) {
          // reuse as-is; recompute the envelope (and the union bloom,
          // and the per-column envelope) so pre-envelope segments gain
          // them the first time any commit re-references them
          val (s0, s1, d0, d1) = envelopeOf(es)
          out += SegmentRef(ref.name, es.size, s0, s1, d0, d1,
            DocBloom.union(es.map(_.bf)),
            SinkColStats.mergeEnvelopes(es.map(_.cs)))
        } else {
          k += 1
          val r = writeSegmentFile(dir, tag, nonce, k, kept)
          out += r
          fresh += r.name
        }
        covered ++= kept
      }
    }
    desired.filterNot(covered.contains).grouped(target).foreach { chunk =>
      k += 1
      val r = writeSegmentFile(dir, tag, nonce, k, chunk)
      out += r
      fresh += r.name
    }
    (out.result(), fresh.result())
  }

  /** Parse a version blob in EITHER format: inline `"files"` or
    * segment-referencing `"segs"`.
    */
  private def parseManifestBlob(dir: String, blob: String): Seq[SinkEntry] =
    parseManifestBlobPruned(dir, blob, None, None)

  /** Blob parse with ENVELOPE PRUNING: a segment whose ref-level
    * envelope cannot intersect the pushed shard/doc predicates is
    * skipped WITHOUT being read — the scale payoff of the two-level
    * layout (see [[SegmentRef]]). Surviving segments' entries (and
    * inline blobs) then prune per-entry as before, so the result is
    * byte-identical to filtering the full census.
    */
  private def parseManifestBlobPruned(
      dir: String, blob: String,
      pruneShards: Option[Set[Int]], pruneDocs: Option[(Long, Long)],
      prunePoints: Option[Set[Long]] = None,
      pruneCols: Seq[SinkColStats.ColPred] = Nil): Seq[SinkEntry] = {
    def perEntry(es: Seq[SinkEntry]): Seq[SinkEntry] = es
      .filter(e => pruneShards.forall(e.mayContainShard))
      .filter(e => pruneDocs.forall { case (lo, hi) => e.mayContainDocRange(lo, hi) })
      .filter(e => prunePoints.forall(e.mayContainDocPoints))
      // generic per-column envelopes ([[SinkColStats]]): entry-level only
      // (segment refs keep their shard/doc envelope; surviving segments'
      // entries prune here, after the segment read)
      .filter(e => e.mayMatchCols(pruneCols))
    if (blob.contains("\"segs\":["))
      perEntry(parseSegRefs(blob)
        .filter(r => pruneShards.forall(r.mayContainShard))
        .filter(r => pruneDocs.forall { case (lo, hi) => r.mayContainDocRange(lo, hi) })
        // union-bloom segment skipping: on stripe layouts whose doc
        // RANGES all overlap, this is the level that makes a point
        // lookup O(matching segments) driver IO
        .filter(r => prunePoints.forall(r.mayContainDocPoints))
        // per-column envelope: `lang = 'pt'` skips whole segments too
        .filter(r => r.mayMatchCols(pruneCols))
        .flatMap(r => readSegment(dir, r.name)))
    else perEntry(parseEntries(blob))
  }

  // minimal parse of {"files":[{"file":"...","rows":N[,"s0":M,"s1":K]
  // [,"d0":A,"d1":B][,"dv":"..."]},...]} — names are writer-chosen
  // (part-*.tsv / del-*.pos), never user input
  private def parseEntries(json: String): Seq[SinkEntry] =
    ("""\{"file":"([^"]*\.tsv)","rows":(\d+)(?:,"s0":(-?\d+),"s1":(-?\d+))?""" +
      """(?:,"d0":(-?\d+),"d1":(-?\d+))?(?:,"dv":"([^"]*)")?(?:,"bf":"([^"]*)")?""" +
      """(?:,"cs":"([^"]*)")?\}""").r
      .findAllMatchIn(json)
      .map { m =>
        val (s0, s1) =
          if (m.group(3) == null) (-1, -1) else (m.group(3).toInt, m.group(4).toInt)
        val (d0, d1) =
          if (m.group(5) == null) (-1L, -1L) else (m.group(5).toLong, m.group(6).toLong)
        SinkEntry(m.group(1), m.group(2).toLong, s0, s1,
          if (m.group(7) == null) "" else m.group(7), d0, d1,
          if (m.group(8) == null) "" else m.group(8),
          if (m.group(9) == null) "" else m.group(9))
      }.toSeq

  def committedFiles(dir: String): Seq[String] = committedFilesWithRows(dir).map(_._1)

  /** The base a commit builds on: the current version, resolved ONCE,
    * with the entries of exactly that version. Every flip path pins this
    * pair at read time and renames to base+1 — any interleaved commit is
    * then GUARANTEED to collide on the fresh-name rename ([[moveFresh]]),
    * closing the old TOCTOU window where a re-list between the
    * conflict check and the rename could land a stale entry list one
    * version past the interloper and silently drop its files.
    */
  private[sources] def resolveBase(dir: String): (Long, Seq[SinkEntry]) = {
    val v = currentManifestVersion(dir)
    (v, if (v > 0L) entriesAtVersion(dir, v) else committedEntries(dir))
  }

  /** A lost manifest-version race: some other commit renamed `version`
    * into place first. Blind appends catch this and retry on a re-read
    * base (they commute with every commit — Delta's append-only conflict
    * rule); read-modify-write commits (DML, truncate, compaction) abort
    * loudly instead, because their read set may no longer hold.
    */
  private[sources] final case class ShardSinkConflict(dir: String, version: Long)
    extends RuntimeException(
      s"manifest version $version at $dir was committed by a concurrent writer")

  /** Shared manifest flip core: body to a temp name, then ONE atomic
    * rename to the CALLER-PINNED fresh version name — visibility is all
    * or nothing, a crash anywhere leaves the previous version (and
    * therefore the whole committed table) intact, and a concurrent
    * writer racing to the same version loses the rename (dst exists) and
    * surfaces as [[ShardSinkConflict]]. Superseded versions are retained
    * as the commit log; only a legacy unversioned manifest is cleaned up.
    *
    * SCALE: below [[segmentTarget]] entries the version is ONE JSON
    * blob enumerating every live file — right at harness counts. Above
    * it, the blob becomes a manifest LIST referencing immutable SEGMENT
    * files with per-commit reuse (Iceberg's two-level layout,
    * implemented in [[writeSegments]]), so a million-file table's
    * append writes O(changed), not O(table). The protocol — pin-base,
    * fresh-name rename, carried-forward table state — is identical in
    * both layouts; state keys always live in the list blob.
    */
  private[sources] def writeManifestAt(
      dir: String, files: Seq[SinkEntry], tag: String, version: Long,
      cdc: Option[String] = None, horizon: Option[Long] = None,
      schema: Option[String] = None, op: Option[String] = None,
      constraints: Option[String] = None): Unit = {
    val mTmp = new Path(dir, s"_manifest.$tag.tmp")
    val cdcKey = cdc.map(f => s""""cdc":"$f",""").getOrElse("")
    // per-commit operation marker (NOT table state — never carried
    // forward): a RESTORE commit's file-set diff is all genuine row
    // change (no physical rewrites ride a restore), so the change feed
    // derives it with plain-diff semantics
    val opKey = op.map(o => s""""op":"$o",""").getOrElse("")
    // retention horizon, schema and CHECK constraints are table state:
    // carried forward from the previous version unless this commit moves
    // them (a retaining compaction / an ALTER TABLE)
    val hz = horizon.orElse(manifestHzAt(dir, version - 1))
    val hzKey = hz.map(h => s""""hz":$h,""").getOrElse("")
    val sch = schema.orElse(manifestSchemaAt(dir, version - 1))
    val schKey = sch.map(s => s""""schema":"$s",""").getOrElse("")
    val ck = constraints.orElse(manifestCkAt(dir, version - 1))
    val ckKey = ck.map(c => s""""ck":"$c",""").getOrElse("")
    val head = s"""{"ts":${commitTimeMillis()},$opKey$hzKey$schKey$ckKey$cdcKey"""
    // above the segment target the blob references immutable segment
    // files instead of inlining the census — commit cost O(changed),
    // see the TWO-LEVEL MANIFESTS scaladoc
    var freshSegs: Seq[String] = Nil
    val json =
      if (files.size <= segmentTargetRef.get())
        files.map(entryJson).mkString(head + """"files":[""", ",", "]}")
      else {
        val (refs, fresh) = writeSegments(dir, files, tag, version)
        freshSegs = fresh
        refs.map(_.json).mkString(head + """"segs":[""", ",", "]}")
      }
    val w = SinkFs.create(mTmp)
    try w.write(json) finally w.close()
    val dest = new Path(dir, s"_manifest.v$version.json")
    try SinkFs.moveFresh(mTmp, dest)
    catch {
      case _: IllegalArgumentException =>
        SinkFs.delete(mTmp)
        // this attempt's fresh segments are attempt-unique and referenced
        // by nothing — delete them here, or a conflict-heavy workload
        // (the 20-retry append loop at segment scale) accumulates
        // unreclaimable litter (vacuum also sweeps unreferenced segments
        // as a backstop, for the crash case this handler can't see)
        freshSegs.foreach(n => SinkFs.delete(new Path(dir, n)))
        throw ShardSinkConflict(dir, version)
    }
    // O(1) discovery for every subsequent read/commit (advisory — see
    // [[currentManifestVersion]]); racing writers may interleave hint
    // writes in either order, the forward probe absorbs it
    writeHint(dir, version)
    SinkFs.delete(new Path(dir, "_manifest.json"))
  }

  /** Read-modify-write flip for callers that pinned their base with
    * [[resolveBase]]: renames to exactly base+1 and converts a lost race
    * into a loud abort — the conservative default for DML, truncate and
    * compaction, whose rewritten content was derived from the pinned
    * base and may be stale under the interloper's version. No files are
    * lost either way: the interloper's commit is untouched, and this
    * commit's artifacts stay invisible (never manifested).
    */
  private[sources] def flipFromBase(
      dir: String, baseVersion: Long, files: Seq[SinkEntry], tag: String,
      cdc: Option[String] = None, horizon: Option[Long] = None,
      schema: Option[String] = None, op: Option[String] = None,
      constraints: Option[String] = None): Unit =
    try writeManifestAt(dir, files, tag, baseVersion + 1, cdc, horizon, schema, op,
      constraints)
    catch {
      case ShardSinkConflict(_, v) =>
        throw new IllegalStateException(
          s"ShardSink concurrent-writer conflict at $dir: version $v was " +
            s"committed while this operation (base version $baseVersion) was " +
            "in flight; the operation aborted loudly and the concurrent " +
            "commit is intact — re-run against the new table state")
    }

  /** Deterministic interleave hook for the DML re-base specs: runs ONCE
    * just before the flip attempt — same pattern as [[compactBarrier]].
    */
  private[sources] val dmlBarrier =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](null)

  /** DML CONFLICT RE-BASE (round 15): the row-level twin of
    * [[publishCompaction]]'s resolution — Delta/Iceberg conflict
    * semantics for copy-on-write DELETE, merge-on-read DELETE and
    * filtered OVERWRITE. A lost flip race re-reads the census and
    * commits one version up iff the interleaved commits provably
    * commute with this operation:
    *
    *   1. every pinned BASE entry is still present byte-identical (no
    *      interloper touched a file this operation read, kept, rewrote
    *      or vectored — a vector on a kept file would be silently
    *      resurrected by the carried entry otherwise);
    *   2. every ADDED entry is PROVABLY DISJOINT from the DML predicate
    *      by manifest statistics — its shard range, doc envelope or
    *      doc-id bloom rules out every row the predicate matches (the
    *      same sound-superset derivations the read-side prune uses, so
    *      "pruned" ⇒ "no row matches"). A serial execution (append
    *      first, then this DML) would have left the appended rows
    *      untouched, so carrying them forward verbatim IS the serial
    *      result. Stats-less or possibly-matching files abort loudly:
    *      the appended rows might have been deleted in the serial
    *      order, and silently keeping them would un-serialize history;
    *   3. the CHECK-constraint set is unchanged (a constraint added
    *      mid-flight validated existing rows only — rows this commit
    *      lands escaped both that scan and this writer's pinned
    *      enforcement) and, when this commit carries a schema change,
    *      nobody else changed the schema meanwhile.
    *
    * Anything else aborts loudly with the conservative message — data
    * wins, the DML re-runs against the new state.
    */
  private[sources] def flipDmlRebase(
      dir: String, baseV: Long, baseEntries: Seq[SinkEntry],
      out: Seq[SinkEntry], tag: String, filters: Array[Filter],
      cdc: Option[String] = None, op: Option[String] = None,
      schema: Option[String] = None): Unit = {
    Option(dmlBarrier.getAndSet(null)).foreach(_.apply())
    val ps = shardPruneSet(filters)
    val pd = docPruneRange(filters)
    val pp = docPointSet(filters)
    val baseFiles = baseEntries.map(_.file).toSet
    var curBase = baseV
    var carried: Seq[SinkEntry] = Nil
    var attempt = 0
    var committed = false
    while (!committed) {
      try {
        writeManifestAt(dir, out ++ carried,
          if (attempt == 0) tag else s"$tag-r$attempt", curBase + 1,
          cdc, schema = schema, op = op)
        committed = true
      } catch {
        case ShardSinkConflict(_, v) =>
          attempt += 1
          val (nv, cur) = resolveBase(dir)
          val curByFile = cur.map(e => e.file -> e).toMap
          val inputsIntact =
            baseEntries.forall(e => curByFile.get(e.file).contains(e))
          val added = cur.filterNot(e => baseFiles.contains(e.file))
          // disjointness must be PROVEN per added file; an entry no
          // dimension can rule out may hold matching rows — abort
          val disjoint = added.forall(e =>
            ps.exists(ss => !e.mayContainShard(ss)) ||
              pd.exists { case (lo, hi) => !e.mayContainDocRange(lo, hi) } ||
              pp.exists(s => !e.mayContainDocPoints(s)))
          val ckSame = constraintsAt(dir, nv) == constraintsAt(dir, baseV)
          val schemaSafe = schema.isEmpty ||
            manifestSchemaAt(dir, nv) == manifestSchemaAt(dir, baseV)
          if (!inputsIntact || !disjoint || !ckSame || !schemaSafe || attempt > 20)
            throw new IllegalStateException(
              s"ShardSink concurrent-writer conflict at $dir: version $v was " +
                s"committed while this ${op.getOrElse("DML")} (base version " +
                s"$baseV) was in flight and " +
                (if (!inputsIntact) "changed the operation's input files"
                 else if (!disjoint)
                   "added files that may match the operation's predicate " +
                     "(manifest statistics cannot prove them disjoint)"
                 else if (!ckSame) "changed the table's CHECK constraints"
                 else if (!schemaSafe) "changed the table schema"
                 else "kept conflicting through 20 re-base attempts") +
                "; the operation aborted loudly and the concurrent commit " +
                "is intact — re-run against the new table state")
          carried = added
          curBase = nv
      }
    }
  }


  /** The committed file entries AS OF a specific manifest version (0 =
    * before any commit). Versions are retained (see [[writeManifestAt]]),
    * so the diff of consecutive versions is the commit's file delta.
    */
  def entriesAtVersion(
      dir: String, version: Long,
      pruneShards: Option[Set[Int]] = None,
      pruneDocs: Option[(Long, Long)] = None,
      prunePoints: Option[Set[Long]] = None,
      pruneCols: Seq[SinkColStats.ColPred] = Nil): Seq[SinkEntry] =
    if (version <= 0L) Seq.empty
    else {
      val p = new Path(dir, s"_manifest.v$version.json")
      if (!SinkFs.exists(p)) Seq.empty
      else parseManifestBlobPruned(dir, SinkFs.readString(p), pruneShards, pruneDocs,
        prunePoints, pruneCols)
    }

  private val ManifestTs = """^\{"ts":(\d+)""".r

  /** The commit timestamp (epoch millis) a manifest version recorded, if
    * any — pre-round-14 manifests carry none.
    */
  def manifestTsAt(dir: String, version: Long): Option[Long] = {
    val p = new Path(dir, s"_manifest.v$version.json")
    if (!SinkFs.exists(p)) None
    else ManifestTs.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1).toLong)
  }

  private val ManifestHz = """"hz":(\d+)""".r

  /** The RETENTION HORIZON a manifest version records: the oldest
    * version still readable (time travel, change feed, tail). Moved only
    * by a retaining [[compact]]; carried forward by every other commit;
    * absent (= 1, everything readable) until the first compaction.
    */
  def manifestHzAt(dir: String, version: Long): Option[Long] = {
    val p = new Path(dir, s"_manifest.v$version.json")
    if (!SinkFs.exists(p)) None
    else ManifestHz.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1).toLong)
  }

  /** The CURRENT retention horizon: reads older than this version must
    * fail loudly instead of hitting missing files mid-job.
    */
  def horizonOf(dir: String): Long =
    manifestHzAt(dir, currentManifestVersion(dir)).getOrElse(1L)

  /** SCHEMA EVOLUTION (round 14): the table schema is PER-VERSION state,
    * recorded in the manifest (`"schema":"name:type,…"`) and carried
    * forward by every commit; absent = the original 3-column layout.
    * Columns map to TSV positions by schema order, so evolution is pure
    * metadata: `ALTER TABLE … ADD COLUMN` flips a manifest with the
    * widened schema and touches NO data file — pre-evolution files are
    * simply shorter rows, null-filled at read time; a literal `\N` cell
    * is an explicit null in post-evolution files. The first three
    * columns (doc_id, shard, body) are load-bearing (sharding, stats,
    * delete predicates) and cannot be renamed or retyped; added columns
    * can be renamed (positional mapping is unaffected). Iceberg does the
    * same thing with field IDs; positions suffice here because columns
    * are never dropped or reordered.
    */
  private val ManifestSchema = """"schema":"([^"]+)"""".r
  private[sources] val NullCell = "\\N"

  /** CHECK constraints (round 14 — Delta ADD CONSTRAINT semantics, see
    * [[SinkConstraint]]): table state in the manifest, `"ck":"name=pred
    * [;name=pred…]"`, carried forward by every commit like schema and
    * the retention horizon. Names are identifiers; predicates are split
    * at the FIRST `=` so comparison `=`s inside them are safe, and may
    * not contain `;`, `"`, `\` or control characters (validated at ADD).
    * An empty value (all constraints dropped) writes `"ck":""`, which
    * parses as no constraints while still overriding the carry-forward.
    */
  private val ManifestCk = """"ck":"([^"]+)"""".r

  def manifestCkAt(dir: String, version: Long): Option[String] = {
    val p = new Path(dir, s"_manifest.v$version.json")
    if (!SinkFs.exists(p)) None
    else ManifestCk.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1))
  }

  /** The named CHECK constraints in force AS OF a manifest version. */
  def constraintsAt(dir: String, version: Long): Seq[(String, String)] =
    if (version <= 0L) Seq.empty
    else manifestCkAt(dir, version).toSeq.flatMap(_.split(";").toSeq.map { c =>
      val cut = c.indexOf('=')
      (c.substring(0, cut), c.substring(cut + 1))
    })

  def currentConstraints(dir: String): Seq[(String, String)] =
    constraintsAt(dir, currentManifestVersion(dir))

  private def ckString(cks: Seq[(String, String)]): String =
    cks.map { case (n, p) => s"$n=$p" }.mkString(";")

  /** `ALTER TABLE … SET TBLPROPERTIES ('graft.constraint.<name>' =
    * '<pred>')`: admit the predicate (grammar + column/type resolution,
    * [[SinkConstraint.compile]]), then VALIDATE EXISTING ROWS with a
    * distributed Spark job over the connector scan — Delta's ADD
    * CONSTRAINT runs exactly this full-table check — refusing the DDL if
    * any live row violates (predicate IS FALSE; NULL passes). The flip
    * is read-modify-write on the pinned base: a concurrent commit aborts
    * it loudly, so a row landing mid-validation can never slip under the
    * new constraint.
    */
  private[sources] def addConstraint(dir: String, name: String, pred: String): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid constraint name '$name'")
    require(!pred.exists(c => c == ';' || c == '"' || c == '\\' || c.isControl),
      s"""constraint predicates may not contain ';', '"', '\\' or control chars""")
    val (baseV, entries) = resolveBase(dir)
    val table = schemaAtVersion(dir, baseV)
    SinkConstraint.compile(pred, table) // admit grammar + refs before any IO
    val cur = constraintsAt(dir, baseV)
    require(!cur.exists(_._1 == name),
      s"CHECK constraint $name already exists on $dir (UNSET it first)")
    if (entries.nonEmpty) {
      val spark = org.apache.spark.sql.SparkSession.active
      val violations = spark.read.format("graft.sources.ShardSinkSource")
        .option("path", dir).option("versionAsOf", baseV.toString).load()
        .where(org.apache.spark.sql.functions.expr(s"NOT ($pred)"))
        .limit(1).count()
      require(violations == 0L,
        s"cannot add CHECK constraint $name: existing rows violate ($pred)")
    }
    flipFromBase(dir, baseV, entries, s"ckadd${alterCounter.incrementAndGet()}",
      constraints = Some(ckString(cur :+ ((name, pred)))), op = Some("addConstraint"))
  }

  private[sources] def dropConstraint(dir: String, name: String): Unit = {
    val (baseV, entries) = resolveBase(dir)
    val cur = constraintsAt(dir, baseV)
    require(cur.exists(_._1 == name), s"no CHECK constraint $name on $dir")
    flipFromBase(dir, baseV, entries, s"ckdrop${alterCounter.incrementAndGet()}",
      constraints = Some(ckString(cur.filterNot(_._1 == name))), op = Some("dropConstraint"))
  }

  private def typeNameOf(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType => "long"
    case org.apache.spark.sql.types.IntegerType => "int"
    case org.apache.spark.sql.types.DoubleType => "double"
    case org.apache.spark.sql.types.StringType => "string"
    case other => throw new IllegalArgumentException(
      s"unsupported shard sink column type ${other.simpleString} " +
        "(supported: bigint, int, double, string)")
  }

  private def typeOfName(s: String): org.apache.spark.sql.types.DataType = s match {
    case "long" => org.apache.spark.sql.types.LongType
    case "int" => org.apache.spark.sql.types.IntegerType
    case "double" => org.apache.spark.sql.types.DoubleType
    case "string" => org.apache.spark.sql.types.StringType
    case other => throw new IllegalArgumentException(s"unknown shard sink column type $other")
  }

  private[sources] def schemaString(st: StructType): String =
    st.fields.map(f => s"${f.name}:${typeNameOf(f.dataType)}").mkString(",")

  /** NAME-based write resolution for mergeSchema writes: every `expect`
    * column maps to its position in the incoming frame (or -1 =
    * null-fill, legal because evolved columns are nullable); incoming
    * columns beyond `expect` are admitted as nullable evolution. Core
    * columns must be present with exact types; known columns must match
    * their declared type exactly (type WIDENING stays an explicit ALTER —
    * a write that silently widened the table would invert the
    * reader/writer contract). Returns the TARGET schema and the
    * per-target-column source index.
    */
  private[sources] def resolveWriteSchema(
      expect: StructType, incoming: StructType): (StructType, Array[Int]) = {
    val inIdx = incoming.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
    require(inIdx.size == incoming.fields.length,
      s"duplicate column names in write schema ${incoming.simpleString}")
    DocGen.schema.fields.foreach { cf =>
      val i = inIdx.getOrElse(cf.name, -1)
      require(i >= 0, s"shard sink write must include core column '${cf.name}'")
      require(incoming.fields(i).dataType == cf.dataType,
        s"core column '${cf.name}' must be ${cf.dataType.simpleString}, " +
          s"got ${incoming.fields(i).dataType.simpleString}")
    }
    expect.fields.foreach { f =>
      inIdx.get(f.name).foreach { i =>
        require(incoming.fields(i).dataType == f.dataType,
          s"write column '${f.name}': ${incoming.fields(i).dataType.simpleString} " +
            s"does not match table type ${f.dataType.simpleString} " +
            "(type widening is an explicit ALTER TABLE)")
      }
    }
    val known = expect.fieldNames.toSet
    val extras = incoming.fields.filterNot(f => known.contains(f.name))
    extras.foreach(f => typeNameOf(f.dataType)) // admission: supported types only
    val target = StructType(expect.fields ++ extras.map(f =>
      org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = true)))
    (target, target.fields.map(f => inIdx.getOrElse(f.name, -1)))
  }

  /** Serialize one row to its TSV line in TABLE-schema column order;
    * `idx(i)` is the physical position of table column i in the incoming
    * row. Null added-column cells write the `\N` sentinel; string values
    * are tab/newline-guarded (and must not BE the sentinel).
    */
  private[sources] def serializeRow(
      row: org.apache.spark.sql.catalyst.InternalRow,
      idx: Array[Int], table: StructType): String = {
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < idx.length) {
      if (i > 0) sb.append('\t')
      val f = table.fields(i)
      // idx(i) < 0 = column absent from the incoming frame (a mergeSchema
      // write missing an evolved column): null-fill, legal for i >= 3
      if (i >= 3 && (idx(i) < 0 || row.isNullAt(idx(i)))) sb.append(NullCell)
      else f.dataType match {
        case org.apache.spark.sql.types.LongType => sb.append(row.getLong(idx(i)))
        case org.apache.spark.sql.types.IntegerType => sb.append(row.getInt(idx(i)))
        case org.apache.spark.sql.types.DoubleType => sb.append(row.getDouble(idx(i)))
        case _ =>
          val s = row.getUTF8String(idx(i)).toString
          require(!s.exists(c => c == '\t' || c == '\n' || c == '\r'),
            s"shard sink ${f.name} values may not contain tab/newline")
          require(s != NullCell,
            s"shard sink ${f.name} values may not be the literal null sentinel $NullCell")
          sb.append(s)
      }
      i += 1
    }
    sb.toString
  }

  private def parseSchemaString(s: String): StructType =
    StructType(s.split(",").zipWithIndex.map { case (c, i) =>
      val Array(n, t) = c.split(":")
      org.apache.spark.sql.types.StructField(n, typeOfName(t), nullable = i >= 3)
    })

  def manifestSchemaAt(dir: String, version: Long): Option[String] = {
    val p = new Path(dir, s"_manifest.v$version.json")
    if (!SinkFs.exists(p)) None
    else ManifestSchema.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1))
  }

  /** The table schema AS OF a manifest version (pre-commit/legacy = the
    * original 3-column layout) — time travel reads old snapshots under
    * their OLD schema, spec-pinned.
    */
  def schemaAtVersion(dir: String, version: Long): StructType =
    if (version <= 0L) DocGen.schema
    else manifestSchemaAt(dir, version).map(parseSchemaString).getOrElse(DocGen.schema)

  def tableSchema(dir: String): StructType =
    schemaAtVersion(dir, currentManifestVersion(dir))

  private val alterCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** `ALTER TABLE … ADD COLUMN`: pure metadata — the widened schema flips
    * in on the same entries; no data file is touched. New columns are
    * nullable (pre-evolution rows read as null) and append after the
    * existing ones.
    */
  private[sources] def addColumn(
      dir: String, name: String, dt: org.apache.spark.sql.types.DataType): Unit = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid column name '$name'")
    typeNameOf(dt) // reject unsupported types before touching anything
    val (baseV, entries) = resolveBase(dir)
    val cur = schemaAtVersion(dir, baseV)
    require(!cur.fieldNames.contains(name), s"column $name already exists")
    // a re-used name (rename-then-re-add) must not inherit the old
    // column's envelopes: the new column is all-null for existing rows
    val scrubbed = entries.map(e =>
      if (e.cs.isEmpty) e else e.copy(cs = SinkColStats.dropIn(e.cs, name)))
    flipFromBase(dir, baseV, scrubbed, s"alter${alterCounter.incrementAndGet()}",
      op = Some("alter"), schema = Some(schemaString(cur.add(name, dt, nullable = true))))
  }

  /** Widen an ADDED column's type (pure metadata): int→bigint,
    * int/bigint→double. Old cells reparse under the wider type — "5" is
    * a valid long and a valid double — so no data file is touched.
    * Narrowing and core-column retypes refuse loudly.
    */
  private[sources] def widenColumn(
      dir: String, name: String, to: org.apache.spark.sql.types.DataType): Unit = {
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val (baseV, entries) = resolveBase(dir)
    val cur = schemaAtVersion(dir, baseV)
    val idx = cur.fieldIndex(name)
    require(idx >= 3,
      s"column $name is part of the fixed (doc_id, shard, body) core and cannot be retyped")
    val ok = (cur.fields(idx).dataType, to) match {
      case (IntegerType, LongType) | (IntegerType, DoubleType)
           | (LongType, DoubleType) => true
      case (a, b) => a == b
    }
    require(ok,
      s"unsupported type change for $name: ${cur.fields(idx).dataType.simpleString} -> " +
        s"${to.simpleString} (only widenings int->bigint, int/bigint->double)")
    val widened = StructType(cur.fields.updated(idx, cur.fields(idx).copy(dataType = to)))
    flipFromBase(dir, baseV, entries, s"alter${alterCounter.incrementAndGet()}",
      op = Some("alter"), schema = Some(schemaString(widened)))
  }

  /** Rename an ADDED column (pure metadata; positional mapping
    * unaffected). The original three columns are load-bearing — sharding,
    * stats, delete predicates key on them — and refuse to move.
    */
  private[sources] def renameColumn(dir: String, from: String, to: String): Unit = {
    require(to.matches("[A-Za-z_][A-Za-z0-9_]*"), s"invalid column name '$to'")
    val (baseV, entries) = resolveBase(dir)
    val cur = schemaAtVersion(dir, baseV)
    val idx = cur.fieldIndex(from) // throws a clear error when absent
    require(idx >= 3,
      s"column $from is part of the fixed (doc_id, shard, body) core and cannot be renamed")
    require(!cur.fieldNames.contains(to), s"column $to already exists")
    // Delta blocks renaming a column a CHECK constraint references: the
    // stored predicate names it, so the rename would break enforcement
    constraintsAt(dir, baseV).foreach { case (n, p) =>
      require(!SinkConstraint.references(p).contains(from),
        s"column $from is referenced by CHECK constraint $n; drop it first")
    }
    val renamed = StructType(cur.fields.updated(idx, cur.fields(idx).copy(name = to)))
    // the envelopes describe POSITIONS; carry them to the new name so a
    // renamed column keeps pruning and the old name carries nothing
    val carried = entries.map(e =>
      if (e.cs.isEmpty) e else e.copy(cs = SinkColStats.renameIn(e.cs, from, to)))
    flipFromBase(dir, baseV, carried, s"alter${alterCounter.incrementAndGet()}",
      op = Some("alter"), schema = Some(schemaString(renamed)))
  }

  private val ManifestOp = """"op":"([^"]+)"""".r

  /** The per-commit operation marker a manifest version recorded
    * ("restore" today), if any. Unlike hz/schema this is NOT table
    * state and is never carried forward.
    */
  def manifestOpAt(dir: String, version: Long): Option[String] = {
    val p = new Path(dir, s"_manifest.v$version.json")
    if (!SinkFs.exists(p)) None
    else ManifestOp.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1))
  }

  private val restoreCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** RESTORE the table to an earlier snapshot (Delta `RESTORE TABLE …
    * VERSION AS OF`, Iceberg rollback): a NEW commit whose entry list
    * and schema are the target version's — history is preserved, so a
    * restore is itself undoable and shows in the version log (marked
    * `"op":"restore"`, which also lets the change feed derive its row
    * changes exactly: a restore performs no physical rewrites, so every
    * file-set difference is genuine row change). Read-modify-write:
    * pins its base and aborts loudly on a concurrent commit. Refuses
    * below the retention horizon, and refuses when any restored file or
    * delete vector was already released by a later copy-on-write
    * rewrite / compaction (retention 0 sweeps replaced files at commit)
    * — never manifests dangling entries. SQL spelling:
    * `ALTER TABLE t SET TBLPROPERTIES ('graft.restore' = '<version>')`.
    */
  private[sources] def restore(dir: String, toVersion: Long): Unit = {
    val (baseV, _) = resolveBase(dir)
    require(toVersion >= 1L && toVersion <= baseV,
      s"cannot restore $dir to version $toVersion: the table is at version " +
        s"$baseV (restorable range is 1..$baseV)")
    val hz = horizonOf(dir)
    require(toVersion >= hz,
      s"cannot restore $dir to version $toVersion: the retention horizon is " +
        s"$hz (versions below it were released by compaction)")
    val entries = entriesAtVersion(dir, toVersion)
    val missing = entries
      .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil))
      .filterNot(f => SinkFs.exists(new Path(dir, f)))
    require(missing.isEmpty,
      s"cannot restore $dir to version $toVersion: ${missing.sorted.mkString(", ")} " +
        "released by a later rewrite or compaction (compact with retainVersions " +
        "to keep snapshots restorable)")
    flipFromBase(dir, baseV, entries, s"restore${restoreCounter.incrementAndGet()}",
      schema = Some(schemaString(schemaAtVersion(dir, toVersion))),
      op = Some("restore"),
      // Delta RESTORE reverts table METADATA with the data: the CHECK
      // constraint set becomes the target version's (an empty set writes
      // the "" override, not a carry-forward of the pre-restore set)
      constraints = Some(ckString(constraintsAt(dir, toVersion))))
  }

  /** A manifest entry naming a file OUTSIDE this table's directory — the
    * mark of a SHALLOW CLONE ([[cloneShallow]]): clone entries carry the
    * source's files as absolute paths, which every read site resolves
    * correctly because `new Path(dir, child)` ignores `dir` for an
    * absolute child. Foreign files are the SOURCE's property: physical
    * cleanup (compaction sweeps, CoW/truncate/replaceWhere obsolete
    * deletion) must drop them from the manifest WITHOUT deleting bytes —
    * Delta's shallow-clone remove semantics.
    */
  private[sources] def isForeign(name: String): Boolean =
    name.startsWith("/") || name.contains("://")

  /** Physical deletion that respects clone boundaries: never touches a
    * foreign (cloned-in) file.
    */
  private[sources] def deleteOwned(dir: String, names: Iterable[String]): Unit =
    names.filterNot(isForeign).foreach(f => SinkFs.delete(new Path(dir, f)))

  /** A CLONED-IN file must still exist at plan time: the source table's
    * VACUUM or zero-retention compaction can release files a shallow
    * clone references (the documented shallow-clone hazard — Delta's
    * too). Local manifest-committed files are trusted (this table's own
    * retention controls them); foreign ones get an explicit existence
    * check so the failure is a named error, never a raw FileNotFound
    * mid-job. Driver-side, clones only, a stat per foreign file.
    */
  private[sources] def requireForeignLive(dir: String, entries: Seq[SinkEntry]): Unit = {
    val missing = entries
      .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil))
      .filter(isForeign)
      .filterNot(f => SinkFs.exists(new Path(f)))
    require(missing.isEmpty,
      s"shallow clone at $dir references source files that no longer exist " +
        s"(${missing.sorted.mkString(", ")}) — the source was VACUUMed or " +
        "compacted; re-clone, or compact the clone right after cloning to " +
        "materialize it")
  }

  private val cloneCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** SHALLOW CLONE (round 14) — Delta `CREATE TABLE … SHALLOW CLONE src
    * [VERSION AS OF v]`: a NEW table whose first commit references the
    * source snapshot's data files (and delete vectors) by absolute path —
    * ZERO data copied, metadata only. From then on the tables diverge
    * independently: DML on the clone copies-on-writes or vectors locally
    * (new files land in the CLONE's directory; dropped foreign entries
    * are manifest-only removals — the source's bytes are never touched),
    * and commits to the source are invisible to the clone (it pinned a
    * version, not a reference). Compacting the clone MATERIALIZES it
    * (all entries become local; the source dependency ends). The clone
    * starts its OWN history at v1 (op = "clone"): its time travel,
    * retention and tags are independent of the source's. Schema and
    * CHECK constraints come from the cloned snapshot, like RESTORE.
    * SQL spelling (Spark has no CLONE statement; Delta ships one via a
    * parser extension; this catalog's tables exist implicitly, so the
    * spelling is property-DDL like restore/tags): `ALTER TABLE <cat>.<t>
    * SET TBLPROPERTIES ('graft.clone' = '<src-dir>[@<version-or-tag>]')`
    * on an EMPTY table. Documented hazard (Delta's too): VACUUM,
    * compaction or copy-on-write rewrites on the SOURCE release files
    * the clone references (this sink has no tombstone-retention window —
    * replaced files delete at commit) — clone reads then fail with a
    * named error ([[requireForeignLive]]); merge-on-read DML and appends
    * on the source are clone-safe. Compact the clone to end the
    * dependency.
    */
  /** Resolve a `graft.clone` spec to (source dir, pinned version). The
    * explicit companion property `graft.clone.version` wins and leaves
    * the whole spec as the path (immune to '@' in directory names);
    * otherwise the `<path>@<version-or-tag>` shorthand applies ONLY when
    * the prefix before the last '@' is a real (committed) table — a
    * path that merely CONTAINS '@' clones at latest.
    */
  private[sources] def parseCloneSpec(
      spec: String, explicit: Option[String]): (String, Option[Long]) = {
    def abs(p: String) = if (p.contains("://")) p else new java.io.File(p).getAbsolutePath
    explicit match {
      case Some(v) =>
        val src = abs(spec)
        (src, Some(if (v.nonEmpty && v.forall(_.isDigit)) v.toLong else resolveTag(src, v)))
      case None =>
        spec.lastIndexOf('@') match {
          case -1 => (spec, None)
          case at =>
            val prefix = abs(spec.substring(0, at))
            val ref = spec.substring(at + 1)
            if (ref.nonEmpty && currentManifestVersion(prefix) >= 1L)
              (prefix, Some(
                if (ref.forall(_.isDigit)) ref.toLong else resolveTag(prefix, ref)))
            else (spec, None) // the '@' belongs to the path itself
        }
    }
  }

  private[sources] def cloneShallow(
      srcSpec: String, dst: String, version: Option[Long] = None): Unit = {
    // a RELATIVE source would manifest entries that are neither foreign
    // (no leading '/') nor valid local names — normalize local paths to
    // absolute so isForeign/deleteOwned/requireForeignLive classify them
    val src =
      if (srcSpec.contains("://")) srcSpec
      else new java.io.File(srcSpec).getAbsolutePath
    require(new Path(src).toString != new Path(dst).toString,
      s"cannot clone $src onto itself")
    require(currentManifestVersion(dst) == 0L,
      s"clone target $dst already has commits (shallow clone creates a NEW table)")
    val srcCur = currentManifestVersion(src)
    require(srcCur >= 1L, s"cannot clone $src: the source has no committed version")
    val srcV = version.getOrElse(srcCur)
    require(srcV >= 1L && srcV <= srcCur,
      s"cannot clone $src at version $srcV: the source is at version $srcCur")
    require(srcV >= horizonOf(src),
      s"cannot clone $src at version $srcV: the source's retention horizon is " +
        s"${horizonOf(src)} (versions below it were released by compaction)")
    val entries = entriesAtVersion(src, srcV)
    requireSnapshotLive(src, srcV, entries)
    val cloned = entries.map { e =>
      e.copy(
        file = new Path(src, e.file).toString,
        dv = if (e.hasDeletes) new Path(src, e.dv).toString else "")
    }
    writeManifestAt(dst, cloned, s"clone${cloneCounter.incrementAndGet()}", 1L,
      schema = Some(schemaString(schemaAtVersion(src, srcV))),
      constraints = Some(ckString(constraintsAt(src, srcV))),
      op = Some("clone"))
  }

  /** TAGS (round 14) — Iceberg's named snapshot refs: a tag is an
    * immutable name → version pin stored as its own `_tag.<name>` file
    * (created with the fresh-name primitive, so two racers creating the
    * same tag elect one winner; re-tagging requires an explicit drop).
    * Like Iceberg refs pin snapshots against expiration, a tag HOLDS
    * the retention horizon: compaction never moves the horizon past the
    * oldest tagged version, so every tagged snapshot stays exactly
    * readable until its tag is dropped. Readable via
    * `VERSION AS OF 'name'` (string refs share Spark's version-travel
    * spelling) and `option("tag", name)`; `graft.restore` accepts a tag
    * name too. Names must not be all digits (that spelling is a version
    * number).
    */
  private[sources] def createTag(dir: String, name: String, version: Long): Unit = {
    require(name.matches("[A-Za-z0-9_-]+") && !name.forall(_.isDigit),
      s"invalid tag name '$name' (letters/digits/_/- and not all digits)")
    val current = currentManifestVersion(dir)
    require(version >= 1L && version <= current,
      s"cannot tag version $version at $dir: the table is at version $current")
    require(version >= horizonOf(dir),
      s"cannot tag version $version at $dir: below the retention horizon " +
        s"${horizonOf(dir)} (already released by compaction)")
    val tmp = new Path(dir, s"_tag.$name.tmp")
    val w = SinkFs.create(tmp)
    try w.write(s"""{"v":$version}""") finally w.close()
    try SinkFs.moveFresh(tmp, new Path(dir, s"_tag.$name"))
    catch {
      case _: IllegalArgumentException =>
        SinkFs.delete(tmp)
        throw new IllegalStateException(
          s"tag '$name' already exists at $dir (tags are immutable — drop it first)")
    }
  }

  private[sources] def dropTag(dir: String, name: String): Unit = {
    val p = new Path(dir, s"_tag.$name")
    require(SinkFs.exists(p), s"no tag '$name' at $dir")
    SinkFs.delete(p)
  }

  private val TagV = """"v":(\d+)""".r

  def tagVersion(dir: String, name: String): Option[Long] = {
    val p = new Path(dir, s"_tag.$name")
    if (!SinkFs.exists(p)) None
    else TagV.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1).toLong)
  }

  def listTags(dir: String): Seq[(String, Long)] = {
    val Tag = """_tag\.(.+)""".r
    SinkFs.listFileNames(new Path(dir)).collect {
      case f @ Tag(n) if !f.endsWith(".tmp") => n -> tagVersion(dir, n)
    }.collect { case (n, Some(v)) => n -> v }.sortBy(_._1)
  }

  def resolveTag(dir: String, name: String): Long =
    tagVersion(dir, name).getOrElse(throw new IllegalArgumentException(
      s"no tag '$name' at $dir (tags: ${listTags(dir).map(_._1).mkString(", ")})"))

  private val ManifestCdc = """"cdc":"([^"]+)"""".r

  /** The CHANGE-RECORD sidecar a manifest version references, if any —
    * Delta's `_change_data` analogue. Commits whose row-level changes
    * cannot be derived from the manifest diff (copy-on-write DELETE and
    * UPDATE/MERGE rewrites, delta commits carrying update pre/post
    * images) write their complete change record to a `cdc-*.tsv` sidecar
    * (lines `change_type\tdoc\tshard\tbody`) and reference it here;
    * blind appends and pure merge-on-read deletes stay derivation-only —
    * zero write amplification on the commits a landing zone is made of.
    * Visibility rides the manifest flip: an unreferenced sidecar (crash
    * before the flip) is invisible, exactly like an unmanifested part.
    */
  def manifestCdcAt(dir: String, version: Long): Option[String] = {
    val p = new Path(dir, s"_manifest.v$version.json")
    if (!SinkFs.exists(p)) None
    else ManifestCdc.findFirstMatchIn(SinkFs.readString(p)).map(_.group(1))
  }

  /** Write a commit's change record to a temp name and move it into
    * place (the same two-step every data file uses — the sidecar only
    * becomes meaningful when the manifest referencing it lands). Returns
    * None for an empty record: the commit changed nothing row-level.
    */
  private[sources] def writeCdcSidecar(
      dir: String, tag: String, records: Seq[(String, String)]): Option[String] = {
    // an EMPTY record is still written: it states "this commit changed no
    // rows" — without it, a file-swapping no-op DML would look like an
    // unrepresentable truncate to the feed's derivation
    val name = s"cdc-$tag.tsv"
    val tmp = new Path(dir, s"_tmp/$name")
    val w = SinkFs.create(tmp)
    try records.foreach { case (ct, line) => w.write(s"$ct\t$line\n") }
    finally w.close()
    SinkFs.moveOver(tmp, new Path(dir, name))
    Some(name)
  }

  /** `TIMESTAMP AS OF` resolution: the NEWEST version whose commit
    * timestamp is ≤ the requested instant (Delta/Iceberg semantics). A
    * timestamp before the first commit fails loudly — same stance as an
    * out-of-range `versionAsOf`; a timestamp past the last commit reads
    * the latest version. Versions scan driver-side — one tiny JSON head
    * per commit; a production catalog binary-searches its metadata.
    */
  def versionAtTimestamp(dir: String, tsMillis: Long): Long = {
    val current = currentManifestVersion(dir)
    require(current > 0L, s"timestampAsOf on $dir: table has no commits")
    val stamped = (1L to current).flatMap(v => manifestTsAt(dir, v).map(v -> _))
    require(stamped.nonEmpty,
      s"timestampAsOf on $dir: no commit timestamps recorded " +
        "(table predates timestamped manifests — use versionAsOf)")
    require(tsMillis >= stamped.head._2,
      s"timestampAsOf=$tsMillis is before the first commit " +
        s"(version ${stamped.head._1} at ts ${stamped.head._2})")
    stamped.filter(_._2 <= tsMillis).map(_._1).max
  }

  /** A `timestampAsOf` read-option value: epoch-millis digits (the
    * deterministic spelling the checked queries use) or a
    * `yyyy-MM-dd[ HH:mm:ss[.f]]` timestamp string (JVM-local, like
    * Delta's option).
    */
  private[sources] def parseTsMillis(s: String): Long =
    if (s.forall(_.isDigit)) s.toLong
    else if (s.length == 10) java.sql.Timestamp.valueOf(s + " 00:00:00").getTime
    else java.sql.Timestamp.valueOf(s).getTime

  /** The ONE version-pinned entry resolution every read path (row scan
    * AND metadata-only count) must go through: an out-of-range
    * `versionAsOf` fails loudly here, so no scan shape can silently
    * answer from an empty `entriesAtVersion` result (the round-13 count
    * pushdown bypassed this and returned 0 for a typo'd version — the
    * exact silent-wrong-answer the validation exists to prevent).
    */
  def entriesAsOf(dir: String, asOf: Option[Long]): Seq[SinkEntry] =
    entriesAsOfPruned(dir, asOf, None, None)

  /** [[entriesAsOf]] with the scan's pushed shard/doc predicates applied
    * DURING manifest resolution: on a segmented manifest, whole segments
    * the ref envelopes rule out are skipped unread
    * ([[parseManifestBlobPruned]]); surviving entries prune per-entry as
    * always. Same validation, same result as filtering the full census —
    * just O(matching) metadata IO instead of O(files/segmentTarget).
    */
  def entriesAsOfPruned(
      dir: String, asOf: Option[Long],
      pruneShards: Option[Set[Int]], pruneDocs: Option[(Long, Long)],
      prunePoints: Option[Set[Long]] = None,
      pruneCols: Seq[SinkColStats.ColPred] = Nil): Seq[SinkEntry] =
    asOf match {
      case None =>
        // same one-retry rule as committedEntries: a legacy unversioned
        // manifest can be cleaned up between resolution and read
        def once(): Seq[SinkEntry] = {
          val mf = manifestPath(dir)
          if (!SinkFs.exists(mf)) Seq.empty
          else parseManifestBlobPruned(dir, SinkFs.readString(mf), pruneShards, pruneDocs,
            prunePoints, pruneCols)
        }
        try once()
        catch { case _: java.io.FileNotFoundException => once() }
      case Some(v) =>
        val current = currentManifestVersion(dir)
        require(v >= 0 && v <= current,
          s"versionAsOf=$v out of range: table at $dir has versions 1..$current")
        // v = 0 is the empty pre-commit snapshot — always safe; anything
        // below the retention horizon has (or may have) swept files, and
        // the horizon error beats an incidental missing-file one
        val hz = horizonOf(dir)
        require(v == 0L || v >= hz,
          s"snapshot versionAsOf=$v expired: the retention horizon is $hz " +
            s"(versions below it were released by compaction)")
        entriesAtVersion(dir, v, pruneShards, pruneDocs, prunePoints, pruneCols)
    }

  /** A travelled snapshot may be compaction-expired: every entry that
    * will be read must still have its data file AND (merge-on-read) its
    * delete-vector sidecar on disk — a missing sidecar would otherwise
    * surface as a raw FileNotFound mid-job (or worse, rows the snapshot
    * had deleted would resurrect). Applies to the metadata-only COUNT
    * too: the manifest could answer an expired snapshot's count
    * "correctly", but count and collect of the same version must agree
    * on validity, so both fail with the same loud error.
    */
  def requireSnapshotLive(dir: String, asOf: Long, kept: Seq[SinkEntry]): Unit = {
    val missing = kept
      .flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil))
      .filterNot(f => SinkFs.exists(new Path(dir, f)))
    require(missing.isEmpty,
      s"snapshot versionAsOf=$asOf expired: compaction removed ${missing.mkString(", ")}")
  }

  /** Scan a TSV file to rebuild its manifest entry (recovery / rewrite
    * paths — the rare cases where stats must be recomputed from data).
    */
  private[sources] def entryFromLines(
      file: String, lines: Seq[String],
      table: Option[StructType] = None): SinkEntry = {
    var (mn, mx) = (Int.MaxValue, -1)
    var (dn, dx) = (Long.MaxValue, -1L)
    val bloom = DocBloom.empty() // rewrites keep point-lookup skipping
    // per-column envelopes only when the caller KNOWS the lines' schema —
    // stats computed against a guessed schema would prune unsoundly
    val csAcc = table.map(t => new SinkColStats.LineAcc(t))
    lines.foreach { l =>
      val c = l.split("\t", 3)
      val s = c(1).toInt
      if (s < mn) mn = s
      if (s > mx) mx = s
      val d = c(0).toLong
      if (d < dn) dn = d
      if (d > dx) dx = d
      DocBloom.insert(bloom, d)
      csAcc.foreach(_.addLine(l))
    }
    SinkEntry(file, lines.size.toLong, if (mx < 0) -1 else mn, mx, "",
      if (dx < 0L) -1L else dn, dx,
      bf = if (lines.isEmpty) "" else DocBloom.encode(bloom),
      cs = if (lines.isEmpty) "" else csAcc.map(_.encode()).getOrElse(""))
  }

  /** Compile a conjunctive source-Filter array over the (doc_id, shard)
    * columns into a row predicate; None = some filter is out of the
    * supported class (body predicates, unknown columns) and the DELETE
    * must be REJECTED at `canDeleteWhere`, never silently half-applied.
    */
  private[sources] def deletePredicate(filters: Array[Filter]): Option[(Long, Int) => Boolean] = {
    import org.apache.spark.sql.sources._
    def colOf(name: String): Option[(Long, Int) => Long] = name match {
      case "doc_id" => Some((d, _) => d)
      case "shard" => Some((_, s) => s.toLong)
      case _ => None
    }
    def lit(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    def one(f: Filter): Option[(Long, Int) => Boolean] = f match {
      case And(l, r) => for (a <- one(l); b <- one(r)) yield (d: Long, s: Int) => a(d, s) && b(d, s)
      case Or(l, r) => for (a <- one(l); b <- one(r)) yield (d: Long, s: Int) => a(d, s) || b(d, s)
      case Not(c) => one(c).map(p => (d: Long, s: Int) => !p(d, s))
      case EqualTo(c, v) => for (g <- colOf(c); x <- lit(v)) yield (d: Long, s: Int) => g(d, s) == x
      case In(c, vs) =>
        for (g <- colOf(c); xs <- Some(vs.flatMap(lit)) if xs.length == vs.length)
          yield (d: Long, s: Int) => xs.contains(g(d, s))
      case LessThan(c, v) => for (g <- colOf(c); x <- lit(v)) yield (d: Long, s: Int) => g(d, s) < x
      case LessThanOrEqual(c, v) =>
        for (g <- colOf(c); x <- lit(v)) yield (d: Long, s: Int) => g(d, s) <= x
      case GreaterThan(c, v) =>
        for (g <- colOf(c); x <- lit(v)) yield (d: Long, s: Int) => g(d, s) > x
      case GreaterThanOrEqual(c, v) =>
        for (g <- colOf(c); x <- lit(v)) yield (d: Long, s: Int) => g(d, s) >= x
      case IsNotNull(c) => colOf(c).map(_ => (_: Long, _: Int) => true) // both non-nullable
      case IsNull(c) => colOf(c).map(_ => (_: Long, _: Int) => false)
      case AlwaysTrue() => Some((_: Long, _: Int) => true)
      case AlwaysFalse() => Some((_: Long, _: Int) => false)
      case _ => None
    }
    val parts = filters.map(one)
    if (parts.exists(_.isEmpty)) None
    else Some((d: Long, s: Int) => parts.forall(_.get(d, s)))
  }

  private val deleteCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drop zero-row task messages at commit (deleting their temp files):
    * a clustered write can leave empty shuffle partitions, and an empty
    * committed file is manifest noise every later operation re-reads.
    */
  private[sources] def nonEmpty(messages: Array[WriterCommitMessage]): Array[WriterCommitMessage] =
    messages.filter {
      case c: ShardSinkCommit if c.rows == 0L =>
        SinkFs.delete(new Path(c.tempPath)); false
      case _ => true
    }

  /** The set of `shard` values a single filter could match, when the
    * filter constrains ONLY `shard`; None for anything else (then it
    * cannot participate in a stats-only decision).
    */
  private[sources] def oneShardSet(f: Filter): Option[Set[Int]] = {
    import org.apache.spark.sql.sources._
    val all = (0 until DocGen.NumShards.toInt).toSet
    f match {
      case EqualTo("shard", v: Number) => Some(Set(v.intValue))
      case In("shard", vs) => Some(vs.collect { case n: Number => n.intValue }.toSet)
      case LessThan("shard", v: Number) => Some(all.filter(_ < v.intValue))
      case LessThanOrEqual("shard", v: Number) => Some(all.filter(_ <= v.intValue))
      case GreaterThan("shard", v: Number) => Some(all.filter(_ > v.intValue))
      case GreaterThanOrEqual("shard", v: Number) => Some(all.filter(_ >= v.intValue))
      case And(l, r) => for (a <- oneShardSet(l); b <- oneShardSet(r)) yield a.intersect(b)
      case Or(l, r) => for (a <- oneShardSet(l); b <- oneShardSet(r)) yield a.union(b)
      case _ => None
    }
  }

  /** If every filter constrains ONLY `shard`, the union of shard values
    * that could match — enabling the stats-only file skip. Conservative
    * None for anything else.
    */
  private def shardOnlySet(filters: Array[Filter]): Option[Set[Int]] = {
    val parts = filters.map(oneShardSet)
    if (parts.isEmpty || parts.exists(_.isEmpty)) None
    else Some(parts.flatten.reduce(_ intersect _))
  }

  /** The doc_id interval HULL a single filter could match, when it
    * constrains ONLY `doc_id`; None for anything else. `Or` takes the
    * conservative hull (superset — sound for skipping), `And` the
    * intersection.
    */
  private[sources] def oneDocInterval(f: Filter): Option[(Long, Long)] = {
    import org.apache.spark.sql.sources._
    def lit(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    f match {
      case EqualTo("doc_id", v) => lit(v).map(x => (x, x))
      case In("doc_id", vs) =>
        val xs = vs.flatMap(lit(_))
        if (xs.length == vs.length && xs.nonEmpty) Some((xs.min, xs.max)) else None
      case LessThan("doc_id", v) => lit(v).map(x => (Long.MinValue, x - 1))
      case LessThanOrEqual("doc_id", v) => lit(v).map(x => (Long.MinValue, x))
      case GreaterThan("doc_id", v) => lit(v).map(x => (x + 1, Long.MaxValue))
      case GreaterThanOrEqual("doc_id", v) => lit(v).map(x => (x, Long.MaxValue))
      case And(l, r) =>
        for (a <- oneDocInterval(l); b <- oneDocInterval(r))
          yield (math.max(a._1, b._1), math.min(a._2, b._2))
      case Or(l, r) =>
        for (a <- oneDocInterval(l); b <- oneDocInterval(r))
          yield (math.min(a._1, b._1), math.max(a._2, b._2))
      case _ => None
    }
  }

  /** Is this doc-only filter's matching set EXACTLY its interval hull?
    * True only for the convex class — equality, range bounds, And of
    * convex (interval intersection is an interval). `In` with several
    * values and `Or` are NOT convex: their hull admits ids the predicate
    * rejects, so a hull-based all-match proof would consume a filter the
    * file does not actually satisfy row-for-row (the review-caught
    * `doc_id IN (0, 399)` wrong-count bug). Sound for the consumption
    * gate only — skipping keeps using the hull.
    */
  private[sources] def exactDocInterval(f: Filter): Boolean = {
    import org.apache.spark.sql.sources._
    f match {
      case EqualTo("doc_id", _) => oneDocInterval(f).isDefined
      case In("doc_id", vs) => vs.distinct.length == 1 && oneDocInterval(f).isDefined
      case LessThan("doc_id", _) | LessThanOrEqual("doc_id", _) |
           GreaterThan("doc_id", _) | GreaterThanOrEqual("doc_id", _) =>
        oneDocInterval(f).isDefined
      case And(l, r) => exactDocInterval(l) && exactDocInterval(r)
      case _ => false
    }
  }

  /** READ-side doc_id range skipping: the intersection of the interval
    * hulls implied by the doc-only CONJUNCTS — any conjunct alone soundly
    * skips a file whose recorded `d0`/`d1` range cannot overlap it.
    */
  private[sources] def docPruneRange(filters: Array[Filter]): Option[(Long, Long)] = {
    val parts = filters.flatMap(oneDocInterval)
    if (parts.isEmpty) None
    else Some((parts.map(_._1).max, parts.map(_._2).min))
  }

  /** POINT-lookup value set: the doc_id values a conjunct pins exactly
    * (`doc_id = K` / `doc_id IN (…)`) — the shape the per-file blooms
    * ("bf") can skip on. Range conjuncts don't qualify (a bloom answers
    * membership, not intervals); several point conjuncts intersect.
    */
  private[sources] def docPointSet(filters: Array[Filter]): Option[Set[Long]] = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    val parts = filters.collect {
      case EqualTo("doc_id", v: Long) => Set(v)
      case In("doc_id", vs) if vs.forall(_.isInstanceOf[Long]) =>
        vs.collect { case v: Long => v }.toSet
    }
    if (parts.isEmpty) None else Some(parts.reduce(_ intersect _))
  }

  /** READ-side data skipping (round 13): the intersection of the shard
    * sets implied by the shard-only CONJUNCTS of a pushed filter array —
    * unlike [[shardOnlySet]] (DELETE semantics: ALL filters must be
    * shard-only or nothing happens), any conjunct that mentions other
    * columns is simply ignored here, because skipping a file is sound
    * whenever ANY conjunct alone rules it out. None = no conjunct prunes.
    */
  private[sources] def shardPruneSet(filters: Array[Filter]): Option[Set[Int]] = {
    val parts = filters.flatMap(oneShardSet)
    if (parts.isEmpty) None else Some(parts.reduce(_ intersect _))
  }

  /** DELETE WHERE over the committed view — metadata-first, rewrite only
    * what must be rewritten:
    *   - a file with NO matching rows keeps its manifest entry untouched;
    *   - a file where EVERY row matches is simply dropped from the
    *     manifest (with shard-whole clustered files, a `shard`-keyed
    *     DELETE is usually this pure-metadata case — no data IO at all);
    *   - a partially-matching file is rewritten under a fresh job-unique
    *     name (`part-d<n>.tsv`) — the old file stays on disk untouched
    *     until AFTER the manifest flip, so a reader holding the previous
    *     manifest keeps a consistent view through the whole delete.
    * The rewrite runs driver-side: deletes are control-plane operations
    * over a landing zone, and the per-file work is line filtering. A
    * 100 TB deployment would submit the rewrite of the (few) straddling
    * files as a job; the manifest protocol — the part under test — is
    * identical.
    */
  private[sources] def deleteWhereImpl(
      dir: String, filters: Array[Filter], cdf: Boolean = false): Unit = {
    // base pinned at read: the flip goes to exactly base+1, so any
    // interleaved commit collides there and this rewrite aborts loudly
    // instead of silently dropping the interloper's files
    val (baseV, base) = resolveBase(dir)
    requireForeignLive(dir, base)
    val (entries, obsolete, removed) = cowDrop(dir, base, filters, recordRemoved = cdf)
    val gen = deleteCounter.incrementAndGet()
    flipDmlRebase(dir, baseV, base, entries, s"d$gen", filters,
      cdc = if (cdf) writeCdcSidecar(dir, s"d$gen", removed) else None,
      op = Some("delete"))
    // physical cleanup AFTER the flip, same as truncate; cloned-in files
    // stay on the source's disk
    deleteOwned(dir, obsolete)
  }

  /** The copy-on-write drop core shared by DELETE WHERE and the filtered
    * OVERWRITE: removes the rows matching `filters` from `base`,
    * returning (kept/rewritten entries, files to delete AFTER the flip,
    * and — when `recordRemoved` — the dropped rows as `delete` change
    * records, because a copy-on-write swap destroys the evidence: the
    * old file is physically cleaned after the commit, so the change feed
    * must read a sidecar instead of diffing manifests — Delta's CDF does
    * exactly this).
    */
  private[sources] def cowDrop(
      dir: String, base: Seq[SinkEntry], filters: Array[Filter],
      recordRemoved: Boolean): (Seq[SinkEntry], Seq[String], Seq[(String, String)]) = {
    val drop = deletePredicate(filters).getOrElse(
      throw new IllegalArgumentException(
        s"unsupported predicate for shard sink: ${filters.mkString(", ")}"))
    // rewritten survivors re-derive per-column envelopes under the
    // CURRENT schema (the lines' physical layout: evolution only appends)
    val csTable = Some(tableSchema(dir))
    // shard-stats fast path: a pure-shard predicate can skip READING any
    // file whose recorded shard range cannot match (the metadata-only
    // case the clustered layout exists for)
    val shardOnly = shardOnlySet(filters)
    val obsolete = scala.collection.mutable.ArrayBuffer.empty[String]
    val removed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val entries = base.flatMap { e =>
      if (shardOnly.exists(ss => !e.mayContainShard(ss))) Some(e) // untouched, unread
      else {
        // live view: a prior merge-on-read delete's vector must not be
        // resurrected by this rewrite
        val lines = liveLines(dir, e)
        val kept = lines.filterNot { l =>
          val c = l.split("\t", 3)
          val dead = drop(c(0).toLong, c(1).toInt)
          if (dead && recordRemoved) removed += (("delete", l))
          dead
        }
        if (kept.size == lines.size) Some(e)
        else if (kept.isEmpty) {
          obsolete += e.file; if (e.hasDeletes) obsolete += e.dv; None
        } else {
          val nf = s"part-d${deleteCounter.incrementAndGet()}.tsv"
          val tmp = new Path(dir, s"_tmp/$nf")
          val w = SinkFs.create(tmp)
          try kept.foreach { l => w.write(l); w.write("\n") } finally w.close()
          SinkFs.moveOver(tmp, new Path(dir, nf))
          obsolete += e.file
          if (e.hasDeletes) obsolete += e.dv
          Some(entryFromLines(nf, kept, csTable))
        }
      }
    }
    (entries, obsolete.toSeq, removed.toSeq)
  }

  /** CHANGE DATA FEED (rounds 13/14 — the Delta-CDF analogue the
    * versioned manifests + delete vectors + change-record sidecars make
    * exact): the row-level changes committed in versions (fromV, toV].
    *
    * A version that references a CDC SIDECAR ([[manifestCdcAt]]) reads
    * it verbatim as the commit's COMPLETE change record — that is how
    * copy-on-write DELETE (`part-d` swaps), copy-on-write UPDATE/MERGE
    * (`part-r` swaps) and delta commits carrying update
    * `update_preimage`/`update_postimage` pairs are represented, since
    * none of those derive from the manifest diff alone.
    *
    * Every other version derives, paying zero write amplification at
    * commit time:
    *   - a file NEW in version v (append `part-b`/epoch `part-e`/delta
    *     `part-u` namespaces) emits its live-at-v rows as `insert`;
    *   - a file whose delete vector GREW in v emits exactly the newly
    *     dead positions as `delete` (rows recovered from the retained
    *     data file);
    *   - a fully-dead entry REMOVED in v (the MOR drop — data file
    *     retained) emits its live-at-(v−1) rows as `delete`;
    *   - a compaction swap (`part-c`) is NOT a change event — the rows
    *     it carries were already emitted at their original commits;
    *   - a derivation-only version whose swapped-out files are GONE
    *     (a truncate/overwrite, or pre-round-14 copy-on-write DML with
    *     no recorded sidecar) FAILS LOUDLY: the removed rows cannot be
    *     reconstructed, and a consumer must never silently miss them.
    * Positions ride the partition (driver-resolved); production would
    * reference vector files instead of inlining, same protocol.
    */
  private[sources] def changePartitions(
      dir: String, fromV: Long, toV: Long): Seq[InputPartition] = {
    // the range's versions must all sit at-or-above the retention
    // horizon (the diff of (fromV, fromV+1] also reads fromV's manifest,
    // which is always retained — only FILES expire)
    val hz = horizonOf(dir)
    require(toV <= fromV || fromV + 1 >= hz,
      s"change feed range ($fromV, $toV] expired: the retention horizon is " +
        s"$hz (versions below it were released by compaction)")
    def cdcScope(f: String): Boolean =
      f.startsWith("part-b") || f.startsWith("part-e") || f.startsWith("part-u")
    // every file/vector a change partition will read must still exist —
    // compaction may have expired the range; fail with the real reason,
    // never a raw FileNotFound (driver-side here, executor-side for data)
    def live(f: String): Path = {
      val p = new Path(dir, f)
      require(SinkFs.exists(p),
        s"change feed range ($fromV, $toV] expired: $f was released by a " +
          "later rewrite or compaction (retention horizon 0 sweeps replaced " +
          "files immediately — compact with retainVersions to keep feed " +
          "history readable)")
      p
    }
    def dvOf(e: SinkEntry): Set[Int] =
      if (e.hasDeletes) readDeleteVector(live(e.dv)) else Set.empty
    (fromV + 1 to toV).flatMap { v =>
      manifestCdcAt(dir, v) match {
        case Some(sidecar) =>
          Seq(ShardSinkChangeSidecar(live(sidecar).toString, v): InputPartition)
        case None =>
          val prev = entriesAtVersion(dir, v - 1).map(e => e.file -> e).toMap
          val cur = entriesAtVersion(dir, v).map(e => e.file -> e).toMap
          // a RESTORE commit performs no physical rewrites — every
          // file-set difference is genuine row change, so plain-diff
          // semantics apply: ANY re-added file's live rows are inserts
          // (not just cdcScope appends), and a SHRUNK delete vector is a
          // resurrection (the restore un-deleted those positions). A
          // CLONE-creation commit is the same shape: its referenced
          // (foreign-named) files' live rows are all genuine inserts to
          // THIS table, read zero-copy from the source at feed time.
          val isRestore =
            manifestOpAt(dir, v).exists(o => o == "restore" || o == "clone")
          val inserts = cur.valuesIterator
            .filter(e => (cdcScope(e.file) || isRestore) && !prev.contains(e.file))
            .map(e => ShardSinkChangeFile(
              live(e.file).toString, "insert", v,
              only = None, skip = dvOf(e).toSeq): InputPartition)
          // ALL removed/vector-grown entries considered, whatever their
          // name prefix — a vector can grow on a rewritten or compacted
          // file too, and an unexplained removal must never pass silently
          val deletes = prev.valuesIterator.flatMap { pe =>
            cur.get(pe.file) match {
              case Some(ce) if ce.dv != pe.dv =>
                val before = dvOf(pe)
                val after = dvOf(ce)
                val fresh = after -- before
                val resurrected = before -- after
                val grow: Option[InputPartition] =
                  if (fresh.isEmpty) None
                  else Some(ShardSinkChangeFile(
                    live(pe.file).toString, "delete", v,
                    only = Some(fresh.toSeq.sorted), skip = Seq.empty))
                val shrink: Option[InputPartition] =
                  if (resurrected.isEmpty) None
                  else Some(ShardSinkChangeFile(
                    live(pe.file).toString, "insert", v,
                    only = Some(resurrected.toSeq.sorted), skip = Seq.empty))
                grow.toSeq ++ shrink.toSeq
              case Some(_) => Seq.empty[InputPartition]
              case None if !isRestore && cur.keysIterator.exists(f =>
                  f.startsWith("part-c") && !prev.contains(f)) =>
                // compaction swap: rows already emitted at their commits.
                // Checked BEFORE the exists-based MOR-drop branch — with
                // a retention horizon the swapped-out files legitimately
                // survive on disk, and a compaction commit is only ever a
                // compaction (single-operation commits). A restore that
                // re-adds an old part-c file must NOT take this branch:
                // its removed files carry genuinely deleted rows
                Seq.empty[InputPartition]
              case None if SinkFs.exists(new Path(dir, pe.file)) =>
                // fully-dead MOR drop (or a restore dropping a
                // later-appended file): every live-at-(v-1) row died
                Seq(ShardSinkChangeFile(
                  new Path(dir, pe.file).toString, "delete", v,
                  only = None, skip = dvOf(pe).toSeq): InputPartition)
              case None =>
                // the swapped-out rows are unrecoverable AND unrecorded —
                // a truncate/overwrite, or pre-sidecar CoW DML. Refusing
                // beats a consumer silently missing deleted rows.
                throw new IllegalStateException(
                  s"change feed cannot represent version $v at $dir: commit " +
                    s"replaced ${pe.file} without a change record (truncate/" +
                    "overwrite, or copy-on-write DML on a table without " +
                    "cdf.enabled=true) — enable cdf.enabled before the DML, " +
                    "or read from a later changeFeedFrom")
            }
          }
          inserts ++ deletes
      }
    }
  }

  /** CDF output schema: the table's CURRENT columns plus the change
    * metadata — change rows from pre-evolution commits null-fill the
    * added columns, same as ordinary reads.
    */
  def changeSchemaOf(dir: String): StructType =
    tableSchema(dir)
      .add("_change_type", org.apache.spark.sql.types.StringType, nullable = false)
      .add("_commit_version", org.apache.spark.sql.types.LongType, nullable = false)

  /** The input partition for a manifest entry: data file plus its delete
    * vector (both resolved to full paths) — the ONE place entry→partition
    * mapping lives, so no read path can forget the vector.
    */
  private[sources] def partitionOf(dir: String, e: SinkEntry): InputPartition =
    ShardSinkFile(
      new Path(dir, e.file).toString,
      if (e.hasDeletes) new Path(dir, e.dv).toString else "",
      e.file)

  /** A delete vector: 0-based row positions, one per line, sorted. */
  private[sources] def readDeleteVector(p: Path): Set[Int] =
    SinkFs.readLines(p).map(_.toInt).toSet

  private[sources] def writeDeleteVector(dir: String, name: String, positions: Seq[Int]): Unit = {
    val tmp = new Path(dir, s"_tmp/$name")
    val w = SinkFs.create(tmp)
    try positions.sorted.foreach { p => w.write(p.toString); w.write("\n") }
    finally w.close()
    SinkFs.moveOver(tmp, new Path(dir, name))
  }

  /** An entry's LIVE lines: physical TSV lines minus its delete vector.
    * Every driver-side path that reads committed data (copy-on-write
    * rewrite, compaction, MOR re-delete) goes through this.
    */
  private[sources] def liveLines(dir: String, e: SinkEntry): Seq[String] = {
    val all = SinkFs.readLines(new Path(dir, e.file))
    if (!e.hasDeletes) all
    else {
      val dead = readDeleteVector(new Path(dir, e.dv))
      all.zipWithIndex.collect { case (l, i) if !dead.contains(i) => l }
    }
  }

  private val morCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Fresh generation number for merge-on-read artifacts (delete vectors,
    * manifest tags) — shared by the metadata DELETE path and the delta
    * write commit so names never collide within a JVM.
    */
  private[sources] def nextMorGen(): Long = morCounter.incrementAndGet()

  /** MERGE-ON-READ DELETE (round 13) — the write-cheap half of the DML
    * trade every table format exposes (Iceberg `write.delete.mode`):
    * instead of rewriting straddling files ([[deleteWhereImpl]]), the
    * commit writes a tiny DELETE VECTOR per affected file — the 0-based
    * row positions to skip, sound even on tables with duplicate doc_ids
    * because positions, not keys, identify rows (the reason a row-id
    * delta design was rejected) — and flips a manifest version whose
    * entries point at the vectors. NO data file is written, moved or
    * deleted; readers subtract the vector at scan time
    * ([[ShardSinkReaderFactory]]), and [[compact]] folds vectors away.
    * Re-deleting a file with an existing vector writes the UNION under a
    * fresh vector name (old vectors stay for time travel — a snapshot
    * before the delete references the same data file without, or with an
    * older, vector and still reads exactly its rows). A file whose every
    * live row matches keeps no entry but KEEPS its data file — MOR never
    * destroys data, so pre-delete snapshots stay readable; only
    * compaction/rewrite/truncate expire snapshots. Entry `rows` stays the
    * LIVE count; shard stats stay the (sound) superset.
    */
  private[sources] def morDeleteImpl(dir: String, filters: Array[Filter]): Unit = {
    val drop = deletePredicate(filters).getOrElse(
      throw new IllegalArgumentException(
        s"unsupported DELETE predicate for shard sink: ${filters.mkString(", ")}"))
    // any shard-only conjunct alone soundly skips a file (same reasoning
    // as the read-side prune): if no row of the file can satisfy that
    // conjunct, none satisfies the whole conjunction
    val prune = shardPruneSet(filters)
    val gen = morCounter.incrementAndGet()
    var k = 0
    // base pinned at read; lost race → loud abort (read-modify-write)
    val (baseV, base) = resolveBase(dir)
    // DML over a clone reads foreign files: same named error as reads
    requireForeignLive(dir, base)
    val entries = base.flatMap { e =>
      if (prune.exists(ss => !e.mayContainShard(ss))) Some(e) // untouched, unread
      else {
        val all = SinkFs.readLines(new Path(dir, e.file))
        val dead: Set[Int] =
          if (e.hasDeletes) readDeleteVector(new Path(dir, e.dv)) else Set.empty
        val hit = all.zipWithIndex.collect {
          case (l, i) if !dead.contains(i) && {
            val c = l.split("\t", 3); drop(c(0).toLong, c(1).toInt)
          } => i
        }
        if (hit.isEmpty) Some(e)
        else if (dead.size + hit.size == all.size) None // fully dead: drop entry, keep file
        else {
          k += 1
          val nv = s"del-m$gen-$k.pos"
          writeDeleteVector(dir, nv, (dead ++ hit).toSeq)
          Some(e.copy(rows = e.rows - hit.size, dv = nv))
        }
      }
    }
    flipDmlRebase(dir, baseV, base, entries, s"m$gen", filters, op = Some("delete"))
    // no physical cleanup: MOR leaves every data file (and superseded
    // vector) in place — prior snapshots keep reading their exact rows
  }
}

/** Task-commit message: temp path, row count, and the file's observed
  * shard range (−1/−1 when empty) — the per-file statistics the manifest
  * records so group-scoped operations can prune files without reading
  * them.
  */
case class ShardSinkCommit(
    tempPath: String, rows: Long, shardMin: Int = -1, shardMax: Int = -1,
    docMin: Long = -1L, docMax: Long = -1L, bf: String = "", cs: String = "")
  extends WriterCommitMessage {
  def toEntry(name: String): SinkEntry =
    SinkEntry(name, rows, shardMin, shardMax, "", docMin, docMax, bf, cs)
}

class ShardSinkWrite(
    path: String, queryId: String, truncate: Boolean = false,
    tableSchema: StructType = DocGen.schema,
    replaceFilters: Option[Array[org.apache.spark.sql.sources.Filter]] = None,
    cdf: Boolean = false,
    colMap: Array[Int] = null,
    evolveTo: Option[String] = None,
    basisSchema: String = null,
    autoCompact: Option[Long] = None)
  extends Write with BatchWrite with StreamingWrite
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  /** [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]:
    * the sink DECLARES clustered-by-shard distribution + (shard, doc_id)
    * ordering, so Spark inserts exactly one exchange (plus a local sort)
    * before the write and every committed file is shard-whole — no shard
    * straddles two files, and rows within a file arrive id-ordered. At
    * 100 TB this is the difference between a landing zone a bucketed
    * reader can consume in place and one that needs a full re-shuffle on
    * first read. Partition COUNT is left to Spark (0 = no requirement):
    * several shards may share one task's file, but never the reverse.
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.identity("shard")))
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      Expressions.sort(
        Expressions.column("shard"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING),
      Expressions.sort(
        Expressions.column("doc_id"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = this
  // both parent defaults return true; Scala requires an explicit pick
  // when two traits contribute the same concrete member
  override def useCommitCoordinator(): Boolean = true

  // CHECK constraints pinned at write-build (driver): every task enforces
  // this set per row. If an ADD CONSTRAINT lands between build and commit,
  // the commit-side guard aborts rather than flip rows that were never
  // validated against the newcomer (Delta resolves the same race as a
  // transaction conflict).
  private val pinnedCks = ShardSink.currentConstraints(path)

  private def requireNoNewConstraints(baseV: Long): Unit = {
    val added = ShardSink.constraintsAt(path, baseV).filterNot(pinnedCks.contains)
    if (added.nonEmpty)
      throw new IllegalStateException(
        s"ShardSink write at $path conflicts with a concurrent ADD CONSTRAINT " +
          s"(${added.map(_._1).mkString(", ")}): written rows were not validated " +
          "against it; aborted loudly — re-run")
  }

  // an EVOLVING commit pins the schema it derived its target from: if a
  // concurrent ALTER landed a different shape in between, overwriting the
  // schema key would silently drop that evolution — abort loudly instead
  private val pinnedSchema =
    if (evolveTo.isDefined)
      // the schema the write target was DERIVED from — never a re-read
      // (review fix: re-reading here raced a concurrent ALTER past the
      // guard); null basis only on legacy constructions, which never
      // evolve
      Option(basisSchema).getOrElse(ShardSink.schemaString(ShardSink.tableSchema(path)))
    else null
  private def requireSchemaUnchanged(baseV: Long): Unit =
    if (evolveTo.isDefined) {
      val cur = ShardSink.schemaString(ShardSink.schemaAtVersion(path, baseV))
      if (cur != pinnedSchema)
        throw new IllegalStateException(
          s"ShardSink schema-evolving write at $path conflicts with a concurrent " +
            s"schema change ($pinnedSchema -> $cur); aborted loudly — re-run")
    }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ShardSinkWriterFactory(path, queryId, table = tableSchema,
      constraints = pinnedCks, colMap = colMap)

  /** STREAMING_WRITE: the same temp-file/manifest protocol, per epoch.
    * Final names carry the epoch (`part-e<epoch>-<i>.tsv`) and each epoch
    * commit REPLACES its own epoch's manifest entries before appending —
    * a replayed micro-batch (restart re-commits the last epoch) lands
    * idempotently instead of doubling rows: exactly-once visibility on
    * top of at-least-once delivery, which is the whole streaming-sink
    * contract in one sentence.
    */
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    ShardSinkStreamingFactory(path, queryId, tableSchema, pinnedCks)

  import org.apache.hadoop.fs.Path

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // zero-row task files are dropped at commit (a clustered replacement
    // can leave empty shuffle partitions): delete the temp, manifest nothing
    val epochFiles = ShardSink.nonEmpty(messages).zipWithIndex.map { case (m, i) =>
      val c = m.asInstanceOf[ShardSinkCommit]
      val dest = new Path(path, s"part-e$epochId-$i.tsv")
      SinkFs.moveOver(new Path(c.tempPath), dest)
      c.toEntry(dest.getName)
    }
    // replace-then-append keyed on the epoch prefix = replay idempotence.
    // Same optimistic protocol as the batch Append: pin the base, flip to
    // base+1, and on a lost race re-apply the epoch transform on the
    // winner's manifest (the transform is idempotent, so re-application
    // is exactly correct — a concurrent appender's files are preserved).
    var attempt = 0
    var committed = false
    while (!committed) {
      val (baseV, base) = ShardSink.resolveBase(path)
      requireNoNewConstraints(baseV)
      val kept =
        if (base.nonEmpty) base.filterNot(_.file.startsWith(s"part-e$epochId-"))
        else recoverPriorEpochs(epochId)
      try {
        ShardSink.writeManifestAt(
          path, kept ++ epochFiles, s"$queryId-e$epochId-a$attempt", baseV + 1,
          op = Some("streamingUpdate"))
        committed = true
      } catch {
        case ShardSink.ShardSinkConflict(_, _) if attempt < 20 => attempt += 1
        case c: ShardSink.ShardSinkConflict =>
          throw new IllegalStateException(
            s"ShardSink epoch $epochId commit at $path lost the manifest race " +
              s"$attempt times (last: version ${c.version}); giving up loudly", c)
      }
    }
  }

  /** DEFENSE-IN-DEPTH recovery for the streaming path: with versioned
    * manifests a crash mid-flip leaves the previous version intact, so
    * this path should never fire on a healthy dir — but a replayed epoch
    * landing on a manifest-ABSENT directory (operator deleted the
    * manifests, legacy dir, total manifest loss) must still not lose the
    * epochs the checkpoint recorded as done. Epoch files are safe to
    * recover from disk: their names are deterministic
    * (`part-e<epoch>-<i>.tsv`) and every one was fully renamed BEFORE any
    * manifest flip was attempted, so we rebuild prior epochs' entries
    * from the directory listing (recounting rows). The replayed epoch's
    * own files are excluded: its fresh commit replaces them. Batch
    * (`part-b*`) files stay unrecovered — a batch job with no manifest
    * never committed.
    */
  private def recoverPriorEpochs(replayEpoch: Long): Seq[SinkEntry] = {
    val EpochFile = """part-e(\d+)-\d+\.tsv""".r
    SinkFs.listFileNames(new Path(path)).sorted.flatMap {
      case f @ EpochFile(e) if e.toLong != replayEpoch =>
        Some(ShardSink.entryFromLines(f, SinkFs.readLines(new Path(path, f))))
      case _ => None
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    abort(messages)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // job-unique final names (`part-b<queryId>-<i>.tsv`): a second Append
    // never overwrites a prior job's committed files, so a reader holding
    // the old manifest keeps a consistent view right through the commit
    // (the `b` prefix also keeps the namespace disjoint from the
    // streaming path's `part-e<epoch>-<i>.tsv`)
    val finals = ShardSink.nonEmpty(messages).zipWithIndex.map { case (m, i) =>
      val c = m.asInstanceOf[ShardSinkCommit]
      val dest = new Path(path, s"part-b$queryId-$i.tsv")
      SinkFs.moveOver(new Path(c.tempPath), dest)
      c.toEntry(dest.getName)
    }
    // manifest LAST, written to a temp name then renamed to the next
    // fresh version: the job becomes visible as one rename or not at all.
    //
    // CONCURRENCY (optimistic, Delta's append-only rule): a blind Append
    // commutes with EVERY other commit — its files are brand-new and
    // job-unique, and no concurrent operation can have read them — so a
    // lost version race is not a conflict: re-read the winner's manifest
    // as the new base, merge, and flip at the next version. The pin-at-
    // read + rename-to-base+1 protocol guarantees the loser of any
    // interleaving is detected (no re-list between resolve and rename),
    // so no interleaved commit's files can ever be silently dropped.
    // Truncate is read-modify-write (it REPLACES the table): it pins its
    // base once and aborts loudly on a lost race.
    if (truncate) {
      val (baseV, previous) = ShardSink.resolveBase(path)
      requireNoNewConstraints(baseV)
      requireSchemaUnchanged(baseV)
      // a pending/merged schema flips IN this commit — the one atomic
      // publication a staged REPLACE (or mergeSchema overwrite) gets
      ShardSink.flipFromBase(path, baseV, finals, queryId, op = Some("truncate"),
        schema = evolveTo)
      // cleanup AFTER the flip: old files are already invisible;
      // deleting them can race nothing
      ShardSink.deleteOwned(path,
        previous.flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil))
          .filterNot(finals.map(_.file).contains))
    } else if (replaceFilters.isDefined) {
      // FILTERED OVERWRITE (replaceWhere): ONE commit that drops the
      // rows matching the predicate (DELETE WHERE's copy-on-write core —
      // metadata-only for shard-aligned predicates) and lands the new
      // files. Read-modify-write: base pinned once, flip to base+1,
      // loud abort on a lost race.
      val filters = replaceFilters.get
      val drop = ShardSink.deletePredicate(filters).get // validated at build()
      // Delta's replaceWhere constraint: every INSERTED row must fall
      // inside the replaced region, otherwise the "overwrite" silently
      // appends outside its own predicate. Checked before any flip; on
      // violation the landed files are removed (they were never
      // manifested — invisible throughout).
      try finals.foreach { e =>
        SinkFs.readLines(new Path(path, e.file)).foreach { l =>
          val c = l.split("\t", 3)
          require(drop(c(0).toLong, c(1).toInt),
            s"overwrite constraint violation at $path: inserted row " +
              s"(doc_id=${c(0)}, shard=${c(1)}) does not match the replace " +
              s"predicate ${filters.mkString(", ")}")
        }
      } catch {
        case t: Throwable =>
          finals.foreach(e => SinkFs.delete(new Path(path, e.file)))
          throw t
      }
      val (baseV, base) = ShardSink.resolveBase(path)
      requireNoNewConstraints(baseV)
      requireSchemaUnchanged(baseV)
      val (kept, obsolete, removed) = ShardSink.cowDrop(path, base, filters,
        recordRemoved = cdf)
      // change record only when the table opted into CDF: the dropped
      // rows' evidence dies with the cleanup below, and once a sidecar
      // exists it must be the version's COMPLETE record — so the
      // inserted rows ride it too (driver-side over files the commit
      // just wrote; a 100 TB deployment records them in the write job)
      val cdc = if (!cdf) None else {
        val inserted = finals.flatMap(e =>
          SinkFs.readLines(new Path(path, e.file)).map(("insert", _)))
        ShardSink.writeCdcSidecar(path, s"o$queryId", removed ++ inserted)
      }
      ShardSink.flipDmlRebase(path, baseV, base, kept ++ finals, s"o$queryId",
        filters, cdc = cdc, op = Some("replaceWhere"), schema = evolveTo)
      // physical cleanup AFTER the flip, same as DELETE
      ShardSink.deleteOwned(path, obsolete)
    } else {
      var attempt = 0
      var committed = false
      while (!committed) {
        val (baseV, base) = ShardSink.resolveBase(path)
        requireNoNewConstraints(baseV)
        requireSchemaUnchanged(baseV)
        try {
          ShardSink.writeManifestAt(path, base ++ finals, s"$queryId-a$attempt",
            baseV + 1, op = Some("append"), schema = evolveTo)
          committed = true
        } catch {
          case ShardSink.ShardSinkConflict(_, _) if attempt < 20 => attempt += 1
          case c: ShardSink.ShardSinkConflict =>
            throw new IllegalStateException(
              s"ShardSink append at $path lost the manifest race $attempt times " +
                s"(last: version ${c.version}); giving up loudly", c)
        }
      }
      // AUTO-COMPACT (Delta autoOptimize, round 15): the append itself is
      // already durable — this maintenance pass runs binPack AFTER it, a
      // no-op when everything is in band. A lost race with concurrent DML
      // yields silently: data wins, the next append's pass catches up.
      autoCompact.foreach { t =>
        try ShardSink.compact(path, targetRowsPerFile = t, binPack = true)
        catch { case _: IllegalStateException => () }
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case c: ShardSinkCommit => SinkFs.delete(new Path(c.tempPath))
      case _ =>
    }
}

/** Standalone (serializable) streaming factory — must not capture the
  * driver-side ShardSinkWrite.
  */
case class ShardSinkStreamingFactory(
    path: String, queryId: String, table: StructType = DocGen.schema,
    constraints: Seq[(String, String)] = Nil)
  extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new ShardSinkDataWriter(path, s"$queryId-e$epochId", partitionId, taskId,
      table = table, constraints = constraints)
}

/** `trailingCols`: the plain batch/stream writes receive exactly the
  * 3-column table schema; a GROUP-BASED replacement plan (SQL UPDATE /
  * MERGE / rewrite-DELETE) PREPENDS Spark's `__row_operation` marker
  * column to the physical rows while `LogicalWriteInfo.schema()` still
  * reports the bare row schema — the connector contract (decoded from
  * `ReplaceDataExec.writingTask`: the marker is only projected away when
  * the operation declares metadata attributes). With `trailingCols` the
  * writer reads (doc_id, shard, body) as the LAST three fields, which is
  * correct in both shapes; assuming ordinals (0,1,2) silently wrote the
  * marker as doc_id (found the hard way).
  */
class ShardSinkWriterFactory(
    path: String, queryId: String, trailingCols: Boolean = false,
    table: StructType = DocGen.schema,
    constraints: Seq[(String, String)] = Nil,
    colMap: Array[Int] = null)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ShardSinkDataWriter(path, queryId, partitionId, taskId, trailingCols, table,
      constraints, colMap)
}

class ShardSinkDataWriter(
    path: String, queryId: String, partitionId: Int, taskId: Long,
    trailingCols: Boolean = false, table: StructType = DocGen.schema,
    constraints: Seq[(String, String)] = Nil,
    colMap: Array[Int] = null)
  extends DataWriter[InternalRow] {
  // compiled ON the executor from the pinned predicate strings; throws on
  // the first violating row, failing the task before any commit
  private lazy val checkRow = SinkConstraint.enforcer(constraints, table)
  // attempt-unique temp name: a speculative twin or retry writes its OWN
  // file; only the committed attempt's message reaches driver commit
  private val tmp =
    new org.apache.hadoop.fs.Path(path, s"_tmp/$queryId-p$partitionId-a$taskId.tsv")
  private val out = SinkFs.create(tmp)
  private var rows = 0L
  private var sMin = Int.MaxValue
  private var sMax = -1
  private var dMin = Long.MaxValue
  private var dMax = -1L
  // per-file doc_id bloom — manifest-level point-lookup skipping
  private val bloom = DocBloom.empty()
  // per-column min/max envelopes over the file's payload columns — the
  // generic data-skipping stats ([[SinkColStats]]); fed the SERIALIZED
  // line, whose cell layout IS this write's pinned table schema
  private val csAcc = new SinkColStats.LineAcc(table)
  // row width is fixed per write job: the column mapping is computed once
  private var colIdx: Array[Int] = null

  override def write(row: InternalRow): Unit = {
    if (colIdx == null) {
      // an explicit NAME-resolved mapping (mergeSchema writes) wins; the
      // default is the contiguous layout (optionally offset past the
      // row-operation marker a group-based replacement plan prepends)
      colIdx =
        if (colMap != null) colMap
        else {
          val base = if (trailingCols) row.numFields - table.length else 0
          Array.tabulate(table.length)(base + _)
        }
    }
    val shard = row.getInt(colIdx(1))
    if (shard < sMin) sMin = shard
    if (shard > sMax) sMax = shard
    val doc = row.getLong(colIdx(0))
    if (doc < dMin) dMin = doc
    if (doc > dMax) dMax = doc
    DocBloom.insert(bloom, doc)
    checkRow(row, colIdx)
    val line = ShardSink.serializeRow(row, colIdx, table)
    csAcc.addLine(line)
    out.write(line)
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    ShardSinkCommit(tmp.toString, rows, if (sMax < 0) -1 else sMin, sMax,
      if (dMax < 0L) -1L else dMin, dMax,
      if (rows == 0L) "" else DocBloom.encode(bloom),
      cs = if (rows == 0L) "" else csAcc.encode())
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    SinkFs.delete(tmp) // a failed attempt leaves nothing
  }

  override def close(): Unit = ()
}

/** One committed file plus (merge-on-read deletes) the full path of its
  * delete vector, "" when none — every reader of the file must skip the
  * vector's 0-based row positions. `name` is the file's MANIFEST entry
  * name (what the `_file` row-id metadata column must carry so delta
  * commits can match positions back to entries): the basename for local
  * files, the absolute path for cloned-in foreign files.
  */
case class ShardSinkFile(file: String, dv: String = "", name: String = "")
  extends InputPartition

/** A SHARD-PURE committed file (manifest stats prove s0 == s1): carries
  * its shard as the partition key so Spark can trust the scan's reported
  * [[KeyGroupedPartitioning]] — several files of the same shard group
  * into one task under the V2 bucketing machinery.
  */
case class ShardSinkShardFile(file: String, dv: String, shard: Int, name: String = "")
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = {
    val r = new GenericInternalRow(1)
    r.update(0, shard)
    r
  }
}

class ShardSinkScan(
    path: String,
    asOf: Option[Long] = None,
    pruneShards: Option[Set[Int]] = None,
    required: StructType = DocGen.schema,
    pruneDocs: Option[(Long, Long)] = None,
    table: StructType = DocGen.schema,
    prunePoints: Option[Set[Long]] = None,
    pruneCols: Seq[SinkColStats.ColPred] = Nil,
    consumed: Seq[Filter] = Nil) extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with SupportsReportPartitioning with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required

  /** True iff this scan reads the CURRENT table in full — no version pin
    * and no pushed pruning of any kind. The MV-rewrite rule requires it:
    * a predicate that file-exact pruning CONSUMED leaves no residual
    * Filter node in the plan, so only the scan itself can testify that
    * the aggregate really covers the whole table (review fix).
    */
  def isFullUnprunedScan: Boolean =
    asOf.isEmpty && pruneShards.isEmpty && pruneDocs.isEmpty &&
      prunePoints.isEmpty && pruneCols.isEmpty
  /** The pruned-column names when this scan's ONLY pruning is
    * `col IS NOT NULL` envelopes on an unpinned read — the one pruning
    * kind the MV-rewrite rule may accept, PROVIDED the columns prove to
    * be matched inner-join keys (such files hold exclusively null key
    * values, rows the join drops anyway). None for any other shape.
    */
  def notNullOnlyPruning: Option[Set[String]] =
    if (asOf.isEmpty && pruneShards.isEmpty && pruneDocs.isEmpty &&
        prunePoints.isEmpty && pruneCols.nonEmpty &&
        pruneCols.forall(_.isInstanceOf[SinkColStats.ColNotNull]))
      Some(pruneCols.collect { case SinkColStats.ColNotNull(c) => c }.toSet)
    else None
  /** Filters the builder CONSUMED into file-exact pruning (round 19):
    * when a pushed predicate was fully applied by pruning, the Filter
    * node disappears from the plan, so a consumer that must account for
    * every applied predicate (the MV-rewrite rule's filtered-rollup
    * match) reads the consumed set here and reconstructs it. Consumption
    * always pins the proven snapshot, exposed as [[consumedPin]] — the
    * consumer must check the pin against its own version resolution.
    */
  private[sources] def consumedFilters: Seq[Filter] = consumed
  private[sources] def consumedPin: Option[Long] = asOf
  /** True iff the scan is unpinned and every pruning it applies derives
    * from pushed filters (i.e. from conjuncts of a residual Filter the
    * plan still carries above it) — under such a Filter, (Filter ∘ this
    * scan) equals σ_cond(full table) because pruning only ever skips
    * files that provably cannot match the pushed predicates.
    */
  private[sources] def filterDerivedPruningOnly: Boolean =
    asOf.isEmpty && consumed.isEmpty
  /** The entries this scan will read — the metadata input for a cost
    * model that must price a PRUNED base scan honestly (round 19).
    */
  private[sources] def costEntries: Seq[SinkEntry] = kept
  override def description(): String =
    s"ShardSinkScan[$path, manifest-committed files only" +
      asOf.map(v => s", versionAsOf=$v").getOrElse("") +
      pruneShards.map(s => s", pruneShards=${s.toSeq.sorted.mkString("{", ",", "}")}")
        .getOrElse("") +
      pruneDocs.map { case (lo, hi) => s", pruneDocs=[$lo,$hi]" }.getOrElse("") +
      prunePoints.map(p => s", bloomPoints=${p.size}").getOrElse("") +
      (if (pruneCols.isEmpty) ""
       else s", pruneCols=[${pruneCols.map(_.describe).mkString("; ")}]") + "]"
  override def toBatch: Batch = this

  /** The entries this scan will read: the pinned (or current) version's
    * manifest minus every file whose shard/doc_id stats rule it out —
    * ONE snapshot shared by partition planning, the reported statistics
    * AND the reported partitioning, so the three can never disagree (a
    * concurrent commit between partitioning-report and planning would
    * otherwise let Spark plan shard-grouped tasks over partitions that
    * no longer carry keys).
    */
  private lazy val kept: Seq[SinkEntry] =
    // pruning happens DURING manifest resolution: on a segmented
    // manifest, ref envelopes AND ref union-blooms skip whole segments
    // unread; point lookups then consult each surviving entry's doc_id
    // BLOOM — on an unclustered ingest layout where every file's range
    // contains every id, this is what turns `doc_id = K` into an O(1
    // file) read (and O(matching segments) driver IO at million-file
    // counts)
    ShardSink.entriesAsOfPruned(path, asOf, pruneShards, pruneDocs, prunePoints,
      pruneCols)

  private def keptEntries(): Seq[SinkEntry] = kept

  /** RUNTIME (join-driven) file pruning — [[SupportsRuntimeFiltering]],
    * DPP for the lakehouse table (round 15): a broadcast-join build side
    * joining on `shard` hands its shard values back at EXECUTION time,
    * after planning; whole manifest entries whose shard range misses the
    * delivered set vanish before any task launches. File-granular and
    * best-effort like the planning-time skip: stats-unknown entries
    * always read (the join still filters rows), so the kept set only
    * shrinks to files that provably cannot match. On a compacted
    * shard-pure snapshot this drops whole KeyGrouped partitions — a dim
    * that selects 2 of 16 shards reads 1/8th of the landing zone with no
    * change to the query.
    */
  @volatile private var runtimeShards: Option[Set[Int]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // Spark resolves these against the scan OUTPUT — a pruned projection
    // without `shard` (e.g. a delta writer's row-id scan) must not
    // advertise it, or analysis dies unresolved
    if (required.fieldNames.contains("shard")) Array(Expressions.column("shard"))
    else Array.empty

  override def filter(filters: Array[Filter]): Unit = {
    val shards = filters.collectFirst {
      case org.apache.spark.sql.sources.In("shard", vs) =>
        vs.collect { case n: Number => n.intValue }.toSet
    }
    shards.foreach { s =>
      runtimeShards = Some(s)
      ShardSink.lastRuntimeFilter.set(s)
    }
  }

  /** `kept` minus entries the runtime filter rules out — the set
    * planInputPartitions actually reads. Planning-time reports
    * (statistics, partitioning eligibility) use the pre-filter snapshot:
    * runtime filters arrive after those are consumed, and shrinking the
    * read set can only keep them conservative.
    */
  private def effectiveEntries(): Seq[SinkEntry] = runtimeShards match {
    case None => kept
    case Some(s) =>
      kept.filter(e => !e.hasStats || (e.shardMin to e.shardMax).exists(s.contains))
  }

  /** SHARD-GROUPED READS (round 14): after compaction every committed
    * file is shard-PURE with exact stats (s0 == s1) — the manifest
    * proves rows never cross files within a shard, which is exactly a
    * [[KeyGroupedPartitioning]] on `identity(shard)`. Reporting it makes
    * the clustered write layout PAY on the read side: per-shard
    * aggregations run with no exchange, and two compacted sink tables
    * join shard-co-partitioned with ZERO shuffles under the SPJ confs —
    * at 100 TB, the difference between re-shuffling the landing zone on
    * every consumption and reading it like a bucketed table. Freshly
    * appended files may straddle shards (one task's file can carry
    * several shards), so eligibility is per-SNAPSHOT and conservative:
    * every kept entry must be provably shard-pure, and the scan must
    * still output the shard column. Ineligible snapshots degrade to the
    * ordinary unknown partitioning — never wrong, just shuffled.
    */
  private lazy val shardGrouped: Boolean =
    kept.nonEmpty && required.fieldNames.contains("shard") &&
      kept.forall(e => e.hasStats && e.shardMin == e.shardMax)

  override def outputPartitioning(): Partitioning =
    if (shardGrouped)
      new KeyGroupedPartitioning(Array(Expressions.identity("shard")), kept.length)
    else new UnknownPartitioning(kept.length)

  /** [[org.apache.spark.sql.connector.read.SupportsReportStatistics]]:
    * EXACT post-prune live-row counts straight from the manifest (`rows`
    * is maintained as the live count through every DML path), sized at
    * the TSV row estimate — a pruned read of a big landing zone reports
    * small and becomes the optimizer's broadcast side, same as the
    * DocGen scan's spec-pinned behavior.
    */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    import java.util.{Optional, OptionalLong}
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    val rows = keptEntries().map(_.rows).sum
    // COLUMN-LEVEL statistics for the cost-based optimizer, straight
    // from the manifest's per-file ranges — the join-reorder /
    // build-side-choice inputs Iceberg and Delta feed Spark from their
    // manifests. min/max are exact over live files (delete vectors only
    // narrow them — sound for estimation); ndv is the conservative
    // estimate the ranges support (doc_id ≈ one per row on this ingest
    // layout, shard = the covered range width); null counts are 0 (the
    // core columns are non-null by construction). Reported only when
    // EVERY kept file carries the stat — partial coverage stays silent
    // rather than claiming extremes the unknown files could exceed.
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference, ColumnStatistics]()
    val k = kept
    if (k.nonEmpty && k.forall(_.hasDocStats)) {
      val (lo, hi) = (k.map(_.docMin).min, k.map(_.docMax).max)
      colStats.put(Expressions.column("doc_id"), new ColumnStatistics {
        override def distinctCount(): OptionalLong = OptionalLong.of(rows)
        override def min(): Optional[Object] = Optional.of(Long.box(lo))
        override def max(): Optional[Object] = Optional.of(Long.box(hi))
        override def nullCount(): OptionalLong = OptionalLong.of(0L)
      })
    }
    if (k.nonEmpty && k.forall(_.hasStats)) {
      val (lo, hi) = (k.map(_.shardMin).min, k.map(_.shardMax).max)
      colStats.put(Expressions.column("shard"), new ColumnStatistics {
        override def distinctCount(): OptionalLong = OptionalLong.of((hi - lo + 1).toLong)
        override def min(): Optional[Object] = Optional.of(Int.box(lo))
        override def max(): Optional[Object] = Optional.of(Int.box(hi))
        override def nullCount(): OptionalLong = OptionalLong.of(0L)
      })
    }
    // payload columns (round 15): fold the per-entry column envelopes
    // into CBO min/max — all-or-silent like everything envelope-shaped
    // (a stat-less entry blanks the column). No distinct/null counts:
    // the envelope doesn't know them, and a wrong guess misleads the
    // optimizer worse than absence.
    if (k.nonEmpty && k.forall(_.cs.nonEmpty)) {
      import org.apache.spark.sql.types.{DoubleType => DT, IntegerType => IT, LongType => LT, StringType => ST}
      SinkColStats.decode(SinkColStats.mergeEnvelopes(k.map(_.cs))).foreach {
        case (name, st) =>
          // boxed as the COLUMN's catalyst type (Spark interprets the
          // stat against the schema): an int column gets Integer, a
          // widened column's integral stats convert numerically, and a
          // tag/type mismatch (rename-era stats) publishes nothing.
          // A boundless (all-null) envelope has no min/max to publish.
          val boxed: Option[(Object, Object)] =
            if (st.lo == null) None
            else table.fields.find(_.name == name).map(_.dataType).flatMap {
              case IT if st.t == 'l' =>
                Some((Int.box(st.lo.toInt), Int.box(st.hi.toInt)))
              case LT if st.t == 'l' =>
                Some((Long.box(st.lo.toLong), Long.box(st.hi.toLong)))
              case DT if st.t == 'l' || st.t == 'd' =>
                Some((Double.box(st.lo.toDouble), Double.box(st.hi.toDouble)))
              case ST if st.t == 's' =>
                Some((
                  org.apache.spark.unsafe.types.UTF8String.fromString(st.lo),
                  org.apache.spark.unsafe.types.UTF8String.fromString(st.hi)))
              case _ => None
            }
          // null count (round 16): the merged sum, a write-time upper
          // bound on live nulls — the estimator's input, not a proof
          val nc: Option[Long] = st.nc
          if (boxed.isDefined || nc.isDefined)
            colStats.put(Expressions.column(name), new ColumnStatistics {
              override def min(): Optional[Object] =
                boxed.fold(Optional.empty[Object]())(b => Optional.of(b._1))
              override def max(): Optional[Object] =
                boxed.fold(Optional.empty[Object]())(b => Optional.of(b._2))
              override def nullCount(): OptionalLong =
                nc.fold(OptionalLong.empty())(OptionalLong.of)
            })
      }
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * 45L)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference, ColumnStatistics] =
        colStats
    }
  }

  /** TIME TRAVEL (round 13): `asOf` pins the scan to a specific retained
    * manifest version — the snapshot-isolation read the version log makes
    * free. A version beyond the current one fails loudly (typo'd travel
    * must not silently read latest). `pruneShards`/`pruneDocs`
    * (pushed-filter data skipping) then drop every file whose manifest
    * stats cannot match — stats-unknown entries always read
    * (conservative).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    // a compaction may have expired a travelled snapshot's files — fail
    // with the real reason, never a raw FileNotFound mid-job (pruned-away
    // files are exempt: they will not be read)
    val toRead = effectiveEntries()
    asOf.foreach(v => ShardSink.requireSnapshotLive(path, v, toRead))
    // cloned-in files can be released by the SOURCE's vacuum/compaction
    ShardSink.requireForeignLive(path, toRead)
    if (shardGrouped)
      // every partition must carry its key when KeyGroupedPartitioning
      // was reported — same snapshot, so eligibility cannot have flipped
      // (a runtime filter only REMOVES whole keyed partitions)
      toRead.map { e =>
        ShardSinkShardFile(
          new org.apache.hadoop.fs.Path(path, e.file).toString,
          if (e.hasDeletes) new org.apache.hadoop.fs.Path(path, e.dv).toString else "",
          e.shardMin, e.file): InputPartition
      }.toArray
    else toRead.map(e => ShardSink.partitionOf(path, e)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ShardSinkReaderFactory(path, required, table)

  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ShardSinkTailStream(path)
}

/** Standalone serializable reader factory shared by the batch scan, the
  * version-tail stream and the row-level-operation scans: one partition =
  * one committed TSV file. `required` is the (possibly pruned, possibly
  * metadata-extended) output schema — data columns by name, plus the
  * positional row identity every merge-on-read write keys on:
  * `_file` = the committed file's manifest name, `_pos` = the PHYSICAL
  * 0-based line index (vector positions are physical, so `_pos` stays
  * stable no matter how many rows a vector already hides).
  */
case class ShardSinkReaderFactory(
    path: String, required: StructType = DocGen.schema,
    table: StructType = DocGen.schema) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (file, dv, name) = partition match {
      case f: ShardSinkFile => (f.file, f.dv, f.name)
      case f: ShardSinkShardFile => (f.file, f.dv, f.name)
    }
    val fp = new org.apache.hadoop.fs.Path(file)
    ShardSink.dataFileReadCount.incrementAndGet()
    val all = SinkFs.readLines(fp)
    // merge-on-read: drop the delete vector's positions at read time —
    // TSV line index IS the stable row position the vector records
    val dead: Set[Int] =
      if (dv.isEmpty) Set.empty
      else ShardSink.readDeleteVector(new org.apache.hadoop.fs.Path(dv))
    val live = all.zipWithIndex.filter { case (_, i) => !dead.contains(i) }
    // _file must carry the MANIFEST entry name (delta commits match it
    // back to entries): a cloned-in file's name is its absolute path
    val fileName = UTF8String.fromString(if (name.nonEmpty) name else fp.getName)
    // required column → (TSV position by the table's schema order, type);
    // -1 = metadata column. Pre-evolution files are simply SHORTER rows:
    // a position past the line's width (or an explicit \N cell) is null.
    val cols: Array[(Int, org.apache.spark.sql.types.DataType)] =
      required.fields.map { fld =>
        fld.name match {
          case "_file" => (-1, fld.dataType)
          case "_pos" => (-2, fld.dataType)
          case n => (table.fieldIndex(n), fld.dataType)
        }
      }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < live.size }
      override def get(): InternalRow = {
        val (line, pos) = live(i)
        val parts = line.split("\t", -1)
        val row = new GenericInternalRow(cols.length)
        var c = 0
        while (c < cols.length) {
          cols(c) match {
            case (-1, _) => row.update(c, fileName)
            case (-2, _) => row.update(c, pos.toLong)
            case (p, _) if p >= parts.length => row.update(c, null)
            case (p, _) if parts(p) == ShardSink.NullCell => row.update(c, null)
            case (p, org.apache.spark.sql.types.LongType) => row.update(c, parts(p).toLong)
            case (p, org.apache.spark.sql.types.IntegerType) => row.update(c, parts(p).toInt)
            case (p, org.apache.spark.sql.types.DoubleType) => row.update(c, parts(p).toDouble)
            case (p, _) => row.update(c, UTF8String.fromString(parts(p)))
          }
          c += 1
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}

/** One file's contribution to a change-feed batch: `only` = emit exactly
  * these physical positions (delete events); otherwise emit all lines
  * except `skip` (insert events, skipping the commit's own vector).
  */
case class ShardSinkChangeFile(
    file: String, changeType: String, version: Long,
    only: Option[Seq[Int]], skip: Seq[Int]) extends InputPartition

/** A commit's recorded change sidecar (`cdc-*.tsv`): each line carries
  * its OWN change type (`change_type\tdoc\tshard\tbody`) — the complete
  * change record of version `version`.
  */
case class ShardSinkChangeSidecar(file: String, version: Long) extends InputPartition

case class ShardSinkChangeReaderFactory(
    path: String, table: StructType = DocGen.schema) extends PartitionReaderFactory {
  private def reader(rows: IndexedSeq[(String, String)], version: Long)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val n = table.length
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.size }
      override def get(): InternalRow = {
        val (ct, line) = rows(i)
        val parts = line.split("\t", -1)
        val row = new GenericInternalRow(n + 2)
        var c = 0
        while (c < n) {
          // pre-evolution change rows are shorter: null-fill, like reads
          if (c >= parts.length || parts(c) == ShardSink.NullCell) row.update(c, null)
          else table.fields(c).dataType match {
            case org.apache.spark.sql.types.LongType => row.update(c, parts(c).toLong)
            case org.apache.spark.sql.types.IntegerType => row.update(c, parts(c).toInt)
            case org.apache.spark.sql.types.DoubleType => row.update(c, parts(c).toDouble)
            case _ => row.update(c, UTF8String.fromString(parts(c)))
          }
          c += 1
        }
        row.update(n, UTF8String.fromString(ct))
        row.update(n + 1, version)
        row
      }
      override def close(): Unit = ()
    }

  /** A compaction/vacuum released this change file between a consumer's
    * PLAN and its EXECUTION (the tail windows a spliced MV rewrite pins,
    * a refresh racing maintenance) — named instead of a raw
    * FileNotFoundException out of a task (round 19; state segments get
    * the same treatment in [[MvStateSweptException]]).
    */
  private def named[A](file: String)(body: => A): A =
    try body
    catch {
      case _: java.io.FileNotFoundException =>
        throw new RuntimeException(
          s"change-feed file '$file' of $path was compacted/vacuumed away " +
            "between plan and execution — re-run the query (it will " +
            "re-resolve, or fall back to the base scan); run maintenance " +
            "with retention covering in-flight readers")
    }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case s: ShardSinkChangeSidecar =>
        // counted like data reads: the MV spec proves refresh IO is
        // O(changed files), and change partitions are that IO
        ShardSink.dataFileReadCount.incrementAndGet()
        val rows = named(s.file)(
          SinkFs.readLines(new org.apache.hadoop.fs.Path(s.file))).map { l =>
          val cut = l.indexOf('\t')
          (l.substring(0, cut), l.substring(cut + 1))
        }
        reader(rows.toIndexedSeq, s.version)
      case f: ShardSinkChangeFile =>
        ShardSink.dataFileReadCount.incrementAndGet()
        val all = named(f.file)(SinkFs.readLines(new org.apache.hadoop.fs.Path(f.file)))
        val picked = f.only match {
          case Some(ps) => ps.filter(_ < all.size).map(all)
          case None =>
            val dead = f.skip.toSet
            all.zipWithIndex.collect { case (l, i) if !dead.contains(i) => l }
        }
        reader(picked.map(l => (f.changeType, l)).toIndexedSeq, f.version)
    }
}

/** The change-feed scan (`readChangeFeed=true`): batch reads the changes
  * of versions (changeFeedFrom, changeFeedTo] (defaults: 0, current);
  * streaming tails the table one COMMIT's changes per micro-batch over
  * the same durable version offsets as the plain tail.
  */
class ShardSinkChangeScan(path: String, fromV: Long, toV: Option[Long])
  extends Scan with Batch {
  override def readSchema(): StructType = ShardSink.changeSchemaOf(path)
  override def description(): String =
    s"ShardSinkChangeScan[$path, versions ($fromV, ${toV.getOrElse("current")}]]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val to = toV.getOrElse(ShardSink.currentManifestVersion(path))
    val current = ShardSink.currentManifestVersion(path)
    require(fromV >= 0 && to <= current,
      s"change feed ($fromV, $to] out of range: table at $path has versions 1..$current")
    ShardSink.changePartitions(path, fromV, to).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    ShardSinkChangeReaderFactory(path, ShardSink.tableSchema(path))
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ShardSinkTailStream(path, cdc = true)
}

/** Offset for the sink's version-tail stream: a manifest version number. */
case class SinkVersionOffset(v: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** STREAMING READ of the landing zone — tailing the table by manifest
  * version, the payoff of retaining the version sequence: each committed
  * version is a snapshot, so the batch for offsets (a, b] is exactly the
  * files present in manifest b and absent from manifest a. One version
  * per micro-batch by default ([[SupportsAdmissionControl]] — the
  * rate-source pattern); Trigger.Once/AvailableNow drains to the current
  * version in one batch. Exactly-once for the append-only workloads a
  * landing zone runs (Append jobs and streaming epochs only add files):
  * offsets are durable version numbers and replay re-reads the same
  * immutable files. DML rewrites (`part-r`/`part-d`) and truncates are
  * OUT OF SCOPE for tailing and are skipped — a rewritten file re-emits
  * rows a tailer already saw; CDC-style delta events would need the
  * delta-based write path. Documented, not hidden.
  */
class ShardSinkTailStream(path: String, cdc: Boolean = false)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def appendOnly(f: String): Boolean =
    f.startsWith("part-b") || f.startsWith("part-e")

  /** A FRESH tail starts at the retention horizon, not version 0: on a
    * compacted table the pre-horizon file deltas are gone, and the
    * horizon snapshot is exactly what retention still promises a new
    * consumer. Uncompacted tables start at 0 — the full history.
    */
  override def initialOffset(): Offset =
    SinkVersionOffset(ShardSink.horizonOf(path) - 1L)
  // the admission unit is a manifest VERSION (one commit per trigger —
  // the rate-source pattern); maxFiles(1) is the closest ReadLimit
  // vocabulary Spark has for "one commit's worth"
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(1)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SinkVersionOffset].v
    val current = math.max(from, ShardSink.currentManifestVersion(path))
    import org.apache.spark.sql.connector.read.streaming.ReadAllAvailable
    limit match {
      case _: ReadAllAvailable => SinkVersionOffset(current)
      case _ => SinkVersionOffset(math.min(current, from + 1))
    }
  }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")
  override def reportLatestOffset(): Offset =
    SinkVersionOffset(ShardSink.currentManifestVersion(path))
  override def deserializeOffset(json: String): Offset =
    SinkVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SinkVersionOffset].v
    val b = end.asInstanceOf[SinkVersionOffset].v
    // a checkpointed position older than the retention horizon cannot be
    // resumed — its file deltas were released by compaction. Refuse with
    // the horizon named, never a raw FileNotFound mid-stream (the CDC
    // path enforces the same inside changePartitions).
    val hz = ShardSink.horizonOf(path)
    require(b <= a || a + 1 >= hz,
      s"tail position $a at $path expired: the retention horizon is $hz — " +
        "restart the stream from a fresh checkpoint to resume at the horizon")
    // CDC mode: the full change feed of versions (a, b] — inserts AND
    // merge-on-read deletes (the vector diffs the plain tail cannot see)
    if (cdc) return ShardSink.changePartitions(path, a, b).toArray
    val prior = ShardSink.entriesAtVersion(path, a).map(_.file).toSet
    // foreign (cloned-in) entries count as appends: they only ever enter
    // via a clone-creation commit, whose rows are bulk-loaded new data
    // for THIS table — a fresh tail of a clone must emit them, not
    // silently skip on the name prefix
    val delta = ShardSink.entriesAtVersion(path, b)
      .filter(e => (appendOnly(e.file) || ShardSink.isForeign(e.file)) &&
        !prior.contains(e.file))
    ShardSink.requireForeignLive(path, delta)
    delta.map(e => ShardSink.partitionOf(path, e)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val table = ShardSink.tableSchema(path)
    if (cdc) ShardSinkChangeReaderFactory(path, table)
    else ShardSinkReaderFactory(path, table, table)
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Writable V2 catalog over shard-sink landing zones: identifiers map to
  * directories under a root taken from the catalog options
  * (`spark.sql.catalog.<name>.root`). The catalog is what unlocks the
  * SQL row-level surface — `DELETE FROM <cat>.<table> WHERE …` and
  * `df.writeTo("<cat>.<table>").append()` both resolve through
  * [[ShardSinkCatalog.loadTable]]; the TableProvider path
  * (`format(...).option("path", …)`) has no identifier for SQL DML to
  * name. Tables exist implicitly (a fresh identifier is an empty landing
  * zone — the manifest protocol already treats manifest-absent as
  * no-data), so create/drop are trivial metadata ops.
  */
class ShardSinkCatalog extends org.apache.spark.sql.connector.catalog.TableCatalog
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog {
  import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, TableChange, TableInfo}

  private var catalogName = "graft_sink"
  private var root = ""
  private var deleteMode = "copy-on-write"
  private var rloMode = "copy-on-write"
  private var cdfEnabled = false

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_sink_cat").getPath)
    // catalog-level defaults for the DML strategies (Iceberg's
    // write.delete.mode / write.update.mode / write.merge.mode as catalog
    // options): copy-on-write | merge-on-read. `delete.mode` governs the
    // metadata DELETE path, `rlo.mode` the UPDATE/MERGE/rewrite-DELETE
    // row-level operations. `cdf.enabled` (default false, Delta's
    // enableChangeDataFeed) makes DML commits record their change
    // sidecars so readChangeFeed is exact over CoW rewrites and delta
    // updates carry pre/post images.
    deleteMode = Option(options.get("delete.mode")).getOrElse("copy-on-write")
    rloMode = Option(options.get("rlo.mode")).getOrElse("copy-on-write")
    cdfEnabled = options.getBoolean("cdf.enabled", false)
  }
  override def name(): String = catalogName

  private def dirOf(ident: Identifier): String =
    new java.io.File(root, (ident.namespace() :+ ident.name()).mkString("_")).getPath

  override def loadTable(ident: Identifier): Table = {
    // Iceberg-style METADATA TABLES: `<cat>.<table>.files` / `.history`
    // / `.tags` / `.constraints` — the extra identifier level serves the
    // manifest state as a SQL-queryable table ([[ShardSinkMetaTable]]).
    // Only when the PARENT table has commits: a genuinely empty landing
    // zone keeps the plain-table resolution (same shadowing rule as
    // Iceberg's metadata suffixes).
    if (ident.namespace().nonEmpty && ShardSinkMetaTable.Kinds(ident.name())) {
      val parent = new java.io.File(root, ident.namespace().mkString("_")).getPath
      if (ShardSink.currentManifestVersion(parent) >= 1L)
        return new ShardSinkMetaTable(parent, ident.name())
    }
    new ShardSinkTable(dirOf(ident),
      deleteMode = deleteMode, rloMode = rloMode, cdfEnabled = cdfEnabled)
  }
  /** SQL time travel: `SELECT … FROM <cat>.<t> VERSION AS OF n` resolves
    * here — the table is pinned to retained manifest version n. A
    * non-numeric version is a TAG name (`VERSION AS OF 'prod'` — string
    * refs share the version-travel spelling, Iceberg-style).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirOf(ident)
    val v =
      if (version.nonEmpty && version.forall(_.isDigit)) version.toLong
      else ShardSink.resolveTag(dir, version)
    new ShardSinkTable(dir, Some(v), deleteMode, rloMode, cdfEnabled)
  }
  /** SQL `TIMESTAMP AS OF ts`: Spark hands the evaluated instant in
    * MICROseconds; resolve it to the newest manifest version committed
    * at-or-before it ([[ShardSink.versionAtTimestamp]]) and pin.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = dirOf(ident)
    val v = ShardSink.versionAtTimestamp(dir, Math.floorDiv(timestampMicros, 1000L))
    new ShardSinkTable(dir, Some(v), deleteMode, rloMode, cdfEnabled)
  }
  /** A table EXISTS when its directory does (a created-empty or written
    * landing zone); a never-touched identifier does not — which is what
    * lets `CREATE TABLE … AS SELECT` through the analyzer's existence
    * check. Reads and writes still resolve ANY identifier ([[loadTable]]
    * never throws): a fresh identifier is an empty landing zone, the
    * manifest protocol's manifest-absent = no-data state.
    */
  override def tableExists(ident: Identifier): Boolean =
    new java.io.File(dirOf(ident)).exists()
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Identifier.of(namespace, d.getName))
  /** CREATE TABLE (incl. the CTAS path — the analyzer routes here after
    * [[tableExists]] says no): the (doc_id, shard, body) core is
    * required as the schema PREFIX; any FURTHER columns are persisted as
    * schema-evolution flips on the fresh table, so
    * `CREATE TABLE t AS SELECT … extra columns` round-trips the evolved
    * shape exactly (the CTAS write then lands against it by name).
    */
  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val core = DocGen.schema.fields.map(f => (f.name, f.dataType))
    require(
      schema.isEmpty ||
        schema.fields.take(core.length).map(f => (f.name, f.dataType)).sameElements(core),
      s"shard sink tables start with the ${DocGen.schema.simpleString} core " +
        "(further columns evolve; reorders/renames of the core do not)")
    val dir = dirOf(ident)
    // the directory IS the existence marker, so its creation must be the
    // election: two concurrent CTAS of one identifier race the atomic
    // createDirectory and exactly one proceeds — the same no-TOCTOU
    // discipline as the manifest flip's fresh-name rename
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d.getParent)
    try java.nio.file.Files.createDirectory(d)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
          Array(name()) ++ ident.namespace() :+ ident.name())
    }
    schema.fields.drop(core.length).foreach(f => ShardSink.addColumn(dir, f.name, f.dataType))
    loadTable(ident)
  }
  /** SCHEMA EVOLUTION (round 14): `ALTER TABLE … ADD COLUMN` (appends a
    * nullable column; pure metadata — see [[ShardSink.addColumn]]),
    * `RENAME COLUMN` and type WIDENING (int→bigint, int/bigint→double)
    * on added columns. Drops, reorders and narrowings are refused
    * loudly: columns map to TSV positions, and the (doc_id, shard, body)
    * core is load-bearing.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirOf(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"shard sink columns are top-level, got ${add.fieldNames.mkString(".")}")
        ShardSink.addColumn(dir, add.fieldNames.head, add.dataType)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames.length == 1,
          s"shard sink columns are top-level, got ${rn.fieldNames.mkString(".")}")
        ShardSink.renameColumn(dir, rn.fieldNames.head, rn.newName)
      case up: TableChange.UpdateColumnType =>
        require(up.fieldNames.length == 1,
          s"shard sink columns are top-level, got ${up.fieldNames.mkString(".")}")
        ShardSink.widenColumn(dir, up.fieldNames.head, up.newDataType)
      // RESTORE's SQL spelling (Spark has no RESTORE statement; Delta
      // ships one via a parser extension): SET TBLPROPERTIES
      // ('graft.restore' = '<version-or-tag>') rolls the table back to
      // that snapshot as a new commit — see [[ShardSink.restore]]
      case sp: TableChange.SetProperty if sp.property == "graft.restore" =>
        ShardSink.restore(dir,
          if (sp.value.nonEmpty && sp.value.forall(_.isDigit)) sp.value.toLong
          else ShardSink.resolveTag(dir, sp.value))
      // TAG management (Iceberg refs): SET TBLPROPERTIES
      // ('graft.tag.<name>' = '<version>') creates an immutable tag,
      // UNSET TBLPROPERTIES ('graft.tag.<name>') drops it
      case sp: TableChange.SetProperty if sp.property.startsWith("graft.tag.") =>
        ShardSink.createTag(dir, sp.property.stripPrefix("graft.tag."), sp.value.toLong)
      case rp: TableChange.RemoveProperty if rp.property.startsWith("graft.tag.") =>
        ShardSink.dropTag(dir, rp.property.stripPrefix("graft.tag."))
      // CHECK constraints (Delta ADD/DROP CONSTRAINT): SET TBLPROPERTIES
      // ('graft.constraint.<name>' = '<pred>') adds one (validating
      // existing rows), UNSET drops it — see [[SinkConstraint]]
      case sp: TableChange.SetProperty if sp.property.startsWith("graft.constraint.") =>
        ShardSink.addConstraint(dir, sp.property.stripPrefix("graft.constraint."), sp.value)
      // SHALLOW CLONE's SQL spelling (tables exist implicitly in this
      // catalog, so CREATE TABLE never fires — property-DDL like restore
      // and tags): ALTER TABLE <cat>.<t> SET TBLPROPERTIES
      // ('graft.clone' = '<src-dir>[@<version-or-tag>]') turns the EMPTY
      // table <t> into a zero-copy clone of the source snapshot —
      // schema, CHECK constraints and referenced files all come from it
      // (see [[ShardSink.cloneShallow]])
      case sp: TableChange.SetProperty if sp.property == "graft.clone.version" =>
        () // consumed by the graft.clone change in the same statement
      case sp: TableChange.SetProperty if sp.property == "graft.clone" =>
        val explicit = changes.collectFirst {
          case vp: TableChange.SetProperty if vp.property == "graft.clone.version" =>
            vp.value
        }
        val (src, version) = ShardSink.parseCloneSpec(sp.value, explicit)
        ShardSink.cloneShallow(src, dir, version)
      case rp: TableChange.RemoveProperty if rp.property.startsWith("graft.constraint.") =>
        ShardSink.dropConstraint(dir, rp.property.stripPrefix("graft.constraint."))
      // MATERIALIZED-VIEW DDL (round 19, [[SinkMvDdl]]): SET
      // TBLPROPERTIES ('graft.mv.<name>' = '<definition>') creates a
      // distributed MV at the conventional sibling dir and registers it
      // for the automatic rewrite; ('graft.mv.refresh' = '<name>')
      // refreshes one; UNSET ('graft.mv.<name>') unregisters + drops.
      case sp: TableChange.SetProperty if sp.property == "graft.mv.refresh" =>
        SinkMvDdl.refresh(
          org.apache.spark.sql.SparkSession.active, dir, sp.value)
        ()
      // re-wire a persisted MV after a JVM restart (registration is
      // in-memory; the census shows registered = false until this)
      case sp: TableChange.SetProperty if sp.property == "graft.mv.attach" =>
        SinkMvDdl.attach(dir, sp.value)
      case sp: TableChange.SetProperty if sp.property.startsWith("graft.mv.") =>
        SinkMvDdl.create(org.apache.spark.sql.SparkSession.active, dir,
          sp.property.stripPrefix("graft.mv."), sp.value)
      case rp: TableChange.RemoveProperty if rp.property.startsWith("graft.mv.") =>
        SinkMvDdl.drop(dir, rp.property.stripPrefix("graft.mv."))
      case other => throw new UnsupportedOperationException(
        "shard sink supports ADD COLUMN, RENAME COLUMN, type widening, " +
          "'graft.restore', 'graft.tag.*', 'graft.constraint.*' and " +
          s"'graft.mv.*' only, got $other")
    }
    loadTable(ident)
  }
  /** ATOMIC CTAS / RTAS ([[org.apache.spark.sql.connector.catalog.StagingTableCatalog]]):
    * with staging, Spark routes CREATE/REPLACE TABLE AS SELECT through a
    * staged handle instead of drop-create-write. The payoff is on
    * REPLACE: the swap is ONE truncate-flip on the existing version log
    * — readers see the old content or the new, never an empty window,
    * and the LOG SURVIVES (version numbering and the op trail continue,
    * vs the non-staged drop+recreate which zeroes them; pre-replace
    * snapshot FILES follow the sink's immediate-cleanup retention like
    * any truncate — travel to them fails loudly as expired, never
    * silently empty). Columns beyond the current schema evolve INSIDE
    * the staged write's truncate commit (the stage reports the merged
    * shape as a PENDING schema; nothing is persisted at stage time);
    * previously-evolved columns absent from the replacement query stay
    * (null-filled) — the log keeps reading old snapshots under their
    * true shapes. A failed staged CTAS drops the half-created table; a
    * failed staged REPLACE leaves the previous content AND schema fully
    * intact — the truncate flip that would have carried both never
    * happened (round 15; previously alter flips persisted at stage time
    * and survived an aborted stage).
    */
  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        Array(name()) ++ ident.namespace() :+ ident.name())
    createTable(ident, info.schema(), info.partitions(), info.properties())
    staged(ident, forceTruncate = false, dropOnAbort = true)
  }

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable = {
    val dir = dirOf(ident)
    val core = DocGen.schema.fields.map(f => (f.name, f.dataType))
    require(
      info.schema().fields.take(core.length).map(f => (f.name, f.dataType))
        .sameElements(core),
      s"shard sink tables start with the ${DocGen.schema.simpleString} core")
    // schema evolution rides the staged write's OWN truncate commit (the
    // table is built with the merged schema as PENDING): a failed staged
    // REPLACE leaves both the previous content AND the previous schema
    // untouched — the r14 rollback gap (alter flips persisted at stage
    // time) is closed. Previously-evolved columns absent from the
    // replacement query stay (Spark null-fills them by name against the
    // staged shape), so the log keeps reading old snapshots truthfully.
    val cur = ShardSink.tableSchema(dir)
    val curNames = cur.fieldNames.toSet
    val merged = StructType(cur.fields ++
      info.schema().fields.drop(core.length)
        .filterNot(f => curNames.contains(f.name))
        .map(f => org.apache.spark.sql.types.StructField(f.name, f.dataType,
          nullable = true)))
    staged(ident, forceTruncate = true, dropOnAbort = false,
      pendingSchema = Some(merged), pendingBasis = Some(ShardSink.schemaString(cur)))
  }

  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    if (tableExists(ident)) stageReplace(ident, info) else stageCreate(ident, info)

  private def staged(
      ident: Identifier, forceTruncate: Boolean, dropOnAbort: Boolean,
      pendingSchema: Option[StructType] = None,
      pendingBasis: Option[String] = None): StagedTable = {
    val t =
      if (pendingSchema.isDefined)
        new ShardSinkTable(dirOf(ident), deleteMode = deleteMode, rloMode = rloMode,
          cdfEnabled = cdfEnabled, pendingSchema = pendingSchema,
          pendingBasis = pendingBasis)
      else loadTable(ident)
    new StagedTable with SupportsRead with SupportsWrite {
      override def name(): String = t.name()
      override def schema(): StructType = t.schema()
      override def capabilities(): util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
        t.capabilities()
      override def properties(): util.Map[String, String] = t.properties()
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        t.asInstanceOf[SupportsRead].newScanBuilder(options)
      override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
        val b = t.asInstanceOf[SupportsWrite].newWriteBuilder(info)
        if (forceTruncate)
          b.asInstanceOf[org.apache.spark.sql.connector.write.SupportsTruncate].truncate()
        else b
      }
      // the write's own manifest flip IS the atomic publication: staged
      // commit has nothing left to do, staged abort undoes the CREATE
      override def commitStagedChanges(): Unit = ()
      override def abortStagedChanges(): Unit = if (dropOnAbort) { dropTable(ident); () }
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = new java.io.File(dirOf(ident))
    val existed = d.exists()
    SinkFs.deleteRecursively(d)
    existed
  }
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("rename not supported")
}

/** GROUP-BASED row-level operations (round 13 — the copy-on-write DML
  * rung: SQL `UPDATE` and `MERGE INTO`, plus the rewrite fallback for
  * DELETEs whose predicate is outside [[ShardSink.deletePredicate]]'s
  * metadata-only class). Spark's rewrite plans read the table through
  * THIS operation's scan, compute the full replacement rows for every
  * group the scan produced, and write them through this operation's
  * write — commit then atomically swaps the read files for the new ones
  * in the manifest. The scan and write are linked by the operation
  * instance: [[ShardSinkRowLevelScan.planInputPartitions]] records the
  * file set it planned, and the replacement commit replaces exactly that
  * set (a thunk, so late runtime pruning is honored). Without per-file
  * statistics the affected-group set is every committed file — a
  * whole-table copy-on-write, correct and honestly coarse; a 100 TB
  * deployment adds min/max stats per manifest entry and prunes groups at
  * planning, which the shard-whole layout from
  * [[ShardSinkWrite.requiredDistribution]] makes precise for shard-keyed
  * predicates.
  */
class ShardSinkRowLevelOperation(
    path: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    cdf: Boolean = false)
  extends org.apache.spark.sql.connector.write.RowLevelOperation {

  @volatile private var planned: Seq[String] = Seq.empty
  private[sources] def recordPlanned(files: Seq[String]): Unit = planned = files

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"ShardSinkRowLevelOperation[$cmd, $path]"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ShardSinkRowLevelScan(path, ShardSinkRowLevelOperation.this)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new ShardSinkReplaceDataWrite(path, info.queryId(), () => planned, cdf)
    }
}

/** The operation's read side: the ordinary manifest-trusting scan, plus
  * two jobs — (1) RUNTIME GROUP FILTERING: Spark's
  * `RowLevelOperationRuntimeGroupFiltering` rule runs a matching-groups
  * subquery over the DML condition and hands the matching `shard` values
  * back through [[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]];
  * files whose manifest shard range cannot intersect are pruned BEFORE
  * the rewrite reads anything, so a shard-scoped UPDATE/MERGE/DELETE
  * rewrites only the affected files instead of the whole table (the
  * statistics-pruned copy-on-write every table format runs at scale);
  * (2) bookkeeping — the file set it ultimately plans IS the
  * affected-group set the replacement commit swaps out.
  */
class ShardSinkRowLevelScan(path: String, op: ShardSinkRowLevelOperation)
  extends ShardSinkScan(path,
    required = ShardSink.tableSchema(path), table = ShardSink.tableSchema(path))
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  @volatile private var shardFilter: Option[Set[Int]] = None

  override def description(): String = s"ShardSinkRowLevelScan[$path]"

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column("shard"))

  override def filter(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    filters.collectFirst {
      case In("shard", vs) => vs.collect { case n: Number => n.intValue }.toSet
      case EqualTo("shard", v: Number) => Set(v.intValue)
    }.foreach(s => shardFilter = Some(s))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val entries = ShardSink.committedEntries(path)
      .filter(e => shardFilter.forall(e.mayContainShard))
    // a CoW rewrite over a clone reads foreign files: same named error
    // as the batch scan when the source released them
    ShardSink.requireForeignLive(path, entries)
    op.recordPlanned(entries.map(_.file))
    // dv passed through: a copy-on-write rewrite over a file carrying a
    // merge-on-read delete vector must NOT resurrect the deleted rows
    entries
      .map(e => ShardSink.partitionOf(path, e))
      .toArray
  }
}

/** The operation's write side: same temp-file/task-commit protocol as the
  * batch write, same declared clustered-by-shard distribution (replacement
  * files stay shard-whole and id-ordered), but commit REPLACES the
  * affected files instead of appending — old entries minus the files the
  * operation scan read, plus the replacement files, one atomic manifest
  * flip, physical cleanup after.
  */
class ShardSinkReplaceDataWrite(
    path: String, queryId: String, affected: () => Seq[String], cdf: Boolean = false)
  extends Write with BatchWrite
  with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.hadoop.fs.Path

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    org.apache.spark.sql.connector.distributions.Distributions.clustered(
      Array(Expressions.identity("shard")))
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(
      Expressions.sort(
        Expressions.column("shard"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING),
      Expressions.sort(
        Expressions.column("doc_id"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

  override def toBatch: BatchWrite = this

  // pinned at factory-build: rewritten rows (UPDATE/MERGE can set any
  // value) re-validate against every CHECK constraint in force
  private val pinnedCks = ShardSink.currentConstraints(path)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ShardSinkWriterFactory(path, s"rlo-$queryId", trailingCols = true,
      table = ShardSink.tableSchema(path), constraints = pinnedCks)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val replaced = affected().toSet
    val finals = ShardSink.nonEmpty(messages).zipWithIndex.map { case (m, i) =>
      val c = m.asInstanceOf[ShardSinkCommit]
      val dest = new Path(path, s"part-r$queryId-$i.tsv")
      SinkFs.moveOver(new Path(c.tempPath), dest)
      c.toEntry(dest.getName)
    }
    // base pinned at commit-read; additionally every file the operation
    // SCAN read must still be in the base — a concurrent DML/compaction
    // that rewrote one of them between scan and commit invalidates the
    // replacement rows, so this commit aborts loudly instead of
    // resurrecting superseded data
    val (baseV, base) = ShardSink.resolveBase(path)
    val addedCks = ShardSink.constraintsAt(path, baseV).filterNot(pinnedCks.contains)
    if (addedCks.nonEmpty)
      throw new IllegalStateException(
        s"ShardSink row-level operation at $path conflicts with a concurrent " +
          s"ADD CONSTRAINT (${addedCks.map(_._1).mkString(", ")}); aborted loudly — re-run")
    val (swapped, kept) = base.partition(e => replaced.contains(e.file))
    val vanished = replaced -- swapped.map(_.file).toSet
    if (vanished.nonEmpty)
      throw new IllegalStateException(
        s"ShardSink row-level operation at $path conflicts with a concurrent " +
          s"commit: files read by the operation are no longer current " +
          s"(${vanished.toSeq.sorted.mkString(", ")}); aborted loudly — re-run")
    // CHANGE RECORD (only when the table opted into CDF — Delta's
    // enableChangeDataFeed): a group-based rewrite replaces whole files,
    // most of whose rows are carried over verbatim — the commit's actual
    // changes are the multiset difference between the swapped-out live
    // rows and the swapped-in rows. Rows that vanished are `delete`
    // events, rows that appeared are `insert` events (an UPDATE surfaces
    // as the pair; Spark's group-based plan does not tell the connector
    // which carried rows were modified, so exact pre/post pairing is the
    // delta path's job — rlo.mode=merge-on-read). Computed driver-side
    // over data the rewrite already materialized; a 100 TB deployment
    // runs the same diff inside the rewrite job. Without CDF the diff is
    // skipped entirely and a later change-feed read over this version
    // fails loudly instead of missing rows.
    val cdc = if (!cdf) None else {
      val before = scala.collection.mutable.Map.empty[String, Int]
      swapped.foreach(e => ShardSink.liveLines(path, e).foreach { l =>
        before(l) = before.getOrElse(l, 0) + 1
      })
      val inserted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      finals.foreach(e => SinkFs.readLines(new Path(path, e.file)).foreach { l =>
        val n = before.getOrElse(l, 0)
        if (n > 0) before(l) = n - 1 else inserted += (("insert", l))
      })
      val removed = before.iterator
        .flatMap { case (l, n) => Iterator.fill(n)(("delete", l)) }.toSeq
      ShardSink.writeCdcSidecar(path, s"r$queryId", removed ++ inserted.toSeq)
    }
    ShardSink.flipFromBase(path, baseV, kept ++ finals, s"r$queryId", cdc = cdc,
      op = Some("rewrite"))
    // replaced data files AND their (now folded-in) delete vectors;
    // cloned-in files are manifest-only removals (the source keeps them)
    ShardSink.deleteOwned(path,
      swapped.flatMap(e => e.file +: (if (e.hasDeletes) Seq(e.dv) else Nil)))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case c: ShardSinkCommit => SinkFs.delete(new Path(c.tempPath))
      case _ =>
    }
}

/** DELTA-BASED row-level operations (round 13 — the merge-on-read rung
  * for SQL UPDATE / MERGE / rewrite-DELETE, Spark's
  * [[org.apache.spark.sql.connector.write.SupportsDelta]]): instead of
  * rewriting every affected file whole
  * ([[ShardSinkRowLevelOperation]]'s group-based copy-on-write), the
  * rewrite plan feeds the writer individual row DELTAS — delete(rowId)
  * and insert(row), with updates represented as delete+insert
  * ([[representUpdateAsDeleteAndInsert]]) — and the commit lands as
  * positional delete vectors over the untouched originals plus one
  * appended file of new rows. The row identity is PURELY POSITIONAL:
  * `rowId = (_file, _pos)` over the table's metadata columns, the same
  * design Iceberg's position deltas use, sound on duplicate-id tables
  * where a key-based row id is not. At 100 TB this is the
  * write-amplification trade every format documents: an UPDATE touching
  * 0.1% of rows writes ~0.1% of the data instead of every straddled
  * file, at the cost of read-side vector subtraction until
  * [[ShardSink.compact]] folds it.
  */
class ShardSinkDeltaOperation(
    path: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command,
    cdf: Boolean = false)
  extends org.apache.spark.sql.connector.write.RowLevelOperation with SupportsDelta {

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd
  override def description(): String = s"ShardSinkDeltaOperation[$cmd, $path]"

  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))
  // native update rows (round 14): Spark hands UPDATE operations to
  // DeltaWriter.update with the row id AND the new row, which is what
  // lets the change feed emit exact update_preimage/update_postimage
  // pairs instead of collapsing every update to delete+insert
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
      with org.apache.spark.sql.connector.read.SupportsPushDownFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      private val table: StructType = ShardSink.tableSchema(path)
      private var prune: Option[Set[Int]] = None
      private var pruneDocs: Option[(Long, Long)] = None
      private var pruneColPreds: Seq[SinkColStats.ColPred] = Nil
      private var required: StructType = table
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        prune = ShardSink.shardPruneSet(filters)
        pruneDocs = ShardSink.docPruneRange(filters)
        // a DML condition on a payload column (`WHERE lang = 'x'`) skips
        // whole files here: a pruned file holds no row the operation
        // could touch, so excluding it from the rewrite read is exact
        pruneColPreds = SinkColStats.predsOf(filters, table)
        filters // residual — skipping is file-granular
      }
      override def pushedFilters(): Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema // data columns + the (_file, _pos) rowId
      override def build(): Scan =
        new ShardSinkScan(path, None, prune, required, pruneDocs, table,
          pruneCols = pruneColPreds)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new ShardSinkDeltaWrite(path, info, cdf)
    }
}

/** Task commit for a delta write: per-file deleted positions observed by
  * this task, plus the task's appended-rows temp file (same protocol as
  * the batch write).
  */
case class ShardSinkDeltaCommit(
    deletes: Map[String, Seq[Long]],
    tempPath: String, rows: Long, shardMin: Int = -1, shardMax: Int = -1,
    docMin: Long = -1L, docMax: Long = -1L, bf: String = "",
    // UPDATE operations: file → (physical position of the old row, the
    // new row's TSV line). The position also folds into the file's
    // delete vector; the line also landed in this task's appended file —
    // this pairing exists so the commit can record exact
    // update_preimage/update_postimage change events.
    updates: Map[String, Seq[(Long, String)]] = Map.empty,
    cs: String = "")
  extends WriterCommitMessage

class ShardSinkDeltaWrite(path: String, info: LogicalWriteInfo, cdf: Boolean = false)
  extends Write with DeltaWrite with DeltaBatchWrite {
  import org.apache.hadoop.fs.Path

  override def toBatch: DeltaBatchWrite = this

  private val pinnedCks = ShardSink.currentConstraints(path)

  override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory = {
    val idSchema = info.rowIdSchema().orElseThrow(() =>
      new IllegalStateException("delta write without a rowId schema"))
    val table = ShardSink.tableSchema(path)
    ShardSinkDeltaWriterFactory(
      path, info.queryId(),
      idSchema.fieldIndex("_file"), idSchema.fieldIndex("_pos"),
      // table column i → its physical position in the incoming data row
      table.fields.map(f => info.schema().fieldIndex(f.name)), table, cdf,
      pinnedCks)
  }

  /** Driver commit: union each file's deleted positions into its (new)
    * delete vector, drop entries whose every live row died (data files
    * stay — MOR never destroys data), append the insert files, ONE
    * manifest flip. Entry `rows` stays the live count throughout.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: ShardSinkDeltaCommit => m }
    val allUpd = scala.collection.mutable.Map.empty[String, Seq[(Long, String)]]
    msgs.foreach(_.updates.foreach { case (f, us) =>
      allUpd(f) = allUpd.getOrElse(f, Seq.empty) ++ us
    })
    // update positions are deletions of the old row versions: fold them
    // into the vectors alongside the pure deletes
    val allDel = scala.collection.mutable.Map.empty[String, Set[Int]]
    msgs.foreach(_.deletes.foreach { case (f, ps) =>
      allDel(f) = allDel.getOrElse(f, Set.empty) ++ ps.map(_.toInt)
    })
    allUpd.foreach { case (f, us) =>
      allDel(f) = allDel.getOrElse(f, Set.empty) ++ us.map(_._1.toInt)
    }
    val inserts = msgs.filter(_.rows > 0L).zipWithIndex.map { case (m, i) =>
      val dest = new Path(path, s"part-u${info.queryId()}-$i.tsv")
      SinkFs.moveOver(new Path(m.tempPath), dest)
      SinkEntry(dest.getName, m.rows, m.shardMin, m.shardMax, "", m.docMin, m.docMax,
        bf = m.bf, cs = m.cs)
    }
    msgs.filter(_.rows == 0L).foreach(m => SinkFs.delete(new Path(m.tempPath)))
    val gen = ShardSink.nextMorGen()
    var k = 0
    // base pinned at commit-read; a delete targeting a file no longer in
    // the base means a concurrent commit rewrote rows this operation's
    // positions were resolved against — positional deletes against the
    // rewritten layout would hit the WRONG rows, so abort loudly
    val (baseV, base) = ShardSink.resolveBase(path)
    val addedCks = ShardSink.constraintsAt(path, baseV).filterNot(pinnedCks.contains)
    if (addedCks.nonEmpty)
      throw new IllegalStateException(
        s"ShardSink delta commit at $path conflicts with a concurrent " +
          s"ADD CONSTRAINT (${addedCks.map(_._1).mkString(", ")}); aborted loudly — re-run")
    val vanished = allDel.keySet -- base.map(_.file).toSet
    if (vanished.nonEmpty)
      throw new IllegalStateException(
        s"ShardSink delta commit at $path conflicts with a concurrent commit: " +
          s"positional deletes target files no longer current " +
          s"(${vanished.toSeq.sorted.mkString(", ")}); aborted loudly — re-run")
    val updated = base.flatMap { e =>
      allDel.get(e.file) match {
        case None => Some(e)
        case Some(ps) =>
          val dead: Set[Int] =
            if (e.hasDeletes) ShardSink.readDeleteVector(new Path(path, e.dv))
            else Set.empty
          val fresh = ps -- dead
          if (fresh.isEmpty) Some(e)
          else if (fresh.size >= e.rows) None // all live rows died: entry drops, file stays
          else {
            k += 1
            val nv = s"del-m$gen-$k.pos"
            ShardSink.writeDeleteVector(path, nv, (dead ++ fresh).toSeq)
            Some(e.copy(rows = e.rows - fresh.size, dv = nv))
          }
      }
    }
    // CHANGE RECORD, only when the table opted into CDF AND updates rode
    // this commit: a pure delete/insert delta derives exactly from the
    // manifest diff (vector growth / new part-u files — zero write
    // amplification), but updates need their pre/post PAIRING recorded,
    // and once a sidecar exists it is the version's complete record — so
    // it also carries the commit's plain deletes (preimages resolved
    // from the retained originals) and the appended rows that were NOT
    // update postimages, as inserts. Without CDF an update-carrying
    // commit stays derivation-only and the feed later shows it as
    // delete+insert — complete, just unpaired (Delta does the same).
    val cdc = if (!cdf || allUpd.isEmpty) None else {
      val recs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val lineCache = scala.collection.mutable.Map.empty[String, IndexedSeq[String]]
      def lineAt(f: String, pos: Long): String =
        lineCache.getOrElseUpdate(f, SinkFs.readLines(new Path(path, f)).toIndexedSeq)(pos.toInt)
      msgs.foreach(_.deletes.foreach { case (f, ps) =>
        ps.foreach(p => recs += (("delete", lineAt(f, p))))
      })
      val postCount = scala.collection.mutable.Map.empty[String, Int]
      allUpd.foreach { case (f, us) =>
        us.foreach { case (pos, post) =>
          recs += (("update_preimage", lineAt(f, pos)))
          recs += (("update_postimage", post))
          postCount(post) = postCount.getOrElse(post, 0) + 1
        }
      }
      inserts.foreach(e => SinkFs.readLines(new Path(path, e.file)).foreach { l =>
        val n = postCount.getOrElse(l, 0)
        if (n > 0) postCount(l) = n - 1 else recs += (("insert", l))
      })
      ShardSink.writeCdcSidecar(path, s"u$gen", recs.toSeq)
    }
    ShardSink.flipFromBase(path, baseV, updated ++ inserts, s"u$gen", cdc = cdc,
      op = Some("delta"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case c: ShardSinkDeltaCommit => SinkFs.delete(new Path(c.tempPath))
      case _ =>
    }
}

case class ShardSinkDeltaWriterFactory(
    path: String, queryId: String,
    fileIdx: Int, posIdx: Int, colIdx: Array[Int], table: StructType,
    cdf: Boolean = false, constraints: Seq[(String, String)] = Nil)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new ShardSinkDeltaWriter(path, queryId, partitionId, taskId,
      fileIdx, posIdx, colIdx, table, cdf, constraints)
}

/** Accumulates this task's deltas: deleted (file → physical positions)
  * in memory — vectors are tiny relative to data — and inserted rows
  * streamed to the same attempt-unique temp file the batch writer uses.
  */
class ShardSinkDeltaWriter(
    path: String, queryId: String, partitionId: Int, taskId: Long,
    fileIdx: Int, posIdx: Int, colIdx: Array[Int], table: StructType,
    cdf: Boolean = false, constraints: Seq[(String, String)] = Nil)
  extends DeltaWriter[InternalRow] {
  // UPDATE postimages and MERGE inserts both land through writeLine:
  // one enforcement point covers every row this delta can introduce
  private lazy val checkRow = SinkConstraint.enforcer(constraints, table)
  private val deletes =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
  private val tmp =
    new org.apache.hadoop.fs.Path(path, s"_tmp/delta-$queryId-p$partitionId-a$taskId.tsv")
  private var out: java.io.BufferedWriter = null
  private var rows = 0L
  private var sMin = Int.MaxValue
  private var sMax = -1
  private var dMin = Long.MaxValue
  private var dMax = -1L
  // per-file doc_id bloom — manifest-level point-lookup skipping
  private val bloom = DocBloom.empty()
  // per-column envelopes for the appended file ([[SinkColStats]])
  private val csAcc = new SinkColStats.LineAcc(table)

  private val updates = scala.collection.mutable
    .Map.empty[String, scala.collection.mutable.ArrayBuffer[(Long, String)]]

  override def delete(metadata: InternalRow, id: InternalRow): Unit =
    deletes.getOrElseUpdate(id.getUTF8String(fileIdx).toString,
      scala.collection.mutable.ArrayBuffer.empty) += id.getLong(posIdx)

  /** An UPDATE is physically a positional delete of the old row plus an
    * append of the new one — and when the table opted into CDF, the
    * PAIRING is recorded too, so the change feed can emit exact
    * `update_preimage`/`update_postimage` events (Delta CDF's update
    * shape) instead of delete+insert. Without CDF nothing is buffered:
    * the position folds into the vector like any delete.
    */
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    val line = writeLine(row)
    if (cdf)
      updates.getOrElseUpdate(id.getUTF8String(fileIdx).toString,
        scala.collection.mutable.ArrayBuffer.empty) += ((id.getLong(posIdx), line))
    else
      deletes.getOrElseUpdate(id.getUTF8String(fileIdx).toString,
        scala.collection.mutable.ArrayBuffer.empty) += id.getLong(posIdx)
  }

  override def insert(row: InternalRow): Unit = { writeLine(row); () }

  private def writeLine(row: InternalRow): String = {
    checkRow(row, colIdx)
    val shard = row.getInt(colIdx(1))
    if (shard < sMin) sMin = shard
    if (shard > sMax) sMax = shard
    val doc = row.getLong(colIdx(0))
    if (doc < dMin) dMin = doc
    if (doc > dMax) dMax = doc
    DocBloom.insert(bloom, doc)
    if (out == null) out = SinkFs.create(tmp)
    val line = ShardSink.serializeRow(row, colIdx, table)
    csAcc.addLine(line)
    out.write(line); out.write("\n")
    rows += 1
    line
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    ShardSinkDeltaCommit(
      deletes.map { case (f, ps) => f -> ps.toSeq }.toMap,
      tmp.toString, rows, if (sMax < 0) -1 else sMin, sMax,
      if (dMax < 0L) -1L else dMin, dMax,
      if (rows == 0L) "" else DocBloom.encode(bloom),
      updates.map { case (f, us) => f -> us.toSeq }.toMap,
      cs = if (rows == 0L) "" else csAcc.encode())
  }

  override def abort(): Unit = {
    if (out != null) { try out.close() catch { case _: Throwable => () } }
    SinkFs.delete(tmp)
  }

  override def close(): Unit = ()
}
