package graft.sources

/** Test-only bridge into the `private[sources]` commit protocol so the
  * concurrency specs (in package `graft`) can interleave commits
  * DETERMINISTICALLY: pin a base, let an interloper commit, then attempt
  * the stale flip — the exact TOCTOU shape the optimistic protocol must
  * catch, impossible to schedule reliably with threads alone.
  */
object SinkTestAccess {
  def resolveBase(dir: String): (Long, Seq[SinkEntry]) = ShardSink.resolveBase(dir)

  def writeManifestAt(dir: String, files: Seq[SinkEntry], tag: String, version: Long): Unit =
    ShardSink.writeManifestAt(dir, files, tag, version)

  def flipFromBase(dir: String, baseVersion: Long, files: Seq[SinkEntry], tag: String): Unit =
    ShardSink.flipFromBase(dir, baseVersion, files, tag)

  def isConflict(t: Throwable): Boolean = t.isInstanceOf[ShardSink.ShardSinkConflict]

  def widenColumn(dir: String, name: String, to: org.apache.spark.sql.types.DataType): Unit =
    ShardSink.widenColumn(dir, name, to)

  def createFile(dir: String, name: String): java.io.BufferedWriter =
    SinkFs.create(new org.apache.hadoop.fs.Path(dir, name))

  def createTag(dir: String, name: String, version: Long): Unit =
    ShardSink.createTag(dir, name, version)

  def addConstraint(dir: String, name: String, pred: String): Unit =
    ShardSink.addConstraint(dir, name, pred)

  def segmentRefs(dir: String, version: Long): Seq[String] =
    ShardSink.segmentRefsAt(dir, version).map(_.name)

  def segmentRefsFull(dir: String, version: Long): Seq[(String, Int, Int, Int, Long, Long)] =
    ShardSink.segmentRefsAt(dir, version)
      .map(r => (r.name, r.n, r.shardMin, r.shardMax, r.docMin, r.docMax))

  def segmentReadCount: Long = ShardSink.segmentReadCount.get()

  def clearSegmentCache(): Unit = ShardSink.clearSegmentCacheForTest()

  def cloneShallow(src: String, dst: String, version: Option[Long] = None): Unit =
    ShardSink.cloneShallow(src, dst, version)

  def morDelete(dir: String, docId: Long): Unit =
    ShardSink.morDeleteImpl(dir,
      Array(org.apache.spark.sql.sources.EqualTo("doc_id", docId)))

  /** One-shot interleave: `f` runs inside the next compaction, after its
    * inputs were read and rewritten but before the publish flip.
    */
  def onNextCompactPublish(f: () => Unit): Unit =
    ShardSink.compactBarrier.set(f)

  /** One-shot interleave for the DML re-base specs: `f` runs inside the
    * next copy-on-write/merge-on-read DML, after its rewrites/vectors
    * were computed but before the manifest flip.
    */
  def onNextDmlFlip(f: () => Unit): Unit =
    ShardSink.dmlBarrier.set(f)

  def cowDelete(dir: String, filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    ShardSink.deleteWhereImpl(dir, filters)

  def morDeleteWhere(dir: String, filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    ShardSink.morDeleteImpl(dir, filters)

  def manifestListCount: Long = ShardSink.manifestListCount.get()

  def exactDoc(f: org.apache.spark.sql.sources.Filter): Boolean =
    ShardSink.exactDocInterval(f)

  def docInterval(f: org.apache.spark.sql.sources.Filter): Option[(Long, Long)] =
    ShardSink.oneDocInterval(f)

  def rowPredicate(fs: Array[org.apache.spark.sql.sources.Filter])
      : Option[(Long, Int) => Boolean] = ShardSink.deletePredicate(fs)

  /** One-shot interleave for the MV concurrency spec: `f` runs inside the
    * next refresh, after its delta is derived but before the state flip.
    */
  def onNextMvFlip(f: () => Unit): Unit = SinkMatView.refreshBarrier.set(f)

  /** Same interleave for the DISTRIBUTED MV's refresh. */
  def onNextMvdFlip(f: () => Unit): Unit = SinkMvDist.refreshBarrier.set(f)

  def deleteRecursively(f: java.io.File): Unit = SinkFs.deleteRecursively(f)

  /** Version-pinned table read, for spec-side parity recomputes. */
  def srcAt(spark: org.apache.spark.sql.SparkSession, dir: String, v: Long)
      : org.apache.spark.sql.DataFrame = SinkMatView.srcAt(spark, dir, v)
}
