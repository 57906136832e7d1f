package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only fault-injecting FileSystem (round-12 VERDICT #7): a local FS
  * under the `faultfs:` scheme (registered via the Hadoop ServiceLoader
  * manifest in test resources) whose `rename` can be made to throw when
  * the destination matches a trigger name — simulating a crash at the
  * ShardSink manifest flip (since round 13 a rename to the next
  * `_manifest.v<N>.json`; the specs pin that the PREVIOUS version — and
  * therefore all committed data — stays visible through the crash).
  */
class FaultFs extends RawLocalFileSystem {
  override def getScheme: String = "faultfs"
  override def getUri: URI = URI.create("faultfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    val trigger = FaultFs.failRenameTo.get()
    if (trigger != null && dst.getName == trigger)
      throw new java.io.IOException(s"FaultFs injected crash: rename $src -> $dst")
    super.rename(src, dst)
  }
}

object FaultFs {
  /** When non-null, any rename whose DESTINATION file name equals this
    * value throws (driver and executors share the JVM in local mode).
    */
  val failRenameTo = new java.util.concurrent.atomic.AtomicReference[String](null)
}
