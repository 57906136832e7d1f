package graft.sources

/** Per-file doc_id bloom filter for manifest-level POINT-LOOKUP skipping
  * (round 15) — the Delta bloom-index / Iceberg-puffin analogue, sized
  * for this sink's layout.
  *
  * Why ranges are not enough: the per-entry `d0/d1` range prunes a point
  * lookup perfectly on a CLUSTERED layout (post-compaction, post-Z-order)
  * but an ingest-ordered landing zone interleaves doc ids across task
  * files, every range contains every id, and `doc_id = K` reads the whole
  * table. A tiny always-on bloom per file makes the same lookup O(1 file)
  * with no clustering step: a 100 TB zone answers "fetch doc K" touching
  * only the files whose filter can't rule K out.
  *
  * Shape: fixed 2048 bits (256 bytes, ~344 base64 chars in the manifest
  * entry), k = 4 indexes derived by DOUBLE HASHING from two splitmix64
  * passes — deterministic across JVMs (manifest bytes must be stable for
  * segment reuse). False-positive rate ≈ 0.05% at 25 rows/file (harness),
  * ≈ 2% at the 250-row compaction chunks the specs use, degrading
  * gracefully on huge unchunked files (a saturated bloom never skips —
  * sound, just useless, and compaction re-sizes the files anyway).
  * ABSENCE IS SOUND: an entry without a bloom (older manifests, rewrite
  * paths that don't compute one) always reads; a delete vector only
  * removes rows, so the recorded bloom stays a sound superset. A bloom
  * can only produce false POSITIVES (extra reads), never a false skip.
  */
object DocBloom {
  val Bits = 2048
  val Bytes: Int = Bits / 8
  private val K = 4

  def empty(): Array[Byte] = new Array[Byte](Bytes)

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def idx(v: Long, i: Int): Int = {
    val h1 = mix64(v)
    val h2 = mix64(v ^ 0x6a09e667f3bcc909L) | 1L // odd: full period
    (((h1 + i * h2) % Bits + Bits) % Bits).toInt
  }

  def insert(bits: Array[Byte], v: Long): Unit = {
    var i = 0
    while (i < K) {
      val b = idx(v, i)
      bits(b >>> 3) = (bits(b >>> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  def encode(bits: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bits)

  /** Bitwise-OR union of member blooms — a segment-level bloom. Empty
    * ("" = compute nothing) when any member lacks a valid bloom: a
    * partial union could skip a segment whose bloom-less member holds
    * the id (same all-or-silent rule as envelopes).
    */
  def union(blooms: Seq[String]): String = {
    if (blooms.isEmpty) return ""
    val acc = empty()
    blooms.foreach { b64 =>
      if (b64.isEmpty) return ""
      val bits =
        try java.util.Base64.getDecoder.decode(b64)
        catch { case _: IllegalArgumentException => return "" }
      if (bits.length != Bytes) return ""
      var i = 0
      while (i < Bytes) { acc(i) = (acc(i) | bits(i)).toByte; i += 1 }
    }
    encode(acc)
  }

  /** May the encoded bloom contain `v`? Malformed payloads answer true
    * (read the file — never skip on a parse doubt).
    */
  def mayContain(b64: String, v: Long): Boolean = {
    val bits =
      try java.util.Base64.getDecoder.decode(b64)
      catch { case _: IllegalArgumentException => return true }
    if (bits.length != Bytes) return true
    var i = 0
    while (i < K) {
      val b = idx(v, i)
      if ((bits(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}
