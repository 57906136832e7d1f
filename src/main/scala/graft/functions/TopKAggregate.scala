package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded top-k state: ≤ k (score, id) pairs kept sorted by the TOTAL
  * order (score DESC, id ASC). k is small by contract, so linear
  * insertion beats heap bookkeeping and keeps merge a simple sorted-merge.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** True if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, id: Long): Unit = {
    if (n < k || beats(s, id, scores(n - 1), ids(n - 1))) {
      var pos = if (n < k) n else k - 1
      while (pos > 0 && beats(s, id, scores(pos - 1), ids(pos - 1))) {
        scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1)
        pos -= 1
      }
      scores(pos) = s; ids(pos) = id
      if (n < k) n += 1
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** `graft_top_k(score, id, k)` — exact top-k per group as a bounded-state
  * [[TypedImperativeAggregate]]: ids of the k best (score DESC, id ASC)
  * rows, in rank order.
  *
  * The scale point (vs the window-rank form every SQL engine reaches
  * for): `row_number() OVER (PARTITION BY g ORDER BY s) <= k` shuffles
  * and sorts EVERY row of the corpus to discard all but k per group; this
  * aggregate's partial buffers hold ≤ k entries, so the map side reduces
  * each partition's contribution to k rows per group BEFORE the exchange
  * (classic combiner), and nothing is ever globally sorted. At 100 TB
  * with k=10 that is the difference between shuffling the corpus and
  * shuffling ~k × groups rows. Selection under a TOTAL order is
  * arrival-order-independent, so the result is bit-stable under any
  * partitioning — hash-checkable, unlike a float-summing sketch.
  *
  * Null contract: a row with NULL score or NULL id contributes nothing
  * (like every built-in agg over its input); an empty group yields NULL.
  * Ties cannot survive ambiguity: (score, id) is total because ids are
  * distinct.
  */
case class TopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, s"graft_top_k k must be positive, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  // return type inferred: AbstractDataType is private[sql], but Seq is
  // covariant so the inferred Seq[DataType] satisfies the override
  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, input: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    if (buffer.n == 0) null
    else new GenericArrayData(buffer.ids.take(buffer.n))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      out.writeDouble(buffer.scores(i)); out.writeLong(buffer.ids(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buf = new TopKBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      // already rank-ordered: inserts replay in order, each O(1) appends
      buf.insert(in.readDouble(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopK =
    copy(score = newChildren(0), id = newChildren(1))
}
