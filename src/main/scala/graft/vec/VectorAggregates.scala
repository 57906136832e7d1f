package graft.vec

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (the UDAF surface): element-wise vector centroid
  * in ONE aggregation — the alternative to posexplode + groupBy(pos), which
  * multiplies the shuffle input by the vector dimension. Here each group
  * ships one (sums[64], count) buffer per partition instead of 64 rows per
  * input vector.
  *
  * Trade-off vs the explode form (x6_centroids): the Aggregator is not
  * whole-stage-codegen'd, and its merge order is partition-dependent, so
  * double sums can differ in final ulps across runs — fine for analytics,
  * NOT oracle-hash-checkable. The explode+avg form stays the oracle query;
  * this is the shuffle-light variant for wide vectors at scale.
  */
object VectorAggregates {

  case class CentroidBuf(sums: Array[Double], count: Long)

  class VectorCentroid(dim: Int) extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.fill(dim)(0.0), 0L)

    override def reduce(b: CentroidBuf, v: Seq[Double]): CentroidBuf = {
      // skip nulls (like every built-in aggregate) AND ragged vectors —
      // zero-padding a short vector while counting it would silently bias
      // every tail dimension toward 0, the masking the DotProduct null
      // contract exists to prevent
      if (v == null || v.length != dim) b
      else {
        var i = 0
        while (i < dim) { b.sums(i) += v(i); i += 1 }
        CentroidBuf(b.sums, b.count + 1)
      }
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuf(a.sums, a.count + b.count)
    }

    // empty/all-null group → NULL (like avg), never an empty or zero vector:
    // a shape-changing Seq.empty breaks element_at/zip consumers downstream,
    // and a zero vector would be indistinguishable from real data
    override def finish(b: CentroidBuf): Seq[Double] =
      if (b.count == 0) null else b.sums.map(_ / b.count).toSeq

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Column-API handle: `df.groupBy("label").agg(centroidAgg(64)($"emb"))`. */
  def centroidAgg(dim: Int): Column => Column = {
    val fn = udaf(new VectorCentroid(dim))
    (c: Column) => fn(c)
  }
}
