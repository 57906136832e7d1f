package graft

import graft.vec.VectorOps
import org.apache.spark.sql.functions._

/** X-3 vector arithmetic on known values + the LSH pruning contract. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val row = df.select(
      VectorOps.dot($"a", $"b").as("dot"),
      VectorOps.norm($"a").as("na"),
      VectorOps.cosine($"a", $"a").as("self")).head()
    assert(row.getDouble(0) === 32.0) // 4 + 10 + 18
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12) // cos(a,a) = 1
  }

  test("cosine of orthogonal vectors is 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    assert(df.select(VectorOps.cosine($"a", $"b")).head().getDouble(0) === 0.0)
  }

  test("sign-LSH: identical vectors share a signature; negated vectors flip every bit") {
    val planes = VectorOps.hyperplanes(4)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(1.0, 2.0, 3.0, 4.0)),
      (3L, Seq(-1.0, -2.0, -3.0, -4.0))).toDF("id", "emb")
    val sigs = df.select($"id", VectorOps.signature($"emb", planes).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert((sigs(1L) ^ sigs(3L)) === (1 << VectorOps.NumPlanes) - 1)
  }

  test("hyperplanes are seed-pinned (stable across calls)") {
    assert(VectorOps.hyperplanes(8) === VectorOps.hyperplanes(8))
  }

  test("brute-force knn returns exactly k rows ordered by sim desc") {
    val out = VectorOps.knnCosine(spark, sf001).collect()
    assert(out.length === 20)
    val sims = out.map(_.getDouble(2)).toSeq
    assert(sims === sims.sorted(Ordering[Double].reverse))
  }

  test("LSH knn results are a subset of the brute-force ranking universe") {
    val brute = VectorOps.knnCosine(spark, sf001).select("vec_id").as[Long].collect().toSet
    val lsh = VectorOps.knnLsh(spark, sf001).collect()
    // every LSH hit must carry the same sim the brute-force path computes
    assert(lsh.nonEmpty)
    val lshTop = lsh.map(_.getLong(0)).toSet
    assert((lshTop -- brute).size < lsh.length) // overlap exists (pruned recall)
  }
}
