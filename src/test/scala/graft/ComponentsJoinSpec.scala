package graft

import graft.graph.Components
import graft.queries.JoinQueries
import org.apache.spark.sql.functions._

/** Unit checks for connected components, the binned range join, and the
  * blocked fuzzy join on hand-computable inputs; the driver hash-checks
  * all three against DuckDB on the real testdata.
  */
class ComponentsJoinSpec extends SparkSpec {
  import spark.implicits._

  test("components: chain, triangle, and isolated pair each get min-id labels") {
    // chain 1-2-3-4, triangle 10-11-12 (+ redundant closure edge),
    // pair 20-21, parallel edge + reversed duplicate tolerated
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (21L, 20L), (20L, 21L))
      .toDF("src", "dst")
    val r = Components.connectedComponents(edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    assert(Components.converged)
  }

  test("components: long chain converges within diameter rounds") {
    // path 0-1-2-...-9: worst-case diameter for min propagation
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val r = Components.connectedComponents(edges)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.size === 10 && r.values.forall(_ == 0L))
    assert(Components.converged && Components.rounds <= 10)
  }

  test("components: 10k-node path converges in O(log n) rounds via pointer doubling") {
    // adversarial diameter: a 10,000-node path with the min id at one end.
    // Plain min propagation needs ~10,000 rounds; the pointer-doubling
    // shortcut doubles covered label-distance per round → ~log2(10k) ≈ 14.
    val n = 10000L
    val edges = spark.range(n - 1).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val r = Components.connectedComponents(edges, maxIter = 25)
    assert(r.where(col("comp") =!= 0L).count() === 0L)
    assert(r.count() === n)
    assert(Components.converged, s"did not converge in 25 rounds (${Components.rounds})")
    assert(Components.rounds < 20, s"took ${Components.rounds} rounds — pointer doubling not effective")
  }

  test("components: maxIter bound reports non-convergence honestly") {
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("src", "dst")
    Components.connectedComponents(edges, maxIter = 2).count()
    assert(!Components.converged)
  }

  test("range join: bin decomposition equals the naive interval predicate") {
    val sfDir = "/root/testdata/sf0.001"
    val got = JoinQueries.rangeJoinBinned(spark, sfDir)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1))).toMap
    // naive nested-loop ground truth over the same bands
    val bands = (0 to 4).map(i => (i.toLong, i * 40000.0 + 777.0, i * 40000.0 + 100332.0))
    val prices = graft.model.Tables.orders(spark, sfDir)
      .select(col("o_totalprice")).as[Double].collect()
    val naive = bands.map { case (id, lo, hi) =>
      id -> prices.count(p => p >= lo && p < hi).toLong
    }.filter(_._2 > 0).toMap
    assert(got === naive)
    // overlap is real: some order must land in more than one band
    assert(got.values.sum > prices.count(p => p >= 777.0 && p < 260332.0))
  }

  test("curate componentDedup: transitive near-dups collapse to the min id") {
    import graft.text.CorpusPipeline
    // 28-word shared core; 1 appends two words, 2 prepends two words:
    // J(1,3) = J(2,3) = 26/28 ≈ 0.93 (≥ the 0.9 threshold, and high enough
    // that the 8×4 MinHash bands detect it essentially surely), while
    // J(1,2) = 26/30 ≈ 0.87 < 0.9 — the bands DO emit (1,2) as a candidate
    // but the exact-Jaccard verify rejects it, so 1~2 holds only
    // TRANSITIVELY through 3
    val core = (1 to 28).map(i => s"w$i")
    val t3 = core.mkString(" ")
    val t1 = (core ++ Seq("x1", "x2")).mkString(" ")
    val t2 = (Seq("y1", "y2") ++ core).mkString(" ")
    val docs = Seq((1L, t1), (2L, t2), (3L, t3), (100L, "totally different words " * 4))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
    val noEval = docs.where(lit(false))
    def survivors(cfg: CorpusPipeline.Config): Set[Long] =
      CorpusPipeline.curate(docs, noEval, cfg)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val open = CorpusPipeline.Config(
      minQuality = -1.0, maxSharedShingles = Long.MaxValue, nearDupJaccard = 0.9)
    // pairwise keep-first: pairs (1,3),(2,3) drop only d2=3 — 1 AND 2 both
    // survive although they are duplicates through 3
    assert(survivors(open) === Set(1L, 2L, 100L))
    // component mode: {1,2,3} is one component — only the min id survives
    assert(survivors(open.copy(componentDedup = true)) === Set(1L, 100L))
  }

  test("leakage split: cluster members share a split; isolated ids are singletons") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("vec_id")
    val a = Components.leakageAssignment(ids, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(a.length === 6)
    // component labels are the min member id; isolated 20 is its own cluster
    assert(a.map(t => t._1 -> t._2).toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
    // the invariant the operator exists for: one split per cluster
    assert(a.groupBy(_._2).forall { case (_, rs) => rs.map(_._3).distinct.length == 1 })
  }

  test("fuzzy join: blocked pairs respect the distance band and block key") {
    val parts = Seq(
      (1L, "red widget"), (2L, "red widgets"), // dist 1, same block
      (3L, "red gadget"), // dist 3 from widget
      (4L, "blue widget"), // other block — never paired with red*
      (5L, "red bolt")) // dist > 3 from widget/widgets
      .toDF("p_partkey", "p_name")
    val rows = parts.select(col("p_partkey").as("id"), col("p_name").as("name"))
    val got = JoinQueries.fuzzyJoinOf(rows, 1, 3)
      .select("k1", "k2", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // widget→widgets ins 1; widget→gadget sub 2; widgets→gadget 3 edits;
    // bolt is > 3 from every other red-block name; blue never joins red
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 3L)))
    assert(!got.exists(t => t._1 == 4L || t._2 == 4L))
    // hot-block cap: with maxBlockSize=2 only the bottom-2 ids of the 'red'
    // block survive → pair count bounded at C(2,2)=1 per block
    val capped = JoinQueries.fuzzyJoinOf(rows, 1, 3, maxBlockSize = 2)
      .select("k1", "k2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)))
  }
}
