package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the missing last step of every
  * dedup pipeline: near-dup operators (MinHash, SimHash, embedding-cosine)
  * emit PAIRS, but the keep-one-per-group decision needs the transitive
  * closure (a~b, b~c ⇒ keep one of {a,b,c}, even when a~c was never
  * emitted). Pairwise keep-lowest drops too much (chains collapse to one
  * doc) or too little (which member survives depends on pair order);
  * component-wise keep-lowest is the deterministic, order-free policy.
  *
  * Algorithm: iterative min-label propagation. Every node starts as its own
  * component (comp = node id); each round every node takes the min of its
  * own and its neighbors' labels; fixpoint after at most `diameter` rounds.
  * The final label is the component's minimum node id — a deterministic,
  * cluster-independent canonical id.
  *
  * Scale posture: each round is (1) an equi-join of the undirected edge
  * list against the current labels on the destination key and (2) a
  * (node)-keyed min-aggregate — keyed shuffles only, never all-pairs, and
  * both are map-side combinable. The edge list is persisted once and reused
  * every round; labels are persisted per round and the previous round is
  * dropped, so lineage stays O(1). Convergence is detected with one
  * driver-read scalar per round (a bounded `count`, the standard iterative-
  * algorithm control loop — the DATA never reaches the driver). Rounds
  * scale with graph diameter, not size: near-dup graphs are dense blobs of
  * mutual duplicates (tiny diameter), so a handful of rounds suffices at
  * any corpus scale. For adversarial long-chain graphs the
  * large-star/small-star refinement (alternating conditional unions, known
  * to converge in O(log n) rounds) plugs into the same loop; min
  * propagation is the right default for dedup-shaped graphs.
  */
object Components {

  /** Component label per node: `(node, comp)` with comp = min node id
    * reachable from `node` over undirected `edges`. `edges` needs columns
    * `src` and `dst` (any integral type); parallel edges and self-loops are
    * tolerated (deduped internally).
    *
    * `maxIter` bounds the rounds (min propagation needs at most the graph
    * diameter); hitting the bound returns the partially-converged labels —
    * callers wanting a hard guarantee can assert on [[converged]].
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    // Iterative loops MUST truncate lineage each round: `persist` caches
    // the DATA but the logical plan still nests round over round, and
    // Catalyst re-analyzes the whole ever-growing tree on every action —
    // measured here as a driver-bound stall (load ≈ 1) long before the
    // executors see work. `localCheckpoint(eager)` materializes the round
    // AND cuts the plan back to the checkpointed RDD, keeping per-round
    // planning O(1). (On a cluster with failure-tolerance requirements,
    // reliable `checkpoint` to the checkpoint dir is the same call shape.)
    val und = edges.select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // undirected view, reused every round
    var comp = und.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // min neighbor label per node, then fold into the node's own label
      val nbrMin = und
        .join(comp.select(col("node").as("b"), col("comp").as("nbr_comp")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nbr_comp")).as("nbr_comp"))
      val next = comp
        .join(nbrMin, Seq("node"), "left")
        .select(
          col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          (coalesce(col("nbr_comp"), col("comp")) < col("comp")).as("ch"))
        .localCheckpoint(true)
      changed = next.where(col("ch")).count() // one scalar to the driver
      comp = next.drop("ch")
      it += 1
    }
    lastRounds = it
    lastConverged = changed == 0
    comp
  }

  // diagnostics from the most recent run (driver-side, test/audit use)
  @volatile private var lastRounds = 0
  @volatile private var lastConverged = false
  def rounds: Int = lastRounds
  def converged: Boolean = lastConverged

  /** Driver-checked query: components of the embedding-cosine similarity
    * graph — the edges are exactly [[graft.vec.VectorOps.simJoin]]'s
    * hash-green pairs (label-blocked, threshold 0.15, vec_id < 1000), so
    * this checks the closure computation over an already-verified edge set.
    * Output is (node, comp, degree): degree doubles as an edge-set checksum
    * the closure alone wouldn't catch.
    *
    * Oracle: DuckDB recursive CTE computing min reachable id — a different
    * algorithm (full transitive reachability) arriving at the same
    * fixpoint, so the hash match is a real cross-check of the propagation
    * loop, not a reimplementation.
    */
  def simClusters(spark: SparkSession, sfDir: String): DataFrame =
    clustersWithDegree(
      graft.vec.VectorOps.simJoin(spark, sfDir)
        .select(col("v1").as("src"), col("v2").as("dst")))

  /** (node, comp, degree) over an arbitrary pair set — the shared body of
    * both cluster queries (degree doubles as an edge-set checksum the
    * closure alone wouldn't catch).
    */
  private def clustersWithDegree(edges0: DataFrame): DataFrame = {
    // materialize the pair set ONCE: the edge derivation (an LSH banding
    // pipeline for the scale query) would otherwise be evaluated twice —
    // once under the degree aggregate and once under the closure loop
    val edges = edges0.localCheckpoint(true)
    val deg = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    connectedComponents(edges)
      .join(deg, Seq("node"))
      .select(col("node"), col("comp"), col("degree"))
      .orderBy("node")
  }

  /** The 100 TB composition: closure over the BANDED-LSH edge set
    * ([[graft.vec.VectorOps.simJoinLsh]] — full corpus, no label blocking,
    * no vec_id cap, hot buckets capped), the edge set a real dedup run
    * would feed it. The label-blocked [[simClusters]] stays as the bounded
    * oracle twin; this entry proves the closure over the scale path's
    * candidates, with the same recursive-CTE cross-check re-deriving the
    * LSH pipeline from [[graft.vec.VectorOps.simJoinLshCtes]].
    */
  def simClustersLsh(spark: SparkSession, sfDir: String): DataFrame =
    clustersWithDegree(
      graft.vec.VectorOps.simJoinLsh(spark, sfDir)
        .select(col("v1").as("src"), col("v2").as("dst")))

  val simClustersLshSql: String =
    s"""WITH RECURSIVE ${graft.vec.VectorOps.simJoinLshCtes},
       |und AS (
       |  SELECT v1 AS a, v2 AS b FROM lsh_pairs
       |  UNION
       |  SELECT v2 AS a, v1 AS b FROM lsh_pairs),
       |reach(node, r) AS (
       |  SELECT a, a FROM und
       |  UNION
       |  SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.node),
       |comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
       |deg AS (
       |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY a)
       |SELECT comp.node AS node, comp.comp AS comp, deg.degree AS degree
       |FROM comp JOIN deg USING (node) ORDER BY node""".stripMargin

  /** Shared recursive-closure CTE prefix (the verified sim-join pair set,
    * verbatim semantics minus ordering, then full transitive reachability
    * down to min-reachable-id component labels) — used by both oracle SQLs
    * below so the edge/closure definition cannot drift between them.
    */
  private val closureCtePrefix: String = {
    val pairs =
      s"""SELECT a.vec_id AS v1, b.vec_id AS v2
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE list_dot_product(a.emb, b.emb)
         |        / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
         |        >= ${graft.vec.VectorOps.SimJoinThreshold}""".stripMargin
    s"""WITH RECURSIVE e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings WHERE vec_id < 1000),
       |pairs AS (
       |$pairs),
       |und AS (
       |  SELECT v1 AS a, v2 AS b FROM pairs
       |  UNION
       |  SELECT v2 AS a, v1 AS b FROM pairs),
       |reach(node, r) AS (
       |  SELECT a, a FROM und
       |  UNION
       |  SELECT und.a, reach.r FROM und JOIN reach ON und.b = reach.node),
       |comp AS (
       |  SELECT node, MIN(r) AS comp FROM reach GROUP BY node)""".stripMargin
  }

  val simClustersSql: String =
    s"""$closureCtePrefix,
       |deg AS (
       |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY a)
       |SELECT comp.node AS node, comp.comp AS comp, deg.degree AS degree
       |FROM comp JOIN deg USING (node) ORDER BY node""".stripMargin

  /** Leakage-safe train/val/test split: near-duplicates must never
    * straddle splits (a test doc with a train-set near-copy inflates every
    * eval metric), so the split key is the near-dup CLUSTER, not the doc —
    * every member of a component lands in the same split by construction.
    * Composition: the hash-verified sim-join edges → [[connectedComponents]]
    * closure → isolated docs keep their own id as a singleton cluster →
    * [[graft.etl.Sampling.splitColumn]] on the cluster id. Output is the
    * per-split audit (docs + distinct clusters); straddling is structurally
    * impossible because the split is a pure function of the cluster id.
    *
    * Scale posture: the closure is the banded/blocked pair set (never
    * all-pairs), the left join against components is keyed on the doc id,
    * and the audit is a 3-row aggregate — nothing new shuffles beyond the
    * clustering itself.
    */
  /** Per-doc (id, cluster, split) assignment over arbitrary `ids`
    * (one column) and `edges` (src/dst) — the testable core of
    * [[leakageSplit]]. Isolated ids become singleton clusters of their own
    * id, so every id gets exactly one split.
    */
  def leakageAssignment(ids: DataFrame, edges: DataFrame): DataFrame = {
    val idCol = ids.columns.head
    val comps = connectedComponents(edges).select(col("node"), col("comp"))
    ids
      .join(comps, ids(idCol) === comps("node"), "left")
      .select(ids(idCol).as("id"), coalesce(col("comp"), ids(idCol)).as("cluster"))
      .withColumn("split", graft.etl.Sampling.splitColumn(col("cluster")))
  }

  def leakageSplit(spark: SparkSession, sfDir: String): DataFrame = {
    // materialize the pair set once, as clustersWithDegree does: the
    // closure's undirected view unions two selects of its input, so an
    // unmaterialized edge plan (a sim join) would be evaluated twice
    val edges = graft.vec.VectorOps.simJoin(spark, sfDir)
      .select(col("v1").as("src"), col("v2").as("dst"))
      .localCheckpoint(true)
    val vecs = graft.model.Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < 1000).select(col("vec_id"))
    leakageAssignment(vecs, edges)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("cluster")).as("n_clusters"))
      .orderBy("split")
  }

  val leakageSplitSql: String = {
    val (trainB, valB) = graft.etl.Sampling.splitBoundsHex()
    s"""$closureCtePrefix,
       |assigned AS (
       |  SELECT COALESCE(comp.comp, e.vec_id) AS cluster
       |  FROM e LEFT JOIN comp ON e.vec_id = comp.node),
       |s AS (
       |  SELECT cluster,
       |         CASE WHEN b < '$trainB' THEN 'train'
       |              WHEN b < '$valB' THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM (SELECT cluster, substr(md5(CAST(cluster AS VARCHAR)), 1, 2) AS b
       |        FROM assigned))
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(COUNT(DISTINCT cluster) AS BIGINT) AS n_clusters
       |FROM s GROUP BY split ORDER BY split""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x4_sim_clusters" -> (simClusters _),
    "x4_sim_clusters_lsh" -> (simClustersLsh _),
    "t_leakage_split" -> (leakageSplit _))

  val oracle: Map[String, String] = Map(
    "x4_sim_clusters" -> simClustersSql,
    "x4_sim_clusters_lsh" -> simClustersLshSql,
    "t_leakage_split" -> leakageSplitSql)
}
