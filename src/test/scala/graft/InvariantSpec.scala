package graft

import graft.queries.{RelQueries, RefQueries}
import org.apache.spark.sql.functions._

/** Cross-operator invariants on the real testdata: relationships that must
  * hold between independent query results regardless of data content —
  * a second correctness net beside the DuckDB oracle (which checks each
  * query in isolation, never their mutual consistency).
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("rollup: grand total row equals the sum of detail rows") {
    val r = RelQueries.ordersRollup(spark, sf001).collect()
    val details = r.filter(_.getLong(0) == 0L)
    val grand = r.filter(_.getLong(0) == 3L)
    assert(grand.length === 1)
    assert(grand.head.getLong(3) === details.map(_.getLong(3)).sum)
    assert(math.abs(grand.head.getDouble(4) - details.map(_.getDouble(4)).sum) < 1e-6)
  }

  test("cube contains rollup exactly (rollup's grouping sets are a subset)") {
    val cube = RelQueries.ordersCube(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val rollup = RelQueries.ordersRollup(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(rollup.subsetOf(cube))
    // cube's extra sets are exactly gid=2 (status aggregated away)
    assert((cube -- rollup).forall(_._1 == 2L))
    assert((cube -- rollup).nonEmpty)
  }

  test("sliding windows: every event lands in exactly len/slide windows; starts slide-aligned") {
    val win = graft.queries.EventQueries.slidingWindows(spark, sf001).collect()
    val nEvents = graft.model.Tables.events(spark, sf001).count()
    // 1-hour window, 15-minute slide → each event counted in exactly 4 windows
    assert(win.map(_.getLong(1)).sum === 4L * nEvents)
    assert(win.forall { r =>
      val t = r.getTimestamp(0).toInstant.getEpochSecond
      t % (15 * 60) == 0
    })
    // overlapping windows can only widen the distinct-user count vs any
    // single tumbling hour, and never exceed the event count
    assert(win.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("pivot: per-status pivoted counts sum to the plain group counts") {
    val piv = RelQueries.ordersPivot(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1) + r.getLong(2) + r.getLong(3))).toMap
    val plain = graft.model.Tables.orders(spark, sf001)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(piv === plain)
  }

  test("set ops: |intersect| + |except| == |h1 distinct|; union is a superset of both") {
    val r = RelQueries.setOps(spark, sf001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(r("both_halves").intersect(r("h1_only")).isEmpty)
    assert((r("both_halves") ++ r("h1_only")).subsetOf(r("either")))
    assert(r("both_halves").nonEmpty && r("h1_only").nonEmpty)
  }

  test("semi + anti partition the customer set exactly") {
    val r = RelQueries.semiAntiCustomers(spark, sf001).collect()
    val total = r.map(row => row.getLong(1) + row.getLong(2)).sum
    assert(total === graft.model.Tables.customer(spark, sf001).count())
  }

  test("scd2: consecutive duplicates collapse; validity intervals tile the timeline") {
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 0L, "A"),
      (1L, "2024-01-01 01:00:00", 1L, "A"), // same state → same version
      (1L, "2024-01-01 02:00:00", 2L, "B"),
      (1L, "2024-01-01 03:00:00", 3L, "A"), // A returns → NEW version, not merged
      (2L, "2024-01-01 00:30:00", 4L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = graft.queries.EventQueries.scd2HistoryOf(events)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.get(3).toString,
        Option(x.get(4)).map(_.toString), x.getLong(5)))
    assert(r.map(t => (t._1, t._2, t._3, t._6)).toSeq === Seq(
      (1L, 1L, "A", 2L), (1L, 2L, "B", 1L), (1L, 3L, "A", 1L), (2L, 1L, "C", 1L)))
    // intervals tile: each version's valid_to equals the next valid_from;
    // only the last version per user is open-ended
    val u1 = r.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.init.zip(u1.tail).forall { case (a, b) => a._5.contains(b._4) })
    assert(u1.last._5.isEmpty && r.filter(_._1 == 2L).head._5.isEmpty)
  }

  test("flagship top-10 is a prefix of the unlimited ordering") {
    val top10 = RefQueries.flagshipTop10(spark, sf001)
      .select("nome").as[String].collect().toSeq
    val full = RefQueries.flagshipTop10(spark, sf001).limit(1000000)
      .select("nome").as[String].collect().toSeq
    assert(top10 === full.take(10))
  }

  // ε-bound checks for the three rows-only sketch queries: the driver can
  // only assert they RUN (estimates have no hash oracle); these pin them
  // CLOSE to their exact, hash-checked twins, so every query surface
  // output is verified — exactly or within its algorithm's bound.

  test("sketch ε-bound: KMV approx distinct within 10% of exact per event_type") {
    val exact = graft.queries.EventQueries.distinctUsers(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.queries.EventQueries.approxDistinctUsers(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (et, n) =>
      val a = approx(et)
      // KMV with k=256 has σ ≈ 1/√k ≈ 6.25%; below k distinct the sketch
      // IS the exact count (the sf0.001 case). A real break (wrong hash,
      // wrong cut) lands orders of magnitude out
      assert(math.abs(a - n) <= math.max(1.0, 0.10 * n),
        s"$et: approx $a vs exact $n")
    }
  }

  test("sketch ε-bound: approx_percentile lands within rank-ε of the distribution") {
    val approx = graft.queries.EventQueries.approxPercentiles(spark, sf001).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val values = graft.model.Tables.events(spark, sf001)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    assert(approx.keySet === values.keySet)
    approx.foreach { case (et, ps) =>
      val vs = values(et)
      val n = vs.length.toDouble
      Seq(0.5, 0.9, 0.99).zip(ps).foreach { case (q, pa) =>
        // the sketch guarantees rank error ≤ 1/accuracy (1e-4 here); allow
        // 1% plus the duplicate-run slack (rank of a repeated value spans
        // its whole run)
        val rank = vs.count(_ <= pa) / n
        val slack = 0.01 + vs.count(_ == pa) / n
        assert(rank >= q - slack && rank <= q + slack,
          s"$et q=$q: approx value $pa sits at rank $rank (slack $slack)")
      }
    }
  }

  test("cluster-size distribution re-sums to the cluster membership table") {
    // x4_cluster_sizes and x4_sim_clusters derive from the SAME memoized
    // closure — Σ(size × count) must equal the membership row count, and
    // Σ(count) the distinct-component count
    val sizes = graft.graph.Components.clusterSizes(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val members = graft.graph.Components.simClusters(spark, sf001)
    assert(sizes.map { case (s, n) => s * n }.sum === members.count())
    assert(sizes.map(_._2).sum === members.select("comp").distinct().count())
  }

  test("source cap keeps exactly min(cap, source size) docs per source") {
    val cap = graft.text.CurationOps.SourceCap.toLong
    val kept = graft.text.CurationOps.sourceCap(spark, sf001).collect()
      .groupBy(_.getString(0)).map { case (s, rows) => s -> rows.length.toLong }
    val have = graft.model.Tables.documents(spark, sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet === have.keySet)
    kept.foreach { case (s, n) => assert(n === math.min(cap, have(s)), s"source $s") }
  }

  test("anomaly gate: outlier fraction respects the Chebyshev 3σ bound") {
    // |z| > 3 events can never exceed n/9 (Chebyshev, distribution-free);
    // a broken mean/σ derivation blows straight through it
    graft.queries.EventQueries.anomalyZscore(spark, sf001).collect().foreach { r =>
      val (n, out) = (r.getLong(1), r.getLong(2))
      assert(out <= n / 9, s"${r.getString(0)}: $out outliers of $n breaks Chebyshev")
      assert(out > 0, s"${r.getString(0)}: vacuous — no outliers flagged at all")
    }
  }

  test("dup-rate report: total dupes equal the planted mirror count") {
    val dupes = graft.text.CurationOps.dupRateBySource(spark, sf001).collect()
      .map(_.getLong(3)).sum
    val mirrors = graft.model.Tables.documents(spark, sf001)
      .where(col("doc_id") % 10 =!= 9 && col("doc_id") % 97 === 3).count()
    assert(dupes === mirrors, s"report counts $dupes dupes, $mirrors mirrors planted")
    assert(mirrors > 0)
  }

  test("vocab coverage: prefix agrees with wordFreq, cumsum exact, coverage monotone to <1") {
    val top = graft.text.TextOps.wordFreq(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cov = graft.text.TextOps.vocabCoverage(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // sf0.001's synthetic vocab has ~31 distinct tokens — the cut returns
    // min(K, |vocab|) rows
    assert(cov.length >= 20 && cov.length <= graft.text.TextOps.VocabCoverageK)
    // same ordering rule → the coverage table's first 20 rows ARE wordFreq
    assert(cov.take(20).map(c => (c._2, c._3)).toSeq === top.toSeq)
    assert(cov.map(_._1).toSeq === (1L to cov.length).toSeq, "rank not dense")
    cov.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 === a._4 + b._3, "cumulative count broken")
      assert(b._5 >= a._5, "coverage not monotone")
      assert(a._3 >= b._3, "counts not non-increasing")
    }
    assert(cov.last._5 > 0.0 && cov.last._5 <= 1.0)
    if (cov.length < graft.text.TextOps.VocabCoverageK)
      assert(cov.last._5 === 1.0, "cut covers the whole vocab — coverage must close at 1")
  }

  test("corpus checksum: XOR fingerprint matches a driver-side recomputation per source") {
    val got = graft.text.TextOps.corpusChecksum(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = graft.model.Tables.documents(spark, sf001)
      .select("source", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      src -> ((rows.length.toLong, rows.map(_._3).sum, rows.map(r => fp60(r._2)).reduce(_ ^ _)))
    }
    assert(got === expected)
  }

  test("triangle census: per-label counts equal brute force over the collected knn graph") {
    val edges = graft.vec.VectorOps.knnGraph(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val label = graft.model.Tables.embeddings(spark, sf001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val eset = edges.toSet
    val byLabel = edges.groupBy(e => label(e._1))
    val got = graft.vec.VectorOps.triangleCount(spark, sf001).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === byLabel.keySet)
    byLabel.foreach { case (l, es) =>
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.length.toLong
      val tris = es.flatMap { case (a, b) =>
        es.collect { case (b2, c) if b2 == b && eset.contains((a, c)) => (a, b, c) }
      }.distinct.length.toLong
      assert(got(l) === ((nodes, es.length.toLong, tris)), s"label $l census mismatch")
    }
    assert(got.values.map(_._3).sum > 0, "no triangles anywhere — census is vacuous")
  }

  test("pagerank: integer iteration matches a driver-side replay over the collected graph") {
    val edges = graft.vec.VectorOps.knnGraph(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    val deg = adj.map { case (v, ns) => v -> ns.length.toLong }
    val n = adj.size
    val base = graft.vec.VectorOps.PageRankScale / n
    var r = adj.keys.map(_ -> base).toMap
    for (_ <- 1 to graft.vec.VectorOps.PageRankRounds)
      r = adj.map { case (v, _) => v -> 0L } ++ // every node receives (symmetric graph)
        (edges ++ edges.map(e => (e._2, e._1))).groupBy(_._2).map { case (v, in) =>
          v -> ((15L * base) / 100 + 85L * in.map { case (u, _) => r(u) / deg(u) }.sum / 100)
        }
    val expect = r.toSeq.sortBy { case (v, pr) => (-pr, v) }.take(20)
    val got = graft.vec.VectorOps.pageRank(spark, sf001).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got === expect)
    assert(got.nonEmpty && got.forall(_._2 > 0))
  }

  test("pagerank base: integral div is exact where double-division truncation forks") {
    // 2^53+1 has no double representation: (s.toDouble / 1).toLong drops the +1,
    // while `s div count(1)` — the exact expression shape pageRank's base uses —
    // stays exact. Guards the fixed-point chain against a rounding fork at any n.
    val hazard = (1L << 53) + 1L
    for (n <- Seq(1L, 3L, 7L, 473L)) {
      val got = spark.range(n).agg(expr(s"$hazard div count(1)")).collect().head.getLong(0)
      assert(got === hazard / n, s"integral base wrong at n=$n")
    }
    val dbl = spark.range(1).agg((lit(hazard) / count(lit(1))).cast("long"))
      .collect().head.getLong(0)
    assert(dbl !== hazard, "double-division hazard vanished — base test is vacuous")
    for (n <- Seq(1L, 2L, 473L, 999983L)) {
      val got = spark.range(n)
        .agg(expr(s"${graft.vec.VectorOps.PageRankScale} div count(1)"))
        .collect().head.getLong(0)
      assert(got === graft.vec.VectorOps.PageRankScale / n)
    }
  }

  test("zipf freq-of-freq: Σ freq·n_words = corpus tokens; Σ n_words = vocab size") {
    val ff = graft.text.TextOps.zipfFreqOfFreq(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = graft.model.Tables.documents(spark, sf001)
    val totalTokens = docs.select(explode(split(col("text"), " "))).count()
    val vocab = docs.select(explode(split(col("text"), " ")).as("t")).distinct().count()
    assert(ff.map { case (f, w) => f * w }.sum === totalTokens)
    assert(ff.map(_._2).sum === vocab)
    assert(ff.map(_._1).distinct.length === ff.length, "freq key not unique")
  }

  test("cdc upsert: conservation n_after = n_before - deleted + inserted; xor replays") {
    val r = RelQueries.cdcUpsert(spark, sf001).collect().head
    val (before, changes, del, upd, ins, after, xorFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(after === before - del + ins)
    val keys = graft.model.Tables.orders(spark, sf001).select("o_orderkey").collect().map(_.getLong(0))
    val snap = keys.filter(_ % 4 != 3).toSet
    val chg = keys.filter(_ % 5 == 0).map(k => k -> (k % 3 match {
      case 0 => "D"; case 1 => "U"; case _ => "I"
    })).toMap
    assert(before === snap.size.toLong && changes === chg.size.toLong)
    assert(del === chg.count { case (k, op) => op == "D" && snap(k) }.toLong)
    assert(upd === chg.count { case (k, op) => op != "D" && snap(k) }.toLong)
    assert(ins === chg.count { case (k, op) => op != "D" && !snap(k) }.toLong)
    val survivors = (snap -- chg.filter(_._2 == "D").keySet) ++ chg.filter(_._2 != "D").keySet
    assert(after === survivors.size.toLong)
    assert(xorFp === survivors.reduce(_ ^ _))
  }

  test("sketch ε-bound: approx_top_k(20) contains the exact top 10 tokens") {
    val exact = graft.text.TextOps.wordFreq(spark, sf001).collect()
      .take(10).map(_.getString(0))
    val approx = graft.text.TextOps.approxTopWords(spark, sf001).collect()
      .map(_.getString(0)).toSet
    exact.foreach(t => assert(approx.contains(t), s"exact-top-10 token '$t' missing"))
  }

  test("event transitions: counts conserve (events - active users) and rows normalize to 1") {
    val rows = graft.queries.EventQueries.eventTransitions(spark, sf001).collect()
    val events = graft.model.Tables.events(spark, sf001)
    // each user with n events contributes exactly n-1 transitions
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === expected)
    // per-from_type probabilities sum to 1 (integer-exact numerators)
    rows.groupBy(_.getString(0)).foreach { case (ft, rs) =>
      val p = rs.map(_.getDouble(4)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"P(.|$ft) sums to $p")
    }
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2), "n_users cannot exceed n_transitions"))
  }
}
