package graft

import graft.text.Dedup
import org.apache.spark.sql.functions._

/** MinHash/SimHash property tests per SURVEY.md §7.4 (the pair queries are
  * ALSO hash-checked against generated DuckDB oracles — see
  * Dedup.minhashPairsSql/simhashPairsSql): identical texts collide,
  * disjoint texts don't, signatures are stable across runs, and the
  * scan-side per-row signature matches the aggregated one bit-for-bit.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different words with zero overlap whatsoever here now"),
    (5L, "ab")) // < 3 tokens → empty shingle set
    .toDF("doc_id", "text")

  test("shingles: trigrams over tokens; short docs yield empty array") {
    val sh = docs.select($"doc_id", split($"text", " ").as("t"))
      .select($"doc_id", Dedup.shinglesExpr.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(5L).isEmpty)
    assert(sh(1L).head === "the quick brown")
    assert(sh(1L).size === 10) // 12 tokens → 10 trigrams
  }

  test("corpus pipeline: monotone funnel, consistent counts, split-stamped chunks") {
    import graft.text.CorpusPipeline
    val all = graft.model.Tables.documents(spark, sf001)
    val eval = all.where($"doc_id" >= 290)
    val train = all.where($"doc_id" < 290)
    var funnel = Vector.empty[(String, Long)]
    // tolerant thresholds: the synthetic tiny-vocab corpus overlaps heavily,
    // so a zero-tolerance decontamination would empty the funnel
    val out = CorpusPipeline.curate(
      train, eval,
      CorpusPipeline.Config(minQuality = 0.0, maxSharedShingles = 1000L, nearDupJaccard = 0.5),
      f => funnel :+= f).cache()
    val m = funnel.toMap
    assert(funnel.map(_._1) ===
      Vector("input", "quality", "decontaminated", "exact_dedup", "near_dedup", "chunks"))
    assert(m("input") >= m("quality"))
    assert(m("quality") >= m("decontaminated"))
    assert(m("decontaminated") >= m("exact_dedup"))
    assert(m("exact_dedup") >= m("near_dedup"))
    assert(m("near_dedup") > 0, "curated corpus must be non-empty under tolerant config")
    assert(out.count() === m("chunks"))
    assert(out.columns.toSeq === Seq("doc_id", "chunk_idx", "text", "n_tokens", "split"))
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.nonEmpty)
    out.unpersist()
  }

  test("curateQuery: driver-visible funnel stays non-vacuous at its pinned config") {
    val out = graft.text.CorpusPipeline.curateQuery(spark, sf001).cache()
    try {
      assert(out.count() > 0, "curated corpus must be non-empty")
      // the pinned thresholds must actually BITE (strictly fewer curated
      // docs than train input) — guards against a config drift that turns
      // the driver's rows-only check into an identity pass-through
      val curatedDocs = out.select("doc_id").distinct().count()
      val trainDocs = graft.model.Tables.documents(spark, sf001)
        .where($"doc_id" % 10 =!= 9).count()
      assert(curatedDocs > 0 && curatedDocs < trainDocs,
        s"expected 0 < $curatedDocs < $trainDocs")
    } finally { out.unpersist(); () }
  }

  test("curateAttritionQuery: stage order pinned, counts monotone, input count exact") {
    import graft.text.CorpusPipeline
    val rows = CorpusPipeline.curateAttritionQuery(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq === Seq(
      (0, "input"), (1, "quality"), (2, "decontaminated"),
      (3, "exact_dedup"), (4, "near_dedup"), (5, "chunks")))
    val n = rows.map(_._3)
    // doc stages only shrink; chunking may split docs so stage 5 is exempt
    assert(n.take(5).toSeq === n.take(5).toSeq.sortBy(-_), s"funnel not monotone: ${n.toSeq}")
    assert(n.forall(_ > 0), s"vacuous stage in ${rows.toSeq}")
    val expectedInput = CorpusPipeline
      .trainWithMirrors(graft.model.Tables.documents(spark, sf001)).count()
    assert(n.head === expectedInput)
  }

  test("evalOverlap: per-eval contamination counts hand-computed; untouched eval doc absent") {
    val train = Seq(
      (1L, "the quick brown fox jumps"), // shares 2 trigrams with eval 100
      (2L, "a quick brown fox runs"), // shares 1 ("quick brown fox")
      (3L, "unrelated text entirely here")).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox sleeps"),
      (101L, "nothing in common at all")).toDF("doc_id", "text")
    val r = Dedup.evalOverlapOf(train, eval)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(100L) === ((2L, 2L))) // docs {1,2}; shingles {"the quick brown", "quick brown fox"}
    assert(!r.contains(101L), "clean eval doc must not appear in the overlap report")
  }

  test("decontamination: only train docs sharing an eval trigram are flagged, with exact counts") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"), // shares "the quick brown" + "quick brown fox"
      (2L, "totally unrelated training text here")).toDF("doc_id", "text")
    val eval = Seq((100L, "the quick brown fox runs away")).toDF("doc_id", "text")
    val out = Dedup.decontaminateOf(train, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L)) // doc 2 untouched; doc 1 shares exactly 2 trigrams
  }

  test("simhash pairs: identical docs pair at hamming 0; banding never drops a ≤3 pair") {
    val pairs = Dedup.simhashPairsOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 0) // exact dup
    // exhaustively verify banding recall: every fingerprint pair within
    // SimhashMaxHamming must be present (pigeonhole over 4 bands)
    val fps = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = for {
      a <- fps.keys.toSeq; b <- fps.keys.toSeq
      if a < b && java.lang.Long.bitCount(fps(a) ^ fps(b)) <= Dedup.SimhashMaxHamming
    } yield (a, b)
    assert(pairs.keySet === expected.toSet)
  }

  test("minhash: identical docs get identical signatures; disjoint docs differ") {
    val sig = Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(4L))
    // docs 1 & 3 share 7 of 13 distinct trigrams → true Jaccard ≈ 0.54, so
    // E[agreements] ≈ 17/32; a quarter-bound keeps the check far above the
    // disjoint-pair expectation (≈0) without flaking on estimator variance
    val agree = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    assert(agree > Dedup.NumHashes / 4, s"only $agree/${Dedup.NumHashes} minhashes agree")
    val agreeFar = sig(1L).zip(sig(4L)).count { case (a, b) => a == b }
    assert(agree > agreeFar, s"near-dup agreement $agree not above unrelated $agreeFar")
  }

  test("rowMinhashSig: per-row signature equals the aggregated batch signature") {
    // the streaming-safe scan-side construction must be BIT-identical to
    // the explode+groupBy batch signature — same md5 halves, same
    // double-hash family, same mins — for every doc with shingles
    val agg = Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap
    val perRow = docs
      .select($"doc_id", Dedup.rowMinhashSig($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    for ((id, sig) <- agg) assert(perRow(id) === Some(sig), s"doc $id")
    assert(perRow(5L) === None) // < 3 tokens → NULL, not an empty signature
    // band keys: exact dups share all keys; near-dups some; disjoint none;
    // shingle-less docs never cross-match (uniq fallback)
    val keys = docs
      .select($"doc_id",
        Dedup.rowBandKeys(Dedup.rowMinhashSig($"text"), md5($"text".cast("binary"))).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(keys(1L) === keys(2L))
    assert((keys(1L) & keys(4L)).isEmpty)
    assert(keys.values.forall(_.size === Dedup.NumHashes / Dedup.BandSize))
  }

  test("neardupDelta: cross-slice only; planted near-mirrors resolve to their source below 1.0") {
    val rows = Dedup.neardupDelta(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // the probe is base⋈delta only: every pair is (delta doc, base doc)
    assert(rows.forall { case (d, b, _) => b < Dedup.DeltaSplitId && d >= Dedup.DeltaSplitId })
    assert(rows.forall { case (_, _, j) => j >= Dedup.MinhashThreshold && j <= 1.0 })
    // each planted near-mirror (source + 1 appended token) finds its own
    // source with high-but-not-exact Jaccard — the near-dup regime, not
    // the exact-dup one t_dedup_delta's mirrors exercise
    val selfPairs = rows.filter { case (d, b, _) => d == b + Dedup.NearMirrorOffset }
    val expectedMirrors = (0L until Dedup.DeltaSplitId)
      .count(_ % Dedup.NearMirrorMod == 13L)
    assert(selfPairs.length === expectedMirrors)
    selfPairs.foreach { case (_, _, j) => assert(j > 0.5 && j < 1.0) }
  }

  test("ingestDecision: every drop reason bites; verdict respects the priority order") {
    val rows = Dedup.ingestDecision(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    val n = rows.groupBy(_._5).view.mapValues(_.length).toMap
    assert(n.keySet.subsetOf(Set("exact_dup", "near_dup", "low_quality", "keep")))
    Seq("exact_dup", "near_dup", "low_quality", "keep").foreach { d =>
      assert(n.getOrElse(d, 0) > 0, s"gate branch '$d' must bite on the fixture")
    }
    val minQ = graft.text.CorpusPipeline.PinnedConfig.minQuality
    rows.foreach { case (_, ex, nn, q, d) =>
      val expected =
        if (ex) "exact_dup"
        else if (nn > 0) "near_dup"
        else if (q < minQ) "low_quality"
        else "keep"
      assert(d === expected)
    }
    // an exact re-crawl shares every shingle with its source, so it is
    // also a verified near-dup — the CASE priority, not the data, decides
    assert(rows.filter(_._2).forall(_._3 >= 1L))
  }

  test("minhash signatures are deterministic across evaluations") {
    val a = Dedup.minhashSignatures(docs).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Dedup.minhashSignatures(docs).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("lshRecall: hit count bounded by both sides; recall well-formed and non-vacuous") {
    val r = Dedup.lshRecall(spark, sf001).collect()
    assert(r.length === 1)
    val (nExact, nLsh, nHit, recall) =
      (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2), r.head.getDouble(3))
    assert(nExact > 0L, "fixture must contain exact near-dup pairs at the LSH threshold")
    assert(nHit <= math.min(nExact, nLsh))
    assert(recall >= 0.0 && recall <= 1.0)
    assert(math.abs(recall - nHit.toDouble / nExact) < 1e-6 + 5e-7)
  }

  test("thresholdSweep: counts monotone non-increasing in threshold; ties out with lshRecall") {
    val rows = Dedup.thresholdSweep(spark, sf001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Dedup.SweepThresholds)
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1, "raising the threshold cannot add pairs or drops")
    }
    rows.foreach { case (_, p, d) => assert(d <= p && d >= 1L) }
    // the sweep's count at the LSH threshold is lshRecall's ground-truth side
    val nExact = Dedup.lshRecall(spark, sf001).collect().head.getLong(0)
    val atLsh = rows.find(_._1 == Dedup.MinhashThreshold).get
    assert(atLsh._2 === nExact)
  }

  test("simhash: identical docs equal; near-dups land within small Hamming distance") {
    val fp = Dedup.simhash(docs.where($"doc_id" < 5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    val hammingNear = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val hammingFar = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(hammingNear < hammingFar,
      s"near-dup hamming $hammingNear should be < unrelated $hammingFar")
  }
}
