package graft

import graft.text.{QualityModel, TextOps}
import org.apache.spark.sql.functions._

/** Round-10 addition: the distilled quality classifier (distributed
  * logistic regression). Beyond the driver's hash checks, these pin the
  * properties that make the training NON-VACUOUS: the student separates
  * the teacher's classes far above the majority rate, and the learned
  * weight structure recovers the teacher's hand-tuned coefficient order.
  */
class QualityModelSpec extends SparkSpec {

  private lazy val weights: Map[String, Double] =
    QualityModel.modelWeights(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("modelWeights: 5 named coefficients, all finite") {
    assert(weights.keySet ===
      Set("bias", "w_len", "w_stop", "w_punct", "w_wordlen"))
    assert(weights.values.forall(w => !w.isNaN && !w.isInfinite))
  }

  test("modelWeights: student recovers the teacher's coefficient order") {
    // teacher = 0.5*lenScore + 0.3*stopRatio + 0.2*(1 - punctRatio):
    // length dominates, stopwords second, both positive; punct ratio is
    // constant 0 on the synthetic corpus so its z is identically 0 and
    // its weight must never move off the 0.0 init
    assert(weights("w_len") > weights("w_stop"))
    assert(weights("w_stop") > 0.0)
    assert(weights("w_punct") === 0.0)
  }

  test("modelEval: counts consistent, accuracy >> majority class, brier << 0.25") {
    val r = QualityModel.modelEval(spark, sf001).collect().head
    val (n, tp, fp, tn, fn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp + tn + fn === n)
    val majority = math.max(tp + fn, fp + tn).toDouble / n
    assert(r.getDouble(5) > majority + 0.2, s"accuracy ${r.getDouble(5)} vs majority $majority")
    // brier of the untrained p=0.5 model is exactly 0.25; training must
    // beat it decisively or the GD loop did nothing
    assert(r.getDouble(6) < 0.1, s"brier ${r.getDouble(6)}")
  }

  test("modelScores: valid probabilities, descending, top-20 all true positives") {
    val rows = QualityModel.modelScores(spark, sf001).collect()
    assert(rows.length === 20)
    val ps = rows.map(_.getDouble(2))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(ps.sliding(2).forall(a => a(0) >= a(1)))
    // the most-confident keeps should actually be teacher-positive
    assert(rows.forall(_.getLong(1) === 1L))
  }

  test("streaming serving parity: served scores bit-identical to batch, keeps non-trivial") {
    val r = graft.streaming.CorpusStreaming.modelServingParity(spark, sf001).collect().head
    assert(r.getLong(2) === 0L, "streamed scores diverged from batch chain")
    assert(r.getLong(0) === 500L)
    // the keep-rate must be a real split, not all/nothing
    assert(r.getLong(1) > 0L && r.getLong(1) < r.getLong(0))
  }

  test("holdout: model trained on the md5 train split generalizes to held-out docs") {
    val rows = QualityModel.modelHoldout(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set("train", "test"))
    val (nTest, accTest, brierTest) = rows("test")
    val (nTrain, accTrain, _) = rows("train")
    assert(nTrain + nTest === 500L)
    // the split is ~80/20 by md5 bucket, never degenerate
    assert(nTest > 50L && nTest < 150L)
    // held-out accuracy must stay near train accuracy — the filter
    // transfers instead of memorizing (both far above the ~0.55 majority)
    assert(accTest > 0.9, s"held-out accuracy $accTest")
    assert((accTrain - accTest).abs < 0.1, s"train $accTrain vs test $accTest")
    assert(brierTest < 0.1)
  }

  test("modelDelta: fine-tune moves the live coefficients, constant feature stays pinned") {
    val rows = QualityModel.modelDelta(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet === Set("bias", "w_len", "w_stop", "w_punct", "w_wordlen"))
    rows.foreach { case (coef, (base, updated, drift)) =>
      assert(!updated.isNaN && !updated.isInfinite, coef)
      // drift column is exactly the rounded difference it claims to be
      assert(math.abs(drift - BigDecimal(updated - base)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12, coef)
    }
    // z ≡ 0 for the constant punct feature ⇒ its gradient is 0 on the
    // delta batch too
    assert(rows("w_punct")._3 === 0.0)
    // the delta steps actually learned something
    assert(rows.valuesIterator.exists(_._3 != 0.0))
  }

  test("modelAuc: exact Mann-Whitney AUC agrees with a brute-force pair count") {
    val r = QualityModel.modelAuc(spark, sf001).collect().head
    val (nPos, nNeg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nPos + nNeg === 500L)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(auc > 0.95, s"ranking quality collapsed: $auc")
    // brute-force check on the same scored relation: P(p_pos > p_neg) + ½P(=)
    val yps = QualityModel.scoredForTest(spark, sf001).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val pos = yps.filter(_._1 == 1.0).map(_._2)
    val neg = yps.filter(_._1 == 0.0).map(_._2)
    var num = 0.0
    for (a <- pos; b <- neg) num += (if (a > b) 1.0 else if (a == b) 0.5 else 0.0)
    val brute = num / (pos.length.toLong * neg.length)
    assert(math.abs(auc - brute) < 1e-5, s"auc $auc vs brute $brute")
  }

  test("modelCalibration: bins partition the corpus, mean_p inside each bin") {
    val rows = QualityModel.modelCalibration(spark, sf001).collect()
    assert(rows.map(_.getLong(1)).sum === 500L)
    rows.foreach { r =>
      val (bin, meanP, fracPos) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(meanP >= bin / 10.0 - 1e-6 && meanP <= (bin + 1) / 10.0 + 1e-6, s"bin $bin")
      assert(fracPos >= 0.0 && fracPos <= 1.0)
    }
    // scores must actually separate: top bin nearly all positive, bottom none
    val byBin = rows.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byBin(byBin.keys.max) > 0.9)
    assert(byBin(byBin.keys.min) < 0.1)
  }

  test("modelThreshold: recall monotone down, precision monotone up, real F1 peak") {
    val rows = QualityModel.modelThreshold(spark, sf001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length === 9)
    // raising the cut can only lose true positives and lose false positives
    assert(rows.sliding(2).forall(a => a(1)._2 <= a(0)._2), "tp must be nonincreasing")
    assert(rows.sliding(2).forall(a => a(1)._3 <= a(0)._3), "fp must be nonincreasing")
    assert(rows.sliding(2).forall(a => a(1)._4 >= a(0)._4), "fn must be nondecreasing")
    // tp + fn = all positives, constant across thresholds
    assert(rows.map(r => r._2 + r._4).distinct.length === 1)
    assert(rows.map(_._5).max > 0.9, "no usable operating point")
  }

  test("weightedSample: kept mass tracks mean score; subset is proper and reproducible") {
    val rows = QualityModel.weightedSample(spark, sf001).collect()
    val (n, kept, pMass) = rows.foldLeft((0L, 0L, 0.0)) { case ((a, b, c), r) =>
      (a + r.getLong(1), b + r.getLong(2), c + r.getDouble(4) * r.getLong(1))
    }
    assert(kept > 0 && kept < n, s"degenerate sample: $kept of $n")
    // E[kept] = Σ p — a uniform u and a calibrated p keep them close
    // (±20% at n≈600; the draw is deterministic so this never flakes)
    assert(math.abs(kept - pMass) < 0.2 * pMass,
      s"kept=$kept vs expected=${pMass.round} — sampler biased")
    // deterministic: the same call yields the identical kept-set fold
    // (xor_kept is null for a source with nothing kept)
    def folds(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => if (r.isNullAt(3)) 0L else r.getLong(3)).toSeq
    assert(folds(rows) === folds(QualityModel.weightedSample(spark, sf001).collect()))
  }

  test("label threshold splits the corpus non-degenerately at sf0.001") {
    val docs = graft.model.Tables.documents(spark, sf001)
    val pos = docs
      .where(TextOps.qualityColumn(col("text")) >= QualityModel.LabelThreshold)
      .count()
    val n = docs.count()
    assert(pos > n / 4 && pos < 3 * n / 4, s"$pos of $n positive")
  }
}
