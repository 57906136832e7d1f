package graft

import graft.model.Tables
import graft.text.SpanDedup

/** Span-level dedup checked two ways: a full brute-force twin built from
  * the raw texts on the driver (exact expected values for every row), plus
  * cross-query invariants tying the three outputs together. The driver's
  * DuckDB oracle re-checks the same queries at sf0.01.
  */
class SpanDedupSpec extends SparkSpec {

  private val K = SpanDedup.K

  /** doc_id -> K-gram strings per position (split with limit -1 to match
    * Spark/DuckDB split semantics on trailing separators).
    */
  private lazy val bruteGrams: Map[Long, IndexedSeq[String]] =
    Tables.documents(spark, sf001).select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ", -1)
      val grams =
        if (toks.length >= K) (0 to toks.length - K).map(i => toks.slice(i, i + K).mkString(" "))
        else IndexedSeq.empty[String]
      r.getLong(0) -> grams.toIndexedSeq
    }.toMap

  private lazy val gramToDocs: Map[String, Set[Long]] =
    bruteGrams.toSeq
      .flatMap { case (id, gs) => gs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("spanDedup matches the brute-force twin row for row") {
    val rows = SpanDedup.spanDedup(spark, sf001).collect()
    val expected = bruteGrams.collect { case (id, gs) if gs.nonEmpty =>
      id -> ((gs.size.toLong, gs.count(g => gramToDocs(g).size >= 2).toLong))
    }
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (nGrams, nDup) = expected(r.getLong(0))
      assert(r.getLong(1) === nGrams, s"n_grams doc ${r.getLong(0)}")
      assert(r.getLong(2) === nDup, s"n_dup_grams doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - nDup.toDouble / nGrams) < 1e-6 + 5e-7)
    }
    assert(rows.exists(_.getLong(2) > 0L), "fixture should contain cross-doc spans")
  }

  test("dupSpanRuns matches brute-force islands and agrees with spanDedup coverage") {
    val rows = SpanDedup.dupSpanRuns(spark, sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = bruteGrams.flatMap { case (id, gs) =>
      val dupPos = gs.zipWithIndex.collect { case (g, i) if gramToDocs(g).size >= 2 => i }
      if (dupPos.isEmpty) None
      else {
        // runs of consecutive positions
        val runs = dupPos.foldLeft(List.empty[Int]) {
          case (acc, p) if acc.nonEmpty && dupPos.contains(p - 1) => (acc.head + 1) :: acc.tail
          case (acc, _) => 1 :: acc
        }
        Some(id -> ((dupPos.size.toLong, runs.size.toLong, runs.max.toLong + K - 1)))
      }
    }
    assert(rows === expected)

    // coverage ties the two queries: n_dup_pos == spanDedup.n_dup_grams
    val coverage = SpanDedup.spanDedup(spark, sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.foreach { case (id, (nDupPos, nRuns, maxRun)) =>
      assert(coverage(id) === nDupPos, s"coverage mismatch doc $id")
      assert(nRuns >= 1L && nDupPos >= nRuns)
      assert(maxRun >= K.toLong)
    }
    // docs absent from runs have zero dup coverage
    coverage.foreach { case (id, nDup) =>
      if (!rows.contains(id)) assert(nDup === 0L, s"doc $id has dup grams but no runs row")
    }
  }

  test("ngramNovelty: first-seen attribution is exact; earliest doc is fully novel") {
    val rows = SpanDedup.ngramNovelty(spark, sf001).collect()
    val firstDoc = gramToDocs.view.mapValues(_.min).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val gs = bruteGrams(id)
      val expNovel = gs.count(g => firstDoc(g) == id).toLong
      assert(r.getLong(1) === gs.size.toLong)
      assert(r.getLong(2) === expNovel, s"n_novel doc $id")
    }
    val earliest = rows.minBy(_.getLong(0))
    assert(earliest.getLong(1) === earliest.getLong(2), "earliest doc must be 100% novel")
    // every occurrence is either novel here or duplicated from an earlier doc:
    // novelty < 1 implies some gram exists in a smaller doc_id
    rows.filter(r => r.getLong(2) < r.getLong(1)).foreach { r =>
      val id = r.getLong(0)
      assert(bruteGrams(id).exists(g => gramToDocs(g).min < id))
    }
  }
}
