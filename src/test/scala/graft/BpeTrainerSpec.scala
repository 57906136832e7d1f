package graft

import graft.text.BpeTrainer

/** Unit checks for the BPE merge trainer on hand-computable corpora; the
  * driver hash-checks t_bpe_merges against a DuckDB oracle that re-trains
  * the same rounds from the raw table.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def merges(text: String, n: Int): Seq[(Long, String, String, Long)] =
    BpeTrainer.train(spark, Seq((1L, text)).toDF("doc_id", "text"), n)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("most frequent pair wins; counts are corpus-weighted") {
    // ab×3 + cd×1: pair (a,b) freq 3 beats (c,d) freq 1
    val m = merges("ab ab ab cd", 2)
    assert(m === Seq((1L, "a", "b", 3L), (2L, "c", "d", 1L)))
  }

  test("odd run: greedy left-to-right merge, then tie broken by pair string") {
    // 'aaaaa': round 1 counts (a,a)=4 (all adjacent positions), merge →
    // [aa, aa, a]. Round 2: pairs (aa,aa)=1 and (aa,a)=1 tie on freq;
    // ascending pair string picks "aa a" → [aa, aaa]. This is the case
    // where single-space joining diverges from the greedy fold — the
    // double-space representation must NOT produce [aa, a, aa].
    val m = merges("aaaaa", 3)
    assert(m.take(2) === Seq((1L, "a", "a", 4L), (2L, "aa", "a", 1L)))
    // round 3 merges the surviving (aa, aaa) pair — proof the round-2
    // vocab really is [aa, aaa]
    assert(m(2) === ((3L, "aa", "aaa", 1L)))
  }

  test("merges compound across rounds (classic est-suffix shape)") {
    // 'xy' dominates, then 'xyz' builds on the learned 'xy' token
    val m = merges("xyz xyz xy xy xy", 2)
    assert(m.head === ((1L, "x", "y", 5L)))
    assert(m(1) === ((2L, "xy", "z", 2L)))
  }

  test("trainer stops early when no pairs remain") {
    val m = merges("a b c", 5) // single-char words: no pairs at all
    assert(m.isEmpty)
  }

  test("batched == sequential when the top merges are pairwise token-disjoint") {
    // 8 two-letter words over 16 distinct letters with strictly decreasing
    // counts: the sequential learner's 8 picks are exactly the 8 pairs in
    // count order, no merge creates a token that can pair again, so the
    // batched schedule must coincide — and land in ONE pass
    val text = Seq("ab" -> 100, "cd" -> 90, "ef" -> 80, "gh" -> 70,
      "ij" -> 60, "kl" -> 50, "mn" -> 40, "op" -> 30)
      .flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val seqM = BpeTrainer.train(spark, docs, 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val bat = BpeTrainer.trainBatched(spark, docs, 8).collect()
    val batM = bat.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(batM === seqM, "batched must equal sequential on a disjoint corpus")
    assert(bat.map(_.getInt(4)).max === 1, "all 8 disjoint merges must land in pass 1")
  }

  test("batched learns 8 merges from the real corpus in at most 2 passes") {
    // the VERDICT-r11 #4 bound: one pair-stats job per PASS means a 32k
    // production train is ~hundreds of jobs, not 32k — pin the pass count
    // the hash-checked t_bpe_batched schedule actually achieves
    val rows = BpeTrainer.bpeBatched(spark, sf001).collect()
    assert(rows.length === 8)
    assert(rows.map(_.getInt(4)).max <= 2, rows.map(_.getInt(4)).mkString(","))
    // within a pass, admitted pairs are pairwise token-disjoint (the rule
    // that makes the batch order-independent)
    rows.groupBy(_.getInt(4)).foreach { case (_, ms) =>
      // ACROSS pairs: each pair's token set must not intersect another's
      // (a self-pair like (g,g) is fine — it only uses one token)
      val sets = ms.map(r => Set(r.getString(1), r.getString(2)))
      sets.toSeq.combinations(2).foreach { pair =>
        assert((pair.head & pair(1)).isEmpty,
          s"conflicting tokens in one pass: ${pair.head} vs ${pair(1)}")
      }
    }
  }

  test("encode: token totals sit between words and chars; merges strictly compress") {
    val rows = graft.text.BpeTrainer.bpeEncode(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, chars, bpe) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // every word is >= 1 token; no token can be shorter than a char
      assert(bpe >= words, r.toString)
      assert(bpe <= chars, r.toString)
      assert(r.getDouble(5) >= 1.0, r.toString)
    }
    // the learned merges actually bite on the corpus as a whole
    assert(rows.map(_.getLong(4)).sum < rows.map(_.getLong(3)).sum,
      "encoding with 8 learned merges must compress below character count")
  }
}
