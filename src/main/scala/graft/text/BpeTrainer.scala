package graft.text

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE TRAINER — the algorithm that builds a
  * tokenizer vocabulary (Sennrich et al., ACL 2016), distributed the way it
  * actually scales: pair statistics are computed over the WEIGHTED
  * VOCABULARY (distinct word × count), not the corpus — after the first
  * word-count aggregate the iteration cost is independent of corpus size
  * (a 100 TB corpus and a 1 GB corpus with the same vocabulary train at
  * the same speed). Each round is one (pair)-keyed aggregate over the
  * vocab + a 1-row driver collect (the argmax — the standard iterative
  * control loop), then a scan-side merge application; the vocab frame is
  * `localCheckpoint`ed per round (PLANS.md §15 — persist alone would let
  * the plan nest round over round).
  *
  * Merge application is engine-portable BY CONSTRUCTION: a word's symbol
  * sequence is a string of tokens joined by TWO spaces, padded with one
  * space each end (`" a  b  c "`). Replacing `" l  r "` with `" lr "`
  * consumes one space from each neighboring separator and the replacement
  * restores it, so (a) the pad/separator invariant is preserved, (b) a
  * match can never straddle token boundaries (the pattern's outer spaces
  * anchor whole tokens), and (c) one plain left-to-right non-overlapping
  * `replace` — identical semantics in Spark and DuckDB, no regex, no
  * lookaround — equals the classic greedy merge fold (verified in the
  * spec on `aaaaa` — the odd-run case where naive single-space joining
  * diverges).
  *
  * Tie rule: best pair = max count, then ascending pair string `"l r"` —
  * total because pairs are distinct.
  */
object BpeTrainer {

  val DefaultMerges = 8

  /** Per-word symbol-string representation: `" a  b  c "`. */
  private def symRep(word: Column): Column =
    concat(lit(" "), rtrim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** Weighted vocabulary of lowercase letter-run words → (rep, cnt). */
  def vocabOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .select(symRep(col("word")).as("rep"), col("cnt"))

  /** The learned merge table after `nMerges` rounds: (rank, left, right,
    * freq). The returned frame is driver-built (≤ nMerges rows — the
    * trainer's OUTPUT is inherently tiny; all heavy work ran distributed).
    */
  def train(spark: SparkSession, docs: DataFrame, nMerges: Int = DefaultMerges): DataFrame = {
    import spark.implicits._
    var vocab = vocabOf(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // adjacent-pair statistics over the vocab, weighted by word count
      val toks = split(trim(col("rep")), "  ")
      val pairs = vocab
        .select(col("cnt"), toks.as("t"))
        .where(size(col("t")) >= 2)
        .select(
          col("cnt"),
          // fused codegen bigram loop (graft.functions.GraftNgrams) — for
          // the guarded size>=2, null-free token arrays here this is
          // string-identical to the previous per-element lambda
          // transform(sequence(1, size(t)-1), j -> concat(t[j], ' ', t[j+1]))
          explode(graft.functions.GraftNgrams.ngrams(col("t"), 2)).as("pair"))
        .groupBy("pair")
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("pair"))
        .limit(1)
        .collect()
      if (pairs.isEmpty) exhausted = true
      else {
        val best = pairs.head
        val Array(l, r) = best.getString(0).split(" ", 2)
        merges += ((rank.toLong, l, r, best.getLong(1)))
        vocab = vocab
          .select(
            expr(s"replace(rep, ' $l  $r ', ' $l$r ')").as("rep"),
            col("cnt"))
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "freq").orderBy("rank")
  }

  def bpeMerges(spark: SparkSession, sfDir: String): DataFrame =
    train(spark, Tables.documents(spark, sfDir).where(col("doc_id") < 300))

  /** Candidate window per batched pass: the driver pulls at most this many
    * (pair, freq) rows per pass — a fixed-size control-plane collect, like
    * every other bounded driver pull in the repo.
    */
  val PassCandidates = 32

  /** BATCHED merge learning (round-12 VERDICT #4): learn up to
    * `nMerges - learned` TOKEN-DISJOINT merges per pass instead of one —
    * the schedule that turns a 32k-merge production train from 32k Spark
    * jobs into ~hundreds (one pair-stats job per PASS, not per merge).
    *
    * Admission rule, chosen because it is exact and oracle-expressible:
    * scan the top-[[PassCandidates]] pairs in (freq DESC, pair ASC) order
    * and admit a pair iff neither of its tokens was used by an
    * earlier-admitted pair in the same pass — where "used" includes the
    * CREATED token l+r of every admitted pair, so a candidate touching a
    * token an earlier same-pass merge creates is deferred (its adjacency
    * counts would otherwise be stale). Token-disjointness makes the
    * batch ORDER-INDEPENDENT (merging `a b` cannot create, destroy, or
    * recount any `c d` adjacency when {a,b} ∩ {c,d} = ∅), so applying the
    * admitted set in one vocab update equals applying them sequentially —
    * and when the sequential learner's next k picks happen to be pairwise
    * disjoint, the two schedules coincide exactly (BpeTrainerSpec pins
    * both: coincidence on a disjoint-by-construction corpus, and the
    * ≥8-merges-in-≤2-passes bound on the real one). Where they differ —
    * a merge CREATING a token whose new pairs outrank the next candidate —
    * the batched learner defers that pair to the next pass: the standard
    * batched-BPE trade (one pass of staleness) accepted by every scalable
    * trainer, documented rather than hidden.
    */
  def trainBatched(spark: SparkSession, docs: DataFrame, nMerges: Int = DefaultMerges): DataFrame = {
    import spark.implicits._
    var vocab = vocabOf(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long, Int)]
    var pass = 0
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val toks = split(trim(col("rep")), "  ")
      val cands = vocab
        .select(col("cnt"), toks.as("t"))
        .where(size(col("t")) >= 2)
        .select(
          col("cnt"),
          // fused codegen bigram loop (graft.functions.GraftNgrams) — for
          // the guarded size>=2, null-free token arrays here this is
          // string-identical to the previous per-element lambda
          // transform(sequence(1, size(t)-1), j -> concat(t[j], ' ', t[j+1]))
          explode(graft.functions.GraftNgrams.ngrams(col("t"), 2)).as("pair"))
        .groupBy("pair")
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(desc("freq"), asc("pair"))
        .limit(PassCandidates)
        .collect()
      if (cands.isEmpty) exhausted = true
      else {
        pass += 1
        val cap = nMerges - merges.size
        val taken = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        cands.foreach { row =>
          if (taken.size < cap) {
            val Array(l, r) = row.getString(0).split(" ", 2)
            // the CREATED token l+r is used too: a later same-pass candidate
            // touching it would see adjacencies the earlier merge creates,
            // breaking the order-independence the batch relies on
            if (!used(l) && !used(r)) {
              taken += ((l, r, row.getLong(1)))
              used += l; used += r; used += (l + r)
            }
          }
        }
        taken.foreach { case (l, r, f) =>
          merges += ((merges.size + 1L, l, r, f, pass))
        }
        // one vocab update for the whole batch — disjointness makes the
        // chained replaces order-independent; tokens are [a-z]+ only, safe
        // to inline
        val repSql = taken.foldLeft("rep") { case (s, (l, r, _)) =>
          s"replace($s, ' $l  $r ', ' $l$r ')"
        }
        vocab = vocab.select(expr(repSql).as("rep"), col("cnt")).localCheckpoint(true)
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "freq", "pass").orderBy("rank")
  }

  def bpeBatched(spark: SparkSession, sfDir: String): DataFrame =
    trainBatched(spark, Tables.documents(spark, sfDir).where(col("doc_id") < 300))

  /** DuckDB twin: the SAME [[DefaultMerges]] rounds unrolled as CTEs —
    * vocab v0, then per round: pair stats p_i from v_{i-1}, best b_i
    * (max freq, ascending pair string), vocab update v_i via the identical
    * boundary-preserving replace. No values cross from the Spark side; the
    * oracle re-trains from the raw table and must land on the same table.
    */
  /** The shared training CTE chain (v0, then p_i/b_i/v_i per round) —
    * MATERIALIZED throughout per the repo's iterated-CTE rule: the encode
    * oracle references each b_i FOUR times per replace level, and inlined
    * evaluation of an 8-deep chain re-referenced 32× is exponential.
    */
  private val mergesCtes: String = {
    val iters = (1 to DefaultMerges).map { i =>
      val prev = s"v${i - 1}"
      s"""p$i AS MATERIALIZED (
         |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
         |    SELECT cnt,
         |           unnest(list_transform(generate_series(1, len(t) - 1),
         |                                 j -> t[j] || ' ' || t[j + 1])) AS pair
         |    FROM (SELECT cnt, string_split(trim(rep), '  ') AS t FROM $prev)
         |    WHERE len(t) >= 2)
         |  GROUP BY pair),
         |b$i AS MATERIALIZED (
         |  SELECT string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r, freq
         |  FROM p$i ORDER BY freq DESC, pair LIMIT 1),
         |v$i AS MATERIALIZED (
         |  SELECT replace(rep, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS rep,
         |         cnt
         |  FROM $prev CROSS JOIN b$i b)"""
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (
       |  SELECT ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' ' AS rep,
       |         CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents WHERE doc_id < 300)
       |  GROUP BY 1),
       |$iters""".stripMargin
  }

  val bpeMergesSql: String = {
    val out = (1 to DefaultMerges)
      .map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, l AS \"left\", r AS \"right\", freq FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH $mergesCtes
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** DuckDB twin of the BATCHED schedule — same unrolled-CTE discipline as
    * [[bpeMergesSql]], with the per-pass greedy admission expressed as a
    * LINEAR recursive CTE over the ranked candidate window (one row per
    * candidate index, state = (used-token list, taken-pair list)) and the
    * batch vocab update as a second recursion over the admitted list. Two
    * passes unrolled; BpeTrainerSpec pins that two passes suffice for the
    * 8-merge run on this corpus (the oracle would go red, not silently
    * wrong, if a regeneration ever needed a third — bx2's ranks would be
    * missing).
    */
  val bpeBatchedSql: String = {
    def passBlock(i: Int, capExpr: String, prevV: String): String =
      s"""p$i AS MATERIALIZED (
         |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
         |    SELECT cnt,
         |           unnest(list_transform(generate_series(1, len(t) - 1),
         |                                 j -> t[j] || ' ' || t[j + 1])) AS pair
         |    FROM (SELECT cnt, string_split(trim(rep), '  ') AS t FROM $prevV)
         |    WHERE len(t) >= 2)
         |  GROUP BY pair),
         |c$i AS MATERIALIZED (
         |  SELECT pair, string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r, freq,
         |         row_number() OVER (ORDER BY freq DESC, pair) AS rn
         |  FROM p$i QUALIFY rn <= $PassCandidates),
         |s$i(rn, used, taken) AS (
         |  SELECT 0, []::VARCHAR[], []::VARCHAR[]
         |  UNION ALL
         |  SELECT c.rn,
         |         CASE WHEN list_contains(s.used, c.l) OR list_contains(s.used, c.r)
         |                   OR len(s.taken) >= $capExpr
         |              THEN s.used
         |              ELSE list_append(list_append(list_append(s.used, c.l), c.r), c.l || c.r) END,
         |         CASE WHEN list_contains(s.used, c.l) OR list_contains(s.used, c.r)
         |                   OR len(s.taken) >= $capExpr
         |              THEN s.taken ELSE list_append(s.taken, c.pair) END
         |  FROM s$i s JOIN c$i c ON c.rn = s.rn + 1),
         |a$i AS MATERIALIZED (SELECT taken FROM s$i ORDER BY rn DESC LIMIT 1),
         |bx$i AS MATERIALIZED (
         |  SELECT u.pair, string_split(u.pair, ' ')[1] AS l, string_split(u.pair, ' ')[2] AS r,
         |         u.ord, p.freq
         |  FROM (SELECT unnest(taken) AS pair, generate_subscripts(taken, 1) AS ord FROM a$i) u
         |  JOIN p$i p ON u.pair = p.pair),
         |w$i(ord, rep, cnt) AS (
         |  SELECT 0, rep, cnt FROM $prevV
         |  UNION ALL
         |  SELECT w.ord + 1, replace(w.rep, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' '), w.cnt
         |  FROM w$i w JOIN bx$i b ON b.ord = w.ord + 1),
         |v$i AS MATERIALIZED (
         |  SELECT rep, cnt FROM w$i
         |  WHERE ord = (SELECT COALESCE(MAX(ord), 0) FROM bx$i))""".stripMargin
    s"""WITH RECURSIVE v0 AS MATERIALIZED (
       |  SELECT ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' ' AS rep,
       |         CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents WHERE doc_id < 300)
       |  GROUP BY 1),
       |${passBlock(1, DefaultMerges.toString, "v0")},
       |${passBlock(2, s"$DefaultMerges - (SELECT len(taken) FROM a1)", "v1")}
       |SELECT CAST(ord AS BIGINT) AS rank, l AS "left", r AS "right", freq,
       |       1 AS pass FROM bx1
       |UNION ALL
       |SELECT CAST((SELECT len(taken) FROM a1) + ord AS BIGINT), l, r, freq, 2 FROM bx2
       |ORDER BY rank""".stripMargin
  }

  /** Learned merges for the pinned training slice, memoized per
    * (context, sfDir): ≤8 (left, right) pairs — driver-tiny control
    * plane, exactly like the quantizer/codebook memos.
    */
  private def learnedMerges(spark: SparkSession, sfDir: String): Seq[(String, String)] =
    graft.util.Memo.cached("bpeMerges", spark, sfDir) {
      bpeMerges(spark, sfDir).collect().map(r => (r.getString(1), r.getString(2))).toSeq
    }

  /** TOKENIZATION APPLY — the other half of the trainer's story and the
    * op a training pipeline actually runs over the whole corpus: encode
    * every document with the learned merge table. Pure scan-side: each
    * word's spaced symbol string goes through the 8 literal `replace`
    * calls in rank order (classic BPE application; the merges are
    * broadcast as literals inside one codegen'd projection — no join, no
    * shuffle beyond the final per-source rollup), and the per-source
    * report carries word/char/BPE-token totals plus the chars-per-token
    * compression ratio a tokenizer eval reads. The oracle re-trains the
    * merge table from scratch through the shared MATERIALIZED CTE chain
    * and re-encodes every word in SQL, so training AND application sit
    * under one hash gate.
    */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = learnedMerges(spark, sfDir)
    val spaced = "concat(' ', rtrim(regexp_replace(w, '(.)', '$1  ')), ' ')"
    val chain = merges.foldLeft(spaced) { case (s, (l, r)) =>
      s"replace($s, ' $l  $r ', ' $l$r ')"
    }
    Tables.documents(spark, sfDir)
      .select(
        col("source"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .select(
        col("source"),
        size(col("ws")).cast("long").as("n_words"),
        expr("aggregate(ws, 0L, (a, w) -> a + length(w))").as("n_chars"),
        expr(s"aggregate(ws, 0L, (a, w) -> a + size(split(trim($chain), '  ')))").as("n_bpe"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_bpe")).as("n_bpe"),
        round(sum(col("n_chars")).cast("double") / sum(col("n_bpe")).cast("double"), 6)
          .as("chars_per_token"))
      .orderBy("source")
  }

  val bpeEncodeSql: String = {
    val spaced = "' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' '"
    val chain = (1 to DefaultMerges).foldLeft(spaced) { (s, i) =>
      s"replace($s, ' ' || (SELECT l FROM b$i) || '  ' || (SELECT r FROM b$i) || ' '," +
        s" ' ' || (SELECT l FROM b$i) || (SELECT r FROM b$i) || ' ')"
    }
    s"""WITH $mergesCtes,
       |docs AS (
       |  SELECT doc_id, source, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, source, w,
       |         len(string_split(trim($chain), '  ')) AS bpe_toks,
       |         len(w) AS chars
       |  FROM (SELECT doc_id, source, unnest(ws) AS w FROM docs)),
       |per_doc AS (
       |  SELECT d.doc_id, d.source, len(d.ws) AS n_words,
       |         COALESCE(e.chars, 0) AS n_chars, COALESCE(e.bpe, 0) AS n_bpe
       |  FROM docs d LEFT JOIN (
       |    SELECT doc_id, SUM(chars) AS chars, SUM(bpe_toks) AS bpe
       |    FROM enc GROUP BY doc_id) e ON d.doc_id = e.doc_id)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_words) AS BIGINT) AS n_words,
       |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       |       CAST(SUM(n_bpe) AS BIGINT) AS n_bpe,
       |       ROUND(CAST(SUM(n_chars) AS DOUBLE) / CAST(SUM(n_bpe) AS DOUBLE), 6)
       |         AS chars_per_token
       |FROM per_doc GROUP BY source ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bpe_merges" -> (bpeMerges _),
    "t_bpe_batched" -> (bpeBatched _),
    "t_bpe_encode" -> (bpeEncode _))

  val oracle: Map[String, String] = Map(
    "t_bpe_merges" -> bpeMergesSql,
    "t_bpe_batched" -> bpeBatchedSql,
    "t_bpe_encode" -> bpeEncodeSql)
}
