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
          explode(expr(
            "transform(sequence(1, size(t) - 1), j -> concat(element_at(t, j), ' ', element_at(t, j + 1)))"))
            .as("pair"))
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

  /** DuckDB twin: the SAME [[DefaultMerges]] rounds unrolled as CTEs —
    * vocab v0, then per round: pair stats p_i from v_{i-1}, best b_i
    * (max freq, ascending pair string), vocab update v_i via the identical
    * boundary-preserving replace. No values cross from the Spark side; the
    * oracle re-trains from the raw table and must land on the same table.
    */
  val bpeMergesSql: String = {
    val iters = (1 to DefaultMerges).map { i =>
      val prev = s"v${i - 1}"
      s"""p$i AS (
         |  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS freq FROM (
         |    SELECT cnt,
         |           unnest(list_transform(generate_series(1, len(t) - 1),
         |                                 j -> t[j] || ' ' || t[j + 1])) AS pair
         |    FROM (SELECT cnt, string_split(trim(rep), '  ') AS t FROM $prev)
         |    WHERE len(t) >= 2)
         |  GROUP BY pair),
         |b$i AS (
         |  SELECT string_split(pair, ' ')[1] AS l, string_split(pair, ' ')[2] AS r, freq
         |  FROM p$i ORDER BY freq DESC, pair LIMIT 1),
         |v$i AS (
         |  SELECT replace(rep, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS rep,
         |         cnt
         |  FROM $prev CROSS JOIN b$i b)"""
    }.mkString(",\n")
    val out = (1 to DefaultMerges)
      .map(i =>
        s"SELECT CAST($i AS BIGINT) AS rank, l AS \"left\", r AS \"right\", freq FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH v0 AS (
       |  SELECT ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' ' AS rep,
       |         CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |        FROM documents WHERE doc_id < 300)
       |  GROUP BY 1),
       |$iters
       |$out
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_bpe_merges" -> (bpeMerges _))

  val oracle: Map[String, String] = Map(
    "t_bpe_merges" -> bpeMergesSql)
}
