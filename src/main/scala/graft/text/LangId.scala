package graft.text

import graft.model.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heuristic language identification (builder brief: "language-ID (n-gram
  * heuristic)"). Scores each document against per-language marker-token
  * profiles (the classic stopword-profile method); prediction = argmax
  * score with a lexicographic tiebreak. Pure column arithmetic — one scan,
  * no shuffle — so it runs as a projection at any scale. Profiles here are
  * tiny and seed-pinned; swap in real frequency profiles the same way.
  * (Rows-only driver check: the corpus is synthetic token soup, so accuracy
  * is not the point — the operator shape is.)
  */
object LangId {

  val Profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Count of profile tokens present in the token array. */
  private def score(toks: Column, profile: Seq[String]): Column = {
    val arr = array(profile.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t))).cast("double")
  }

  /** Per-doc language scores + argmax prediction. */
  def predict(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val scored = Profiles.toSeq.sortBy(_._1).map { case (lang, prof) =>
      struct(score(toks, prof).as("score"), lit(lang).as("lang"))
    }
    // argmax via array_max over (score, lang) structs — ties break toward
    // the lexicographically LAST lang; deterministic either way.
    docs.select(
      col("doc_id"),
      col("lang").as("actual_lang"),
      array_max(array(scored: _*)).getField("lang").as("predicted_lang"),
      array_max(array(scored: _*)).getField("score").as("best_score"))
  }

  def langIdQuery(spark: SparkSession, sfDir: String): DataFrame =
    predict(Tables.documents(spark, sfDir).where(col("doc_id") < 300)).orderBy("doc_id")

  /** The same scoring + argmax in DuckDB SQL (generated from [[Profiles]]
    * so the two can't drift). The argmax tie rule — equal scores break
    * toward the lexicographically LAST lang, matching Spark's struct
    * array_max — becomes a CASE that tests langs in reverse-lex order.
    */
  val langIdSql: String = {
    val langs = Profiles.keys.toSeq.sorted
    val scoreCols = langs.map { l =>
      val list = Profiles(l).map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains($list, t))) AS DOUBLE) AS s_$l"
    }
    val greatest = langs.map("s_" + _).mkString("greatest(", ", ", ")")
    val argmax = langs.reverse.init
      .map(l => s"WHEN s_$l = m THEN '$l'")
      .mkString("CASE ", " ", s" ELSE '${langs.head}' END")
    s"""WITH s AS (
       |  SELECT doc_id, lang AS actual_lang,
       |    ${scoreCols.mkString(",\n    ")}
       |  FROM documents WHERE doc_id < 300),
       |m AS (SELECT *, $greatest AS m FROM s)
       |SELECT doc_id, actual_lang, $argmax AS predicted_lang, m AS best_score
       |FROM m ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_lang_id" -> (langIdQuery _))

  val oracle: Map[String, String] = Map(
    "t_lang_id" -> langIdSql)
}
