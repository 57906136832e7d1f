package graft.etl

import graft.etl.Normalize._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end ETL-parity queries (SURVEY.md §3.1): the reference's whole
  * pipeline — multi-source scrape batches (S-2), pt-BR normalization
  * (F-1..F-4), parse-failure row drops (P-7), sector classification with
  * defaults (F-5/J-4), dimension build with deterministic surrogate keys
  * (J-3, §7.4) and FK resolution — as ONE lazy Spark plan. The literal raw
  * rows mimic /root/reference/main.py:108–115 scrape output (incl. malformed
  * rows exercising main.py:116–117 drop semantics).
  */
object EtlQueries {

  private val rawRows: Seq[(String, String, String, String, String, String)] = Seq(
    // (nome, valor_atual, maxima, minima, variacao, pais)
    ("Ibovespa", "1.234,56", "1.240,00", "1.200,10", "+1,25%", "Brasil"),
    ("IBrX 50", "10.876,54", "10.900,00", "10.800,99", "-0,48%", "Brasil"),
    ("Small Caps", "2.345,67", "2.350,00", "2.300,00", "0,75%", "Brasil"),
    ("Quebrado", "N/A", "-", "", "+0,00%", "Brasil"), // dropped: parse failure
    ("Shanghai", "3.210,98", "3.250,45", "3.200,11", "2,00%", "China"),
    ("SZSE Component", "9.876,54", "9.900,00", "9.800,00", "-1,10%", "China"),
    ("SP 500", "5.432,10", "5.450,00", "5.400,00", "+0,75%", "EUA"),
    ("Dow Jones", "38.765,43", "38.800,00", "38.700,00", "+0,10%", "EUA"),
    ("Nasdaq", "", "", "", "", "EUA")) // dropped: empty cells

  private val rawValuesSql: String = rawRows
    .map { case (n, v, ma, mi, va, p) => s"('$n','$v','$ma','$mi','$va','$p')" }
    .mkString(",\n  ")

  /** Raw row/cell-scan fixture modeling the scrape's DOM shape
    * (main.py:94–104): each row is the `td` cell texts of one `tbody tr` —
    * cell 0 is non-data chrome, cell 1 the name anchor, cells 2–5 the
    * pt-BR numerics. Includes a short row (arity guard P-6, main.py:98),
    * an unparseable row (drop P-7, main.py:116–117), and an extra-cell row
    * (positional extraction ignores trailing cells).
    */
  private val rawCellRows: Seq[Seq[String]] = Seq(
    Seq("", "Ibovespa", "1.234,56", "1.240,00", "1.200,10", "+1,25%"),
    Seq("", "IBrX 50", "10.876,54", "10.900,00", "10.800,99", "-0,48%"),
    Seq("", "Shanghai", "3.210,98", "3.250,45", "3.200,11", "2,00%"),
    Seq("", "Truncada", "1,00"), // < 6 cells: dropped by the arity guard (P-6)
    Seq("", "Quebrada", "N/A", "-", "", "x%"), // 6 cells, unparseable: dropped (P-7)
    Seq("", "SP 500", "5.432,10", "5.450,00", "5.400,00", "+0,75%", "extra-cell"))

  /** S-1 faithful analogue of the scrape's row/cell scan: explode-free
    * positional extraction over raw cell arrays — arity guard (P-6,
    * `size(cells) >= 6`) → 1-based `element_at` projection (name at cell 2,
    * numerics at 3–6, exactly main.py:100–104) → F-1..F-4 normalize →
    * P-7 unparseable-row drop. At scale this is the scan-side shape of any
    * semi-structured ingest: a guard + positional projection fused into the
    * scan, no shuffle.
    */
  def rowScan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    rawCellRows.toDF("cells")
      .where(size($"cells") >= 6)
      .select(
        element_at($"cells", 2).as("nome"),
        ptBrNumber("element_at(cells, 3)").as("valor_atual"),
        ptBrNumber("element_at(cells, 4)").as("maxima"),
        ptBrNumber("element_at(cells, 5)").as("minima"),
        ptBrPercent("element_at(cells, 6)").as("variacao"))
      .where(
        $"valor_atual".isNotNull && $"maxima".isNotNull &&
          $"minima".isNotNull && $"variacao".isNotNull)
      .orderBy("nome")
  }

  val rowScanSql: String = {
    val cellValuesSql = rawCellRows
      .map(r => "(" + r.map(c => s"'$c'").mkString("[", ", ", "]") + ")")
      .mkString(",\n  ")
    s"""WITH raw(cells) AS (VALUES
       |  $cellValuesSql),
       |kept AS (SELECT cells FROM raw WHERE len(cells) >= 6),
       |parsed AS (
       |  SELECT cells[2] AS nome,
       |    ${ptBrNumberSql("cells[3]")} AS valor_atual,
       |    ${ptBrNumberSql("cells[4]")} AS maxima,
       |    ${ptBrNumberSql("cells[5]")} AS minima,
       |    ${ptBrPercentSql("cells[6]")} AS variacao
       |  FROM kept)
       |SELECT * FROM parsed
       |WHERE valor_atual IS NOT NULL AND maxima IS NOT NULL
       |  AND minima IS NOT NULL AND variacao IS NOT NULL
       |ORDER BY nome""".stripMargin
  }

  /** Per-country raw HTML page fixtures — the markup SHAPE the scrape's
    * DOM walk sees (main.py:94–104: `tbody tr` → `td` cell texts), as ONE
    * raw string per page: a `<th>` header row (zero `td` cells → arity
    * drop), data rows with a leading chrome cell, a truncated row (P-6),
    * an unparseable row (P-7), and a trailing-extra-cell row (positional
    * extraction ignores it). Single-line so `.` never needs DOTALL.
    */
  private def htmlPage(rows: Seq[Seq[String]]): String =
    "<html><body><table><tbody>" +
      "<tr><th>c</th><th>Nome</th><th>Atual</th><th>Max</th><th>Min</th><th>Var</th></tr>" +
      rows.map(r => "<tr>" + r.map(c => s"<td>$c</td>").mkString + "</tr>").mkString +
      "</tbody></table></body></html>"

  private val htmlPages: Seq[(String, String)] = Seq(
    "Brasil" -> htmlPage(Seq(
      Seq("", "Ibovespa", "1.234,56", "1.240,00", "1.200,10", "+1,25%"),
      Seq("", "IBrX 50", "10.876,54", "10.900,00", "10.800,99", "-0,48%"),
      Seq("", "Truncada", "1,00"), // < 6 cells: arity guard (P-6)
      Seq("", "Quebrada", "N/A", "-", "", "x%"))), // unparseable: drop (P-7)
    "EUA" -> htmlPage(Seq(
      Seq("", "SP 500", "5.432,10", "5.450,00", "5.400,00", "+0,75%", "extra"),
      Seq("", "Dow Jones", "38.765,43", "38.800,00", "38.700,00", "+0,10%"))))

  /** S-1 closed end-to-end (round 17): the same row/cell scan, but from a
    * RAW HTML STRING column — the shape a crawl table actually lands in.
    * `regexp_extract_all` lifts `<tr>…</tr>` rows out of each page, then
    * `<td>…</td>` cell texts out of each row (the header's `<th>` cells
    * extract to zero `td`s and fall to the arity guard), and the result
    * feeds the EXACT chain [[rowScan]] proved: P-6 arity guard → 1-based
    * positional projection → F-1/F-2 normalization → P-7 unparseable-row
    * drop → F-5 sector classification with default. Scan-side regex +
    * explode, no shuffle before the final order — at 100 TB this is the
    * per-document parse stage of an HTML crawl ingest, embarrassingly
    * parallel.
    */
  def htmlRowScan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    htmlPages.toDF("pais", "html")
      .select(col("pais"),
        explode(expr("regexp_extract_all(html, '<tr>(.*?)</tr>', 1)")).as("row"))
      .select(col("pais"),
        expr("regexp_extract_all(row, '<td>(.*?)</td>', 1)").as("cells"))
      .where(size($"cells") >= 6)
      .select(
        col("pais"),
        element_at($"cells", 2).as("nome"),
        ptBrNumber("element_at(cells, 3)").as("valor_atual"),
        ptBrNumber("element_at(cells, 4)").as("maxima"),
        ptBrNumber("element_at(cells, 5)").as("minima"),
        ptBrPercent("element_at(cells, 6)").as("variacao"))
      .where(
        $"valor_atual".isNotNull && $"maxima".isNotNull &&
          $"minima".isNotNull && $"variacao".isNotNull)
      .withColumn("setor",
        Normalize.classify(col("nome"), brazilSectorOf, "Diversificado"))
      .orderBy("nome")
  }

  lazy val htmlRowScanSql: String = {
    val pageValues = htmlPages
      .map { case (p, h) => s"('$p', '$h')" }.mkString(",\n  ")
    val sectorCases = brazilSectorOf.toSeq.sorted
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    s"""WITH pages(pais, html) AS (VALUES
       |  $pageValues),
       |rows_ AS (
       |  SELECT pais, unnest(regexp_extract_all(html, '<tr>(.*?)</tr>', 1)) AS row
       |  FROM pages),
       |cells_ AS (
       |  SELECT pais, regexp_extract_all(row, '<td>(.*?)</td>', 1) AS cells FROM rows_),
       |kept AS (SELECT pais, cells FROM cells_ WHERE len(cells) >= 6),
       |parsed AS (
       |  SELECT pais, cells[2] AS nome,
       |    ${ptBrNumberSql("cells[3]")} AS valor_atual,
       |    ${ptBrNumberSql("cells[4]")} AS maxima,
       |    ${ptBrNumberSql("cells[5]")} AS minima,
       |    ${ptBrPercentSql("cells[6]")} AS variacao
       |  FROM kept)
       |SELECT pais, nome, valor_atual, maxima, minima, variacao,
       |       CASE nome $sectorCases ELSE 'Diversificado' END AS setor
       |FROM parsed
       |WHERE valor_atual IS NOT NULL AND maxima IS NOT NULL
       |  AND minima IS NOT NULL AND variacao IS NOT NULL
       |ORDER BY nome""".stripMargin
  }

  /** Illustrative fixture maps exercising the main.py:106 classification
    * SHAPE — Brazil classifies by index name with default "Diversificado",
    * other countries by country with default "Primário". The entries are
    * deliberately NOT the reference's literal 26-entry map (main.py:52–84
    * was not copied); values here exist to exercise hit/miss/default paths,
    * not to reproduce the reference's sector assignments.
    */
  private val brazilSectorOf =
    Map("Ibovespa" -> "Diversificado", "IBrX 50" -> "Financeiro", "Small Caps" -> "Secundário")
  private val countrySectorOf = Map("China" -> "Primário", "EUA" -> "Primário")

  /** F-1..F-4 + P-7 in isolation: parse pt-BR numerics, drop unparseable. */
  def ptBrNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    rawRows.toDF("nome", "valor_atual_s", "maxima_s", "minima_s", "variacao_s", "pais")
      .withColumn("valor_atual", ptBrNumber("valor_atual_s"))
      .withColumn("variacao", ptBrPercent("variacao_s"))
      .where($"valor_atual".isNotNull && $"variacao".isNotNull)
      .select("nome", "pais", "valor_atual", "variacao")
      .orderBy("nome")
  }

  val ptBrNormalizeSql: String =
    s"""WITH raw(nome, valor_atual_s, maxima_s, minima_s, variacao_s, pais) AS (VALUES
       |  $rawValuesSql)
       |SELECT nome, pais,
       |  ${ptBrNumberSql("valor_atual_s")} AS valor_atual,
       |  ${ptBrPercentSql("variacao_s")} AS variacao
       |FROM raw
       |WHERE ${ptBrNumberSql("valor_atual_s")} IS NOT NULL
       |  AND ${ptBrPercentSql("variacao_s")} IS NOT NULL
       |ORDER BY nome""".stripMargin

  /** The full star build: normalize → drop → classify → dims → FK-resolved
    * fact. Re-expression of main()'s pipeline (main.py:159–173) as one plan:
    * boundaries that were per-row Postgres round-trips become two tiny
    * broadcast joins.
    */
  def starBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = rawRows.toDF("nome", "valor_atual_s", "maxima_s", "minima_s", "variacao_s", "pais")
    // the parse/drop/classify stage IS Pipeline.transform — one definition,
    // so the oracle-checked path and the operational path cannot diverge
    val classified = Pipeline.transform(raw, brazilSectorOf, countrySectorOf)
    val paisDim = Dims
      .withSequentialIds(classified.select($"pais".as("nome_pais")).distinct(), "nome_pais", 0L)
      .withColumnRenamed("id", "pais_id")
    val setorDim = Dims
      .withSequentialIds(classified.select($"setor".as("nome_setor")).distinct(), "nome_setor", 0L)
      .withColumnRenamed("id", "setor_id")
    classified
      .join(broadcast(paisDim), $"pais" === $"nome_pais")
      .join(broadcast(setorDim), $"setor" === $"nome_setor")
      .select($"nome", $"pais_id", $"setor_id", $"valor_atual", $"maxima", $"minima", $"variacao")
      .orderBy("nome")
  }

  val starBuildSql: String = {
    val brazilCase =
      brazilSectorOf.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    val countryCase =
      countrySectorOf.toSeq.sortBy(_._1)
        .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
    s"""WITH raw(nome, valor_atual_s, maxima_s, minima_s, variacao_s, pais) AS (VALUES
       |  $rawValuesSql),
       |parsed AS (
       |  SELECT nome, pais,
       |    ${ptBrNumberSql("valor_atual_s")} AS valor_atual,
       |    ${ptBrNumberSql("maxima_s")} AS maxima,
       |    ${ptBrNumberSql("minima_s")} AS minima,
       |    ${ptBrPercentSql("variacao_s")} AS variacao
       |  FROM raw),
       |clean AS (
       |  SELECT * FROM parsed
       |  WHERE valor_atual IS NOT NULL AND maxima IS NOT NULL
       |    AND minima IS NOT NULL AND variacao IS NOT NULL),
       |cls AS (
       |  SELECT *,
       |    CASE WHEN pais = 'Brasil'
       |      THEN CASE nome $brazilCase ELSE 'Diversificado' END
       |      ELSE CASE pais $countryCase ELSE 'Primário' END
       |    END AS setor
       |  FROM clean),
       |pais_dim AS (
       |  SELECT nome_pais, CAST(ROW_NUMBER() OVER (ORDER BY nome_pais) AS BIGINT) AS pais_id
       |  FROM (SELECT DISTINCT pais AS nome_pais FROM cls)),
       |setor_dim AS (
       |  SELECT nome_setor, CAST(ROW_NUMBER() OVER (ORDER BY nome_setor) AS BIGINT) AS setor_id
       |  FROM (SELECT DISTINCT setor AS nome_setor FROM cls))
       |SELECT nome, pais_id, setor_id, valor_atual, maxima, minima, variacao
       |FROM cls
       |JOIN pais_dim ON pais = nome_pais
       |JOIN setor_dim ON setor = nome_setor
       |ORDER BY nome""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ptbr_normalize" -> (ptBrNormalize _),
    "q_rowscan" -> (rowScan _),
    "q_html_rowscan" -> (htmlRowScan _),
    "q_etl_star_build" -> (starBuild _))

  val oracle: Map[String, String] = Map(
    "q_ptbr_normalize" -> ptBrNormalizeSql,
    "q_rowscan" -> rowScanSql,
    "q_html_rowscan" -> htmlRowScanSql,
    "q_etl_star_build" -> starBuildSql)
}
