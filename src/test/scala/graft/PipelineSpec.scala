package graft

import java.nio.file.Files

import graft.etl.Pipeline
import graft.etl.Pipeline.StarPaths
import org.apache.spark.sql.functions._

/** The reference's operational loop end-to-end: repeated runs accumulate
  * facts while dimensions stay stable (ids never renumber), FK integrity
  * holds, and new dimension values slot in above the existing max id.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val brazilMap = Map("Ibovespa" -> "Diversificado", "IBrX 50" -> "Financeiro")
  private val countryMap = Map("China" -> "Primário", "EUA" -> "Primário")

  private def rawBatch(rows: (String, String, String, String, String, String)*) =
    rows.toSeq.toDF("nome", "valor_atual_s", "maxima_s", "minima_s", "variacao_s", "pais")

  private val batch1 = rawBatch(
    ("Ibovespa", "1.234,56", "1.240,00", "1.200,10", "+1,25%", "Brasil"),
    ("Quebrado", "N/A", "-", "", "+0,00%", "Brasil"), // dropped
    ("Shanghai", "3.210,98", "3.250,45", "3.200,11", "2,00%", "China"))

  test("re-running the same batch appends facts but never touches dims") {
    val dir = Files.createTempDirectory("star").toString
    val paths = StarPaths(s"$dir/pais", s"$dir/setor", s"$dir/fato")
    val (p1, s1, f1) = Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    assert((p1, s1, f1) === (2L, 2L, 2L)) // Brasil+China; Diversificado+Primário; 2 facts (1 dropped)
    val dims1 = spark.read.parquet(paths.pais).orderBy("nome").collect().toSeq
    val (p2, s2, f2) = Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    assert((p2, s2, f2) === (2L, 2L, 4L)) // facts doubled, dims identical
    assert(spark.read.parquet(paths.pais).orderBy("nome").collect().toSeq === dims1)
  }

  test("new dimension values get fresh ids above the existing max; old ids stable") {
    val dir = Files.createTempDirectory("star").toString
    val paths = StarPaths(s"$dir/pais", s"$dir/setor", s"$dir/fato")
    Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    val before = spark.read.parquet(paths.pais)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    val batch2 = rawBatch(("SP 500", "5.432,10", "5.450,00", "5.400,00", "+0,75%", "EUA"))
    Pipeline.run(spark, batch2, paths, brazilMap, countryMap)
    val after = spark.read.parquet(paths.pais)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(before.forall { case (k, v) => after(k) == v }) // old ids untouched
    assert(after("EUA") > before.values.max) // fresh id past the max
  }

  test("hash surrogate keys: md5-60 value pinned, stable across batches, collision-free") {
    import graft.etl.Dims
    val keys = (1 to 200).map(i => s"user_$i") :+ "alice"
    val df = keys.toDF("k")
    val ids = Dims.withHashIds60(df, "k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // engine-portable pinned value: ('0x' || substr(md5('alice'),1,15))::BIGINT
    assert(ids("alice") === 448194110076271807L)
    assert(ids.values.toSeq.distinct.size === keys.size) // collision-free domain
    // content hash => same id when the key arrives again in a later batch
    val again = Dims.withHashIds60(Seq("alice").toDF("k"), "k").collect()(0).getLong(1)
    assert(again === ids("alice"))
    // the Spark-private xxhash64 variant is deterministic too
    val x1 = Dims.withHashIds(df, "k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val x2 = Dims.withHashIds(df, "k").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(x1 === x2)
  }

  test("FK integrity: every fact row resolves to a dim row (anti-join empty)") {
    val dir = Files.createTempDirectory("star").toString
    val paths = StarPaths(s"$dir/pais", s"$dir/setor", s"$dir/fato")
    Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    val fato = spark.read.parquet(paths.fato)
    val pais = spark.read.parquet(paths.pais)
    val orphans = fato.join(pais, fato("pais_id") === pais("id"), "left_anti")
    assert(orphans.isEmpty)
    val setor = spark.read.parquet(paths.setor)
    assert(fato.join(setor, fato("setor_id") === setor("id"), "left_anti").isEmpty)
  }

  test("F-6: facts are stamped with data_coleta; frozen literal is stable across the append") {
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    val dir = Files.createTempDirectory("star").toString
    val paths = StarPaths(s"$dir/pais", s"$dir/setor", s"$dir/fato")
    val frozen = "2026-01-02 03:04:05"
    Pipeline.run(spark, batch1, paths, brazilMap, countryMap,
      collectedAt = to_timestamp(lit(frozen)))
    val fato = spark.read.parquet(paths.fato)
    assert(fato.schema("data_coleta").dataType.typeName === "timestamp")
    val stamps = fato.select("data_coleta").collect().map(_.getTimestamp(0)).toSet
    assert(stamps === Set(java.sql.Timestamp.valueOf(frozen)))
    // the operational default (current_timestamp) also stamps every row
    Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    assert(spark.read.parquet(paths.fato).where("data_coleta IS NULL").isEmpty)
  }

  test("upsertDim recovers from a crash between the two swap renames") {
    val dir = Files.createTempDirectory("star").toString
    val paths = StarPaths(s"$dir/pais", s"$dir/setor", s"$dir/fato")
    Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    val idsBefore = spark.read.parquet(paths.pais)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    // simulate the crash window: target renamed aside, staging never moved in
    val fs = new org.apache.hadoop.fs.Path(paths.pais)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(paths.pais),
      new org.apache.hadoop.fs.Path(paths.pais + "__old")))
    // next run must restore __old BEFORE reading existing ids — without the
    // recovery it would renumber from 1 and orphan previously appended facts
    Pipeline.run(spark, batch1, paths, brazilMap, countryMap)
    val idsAfter = spark.read.parquet(paths.pais)
      .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(idsAfter === idsBefore)
  }

  test("end-to-end: batches through Pipeline.run serve the reference's flagship query") {
    // the complete reference workflow (main.py:159–177): scrape batches →
    // load the star → obter_top_10_indices over the persisted tables
    val dir = Files.createTempDirectory("star").toString
    val paths = StarPaths(s"$dir/pais", s"$dir/setor", s"$dir/fato")
    val batch = rawBatch(
      ("Ibovespa", "1.234,56", "1.240,00", "1.200,10", "+1,25%", "Brasil"),
      ("Shanghai", "3.210,98", "3.250,45", "3.200,11", "2,00%", "China"),
      ("SZSE Component", "9.876,54", "9.900,00", "9.800,00", "-1,10%", "China"),
      ("SP 500", "5.432,10", "5.450,00", "5.400,00", "+0,75%", "EUA"),
      ("Quebrado", "N/A", "-", "", "x%", "EUA")) // dropped
    Pipeline.run(spark, batch, paths, brazilMap, countryMap)
    val fato = spark.read.parquet(paths.fato)
    val pais = spark.read.parquet(paths.pais).withColumnRenamed("nome", "pais")
    val setor = spark.read.parquet(paths.setor).withColumnRenamed("nome", "setor")
    // main.py:149–157 transliterated over OUR star (P-1..P-4, J-1/J-2, W-1/W-2)
    val top = fato
      .join(pais, fato("pais_id") === pais("id"))
      .join(setor, fato("setor_id") === setor("id"))
      .where(col("setor") === "Primário" && col("pais").isin("China", "EUA"))
      .select(fato("nome"), col("pais"), col("setor"), col("maxima"))
      .orderBy(desc("maxima"), asc("nome"))
      .limit(10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSeq
    assert(top === Seq(
      ("SZSE Component", "China", 9900.0),
      ("SP 500", "EUA", 5450.0),
      ("Shanghai", "China", 3250.45))) // Ibovespa (Brasil) filtered out, Quebrado dropped
  }

  test("classification defaults: unmapped Brazil index falls to Diversificado, unmapped country to Primário") {
    val out = Pipeline.transform(
      rawBatch(
        ("Unknown BR Index", "1,00", "1,00", "1,00", "0,00%", "Brasil"),
        ("Nikkei", "2,00", "2,00", "2,00", "0,00%", "Japão")),
      brazilMap, countryMap)
    val setores = out.select("nome", "setor").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(setores("Unknown BR Index") === "Diversificado")
    assert(setores("Nikkei") === "Primário")
  }
}
