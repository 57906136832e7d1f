package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: report the nearDupStreamParity contested-partner graph and
  * chunk count per SF (how many micro-batches the parity feeder pays).
  */
object ChunkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.CorpusStreaming._
    import graft.text.Dedup
    args.foreach { sfDir =>
      val keyRows = graft.model.Tables.documents(spark, sfDir)
        .where(col("doc_id") >= NearDupParityLo && col("doc_id") < NearDupParityHi)
        .select(col("doc_id"),
          explode(Dedup.rowBandKeys(Dedup.rowMinhashSig(col("text")),
            md5(col("text").cast("binary")))).as("band_key"))
        .collect()
      val byKey = keyRows.groupBy(_.getString(1)).values.filter(_.length > 1)
      val m = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      byKey.foreach { rows =>
        val ids = rows.map(_.getLong(0)).toSet
        ids.foreach(i => m(i) = m(i) ++ (ids - i))
      }
      val docs = keyRows.map(_.getLong(0)).distinct.sorted
      var chunks = 1
      var cur = Set.empty[Long]
      docs.foreach { d =>
        if (cur.exists(m(d).contains)) { chunks += 1; cur = Set.empty }
        cur += d
      }
      println(s"[$sfDir] docs=${docs.length} contestedKeys=${byKey.size} contestedDocs=${m.size} chunks=$chunks")
    }
    spark.stop()
  }
}
