package graft

import graft.sources.ShardSink
import org.apache.spark.sql.functions._

/** CTAS / RTAS through the sink catalog (round 14): directory-based
  * existence lets the analyzer's CREATE check pass on fresh identifiers
  * while every identifier still READS as an (empty) landing zone.
  */
class CtasSpec extends SparkSpec {
  test("CTAS creates and loads; evolved columns persist; duplicates refuse; RTAS replaces; DROP frees the name") {
    val root = java.nio.file.Files.createTempDirectory("ctas_spec").toFile.getPath
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.ct", classOf[graft.sources.ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.ct.root", root)
    s.read.format("graft.sources.DocGenSource")
      .option("numDocs", "100").option("numPartitions", "1").load()
      .writeTo("ct.src").append()
    // core-schema CTAS
    s.sql("CREATE TABLE ct.derived AS SELECT * FROM ct.src WHERE doc_id < 40")
    assert(s.read.table("ct.derived").count() === 40L)
    // the derived table is a full citizen: DML, history, time travel
    s.sql("DELETE FROM ct.derived WHERE shard = 0")
    assert(s.read.table("ct.derived").where(col("shard") === 0).count() === 0L)
    // CTAS with EXTRA columns: persisted as evolution flips on the fresh
    // table, the write lands against the evolved shape by name
    s.sql("CREATE TABLE ct.scored AS " +
      "SELECT doc_id, shard, body, doc_id * 2 AS score FROM ct.src WHERE doc_id < 10")
    val scored = s.read.table("ct.scored")
    assert(scored.schema.fieldNames.toSeq === Seq("doc_id", "shard", "body", "score"))
    assert(scored.where(col("score") === col("doc_id") * 2).count() === 10L)
    // duplicate CTAS refuses at the analyzer (the table now EXISTS)
    val e1 = intercept[Exception](
      s.sql("CREATE TABLE ct.derived AS SELECT * FROM ct.src"))
    assert(e1.getMessage.contains("ALREADY_EXISTS"), e1.getMessage)
    // a core-violating CTAS refuses loudly
    val e2 = intercept[Exception](
      s.sql("CREATE TABLE ct.bad AS SELECT doc_id, body FROM ct.src"))
    assert(e2.getMessage.contains("core"), e2.getMessage)
    // RTAS replaces content wholesale — ATOMICALLY, on the same version
    // log (StagingTableCatalog: the swap is one truncate flip, not
    // drop+recreate): the version numbering and op trail CONTINUE, and
    // a reader never sees an empty window. Pre-replace snapshot FILES
    // follow the sink's immediate-cleanup retention, exactly like a
    // plain truncate: travelling to them fails LOUDLY as expired —
    // never a silently-empty result
    val derivedDir = new java.io.File(root, "derived").getPath
    val preReplaceV = ShardSink.currentManifestVersion(derivedDir)
    s.sql("REPLACE TABLE ct.derived AS SELECT * FROM ct.src WHERE doc_id >= 40")
    assert(s.read.table("ct.derived").count() === 60L)
    assert(s.read.table("ct.derived").where(col("doc_id") < 40L).count() === 0L)
    assert(ShardSink.currentManifestVersion(derivedDir) === preReplaceV + 1)
    assert(ShardSink.history(derivedDir).last._2 === "truncate")
    val eExp = intercept[Exception](
      s.sql(s"SELECT * FROM ct.derived VERSION AS OF $preReplaceV").count())
    assert(eExp.getMessage.contains("expired"), eExp.getMessage)
    // staged REPLACE with a NEW column evolves the schema; the evolved
    // write lands by name
    s.sql("REPLACE TABLE ct.derived AS " +
      "SELECT doc_id, shard, body, doc_id % 7 AS bucket FROM ct.src WHERE doc_id < 20")
    val rep = s.read.table("ct.derived")
    assert(rep.schema.fieldNames.contains("bucket"))
    assert(rep.where(col("bucket") === col("doc_id") % 7).count() === 20L)
    // DROP frees the name; a fresh CTAS recreates from scratch
    s.sql("DROP TABLE ct.derived")
    val dir = new java.io.File(root, "derived").getPath
    assert(ShardSink.currentManifestVersion(dir) === 0L)
    s.sql("CREATE TABLE ct.derived AS SELECT * FROM ct.src WHERE doc_id < 5")
    assert(s.read.table("ct.derived").count() === 5L)
    // fresh identifiers still read as empty landing zones (no existence
    // gate on the read path)
    assert(s.read.table("ct.never_written").count() === 0L)
    // the directory creation IS the creation election: of two racers
    // calling createTable for one identifier, exactly one wins
    val cat = new graft.sources.ShardSinkCatalog()
    cat.initialize("ct2", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", root)))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "elect")
    val empty = new org.apache.spark.sql.types.StructType()
    cat.createTable(ident, empty,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      java.util.Map.of[String, String]())
    val eRace = intercept[Exception](cat.createTable(ident, empty,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      java.util.Map.of[String, String]()))
    assert(eRace.getMessage.contains("already exists"), eRace.getMessage)
  }
}
