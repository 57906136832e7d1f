package graft

import graft.sources.ShardSink
import org.apache.spark.sql.functions._

/** Round-15 write-side schema evolution (r14 verdict #4–5): Delta's
  * `mergeSchema` writer option on the path-based sink, and the staged
  * REPLACE whose schema evolution now rides the truncate commit itself —
  * a failed stage rolls back schema AND content.
  */
class ShardSinkEvolveSpec extends SparkSpec {

  private def freshDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("shardsink_ev").toFile
    d.deleteOnExit()
    d
  }

  private def docs(n: Int) =
    spark.read.format("graft.sources.DocGenSource")
      .option("numDocs", n.toString).option("numPartitions", "2").load()

  private def readBack(dir: String) =
    spark.read.format("graft.sources.ShardSinkSource").option("path", dir).load()

  test("mergeSchema append: new column lands WITH its rows in one commit; readers null-fill old rows") {
    val dir = freshDir().getPath
    docs(200).write.format("graft.sources.ShardSinkSource")
      .option("path", dir).mode(org.apache.spark.sql.SaveMode.Append).save()
    assert(ShardSink.currentManifestVersion(dir) === 1L)
    // a wider frame with mergeSchema: ONE commit carries schema + rows —
    // no separate ALTER version a crash could strand
    docs(200).withColumn("doc_id", col("doc_id") + 200L)
      .withColumn("lang", concat(lit("l"), (col("doc_id") % 3).cast("string")))
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    assert(ShardSink.currentManifestVersion(dir) === 2L,
      "evolution must ride the append commit, not a separate ALTER")
    assert(ShardSink.tableSchema(dir).fieldNames.toSeq ===
      Seq("doc_id", "shard", "body", "lang"))
    val back = readBack(dir)
    assert(back.count() === 400L)
    assert(back.where(col("lang").isNull).count() === 200L, "old rows null-fill")
    assert(back.where(col("doc_id") >= 200L && col("lang").isNull).count() === 0L)
    // the previous snapshot still reads under its OLD 3-column shape
    assert(spark.read.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("versionAsOf", "1").load()
      .schema.fieldNames.toSeq === Seq("doc_id", "shard", "body"))
  }

  test("mergeSchema resolves by NAME: narrower and reordered frames write correctly") {
    val dir = freshDir().getPath
    docs(100).withColumn("lang", lit("pt"))
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    // a 3-column frame against the evolved 4-column table: name
    // resolution null-fills the evolved column
    docs(100).withColumn("doc_id", col("doc_id") + 100L)
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    // REORDERED columns resolve by name, not position
    docs(100).withColumn("doc_id", col("doc_id") + 200L)
      .withColumn("lang", lit("en"))
      .select("lang", "body", "shard", "doc_id")
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    val back = readBack(dir)
    assert(back.count() === 300L)
    assert(back.where(col("lang") === "pt").count() === 100L)
    assert(back.where(col("lang").isNull).count() === 100L)
    assert(back.where(col("lang") === "en").count() === 100L)
    assert(back.where(col("lang") === "en" && col("doc_id") < 200L).count() === 0L)
  }

  test("mergeSchema admission: type conflicts and missing core columns fail loudly") {
    val dir = freshDir().getPath
    docs(50).withColumn("score", lit(1L))
      .write.format("graft.sources.ShardSinkSource")
      .option("path", dir).option("mergeSchema", "true")
      .mode(org.apache.spark.sql.SaveMode.Append).save()
    // same column name, different type: NOT silent widening
    val e1 = intercept[Exception] {
      docs(50).withColumn("score", lit(0.5))
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir).option("mergeSchema", "true")
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + msgs(t.getCause)
    assert(msgs(e1).contains("explicit ALTER TABLE"), msgs(e1).take(300))
    // a frame without a core column
    val e2 = intercept[Exception] {
      docs(50).drop("body")
        .write.format("graft.sources.ShardSinkSource")
        .option("path", dir).option("mergeSchema", "true")
        .mode(org.apache.spark.sql.SaveMode.Append).save()
    }
    assert(msgs(e2).contains("core column"), msgs(e2).take(300))
    // nothing landed from the failed attempts
    assert(readBack(dir).count() === 50L)
    assert(ShardSink.currentManifestVersion(dir) === 1L)
  }

  test("staged REPLACE rollback: a failed RTAS leaves schema AND content untouched") {
    val root = freshDir().getPath
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.graft_rb", classOf[graft.sources.ShardSinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rb.root", root)
    s.sql("CREATE TABLE graft_rb.docs_rb AS SELECT id AS doc_id, " +
      "CAST(id % 16 AS INT) AS shard, concat('b', id) AS body FROM range(0, 100)")
    val dir = new java.io.File(root, "docs_rb").getPath
    val v0 = ShardSink.currentManifestVersion(dir)
    assert(ShardSink.tableSchema(dir).fieldNames.toSeq === Seq("doc_id", "shard", "body"))
    // the replacement evolves a column AND fails mid-write (tab in body is
    // rejected by the serializer): the abort must leave the table exactly
    // as it was — including the SCHEMA, which previously evolved at stage
    // time and survived the abort
    intercept[Exception] {
      s.sql("REPLACE TABLE graft_rb.docs_rb AS SELECT id AS doc_id, " +
        "CAST(id % 16 AS INT) AS shard, concat('x\t', id) AS body, " +
        "id * 2 AS score FROM range(0, 50)")
    }
    assert(ShardSink.tableSchema(dir).fieldNames.toSeq ===
      Seq("doc_id", "shard", "body"),
      "failed staged REPLACE must not leave an evolved schema behind")
    assert(ShardSink.currentManifestVersion(dir) === v0)
    assert(s.read.table("graft_rb.docs_rb").count() === 100L)
    // the same REPLACE without the poison row succeeds: ONE commit flips
    // content + schema together
    s.sql("REPLACE TABLE graft_rb.docs_rb AS SELECT id AS doc_id, " +
      "CAST(id % 16 AS INT) AS shard, concat('x', id) AS body, " +
      "id * 2 AS score FROM range(0, 50)")
    assert(ShardSink.currentManifestVersion(dir) === v0 + 1L,
      "schema evolution must ride the truncate commit")
    assert(ShardSink.tableSchema(dir).fieldNames.toSeq ===
      Seq("doc_id", "shard", "body", "score"))
    val back = s.read.table("graft_rb.docs_rb")
    assert(back.count() === 50L)
    assert(back.agg(sum("score")).head.getLong(0) === (0 until 50).map(_ * 2L).sum)
  }
}
