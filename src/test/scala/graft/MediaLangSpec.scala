package graft

import graft.multimodal.Media
import graft.text.LangId

/** Multimodal plumbing (schema/batch shape real, decode stubbed) and the
  * language-ID heuristic on unambiguous inputs.
  */
class MediaLangSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub is deterministic and bounded") {
    val bytes = Array[Byte](-1, 64, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
    val (w1, h1, f1) = Media.decodeStub(bytes)
    val (w2, h2, f2) = Media.decodeStub(bytes)
    assert((w1, h1) === (w2, h2) && f1.toSeq === f2.toSeq)
    assert(w1 >= 1 && w1 <= 64 && h1 >= 1 && h1 <= 64)
    assert(f1.length === 8 && f1.forall(v => v >= 0f && v <= 1f))
  }

  test("extractFeatures preserves ids and emits the typed feature schema") {
    val items = Media.mediaTable(spark, sf001)
    val feats = Media.extractFeatures(items, batchSize = 16)
    val n = items.count()
    assert(feats.count() === n)
    val one = feats.head()
    assert(one.feat.length === 8)
    assert(Set("image", "audio", "video").contains(one.kind))
  }

  test("resize stub caps dimensions, preserving aspect-ish scaling") {
    val feats = Media.extractFeatures(Media.mediaTable(spark, sf001))
    val resized = Media.resizeStub(feats, maxDim = 16)
    assert(resized.collect().forall(m => m.width <= 16 && m.height <= 16 && m.width >= 1))
    assert(resized.count() === feats.count())
  }

  test("frame sampling explodes only video items, deterministically") {
    val items = Media.mediaTable(spark, sf001)
    val frames = Media.frameSampleStub(items, everyNth = 2)
    val out = frames.collect()
    assert(out.nonEmpty && out.forall(_.kind === "frame"))
    val again = Media.frameSampleStub(items, everyNth = 2).collect()
    assert(out.map(_.media_id).sorted.toSeq === again.map(_.media_id).sorted.toSeq)
  }

  test("m_frame_sample: frame ids, byte-XOR, and per-video frame counts re-derive from payloads") {
    val rows = Media.frameSample(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 == 16L), "payload is an md5 digest — 16 bytes")
    val videos = Media.mediaTable(spark, sf001).collect()
      .filter(_.kind == "video").map(m => m.media_id -> m.content).toMap
    val byParent = rows.groupBy(_._1 / 1000)
    assert(byParent.keySet === videos.keySet, "every video sampled, nothing else")
    byParent.foreach { case (id, fs) =>
      val content = videos(id)
      val nFrames = 1 + java.lang.Byte.toUnsignedInt(content(2)) % 8
      val expect = (0 until nFrames by 2).map { f =>
        (id * 1000 + f, (java.lang.Byte.toUnsignedInt(content(0)) ^ f).toLong, 16L)
      }
      assert(fs.sortBy(_._1).toSeq === expect, s"video $id frame set mismatch")
    }
  }

  test("partition-by-kind layout prunes other modalities at scan") {
    val out = java.nio.file.Files.createTempDirectory("media").toString
    Media.writePartitionedByKind(Media.mediaTable(spark, sf001), out)
    val scan = spark.read.parquet(out).where($"kind" === "video")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(kind"), plan)
    assert(scan.count() > 0)
  }

  test("lang-id predicts the dominant stopword profile") {
    val docs = Seq(
      (1L, "xx", "the cat sat on the mat and the dog ran to the park"),
      (2L, "xx", "el perro y la casa de que el gato y la luna"))
      .toDF("doc_id", "lang", "text")
    val out = LangId.predict(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
  }
}
