package graft

import graft.functions.GraftNgrams
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-parity of the fused [[graft.functions.GraftNgrams]] loop against the
  * interpreted HOF composition it replaced (round-20 optimization): same
  * strings, same empty/null contract, for the shipped windows (trigram
  * shingles, bigrams) — on the real sf0.001 corpus AND an adversarial
  * edge-case corpus (short docs, empty tokens from repeated spaces, null
  * text, unicode). The old composition is reconstructed here verbatim so
  * any drift in the new expression fails loudly.
  */
class NgramsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-20 composition, verbatim (null tokens → CASE falls to
    * ELSE → empty array; concat_ws skips null elements).
    */
  private def oldNgrams(t: Column, n: Int): Column = {
    val win = (i: Column) => (0 until n).map(j => element_at(t, i + j + 1))
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", win(i): _*)))
      .otherwise(array().cast("array<string>"))
  }

  private val edge = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "one two"), // < 3 tokens
    (3L, "single"), // < 2 tokens
    (4L, ""), // split("") = [""] — one empty token
    (5L, "a  b   c"), // repeated spaces → empty tokens in the array
    (6L, "ünïcode tökens müst mätch bïtför bït"),
    (7L, null.asInstanceOf[String])) // null text → null token array
    .toDF("doc_id", "text")

  private def corpus = graft.model.Tables.documents(spark, sf001)

  for (n <- Seq(2, 3)) {
    test(s"graft_ngrams(n=$n) is bit-identical to the HOF composition (edge corpus)") {
      val t = split($"text", " ")
      val rows = edge
        .select(
          $"doc_id",
          GraftNgrams.ngrams(t, n).as("fused"),
          oldNgrams(t, n).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2), s"doc ${r.getLong(0)}")
      }
      // the null-text row must land on the empty-array arm, not null
      val nullRow = rows.find(_.getLong(0) == 7L).get
      assert(!nullRow.isNullAt(1) && nullRow.getSeq[String](1).isEmpty)
    }

    test(s"graft_ngrams(n=$n) is bit-identical to the HOF composition (sf0.001 corpus)") {
      val t = split($"text", " ")
      val diff = corpus
        .select(GraftNgrams.ngrams(t, n).as("fused"), oldNgrams(t, n).as("hof"))
        .where(not($"fused" <=> $"hof"))
        .count()
      assert(diff === 0L)
    }
  }

  /** The pre-round-20 scan-side minhash composition, verbatim (the
    * four-level HOF chain [[graft.functions.GraftMinhash]] replaced):
    * md5 per shingle, (h, h2m) from the hex halves, 32 seeded values per
    * shingle, elementwise-min fold; null when no shingles.
    */
  private def oldRowMinhashSig(text: Column): Column = {
    val seedMod = 1152921504606846976L // 2^60
    val seedMask = 36028797018963968L // 2^55
    val digests = transform(oldNgrams(split(text, " "), 3), sh => md5(sh.cast("binary")))
    val pairs = transform(digests, m =>
      struct(
        conv(substring(m, 1, 15), 16, 10).cast("long").as("h"),
        (conv(substring(m, 16, 15), 16, 10).cast("long") % lit(seedMask)).as("h2m")))
    val seeds = typedLit((0L until 32L).toSeq)
    val perShingle = transform(pairs, p =>
      transform(seeds, s => (p.getField("h") + s * p.getField("h2m")) % lit(seedMod)))
    val folded = aggregate(
      perShingle,
      typedLit(Seq.fill(32)(Long.MaxValue)),
      (acc, v) => zip_with(acc, v, (a, b) => least(a, b)))
    when(size(digests) > 0, folded).otherwise(lit(null).cast("array<bigint>"))
  }

  test("graft_minhash is bit-identical to the HOF row-signature composition") {
    import graft.text.Dedup
    for (df <- Seq(edge, corpus.toDF())) {
      val diff = df
        .select(
          Dedup.rowMinhashSig($"text").as("fused"),
          oldRowMinhashSig($"text").as("hof"))
        .where(not($"fused" <=> $"hof"))
        .count()
      assert(diff === 0L)
    }
    // null contract: null text and < 3 tokens both yield a NULL signature
    val nulls = edge.where($"doc_id".isin(2L, 3L, 4L, 7L))
      .select(Dedup.rowMinhashSig($"text")).collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("graft_md5h60 / graft_md5halves are bit-identical to the hex/conv compositions") {
    val seedMask = 36028797018963968L // 2^55
    // the pre-round-20 compositions, verbatim
    def oldH60(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    def oldH2m(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 16, 15), 16, 10).cast("long") % lit(seedMask)
    val probes = Seq("", " ", "a", "the quick brown fox", "ünïcode tökens", "a" * 4096)
      .toDF("s")
      .union(corpus.select($"text".as("s")))
      .union(edge.select($"text".as("s")))
    val fused = graft.functions.GraftMd5.halves($"s").as("hh")
    val diff = probes
      .select(
        graft.functions.GraftMd5.h60($"s").as("f60"), oldH60($"s").as("o60"),
        fused.getField("h").as("fh"), fused.getField("h2m").as("fh2m"),
        oldH2m($"s").as("oh2m"))
      .where(not($"f60" <=> $"o60") || not($"fh" <=> $"o60") || not($"fh2m" <=> $"oh2m"))
      .count()
    assert(diff === 0L)
  }

  test("graft_md5top(4) and graft_bitlen are bit-identical to their compositions") {
    // samplers' 16-bit bucket: conv(substring(md5(x),1,4),16,10)
    val probes = corpus.select($"doc_id".cast("string").as("s"))
      .union(Seq("", "0", "a b", "ünïcode").toDF("s"))
    val bucketDiff = probes
      .select(
        graft.functions.GraftMd5.top($"s", 4).as("f"),
        conv(substring(md5($"s".cast("binary")), 1, 4), 16, 10).cast("long").as("o"))
      .where(not($"f" <=> $"o")).count()
    assert(bucketDiff === 0L)
    // bit length: length(conv(cast(v as string),10,2)) — including the 0 and
    // negative corners the call sites can't produce but the twin must match
    val vals = (Seq(0L, 1L, 2L, 3L, 255L, 256L, Long.MaxValue, -1L, -5L, Long.MinValue)
      ++ (1 to 62).map(1L << _)).toDF("v")
    val bitDiff = vals
      .select(
        graft.functions.GraftMd5.bitLen($"v").as("f"),
        length(conv($"v".cast("string"), 10, 2)).cast("bigint").as("o"))
      .where(not($"f" <=> $"o")).count()
    assert(bitDiff === 0L)
  }

  test("graft_ngrams skips null ELEMENTS like concat_ws (and via SQL registry)") {
    // concat_ws(' ', 'a', NULL, 'c') = 'a c' — the fused loop must keep
    // that rule even though split() never produces null tokens
    val withNulls = Seq(Tuple1(Seq("a", null, "c", "d"))).toDF("t")
    val fused = withNulls.select(GraftNgrams.ngrams($"t", 3)).as[Seq[String]].head()
    assert(fused === Seq("a c", "c d")) // trigram windows with null skipped
    // SQL spelling through the registry (register() ran in SparkSpec)
    withNulls.createOrReplaceTempView("ngrams_probe")
    val viaSql = spark.sql("SELECT graft_ngrams(t, 3) FROM ngrams_probe")
      .as[Seq[String]].head()
    assert(viaSql === fused)
  }
}
