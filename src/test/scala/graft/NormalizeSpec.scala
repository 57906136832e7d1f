package graft

import graft.etl.{Dims, Normalize}
import org.apache.spark.sql.functions._

/** F-1/F-2 pt-BR parsing edge semantics (reference main.py:101–104), the
  * P-7 drop contract, and J-4 classify defaults — the cases the DuckDB
  * oracle can't isolate (SURVEY.md §5.2 item 2).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def parseNum(ss: String*): Seq[Option[Double]] =
    ss.toDF("x").select(Normalize.ptBrNumber("x").as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  private def parsePct(ss: String*): Seq[Option[Double]] =
    ss.toDF("x").select(Normalize.ptBrPercent("x").as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("F-1: thousands dot removed BEFORE comma becomes the decimal point") {
    assert(parseNum("1.234,56") === Seq(Some(1234.56)))
    assert(parseNum("1.234.567,89") === Seq(Some(1234567.89)))
  }

  test("F-1: whitespace trimmed; plain integers pass through") {
    assert(parseNum("  42  ", "7,5") === Seq(Some(42.0), Some(7.5)))
  }

  test("F-2: percent strips + and % but preserves -") {
    assert(parsePct("+1,25%") === Seq(Some(1.25)))
    assert(parsePct("-0,50%") === Seq(Some(-0.5)))
    assert(parsePct("0,75%") === Seq(Some(0.75)))
  }

  test("P-7: unparseable input becomes NULL (drop semantics), not an error") {
    assert(parseNum("N/A", "-", "") === Seq(None, None, None))
    assert(parsePct("abc%") === Seq(None))
  }

  test("J-4/F-5: classify probes the map literal and falls back to default") {
    val out = Seq("Ibovespa", "Unknown Index").toDF("nome")
      .select(Normalize.classify($"nome", Map("Ibovespa" -> "Diversificado"), "Fallback"))
      .as[String].collect().toSeq
    assert(out === Seq("Diversificado", "Fallback"))
  }

  test("J-3: get-or-create is idempotent — second run of the same batch adds nothing") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "nome")
    val incoming = Seq("b", "c", "c", "d").toDF("nome")
    val once = Dims.getOrCreate(existing, incoming, "nome")
    val twice = Dims.getOrCreate(once, incoming, "nome")
    assert(once.count() === 4) // a, b, c, d
    assert(twice.count() === 4)
    val ids = once.orderBy("nome").select("id").as[Long].collect().toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L)) // deterministic sequential ids past max
  }

  test("J-3: newEntries returns only unseen keys, deduplicated") {
    val existing = Seq((1L, "x")).toDF("id", "nome")
    val incoming = Seq("x", "y", "y").toDF("nome")
    val fresh = Dims.newEntries(incoming, existing, "nome").as[String].collect().toSeq
    assert(fresh === Seq("y"))
  }

  test("chunking: stride overlap, full coverage, short docs yield one partial chunk") {
    import graft.text.TextOps
    // 130 tokens → chunks at 1..64, 57..120, 113..130 (3 chunks, 8-token overlap)
    val long = (1 to 130).map(i => s"w$i").mkString(" ")
    val df = TextOps.chunksOf(Seq((1L, long), (2L, "a b c")).toDF("doc_id", "text"))
    val chunks = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[String](2)).toMap
    assert(chunks((1L, 0)).size === 64 && chunks((1L, 0)).head === "w1")
    assert(chunks((1L, 1)).head === "w57") // 8-token overlap with chunk 0
    assert(chunks((1L, 2)) === (113 to 130).map(i => s"w$i")) // final partial chunk
    assert(chunks.keys.count(_._1 == 1L) === 3)
    assert(chunks((2L, 0)) === Seq("a", "b", "c")) // short doc: one partial chunk
    assert(chunks.keys.count(_._1 == 2L) === 1)
  }

  test("packing matches an independent driver-side reimplementation; all docs packed once") {
    // NOTE: pack ids within a bucket are NOT guaranteed contiguous — a doc
    // longer than 2× the budget skips an id (floor(before/budget) jumps) —
    // so the check is equality against a from-scratch reimplementation,
    // not shape invariants the implementation never promised
    import graft.text.TextOps
    val docs = graft.model.Tables.documents(spark, sf001).where($"doc_id" < 300)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val assigned: Seq[(String, Long, Long)] = docs.toSeq
      .map { case (id, n) => (md5hex(id.toString), id, n) }
      .groupBy(_._1.take(1))
      .toSeq
      .flatMap { case (bucket, rows) =>
        var before = 0L
        rows.sortBy(r => (r._1, r._2)).map { case (_, _, n) =>
          val pack = before / TextOps.PackBudget
          before += n
          (bucket, pack, n)
        }
      }
    val expected = assigned
      .groupBy(r => (r._1, r._2))
      .toSeq
      .map { case ((b, p), rs) => (b, p, rs.size.toLong, rs.map(_._3).sum) }
      .toSet
    val got = TextOps.packedDocs(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.toSeq.map(_._3).sum === 300) // every doc packed exactly once
  }

  test("deterministic split: stable across evaluations, covers all rows, ~80/10/10") {
    import graft.etl.Sampling
    val df = (1L to 2000L).toDF("id")
    val a = df.select($"id", Sampling.splitColumn($"id").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = df.select($"id", Sampling.splitColumn($"id").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b) // hash-determined, never RNG-determined
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(frac.keySet === Set("train", "val", "test")) // total coverage
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
  }

  test("split bounds that reach 100% keep every row out of the collapsed range") {
    import graft.etl.Sampling
    val df = (1L to 1000L).toDF("id")
    // 75/25: no test split exists; a naive "100" hex bound would silently
    // dump the top ~25% of buckets into 'test'
    val f7525 = df.select(Sampling.splitColumn($"id", 75, 25).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!f7525.contains("test"), s"75/25 must have no test rows, got $f7525")
    assert(math.abs(f7525("train") / 1000.0 - 0.75) < 0.05)
    // 100/0: everything is train
    val f100 = df.select(Sampling.splitColumn($"id", 100, 0).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f100 === Map("train" -> 1000L))
  }

  test("deterministic per-group sample: exactly k per group, stable, within the group") {
    import graft.etl.Sampling
    val df = (1L to 300L).map(i => (i % 3, i)).toDF("g", "id")
    val s1 = Sampling.sampledPerGroup(df, "g", "id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = Sampling.sampledPerGroup(df, "g", "id", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 === s2)
    assert(s1.groupBy(_._1).forall { case (_, rows) => rows.size === 7 })
    assert(s1.forall { case (g, id) => id % 3 === g }) // sample stays in its group
  }

  test("S-1/P-6 row scan: arity guard drops short rows, parse drop applies, extra cells ignored") {
    val out = graft.etl.EtlQueries.rowScan(spark, "")
    val names = out.select("nome").as[String].collect().toSeq
    // Truncada (3 cells, P-6) and Quebrada (unparseable, P-7) are gone;
    // SP 500's trailing 7th cell doesn't disturb positional extraction
    assert(names === Seq("IBrX 50", "Ibovespa", "SP 500", "Shanghai"))
    val sp = out.where($"nome" === "SP 500").head
    assert(sp.getDouble(1) === 5432.10)
    assert(sp.getDouble(4) === 0.75)
  }
}
