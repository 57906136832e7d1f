package graft

import java.nio.file.{Files, Paths}

import graft.etl.SkewJoin
import graft.sources.Sinks
import graft.streaming.EventStreaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Source/sink surface: partitioned-write pruning, CSV/JSON round-trips
  * with explicit schemas, bucketed shuffle-free joins, salted skew joins,
  * and the file-based streaming source agreeing with its batch twin.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned write: filter on partition column prunes directories") {
    val out = tmp("part")
    val df = graft.model.Tables.customer(spark, sf001)
    Sinks.writePartitioned(df, out, "c_mktsegment")
    assert(Files.exists(Paths.get(s"$out/c_mktsegment=FURNITURE")))
    val read = spark.read.parquet(out).where($"c_mktsegment" === "FURNITURE")
    assert(read.count() === df.where($"c_mktsegment" === "FURNITURE").count())
    // partition filter must appear in the scan, not as a post-scan filter
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan)
  }

  test("Tables.events: nanos-long, TIMESTAMP_NTZ and TIMESTAMP encodings yield identical rows") {
    // The writer has used all three encodings across testdata generations
    // (r8 postmortem: the flip from nanos to µs NTZ broke 17 queries). The
    // adaptive reader must make the encoding unobservable. True
    // TIMESTAMP(NANOS) parquet can't be written from Spark; under the
    // legacy nanosAsLong conf it surfaces as LongType, which is exactly
    // what a BIGINT-nanos file presents to adaptEventTs — same branch.
    val src = graft.model.Tables.events(spark, sf001).orderBy("event_id")
    val ntzDir = tmp("ev-ntz")
    src.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    val ltzDir = tmp("ev-ltz")
    src.write.mode("overwrite").parquet(s"$ltzDir/events.parquet")
    val nanosDir = tmp("ev-nanos")
    src.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    val expected = src.collect().toSeq
    for (dir <- Seq(ntzDir, ltzDir, nanosDir)) {
      val got = graft.model.Tables.events(spark, dir).orderBy("event_id")
      assert(got.schema("ts").dataType === org.apache.spark.sql.types.TimestampType,
        s"$dir: ts must normalize to TIMESTAMP")
      assert(got.collect().toSeq === expected, s"$dir: rows diverge from source")
    }
    // and the shipped testdata is in contract — a regeneration that drifts
    // shows up here as a NAMED diff, not 17 opaque AnalysisExceptions
    assert(graft.model.SchemaContract.diff(spark, sf001) === Seq.empty)
  }

  test("csv and json round-trip with explicit schemas") {
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "name", "v")
    val schema = StructType.fromDDL("id BIGINT, name STRING, v DOUBLE")
    val cp = tmp("csv"); val jp = tmp("json")
    Sinks.writeCsv(df, cp); Sinks.writeJson(df, jp)
    assert(Sinks.readCsv(spark, cp, schema).orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
    assert(Sinks.readJson(spark, jp, schema).orderBy("id").collect().toSeq ===
      df.orderBy("id").collect().toSeq)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val c = graft.model.Tables.customer(spark, sf001)
      val o = graft.model.Tables.orders(spark, sf001)
      Sinks.writeBucketed(c, "c_bkt", "c_custkey", 4)
      Sinks.writeBucketed(o.withColumnRenamed("o_custkey", "c_custkey"), "o_bkt", "c_custkey", 4)
      val joined = spark.table("c_bkt").join(spark.table("o_bkt"), "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === c.join(o, c("c_custkey") === o("o_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("q_bucketed_join: join AND per-key aggregate both ride the bucket layout") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val df = Sinks.bucketedJoin(spark, sf001)
      val plan = df.queryExecution.executedPlan.toString
      // the ONLY allowed movement is the final top-10: no hash exchange
      // anywhere — the join reads bucket-aligned inputs and the grouping
      // (a superset of the bucket key) inherits the same clustering
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed plan shuffles:\n$plan")
      // semantics equal the plain shuffled join+agg
      val c = graft.model.Tables.customer(spark, sf001)
      val o = graft.model.Tables.orders(spark, sf001)
      val plain = c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(o("o_totalprice").cast("decimal(18,2)")).cast("double").as("total_spent"))
        .orderBy(desc("total_spent"), c("c_custkey"))
        .limit(10)
      assert(df.collect().toSeq === plain.collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("salted join returns exactly the unsalted join's result") {
    val large = graft.model.Tables.orders(spark, sf001)
    val small = graft.model.Tables.customer(spark, sf001).select("c_custkey", "c_name")
    val plain = large.join(small, large("o_custkey") === small("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = SkewJoin.saltedJoin(large, "o_custkey", small, "c_custkey", large("o_orderkey"))
      .select("o_orderkey", "c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("permissive csv: corrupt lines are captured, not fatal; drop is observable") {
    val dir = tmp("badcsv")
    Files.writeString(
      Paths.get(s"$dir/data.csv"),
      "id,name,v\n1,a,1.5\nnot-a-number,b\n3,c,2.5\n")
    val schema = StructType.fromDDL("id BIGINT, name STRING, v DOUBLE")
    // cache: Spark disallows queries touching ONLY _corrupt_record on a raw
    // file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — parse once, then filter
    val df = Sinks.readCsvPermissive(spark, dir, schema).cache()
    assert(df.count() === 3)
    assert(df.where($"_corrupt_record".isNotNull).count() === 1)
    val clean = df.where($"_corrupt_record".isNull).drop("_corrupt_record")
    assert(clean.orderBy("id").select("id").as[Long].collect().toSeq === Seq(1L, 3L))
  }

  test("writeSorted: files hold disjoint sorted ranges (row-group pruning layout)") {
    val out = tmp("sorted")
    Sinks.writeSorted(graft.model.Tables.orders(spark, sf001), out, "o_totalprice", 4)
    val perFile = spark.read.parquet(out)
      .select(input_file_name().as("f"), $"o_totalprice")
      .groupBy("f")
      .agg(min($"o_totalprice").as("lo"), max($"o_totalprice").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(perFile.size >= 2)
    perFile.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlapping file ranges: $perFile")
      case _ =>
    }
  }

  test("parquetEventStream starts on an EMPTY landing zone via the contract-schema fallback") {
    val landing = tmp("empty_landing"); val out = tmp("empty_out"); val cp = tmp("empty_cp")
    // the stream is DEFINED while the dir has no files — inference has
    // nothing to read, so the eventStreamDdl fallback must kick in
    val stream = EventStreaming.parquetEventStream(spark, landing).drop("props")
    // first file arrives only after the source exists (production order)
    Files.copy(Paths.get(s"$sf001/events.parquet"), Paths.get(s"$landing/events.parquet"))
    val q = EventStreaming.startParquetSink(stream, out, cp)
    q.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 1000)
  }

  test("foreachBatch parquet sink: streamed rows land in the parquet dir") {
    val landing = tmp("fb_landing"); val out = tmp("fb_out"); val cp = tmp("fb_cp")
    Files.copy(Paths.get(s"$sf001/events.parquet"), Paths.get(s"$landing/events.parquet"))
    val q = EventStreaming.startParquetSink(
      EventStreaming.parquetEventStream(spark, landing).drop("props"), out, cp)
    q.awaitTermination(60000)
    assert(spark.read.parquet(out).count() === 1000)
  }

  test("orc round-trip preserves data; filters push into the ORC scan") {
    val out = tmp("orc")
    val c = graft.model.Tables.customer(spark, sf001)
    Sinks.writeOrc(c, out)
    val back = Sinks.readOrc(spark, out)
    assert(back.orderBy("c_custkey").collect().toSeq === c.orderBy("c_custkey").collect().toSeq)
    val scan = back.where($"c_acctbal" > 5000)
    assert(scan.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(c_acctbal), GreaterThan(c_acctbal,5000"))
  }

  test("typed Aggregator centroid skips null and ragged vectors without bias") {
    import graft.vec.VectorAggregates
    val df = Seq(
      (1, Some(Seq(2.0, 4.0))),
      (1, Some(Seq(6.0, 8.0))),
      (1, None), // null row: skipped, not counted
      (1, Some(Seq(99.0)))) // ragged row: skipped, not counted
      .toDF("label", "emb")
    val c = df.groupBy("label")
      .agg(VectorAggregates.centroidAgg(2)($"emb").as("c"))
      .head.getSeq[Double](1)
    assert(c === Seq(4.0, 6.0)) // mean of the two well-formed vectors only
  }

  test("typed Aggregator centroid yields NULL (not empty vector) for all-null groups") {
    import graft.vec.VectorAggregates
    val df = Seq((1, Option.empty[Seq[Double]]), (1, Option.empty[Seq[Double]]))
      .toDF("label", "emb")
    val row = df.groupBy("label")
      .agg(VectorAggregates.centroidAgg(2)($"emb").as("c"))
      .head
    assert(row.isNullAt(1))
  }

  test("typed Aggregator centroid matches the posexplode form within float tolerance") {
    import graft.vec.VectorAggregates
    val emb = graft.model.Tables.embeddings(spark, sf001)
      .select($"label", $"embedding".cast("array<double>").as("emb"))
    val viaAgg = emb.groupBy("label")
      .agg(VectorAggregates.centroidAgg(64)($"emb").as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = graft.vec.VectorOps.allLabelCentroids(spark, sf001)
    assert(viaAgg.keySet === viaExplode.keySet)
    viaAgg.foreach { case (label, c) =>
      assert(c.length === 64)
      c.zip(viaExplode(label)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $label centroid mismatch: $a vs $b")
      }
    }
  }

  test("jdbc round-trip via embedded Derby: batch write, partitioned parallel read") {
    // in-memory Derby (ships with Spark) stands in for the reference's
    // Postgres; exercises the REAL jdbc source/sink path end-to-end
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val driver = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val df = (1L to 10L).map(i => (i, s"row_$i")).toDF("id", "nome")
    Sinks.writeJdbc(df, url, "t_graft", numPartitions = 2, props = driver)
    val back = Sinks.readJdbc(spark, url, "t_graft", "id", 1L, 10L, 4, props = driver)
    // the partitioning contract took effect: 4 range-split read tasks
    assert(back.rdd.getNumPartitions === 4)
    assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === (1L to 10L).map(i => (i, s"row_$i")))
    // append (not overwrite): a second batch accumulates like the fact table
    Sinks.writeJdbc(df.where($"id" <= 3), url, "t_graft", numPartitions = 1, props = driver)
    assert(Sinks.readJdbc(spark, url, "t_graft", "id", 1L, 10L, 2, props = driver).count() === 13)
  }

  test("jdbc wrappers validate the partitioning contract") {
    intercept[IllegalArgumentException] {
      Sinks.readJdbc(spark, "jdbc:derby:memory:x", "t", "id", 10L, 1L, 4)
    }
    intercept[IllegalArgumentException] {
      Sinks.readJdbc(spark, "jdbc:derby:memory:x", "t", "id", 1L, 10L, 0)
    }
    intercept[IllegalArgumentException] {
      Sinks.writeJdbc(Seq((1, "a")).toDF("id", "v"), "jdbc:derby:memory:x", "t", numPartitions = 0)
    }
  }

  test("compact: many small files become nFiles, content byte-identical") {
    val out = tmp("compact")
    val c = graft.model.Tables.customer(spark, sf001)
    c.repartition(20).write.mode("overwrite").parquet(out)
    val before = c.orderBy("c_custkey").collect().toSeq
    assert(new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet")) === 20)
    Sinks.compact(spark, out, 2)
    assert(new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet")) === 2)
    assert(spark.read.parquet(out).orderBy("c_custkey").collect().toSeq === before)
  }

  test("mergeSchema read unions evolved parquet schemas") {
    val dir = tmp("evolve")
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "name", "score", "p"))
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows === Seq(1L -> None, 2L -> Some(9.5))) // old files null-fill new columns
  }

  test("DocGen stream under Trigger.AvailableNow drains the WHOLE corpus, not one batch") {
    // round-12 ADVICE fix: latestOffset used to treat ReadAllAvailable as
    // a single batch-size step, so a run-once trigger silently stopped at
    // 5000 of 20000 rows. ReadAllAvailable must jump to hi.
    val sink = s"docgen_avail_${System.nanoTime()}"
    val q = spark.readStream.format("graft.sources.DocGenSource")
      .option("numDocs", "20000")
      .option("numPartitions", "2")
      .option("streamBatchSize", "5000")
      .load()
      .groupBy($"shard").count()
      .writeStream.outputMode("complete").format("memory").queryName(sink)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val total = spark.table(sink).agg(sum($"count")).collect().head.getLong(0)
    assert(total === 20000L, s"AvailableNow drained only $total of 20000 rows")
  }

  test("file-based event stream produces the same hourly windows as batch") {
    val streamDir = tmp("evstream")
    Files.copy(
      Paths.get(s"$sf001/events.parquet"),
      Paths.get(s"$streamDir/events.parquet"))
    val streamed = EventStreaming.windowedCounts(
      EventStreaming.parquetEventStream(spark, streamDir).drop("props"))
    val q = streamed.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("file_wc")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = spark.table("file_wc")
      .groupBy("hour_start").agg(sum($"n_events").as("n"))
      .orderBy("hour_start")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    val expected = graft.queries.EventQueries.hourlyWindows(spark, sf001)
      .select($"hour_start", $"n_events")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    assert(got === expected)
  }
}
