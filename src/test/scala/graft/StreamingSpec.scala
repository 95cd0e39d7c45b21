package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}
import graft.search.VectorStore
import graft.sources.Tables
import graft.streaming.Streaming

class StreamingSpec extends SparkSpec {

  test("streaming tumbling agg over a file stream equals the batch computation") {
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.tumblingAgg(stream, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2),
        math.round(r.getDouble(3) * 100))
    val got = spark.table("stream_out").collect().map(key).toSet
    val want = Streaming.tumblingAgg(events, "1 hour", "10 minutes")
      .collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("windowedQuantiles: streaming sketch percentiles equal the batch computation") {
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_q_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)

    val qs = Seq("0.5", "0.9", "0.99")
    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedQuantiles(stream, "value", "6 hours",
        "10 minutes", qs, cap = 8192)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_quant").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getSeq[Double](1).map(v => math.round(v * 1e6)))
    val got = spark.table("stream_quant").collect().map(key).toSet
    val want = Streaming.windowedQuantiles(events, "value", "6 hours",
        "10 minutes", qs, cap = 8192)
      .collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // sanity: quantile arrays are sorted ascending (p50 ≤ p90 ≤ p99)
    spark.table("stream_quant").collect().foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 3 && v(0) <= v(1) && v(1) <= v(2))
    }
  }

  test("windowedTopTerms: streaming sketch top terms equal the batch computation") {
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_tt_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedTopTerms(stream, "event_type", "12 hours",
        "10 minutes", n = 2, k = 64)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_tt").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getString(0), s.getLong(1))).toList)
    val got = spark.table("stream_tt").collect().map(key).toSet
    val want = Streaming.windowedTopTerms(events, "event_type", "12 hours",
        "10 minutes", n = 2, k = 64)
      .collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("windowedKsDrift: streaming per-window KS equals batch ksDrift on binned values; drifted window rejects") {
    import spark.implicits._
    val events = Tables.load(spark, sf0001, "events")
      .withColumn("v", col("value").cast("long"))
    val tmp = Files.createTempDirectory("graft_stream_ks_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)
    val bins = Seq(10L, 30L, 70L, 120L)
    // reference = the corpus itself → windows drawn from it should KEEP
    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedKsDrift(stream, "v", "24 hours",
        "10 minutes", events, bins)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_ks").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_ks").collect()
      .map(r => r.getTimestamp(0).getTime ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getInt(5))).toMap
    assert(got.nonEmpty)
    // per window, the streamed statistic must equal batch ksDrift over
    // the SAME binned values (bin index as the metric)
    def binCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      bins.zipWithIndex.foldRight(lit(bins.size.toLong): org.apache.spark.sql.Column) {
        case ((up, i), acc) => when(c <= up, i.toLong).otherwise(acc)
      }
    got.foreach { case (winMs, (nA, nB, ks, stat, rej)) =>
      val lo = new java.sql.Timestamp(winMs)
      val hi = new java.sql.Timestamp(winMs + 24L * 3600 * 1000)
      val winRows = events.filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
        .select(binCol(col("v")).as("bv"))
      val ref = events.select(binCol(col("v")).as("bv"))
      val want = graft.operators.Mining.ksDrift(winRows, ref, "bv").head
      assert((want.getLong(0), want.getLong(1), want.getDouble(2),
        want.getDouble(3), want.getInt(4)) == ((nA, nB, ks, stat, rej)),
        s"window $lo: stream ($nA,$nB,$ks,$stat,$rej) vs batch $want")
    }
    // a shifted reference (everything beyond the last bin) must reject
    val refFar = events.select((col("v") + 1000L).as("v"))
    val q2 = Streaming.windowedKsDrift(
        spark.readStream.schema(events.schema).parquet(tmp), "v",
        "24 hours", "10 minutes", refFar, bins)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_ks2").start()
    q2.processAllAvailable()
    q2.stop()
    val far = spark.table("stream_ks2").collect()
    assert(far.nonEmpty && far.forall(_.getInt(5) == 1),
      far.map(_.toString).toSeq.toString)
  }

  test("windowedPsiDrift: streaming per-window PSI equals batch psiDrift; shifted reference flags every window") {
    import spark.implicits._
    val events = Tables.load(spark, sf0001, "events")
      .withColumn("v", col("value").cast("long"))
    val tmp = Files.createTempDirectory("graft_stream_psi_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)
    val bins = Seq(10L, 30L, 70L, 120L)
    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedPsiDrift(stream, "v", "24 hours",
        "10 minutes", events, bins)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_psi").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_psi").collect()
      .map(r => r.getTimestamp(0).getTime ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    assert(got.nonEmpty)
    got.foreach { case (winMs, (nA, nB, psi, band)) =>
      val lo = new java.sql.Timestamp(winMs)
      val hi = new java.sql.Timestamp(winMs + 24L * 3600 * 1000)
      val winRows = events
        .filter(col("ts") >= lit(lo) && col("ts") < lit(hi)).select("v")
      val want = graft.operators.Mining.psiDrift(winRows, events.select("v"),
        "v", bins).head
      assert((want.getLong(0), want.getLong(1), want.getDouble(2),
        want.getString(3)) == ((nA, nB, psi, band)),
        s"window $lo: stream ($nA,$nB,$psi,$band) vs batch $want")
    }
    // a reference shifted past every bin boundary flags each window
    val refFar = events.select((col("v") + 1000L).as("v"))
    val q2 = Streaming.windowedPsiDrift(
        spark.readStream.schema(events.schema).parquet(tmp), "v",
        "24 hours", "10 minutes", refFar, bins)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_psi2").start()
    q2.processAllAvailable()
    q2.stop()
    val far = spark.table("stream_psi2").collect()
    assert(far.nonEmpty && far.forall(_.getString(4) == "shifted"),
      far.map(_.toString).toSeq.toString)
  }

  test("windowedCountMin: streaming bucket table equals batch; state is d*w-bounded") {
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_cms_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedCountMin(stream, "event_type", "24 hours",
        "10 minutes", d = 3, w = 8)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_cms").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2), r.getLong(3))
    val got = spark.table("stream_cms").collect().map(key).toSet
    val want = Streaming.windowedCountMin(events, "event_type", "24 hours",
        "10 minutes", d = 3, w = 8).collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // bucket table per window bounded by d*w however many terms arrive
    val perWindow = got.groupBy(_._1).map(_._2.size)
    assert(perWindow.forall(_ <= 24), s"bucket table exceeded d*w: $perWindow")
  }

  test("windowedDistinct: streaming KMV counts equal batch AND the true distinct count") {
    import spark.implicits._
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_kmv_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedDistinct(stream, "user_id", "24 hours",
        "10 minutes", k = 4096)
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_kmv").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getLong(1), r.getBoolean(2))
    val got = spark.table("stream_kmv").collect().map(key).toSet
    val want = Streaming.windowedDistinct(events, "user_id", "24 hours",
        "10 minutes", k = 4096).collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._3), "fixture windows are below capacity")
    // below capacity the sketch is exact: match the true per-window counts
    val truth = events
      .groupBy(window($"ts", "24 hours").as("w"))
      .agg(countDistinct($"user_id").as("n"))
      .select($"w.start", $"n").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    got.foreach { case (w, n, _) => assert(truth(w) == n, s"window $w") }
  }

  test("windowedDigest: streaming digests equal batch AND Layout.contentDigest") {
    import spark.implicits._
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_dig_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedDigest(stream, "props", "24 hours", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_dig").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2), r.getLong(3))
    val got = spark.table("stream_dig").collect().map(key).toSet
    val want = Streaming.windowedDigest(events, "props", "24 hours",
      "10 minutes").collect().map(key).toSet
    assert(got == want, "replay/batch must produce identical digest rows")
    assert(got.nonEmpty)
    // and the per-window digests agree with the landed-table digest the
    // integrity check would compare against
    val landed = graft.sources.Layout.contentDigest(
        events.withColumn("w", window($"ts", "24 hours")("start")),
        $"w", $"props")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(landed == got, "stream digest must match the landed table's")
  }

  test("windowedValidation: streaming check rows equal batch replay") {
    import spark.implicits._
    import graft.operators.Validation._
    val events = Tables.load(spark, sf0001, "events")
    val tmp = Files.createTempDirectory("graft_stream_val_").toString
    events.repartition(4).write.mode("overwrite").parquet(tmp)
    val checks = Seq(notNull("props"), inRange("value", 0, 50),
      isIn("event_type", Seq("click", "view")))

    val stream = spark.readStream.schema(events.schema).parquet(tmp)
    val q = Streaming.windowedValidation(stream, checks, "24 hours",
        "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_val").start()
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).getTime, r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4))
    val got = spark.table("stream_val").collect().map(key).toSet
    val want = Streaming.windowedValidation(events, checks, "24 hours",
      "10 minutes").collect().map(key).toSet
    assert(got == want && got.nonEmpty)
    // the fixture's value range and event types make some checks fail —
    // the suite must actually discriminate, not report all-pass
    assert(got.exists(!_._5) && got.exists(_._5), s"degenerate fixture: $got")
  }

  test("joinWithin: stream-stream interval join equals the batch join") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(10800000L + min * 60000L)
    val clickRows = Seq((1L, ts(0), "c1"), (1L, ts(8), "c2"), (2L, ts(5), "c3"),
      (1L, ts(30), "c4"))
    val errorRows = Seq((1L, ts(10), "e1"), (2L, ts(6), "e2"), (3L, ts(7), "e3"))
    val clicks = clickRows.toDF("user_id", "cts", "click_id")
    val errors = errorRows.toDF("user_id", "ets", "error_id")

    val ctmp = Files.createTempDirectory("graft_ssc_").toString
    val etmp = Files.createTempDirectory("graft_sse_").toString
    clicks.write.mode("overwrite").parquet(ctmp)
    errors.write.mode("overwrite").parquet(etmp)

    val q = Streaming.joinWithin(
      spark.readStream.schema(errors.schema).parquet(etmp),
      spark.readStream.schema(clicks.schema).parquet(ctmp),
      "user_id", "ets", "cts", "10 MINUTES", "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssjoin_out")
      .select("error_id", "click_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // batch truth: e1(10) pairs c1(0) and c2(8); e2(6) pairs c3(5); e3 none
    assert(got == Set(("e1", "c1"), ("e1", "c2"), ("e2", "c3")))
  }

  test("joinWithinOuter: unmatched lefts emit null-padded AFTER the watermark closes their window") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(10800000L + min * 60000L)
    val ltmp = Files.createTempDirectory("graft_ssol_").toString
    val rtmp = Files.createTempDirectory("graft_ssor_").toString
    // left: e1 will match, e2 will not; right: one in-range click for e1.
    // e2 sits at ts(9) — ABOVE the initial global watermark (min of the
    // two sides = right's ts(8) − 1 min), so its outer window is still
    // open after the first drain
    Seq((1L, ts(10), "e1"), (2L, ts(9), "e2"))
      .toDF("user_id", "ets", "error_id")
      .coalesce(1).write.mode("overwrite").parquet(ltmp)
    Seq((1L, ts(8), "c1")).toDF("user_id", "cts", "click_id")
      .coalesce(1).write.mode("overwrite").parquet(rtmp)
    val lSchema = spark.read.parquet(ltmp).schema
    val rSchema = spark.read.parquet(rtmp).schema
    val q = Streaming.joinWithinOuter(
      spark.readStream.schema(lSchema).option("maxFilesPerTrigger", 1)
        .parquet(ltmp),
      spark.readStream.schema(rSchema).option("maxFilesPerTrigger", 1)
        .parquet(rtmp),
      "user_id", "ets", "cts", "10 MINUTES", "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssouter_out").start()
    q.processAllAvailable()
    def got() = spark.table("ssouter_out")
      .select("error_id", "click_id").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    // watermark has not advanced past e2's horizon yet: only the inner
    // match may have emitted
    assert(!got().contains(("e2", None)),
      "unmatched left must NOT emit before its window closes")
    // advance event time far past e2(6) + 10min + 1min delay on BOTH
    // sides (the join watermark is the min of the two input watermarks)
    Seq((9L, ts(120), "e_adv")).toDF("user_id", "ets", "error_id")
      .coalesce(1).write.mode("append").parquet(ltmp)
    Seq((9L, ts(120), "c_adv")).toDF("user_id", "cts", "click_id")
      .coalesce(1).write.mode("append").parquet(rtmp)
    q.processAllAvailable()
    q.stop()
    val res = got()
    assert(res.contains(("e1", Some("c1"))), s"inner match missing: $res")
    assert(res.contains(("e2", None)),
      s"unmatched left must emit null-padded after the watermark: $res")
  }

  test("dedupStream drops repeated keys across micro-batches (bounded state)") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(7200000L + min * 60000L)
    val tmp = Files.createTempDirectory("graft_dedup_").toString
    val batch1 = Seq((1L, ts(0)), (2L, ts(1)), (1L, ts(2))).toDF("id", "ts")
    batch1.write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(batch1.schema).parquet(tmp)
    val q = Streaming.dedupStream(stream, Seq("id"), "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    // same ids again within the watermark window → all dropped; one new id
    Seq((1L, ts(3)), (2L, ts(4)), (7L, ts(5))).toDF("id", "ts")
      .write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 7L))
  }

  test("searchStream serves a query stream against the static corpus; matches batch search") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val tmp = Files.createTempDirectory("graft_serve_").toString
    queries.filter($"qid" < 2).write.mode("overwrite").parquet(tmp)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val stream = spark.readStream.schema(queries.schema).parquet(tmp)
    val q = Streaming.searchStream(stream, corpus, "vec_id", "embedding",
      "qid", "qe", k = 5,
      (hits, _) => collected.synchronized {
        collected ++= hits.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      })
    q.processAllAvailable()
    // late-arriving query in a second batch
    queries.filter($"qid" === 2).write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    // batch twin: same scoring + same per-query top-k
    val expected = corpus.crossJoin(broadcast(queries))
      .select($"qid", $"vec_id",
        (round(graft.functions.VectorFunctions.cosine($"embedding", $"qe"), 6)
          + lit(0.0)).as("c"))
    val exp = graft.operators.TopK
      .topKPerKeyAgg(expected, Seq($"qid"), $"c", $"vec_id", 5)
      .select($"qid", $"id", $"score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(collected.toSet == exp)
    assert(collected.map(_._1).distinct.sorted == Seq(0L, 1L, 2L))
    // each query's top hit is itself (score 1.0 on normalized self-match)
    val self = collected.groupBy(_._1).map { case (q2, hs) => q2 -> hs.maxBy(_._3) }
    self.foreach { case (q2, (_, id, _)) => assert(id == q2) }
  }

  test("curateStream gates, dedups and samples a document stream") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(7200000L + min * 60000L)
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val wordsB = (1 to 40).map(i => s"v$i").mkString(" ")
    val tmp = Files.createTempDirectory("graft_curate_").toString
    val batch1 = Seq(
      (1L, "srcA", words, ts(0)),       // kept
      (2L, "srcA", "too short", ts(1)), // quality gate
      (3L, "srcB", wordsB, ts(2))       // kept
    ).toDF("doc_id", "source", "text", "ts")
    batch1.write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(batch1.schema).parquet(tmp)
    val q = Streaming.curateStream(stream, "doc_id", "text", "source",
        "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    q.processAllAvailable()
    // duplicate of doc 1 within the watermark → dropped; new doc kept
    Seq((4L, "srcA", words, ts(3)),
        (5L, "srcB", (1 to 40).map(i => s"u$i").mkString(" "), ts(4)))
      .toDF("doc_id", "source", "text", "ts")
      .write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("curate_out").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L, 5L))
  }

  test("sessionizeStream emits closed sessions via custom state + event-time timeout") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val tmp = Files.createTempDirectory("graft_sess_").toString
    // user 1: events at 0,5,10 (one session), then 60,62 (second session)
    // user 2: single event at 3
    val batch1 = Seq((1L, ts(0)), (1L, ts(5)), (2L, ts(3)), (1L, ts(10)))
      .toDF("user_id", "ts")
    batch1.write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(batch1.schema).parquet(tmp)
    val q = Streaming.sessionizeStream(stream, gapMinutes = 30, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    // far-future events advance the watermark past 10 + 30min → both open
    // sessions time out; user 1 opens a new session at minute 60
    Seq((1L, ts(60)), (1L, ts(62))).toDF("user_id", "ts")
      .write.mode("append").parquet(tmp)
    q.processAllAvailable()
    // one more advance so the minute-60 session can close too
    Seq((3L, ts(600))).toDF("user_id", "ts")
      .write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .select($"user_id", $"n_events",
        ($"session_end".cast("long") - $"session_start".cast("long")).as("dur_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1L, 3L, 600L)), s"user 1 first session (3 events, 10 min): $got")
    assert(got.contains((2L, 1L, 0L)), s"user 2 singleton session: $got")
    assert(got.contains((1L, 2L, 120L)), s"user 1 second session (2 events, 2 min): $got")
  }

  test("sessionizeStream merges a late-but-within-gap event from a LATER micro-batch") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val tmp = Files.createTempDirectory("graft_sess_ooo_").toString
    // minute 62 arrives in batch 1; minute 60 (EARLIER event time) only in
    // batch 2 — cross-batch disorder that a trigger racing two file
    // commits produces. Both are one session: start must extend BACKWARDS.
    // The 10-minute watermark delay keeps the minute-60 row above the
    // late-data filter (watermark 52 after batch 1), which is exactly the
    // window where the state function must handle disorder itself.
    Seq((1L, ts(62))).toDF("user_id", "ts").write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP").parquet(tmp)
    val q = Streaming.sessionizeStream(stream, gapMinutes = 30, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_ooo_out").start()
    q.processAllAvailable()
    Seq((1L, ts(60))).toDF("user_id", "ts").write.mode("append").parquet(tmp)
    q.processAllAvailable()
    // far-future watermark advance times the merged session out
    Seq((9L, ts(600))).toDF("user_id", "ts").write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_ooo_out")
      .select($"user_id", $"n_events",
        ($"session_end".cast("long") - $"session_start".cast("long")).as("dur_s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((1L, 2L, 120L)),
      s"late event must extend the open session's start backwards: $got")
  }

  test("streamInsertIndexed lands vectors in IVF cell partitions, pruned on read") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_idxin_").toString
    val table = Files.createTempDirectory("graft_idxtbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_idxckpt_").toString + "/c"
    // two orthogonal centroids: vectors along e1 → cell 0, along e2 → cell 1
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val schema = Seq(("x", Seq(1f, 1f, 1f, 1f))).toDF("id", "embedding").schema
    Seq(("a", Seq(9f, 1f, 0f, 0f)), ("b", Seq(0f, 9f, 1f, 0f)))
      .toDF("id", "embedding").write.mode("overwrite").parquet(in)
    val q = Streaming.streamInsertIndexed(
      spark.readStream.schema(schema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt)
    q.processAllAvailable()
    Seq(("c", Seq(8f, 0f, 2f, 0f))).toDF("id", "embedding")
      .write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()

    val t = spark.read.parquet(table)
    // NB: the partition directory column round-trips as INT (partition
    // type inference) — cast for a stable comparison
    val byCell = t.groupBy(col("cell_id").cast("long").as("cell_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byCell == Map(0L -> 2L, 1L -> 1L), byCell)
    // the on-disk table IS the index: a cell probe prunes to its directory
    val probe = t.filter(col("cell_id").cast("long") === 0L)
    assert(probe.collect().map(_.getString(0)).toSet == Set("a", "c"))
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cell_id"), scan)
    // vectors arrive normalized (the prepare projection ran in-stream)
    val norms = t.select(V.norm2(col("embedding"))).collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5, n))
  }

  test("streamInsertDurable survives a restart with no loss and no duplicates") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_durin_").toString
    val table = Files.createTempDirectory("graft_durtbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_durckpt_").toString + "/c"

    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(in)

    val batch1 = (0 until 20).map(i => (i.toString, Seq.fill(8)(i / 10.0f + 0.1f)))
      .toDF("id", "embedding")
    batch1.write.mode("overwrite").parquet(in)

    // first run: ingest batch1, then STOP (simulating a crash/redeploy)
    val q1 = Streaming.streamInsertDurable(mkStream(), 8, 4, table, ckpt)
    q1.processAllAvailable()
    q1.stop()

    // more data lands while the writer is down
    (100 until 110).map(i => (i.toString, Seq.fill(8)(0.5f)))
      .toDF("id", "embedding").write.mode("append").parquet(in)

    // restart from the SAME checkpoint: must pick up only the new files
    val q2 = Streaming.streamInsertDurable(mkStream(), 8, 4, table, ckpt)
    q2.processAllAvailable()
    q2.stop()

    val store = VectorStore.openDurable(spark, table, 8, 4)
    assert(store.count() == 30, "restart must neither lose nor duplicate rows")
    assert(store.vectors.select("id").distinct().count() == 30)
    // rows went through the shared prepare projection: unit norms + shards
    val norms = store.vectors
      .select(sqrt(graft.functions.VectorFunctions.norm2(col("embedding"))).as("n"))
      .agg(min("n"), max("n")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
    assert(store.health().count() == 4)
    // and search works against the reopened table
    assert(store.search(Seq.fill(8)(0.5f), 3).count() == 3)
  }

  test("streamInsert routes micro-batches through VectorStore.insert") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_vecstream_").toString
    val batch1 = (0 until 20).map(i => (i.toString, Seq.fill(8)(i / 10.0f + 0.1f)))
      .toDF("id", "embedding")
    batch1.write.mode("overwrite").parquet(tmp)

    var last: Option[VectorStore] = None
    val stream = spark.readStream.schema(batch1.schema).parquet(tmp)
    val q = Streaming.streamInsert(stream, VectorStore.create(spark, 8))(s => last = Some(s))
    q.processAllAvailable()
    // second micro-batch arrives as new files
    val batch2 = (100 until 110).map(i => (i.toString, Seq.fill(8)(0.5f)))
      .toDF("id", "embedding")
    batch2.write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    assert(last.isDefined)
    assert(last.get.count() == 30)
    // stored vectors are normalized by the shared insert path
    val norms = last.get.vectors
      .select(sqrt(graft.functions.VectorFunctions.norm2(col("embedding"))).as("n"))
      .agg(min("n"), max("n")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
  }

  test("streamNearDupIngest drops near-dups of the persisted store across micro-batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_nd_in_").toString
    val store = Files.createTempDirectory("graft_nd_store_").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_nd_ckpt_").toString + "/c"

    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)

    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    def run(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      q.processAllAvailable(); q.stop()
    }
    def start() = Streaming.streamNearDupIngest(mkStream(), "doc_id", "text",
      store, ckpt, 0.5) { (batch, _) =>
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    // batch 1: two distinct docs + a within-batch near-dup of the first
    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "completely different content about spark shuffle plans"),
        (3L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(in)
    run(start())
    assert(survived.sorted == Seq(1L, 2L), s"batch1 survivors: $survived")

    // batch 2 (after a stop/restart): a near-dup of doc 1 and a fresh doc
    Seq((10L, "the quick brown fox jumps over the lazy dog tonight again"),
        (11L, "entirely novel text mentioning window aggregation tricks today"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    run(start())
    assert(survived.sorted == Seq(1L, 2L, 11L),
      s"cross-batch near-dup must drop vs the STORE (no text re-read): $survived")

    // the store holds exactly the survivors' signatures
    val stored = spark.read.parquet(s"$store/*").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored == Set(1L, 2L, 11L), s"store: $stored")
  }

  test("streamParagraphIngest rewrites batches against the fingerprint store") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_pp_in_").toString
    val store = Files.createTempDirectory("graft_pp_store_").toString + "/fps"
    val ckpt = Files.createTempDirectory("graft_pp_ckpt_").toString + "/c"

    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)

    val out = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    def run(): Unit = {
      val q = Streaming.streamParagraphIngest(mkStream(), "doc_id", "text",
        store, ckpt, paraTokens = 2) { (batch, _) =>
        out ++= batch.select("doc_id", "n_paras", "n_kept", "text_dedup")
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      }
      q.processAllAvailable(); q.stop()
    }

    // batch 1: [a b][c d] plus an in-batch repeat of [a b]
    Seq((1L, "a b c d"), (2L, "a b e f"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(in)
    run()
    assert(out(1L) == ((2L, 2L, "a b c d")), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 1L, "e f")), "in-batch repeat of [a b] drops")

    // batch 2 (after restart): [c d] and [e f] are store-known; [g h] fresh
    Seq((10L, "c d g h e f")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(in)
    run()
    assert(out(10L) == ((3L, 1L, "g h")),
      s"store-known paragraphs must drop without re-reading corpus text: ${out(10L)}")

    // the store holds exactly the surviving paragraphs' fingerprints
    val nFps = spark.read.parquet(s"$store/*").distinct().count()
    assert(nFps == 4, s"[a b][c d][e f][g h] expected, got $nFps")
  }

  test("streamNearDupIngest replay after a MID-BATCH crash loses/duplicates no signatures") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ndc_in_").toString
    val store = Files.createTempDirectory("graft_ndc_store_").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_ndc_ckpt_").toString + "/c"

    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)

    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    // onBatch runs AFTER the signature append and BEFORE the offset
    // commit, so a throw here dies exactly in the window the replay
    // contract must cover: signatures written, batch not committed
    def start() = Streaming.streamNearDupIngest(mkStream(), "doc_id", "text",
      store, ckpt, 0.5) { (batch, _) =>
      if (crashOnce.getAndSet(false)) sys.error("injected mid-batch crash")
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "completely different content about spark shuffle plans"),
        (3L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(in)

    // attempt 1: dies mid-batch
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    // the crash window is real: the dead attempt DID append signatures
    val orphan = spark.read.parquet(s"$store/batch_0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(orphan == Set(1L, 2L), s"pre-commit append must exist: $orphan")
    assert(survived.isEmpty, "crashed batch must not have been delivered")

    // attempt 2, same checkpoint: batch 0 replays — the batch-addressed
    // overwrite must swallow the orphan instead of double-appending,
    // and must not near-dup the batch against its own dead attempt
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(survived.sorted == Seq(1L, 2L), s"replay survivors: $survived")

    // follow-on batch still dedups correctly against the healed store
    Seq((10L, "the quick brown fox jumps over the lazy dog tonight again"),
        (11L, "entirely novel text mentioning window aggregation tricks today"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    val q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert(survived.sorted == Seq(1L, 2L, 11L), s"after batch 2: $survived")

    // exactly one signature row per surviving doc — count, not set,
    // so a double-append cannot hide
    val rows = spark.read.parquet(s"$store/*").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows.sorted == Seq(1L, 2L, 11L), s"store rows: $rows")
  }

  test("streamUrlDedupIngest: canonical-URL dedup vs store and batch, crash-replay safe") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_url_in_").toString
    val store = Files.createTempDirectory("graft_url_store_").toString + "/urls"
    val ckpt = Files.createTempDirectory("graft_url_ckpt_").toString + "/c"

    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("url",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)

    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = Streaming.streamUrlDedupIngest(mkStream(), "doc_id", "url",
      store, ckpt) { (batch, _) =>
      if (crashOnce.getAndSet(false)) sys.error("injected mid-batch crash")
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    // batch 1: 1 and 2 are the SAME canonical URL in different mess
    // (tracking param + fragment vs default port) → min id 1 wins; 3 fresh
    Seq((1L, "https://x.com/a?utm_source=s#frag"),
        (2L, "HTTPS://X.com:443/a"),
        (3L, "https://y.com/b"))
      .toDF("doc_id", "url").coalesce(1).write.mode("overwrite").parquet(in)

    // attempt 1 dies mid-batch AFTER the store append
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(survived.isEmpty, "crashed batch must not have been delivered")

    // attempt 2 replays into the same batch partition: no double-append,
    // no self-dedup of the retry
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(survived.sorted == Seq(1L, 3L), s"batch-1 survivors: $survived")

    // batch 2: another variant of x.com/a is store-known → drops;
    // y.com/b trailing-slash variant store-known → drops; z fresh (its
    // identical re-emitted copy must survive ONCE, not twice); junk URL
    // bypasses dedup and passes through
    Seq((10L, "https://x.com/a"),
        (11L, "https://y.com/b/"),
        (12L, "https://z.com/c"),
        (12L, "https://z.com/c"),
        (13L, "not a url"))
      .toDF("doc_id", "url").coalesce(1).write.mode("append").parquet(in)
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    assert(survived.sorted == Seq(1L, 3L, 12L, 13L), s"after batch 2: $survived")

    // one fingerprint per distinct canonical URL, counted not set-ified
    // (and the junk URL stores nothing)
    val fps = spark.read.parquet(s"$store/*").collect().map(_.getString(0)).toSeq
    assert(fps.size == 3 && fps.distinct.size == 3, s"store fps: $fps")
  }

  test("streamEwmaAnomalies carries exact state across micro-batches (batch twin)") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    // key 7: alternating 10/12 builds deviation, then a 500 spike — the
    // spike arrives in the SECOND micro-batch, so the flag depends on
    // state (sq, dq, rn) surviving the batch boundary exactly.
    val rows1 = Seq(10.0, 12.0, 10.0, 12.0).zipWithIndex
      .map { case (v, i) => (7L, i.toLong, ts(i), v) }
    val rows2 = Seq((7L, 4L, ts(4), 10.0), (7L, 5L, ts(5), 500.0))
    val tmp = Files.createTempDirectory("graft_ewma_").toString
    val b1 = rows1.toDF("user_id", "event_id", "ts", "value")
    b1.write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(b1.schema).parquet(tmp)
    val q = Streaming.streamEwmaAnomalies(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_out").start()
    q.processAllAvailable()
    rows2.toDF("user_id", "event_id", "ts", "value")
      .write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ewma_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    val want = graft.operators.Ewma.anomalies(
        (rows1 ++ rows2).toDF("user_id", "event_id", "ts", "value"),
        "user_id", "event_id", "ts", "value")
      .collect().map(a => (a.user_id, a.event_id, a.rn, a.xq,
        a.prev_sq, a.prev_dq, a.rq)).toSet
    assert(want.nonEmpty, "batch twin found no anomaly — fixture broken")
    assert(got == want, s"stream $got vs batch $want")
  }

  test("streamTokenBudget admits across batches until the stratum budget is spent") {
    import spark.implicits._
    // stratum "a": budget 50, docs of 20 tokens each → admits 3 (60
    // tokens, 1-doc overshoot), spread over two micro-batches
    val b1 = Seq((0L, "a", 20L), (1L, "a", 20L), (10L, "z", 5L))
    val b2 = Seq((2L, "a", 20L), (3L, "a", 20L), (11L, "z", 5L))
    val tmp = Files.createTempDirectory("graft_budget_").toString
    val df1 = b1.toDF("id", "stratum", "n_tokens")
    df1.write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream.schema(df1.schema).parquet(tmp)
    val q = Streaming.streamTokenBudget(stream, Map("a" -> 50L), 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("budget_out").start()
    q.processAllAvailable()
    b2.toDF("id", "stratum", "n_tokens").write.mode("append").parquet(tmp)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("budget_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // batch 1 admits both "a" docs (spent 40); batch 2 admits exactly
    // one more — the hash-smaller of ids 2/3 (spent 40 < 50 at its turn,
    // then 60 ≥ 50 blocks the other). "z" admits everything.
    val hashOrder = Seq(2L, 3L).sortBy(i => (graft.expressions.Md5Kernel
      .hash60(i.toString.getBytes("UTF-8")), i))
    val expectA = Set(0L, 1L, hashOrder.head)
    assert(got.filter(_._2 == "a").map(_._1) == expectA, got.toString)
    assert(got.filter(_._2 == "z").map(_._1) == Set(10L, 11L), got.toString)
  }

  test("streamFrameSigIngest: frame-signature near-dup vs store and batch, crash-replay safe") {
    import spark.implicits._
    import graft.operators.Multimodal.{Ppm, Video}
    val in = Files.createTempDirectory("graft_vid_in_").toString
    val store = Files.createTempDirectory("graft_vid_store_").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_vid_ckpt_").toString + "/c"

    // constant-value 2x2 frames: distinct value => distinct signature
    def fr(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    def vid(vs: Int*) = Video.encode(vs.map(fr))

    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)

    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = Streaming.streamFrameSigIngest(mkStream(), "doc_id", "bin",
      store, ckpt, every = 2, minShared = 2) { (batch, _) =>
      if (crashOnce.getAndSet(false)) sys.error("injected mid-batch crash")
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    // batch 1 (sampled frames = indices 0 and 2):
    //   1: [A B C] samples (A, C); 2: [A X C] samples the SAME (A, C)
    //   -> greedy drop-larger-id kills 2; 3: [D E F] fresh
    Seq((1L, vid(10, 20, 30)), (2L, vid(10, 99, 30)), (3L, vid(40, 50, 60)))
      .toDF("doc_id", "bin").coalesce(1).write.mode("overwrite").parquet(in)

    // attempt 1 dies mid-batch AFTER the store append
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(survived.isEmpty, "crashed batch must not have been delivered")

    // attempt 2 replays into the same batch partition: no double-append,
    // no self-dedup of the retry
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(survived.sorted == Seq(1L, 3L), s"batch-1 survivors: $survived")

    // batch 2: 4 re-samples (A, C) -> store-known, drops; 5 shares only
    // one sampled frame (D at index 0) -> below minShared, survives;
    // 6 fresh
    survived.clear()
    Seq((4L, vid(10, 77, 30)), (5L, vid(40, 88)), (6L, vid(70, 80, 90)))
      .toDF("doc_id", "bin").coalesce(1).write.mode("append").parquet(in)
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    assert(survived.sorted == Seq(5L, 6L), s"batch-2 survivors: $survived")

    // the store holds exactly the survivors' signatures (1, 3, 5, 6:
    // 2 + 2 + 1 + 2 sampled frames), never a dropped video's
    assert(spark.read.parquet(s"$store/*").count() == 7)
  }

  test("streamFrameSigIngest: per-store-video threshold (no pooling) and greedy chains over dropped seeds") {
    import spark.implicits._
    import graft.operators.Multimodal.{Ppm, Video}
    val in = Files.createTempDirectory("graft_vid2_in_").toString
    val store = Files.createTempDirectory("graft_vid2_store_").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_vid2_ckpt_").toString + "/c"
    def fr(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    def vid(vs: Int*) = Video.encode(vs.map(fr))
    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    def start() = Streaming.streamFrameSigIngest(mkStream(), "doc_id", "bin",
      store, ckpt, every = 2, minShared = 2) { (batch, _) =>
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    // batch 1 seeds the store: 1 samples (A@0, C@2); 2 samples (D@0, F@2)
    val (a, c, d, f) = (10, 30, 40, 60)
    Seq((1L, vid(a, 99, c)), (2L, vid(d, 98, f)))
      .toDF("doc_id", "bin").coalesce(1).write.mode("overwrite").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(survived.sorted == Seq(1L, 2L))
    survived.clear()

    // batch 2:
    //  10 shares ONE frame with stored 1 (A@0) and ONE with stored 2
    //     (F@2) — a pooled store count would reach 2 and over-drop; the
    //     per-store-video threshold keeps it
    //  20 [P,·,Q] / 21 [P,·,Q,·,R] / 22 [z,·,Q,·,R]: pairs (20,21)=2,
    //     (21,22)=2, (20,22)=1 — greedy keeps 20, drops 21, and KEEPS 22
    //     because its only blocking neighbor 21 was itself dropped
    //  30 [A,·,C,·,M] is a store-dup of 1 (A@0, C@2) — dropped; 31
    //     shares (C@2, M@4) with 30 only — a dropped seed must not drop
    //     31
    val (p, qq, r, z, m, z2) = (70, 71, 72, 73, 74, 75)
    Seq(
      (10L, vid(a, 97, f)),
      (20L, vid(p, 96, qq)), (21L, vid(p, 95, qq, 94, r)),
      (22L, vid(z, 93, qq, 92, r)),
      (30L, vid(a, 91, c, 90, m)), (31L, vid(z2, 89, c, 88, m)))
      .toDF("doc_id", "bin").coalesce(1).write.mode("append").parquet(in)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(survived.sorted == Seq(10L, 20L, 22L, 31L), s"got $survived")

    // store = batch-1 survivors (2+2) + batch-2 survivors (2+2+3+3),
    // each signature keyed by its video id
    val st = spark.read.parquet(s"$store/*")
    assert(st.count() == 14)
    assert(st.select("__vid").distinct().collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 10L, 20L, 22L, 31L))
  }

  test("streamAudioSigIngest: window-signature near-dup vs store and batch — the audio twin") {
    import spark.implicits._
    import graft.operators.Multimodal.Wav
    val in = Files.createTempDirectory("graft_aud_in_").toString
    val store = Files.createTempDirectory("graft_aud_store_").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_aud_ckpt_").toString + "/c"
    // 4-sample constant windows: distinct value => distinct signature
    def w(v: Int) = Seq[Short](v.toShort, v.toShort, v.toShort, v.toShort)
    def clip(ws: Seq[Short]*) =
      Wav.encode(Wav.Audio(8000, 1, ws.flatten.toArray))
    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    def start() = Streaming.streamAudioSigIngest(mkStream(), "doc_id", "bin",
      store, ckpt, winSize = 4, minShared = 2) { (batch, _) =>
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    // batch 1: 1 [A B C]; 2 [A X C] shares (A@0, C@2) -> greedy drops 2;
    // 3 fresh
    Seq((1L, clip(w(10), w(20), w(30))), (2L, clip(w(10), w(99), w(30))),
      (3L, clip(w(40), w(50), w(60))))
      .toDF("doc_id", "bin").coalesce(1).write.mode("overwrite").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(survived.sorted == Seq(1L, 3L), s"batch-1 survivors: $survived")

    // batch 2: 4 re-plays (A@0, C@2) -> store-dup of clip 1; 5 shares
    // only one window with the store -> survives
    survived.clear()
    Seq((4L, clip(w(10), w(77), w(30))), (5L, clip(w(40), w(88))))
      .toDF("doc_id", "bin").coalesce(1).write.mode("append").parquet(in)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(survived.sorted == Seq(5L), s"batch-2 survivors: $survived")

    // store holds survivors' signatures only (1: 3, 3: 3, 5: 2 windows)
    val st = spark.read.parquet(s"$store/*")
    assert(st.count() == 8)
    assert(st.select("__vid").distinct().collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L, 5L))
  }

  test("streamImageSigIngest: perceptual dHash near-dup vs store and batch, crash-replay safe — the image twin") {
    import spark.implicits._
    import graft.operators.Multimodal.Ppm
    val in = Files.createTempDirectory("graft_img_in_").toString
    val store = Files.createTempDirectory("graft_img_store_").toString + "/sigs"
    val ckpt = Files.createTempDirectory("graft_img_ckpt_").toString + "/c"
    def img(vals: (Int, Int) => Int) = {
      val px = new Array[Byte](9 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 9; c <- 0 until 3)
        px((y * 9 + x) * 3 + c) = vals(y, x).toByte
      Ppm.encode(Ppm.Image(9, 8, 255, px))
    }
    val base = img((y, x) => x * 10 + (y % 3) * 5)
    val edit = img((y, x) => if (y == 2 && x == 3) 0 else x * 10 + (y % 3) * 5)
    val edit2 = img((y, x) => if (y == 5 && x == 6) 0 else x * 10 + (y % 3) * 5)
    val noise = img((y, x) => ((y * 37 + x * 91) % 200))
    val noise2 = img((y, x) => ((y * 53 + x * 17) % 211))
    def mkStream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val survived = scala.collection.mutable.ArrayBuffer[Long]()
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = Streaming.streamImageSigIngest(mkStream(), "doc_id", "bin",
      store, ckpt, maxHamming = 3) { (batch, _) =>
      if (crashOnce.getAndSet(false)) sys.error("injected mid-batch crash")
      survived ++= batch.select("doc_id").collect().map(_.getLong(0))
    }

    // batch 1: 2 is a one-pixel edit of 1 (hamming <= 3) -> greedy drops
    // 2; 3 is unrelated noise -> survives
    Seq((1L, base), (2L, edit), (3L, noise))
      .toDF("doc_id", "bin").coalesce(1).write.mode("overwrite").parquet(in)
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(survived.isEmpty, "crashed batch must not have been delivered")
    // replay lands in the same batch partition: no double-append, no
    // self-dedup of the retry
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(survived.sorted == Seq(1L, 3L), s"batch-1 survivors: $survived")

    // batch 2: 4 is another near-edit of stored 1 -> store-dup, dropped;
    // 5 is fresh noise -> survives
    survived.clear()
    Seq((4L, edit2), (5L, noise2))
      .toDF("doc_id", "bin").coalesce(1).write.mode("append").parquet(in)
    val q3 = start()
    q3.processAllAvailable(); q3.stop()
    assert(survived.sorted == Seq(5L), s"batch-2 survivors: $survived")

    // store = one (vid, hash) row per surviving image
    val st = spark.read.parquet(s"$store/*")
    assert(st.columns.sorted.toSeq == Seq("__h", "__vid"))
    assert(st.select("__vid").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 3L, 5L))
  }

  // ---- maintained indexed ingest (insert + rebalance lifecycle) ----

  private val maintSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))

  /** 6 vectors near e1 (→ cell 0, over maxCell=4) + 1 near e2 (cell 1).
    * The hot cell is two tight 3-member sub-clusters with the two
    * SMALLEST ids (= the split seeds) in different sub-clusters, so the
    * seeded-Voronoi split lands 3/3 — a stable state the maintenance
    * re-check after a crash replay must leave alone.
    */
  private def maintBatch1(implicit s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(
      (1L, Seq(9f, 1f, 0.1f, 0f)), (2L, Seq(9f, 0.1f, 4f, 0f)),
      (3L, Seq(9f, 1.1f, 0f, 0f)), (4L, Seq(9f, 0.9f, 0f, 0.1f)),
      (5L, Seq(9f, 0f, 4.2f, 0f)), (6L, Seq(9f, 0.2f, 3.9f, 0f)),
      (100L, Seq(0f, 9f, 1f, 0f))).toDF("id", "embedding")
  }

  test("streamInsertIndexedMaintained splits a hot cell: exactly-once rows, committed centroids, untouched healthy dirs, correct probes") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_mnt_in_").toString
    val table = Files.createTempDirectory("graft_mnt_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_mnt_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val maint = scala.collection.mutable.ArrayBuffer[(Long, Int)]()

    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 4L, onMaintain = (b, n) => maint += ((b, n)))

    maintBatch1(spark).coalesce(1).write.mode("overwrite").parquet(in)
    val q = start()
    q.processAllAvailable()
    // batch 0 landed; no maintenance yet (the check precedes the append)
    assert(maint.isEmpty)
    assert(Streaming.maintainedCentroids(spark, table, cents)
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 1L))
    def listing(sub: String): Seq[(String, Long)] = {
      val d = new java.io.File(s"$table/$sub")
      if (!d.exists()) Seq.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length())).sorted.toSeq
    }
    val healthyBefore = listing("cell_id=1/__b=0")
    assert(healthyBefore.nonEmpty)

    // batch 1 triggers maintenance: cell 0 (6 rows > maxCell=4) splits
    // into ceil(6/4)=2 children seeded from its two smallest ids
    Seq((7L, Seq(8f, 0.5f, 0f, 0f)), (101L, Seq(0f, 8f, 0f, 1f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()

    assert(maint.toSeq == Seq((1L, 1)), maint)
    // committed centroids: survivor 1 + children 2, 3 (parent 0 gone)
    val centsNew = Streaming.maintainedCentroids(spark, table, cents)
    assert(centsNew.select("cent_id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L))
    // the parent's directory is deleted; the healthy cell's existing
    // batch subdir is byte-untouched (maintenance never rewrites it)
    assert(!new java.io.File(s"$table/cell_id=0").exists())
    assert(listing("cell_id=1/__b=0") == healthyBefore)

    // every ingested id exactly once, cells ⊆ committed centroids
    val t = spark.read.parquet(table)
      .withColumn("cell_id", col("cell_id").cast("long"))
    val ids = t.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L, 101L), ids)
    val cellSet = t.select("cell_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cellSet.subsetOf(Set(1L, 2L, 3L)), cellSet)

    // probe through the serving face: top-1 for id-4's own vector is
    // id 4, scanning only the probed cells' directories (plan-pruned)
    val qv = Seq(9f, 0.9f, 0f, 0.1f) // id 4's own vector
    val hits = Streaming.searchMaintained(spark, table, cents,
      "cent_id", "cvec", qv, nProbes = 2, k = 3)
    val scan = hits.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), scan)
    assert(hits.head().getLong(0) == 4L, hits.collect().toSeq)
  }

  test("streamInsertIndexedMaintained crash-replay at every window: rollback, rollforward, and batch-append are all exactly-once") {
    import spark.implicits._
    for (crashAt <- Seq("maint-appended", "maint-committed", "batch-appended")) {
      val in = Files.createTempDirectory(s"graft_mntc_in_").toString
      val table = Files.createTempDirectory(s"graft_mntc_tbl_").toString + "/t"
      val ckpt = Files.createTempDirectory(s"graft_mntc_ckpt_").toString + "/c"
      val cents = Seq(
        (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
      ).toDF("cent_id", "cvec")
      val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
      def start() = Streaming.streamInsertIndexedMaintained(
        spark.readStream.schema(maintSchema).parquet(in),
        dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 4L,
        maintHook = p =>
          if (p == crashAt && crashOnce.getAndSet(false))
            sys.error(s"injected crash at $p"))

      maintBatch1(spark).coalesce(1).write.mode("overwrite").parquet(in)
      if (crashAt == "batch-appended") {
        // batch 0's own append is the window: rows written, not committed
        val q0 = start()
        intercept[Exception] { q0.processAllAvailable() }
        q0.stop()
        assert(new java.io.File(s"$table").listFiles()
          .filter(_.getName.startsWith("cell_id="))
          .exists(d => new java.io.File(d, "__b=0").exists()),
          "append window: dead batch's subdirs must exist pre-recovery")
      } else {
        // maintenance only opens at batch 1 (the check precedes the
        // append, so batch 0 lands cleanly); feed batch 1 to crash it
        val q0 = start()
        q0.processAllAvailable()
        q0.stop()
        Seq((7L, Seq(8f, 0.5f, 0f, 0f)), (101L, Seq(0f, 8f, 0f, 1f)))
          .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
        val q1 = start()
        intercept[Exception] { q1.processAllAvailable() }
        q1.stop()
        // the crash window is REAL: dead maintenance left its phase state
        if (crashAt == "maint-appended")
          assert(new java.io.File(s"$table").listFiles()
            .filter(_.getName.startsWith("cell_id="))
            .exists(d => new java.io.File(d, "__b=-2").exists()),
            "rollback window: re-homed debris must exist pre-recovery")
        if (crashAt == "maint-committed") {
          assert(new java.io.File(s"$table/_centroids/v_1/_GRAFT_COMMIT").exists())
          assert(new java.io.File(s"$table/cell_id=0").exists(),
            "rollforward window: sources must still exist pre-recovery")
        }
      }
      // restart from the same checkpoint: recovery + replay must heal
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()

      val t = spark.read.parquet(table)
        .withColumn("cell_id", col("cell_id").cast("long"))
      val want =
        if (crashAt == "batch-appended") Seq(1L, 2L, 3L, 4L, 5L, 6L, 100L)
        else Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L, 101L)
      val ids = t.select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == want, s"$crashAt: ids after heal: $ids")
      if (crashAt != "batch-appended") {
        // maintenance completed exactly once: parent cell gone, committed
        // centroid table is {1, 2, 3}, table cells within it
        assert(!new java.io.File(s"$table/cell_id=0").exists(), crashAt)
        val cc = Streaming.maintainedCentroids(spark, table, cents)
          .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
        assert(cc == Seq(1L, 2L, 3L), s"$crashAt: $cc")
        val cellSet = t.select("cell_id").distinct()
          .collect().map(_.getLong(0)).toSet
        assert(cellSet.subsetOf(Set(1L, 2L, 3L)), s"$crashAt: $cellSet")
      }
    }
  }

  test("replay after a post-maintenance crash runs NO second rebalance generation in the same batch; the next batch catches residual imbalance") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_gen_in_").toString
    val table = Files.createTempDirectory("graft_gen_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_gen_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val maint = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    val appends = new java.util.concurrent.atomic.AtomicInteger(0)
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 4L, onMaintain = (b, n) => maint += ((b, n)),
      maintHook = p =>
        // die right after BATCH 1's append: its maintenance committed,
        // so the replay must skip re-planning even though a child is
        // still hot (one rebalance generation per batch id)
        if (p == "batch-appended" && appends.incrementAndGet() == 2 &&
            crashOnce.getAndSet(false))
          sys.error("injected crash after batch 1 append"))

    // LOPSIDED hot cell: both split seeds' clusters are uneven — ids
    // {1,3,4,5,6} sit near seed 1, only id 2 near seed 2, so child
    // cell 2 is born with 5 rows > maxCell (still hot after the split)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 0f, 4f, 0f)),
      (3L, Seq(9f, 1.1f, 0f, 0f)), (4L, Seq(9f, 0.9f, 0f, 0f)),
      (5L, Seq(9f, 1f, 0.1f, 0f)), (6L, Seq(9f, 0.95f, 0f, 0.1f)),
      (100L, Seq(0f, 9f, 1f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    val q0 = start()
    q0.processAllAvailable()
    // batch 1 (near seed 2's child, keeping child 2 at exactly 5 rows):
    // maintenance splits cell 0 → {2, 3}, commits, appends, then dies
    Seq((7L, Seq(9f, 0.05f, 4.1f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    intercept[Exception] { q0.processAllAvailable() }
    q0.stop()
    assert(maint.toSeq == Seq((1L, 1)), maint)

    // replay batch 1: rollforward keeps v_1, the re-check is SKIPPED
    // (committed generation exists) even though child 2 holds 5 > 4
    val q1 = start()
    q1.processAllAvailable()
    assert(maint.toSeq == Seq((1L, 1)),
      s"replay must not re-run batch 1's maintenance: $maint")
    // batch 2 catches the residual imbalance: child 2 splits in its own
    // generation (v_2), children numbered past the first generation's
    Seq((8L, Seq(0f, 8f, 0f, 1f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    q1.processAllAvailable()
    q1.stop()
    assert(maint.toSeq == Seq((1L, 1), (2L, 1)), maint)
    val cc = Streaming.maintainedCentroids(spark, table, cents)
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(cc == Seq(1L, 3L, 4L, 5L), cc)
    val t = spark.read.parquet(table)
    val ids = t.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 100L), ids)
  }

  test("compactMaintained leaves an UNCOMMITTED maintenance address unfolded so the stream's rollback can still reach it") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cspare_in_").toString
    val table = Files.createTempDirectory("graft_cspare_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_cspare_ckpt_").toString + "/c"
    val F0 = -(1L << 40)
    // three cells; cell 1 will sit below minCell and dissolve INTO cell
    // 0 (its row leans toward e1), so the crash debris lands in a cell
    // with committed history — the case a naive exclusion folds away
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 0f))
    ).toDF("cent_id", "cvec")
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def start(armed: Boolean) = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000L, minCell = 2L, checkEvery = 4,
      maintHook = p =>
        if (armed && p == "maint-appended" && crashOnce.getAndSet(false))
          sys.error("injected crash mid-maintenance"))
    def feed(rows: (Long, Seq[Float])*): Unit =
      rows.toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)

    val q0 = start(armed = true)
    feed((1L, Seq(9f, 0f, 0f, 0f)), (100L, Seq(1f, 9f, 0f, 0f)))
    q0.processAllAvailable() // batch 0
    feed((2L, Seq(9f, 0.1f, 0f, 0f))); q0.processAllAvailable() // batch 1
    feed((3L, Seq(9f, 0.2f, 0f, 0f))); q0.processAllAvailable() // batch 2
    feed((4L, Seq(9f, 0.3f, 0f, 0f))); q0.processAllAvailable() // batch 3
    // batch 4: checkEvery fires, cell 1 (1 row < minCell=2) dissolves,
    // its row re-homes into cell 0 at __b=-5 — and the crash hits
    feed((5L, Seq(9f, 0.4f, 0f, 0f)))
    intercept[Exception] { q0.processAllAvailable() }
    q0.stop()
    def subdirs(cell: Long): Set[Long] = {
      val d = new java.io.File(s"$table/cell_id=$cell")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.startsWith("__b="))
        .map(_.getName.stripPrefix("__b=").toLong).toSet
    }
    assert(subdirs(0L) == Set(0L, 1L, 2L, 3L, -5L), subdirs(0L))

    // offline compaction with the writer stopped (the prescribed use):
    // folds committed {0,1,2}, spares max ingest 3 AND the uncommitted
    // maintenance debris -5
    val folded = Streaming.compactMaintained(spark, table)
    assert(folded == 3, s"folded $folded")
    assert(subdirs(0L) == Set(F0, 3L, -5L), subdirs(0L))

    // restart: batch 4 replays — rollback deletes -5 (still reachable),
    // maintenance re-runs and commits, the batch lands; exactly-once
    val q1 = start(armed = false)
    q1.processAllAvailable()
    q1.stop()
    val t = spark.read.parquet(table)
    val ids = t.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L, 100L), ids)
    assert(!new java.io.File(s"$table/cell_id=1").exists(),
      "tiny cell must be dissolved by the re-run")
    // cells 1 (one row) AND 2 (zero rows) sit below minCell — both
    // dissolve; cell 0 is the sole survivor
    val cc = Streaming.maintainedCentroids(spark, table, cents)
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(cc == Seq(0L), cc)
    // id 100's row rehomed into cell 0 exactly once
    assert(t.filter(col("id") === 100L).count() == 1)
  }

  test("deleteMaintained hides ids from search immediately; compaction makes folded deletes physical; the sidecar is terminal per id") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_del_in_").toString
    val table = Files.createTempDirectory("graft_del_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_del_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    def feed(rows: (Long, Seq[Float])*): Unit =
      rows.toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    val q = start()
    feed((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)))
    q.processAllAvailable() // batch 0 (foldable later)
    feed((3L, Seq(9f, 3f, 0f, 0f))); q.processAllAvailable() // batch 1
    feed((4L, Seq(9f, 0f, 1f, 0f))); q.processAllAvailable() // batch 2 (tail)
    q.stop()

    // delete id 2 (sits in foldable batch 0) and id 4 (in the tail)
    Streaming.deleteMaintained(spark, table, Seq(2L, 4L).toDF("id"), "id")
    def hits(): Seq[Long] =
      Streaming.searchMaintained(spark, table, cents, "cent_id", "cvec",
        Seq(9f, 1f, 0.5f, 0f), nProbes = 2, k = 10)
        .collect().map(_.getLong(0)).toSeq
    assert(hits().sorted == Seq(1L, 3L), s"merge-on-read hide: ${hits()}")
    // no table file was touched by the delete — raw rows all present
    assert(spark.read.parquet(table).count() == 4)

    // compaction folds batches {0, 1} (tail 2 spared): the folded copy
    // of id 2 is purged physically; tail id 4 stays physical but hidden
    Streaming.compactMaintained(spark, table): Unit
    val raw = spark.read.parquet(table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(raw == Seq(1L, 3L, 4L), s"fold must purge deleted rows: $raw")
    assert(hits().sorted == Seq(1L, 3L))

    // terminal per id: re-inserting id 2 leaves it hidden (documented)
    val q2 = start()
    feed((2L, Seq(9f, 2f, 0f, 0f))); q2.processAllAvailable()
    q2.stop()
    assert(hits().sorted == Seq(1L, 3L), "tombstones are terminal per id")

    // streaming twin: a delete feed tombstones per micro-batch, and a
    // replayed append of the same ids is a no-op by idempotence
    val delIn = Files.createTempDirectory("graft_del_feed_").toString
    val delCkpt = Files.createTempDirectory("graft_del_fc_").toString + "/c"
    val delSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    Seq(3L).toDF("id").coalesce(1).write.mode("overwrite").parquet(delIn)
    val dq = Streaming.streamDeleteIngest(
      spark.readStream.schema(delSchema).parquet(delIn), "id", table, delCkpt)
    dq.processAllAvailable()
    dq.stop()
    assert(hits().sorted == Seq(1L), s"stream delete must hide id 3: ${hits()}")

    // the serving-side tombstone broadcast is ceiling-guarded: past
    // graft.maintained.maxTombstones the sidecar read refuses loudly
    // ("vacuum first") instead of OOMing the anti-join broadcast
    spark.conf.set("graft.maintained.maxTombstones", "2")
    try {
      val oversized = intercept[IllegalArgumentException](hits())
      assert(oversized.getMessage.contains("vacuumDeletes"),
        oversized.getMessage)
    } finally spark.conf.unset("graft.maintained.maxTombstones")
  }

  test("searchMaintainedBatch: one pruned scan answers the whole query table, per-query results equal searchMaintained, deletes honored") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_smb_in_").toString
    val table = Files.createTempDirectory("graft_smb_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_smb_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)),
      (3L, Seq(1f, 9f, 0f, 0f)), (4L, Seq(2f, 9f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()

    val queries = Seq((100L, Seq(9f, 1.5f, 0f, 0f)), (200L, Seq(1.5f, 9f, 0f, 0f)))
    val batch = Streaming.searchMaintainedBatch(spark, table, cents,
      "cent_id", "cvec", queries.toDF("qid", "qvec"), "qid", "qvec",
      nProbes = 1, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val singles = queries.flatMap { case (qid, qv) =>
      Streaming.searchMaintained(spark, table, cents, "cent_id", "cvec",
        qv, nProbes = 1, k = 2)
        .collect().map(r => (qid, r.getLong(0),
          math.round(r.getDouble(1) * 1e6)))
    }.toSet
    assert(batch == singles, s"batch $batch vs singles $singles")
    assert(batch.map(_._1) == Set(100L, 200L))
    // nProbes=1 routes each query to ITS cell only: q100 must only see
    // cell-0 ids {1,2}, q200 only cell-1 ids {3,4}
    assert(batch.filter(_._1 == 100L).map(_._2).subsetOf(Set(1L, 2L)))
    assert(batch.filter(_._1 == 200L).map(_._2).subsetOf(Set(3L, 4L)))

    // deletes are honored in the batch path too
    Streaming.deleteMaintained(spark, table, Seq(2L).toDF("id"), "id")
    val after = Streaming.searchMaintainedBatch(spark, table, cents,
      "cent_id", "cvec", queries.toDF("qid", "qvec"), "qid", "qvec",
      nProbes = 1, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!after.contains((100L, 2L)), after)

    // a query VECTOR column named like the table's own ("embedding")
    // must not collide at the routing join (re-aliased internally);
    // a qid named like the hit columns is refused loudly
    val clash = Streaming.searchMaintainedBatch(spark, table, cents,
      "cent_id", "cvec", queries.toDF("qid", "embedding"), "qid", "embedding",
      nProbes = 1, k = 2)
    assert(clash.collect().map(_.getLong(0)).toSet == Set(100L, 200L))
    intercept[IllegalArgumentException] {
      Streaming.searchMaintainedBatch(spark, table, cents,
        "cent_id", "cvec", queries.toDF("id", "qvec"), "id", "qvec",
        nProbes = 1, k = 2)
    }

    // AQE-on twin (the PlanShapeSpec discipline): the routing and
    // delete joins must stay broadcast probes over the PRUNED scan
    // under adaptive execution — no sort-merge, no cartesian
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = Streaming.searchMaintainedBatch(spark, table, cents,
        "cent_id", "cvec", queries.toDF("qid", "qvec"), "qid", "qvec",
        nProbes = 1, k = 2)
      df.queryExecution.executedPlan.executeCollect(): Unit
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")
        && !p.contains("CartesianProduct"), p)
      assert(p.contains("PartitionFilters: ["),
        s"probed-cell pruning must survive AQE:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("maintained metadata passthrough: filtered serving on both faces, pushdown on the pruned scan, reserved names refused") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_smf_in_").toString
    val table = Files.createTempDirectory("graft_smf_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_smf_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val schema = org.apache.spark.sql.types.StructType(maintSchema.fields :+
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType))
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(schema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f), "en"), (2L, Seq(9f, 2f, 0f, 0f), "de"),
      (3L, Seq(1f, 9f, 0f, 0f), "en"), (4L, Seq(2f, 9f, 0f, 0f), "de"))
      .toDF("id", "embedding", "lang")
      .coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()

    // the metadata column landed in the table beside the layout columns
    val t = spark.read.parquet(table)
    assert(t.columns.contains("lang"), t.columns.toSeq)
    assert(t.filter(col("lang") === "en").count() == 2)

    // single face: probe BOTH cells, restrict to lang='en' — exactly
    // the en rows come back, ranked; and the predicate reaches the
    // parquet scan (row-group pruning inside the probed directories)
    val qv = Seq(9f, 1.5f, 0f, 0f)
    val hits = Streaming.searchMaintained(spark, table, cents,
      "cent_id", "cvec", qv, nProbes = 2, k = 4, pred = col("lang") === "en")
    assert(hits.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("EqualTo(lang,en)"),
      s"lang predicate must push to the pruned scan:\n$plan")

    // batch face: one shared predicate over the shared pruned scan
    val queries = Seq((100L, Seq(9f, 1.5f, 0f, 0f)), (200L, Seq(1.5f, 9f, 0f, 0f)))
    val batch = Streaming.searchMaintainedBatch(spark, table, cents,
      "cent_id", "cvec", queries.toDF("qid", "qvec"), "qid", "qvec",
      nProbes = 2, k = 4, pred = col("lang") === "de")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((100L, 2L), (100L, 4L), (200L, 2L), (200L, 4L)), batch)

    // deletes and the predicate compose
    Streaming.deleteMaintained(spark, table, Seq(3L).toDF("id"), "id")
    assert(Streaming.searchMaintained(spark, table, cents, "cent_id", "cvec",
      qv, nProbes = 2, k = 4, pred = col("lang") === "en")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))

    // a metadata column named like a reserved layout column must be
    // refused loudly at ingest, not silently corrupt the addressing
    val in2 = Files.createTempDirectory("graft_smf_in2_").toString
    val table2 = Files.createTempDirectory("graft_smf_tbl2_").toString + "/t"
    val ckpt2 = Files.createTempDirectory("graft_smf_ckpt2_").toString + "/c"
    val badSchema = org.apache.spark.sql.types.StructType(maintSchema.fields :+
      org.apache.spark.sql.types.StructField("cell_id",
        org.apache.spark.sql.types.LongType))
    val q2 = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(badSchema).parquet(in2),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table2, ckpt2,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f), 7L)).toDF("id", "embedding", "cell_id")
      .coalesce(1).write.mode("overwrite").parquet(in2)
    val err = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    assert(err.getMessage != null &&
      (err.getMessage.contains("reserved") ||
        Option(err.getCause).exists(_.getMessage.contains("reserved"))),
      s"expected the reserved-name refusal, got: ${err.getMessage}")
  }

  test("silhouetteMaintained: fresh table ≥ 0, externally retrained centroids drive it negative, tombstones excluded") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_sil_in_").toString
    val table = Files.createTempDirectory("graft_sil_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_sil_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)),
      (3L, Seq(1f, 9f, 0f, 0f)), (4L, Seq(2f, 9f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()

    // freshly filed: every cell's stored assignment is the argmax → ≥ 0
    val fresh = Streaming.silhouetteMaintained(spark, table, cents,
      "cent_id", "cvec").collect()
    assert(fresh.map(_.getLong(1)).sum == 4L)
    fresh.foreach(r => assert(r.getDouble(3) >= 0.0, r.toString))

    // an external retrain SWAPS the centroids (committed v_99) without
    // re-filing rows: every stored assignment is now maximally stale
    val vDir = new java.io.File(s"$table/_centroids/v_99")
    Seq((0L, Seq(0f, 1f, 0f, 0f)), (1L, Seq(1f, 0f, 0f, 0f)))
      .toDF("cent_id", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(vDir.getAbsolutePath)
    assert(new java.io.File(vDir, "_GRAFT_COMMIT").createNewFile())
    val stale = Streaming.silhouetteMaintained(spark, table, cents,
      "cent_id", "cvec").collect()
    stale.foreach(r => assert(r.getDouble(3) < 0.0,
      s"swapped centroids must drive cell ${r.getLong(0)} negative: $r"))

    // tombstoned rows never serve, so they must not color the report
    Streaming.deleteMaintained(spark, table, Seq(1L).toDF("id"), "id")
    val afterDel = Streaming.silhouetteMaintained(spark, table, cents,
      "cent_id", "cvec").collect()
    assert(afterDel.map(_.getLong(1)).sum == 3L, afterDel.toSeq.toString)
  }

  test("searchMaintainedNamespacedBatch: tenant isolation on disk, per-query equals the filtered single face") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_nsb_in_").toString
    val table = Files.createTempDirectory("graft_nsb_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_nsb_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val schema = org.apache.spark.sql.types.StructType(maintSchema.fields :+
      org.apache.spark.sql.types.StructField("tenant",
        org.apache.spark.sql.types.StringType))
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(schema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    // both tenants have rows in BOTH cells — isolation must come from
    // the join, not from cell geometry
    Seq((1L, Seq(9f, 1f, 0f, 0f), "a"), (2L, Seq(9f, 2f, 0f, 0f), "b"),
      (3L, Seq(1f, 9f, 0f, 0f), "a"), (4L, Seq(2f, 9f, 0f, 0f), "b"))
      .toDF("id", "embedding", "tenant")
      .coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    Streaming.deleteMaintained(spark, table, Seq(4L).toDF("id"), "id")
    val queries = Seq(
      (100L, Seq(9f, 1.5f, 0f, 0f), "a"), (200L, Seq(9f, 1.5f, 0f, 0f), "b"),
      (300L, Seq(1.5f, 9f, 0f, 0f), "b")).toDF("qid", "qvec", "qns")
    val got = Streaming.searchMaintainedNamespacedBatch(spark, table, cents,
      "cent_id", "cvec", queries, "qid", "qvec", "qns", "tenant",
      nProbes = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // isolation + deletes: tenant a sees {1,3}; tenant b sees {2} (4 deleted)
    assert(got.filter(_._1 == 100L).map(_._2).toSet == Set(1L, 3L))
    assert(got.filter(_._1 == 200L).map(_._2).toSet == Set(2L))
    assert(got.filter(_._1 == 300L).map(_._2).toSet == Set(2L))
    // per query ≡ the filtered single face with pred = tenant
    queries.collect().foreach { r =>
      val (qid, qv, ns) = (r.getLong(0), r.getSeq[Float](1), r.getString(2))
      val single = Streaming.searchMaintained(spark, table, cents,
        "cent_id", "cvec", qv, 2, 5, pred = col("tenant") === ns)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).toSet
      val mine = got.filter(_._1 == qid).map(x => (x._2, x._3)).toSet
      assert(mine == single, s"qid $qid: $mine vs single $single")
    }
    // AQE-on twin: the tenant routing join must stay a broadcast probe
    // over the pruned scan under adaptive execution
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = Streaming.searchMaintainedNamespacedBatch(spark, table, cents,
        "cent_id", "cvec", queries, "qid", "qvec", "qns", "tenant", 2, 5)
      df.queryExecution.executedPlan.executeCollect(): Unit
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"AQE must not re-shape the tenant join:\n$p")
      assert(p.contains("PartitionFilters: ["),
        s"probed-cell pruning must survive AQE:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("describeMaintained: per-cell census, tombstone count, centroid version, compaction debt") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_dm_in_").toString
    val table = Files.createTempDirectory("graft_dm_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_dm_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)),
      (3L, Seq(1f, 9f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    Seq((4L, Seq(9f, 3f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    Seq((5L, Seq(1f, 8f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    Streaming.deleteMaintained(spark, table, Seq(3L).toDF("id"), "id")
    val rep = Streaming.describeMaintained(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rep(("rows", 0L)) == 3L && rep(("rows", 1L)) == 2L, rep)
    // cell 0 holds two batch subdirs (compaction debt), cell 1 two
    assert(rep(("subdirs", 0L)) == 2L && rep(("subdirs", 1L)) == 2L, rep)
    assert(rep(("bytes", 0L)) > 0L)
    assert(rep(("tombstones", -1L)) == 1L)
    // no rebalance ran → no committed centroid version yet
    assert(rep(("centroid_version", -1L)) == -1L)
    assert(rep(("pending_compaction", -1L)) == 0L)
    // after compaction cell 0's debt clears (its two batches are both
    // foldable; cell 1's second subdir is the spared replay tail)
    assert(Streaming.compactMaintained(spark, table) > 0)
    val rep2 = Streaming.describeMaintained(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rep2(("subdirs", 0L)) == 1L && rep2(("subdirs", 1L)) == 2L, rep2)
    assert(rep2(("pending_compaction", -1L)) == 0L)
  }

  test("vacuumDeletes: dead tombstones drop after compaction, live ones survive, purged ids can return") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_vd_in_").toString
    val table = Files.createTempDirectory("graft_vd_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_vd_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    val q = start()
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    Seq((5L, Seq(9f, 3f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    Seq((3L, Seq(1f, 9f, 0f, 0f)), (4L, Seq(2f, 9f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    // two separate delete appends → two sidecar files
    Streaming.deleteMaintained(spark, table, Seq(2L).toDF("id"), "id")
    Streaming.deleteMaintained(spark, table, Seq(3L).toDF("id"), "id")
    // compaction folds cell 0's batches 0 and 1 (the largest ingest
    // batch, 2, is spared) and makes id 2's delete physical; id 3 sits
    // in the spared batch and stays merge-on-read
    assert(Streaming.compactMaintained(spark, table) > 0)
    val ids = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L) && ids.contains(3L), ids)

    val (kept, dropped) = Streaming.vacuumDeletes(spark, table)
    assert((kept, dropped) == ((1L, 1L)), s"kept=$kept dropped=$dropped")
    // the sidecar folded to one file and still hides id 3
    val sideFiles = new java.io.File(s"$table/_deletes").listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(sideFiles.length == 1, sideFiles.map(_.getName).toSeq)
    def visible(): Set[Long] = Streaming.searchMaintained(spark, table,
      cents, "cent_id", "cvec", Seq(9f, 1f, 0f, 0f), 2, 10)
      .collect().map(_.getLong(0)).toSet
    assert(visible() == Set(1L, 4L, 5L), visible())
    // idempotent re-run
    assert(Streaming.vacuumDeletes(spark, table) == ((1L, 0L)))
    // the purge-then-return lifecycle: a vacuumed id re-inserted later
    // SURFACES (the deliberate exit from terminal-per-id)
    val q2 = start()
    Seq((2L, Seq(9f, 2f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q2.processAllAvailable()
    q2.stop()
    assert(visible() == Set(1L, 2L, 4L, 5L), visible())
  }

  test("searchMaintainedBatchCollapsed: identical to uncollapsed on a duplicate-heavy batch") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_col_in_").toString
    val table = Files.createTempDirectory("graft_col_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_col_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)),
      (3L, Seq(1f, 9f, 0f, 0f)), (4L, Seq(2f, 9f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    // 12 queries, only 2 unique vectors — the hot-query shape
    val hot = Seq(Seq(9f, 1.5f, 0f, 0f), Seq(1.5f, 9f, 0f, 0f))
    val queries = (0 until 12).map(i => (100L + i, hot(i % 2)))
      .toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e6))).toSet
    val collapsed = rows(Streaming.searchMaintainedBatchCollapsed(spark,
      table, cents, "cent_id", "cvec", queries, "qid", "qvec", 2, 2))
    val plain = rows(Streaming.searchMaintainedBatch(spark, table, cents,
      "cent_id", "cvec", queries, "qid", "qvec", 2, 2))
    assert(collapsed == plain, s"collapsed $collapsed vs plain $plain")
    assert(collapsed.map(_._1) == (100L until 112L).toSet,
      "every original qid answered")
    // output contract (qidCol, id, score): a qidCol named like the hit
    // columns must throw here exactly as in the uncollapsed call
    for (bad <- Seq("id", "score")) {
      val e = intercept[IllegalArgumentException] {
        Streaming.searchMaintainedBatchCollapsed(spark, table, cents,
          "cent_id", "cvec", queries.withColumnRenamed("qid", bad),
          bad, "qvec", 2, 2)
      }
      assert(e.getMessage.contains(bad), e.getMessage)
    }
  }

  test("maintainedSnapshot pins serving to a table version: post-pin inserts invisible, deletes still win, pages stay consistent") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_pin_in_").toString
    val table = Files.createTempDirectory("graft_pin_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_pin_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 2f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    Seq((3L, Seq(9f, 3f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    val pin = Streaming.maintainedSnapshot(spark, table)
    assert(pin == 1L, s"two ingest batches → pin 1, got $pin")
    val qv = Seq(9f, 0.5f, 0f, 0f)
    def ids(asOf: Option[Long], after: Option[(Double, Long)] = None,
            k: Int = 10): Seq[(Long, Double)] =
      Streaming.searchMaintained(spark, table, cents, "cent_id", "cvec",
        qv, nProbes = 2, k = k, after = after, asOf = asOf)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val page1 = ids(Some(pin), k = 2)
    // a post-pin batch lands; an unpinned read sees it, the pin doesn't
    Seq((4L, Seq(9f, 0.5f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    assert(ids(None).map(_._1).toSet == Set(1L, 2L, 3L, 4L))
    assert(ids(Some(pin)).map(_._1).toSet == Set(1L, 2L, 3L),
      "pinned read must not see the post-pin batch")
    // page 2 of the PINNED scroll: id 4 scores top-1 for qv, so an
    // unpinned scroll would have it invade the page boundary — the pin
    // keeps page1 ++ page2 equal to the one big pinned top-k
    val p1last = page1.last
    val page2 = ids(Some(pin), after = Some((p1last._2, p1last._1)), k = 2)
    assert((page1 ++ page2) == ids(Some(pin), k = 4),
      s"pinned pages must replay the pinned ranking: $page1 ++ $page2")
    // the batch face honors the same pin
    val batchHits = Streaming.searchMaintainedBatch(spark, table, cents,
      "cent_id", "cvec", Seq((100L, qv)).toDF("qid", "qvec"),
      "qid", "qvec", 2, 10, asOf = Some(pin))
      .collect().map(_.getLong(1)).toSet
    assert(batchHits == Set(1L, 2L, 3L), batchHits)
    // right-to-erasure outranks repeatable reads: a delete issued AFTER
    // the pin still hides its row from pinned reads
    Streaming.deleteMaintained(spark, table, Seq(2L).toDF("id"), "id")
    assert(ids(Some(pin)).map(_._1).toSet == Set(1L, 3L),
      "post-pin delete must apply to pinned reads")
    // POST-PIN COMPACTION: batches 0 and 1 fold to a new __b address —
    // the __b0 version column (not the directory address) carries the
    // pin, so the folded copies of pre-pin rows stay visible and the
    // spared post-pin row stays hidden
    assert(Streaming.compactMaintained(spark, table) > 0)
    assert(ids(Some(pin)).map(_._1).toSet == Set(1L, 3L),
      "pinned read must survive a post-pin fold")
    assert(ids(None).map(_._1).toSet == Set(1L, 3L, 4L))
    // an empty table pins at -1
    assert(Streaming.maintainedSnapshot(spark,
      Files.createTempDirectory("graft_pin_none_").toString + "/nope") == -1L)
  }

  test("searchMaintainedExact is ground truth; recallMaintained quantifies the probe trade per query") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_rec_in_").toString
    val table = Files.createTempDirectory("graft_rec_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_rec_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    // ids 1, 2 file in cell 0; id 3 files in cell 1 but is the QUERY's
    // second-nearest row — the row probe-1 serving must miss
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(9f, 8f, 0f, 0f)),
      (3L, Seq(8f, 9f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    val qv = Seq(9f, 7f, 0f, 0f)
    val exact = Streaming.searchMaintainedExact(spark, table, qv, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(exact == Seq(2L, 3L), exact)
    // exact ≡ probed serving at nProbes = #cells, row for row
    val full = Streaming.searchMaintained(spark, table, cents, "cent_id",
      "cvec", qv, nProbes = 2, k = 2).collect().map(_.getLong(0)).toSeq
    assert(full == exact)
    def recall(nProbes: Int): Map[Long, (Long, Long, Double)] =
      Streaming.recallMaintained(spark, table, cents, "cent_id", "cvec",
        Seq((100L, qv)).toDF("qid", "qvec"), "qid", "qvec", nProbes, 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
    // probe-1 scans only cell 0: id 3 (true #2) is missed — recall 0.5
    assert(recall(1)(100L) == ((2L, 1L, 0.5)), recall(1))
    assert(recall(2)(100L) == ((2L, 2L, 1.0)), recall(2))
    // the exact face honors tombstones like every serving face
    Streaming.deleteMaintained(spark, table, Seq(2L).toDF("id"), "id")
    val afterDel = Streaming.searchMaintainedExact(spark, table, qv, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(afterDel == Seq(3L, 1L), afterDel)
  }

  test("retrainMaintained rebuilds the index: new cells serve, tombstones purge physically, ingest resumes in the new space") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_rt_in_").toString
    val table = Files.createTempDirectory("graft_rt_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_rt_ckpt_").toString + "/c"
    // stale centroids: the data lives on the z/w axes, the centroids on
    // x/y — every row ties to cell 0, probe pruning is useless
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    val q = start()
    Seq((1L, Seq(0f, 0f, 9f, 1f)), (2L, Seq(0f, 0f, 9f, 2f)),
      (3L, Seq(0f, 0f, 1f, 9f)), (4L, Seq(0f, 0f, 2f, 9f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    Streaming.deleteMaintained(spark, table, Seq(4L).toDF("id"), "id")
    def liveCells(): Set[Long] = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
      .map(_.getName.stripPrefix("cell_id=").toLong).toSet
    // every row tied to cell 0 under the stale centroids (cos 0 to both)
    val oldCells = liveCells()
    assert(oldCells == Set(0L), oldCells)
    val v = Streaming.retrainMaintained(spark, table, k = 2, iters = 2)
    // old cell dirs gone; new cell ids start past the old ones
    val cellIds = liveCells()
    assert(cellIds.forall(_ > oldCells.max) && (cellIds & oldCells).isEmpty,
      s"new cells must be disjoint from and above the old: $cellIds")
    assert(cellIds.size == 2, s"k=2 rebuild → 2 cells, got $cellIds")
    // the tombstoned row is PHYSICALLY purged — but its sidecar entry
    // SURVIVES: id 4 rode the spared replayable tail (batch 0 is the
    // largest ingest batch), and a crashed-checkpoint replay would
    // re-append it, so the tombstone must still be there to hide it
    val sidecar = spark.read.parquet(s"$table/_deletes")
      .collect().map(_.getLong(0)).toSet
    assert(sidecar == Set(4L), sidecar)
    val ids = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), ids)
    // the spared tail kept its REPLAYABLE directory address (__b=0) even
    // though its rows re-homed to the new cells
    assert(new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
      .exists(d => new java.io.File(d, "__b=0").exists()),
      "spared tail must keep its __b=0 address in the new cells")
    // the committed version serves: probe-1 search in the retrained
    // space routes the w-axis query straight to id 3's cell
    val rep = Streaming.describeMaintained(spark, table).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rep(("centroid_version", -1L)) == v, rep)
    val hits = Streaming.searchMaintained(spark, table, cents, "cent_id",
        "cvec", Seq(0f, 0f, 0f, 1f), nProbes = 1, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(hits.head == 3L, hits)
    // ingest resumes against the retrained centroids: a new w-axis row
    // files into id 3's (new-space) cell
    val q2 = start()
    Seq((5L, Seq(0f, 0f, 1f, 8f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q2.processAllAvailable()
    q2.stop()
    val cellOf = spark.read.parquet(table)
      .select(col("id"), col("cell_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf(5L) == cellOf(3L), cellOf)
    // snapshot pins survive the rebuild: __b0 versions rode through
    val pinned = Streaming.searchMaintained(spark, table, cents, "cent_id",
        "cvec", Seq(0f, 0f, 0f, 1f), nProbes = 2, k = 10, asOf = Some(0L))
      .collect().map(_.getLong(0)).toSet
    assert(pinned == Set(1L, 2L, 3L), s"pin 0 predates the rebuild: $pinned")
    // WARM-START retrain from the committed (already-good) centroids:
    // k is ignored, geometry barely moves, membership is preserved
    val v2 = Streaming.retrainMaintained(spark, table, k = 99, iters = 1,
      warmStart = Some((cents, "cent_id", "cvec")))
    assert(v2 > v)
    val cellOf2 = spark.read.parquet(table)
      .select(col("id"), col("cell_id").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellOf2(1L) == cellOf2(2L) && cellOf2(3L) == cellOf2(5L) &&
      cellOf2(1L) != cellOf2(3L),
      s"warm retrain must preserve the healthy membership: $cellOf2")
    // the tail moved on (batch 1 is now the spared tail; id 4 is not in
    // it): the surviving tombstone retired with the second rebuild
    assert(!new java.io.File(s"$table/_deletes").exists(),
      "tombstone covering a non-tail batch must retire at retrain")
  }

  test("retrainMaintained spares the replayable tail: a crashed-checkpoint replay stays exactly-once across the rebuild") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_rtt_in_").toString
    val table = Files.createTempDirectory("graft_rtt_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_rtt_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L,
      maintHook = p =>
        if (p == "batch-appended" && crashOnce.getAndSet(false))
          sys.error("injected crash after batch append"))
    // batch 0 commits cleanly
    Seq((1L, Seq(0f, 0f, 9f, 1f)), (2L, Seq(0f, 0f, 9f, 2f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    val q0 = start()
    q0.processAllAvailable()
    q0.stop()
    // batch 1 appends, then the "process" dies before its checkpoint
    // commit — the ADVICE-flagged window
    crashOnce.set(true)
    Seq((3L, Seq(0f, 0f, 1f, 9f)), (4L, Seq(0f, 0f, 2f, 9f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    val q1 = start()
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    // a delete lands against the not-yet-committed tail too
    Streaming.deleteMaintained(spark, table, Seq(4L).toDF("id"), "id")
    // operator retrains over the crashed table (writer stopped — they
    // cannot know the last checkpoint never committed)
    val v = Streaming.retrainMaintained(spark, table, k = 2, iters = 1)
    assert(v >= 2L, s"version past both batches: $v")
    // tail rows re-homed but KEPT address __b=1; sidecar kept id 4
    val tailDirs = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
      .filter(d => new java.io.File(d, "__b=1").exists())
    assert(tailDirs.nonEmpty, "spared tail address must survive the rebuild")
    // resume: batch 1 REPLAYS — deletes its own (re-homed) subdirs and
    // re-appends; every id lands exactly once, the tombstone still hides 4
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows.sorted == Seq(1L, 2L, 3L, 4L),
      s"exactly-once across retrain + replay: $rows")
    val served = Streaming.searchMaintained(spark, table, cents, "cent_id",
        "cvec", Seq(0f, 0f, 1f, 1f), nProbes = 2, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(served == Set(1L, 2L, 3L), s"tombstone survived the replay: $served")
    // the replayed rows route under the RETRAINED committed centroids
    val cellIds = spark.read.parquet(table)
      .select(col("cell_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val committed = Streaming.maintainedCentroids(spark, table, cents)
      .select(col("cent_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(cellIds.subsetOf(committed),
      s"cells $cellIds must sit inside committed centroids $committed")
  }

  test("maintainedSnapshot falls back to max(__b0) when maintenance rewrote every non-negative address") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_snapfb_in_").toString
    val table = Files.createTempDirectory("graft_snapfb_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_snapfb_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    def start() = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    val q0 = start()
    Seq((1L, Seq(0f, 0f, 9f, 1f)), (2L, Seq(0f, 0f, 1f, 9f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q0.processAllAvailable()
    q0.stop()
    val q1 = start()
    Seq((3L, Seq(0f, 0f, 5f, 5f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q1.processAllAvailable()
    q1.stop()
    assert(Streaming.maintainedSnapshot(spark, table) == 1L)
    // delete the WHOLE tail batch, then retrain: the spared-tail copies
    // are all tombstone-purged, so no __b>=0 directory survives — the
    // post-rebuild window the listing alone cannot answer
    Streaming.deleteMaintained(spark, table, Seq(3L).toDF("id"), "id")
    Streaming.retrainMaintained(spark, table, k = 2, iters = 1)
    val addrs = new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
      .flatMap(_.listFiles()).map(_.getName)
      .filter(_.startsWith("__b=")).map(_.stripPrefix("__b=").toLong)
    assert(addrs.forall(_ < 0), s"fixture must have no ingest dirs: ${addrs.toSeq}")
    // the pin falls back to max(__b0): batch-0 rows are still version 0
    val pin = Streaming.maintainedSnapshot(spark, table)
    assert(pin == 0L, s"fallback pin: $pin")
    val pinned = Streaming.searchMaintained(spark, table, cents, "cent_id",
        "cvec", Seq(0f, 0f, 9f, 1f), nProbes = 2, k = 10, asOf = Some(pin))
      .collect().map(_.getLong(0)).toSet
    assert(pinned == Set(1L, 2L), s"a fresh pin must see the live table: $pinned")
  }

  test("adviseMaintenance surfaces a crashed retrain intent; autoMaintain recovers it before anything else") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_advr_in_").toString
    val table = Files.createTempDirectory("graft_advr_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_advr_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(0f, 0f, 9f, 1f)), (2L, Seq(0f, 0f, 1f, 9f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    intercept[RuntimeException] {
      Streaming.retrainMaintained(spark, table, k = 2, iters = 1,
        hook = s => if (s == "retrain-appended") sys.error("boom"))
    }
    // the intent blocks all ingest — and the advisor must SAY so even
    // though no drift metric trips on this tiny healthy table
    val a = Streaming.adviseMaintenance(spark, table, cents, "cent_id",
        "cvec").collect().map(r => r.getString(0)).toSet
    assert(a.contains("recover_retrain"), a)
    val ran = Streaming.autoMaintain(spark, table, cents, "cent_id", "cvec")
    assert(ran.contains("recover_retrain"), ran)
    // healed: no intent, rolled back to the pre-retrain table, ingest OK
    assert(!new java.io.File(s"$table/_retrain").exists() ||
      new java.io.File(s"$table/_retrain").listFiles()
        .forall(f => !f.getName.endsWith(".intent")))
    val rows = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(rows == Seq(1L, 2L), rows)
    val a2 = Streaming.adviseMaintenance(spark, table, cents, "cent_id",
        "cvec").collect().map(r => r.getString(0)).toSet
    assert(!a2.contains("recover_retrain"), a2)
  }

  test("searchMaintainedExact and recallMaintained answer empty on a fully-emptied table instead of throwing") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_emex_in_").toString
    val table = Files.createTempDirectory("graft_emex_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_emex_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 0f, 0f, 0f)), (2L, Seq(0f, 9f, 0f, 0f)),
      (3L, Seq(5f, 5f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    // empty the table: delete everything, fold the deletes physical
    Streaming.deleteMaintained(spark, table, Seq(1L, 2L, 3L).toDF("id"), "id")
    // force-foldable: append a second batch address so every cell folds
    val q2 = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((4L, Seq(9f, 1f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q2.processAllAvailable()
    q2.stop()
    Streaming.deleteMaintained(spark, table, Seq(4L).toDF("id"), "id")
    Streaming.compactMaintained(spark, table)
    // compaction spares the tail; fold again after it becomes foldable —
    // or simply assert the guard on whatever emptied state we reached by
    // deleting the remaining cell dirs the way a full purge would
    new java.io.File(table).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(d)
      }
    val qv = Seq(9f, 0f, 0f, 0f)
    val ex = Streaming.searchMaintainedExact(spark, table, qv, 5)
    assert(ex.columns.toSeq == Seq("id", "score") && ex.count() == 0L)
    val rec = Streaming.recallMaintained(spark, table, cents, "cent_id",
      "cvec", Seq((7L, qv)).toDF("qid", "qvec"), "qid", "qvec", 2, 5)
    assert(rec.columns.toSeq == Seq("qid", "n_exact", "n_hit", "recall") &&
      rec.count() == 0L)
  }

  test("retrainMaintained crash windows: uncommitted rolls back, committed rolls forward, ingest refuses a pending intent") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_rtc_in_").toString
    val table = Files.createTempDirectory("graft_rtc_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_rtc_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(0f, 0f, 9f, 1f)), (2L, Seq(0f, 0f, 9f, 2f)),
      (3L, Seq(0f, 0f, 1f, 9f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    def allRows(): Seq[Long] = spark.read.parquet(table)
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    // crash AFTER the re-home append, BEFORE commit: rows are briefly
    // duplicated on disk; recovery must roll the debris back
    intercept[RuntimeException] {
      Streaming.retrainMaintained(spark, table, k = 2, iters = 1,
        hook = s => if (s == "retrain-appended") sys.error("boom"))
    }
    // the ingest refuses to resume over the pending intent
    val qRefuse = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table,
      Files.createTempDirectory("graft_rtc_ck2_").toString + "/c",
      maxCell = 1000000L)
    Seq((9L, Seq(0f, 0f, 5f, 5f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    val refuse = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qRefuse.processAllAvailable()
    }
    qRefuse.stop()
    assert(refuse.getMessage.contains("unrecovered retrain"), refuse.getMessage)
    // re-run: rollback (debris gone) then a clean retrain completes
    val v1 = Streaming.retrainMaintained(spark, table, k = 2, iters = 1)
    assert(allRows() == Seq(1L, 2L, 3L), allRows())
    // crash AFTER commit, BEFORE source deletes: recovery rolls forward
    intercept[RuntimeException] {
      Streaming.retrainMaintained(spark, table, k = 2, iters = 1,
        hook = s => if (s == "retrain-committed") sys.error("boom"))
    }
    val v2 = Streaming.retrainMaintained(spark, table, k = 2, iters = 1)
    assert(v2 > v1)
    assert(allRows() == Seq(1L, 2L, 3L),
      s"exactly-once across both crash recoveries: ${allRows()}")
    val hits = Streaming.searchMaintained(spark, table, cents, "cent_id",
        "cvec", Seq(0f, 0f, 9f, 1.5f), nProbes = 2, k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L, 3L), hits)
  }

  test("streamDecontaminateIngest gates eval leakage at ingest, batch-twin exact, evidence attached") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_sd_in_").toString
    val ckpt = Files.createTempDirectory("graft_sd_ckpt_").toString + "/c"
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
      .toDF("cent_id", "cvec")
    val ev = Seq((100L, Seq(0.9f, 0.1f, 0f, 0f)), (101L, Seq(0f, 1f, 0f, 0f)))
      .toDF("eid", "evec")
    val cleanRows = scala.collection.mutable.ArrayBuffer[Long]()
    val flaggedRows = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val schema = "id LONG, embedding ARRAY<FLOAT>"
    val q = Streaming.streamDecontaminateIngest(
      spark.readStream.schema(schema).parquet(in),
      "id", "embedding", ev, "eid", "evec", cents, "cent_id", "cvec",
      nProbes = 2, tau = 0.9, ckpt) { (clean, flagged, _) =>
      cleanRows ++= clean.select("id").collect().map(_.getLong(0))
      flaggedRows ++= flagged.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      ()
    }
    // batch 0: id 1 leaks e100 verbatim, id 2 is orthogonal-clean
    Seq((1L, Seq(0.9f, 0.1f, 0f, 0f)), (2L, Seq(0f, 0f, 1f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    // batch 1: id 3 leaks e101, id 4 is near-but-below-tau
    Seq((3L, Seq(0f, 1f, 0f, 0f)), (4L, Seq(0.6f, 0.8f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    assert(cleanRows.sorted == Seq(2L, 4L), cleanRows)
    assert(flaggedRows.map(f => (f._1, f._2)).sorted == Seq((1L, 100L), (3L, 101L)),
      flaggedRows)
    assert(flaggedRows.forall(_._3 >= 0.9), flaggedRows)
    // batch-twin: the stream's verdicts equal the batch operator's on
    // the full backlog
    val all = Seq((1L, Seq(0.9f, 0.1f, 0f, 0f)), (2L, Seq(0f, 0f, 1f, 0f)),
      (3L, Seq(0f, 1f, 0f, 0f)), (4L, Seq(0.6f, 0.8f, 0f, 0f)))
      .toDF("id", "embedding")
    val batchFlag = graft.operators.Mining.semanticDecontaminate(
        all, "id", "embedding", ev, "eid", "evec",
        cents, "cent_id", "cvec", 2, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batchFlag == flaggedRows.toSet, s"$batchFlag vs $flaggedRows")
  }

  test("adviseMaintenance names each debt; autoMaintain heals the table to empty advice") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_am_in_").toString
    val table = Files.createTempDirectory("graft_am_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_am_ckpt_").toString + "/c"
    // stale centroids on x/y, data on z/w: every row misfiles into cell
    // 0 → deep drift (stored-assignment silhouette < 0)
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    // four micro-batches into one cell = subdir debt past the threshold
    Seq((1L, Seq(0f, 0f, 9f, 1f)), (2L, Seq(0f, 0f, 9f, 2f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    for (i <- 3 to 5) {
      Seq((i.toLong, Seq(0f, 0f, i.toFloat, 9f))).toDF("id", "embedding")
        .coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
    }
    q.stop()
    // tombstone 2 of 5 rows = 40% dead weight
    Streaming.deleteMaintained(spark, table, Seq(2L, 4L).toDF("id"), "id")
    def advice(): Map[String, String] =
      Streaming.adviseMaintenance(spark, table, cents, "cent_id", "cvec",
        maxSubdirsPerCell = 2L, maxDeadFraction = 0.2, silhouetteFloor = 0.1)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val a = advice()
    assert(a.keySet == Set("compact", "vacuum", "retrain"), a)
    assert(a("compact").contains("subdirs") && a("vacuum").contains("tombstones"),
      a)
    val ran = Streaming.autoMaintain(spark, table, cents, "cent_id", "cvec",
      maxSubdirsPerCell = 2L, maxDeadFraction = 0.2, silhouetteFloor = 0.1)
    assert(ran == Seq("compact", "vacuum", "retrain"), ran)
    // healed: retrained geometry files rows at their argmax, tombstones
    // are physical and retired, subdirs folded — advice is empty
    assert(advice().isEmpty, advice())
    val ids = spark.read.parquet(table).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 5L), ids)
    // a second pass is a no-op
    assert(Streaming.autoMaintain(spark, table, cents, "cent_id", "cvec",
      maxSubdirsPerCell = 2L, maxDeadFraction = 0.2,
      silhouetteFloor = 0.1).isEmpty)
  }

  test("fsckMaintained: healthy table audits all-zero; each injected fault is counted by its check") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_fk_in_").toString
    val table = Files.createTempDirectory("graft_fk_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_fk_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f)), (2L, Seq(1f, 9f, 0f, 0f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()
    def fsck(): Map[String, (Long, String)] =
      Streaming.fsckMaintained(spark, table, cents, "cent_id", "cvec")
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val clean = fsck()
    assert(clean.size == 6 && clean.values.forall(_._1 == 0L), clean)
    // fault 1: a duplicate copy of id 1 smuggled into cell 0's batch dir
    val dupDir = s"$table/cell_id=0/__b=0"
    spark.read.parquet(dupDir).limit(1)
      .write.mode("append").parquet(dupDir)
    assert(fsck()("duplicate_ids")._1 == 1L, fsck())
    // fault 2: a tombstone for an id that was never stored
    Streaming.deleteMaintained(spark, table, Seq(99L).toDF("id"), "id")
    assert(fsck()("dead_tombstones")._1 == 1L, fsck())
    // fault 3: rebalance debris at an uncommitted maintenance address
    spark.read.parquet(dupDir).limit(1)
      .write.mode("overwrite").parquet(s"$table/cell_id=0/__b=-8")
    val f3 = fsck()
    assert(f3("uncommitted_maintenance")._1 == 1L &&
      f3("uncommitted_maintenance")._2.contains("-8"), f3)
    // fault 4: stale geometry — swap the committed centroids so every
    // row misfiles (write v_1 with crossed axes + commit marker)
    val vdir = s"$table/_centroids/v_1"
    Seq((0L, Seq(0f, 0f, 9f, 0f)), (1L, Seq(0f, 0f, 0f, 9f)))
      .toDF("cent_id", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(vdir)
    new java.io.File(vdir, "_GRAFT_COMMIT").createNewFile()
    // both rows are orthogonal to both new centroids → cosine ties →
    // argmax falls to cent 0, so exactly the cell-1 row misfiles
    assert(fsck()("misfiled_rows")._1 == 1L, fsck())
  }

  test("vacuumDeletes and deleteMaintainedWhere survive a fully-emptied table (no cell dirs left)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_emp_in_").toString
    val table = Files.createTempDirectory("graft_emp_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_emp_ckpt_").toString + "/c"
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f))).toDF("cent_id", "cvec")
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 1, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    Seq((1L, Seq(9f, 1f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    Seq((2L, Seq(9f, 2f, 0f, 0f))).toDF("id", "embedding")
      .coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    // tombstone EVERY row, then put the table in the emptied state the
    // dir-exists-iff-data discipline produces (compaction purging a
    // fully-tombstoned cell, or ingest-replay rollback of the only
    // batch): no cell_id= dirs, only underscore sidecars — a bare
    // parquet read of the table root would throw 'unable to infer
    // schema'
    Streaming.deleteMaintained(spark, table, Seq(1L, 2L).toDF("id"), "id")
    val tblDir = new java.io.File(table)
    tblDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
      .foreach { d =>
        val fs = new org.apache.hadoop.fs.Path(table)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(d.getAbsolutePath), true): Unit
      }
    val cellDirs = tblDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell_id="))
    assert(cellDirs.isEmpty, cellDirs.map(_.getName).toSeq)
    // no live rows ⇒ every tombstone is dead: vacuum drops the sidecar
    val (kept, dropped) = Streaming.vacuumDeletes(spark, table)
    assert((kept, dropped) == ((0L, 2L)), s"kept=$kept dropped=$dropped")
    assert(!new java.io.File(s"$table/_deletes").exists(),
      "fully-dead sidecar must be dropped")
    // and a predicate delete has nothing to match — 0, not a throw
    assert(Streaming.deleteMaintainedWhere(spark, table, lit(true)) == 0L)
    // idempotent re-vacuum on the now-sidecar-less table
    assert(Streaming.vacuumDeletes(spark, table) == ((0L, 0L)))
  }

  test("maintained serving: keyset pagination chains to one big top-k; predicate delete purges by metadata") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_pg_in_").toString
    val table = Files.createTempDirectory("graft_pg_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_pg_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val schema = org.apache.spark.sql.types.StructType(maintSchema.fields :+
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType))
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(schema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 1000000L)
    (1 to 12).map(i =>
      (i.toLong, Seq(9f, i * 0.1f, 0f, 0f), if (i % 3 == 0) "de" else "en"))
      .toDF("id", "embedding", "lang")
      .coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    q.stop()

    val qv = Seq(9f, 0.5f, 0f, 0f)
    def page(after: Option[(Double, Long)], k: Int) =
      Streaming.searchMaintained(spark, table, cents, "cent_id", "cvec",
        qv, nProbes = 2, k = k, after = after)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val all = page(None, 12)
    assert(all.size == 12)
    // three 4-row pages, each cursored from the previous page's last
    // row, must replay the one big ranking exactly
    val p1 = page(None, 4)
    val p2 = page(Some((p1.last._2, p1.last._1)), 4)
    val p3 = page(Some((p2.last._2, p2.last._1)), 4)
    assert(p1 ++ p2 ++ p3 == all, s"pages ${p1 ++ p2 ++ p3} vs $all")
    // and past the end: an empty page, not an error
    assert(page(Some((p3.last._2, p3.last._1)), 4).size == all.size - 12)

    // predicate purge: everything with lang='de' (ids 3, 6, 9, 12)
    val n = Streaming.deleteMaintainedWhere(spark, table, col("lang") === "de")
    assert(n == 4L, s"expected 4 tombstones, got $n")
    val after = page(None, 12).map(_._1).toSet
    assert(after == Set(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L), after)
    // idempotent: tombstones are merge-on-read, so the matching rows
    // are still physically in the table and the re-run re-resolves the
    // same 4 ids — the read-side distinct keeps them a single tombstone
    assert(Streaming.deleteMaintainedWhere(spark, table,
      col("lang") === "de") == 4L)
    assert(page(None, 12).map(_._1).toSet == after)
  }

  test("maxChildrenPerPass bounds each split generation and repeated checks converge geometrically") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cap_in_").toString
    val table = Files.createTempDirectory("graft_cap_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_cap_ckpt_").toString + "/c"
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f))).toDF("cent_id", "cvec")
    val maint = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
    val q = Streaming.streamInsertIndexedMaintained(
      spark.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 2L, maxChildrenPerPass = 2,
      onMaintain = (b, n) => maint += ((b, n)))
    // 8 rows in one cell: uncapped, ceil(8/2) = 4 children in one pass;
    // capped at 2, each generation splits a hot cell two ways and the
    // NEXT check catches any still-hot child
    (1 to 8).map(i =>
      (i.toLong, Seq(9f, if (i % 2 == 0) 1f else -1f,
        if (i % 4 < 2) 1f else -1f, i * 0.01f)))
      .toDF("id", "embedding").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    def centCount(): Long =
      Streaming.maintainedCentroids(spark, table, cents).count()
    def maxCellSize(): Long = spark.read.parquet(table)
      .groupBy(col("cell_id")).count()
      .agg(max(col("count"))).head().getLong(0)
    var rounds = 0
    var prevCents = centCount()
    while (maxCellSize() > 2L && rounds < 12) {
      // an empty trailing batch carries the next maintenance check
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], maintSchema)
        .coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      val c = centCount()
      // one generation adds at most (cap − 1) centroids per touched cell
      assert(c - prevCents <= maint.lastOption.map(_._2.toLong * 1).getOrElse(1L),
        s"generation grew $prevCents -> $c with ${maint.lastOption} touched")
      prevCents = c
      rounds += 1
    }
    q.stop()
    assert(maxCellSize() <= 2L, s"did not converge in $rounds rounds")
    assert(maint.length >= 2, s"cap must force multiple generations: $maint")
    val ids = spark.read.parquet(table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (1L to 8L), ids)
  }

  test("compactMaintained folds committed subdirs, spares the replayable tail, recovers from crashes, and the ingest guard holds") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cmp_in_").toString
    val table = Files.createTempDirectory("graft_cmp_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_cmp_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val F0 = -(1L << 40)
    val crash = new java.util.concurrent.atomic.AtomicReference[String](null)
    def start(batchHook: String => Unit = _ => ()) =
      Streaming.streamInsertIndexedMaintained(
        spark.readStream.schema(maintSchema).parquet(in),
        dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
        maxCell = 1000000L, maintHook = batchHook)
    def feed(k: Long): Unit =
      Seq((k * 1000 + 1, Seq(9f, 1f, 0f, 0f)), (k * 1000 + 2, Seq(0f, 9f, 1f, 0f)))
        .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    def subdirsOf(cell: Long): Set[Long] = {
      val d = new java.io.File(s"$table/cell_id=$cell")
      if (!d.exists()) Set.empty
      else d.listFiles().filter(_.getName.startsWith("__b="))
        .map(_.getName.stripPrefix("__b=").toLong).toSet
    }
    def idsNow(): Seq[Long] = spark.read.parquet(table)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    def wantIds(ks: Seq[Long]): Seq[Long] =
      ks.flatMap(k => Seq(k * 1000 + 1, k * 1000 + 2)).sorted

    // three clean batches, stream stopped: fold {0, 1}, spare max (2)
    val q1 = start()
    feed(0); q1.processAllAvailable()
    feed(1); q1.processAllAvailable()
    feed(2); q1.processAllAvailable()
    q1.stop()
    val n1 = Streaming.compactMaintained(spark, table)
    assert(n1 == 4, s"folded $n1 subdirs") // {0,1} × 2 cells
    assert(subdirsOf(0L) == Set(F0, 2L) && subdirsOf(1L) == Set(F0, 2L),
      (subdirsOf(0L), subdirsOf(1L)))
    assert(idsNow() == wantIds(0L to 2L), idsNow())

    // epoch chaining: batch 3, then the next run folds {F0, 2} into F0-1
    feed(3)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(Streaming.compactMaintained(spark, table) == 4)
    assert(subdirsOf(0L) == Set(F0 - 1, 3L), subdirsOf(0L))
    assert(idsNow() == wantIds(0L to 3L))

    // crash after fold append (intent, no commit): the ingest refuses to
    // start; a compact re-run rolls back then folds cleanly
    feed(4)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    crash.set("compact-appended")
    intercept[RuntimeException] {
      Streaming.compactMaintained(spark, table, hook = p =>
        if (p == crash.get) sys.error(s"injected crash at $p"))
    }
    feed(5)
    val qGuard = start()
    val guardEx = intercept[Exception] { qGuard.processAllAvailable() }
    qGuard.stop()
    assert(guardEx.getMessage.contains("unrecovered compaction") ||
      Option(guardEx.getCause).exists(_.getMessage.contains("unrecovered compaction")),
      guardEx.getMessage)
    assert(Streaming.compactMaintained(spark, table) == 4) // {F0-1, 3} × 2
    assert(subdirsOf(0L) == Set(F0 - 2, 4L), subdirsOf(0L))
    assert(idsNow() == wantIds(0L to 4L), "rollback must not lose or dup")

    // batch 5 now lands (the guard cleared), then crash after the commit
    // marker: re-run rolls FORWARD (sources deleted exactly once)
    val q4 = start(); q4.processAllAvailable(); q4.stop()
    crash.set("compact-committed")
    intercept[RuntimeException] {
      Streaming.compactMaintained(spark, table, hook = p =>
        if (p == crash.get) sys.error(s"injected crash at $p"))
    }
    crash.set(null)
    Streaming.compactMaintained(spark, table): Unit // recovery, then no-op or fold
    assert(idsNow() == wantIds(0L to 5L), "rollforward must not lose or dup")

    // compaction below a crashed INGEST tail: batch 6 dies post-append,
    // compact (spares __b=6), restart replays batch 6 — exactly-once
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    feed(6)
    val q5 = start(p =>
      if (p == "batch-appended" && crashOnce.getAndSet(false))
        sys.error("injected ingest crash"))
    intercept[Exception] { q5.processAllAvailable() }
    q5.stop()
    Streaming.compactMaintained(spark, table): Unit
    val q6 = start(); q6.processAllAvailable(); q6.stop()
    assert(idsNow() == wantIds(0L to 6L),
      "replayed tail after compaction must be exactly-once")
  }
}
