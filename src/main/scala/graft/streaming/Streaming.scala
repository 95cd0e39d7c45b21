package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.operators.Dedup
import graft.search.VectorStore

/** Open-session accumulator for `Streaming.sessionizeStream`. */
case class SessionState(startMs: Long, lastMs: Long, nEvents: Long)

/** O(1)-per-key streaming EWMA state: level, deviation, event count. */
case class EwmaKeyState(sq: Long, dq: Long, rn: Long)

/** O(1)-per-stratum streaming token-budget state: tokens spent so far. */
case class BudgetState(spent: Long)

/** Closed session emitted by `Streaming.sessionizeStream`. */
case class ClosedSession(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, n_events: Long)

/** Structured Streaming surface — the extension the reference lacks
  * entirely (its only "streams" are CUDA async streams and asyncio
  * request concurrency, SURVEY.md §2.2).
  */
object Streaming {

  /** Reserved `__b` address space for compaction folds: every fold
    * subdir lives at ≤ this value, disjoint from ingest batches (≥ 0)
    * and rebalance moves (−(n+1), bounded by live batch ids).
    */
  private[streaming] val FoldBase = -(1L << 40)

  /** Current SNAPSHOT PIN of a [[streamInsertIndexedMaintained]] table —
    * the largest ingest batch address present on disk (−1 on an empty
    * table). Listing-cost on the happy path. Pass the pin to the
    * serving faces' `asOf` to answer a whole serving session (a
    * paginated scroll, a query batch fanned over minutes) against ONE
    * consistent table version while ingest keeps appending.
    *
    * When maintenance has rewritten EVERY ingest-batch directory to a
    * negative address (a [[retrainMaintained]] by the pre-spared-tail
    * protocol, or a retrain whose spared tail was fully tombstoned) the
    * listing alone would say −1 — and a pin of −1 would hide every row
    * of a non-empty table. In that one window the pin falls back to
    * `max(__b0)` read from the data (parquet column-stats cheap): the
    * permanent row versions always know the true high-water mark.
    */
  def maintainedSnapshot(spark: org.apache.spark.sql.SparkSession,
                         tablePath: String): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return -1L
    val anyCells = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("cell_id="))
    val listed = anyCells
      .flatMap(d => fs.listStatus(d).map(_.getPath.getName)
        .filter(_.startsWith("__b="))
        .map(_.stripPrefix("__b=").toLong))
      .filter(_ >= 0L).maxOption
    listed.getOrElse {
      if (anyCells.isEmpty) -1L
      else {
        val t = spark.read.parquet(tablePath)
        if (!t.columns.contains("__b0")) -1L
        else {
          val r = t.agg(max(col("__b0").cast("long"))).head
          if (r.isNullAt(0)) -1L else r.getLong(0)
        }
      }
    }
  }

  /** Visibility predicate for an `asOf` snapshot pin: a row is visible
    * iff its PERMANENT ingest-batch version `__b0` (stamped at ingest,
    * preserved verbatim through rebalance moves and compaction folds —
    * unlike the `__b` directory address those rewrite) is ≤ the pin. So
    * a pin stays correct even when maintenance reshapes the table after
    * the pin was taken: the moved/folded copy of a pre-pin row is still
    * visible, a post-pin row swept into a fold is still hidden.
    *
    * SEMANTICS — snapshot isolation for INSERTS only: tombstones always
    * read CURRENT, so a delete issued after the pin still hides its row
    * from pinned reads (right-to-erasure outranks repeatable reads —
    * the one place a "stale" answer would be a liability, not a
    * consistency feature).
    */
  private[graft] def visibleAsOf(asOf: Option[Long]): Column = asOf match {
    case None => lit(true)
    case Some(m) => col("__b0").cast("long") <= m
  }

  /** Tumbling-window count/sum per event type, with a watermark for state
    * eviction. The same plan runs in batch (watermark is a no-op) and
    * streaming (append-mode emission after the watermark passes) — tested
    * for agreement. At scale, state is bounded by
    * (#windows in watermark horizon × #event types).
    */
  def tumblingAgg(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Tumbling-window QUANTILES via the mergeable KLL sketch
    * (`QuantileSketch.KllQuantilesAgg` through `functions.udaf`): the
    * continuous flavor of `q_quantile_sketch` — per-window latency/size
    * percentiles without ever sorting a window's rows. Streaming state
    * per window is one ≤ cap·log₂(n/cap)-item sketch buffer (not the
    * window's rows), merged incrementally across micro-batches; exact
    * while a window holds ≤ cap values, KLL-bounded beyond. The same
    * plan runs in batch (watermark no-op) — agreement-tested.
    * Returns (win_start, quantiles array aligned with `qs`).
    */
  def windowedQuantiles(events: DataFrame, valueCol: String,
                        windowDur: String, watermark: String,
                        qs: Seq[String], cap: Int = 4096): DataFrame = {
    val sketch = org.apache.spark.sql.functions.udaf(
      new graft.operators.QuantileSketch.KllQuantilesAgg(cap, qs),
      org.apache.spark.sql.Encoders.scalaDouble)
    events
      .filter(col(valueCol).isNotNull) // null would decode as 0.0 in the sketch
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(sketch(col(valueCol).cast("double")).as("quantiles"))
      .select(col("w.start").as("win_start"), col("quantiles"))
  }

  /** Tumbling-window TOP TERMS via the mergeable Misra-Gries sketch
    * (`HeavyHitters.MgTopAgg` through `functions.udaf`): the continuous
    * "what's trending" aggregation with per-window state of ≤ k
    * counters instead of the window's full term set — exact while a
    * window's vocabulary ≤ k, conservative residuals beyond (the sketch
    * contract). Batch/stream agreement-tested. Returns
    * (win_start, array of (term, count) structs, count desc).
    */
  def windowedTopTerms(events: DataFrame, termCol: String,
                       windowDur: String, watermark: String,
                       n: Int, k: Int = 4096): DataFrame = {
    val sketch = org.apache.spark.sql.functions.udaf(
      new graft.operators.HeavyHitters.MgTopAgg(k, n),
      org.apache.spark.sql.Encoders.STRING)
    events
      .filter(col(termCol).isNotNull) // a null key would NPE the count-tie sort
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(sketch(col(termCol)).as("top"))
      .select(col("w.start").as("win_start"), col("top"))
  }

  /** Tumbling-window count-min bucket table (`CountMin.sketch`'s
    * streaming twin, completing the four-sketch streaming family):
    * per open window the aggregation state is d·w bucket counts
    * REGARDLESS of the term vocabulary — the property that lets a
    * continuous point-frequency service run against an unbounded term
    * universe. Emits (win_start, j, b, c); point estimates are a lookup
    * join against the sink, exactly as in `CountMin.pointEstimates`,
    * and windows merge by plain bucket addition (count-min is linear).
    */
  def windowedCountMin(events: DataFrame, termCol: String,
                       windowDur: String, watermark: String,
                       d: Int = 4, w: Int = 16): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2; got d=$d, w=$w")
    events
      .filter(col(termCol).isNotNull) // null would hash to null buckets
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(array((0 until d).map(j =>
        struct(lit(j).as("j"),
          pmod(graft.operators.Dedup.hash60(
            concat(lit(j.toString), lit(":"), col(termCol))),
            lit(w.toLong)).as("b"))): _*)).as("__jb"))
      .groupBy(window(col("ts"), windowDur).as("win"),
        col("__jb.j").as("j"), col("__jb.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("win.start").as("win_start"), col("j"), col("b"), col("c"))
  }

  /** Per-window two-sample KS drift against a STATIC reference — the
    * streaming twin of [[graft.operators.Mining.ksDrift]], the alarm a
    * live ingest pipeline actually wants ("did this hour's doc-length
    * distribution drift from the accepted corpus?"). Values quantize
    * into the caller's `bins` (ascending upper-inclusive boundaries;
    * one overflow bin above the last — KS is then exact for the
    * QUANTIZED metric, the same statistic batch `ksDrift` yields on the
    * binned values), the reference's bin CDF is computed ONCE and
    * embedded as literals, and each window aggregates just B bin counts
    * — state per open window is B longs, regardless of row volume. The
    * D maximum unrolls over the B bins as a literal `greatest` chain in
    * DECIMAL(38,0) cross-products (the batch twin's exactness), so the
    * whole computation stays in-plan — no second aggregation, no
    * foreachBatch. Returns (win_start, n_a, n_b, ks, ks_stat, reject)
    * per closed window.
    */
  def windowedKsDrift(events: DataFrame, valueCol: String,
                      windowDur: String, watermark: String,
                      reference: DataFrame, bins: Seq[Long]): DataFrame = {
    require(bins.nonEmpty && bins.size <= 256,
      s"need 1..256 bin boundaries, got ${bins.size}")
    require(bins == bins.sorted && bins.distinct.size == bins.size,
      "bin boundaries must be strictly ascending")
    val b = bins.size + 1
    def binOf(c: Column): Column =
      bins.zipWithIndex.foldRight(lit(b - 1): Column) { case ((up, i), acc) =>
        when(c <= up, i).otherwise(acc)
      }
    val refCounts: Array[Long] = {
      val m = reference.select(binOf(col(valueCol).cast("long")).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (0 until b).map(i => m.getOrElse(i, 0L)).toArray
    }
    val nB = refCounts.sum
    require(nB > 0, "reference must be non-empty")
    val cumB: Array[Long] = refCounts.scanLeft(0L)(_ + _).tail
    val binned = events
      .filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermark)
      .withColumn("__b", binOf(col(valueCol).cast("long")))
    val counted = binned
      .groupBy(window(col("ts"), windowDur).as("win"))
      .agg(count(lit(1)).as("n_a"),
        (0 until b).map(i =>
          sum((col("__b") === i).cast("long")).as(s"__c$i")): _*)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val cumA: Seq[Column] = (0 until b).map(i =>
      (0 to i).map(j => col(s"__c$j")).reduce(_ + _))
    val dTerms = (0 until b).map(i =>
      abs(dec(cumA(i)) * dec(lit(nB)) - dec(lit(cumB(i))) * dec(col("n_a"))))
    val d = if (dTerms.size == 1) dTerms.head else greatest(dTerms: _*)
    val ks = round(d.cast("double") /
      (col("n_a").cast("double") * lit(nB.toDouble)), 6) + lit(0.0)
    val stat = round(ks * sqrt(col("n_a").cast("double") * lit(nB.toDouble) /
      (col("n_a").cast("double") + lit(nB.toDouble))), 6) + lit(0.0)
    counted.select(col("win.start").as("win_start"), col("n_a"),
      lit(nB).as("n_b"), ks.as("ks"), stat.as("ks_stat"),
      (stat > 1.358).cast("int").as("reject"))
  }

  /** Per-window POPULATION STABILITY INDEX against a static reference
    * — [[windowedKsDrift]]'s integral-shift sibling (same bins, same
    * B-longs-per-window state): the reference's Laplace-smoothed bin
    * shares embed as literals, each window's terms unroll in-plan as a
    * literal sum over the B bins with per-term integer-NANO
    * quantization (the [[graft.operators.Mining.psiDrift]] discipline —
    * Spark SQL's `log` is the same JVM Math.log the batch twin calls,
    * so stream ≡ batch exactly). Returns (win_start, n_a, n_b, psi,
    * band) per closed window.
    */
  def windowedPsiDrift(events: DataFrame, valueCol: String,
                       windowDur: String, watermark: String,
                       reference: DataFrame, bins: Seq[Long]): DataFrame = {
    require(bins.nonEmpty && bins.size <= 256,
      s"need 1..256 bin boundaries, got ${bins.size}")
    require(bins == bins.sorted && bins.distinct.size == bins.size,
      "bin boundaries must be strictly ascending")
    val b = bins.size + 1
    def binOf(c: Column): Column =
      bins.zipWithIndex.foldRight(lit(b - 1): Column) { case ((up, i), acc) =>
        when(c <= up, i).otherwise(acc)
      }
    val refCounts: Array[Long] = {
      val m = reference.select(binOf(col(valueCol).cast("long")).as("__b"))
        .groupBy(col("__b")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (0 until b).map(i => m.getOrElse(i, 0L)).toArray
    }
    val nB = refCounts.sum
    require(nB > 0, "reference must be non-empty")
    val counted = events
      .filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermark)
      .withColumn("__b", binOf(col(valueCol).cast("long")))
      .groupBy(window(col("ts"), windowDur).as("win"))
      .agg(count(lit(1)).as("n_a"),
        (0 until b).map(i =>
          sum((col("__b") === i).cast("long")).as(s"__c$i")): _*)
    val nA = col("n_a").cast("double") + lit(b.toDouble)
    val terms: Seq[Column] = (0 until b).map { i =>
      val pa = (col(s"__c$i").cast("double") + lit(1.0)) / nA
      val pb = lit((refCounts(i) + 1.0) / (nB + b))
      round((pa - pb) * log(pa / pb) * 1e9, 0).cast("long")
    }
    val psi = round(terms.reduce(_ + _).cast("double") / 1e9, 6) + lit(0.0)
    counted.select(col("win.start").as("win_start"), col("n_a"),
      lit(nB).as("n_b"), psi.as("psi"),
      when(psi < 0.1, "stable").when(psi < 0.25, "moderate")
        .otherwise("shifted").as("band"))
  }

  /** Tumbling-window DISTINCT COUNT via the KMV sketch
    * (`DistinctSketch.KmvAgg` through `functions.udaf`): continuous
    * per-window cardinality with ≤ k longs of state per window instead
    * of the window's full distinct set. The k-min-set is order- and
    * partitioning-independent, so streaming and batch agree EXACTLY at
    * any scale (not just below capacity — the property the other
    * sketches can't offer); counts are exact below k, ~1/√(k−2)
    * relative error beyond. The read-off replicates
    * `DistinctSketch.estimate` as columns so the whole plan stays in
    * the stream. Returns (win_start, n_distinct, is_exact).
    */
  def windowedDistinct(events: DataFrame, valueCol: String,
                       windowDur: String, watermark: String,
                       k: Int = 8192): DataFrame = {
    val sketch = org.apache.spark.sql.functions.udaf(
      new graft.operators.DistinctSketch.KmvAgg(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val m = col("__minima")
    events
      .filter(col(valueCol).isNotNull) // null hashes to null → would decode as 0L
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(sketch(Dedup.hash60(col(valueCol).cast("string"))).as("__minima"))
      .select(col("w.start").as("win_start"),
        when(size(m) < k, size(m).cast("long"))
          .otherwise(round(
            lit((k - 1).toDouble * (1L << 60).toDouble) /
              greatest(element_at(m, -1), lit(1L)).cast("double"), 0)
            .cast("long")).as("n_distinct"),
        (size(m) < k).as("is_exact"))
  }

  /** Tumbling-window content digest — the streaming twin of
    * `Layout.contentDigest`: per window, row count + XOR + mod-2^60 sum
    * of the rows' 60-bit content hashes (DECIMAL(38,0) accumulation, so
    * the fold never overflows). All three reductions are commutative
    * with bounded state, so the plan is a plain streaming aggregate, and
    * a replayed/batch run over the same window produces the IDENTICAL
    * digest row — the continuous integrity check for an ingest pipeline:
    * compare the stream's per-window digests against the landed table's
    * and a dropped/duplicated/corrupted batch surfaces as one mismatched
    * row. Returns (win_start, n_rows, digest_xor, digest_sum).
    */
  def windowedDigest(events: DataFrame, valueCol: String,
                     windowDur: String, watermark: String): DataFrame =
    events
      .filter(col(valueCol).isNotNull)
      .withWatermark("ts", watermark)
      .select(col("ts"),
        Dedup.hash60(col(valueCol).cast("string")).as("__h"))
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("digest_xor"),
        pmod(sum(col("__h").cast("decimal(38,0)")),
          lit(1152921504606846976L)).cast("long").as("digest_sum"))
      .select(col("w.start").as("win_start"), col("n_rows"),
        col("digest_xor"), col("digest_sum"))

  /** Tumbling-window data-quality expectations — the streaming twin of
    * `operators/Validation.validate` (row-local checks only: uniqueness
    * needs cross-window state and belongs to the batch audit): per
    * window, every check's violation count folds into the ONE streaming
    * aggregate, so a 50-check suite monitors an ingest stream for the
    * cost of one pass. Returns one (win_start, check, column,
    * n_violations, passed) row per window × check — the live feed a
    * data-quality dashboard alerts on; batch replay produces identical
    * rows (agreement spec-tested).
    */
  def windowedValidation(events: DataFrame,
                         checks: Seq[graft.operators.Validation.Check],
                         windowDur: String, watermark: String): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val aggs = checks.map(ch =>
      count(when(ch.violation, 1)).as(s"${ch.name}:${ch.column}"))
    val perCheck = checks.map(ch => struct(
      lit(ch.name).as("check"), lit(ch.column).as("column"),
      col(s"`${ch.name}:${ch.column}`").as("n_violations")))
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("w.start").as("win_start"),
        explode(array(perCheck: _*)).as("r"))
      .select(col("win_start"), col("r.check").as("check"),
        col("r.column").as("column"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
  }

  /** Stream-stream inner join with an event-time range: pair each left
    * row with right rows of the same key whose time falls in
    * [leftTs − within, leftTs]. Both sides carry watermarks, so Spark
    * bounds the join state to the `within` + watermark horizon (without
    * the time constraint a stream-stream join would buffer both streams
    * forever). Column names must be disjoint apart from `key`.
    */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, within: String,
                 watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark).withColumnRenamed(key, "__rk")
    l.join(r,
      col(key) === col("__rk") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $within") &&
        col(rightTs) <= col(leftTs))
      .drop("__rk")
  }

  /** LEFT OUTER [[joinWithin]]: same key + event-time range, but a left
    * row with NO in-range right match is still emitted (right columns
    * null) once the WATERMARK passes its match horizon — the
    * "enrichment with timeout" shape (click ⋈ conversion: unconverted
    * clicks must surface, not vanish). The null-padded row cannot be
    * emitted before the watermark closes its window (a match might
    * still arrive), so outer results trail the watermark delay —
    * semantics spec-tested with a two-batch watermark advance.
    */
  def joinWithinOuter(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String, within: String,
                      watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
      .withColumnRenamed(key, "__rk")
    l.join(r,
      col(key) === col("__rk") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $within") &&
        col(rightTs) <= col(leftTs),
      "left_outer")
      .drop("__rk")
  }

  /** Continuous exact dedup: drop rows whose `keyCols` were already seen,
    * keeping state only within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state is evicted once the
    * watermark passes, so it stays bounded on unbounded streams; plain
    * `dropDuplicates` would grow state forever). The batch twin is
    * `Dedup.exactDedup` / `q_dedup_exact`.
    */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming sessionization with CUSTOM state (`flatMapGroupsWithState`
    * + event-time timeout) — the batch twin is the q_sessionize
    * lag-window formulation; this is the continuous version that emits a
    * session record once its gap closes.
    *
    * State per user is O(1) (start/last/count of the one open session);
    * eviction is by event-time timeout at `last + gap`, driven by the
    * watermark — so total state is bounded by the number of users active
    * within the watermark horizon, regardless of stream length. Input
    * must have `user_id LONG` and `ts TIMESTAMP` columns.
    *
    * Semantics note: the open session at end-of-stream is emitted only
    * when the watermark passes its gap (or never, if the stream stops) —
    * the same contract as Spark's built-in session_window in append mode.
    * Late-but-within-gap events arriving in a LATER micro-batch merge
    * into the open session and extend its start backwards (cross-batch
    * delivery order is not time order); only events older than an
    * already-closed session can fragment — bounded by the watermark like
    * every append-mode sessionizer.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermark: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def fn(uid: Long, rows: Iterator[(Long, Timestamp)],
           state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(uid,
          new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents))
      } else {
        // Micro-batches deliver events OUT OF ORDER across batches (a
        // trigger can fire between two file commits of one logical
        // append), so an event may predate the open session's start.
        // Interval-merge semantics: the state session and the batch's
        // events all become gap-valid intervals, sorted by start and
        // bridged when the later one starts within gap of the earlier
        // one's end — start extends BACKWARDS for late events, not just
        // lastMs forwards. Every merged session except the newest closes
        // now (events later than the horizon may fragment sessions — the
        // standard append-mode tradeoff); the newest stays open in state.
        val sessions = scala.collection.mutable.ArrayBuffer.empty[SessionState]
        state.getOption.foreach(sessions += _)
        rows.foreach(r => sessions += SessionState(r._2.getTime, r._2.getTime, 1))
        if (sessions.isEmpty) Iterator.empty
        else {
          val merged = scala.collection.mutable.ArrayBuffer.empty[SessionState]
          sessions.sortBy(s => (s.startMs, s.lastMs)).foreach { s =>
            if (merged.nonEmpty && s.startMs - merged.last.lastMs <= gapMs) {
              val p = merged.last
              merged(merged.size - 1) = SessionState(p.startMs,
                math.max(p.lastMs, s.lastMs), p.nEvents + s.nEvents)
            } else merged += s
          }
          val open = merged.last
          state.update(open)
          state.setTimeoutTimestamp(open.lastMs + gapMs)
          merged.init.map(s => ClosedSession(uid,
            new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents)).iterator
        }
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** Continuous EWMA deviation-band anomaly detection — the streaming
    * twin of `operators/Ewma.anomalies`, same integer recurrence
    * (s=(3s+x)//4 with floor division), carried across micro-batches in
    * O(1) custom state per key ((sq, dq, rn) — three longs, independent
    * of stream length). Within a micro-batch a key's rows fold in
    * (event-time, id) order; agreement with the batch op holds whenever
    * cross-batch delivery preserves per-key event-time order (the replay
    * shape; an out-of-order arrival folds at its arrival position, the
    * standard streaming-EWMA tradeoff). No timeout: the per-key state is
    * three longs, so even 10⁹ keys hold ~24 GB across the cluster's
    * state store; add a ProcessingTimeTimeout eviction if the key space
    * is unbounded AND keys retire permanently.
    */
  def streamEwmaAnomalies(events: DataFrame, alphaDen: Int = 4, k: Int = 3,
                          warmup: Int = 4): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val a1 = (alphaDen - 1).toLong

    def fn(uid: Long, rows: Iterator[(Long, Long, Long, Long)],
           state: GroupState[EwmaKeyState]): Iterator[graft.operators.Ewma.Anomaly] = {
      val sorted = rows.toArray.sortBy(r => (r._3, r._2))
      val out = scala.collection.mutable.ArrayBuffer
        .empty[graft.operators.Ewma.Anomaly]
      var (sq, dq, rn, started) = state.getOption
        .map(s => (s.sq, s.dq, s.rn, true))
        .getOrElse((0L, 0L, 0L, false))
      sorted.foreach { case (_, id, _, xq) =>
        if (!started) { started = true; sq = xq; dq = 0L; rn = 1L }
        else {
          rn += 1
          val rq = math.abs(xq - sq)
          if (rn > warmup && dq > 0L && rq > k.toLong * dq)
            out += graft.operators.Ewma.Anomaly(uid, id, rn, xq, sq, dq, rq)
          sq = Math.floorDiv(a1 * sq + xq, alphaDen.toLong)
          dq = Math.floorDiv(a1 * dq + rq, alphaDen.toLong)
        }
      }
      if (started) state.update(EwmaKeyState(sq, dq, rn))
      out.iterator
    }

    events
      .select(col("user_id").cast("long").as("k"),
        col("event_id").cast("long").as("id"),
        unix_micros(col("ts").cast("timestamp")).as("tsu"),
        round(col("value") * 1e6, 0).cast("long").as("xq"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** Continuous token-budget admission — the streaming face of
    * `Sampling.tokenBudgetSample`: each stratum admits documents until
    * its token budget is spent, carrying ONE long of state per stratum
    * across micro-batches. A doc is admitted iff the stratum's running
    * spend is still under budget (≤1-doc overshoot, like the batch op).
    *
    * Semantics note: the batch op fills budgets in seeded-HASH order (a
    * reproducible global sample); a stream cannot — it admits in
    * (arrival-batch, hash, id) order, i.e. first-come-first-funded with
    * the batch op's hash order applied WITHIN each micro-batch. That is
    * the honest streaming contract (admission control), not a replayable
    * global sample; replaying the same batch sequence reproduces the
    * same admissions. Input columns: id LONG, stratum STRING, n_tokens
    * LONG.
    */
  def streamTokenBudget(docs: DataFrame, budgets: Map[String, Long],
                        defaultBudget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "budgets must be non-negative")

    def fn(stratum: String, rows: Iterator[(String, Long, Long, Long)],
           state: GroupState[BudgetState]): Iterator[(Long, String, Long)] = {
      val budget = budgets.getOrElse(stratum, defaultBudget)
      var spent = state.getOption.map(_.spent).getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
      rows.toArray.sortBy(r => (r._3, r._2)).foreach { case (_, id, _, n) =>
        if (spent < budget) { out += ((id, stratum, n)); spent += n }
      }
      state.update(BudgetState(spent))
      out.iterator
    }

    docs
      .select(col("stratum").cast("string").as("s"),
        col("id").cast("long").as("id"),
        Dedup.hash60(col("id").cast("string")).as("h"),
        col("n_tokens").cast("long").as("n"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF("id", "stratum", "n_tokens")
  }

  /** Continuous INDEXED vector ingest: `streamInsertDurable` composed
    * with the zero-shuffle IVF cell assignment (`Ann.ivfAssign` is a
    * pure per-row projection over in-literal centroids, so it adds no
    * state and no exchange to the stream). The sink partitions by
    * `cell_id`, so the on-disk table IS the IVF index: a probe reads
    * only the probed cells' directories (`Ann.readIvfCells` /
    * partition pruning), and the index grows continuously with
    * exactly-once semantics (file-sink `_spark_metadata` + offsets in
    * `checkpointPath`).
    */
  def streamInsertIndexed(stream: DataFrame, dim: Int, numShards: Int,
                          centroids: DataFrame, centIdCol: String,
                          centVecCol: String, tablePath: String,
                          checkpointPath: String): StreamingQuery = {
    import graft.operators.Ann
    Ann.ivfAssign(VectorStore.prepare(stream, dim, numShards),
        centroids, "id", "embedding", centIdCol, centVecCol)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", tablePath)
      .option("checkpointLocation", checkpointPath)
      .partitionBy("cell_id")
      .start()
  }

  /** [[streamInsertIndexed]] WITH index maintenance: continuous IVF
    * ingest that runs [[graft.operators.Ann.rebalanceIvf]]'s
    * deterministic split/merge policy against the growing table whenever
    * ingest skews its cells — the full continuous-ingest lifecycle
    * (SPFresh's insert+rebalance loop, Xu et al. SOSP'23) as ONE
    * streaming query, instead of an external cron job racing the writer.
    *
    * Layout: rows land under `cell_id=<c>/__b=<n>` — cell directories
    * (the IVF index: probes prune to probed cells, exactly like
    * [[graft.operators.Ann.readIvfCells]]) subdivided by a batch
    * address. The batch address is what makes foreachBatch's
    * at-least-once exactly-once WITHOUT the file-sink `_spark_metadata`
    * manifest (a static manifest cannot survive a rebalance moving files
    * between directories): ingest batch n writes only `__b=n` subdirs,
    * so a replayed batch deletes its own subdirs and re-appends.
    * Maintenance within batch n's invocation writes re-homed rows under
    * `__b=-(n+1)` (a disjoint address space) and commits through a
    * versioned centroid store:
    *
    *   1. re-homed rows of hot/tiny cells append under `__b=-(n+1)`;
    *   2. the post-rebalance centroid table writes to `_centroids/v_n`;
    *   3. a `_GRAFT_COMMIT` file (listing the source cells) lands inside
    *      `v_n` — THE commit point;
    *   4. the source cell directories are deleted.
    *
    * Crash recovery on replay (detected by the batch's `_attempts`
    * marker, so the recovery listings cost nothing on the happy path):
    * an uncommitted `v_n` rolls BACK (delete `v_n` and the `__b=-(n+1)`
    * subdirs — the sources are still intact), a committed one rolls
    * FORWARD (re-delete the listed source dirs, idempotent); then the
    * batch's own `__b=n` debris is deleted and the batch re-runs against
    * the latest COMMITTED centroids. Either way every input row lands
    * exactly once and the table's cells always match the committed
    * centroid table — the probe-correctness invariant. StreamingSpec
    * injects crashes at both windows plus after the batch append.
    *
    * Scale shape per batch: assignment is the zero-shuffle in-literal
    * projection; cell sizes are one footer-only count (gated to every
    * `checkEvery` batches); planning fetches rows ONLY for imbalanced
    * cells; moves touch only those cells' directories (healthy cell
    * dirs stay untouched bytes — spec-asserted by file listing).
    * Directory count grows one `__b` subdir per cell per batch;
    * [[compactMaintained]] is the offline small-file pass that folds
    * committed subdirs (sparing the replayable tail), the same
    * obligation every log-structured table format carries.
    *
    * `minCell` = 0 (default) disables dissolution — raise it only once
    * the index is warm, or early near-empty cells dissolve. Ids must be
    * integral (they ride the rebalance's Long-typed seed buffer; hash
    * string ids to longs first). `maxChildrenPerPass` (default 16)
    * bounds one pass's split fan-out so the re-home projection stays
    * codegen-sized under a grossly-hot surge; a still-hot child is the
    * next batch's check to split again (geometric convergence,
    * spec-pinned). `onMaintain(batchId, nTouched)` fires after each
    * committed rebalance. `maintHook` is a TEST SEAM, called at
    * "maint-appended" / "maint-committed" / "batch-appended".
    */
  def streamInsertIndexedMaintained(
      stream: DataFrame, dim: Int, numShards: Int,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      tablePath: String, checkpointPath: String,
      maxCell: Long, minCell: Long = 0L, checkEvery: Int = 1,
      maxChildrenPerPass: Int = 16,
      onMaintain: (Long, Int) => Unit = (_, _) => (),
      maintHook: String => Unit = _ => ()): StreamingQuery = {
    import graft.operators.Ann
    import org.apache.hadoop.fs.Path
    require(checkEvery >= 1, "checkEvery must be >= 1")
    // fail at construction, not hours later when the first hot cell
    // reaches the planner mid-stream
    require(maxChildrenPerPass >= 2,
      "maxChildrenPerPass must be >= 2 (a 1-child split is a rename)")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val idType = batch.schema("id").dataType
        require(idType == org.apache.spark.sql.types.LongType ||
          idType == org.apache.spark.sql.types.IntegerType,
          s"streamInsertIndexedMaintained needs integral ids, got $idType")
        val root = new Path(tablePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // one writer per table: acquire (or re-entrantly renew — the
        // heartbeat) the epoch-fenced lease. A second driver pointed at
        // this table refuses HERE, before touching any file; a zombie
        // driver that lost the lease is caught by the commit-point
        // fences below. The streaming writer never releases — the lease
        // goes stale `graft.maintained.leaseMs` after the last batch,
        // which is the intended hand-off point for a replacement.
        val lease = MaintainedLock.acquire(fs, root,
          MaintainedLock.ownerOf(spark), MaintainedLock.staleMsOf(spark))
        // a crashed [[compactMaintained]] leaves fold rows beside their
        // sources — ingesting on top would count duplicates into
        // maintenance sizes; refuse until the compactor re-runs recovery
        val compDir = new Path(root, "_compactions")
        if (fs.exists(compDir) &&
          fs.listStatus(compDir).exists(_.getPath.getName.endsWith(".intent")))
          sys.error(s"unrecovered compaction at $tablePath: re-run " +
            "compactMaintained before resuming ingest")
        // same refusal for a crashed retrain: its debris rows would
        // double-count into maintenance sizes, and a fresh batch id
        // could collide with its maintenance address
        val retrDir = new Path(root, "_retrain")
        if (fs.exists(retrDir) &&
          fs.listStatus(retrDir).exists(_.getPath.getName.endsWith(".intent")))
          sys.error(s"unrecovered retrain at $tablePath: re-run " +
            "retrainMaintained before resuming ingest")
        val attempts = new Path(root, "_attempts")
        val attempt = new Path(attempts, s"a_$batchId")
        val replay = fs.exists(attempt)
        if (!replay) {
          fs.mkdirs(attempts)
          fs.create(attempt, true).close()
        }
        // this batch firing at all means every earlier batch committed;
        // dead markers are pruned so the marker set stays O(1)
        fs.listStatus(attempts).map(_.getPath)
          .filter(p => p.getName.stripPrefix("a_").toLong < batchId)
          .foreach(p => fs.delete(p, false): Unit)

        def cellDirs(): Seq[Path] =
          if (!fs.exists(root)) Seq.empty
          else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
            .filter(_.getName.startsWith("cell_id=")).toSeq
        def deleteSubdirs(b: Long): Unit = cellDirs().foreach { d =>
          val p = new Path(d, s"__b=$b")
          if (fs.exists(p)) {
            fs.delete(p, true): Unit
            // a cell directory exists iff it holds data — an emptied one
            // must go, or the next footer count reads a file-less table
            if (fs.listStatus(d).isEmpty) fs.delete(d, true): Unit
          }
        }
        val vDir = new Path(new Path(root, "_centroids"), s"v_$batchId")
        val commitFile = new Path(vDir, "_GRAFT_COMMIT")
        if (replay) {
          if (fs.exists(commitFile)) {
            // maintenance committed: roll FORWARD — finish the source
            // deletes (idempotent), keep the re-homed rows + centroids
            val in = fs.open(commitFile)
            val srcs =
              try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
              finally in.close()
            // rebalance markers list bare cell ids; a retrain marker
            // (same version line — its v can equal a later batch id)
            // lists relative paths. Both roll forward as path deletes.
            srcs.filter(_.nonEmpty).foreach { c =>
              val p = new Path(root,
                if (c.contains("=") || c.contains("/")) c else s"cell_id=$c")
              if (fs.exists(p)) fs.delete(p, true): Unit
            }
          } else {
            // uncommitted: roll BACK — sources are intact, drop the
            // centroid draft and any re-homed debris
            if (fs.exists(vDir)) fs.delete(vDir, true): Unit
            deleteSubdirs(-(batchId + 1))
          }
          deleteSubdirs(batchId) // the batch's own dead append
        }

        var cents = maintainedCentroids(spark, tablePath, centroids)

        // at most ONE rebalance generation per batch id: a committed v_n
        // means this batch's maintenance already ran (we are in a replay
        // after a later crash) — re-running would reuse the __b=-(n+1)
        // address and overwrite the committed centroid version, so a
        // crash in the second pass could delete the first pass's
        // committed rows or keep its own debris; residual imbalance is
        // the NEXT batch's check to catch
        if (batchId % checkEvery == 0 && cellDirs().nonEmpty &&
            !fs.exists(commitFile)) {
          // footer-only: count over the partition column reads no data
          val sizes: Map[Long, Long] = spark.read.parquet(tablePath)
            .groupBy(col("cell_id").cast("long").as("c"))
            .agg(count(lit(1)).as("n"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val dec = Ann.planIvfRebalance(cents, sizes,
            cs => graft.sources.Layout
              .readPartitions(spark, tablePath, "cell_id", cs)
              .withColumn("cell_id", col("cell_id").cast("long")),
            "id", "embedding", centIdCol, centVecCol, maxCell, minCell,
            maxChildrenPerPass)
          if (!dec.isNoop) {
            val touched = dec.touchedCells
            val moved = graft.sources.Layout
              .readPartitions(spark, tablePath, "cell_id", touched)
              .withColumn("cell_id", col("cell_id").cast("long"))
            val dataCols = moved.columns
              .filter(c => c != "cell_id" && c != "__b").map(col)
            val rehomed = moved
              .withColumn("cell_id", dec.rehomeColumn("embedding"))
              .select(dataCols :+ col("cell_id"): _*)
              .withColumn("__b", lit(-(batchId + 1)))
              .localCheckpoint(true) // read must finish before dirs change
            rehomed.write.mode("append")
              .partitionBy("cell_id", "__b").parquet(tablePath)
            maintHook("maint-appended")
            dec.centroidsNew(spark).repartition(1)
              .write.mode("overwrite").parquet(vDir.toString)
            // the commit point must be ATOMIC: a half-written source list
            // would roll forward deleting only SOME sources, leaving the
            // rest duplicated beside their re-homed copies — write to a
            // temp name and rename (the one atomic filesystem commit)
            val commitTmp = new Path(vDir, "_GRAFT_COMMIT.tmp")
            val out = fs.create(commitTmp, true)
            try out.write(touched.mkString("", "\n", "\n").getBytes("UTF-8"))
            finally out.close()
            // THE FENCE: a zombie writer (lease lost to a replacement
            // driver) must abort BEFORE the rename — its appended
            // debris is the uncommitted-crash window replay rolls back
            MaintainedLock.check(fs, root, lease)
            require(fs.rename(commitTmp, commitFile),
              s"could not commit maintenance marker $commitFile")
            maintHook("maint-committed")
            touched.foreach { c =>
              fs.delete(new Path(root, s"cell_id=$c"), true): Unit
            }
            cents = dec.centroidsNew(spark)
            onMaintain(batchId, touched.length)
          }
        }

        // metadata columns ride along into the table (consistent across
        // batches — the usual table-schema contract) so the serving
        // faces can filter on them; reserved layout names would corrupt
        // the partition addressing, so they fail loudly here
        val keep = batch.columns.toSeq.filterNot(Set("id", "embedding"))
        val reserved = keep.filter(Set("shard", "cell_id", "__b", "__b0"))
        require(reserved.isEmpty,
          s"batch columns ${reserved.mkString(", ")} collide with reserved " +
            "maintained-table layout columns (shard, cell_id, __b, __b0)")
        // __b0 is the row's PERMANENT ingest-batch version: unlike the
        // __b directory address (rewritten by rebalance moves and
        // compaction folds), it rides as a data column through every
        // maintenance rewrite — snapshot (asOf) visibility reads it, so
        // a pin stays correct even when maintenance runs after the pin
        MaintainedLock.check(fs, root, lease) // fence the batch append too
        Ann.ivfAssign(VectorStore.prepare(batch, dim, numShards, keep),
            cents, "id", "embedding", centIdCol, centVecCol)
          .withColumn("__b0", lit(batchId))
          .withColumn("__b", lit(batchId))
          .write.mode("append").partitionBy("cell_id", "__b")
          .parquet(tablePath)
        maintHook("batch-appended")
        ()
      }
      .start()
  }

  /** Latest COMMITTED centroid table of a
    * [[streamInsertIndexedMaintained]] table — the centroid set probes
    * must use. Falls back to `fallback` before the first rebalance.
    * Centroid versions accumulate (each is index-structure-sized, a few
    * KB); prune superseded `v_*` dirs out-of-band once no reader can
    * still hold them — never the latest committed one.
    */
  def maintainedCentroids(spark: org.apache.spark.sql.SparkSession,
                          tablePath: String, fallback: DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val centsRoot = new Path(new Path(tablePath), "_centroids")
    val fs = centsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(centsRoot)) fallback
    else fs.listStatus(centsRoot).map(_.getPath)
      .filter(p => p.getName.startsWith("v_") &&
        fs.exists(new Path(p, "_GRAFT_COMMIT")))
      .sortBy(_.getName.stripPrefix("v_").toLong)
      .lastOption
      .map(p => spark.read.parquet(p.toString))
      .getOrElse(fallback)
  }

  /** Merge-on-read DELETES for a [[streamInsertIndexedMaintained]]
    * table: ids append to an id-only tombstone sidecar (`_deletes/`,
    * an underscore directory the table read never sees).
    * [[searchMaintained]] anti-joins the sidecar (broadcast — it holds
    * 8-byte ids, bounded by total delete volume), and
    * [[compactMaintained]] makes the deletes PHYSICAL for every row it
    * folds — the LSM discipline: tombstones become rewrites only at
    * compaction, never on the delete path (no table file is touched
    * here). Appending is idempotent by nature (a doubly-deleted id is
    * one id after the read-side distinct), so no batch addressing is
    * needed.
    *
    * SEMANTICS — terminal per id: the sidecar carries no ordering, so
    * re-inserting a previously deleted id leaves the new row hidden
    * too (rows can sit at re-homed/folded addresses that no longer
    * carry their ingest batch, so a cutoff-based rule cannot be
    * evaluated). The reference's store is append-only
    * (`coordinator/main.py:47-56` has no delete at all); use
    * `VectorStore.upsert` for replace-by-id workflows.
    */
  def deleteMaintained(spark: org.apache.spark.sql.SparkSession,
                       tablePath: String, ids: DataFrame,
                       idCol: String): Unit =
    MaintainedLock.withLease(spark,
        new org.apache.hadoop.fs.Path(tablePath)) { _ =>
      ids.select(col(idCol).cast("long").as("id")).distinct()
        .write.mode("append").parquet(s"$tablePath/_deletes")
    }

  /** Operational state report for a [[streamInsertIndexedMaintained]]
    * table — the `DESCRIBE INDEX` every runbook starts from, in one
    * call: per-cell (rows, batch subdirs, bytes) from parquet footers
    * and listings plus table-level rollups rendered as (metric, cell,
    * value) long-format rows —
    *  - `rows` / `subdirs` / `bytes` per cell (subdir count above 1 is
    *    COMPACTION DEBT: what [[compactMaintained]] would fold),
    *  - `tombstones` (−1 cell): sidecar id count awaiting
    *    [[vacuumDeletes]] / physical purge,
    *  - `centroid_version` (−1 cell): latest COMMITTED version, −1
    *    before the first rebalance,
    *  - `pending_compaction` (−1 cell): 1 if an unrecovered compaction
    *    intent blocks ingest.
    * Everything reads listings + footers — no data pages; cost is
    * index-structure-bounded, not corpus-bounded.
    */
  def describeMaintained(spark: org.apache.spark.sql.SparkSession,
                         tablePath: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no maintained table at $tablePath")
    val cellDirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("cell_id=")).toSeq
    val perCell: Seq[(String, Long, Long)] = cellDirs.flatMap { d =>
      val cell = d.getName.stripPrefix("cell_id=").toLong
      val subs = fs.listStatus(d).filter(_.isDirectory)
        .count(_.getPath.getName.startsWith("__b="))
      val bytes = fs.getContentSummary(d).getLength
      Seq(("subdirs", cell, subs.toLong), ("bytes", cell, bytes))
    }
    val rowsPerCell: Seq[(String, Long, Long)] =
      if (cellDirs.isEmpty) Seq.empty
      else spark.read.parquet(tablePath)
        .groupBy(col("cell_id").cast("long").as("c"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => ("rows", r.getLong(0), r.getLong(1))).toSeq
    val tomb = maintainedDeletes(spark, tablePath)
      .map(_.count()).getOrElse(0L)
    val centsRoot = new Path(root, "_centroids")
    val ver =
      if (!fs.exists(centsRoot)) -1L
      else fs.listStatus(centsRoot).map(_.getPath)
        .filter(p => p.getName.startsWith("v_") &&
          fs.exists(new Path(p, "_GRAFT_COMMIT")))
        .map(_.getName.stripPrefix("v_").toLong)
        .maxOption.getOrElse(-1L)
    val compDir = new Path(root, "_compactions")
    val pending =
      if (fs.exists(compDir) && fs.listStatus(compDir)
        .exists(_.getPath.getName.endsWith(".intent"))) 1L
      else 0L
    (perCell ++ rowsPerCell ++ Seq(
      ("tombstones", -1L, tomb),
      ("centroid_version", -1L, ver),
      ("pending_compaction", -1L, pending)))
      .toDF("metric", "cell", "value")
      .orderBy($"metric", $"cell")
  }

  /** FULL CENTROID RETRAIN of a [[streamInsertIndexedMaintained]] table
    * — the index REBUILD for when drift has gone past what incremental
    * split/merge rebalance can repair (the [[silhouetteMaintained]] /
    * [[recallMaintained]] escalation path): k-means over the live rows
    * ([[graft.operators.Ann.kmeansTrain]] — deterministic lowest-id
    * init, exact micro-unit means), then EVERY row re-homes to its new
    * cell. Tombstoned rows are purged in the rewrite (a rebuild is a
    * natural compaction point); the permanent `__b0` row versions ride
    * through, so snapshot pins stay valid across the rebuild.
    *
    * THE REPLAYABLE TAIL IS SPARED, exactly like [[compactMaintained]]:
    * rows of the largest ingest batch re-home to the new cells but KEEP
    * their directory address `__b=maxIngest`. If the stream had crashed
    * after appending that batch but before its checkpoint commit, the
    * resumed replay deletes its own `__b=maxIngest` subdirs (finding
    * precisely the re-homed copies) and re-appends — exactly-once holds
    * across a retrain-in-the-crash-window. For the same reason the
    * tombstone sidecar entries covering the spared tail SURVIVE the
    * rebuild (a replayed tail re-appends its deleted ids too); all
    * other tombstones become physical and retire. [[vacuumDeletes]]
    * drops the survivors once the stream has moved past the tail.
    *
    * Crash safety — the maintenance marker discipline: intent file
    * (`_retrain/r_<v>.intent`, recording the first new cell id) → kept
    * sidecar subset appends (a subset: no rollback needed) → re-homed
    * rows append (non-tail at the reserved maintenance address
    * `__b = −(v+1)`, tail at `__b=maxIngest`, all in cells ≥ newBase) →
    * centroid draft `_centroids/v_<v>` → ATOMIC commit (temp-write +
    * rename of `_GRAFT_COMMIT`, whose content lists the superseded cell
    * dirs and sidecar files as relative paths) → marker deletes →
    * intent retires. [[recoverRetrain]] rolls an uncommitted retrain
    * BACK (draft cells ≥ newBase + centroid draft deleted) and a
    * committed one FORWARD (marker deletes finish); the ingest REFUSES
    * to start over an unrecovered retrain, exactly as it does over an
    * unrecovered compaction. New cell ids start past the largest
    * existing id, so a replayed roll-forward delete can never touch a
    * rebuilt directory.
    *
    * A stopped-writer preamble additionally settles any crashed
    * IN-STREAM rebalance the resumed stream would have settled itself —
    * the latest committed version's source deletes finish, uncommitted
    * maintenance debris rolls back — so the rebuild's full-table read
    * never double-counts a row beside its re-homed copy.
    *
    * Version `v` = max(next ingest batch, next centroid version): the
    * numerically-latest committed version serves, and a later in-stream
    * rebalance at a higher batch id supersedes it — the one shared
    * version line. Run with the WRITER STOPPED (the compaction
    * discipline); run [[compactMaintained]] first if a crashed fold is
    * pending (this throws otherwise). Returns the committed version.
    *
    * Cost is declared: train + rebuild reads and rewrites the live
    * table — the full-pass price an index rebuild is, by definition.
    * `hook` is a TEST SEAM ("retrain-intent" / "retrain-appended" /
    * "retrain-committed").
    */
  /** Apply a retrain commit marker's roll-forward deletes — idempotent,
    * so recovery can re-run it after any crash. Lines are RELATIVE paths
    * under the table root: `cell_id=<c>` for superseded source cells,
    * `_deletes/<file>` for superseded tombstone-sidecar files (the kept
    * spared-tail subset was appended as a NEW file before the commit, so
    * deleting the listed old ones leaves exactly the subset). Legacy
    * markers (pre-spared-tail protocol) list bare cell ids and imply the
    * whole sidecar retires — but only when the caller KNOWS the marker
    * is a retrain's (`retireLegacySidecar`): an in-stream rebalance
    * marker is also bare ids and its roll-forward must never touch
    * tombstones.
    */
  private def applyRetrainCommit(fs: org.apache.hadoop.fs.FileSystem,
                                 root: org.apache.hadoop.fs.Path,
                                 lines: Seq[String],
                                 retireLegacySidecar: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val ls = lines.filter(_.nonEmpty)
    val legacy = ls.nonEmpty && ls.forall(_.forall(_.isDigit))
    ls.foreach { line =>
      val p = new Path(root, if (legacy) s"cell_id=$line" else line)
      if (fs.exists(p)) fs.delete(p, true): Unit
    }
    val dels = new Path(root, "_deletes")
    if (legacy && retireLegacySidecar) {
      if (fs.exists(dels)) fs.delete(dels, true): Unit
    } else if (fs.exists(dels) && !fs.listStatus(dels).exists { st =>
        val n = st.getPath.getName
        n.endsWith(".parquet") || n.startsWith("part-")
      }) {
      // no data files left (only _SUCCESS debris): a bare read of the
      // dir would throw 'unable to infer schema' — an empty sidecar IS
      // no sidecar
      fs.delete(dels, true): Unit
    }
  }

  /** Recovery of a crashed [[retrainMaintained]] — every pending intent
    * rolls its rebuild BACK (uncommitted: centroid draft + re-homed
    * draft cells deleted; the intent records the first new cell id, so
    * every draft directory is removable by name) or FORWARD (committed:
    * the marker's relative-path deletes finish). Idempotent; runs at
    * the top of every retrain, and [[autoMaintain]] runs it when advice
    * surfaces a pending intent — which blocks ALL ingest until
    * recovered, whether or not any drift metric trips.
    */
  def recoverRetrain(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String): Unit = {
    val rootP = new org.apache.hadoop.fs.Path(tablePath)
    MaintainedLock.withLease(spark, rootP) { _ =>
      recoverRetrainImpl(spark, tablePath)
    }
  }

  private def recoverRetrainImpl(spark: org.apache.spark.sql.SparkSession,
                                 tablePath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retrainDir = new Path(root, "_retrain")
    if (!fs.exists(retrainDir)) return
    def centsDir(v: Long) = new Path(new Path(root, "_centroids"), s"v_$v")
    def cellDirs(): Seq[Path] =
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("cell_id=")).toSeq
    fs.listStatus(retrainDir).map(_.getPath.getName)
      .filter(_.endsWith(".intent")).foreach { iname =>
        val v = iname.stripSuffix(".intent").stripPrefix("r_").toLong
        val ipath = new Path(retrainDir, iname)
        val commit = new Path(centsDir(v), "_GRAFT_COMMIT")
        if (fs.exists(commit)) {
          // committed: finish the marker's deletes (idempotent)
          val in = fs.open(commit)
          val srcs =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
            finally in.close()
          applyRetrainCommit(fs, root, srcs, retireLegacySidecar = true)
        } else {
          // uncommitted: sources intact — drop draft + re-homed debris
          if (fs.exists(centsDir(v))) fs.delete(centsDir(v), true): Unit
          val iin = fs.open(ipath)
          val icontent =
            try scala.io.Source.fromInputStream(iin, "UTF-8").getLines().toList
            finally iin.close()
          icontent.find(_.startsWith("newBase="))
            .map(_.stripPrefix("newBase=").toLong) match {
            case Some(nb) =>
              // every draft row landed in a NEW cell (ids >= newBase,
              // allocated past the old max): whole-dir deletes roll the
              // table back exactly, spared-tail copies included
              cellDirs()
                .filter(_.getName.stripPrefix("cell_id=").toLong >= nb)
                .foreach(d => fs.delete(d, true): Unit)
            case None =>
              // legacy intent (pre-spared-tail): draft rows live only
              // at the reserved maintenance address
              cellDirs().foreach { d =>
                val p = new Path(d, s"__b=${-(v + 1)}")
                if (fs.exists(p)) {
                  fs.delete(p, true): Unit
                  if (fs.listStatus(d).isEmpty) fs.delete(d, true): Unit
                }
              }
          }
        }
        fs.delete(ipath, false): Unit
      }
  }

  def retrainMaintained(spark: org.apache.spark.sql.SparkSession,
                        tablePath: String, k: Int, iters: Int = 2,
                        hook: String => Unit = _ => (),
                        warmStart: Option[(DataFrame, String, String)] = None)
      : Long =
    MaintainedLock.withLease(spark,
        new org.apache.hadoop.fs.Path(tablePath)) { lease =>
      retrainMaintainedImpl(spark, tablePath, k, iters, hook, warmStart,
        lease)
    }

  private def retrainMaintainedImpl(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String, k: Int, iters: Int,
      hook: String => Unit,
      warmStart: Option[(DataFrame, String, String)],
      lease: MaintainedLock.Lease): Long = {
    import org.apache.hadoop.fs.Path
    import graft.operators.Ann
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got $k, $iters")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no maintained table at $tablePath")
    val compDir = new Path(root, "_compactions")
    require(!fs.exists(compDir) || !fs.listStatus(compDir)
        .exists(_.getPath.getName.endsWith(".intent")),
      s"unrecovered compaction at $tablePath: run compactMaintained first")
    val retrainDir = new Path(root, "_retrain")
    def cellDirs(): Seq[Path] =
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("cell_id=")).toSeq
    def subAddrs(d: Path): Seq[Long] =
      fs.listStatus(d).map(_.getPath.getName).filter(_.startsWith("__b="))
        .map(_.stripPrefix("__b=").toLong).toSeq
    def centsDir(v: Long) = new Path(new Path(root, "_centroids"), s"v_$v")

    // ---- recovery of a crashed prior retrain ----
    recoverRetrain(spark, tablePath)

    // ---- stopped-writer preamble: the STREAM may have crashed mid-
    // flight too. Finish the latest committed in-stream rebalance's
    // source deletes (idempotent — exactly what its own replay would
    // do) and roll back uncommitted rebalance debris, so the full-table
    // read below never double-counts a row beside its re-homed copy.
    // Safe only because the writer is stopped (the retrain contract):
    // an uncommitted address with a live writer would be in-flight, not
    // crashed. Listed sources can never be legitimately re-created
    // later — new cell ids always allocate past the committed max.
    val centsRoot = new Path(root, "_centroids")
    if (fs.exists(centsRoot)) {
      fs.listStatus(centsRoot).map(_.getPath)
        .filter(p => p.getName.startsWith("v_") &&
          fs.exists(new Path(p, "_GRAFT_COMMIT")))
        .sortBy(_.getName.stripPrefix("v_").toLong)
        .lastOption.foreach { p =>
          val in = fs.open(new Path(p, "_GRAFT_COMMIT"))
          val srcs =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
            finally in.close()
          applyRetrainCommit(fs, root, srcs, retireLegacySidecar = false)
        }
    }
    cellDirs().foreach { d =>
      subAddrs(d)
        .filter(a => a < 0 && a > FoldBase &&
          !fs.exists(new Path(centsDir(-a - 1), "_GRAFT_COMMIT")))
        .foreach { a =>
          fs.delete(new Path(d, s"__b=$a"), true): Unit
          val draft = centsDir(-a - 1)
          if (fs.exists(draft)) fs.delete(draft, true): Unit
        }
      if (fs.exists(d) && fs.listStatus(d).isEmpty) fs.delete(d, true): Unit
    }

    val dirs = cellDirs()
    require(dirs.nonEmpty, s"empty maintained table at $tablePath")
    val oldCells = dirs.map(_.getName.stripPrefix("cell_id=").toLong).sorted
    val newBase = oldCells.max + 1
    val maxVersion =
      if (!fs.exists(centsRoot)) -1L
      else fs.listStatus(centsRoot).map(_.getPath.getName)
        .filter(_.startsWith("v_")).map(_.stripPrefix("v_").toLong)
        .maxOption.getOrElse(-1L)
    val v = math.max(maintainedSnapshot(spark, tablePath) + 1, maxVersion + 1)
    // SPARE THE REPLAYABLE TAIL (the compaction discipline): rows of the
    // largest ingest batch re-home to the new cells like everything
    // else, but KEEP their directory address `__b=maxIngest` — if the
    // stream crashed after appending that batch but before its
    // checkpoint commit, the replay's delete-own-subdirs finds exactly
    // the re-homed copies and the re-append stays exactly-once.
    val maxIngest: Option[Long] =
      dirs.flatMap(subAddrs).filter(_ >= 0L).maxOption

    // pin the input BEFORE the table starts changing shape: training
    // iterates the frame and the re-home append must not re-list itself
    val scanned = spark.read.parquet(tablePath)
    val live = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
      .localCheckpoint(true)
    // warm start: iterate from the CURRENT committed centroids instead
    // of re-seeding — drift repair that barely moves healthy cells
    // (pass (fallbackCentroids, centIdCol, centVecCol); k is ignored)
    val init = warmStart.map { case (fb, cid, cv) =>
      maintainedCentroids(spark, tablePath, fb)
        .select(col(cid).cast("long").as("cent_id"), col(cv).as("cvec"))
    }
    // kmeansTrain returns a DRIVER-LOCAL relation (the centroid seq via
    // toDF) — checkpointing it was one pure-overhead job per retrain
    val cents = Ann.kmeansTrain(live, "id", "embedding", k, iters, init)
      .select((col("cent_id") + lit(newBase)).as("cent_id"), col("cvec"))

    fs.mkdirs(retrainDir)
    val intent = new Path(retrainDir, s"r_$v.intent")
    val iout = fs.create(intent, true)
    try iout.write(s"newBase=$newBase\n".getBytes("UTF-8"))
    finally iout.close()
    hook("retrain-intent")

    // tombstones covering the spared tail must SURVIVE the rebuild (a
    // replayed tail re-appends its deleted ids too). Append the kept
    // subset as a new sidecar file FIRST — a subset append leaves the
    // read-side distinct union unchanged, so an uncommitted crash needs
    // no sidecar rollback — and list the superseded files in the commit
    // marker: roll-forward deletes them, leaving exactly the subset.
    val delsDir = new Path(root, "_deletes")
    val oldDelFiles: Seq[String] =
      if (!fs.exists(delsDir)) Seq.empty
      else fs.listStatus(delsDir).map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") || n.startsWith("part-")).toSeq
    if (oldDelFiles.nonEmpty) {
      maxIngest.foreach { b =>
        val kept = spark.read.parquet(delsDir.toString).distinct()
          .join(scanned.filter(col("__b").cast("long") === b)
            .select(col("id")), Seq("id"), "left_semi")
          .localCheckpoint(true)
        if (kept.count() > 0)
          kept.coalesce(1).write.mode("append").parquet(delsDir.toString)
      }
    }

    val dataCols = live.columns
      .filter(c => c != "cell_id" && c != "__b").map(col)
    val sparedAddr = maxIngest.getOrElse(Long.MinValue)
    Ann.ivfAssign(
        live.select(dataCols :+ col("__b").cast("long").as("__origb"): _*),
        cents, "id", "embedding", "cent_id", "cvec")
      .withColumn("__b", when(col("__origb") === lit(sparedAddr),
        lit(sparedAddr)).otherwise(lit(-(v + 1))))
      .drop("__origb")
      .write.mode("append").partitionBy("cell_id", "__b").parquet(tablePath)
    cents.repartition(1).write.mode("overwrite")
      .parquet(centsDir(v).toString)
    hook("retrain-appended")
    val commit = new Path(centsDir(v), "_GRAFT_COMMIT")
    val commitTmp = new Path(centsDir(v), "_GRAFT_COMMIT.tmp")
    val out = fs.create(commitTmp, true)
    try out.write(
      (oldCells.map(c => s"cell_id=$c") ++ oldDelFiles.map(f => s"_deletes/$f"))
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // THE FENCE: abort before the rename if a replacement writer took
    // over — the appended rebuild rows under the uncommitted address
    // are exactly what recoverRetrain rolls back
    MaintainedLock.check(fs, root, lease)
    require(fs.rename(commitTmp, commit),
      s"could not commit retrain marker $commit")
    hook("retrain-committed")
    applyRetrainCommit(fs, root, oldCells.map(c => s"cell_id=$c") ++
      oldDelFiles.map(f => s"_deletes/$f"), retireLegacySidecar = true)
    fs.delete(intent, false): Unit
    v
  }

  /** MAINTENANCE ADVISOR — the runbook as code: one index-structure-
    * bounded pass over [[describeMaintained]]'s census plus (when the
    * index has ≥ 2 centroids) [[silhouetteMaintained]]'s drift report,
    * emitting the actions a maintenance window should run. Output:
    * (action, reason, metric) rows, empty = healthy. Advice, not
    * execution — [[autoMaintain]] executes it in the safe order.
    *
    *  - `compact` — a crashed fold is pending (recovery first, the
    *    ingest is refusing anyway), or some cell's subdir count exceeds
    *    `maxSubdirsPerCell` (small-file debt: every scan pays file-open
    *    + footer per subdir).
    *  - `vacuum` — the tombstone sidecar holds ≥ `maxDeadFraction` of
    *    the table's rows: the serving anti-join broadcast is carrying
    *    dead weight worth retiring (run after compact makes them
    *    physical).
    *  - `retrain` — the row-weighted stored-assignment silhouette fell
    *    below `silhouetteFloor`: ingest has drifted past what the cell
    *    geometry can serve; probe-pruned recall is decaying
    *    ([[recallMaintained]] quantifies exactly how much).
    *  - `recover_retrain` — a crashed retrain intent is pending: ALL
    *    ingest refuses to start until [[recoverRetrain]] settles it,
    *    whether or not any drift metric trips — a "healthy" census over
    *    a table whose writer cannot start is not healthy.
    */
  def adviseMaintenance(spark: org.apache.spark.sql.SparkSession,
                        tablePath: String, fallbackCentroids: DataFrame,
                        centIdCol: String, centVecCol: String,
                        maxSubdirsPerCell: Long = 4L,
                        maxDeadFraction: Double = 0.2,
                        silhouetteFloor: Double = 0.1): DataFrame = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Double)]()
    // a pending retrain intent preempts EVERYTHING: ingest refuses while
    // it exists, and an uncommitted draft's debris rows (cells past the
    // committed centroid set) would poison every census below — so the
    // only actionable advice is recovery
    val retrP = new org.apache.hadoop.fs.Path(tablePath, "_retrain")
    val retrFs = retrP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pendingRetrain =
      if (!retrFs.exists(retrP)) 0L
      else retrFs.listStatus(retrP)
        .count(_.getPath.getName.endsWith(".intent")).toLong
    if (pendingRetrain > 0L) {
      out += (("recover_retrain",
        s"$pendingRetrain crashed retrain intent(s) block all ingest",
        pendingRetrain.toDouble))
      return out.toSeq.toDF("action", "reason", "metric")
    }
    val rep = describeMaintained(spark, tablePath).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    if (rep(("pending_compaction", -1L)) == 1L)
      out += (("compact", "crashed compaction pending recovery", 1.0))
    val subdirs = rep.collect { case (("subdirs", c), v) if c >= 0 => (c, v) }
    if (subdirs.nonEmpty) {
      val (worstCell, worst) = subdirs.maxBy { case (c, v) => (v, -c) }
      if (worst > maxSubdirsPerCell)
        out += (("compact",
          s"cell $worstCell holds $worst subdirs (> $maxSubdirsPerCell)",
          worst.toDouble))
    }
    val rows = rep.collect { case (("rows", c), v) if c >= 0 => v }.sum
    val tomb = rep(("tombstones", -1L))
    if (rows > 0 && tomb.toDouble / rows >= maxDeadFraction)
      out += (("vacuum",
        s"$tomb tombstones over $rows rows rides every serving anti-join",
        tomb.toDouble / rows))
    val nCents = maintainedCentroids(spark, tablePath, fallbackCentroids)
      .count()
    if (rows > 0 && nCents >= 2) {
      val sil = silhouetteMaintained(spark, tablePath, fallbackCentroids,
          centIdCol, centVecCol)
        .agg(sum(col("mean_s") * col("n")).cast("double").as("sw"),
          sum(col("n")).cast("double").as("nw")).head
      val meanS = if (sil.getDouble(1) == 0.0) 1.0
        else sil.getDouble(0) / sil.getDouble(1)
      if (meanS < silhouetteFloor)
        out += (("retrain",
          f"row-weighted stored-assignment silhouette $meanS%.4f < floor",
          meanS))
    }
    out.toSeq.toDF("action", "reason", "metric")
  }

  /** Execute [[adviseMaintenance]] in the safe order — recover any
    * crashed retrain first (its intent blocks all ingest AND a pending
    * uncommitted draft would distort every census the other actions
    * read), then compact (folds make tombstones physical and clear
    * small-file debt, and recover any crashed fold), then vacuum
    * (retire the now-dead tombstones), then retrain (the rebuild reads
    * the post-compaction table once). Returns the actions run, in
    * order. Run with the writer stopped, like every offline maintenance
    * pass. `retrainK` defaults to the current centroid count — drift
    * repair, not re-sizing; pass an explicit k to re-size while
    * rebuilding.
    */
  def autoMaintain(spark: org.apache.spark.sql.SparkSession,
                   tablePath: String, fallbackCentroids: DataFrame,
                   centIdCol: String, centVecCol: String,
                   maxSubdirsPerCell: Long = 4L,
                   maxDeadFraction: Double = 0.2,
                   silhouetteFloor: Double = 0.1,
                   retrainK: Option[Int] = None,
                   retrainIters: Int = 2): Seq[String] = {
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    // recovery runs BEFORE the advice census: an uncommitted draft's
    // debris rows would distort every metric the other actions read
    val retrP = new org.apache.hadoop.fs.Path(tablePath, "_retrain")
    val retrFs = retrP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (retrFs.exists(retrP) && retrFs.listStatus(retrP)
        .exists(_.getPath.getName.endsWith(".intent"))) {
      recoverRetrain(spark, tablePath)
      ran += "recover_retrain"
    }
    val advice = adviseMaintenance(spark, tablePath, fallbackCentroids,
        centIdCol, centVecCol, maxSubdirsPerCell, maxDeadFraction,
        silhouetteFloor)
      .select(col("action")).collect().map(_.getString(0)).toSet
    if (advice("compact")) {
      compactMaintained(spark, tablePath): Unit
      ran += "compact"
    }
    if (advice("vacuum")) {
      vacuumDeletes(spark, tablePath): Unit
      ran += "vacuum"
    }
    if (advice("retrain")) {
      val k = retrainK.getOrElse(
        maintainedCentroids(spark, tablePath, fallbackCentroids)
          .count().toInt)
      retrainMaintained(spark, tablePath, k, retrainIters): Unit
      ran += "retrain"
    }
    ran.toSeq
  }

  /** FSCK for a maintained table — the storage-integrity audit every
    * log-structured store needs before trusting a recovery or blaming
    * an operator: one pass verifies the invariants the lifecycle
    * maintains and counts violations. Output rows
    * (check, bad_count, detail); all-zero = sound. Checks:
    *
    *  - `duplicate_ids` — an id stored more than once among live rows
    *    (a half-rolled-back maintenance or double ingest would show
    *    here first). One shuffle of (id, count ≥ 2).
    *  - `misfiled_rows` — rows whose stored `cell_id` is not the argmax
    *    under the COMMITTED centroids: the exact drift count behind
    *    [[silhouetteMaintained]]'s score (in-literal argmax projection,
    *    no join).
    *  - `uncommitted_maintenance` — rebalance/retrain addresses
    *    `__b = −(n+1)` whose centroid version n never committed:
    *    rollback debris the next stream start would remove; its rows
    *    are double-counted until then.
    *  - `dead_tombstones` — sidecar ids absent from the table
    *    ([[vacuumDeletes]] candidates riding every serving anti-join).
    *  - `pending_compaction` / `pending_retrain` — crashed-maintenance
    *    intents awaiting recovery (the ingest is refusing while these
    *    exist).
    */
  def fsckMaintained(spark: org.apache.spark.sql.SparkSession,
                     tablePath: String, fallbackCentroids: DataFrame,
                     centIdCol: String, centVecCol: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    import graft.operators.Ann
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no maintained table at $tablePath")
    val cellDirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("cell_id=")).toSeq
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    if (cellDirs.isEmpty) {
      out += (("duplicate_ids", 0L, "")); out += (("misfiled_rows", 0L, ""))
      out += (("uncommitted_maintenance", 0L, ""))
    } else {
      val t = spark.read.parquet(tablePath)
        .withColumn("cell_id", col("cell_id").cast("long"))
        .withColumn("__b", col("__b").cast("long"))
      val dups = t.groupBy(col("id")).count().filter(col("count") > 1)
        .agg(count(lit(1)), sum(col("count") - 1)).head
      out += (("duplicate_ids",
        if (dups.isNullAt(1)) 0L else dups.getLong(1),
        if (dups.getLong(0) == 0) ""
        else s"${dups.getLong(0)} ids stored more than once"))
      val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
      val assigned = Ann.ivfAssign(
        t.select(col("id"), col("embedding"), col("cell_id").as("__stored")),
        cents, "id", "embedding", centIdCol, centVecCol)
      val misfiled = assigned.filter(col("cell_id") =!= col("__stored")).count()
      out += (("misfiled_rows", misfiled,
        if (misfiled == 0) "" else "stored cell != argmax under committed centroids"))
      val maintAddrs = cellDirs.flatMap(d =>
        fs.listStatus(d).map(_.getPath.getName).filter(_.startsWith("__b="))
          .map(_.stripPrefix("__b=").toLong))
        .distinct.filter(a => a < 0 && a > FoldBase)
      val bad = maintAddrs.filterNot { a =>
        fs.exists(new Path(new Path(new Path(root, "_centroids"),
          s"v_${-a - 1}"), "_GRAFT_COMMIT"))
      }
      out += (("uncommitted_maintenance", bad.size.toLong,
        if (bad.isEmpty) "" else s"addresses ${bad.sorted.mkString(",")}"))
    }
    val delsP = new Path(root, "_deletes")
    val dead =
      if (!fs.exists(delsP)) 0L
      else if (cellDirs.isEmpty)
        spark.read.parquet(delsP.toString).distinct().count()
      else {
        val ds = spark.read.parquet(delsP.toString).distinct()
        ds.join(spark.read.parquet(tablePath).select(col("id")),
          Seq("id"), "left_anti").count()
      }
    out += (("dead_tombstones", dead,
      if (dead == 0) "" else "vacuumDeletes candidates"))
    def intents(dir: String): Long = {
      val p = new Path(root, dir)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).count(_.getPath.getName.endsWith(".intent")).toLong
    }
    out += (("pending_compaction", intents("_compactions"), ""))
    out += (("pending_retrain", intents("_retrain"), ""))
    out.toSeq.toDF("check", "bad_count", "detail").orderBy($"check")
  }

  /** Tombstone-sidecar vacuum — drops DEAD tombstones (ids no longer
    * present anywhere in the table: compaction already made their
    * deletes physical) and folds the sidecar's accumulated per-batch
    * append files into one, so serving's broadcast anti-join stops
    * re-reading an ever-growing pile of small files. Returns
    * (kept, dropped).
    *
    * Crash safety without an atomic swap: the compacted file APPENDS
    * first, the superseded files delete after — at every intermediate
    * point the sidecar's union is a SUPERSET of the needed tombstones
    * (extra tombstones for absent ids are harmless: the anti-join has
    * nothing to hide), and the read side distincts. Idempotent re-run.
    * Run with delete writers stopped (the compaction discipline).
    *
    * SEMANTICS — this is the deliberate exit from [[deleteMaintained]]'s
    * terminal-per-id rule: a vacuumed id (purged from the table AND
    * sidecar) that is later RE-INSERTED surfaces as a fresh live row —
    * the purge-then-return lifecycle (GDPR delete, user comes back).
    * Ids still physically present keep their tombstones and stay
    * hidden.
    */
  def vacuumDeletes(spark: org.apache.spark.sql.SparkSession,
                    tablePath: String): (Long, Long) =
    MaintainedLock.withLease(spark,
        new org.apache.hadoop.fs.Path(tablePath)) { _ =>
      vacuumDeletesImpl(spark, tablePath)
    }

  private def vacuumDeletesImpl(spark: org.apache.spark.sql.SparkSession,
                                tablePath: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(tablePath, "_deletes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return (0L, 0L)
    val before = fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet") ||
        f.getName.startsWith("part-")).toSeq
    val dels = spark.read.parquet(p.toString).distinct()
    // dir-exists-iff-data: a fully-deleted-then-compacted table has no
    // cell_id= dirs left, only underscore sidecars — a bare read would
    // throw 'unable to infer schema'. No live rows ⇒ every tombstone is
    // dead ⇒ drop the whole sidecar.
    val root = new Path(tablePath)
    val anyCells = fs.exists(root) && fs.listStatus(root)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("cell_id="))
    if (!anyCells) {
      val total = dels.count()
      fs.delete(p, true): Unit
      return (0L, total)
    }
    val live = spark.read.parquet(tablePath).select(col("id"))
    val kept = dels.join(live, Seq("id"), "left_semi").localCheckpoint(true)
    val keptN = kept.count()
    val total = dels.count()
    if (keptN == 0L) {
      // nothing left to hide: the whole sidecar is dead weight
      fs.delete(p, true): Unit
    } else {
      kept.coalesce(1).write.mode("append").parquet(p.toString)
      before.foreach(f => if (fs.exists(f)) fs.delete(f, false): Unit)
    }
    (keptN, total - keptN)
  }

  /** Predicate delete — [[deleteMaintained]] for a METADATA condition
    * instead of an id list: one scan resolves the matching ids (the
    * predicate pushes to parquet row groups; with a partition-prunable
    * condition the scan never opens untouched cells), and the ids
    * append to the same tombstone sidecar. This is the GDPR/tenant
    * purge over the ingest's passthrough columns ("delete everything
    * with tenant = X / lang = Y") — the delete path still touches no
    * table file; tombstones become physical at [[compactMaintained]].
    * Returns the number of ids tombstoned.
    *
    * Rows INSERTED to a matching state after this call are NOT covered
    * — the predicate is evaluated once, now, against the current table
    * (a standing rule would be a filter in the serving `pred`, not a
    * delete).
    */
  def deleteMaintainedWhere(spark: org.apache.spark.sql.SparkSession,
                            tablePath: String, pred: Column): Long = {
    // an emptied table (all cells deleted then compacted away) has no
    // cell_id= dirs — nothing can match, and the bare read would throw
    val rootP = new org.apache.hadoop.fs.Path(tablePath)
    val rootFs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val anyCells = rootFs.exists(rootP) && rootFs.listStatus(rootP)
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("cell_id="))
    if (!anyCells) return 0L
    val ids = spark.read.parquet(tablePath).filter(pred)
      .select(col("id")).distinct().localCheckpoint(true)
    val n = ids.count()
    if (n > 0) deleteMaintained(spark, tablePath, ids, "id")
    n
  }

  /** Streaming face of [[deleteMaintained]]: a stream of ids to delete
    * (e.g. a GDPR purge feed) appends to the tombstone sidecar per
    * micro-batch. No batch addressing: delete appends are idempotent by
    * nature (the read side distincts), so a replayed batch re-appending
    * the same ids changes nothing.
    */
  def streamDeleteIngest(ids: DataFrame, idCol: String, tablePath: String,
                         checkpointPath: String): StreamingQuery =
    ids.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        deleteMaintained(batch.sparkSession, tablePath, batch, idCol)
      }
      .start()

  /** Dir-exists-iff-data: a fully-deleted-then-compacted table has no
    * `cell_id=` dirs left, only underscore sidecars — a bare read would
    * throw 'unable to infer schema', so every face that reads the whole
    * table checks this first and answers empty instead.
    */
  private def maintainedHasCells(spark: org.apache.spark.sql.SparkSession,
                                 tablePath: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && fs.listStatus(root).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("cell_id="))
  }

  private def maintainedDeletes(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tablePath, "_deletes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      // the sidecar rides a broadcast anti-join on every serving call —
      // ceiling-guarded (graft.maintained.maxTombstones, the
      // Ann.MaxTombstones discipline): a runaway delete volume must
      // surface as a loud "vacuum first", not an opaque broadcast OOM.
      // The limit-bounded count reads the id column only.
      val d = spark.read.parquet(p.toString).distinct()
      val ceiling = spark.conf.getOption("graft.maintained.maxTombstones")
        .map(_.toLong)
        .getOrElse(graft.operators.Ann.MaxTombstones.toLong)
      val n = d.limit(math.min(ceiling + 1, Int.MaxValue.toLong).toInt)
        .count()
      require(n <= ceiling,
        s"$tablePath/_deletes holds > $ceiling distinct tombstones — " +
          "past the serving broadcast ceiling " +
          "(graft.maintained.maxTombstones). Run vacuumDeletes / " +
          "compactMaintained to make the deletes physical, or raise " +
          "the conf only if the executors can hold the set")
      Some(d)
    }
  }

  /** Probe-pruned top-k search over a [[streamInsertIndexedMaintained]]
    * table — the serving face of the maintained index: rank `nProbes`
    * cells against the latest COMMITTED centroids (driver-side; the
    * centroid table is index-structure-bounded), then scan ONLY those
    * cells' directories — the `cell_id` isin filter is partition
    * pruning, so the table on disk IS the inverted file. Rows deleted
    * via [[deleteMaintained]] are anti-joined out (broadcast sidecar).
    * Same quantized-cosine scoring and k-bounded top-k as
    * [[graft.operators.Ann.search]]. Returns (id, score), score desc.
    *
    * `pred` restricts the search to rows satisfying a metadata
    * predicate (columns the ingest passed through) — the POST-filter
    * path of [[graft.operators.Ann.searchFiltered]] against the
    * maintained table: the predicate lands on the pruned scan, so
    * parquet row-group stats prune inside the probed cell directories.
    * A narrow predicate can leave fewer than k survivors inside the
    * probed cells (the starvation regime); raise `nProbes` or run the
    * exact pre-filter path over the whole table when that matters.
    *
    * `after` is the KEYSET-pagination cursor — the (score, id) of the
    * previous page's LAST row: the next page is the top-k of everything
    * strictly after it in the (score desc, id asc) total order. Keyset
    * beats offset at scale (an offset-n page scores and discards n rows
    * per request; the cursor filter is one pushed comparison) and is
    * stable under concurrent inserts — rows landing above the cursor
    * can't shift this page. Pages agree with one big top-k because the
    * order is total (quantized score, id tie-break; spec-pinned).
    *
    * `asOf` pins the read to a SNAPSHOT — a batch address from
    * [[maintainedSnapshot]]: only rows whose permanent ingest version
    * `__b0` is at-or-before the pin are visible (their rebalance moves
    * and compaction folds included — the version column survives
    * maintenance rewrites). Within an unfolded batch directory
    * `__b0` is constant, so the pushed filter skips whole files on
    * parquet stats. The repeatable-read contract a multi-request
    * serving session (pages of one scroll, a long query batch) needs
    * while ingest keeps appending. Deletes deliberately read CURRENT —
    * see `visibleAsOf`.
    */
  def searchMaintained(spark: org.apache.spark.sql.SparkSession,
                       tablePath: String, fallbackCentroids: DataFrame,
                       centIdCol: String, centVecCol: String,
                       query: Seq[Float], nProbes: Int, k: Int,
                       pred: Column = lit(true),
                       after: Option[(Double, Long)] = None,
                       asOf: Option[Long] = None): DataFrame = {
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.{Ann, TopK}
    val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
    val probes = Ann.probeCellIds(cents, query, centIdCol, centVecCol, nProbes)
    // __b0 is constant per unfolded batch dir, so the pushed version
    // filter skips post-pin files on parquet row-group stats
    val scanned = Ann.readIvfCells(spark, tablePath, probes)
      .filter(visibleAsOf(asOf))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
      .filter(pred)
    val cand = alive.withColumn("__nv",
      greatest(sqrt(dotF(col("embedding"), col("embedding"))), lit(V.NormEps)))
    val qn = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
    // quantized to 6 decimals — the same stable total order the batch
    // face and every other scorer use, so batch ≡ single holds even on
    // knife-edge near-ties
    val scored = cand.withColumn("score",
      round(dotF(col("embedding"), typedLit(query)) / (col("__nv") * lit(qn)),
        6) + lit(0.0))
    val paged = after match {
      case None => scored
      case Some((s, i)) => scored.filter(
        col("score") < s || (col("score") === s && col("id") > i))
    }
    TopK.topK(paged, col("score"), col("id"), k)
      .select(col("id"), col("score"))
  }

  /** EXACT top-k over the maintained table — every cell scanned, no
    * probe pruning: the ground-truth face. Same quantized scoring,
    * tombstone, `pred`, and `asOf` semantics as [[searchMaintained]],
    * so the two are comparable row for row. Use for recall audits
    * ([[recallMaintained]]) and for the narrow-predicate starvation
    * regime where probed cells can't fill k; at corpus scale this reads
    * the whole table — an audit/fallback cost, not a serving one.
    */
  def searchMaintainedExact(spark: org.apache.spark.sql.SparkSession,
                            tablePath: String, query: Seq[Float], k: Int,
                            pred: Column = lit(true),
                            asOf: Option[Long] = None): DataFrame = {
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.TopK
    if (!maintainedHasCells(spark, tablePath))
      return spark.range(0).select(col("id"), lit(0.0).as("score"))
    val scanned = spark.read.parquet(tablePath).filter(visibleAsOf(asOf))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
      .filter(pred)
    val qn = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
    val scored = alive.withColumn("score",
      round(dotF(col("embedding"), typedLit(query)) /
        (greatest(sqrt(dotF(col("embedding"), col("embedding"))), lit(V.NormEps)) *
          lit(qn)), 6) + lit(0.0))
    TopK.topK(scored, col("score"), col("id"), k)
      .select(col("id"), col("score"))
  }

  /** RECALL AUDIT of the maintained index's probed serving against the
    * exact scan — the one-call answer to "is nProbes enough for THIS
    * table as it stands today": for each query in the batch, recall@k
    * of [[searchMaintainedBatch]] (probe-pruned) against the exact
    * full-scan ranking. Output: (qidCol, n_exact, n_hit, recall) per
    * query. Both sides share one table read each; the exact side is a
    * single scan scored against the BROADCAST query batch with the
    * k-bounded per-query aggregator — audit cost is one full pass, not
    * one pass per query. Run it after drift reports
    * ([[silhouetteMaintained]]) flag misfiled rows: misfiling is
    * exactly what turns probe pruning into recall loss.
    */
  def recallMaintained(spark: org.apache.spark.sql.SparkSession,
                       tablePath: String, fallbackCentroids: DataFrame,
                       centIdCol: String, centVecCol: String,
                       queries: DataFrame, qidCol: String, qVecCol: String,
                       nProbes: Int, k: Int,
                       asOf: Option[Long] = None): DataFrame = {
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.{Ann, TopK}
    require(qidCol != "id" && qidCol != "score",
      s"qidCol must not be named 'id' or 'score'; got '$qidCol'")
    if (!maintainedHasCells(spark, tablePath))
      return queries.limit(0).select(col(qidCol), lit(0L).as("n_exact"),
        lit(0L).as("n_hit"), lit(0.0).as("recall"))
    val approx = searchMaintainedBatch(spark, tablePath, fallbackCentroids,
      centIdCol, centVecCol, queries, qidCol, qVecCol, nProbes, k,
      asOf = asOf)
    val q = queries.select(col(qidCol).as("__qid"), col(qVecCol).as("__qv"))
    val scanned = spark.read.parquet(tablePath).filter(visibleAsOf(asOf))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
    val scored = alive.crossJoin(broadcast(q))
      .withColumn("score",
        round(dotF(col("embedding"), col("__qv")) /
          (greatest(sqrt(dotF(col("embedding"), col("embedding"))), lit(V.NormEps)) *
            greatest(sqrt(dotF(col("__qv"), col("__qv"))), lit(V.NormEps))),
          6) + lit(0.0))
    val exact = TopK.topKPerKeyAgg(scored, Seq(col("__qid")), col("score"),
        col("id"), k)
      .select(col("__qid").as(qidCol), col("id"))
    Ann.recallAtK(exact, approx.select(col(qidCol), col("id")), qidCol, "id")
  }

  /** GROUPED search over the maintained table — the RAG serving shape
    * against the on-disk index: the table is a chunk-level index whose
    * `groupCol` (a passthrough metadata column — the parent document
    * id) groups hits, and the answer is the top `nGroups` groups ranked
    * by their best hit with `perGroup` hits inside each, so one strong
    * document cannot flood the page with its own chunks
    * ([[graft.operators.TopK.groupedTopK]] semantics, probe-pruned
    * scan, tombstones honored, `asOf` snapshot pin supported). Output:
    * (groupCol, grp_rank, rnk, id, score), ordered.
    */
  def searchMaintainedGrouped(spark: org.apache.spark.sql.SparkSession,
                              tablePath: String, fallbackCentroids: DataFrame,
                              centIdCol: String, centVecCol: String,
                              query: Seq[Float], groupCol: String,
                              nProbes: Int, nGroups: Int, perGroup: Int,
                              asOf: Option[Long] = None): DataFrame = {
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.{Ann, TopK}
    require(groupCol != "id" && groupCol != "score",
      s"groupCol must not be named 'id' or 'score'; got '$groupCol'")
    val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
    val probes = Ann.probeCellIds(cents, query, centIdCol, centVecCol, nProbes)
    val scanned = Ann.readIvfCells(spark, tablePath, probes)
      .filter(visibleAsOf(asOf))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
    val qn = math.max(math.sqrt(query.map(x => x.toDouble * x).sum), V.NormEps)
    val scored = alive.withColumn("score",
      round(dotF(col("embedding"), typedLit(query)) /
        (greatest(sqrt(dotF(col("embedding"), col("embedding"))), lit(V.NormEps)) *
          lit(qn)), 6) + lit(0.0))
    TopK.groupedTopK(scored, groupCol, col("score"), col("id"),
      nGroups, perGroup)
  }

  /** LATE-INTERACTION (ColBERT MaxSim) serving over the maintained
    * table — the multi-vector scoring mode against the on-disk index:
    * query and stored vectors are read as `nSlices` token slices,
    * score = Σ over query slices of max over doc slices of the
    * 6-dp-quantized slice cosine. Candidate generation probes with the
    * FULL pooled query vector (the standard ColBERT-over-IVF
    * first stage), the exact MaxSim re-rank touches only probed cells;
    * tombstones and `asOf` pins honored. Slice cosines are invariant
    * to the ingest's full-vector normalization (uniform scaling scales
    * every slice), so scores mean the same thing as over raw vectors.
    */
  def searchMaintainedMaxSim(spark: org.apache.spark.sql.SparkSession,
                             tablePath: String, fallbackCentroids: DataFrame,
                             centIdCol: String, centVecCol: String,
                             query: Seq[Float], nSlices: Int, nProbes: Int,
                             k: Int,
                             asOf: Option[Long] = None): DataFrame = {
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.{Ann, TopK}
    require(nSlices >= 1 && query.length % nSlices == 0,
      s"query length ${query.length} must be a multiple of nSlices $nSlices")
    val d = query.length / nSlices
    val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
    val probes = Ann.probeCellIds(cents, query, centIdCol, centVecCol, nProbes)
    val scanned = Ann.readIvfCells(spark, tablePath, probes)
      .filter(visibleAsOf(asOf))
    val alive = maintainedDeletes(spark, tablePath)
      .map(dd => scanned.join(broadcast(dd), Seq("id"), "left_anti"))
      .getOrElse(scanned)
    def dslice(j: Int) = slice(col("embedding"), j * d + 1, d)
    def dnorm(j: Int) =
      greatest(sqrt(dotF(dslice(j), dslice(j))), lit(V.NormEps))
    val perQuerySlice = (0 until nSlices).map { qi =>
      val qs = query.slice(qi * d, qi * d + d)
      val qn = math.max(
        math.sqrt(qs.map(x => x.toDouble * x.toDouble).sum), V.NormEps)
      val cands = (0 until nSlices).map(dj =>
        round(dotF(dslice(dj), typedLit(qs)) / (dnorm(dj) * lit(qn)), 6))
      val maxCos = if (cands.size == 1) cands.head else greatest(cands: _*)
      round(maxCos * 1000000).cast("long")
    }
    val scored = alive.withColumn("score",
      round(perQuerySlice.reduce(_ + _).cast("double") / 1000000.0, 6)
        + lit(0.0))
    TopK.topK(scored, col("score"), col("id"), k)
      .select(col("id"), col("score"))
  }

  /** Stored-assignment silhouette of a [[streamInsertIndexedMaintained]]
    * table — [[graft.operators.Ann.silhouetteSimplified]] in `assignCol`
    * mode over the table's own `cell_id` against the latest COMMITTED
    * centroids: the drift report for a live index. Right after a
    * rebalance every row is filed at its argmax, so mean_s ≥ 0
    * everywhere; as ingest drifts (or centroids are retrained
    * externally), misfiled rows pull cells negative — the re-file
    * signal, one scan to compute. Tombstoned rows are excluded (they
    * will never be served, so they must not color the report).
    */
  def silhouetteMaintained(spark: org.apache.spark.sql.SparkSession,
                           tablePath: String, fallbackCentroids: DataFrame,
                           centIdCol: String, centVecCol: String): DataFrame = {
    import graft.operators.Ann
    val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
    val t = spark.read.parquet(tablePath)
      .withColumn("cell_id", col("cell_id").cast("long"))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => t.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(t)
    Ann.silhouetteSimplified(alive, cents, "id", "embedding",
      centIdCol, centVecCol, assignCol = Some("cell_id"))
  }

  /** Batched [[searchMaintained]]: answer a whole query TABLE against
    * the maintained index with ONE pruned scan. Per query the `nProbes`
    * cells rank in-plan against the committed centroids (broadcast
    * cross join — centroids are index-bounded); the UNION of all probed
    * cells is collected (bounded by #cells, never by queries) and read
    * once with partition pruning; a broadcast (query, cell) routing
    * join restricts scoring so each query scores ONLY its probed cells'
    * rows; per-query top-k is the k-bounded aggregator (exchange ≤
    * partitions × Q × k entries). Tombstoned rows are anti-joined out.
    * The per-request loop pays one scan per query — this pays one scan
    * per BATCH, the amortization that turns 10⁶-query serving into a
    * join problem. Returns (qidCol, id, score).
    *
    * `pred` filters the scanned rows on passthrough metadata columns
    * (same contract as [[searchMaintained]]): one predicate applied to
    * the shared pruned scan, i.e. every query in the batch searches the
    * same filtered view — per-query predicates are the namespaced shape
    * ([[graft.operators.Ann.searchNamespacedBatch]]).
    */
  def searchMaintainedBatch(spark: org.apache.spark.sql.SparkSession,
                            tablePath: String, fallbackCentroids: DataFrame,
                            centIdCol: String, centVecCol: String,
                            queries: DataFrame, qidCol: String,
                            qVecCol: String, nProbes: Int, k: Int,
                            pred: Column = lit(true),
                            asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.{Ann, TopK}
    require(nProbes >= 1 && k >= 1, s"need nProbes, k >= 1; got $nProbes, $k")
    // the output is (qidCol, "id", "score") — a qidCol named like the
    // hit columns would emit duplicate names downstream can't address
    require(qidCol != "id" && qidCol != "score",
      s"qidCol must not be named 'id' or 'score' (output columns clash); got '$qidCol'")
    val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
    // query columns are re-aliased IMMEDIATELY: a qVecCol named like
    // the table's own vector column ("embedding" — the natural choice)
    // would otherwise collide at the routing join
    val q = queries.select(col(qidCol).as("__qid"), col(qVecCol).as("__qv"))
    val pw = Window.partitionBy(col("__qid"))
      .orderBy(col("__c").desc, col(centIdCol))
    // used twice (cell-set collect + routing join): materialize once
    val probes = cents
      .crossJoin(broadcast(q))
      .withColumn("__c", round(V.cosine(col(centVecCol), col("__qv")), 6))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbes)
      .select(col("__qid"), col("__qv"), col(centIdCol).cast("long").as("cell_id"))
      .localCheckpoint(false)
    // the union of probed cells is ⊆ the centroid table, so this pull
    // is index-structure-bounded; the limit guard makes a mis-sized
    // "centroid" table fail loudly here instead of OOMing the driver
    val cellsToScan = probes.select(col("cell_id")).distinct()
      .limit(Ann.MaxCentroids + 1)
      .collect().map(_.getLong(0)).toSeq.sorted
    require(cellsToScan.length <= Ann.MaxCentroids,
      s"probed cell union exceeds Ann.MaxCentroids = ${Ann.MaxCentroids}" +
        " cells — the routing table is not index-structure-sized")
    val scanned = Ann.readIvfCells(spark, tablePath, cellsToScan)
      .filter(visibleAsOf(asOf))
      .withColumn("cell_id", col("cell_id").cast("long"))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
      .filter(pred)
    val scored = alive.join(broadcast(probes), Seq("cell_id"))
      .withColumn("score",
        round(dotF(col("embedding"), col("__qv")) /
          (greatest(sqrt(dotF(col("embedding"), col("embedding"))), lit(V.NormEps)) *
            greatest(sqrt(dotF(col("__qv"), col("__qv"))), lit(V.NormEps))),
          6) + lit(0.0))
    TopK.topKPerKeyAgg(scored, Seq(col("__qid")), col("score"), col("id"), k)
      .select(col("__qid").as(qidCol), col("id"), col("score"))
  }

  /** NAMESPACED [[searchMaintainedBatch]] — the multi-tenant serving
    * face over the maintained table: every query carries a namespace
    * key matched as an EQUI-JOIN condition against one of the ingest's
    * passthrough metadata columns, so candidates are structurally
    * (query's namespace ∩ query's probed cells) — no tenant's query
    * scores another tenant's rows, and there is no predicate to forget
    * (the [[graft.operators.Ann.searchNamespacedBatch]] contract,
    * against the on-disk index). One pruned scan per batch; per-query
    * reduction through the k-bounded aggregator; tombstones honored.
    * Per query it equals [[searchMaintained]] with
    * `pred = col(nsCol) === thatNamespace` (spec-pinned).
    */
  def searchMaintainedNamespacedBatch(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String, fallbackCentroids: DataFrame,
      centIdCol: String, centVecCol: String,
      queries: DataFrame, qidCol: String, qVecCol: String,
      qnsCol: String, nsCol: String,
      nProbes: Int, k: Int, asOf: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.expressions.FloatVectorExpressions.dotF
    import graft.functions.{VectorFunctions => V}
    import graft.operators.{Ann, TopK}
    require(nProbes >= 1 && k >= 1, s"need nProbes, k >= 1; got $nProbes, $k")
    require(qidCol != "id" && qidCol != "score",
      s"qidCol must not be named 'id' or 'score'; got '$qidCol'")
    val cents = maintainedCentroids(spark, tablePath, fallbackCentroids)
    val q = queries.select(col(qidCol).as("__qid"), col(qVecCol).as("__qv"),
      col(qnsCol).as("__qns"))
    val pw = Window.partitionBy(col("__qid"))
      .orderBy(col("__c").desc, col(centIdCol))
    val probes = cents
      .crossJoin(broadcast(q))
      .withColumn("__c", round(V.cosine(col(centVecCol), col("__qv")), 6))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbes)
      .select(col("__qid"), col("__qv"), col("__qns"),
        col(centIdCol).cast("long").as("cell_id"))
      .localCheckpoint(false)
    // the union of probed cells is ⊆ the centroid table, so this pull
    // is index-structure-bounded; the limit guard makes a mis-sized
    // "centroid" table fail loudly here instead of OOMing the driver
    val cellsToScan = probes.select(col("cell_id")).distinct()
      .limit(Ann.MaxCentroids + 1)
      .collect().map(_.getLong(0)).toSeq.sorted
    require(cellsToScan.length <= Ann.MaxCentroids,
      s"probed cell union exceeds Ann.MaxCentroids = ${Ann.MaxCentroids}" +
        " cells — the routing table is not index-structure-sized")
    val scanned = Ann.readIvfCells(spark, tablePath, cellsToScan)
      .filter(visibleAsOf(asOf))
      .withColumn("cell_id", col("cell_id").cast("long"))
    val alive = maintainedDeletes(spark, tablePath)
      .map(d => scanned.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(scanned)
    val scored = alive.join(broadcast(probes),
        alive("cell_id") === probes("cell_id") &&
          col(nsCol) === col("__qns"))
      .withColumn("score",
        round(dotF(col("embedding"), col("__qv")) /
          (greatest(sqrt(dotF(col("embedding"), col("embedding"))), lit(V.NormEps)) *
            greatest(sqrt(dotF(col("__qv"), col("__qv"))), lit(V.NormEps))),
          6) + lit(0.0))
    TopK.topKPerKeyAgg(scored, Seq(col("__qid")), col("score"), col("id"), k)
      .select(col("__qid").as(qidCol), col("id"), col("score"))
  }

  /** [[searchMaintainedBatch]] with DUPLICATE-QUERY COLLAPSE — the
    * hot-query optimization for production batches (real query streams
    * are heavily repeated: the same embedding arrives thousands of
    * times an hour). Queries group by their EXACT vector (array
    * equality — no fingerprint, so no collision can merge two distinct
    * queries), one representative per group runs through the batch
    * search, and results fan back to every original query id with one
    * broadcast join. Scoring cost scales with UNIQUE vectors, not batch
    * size; a batch of 10⁶ copies of one hot query costs one search.
    * Results are row-for-row identical to the uncollapsed call
    * (spec-pinned) because scoring depends only on the vector.
    */
  def searchMaintainedBatchCollapsed(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String, fallbackCentroids: DataFrame,
      centIdCol: String, centVecCol: String,
      queries: DataFrame, qidCol: String, qVecCol: String,
      nProbes: Int, k: Int, pred: Column = lit(true),
      asOf: Option[Long] = None): DataFrame = {
    // same output contract as the uncollapsed call: (qidCol, id, score)
    require(qidCol != "id" && qidCol != "score",
      s"qidCol must not be named 'id' or 'score' (output columns clash); got '$qidCol'")
    val q = queries.select(col(qidCol).as("__oqid"), col(qVecCol).as("__oqv"))
    val reps = q.groupBy(col("__oqv")).agg(min(col("__oqid")).as("__rep"))
    val repHits = searchMaintainedBatch(spark, tablePath, fallbackCentroids,
      centIdCol, centVecCol,
      reps.select(col("__rep"), col("__oqv").as("__rv")), "__rep", "__rv",
      nProbes, k, pred, asOf)
    q.join(broadcast(reps), Seq("__oqv"))
      .join(broadcast(repHits), Seq("__rep"))
      .select(col("__oqid").as(qidCol), col("id"), col("score"))
  }

  /** Small-file compaction for a [[streamInsertIndexedMaintained]]
    * table — the maintenance pass its per-batch `__b` subdirs make
    * inevitable (every log-structured format carries the same
    * obligation). Folds all COMMITTED batch subdirs of each cell into
    * one fold subdir per cell (`__b` ≤ −2⁴⁰, a reserved address space
    * disjoint from ingest batches ≥ 0 and maintenance moves −(n+1)),
    * then deletes the sources; rows tombstoned via [[deleteMaintained]]
    * are PURGED from the folded output (tombstones become physical at
    * compaction — the LSM discipline). Returns the number of subdirs
    * folded away.
    *
    * Replay safety: the LARGEST ingest batch address is never folded —
    * it may be an uncommitted batch that replays on restart and
    * re-addresses its own subdirs; likewise EVERY maintenance address
    * −(b+1) whose `_centroids/v_b` is uncommitted (such debris belongs
    * to a crashed rebalance the next stream start rolls BACK, so it
    * must stay at its rollback-able address). Everything else is
    * committed and can never be re-addressed.
    *
    * Crash safety (same discipline as the ingest): an INTENT marker
    * (`_compactions/c_<fold>.intent`) lands before the fold append, the
    * COMMIT marker (`c_<fold>`, listing the source subdirs) after it —
    * a re-run rolls an intent-only epoch BACK (drop fold dirs, sources
    * intact) and an intent+commit epoch FORWARD (finish the source
    * deletes). The ingest REFUSES to start while an intent is pending
    * (a crashed fold leaves rows duplicated beside their sources until
    * recovery — sizes would double-count), so run this with the writer
    * STOPPED and re-run it after any crash; both are idempotent.
    *
    * `cells` restricts folding (incremental compaction at scale);
    * recovery always sweeps the whole table. `hook` is a TEST SEAM
    * ("compact-intent" / "compact-appended" / "compact-committed").
    */
  def compactMaintained(spark: org.apache.spark.sql.SparkSession,
                        tablePath: String,
                        cells: Option[Seq[Long]] = None,
                        hook: String => Unit = _ => ()): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    MaintainedLock.withLease(spark, root) { lease =>
      compactMaintainedImpl(spark, tablePath, cells, hook, lease)
    }
  }

  private def compactMaintainedImpl(
      spark: org.apache.spark.sql.SparkSession,
      tablePath: String, cells: Option[Seq[Long]],
      hook: String => Unit, lease: MaintainedLock.Lease): Int = {
    import org.apache.hadoop.fs.Path
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def cellDirs(): Seq[Path] =
      fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("cell_id=")).toSeq
    def subAddrs(d: Path): Seq[Long] =
      fs.listStatus(d).map(_.getPath.getName).filter(_.startsWith("__b="))
        .map(_.stripPrefix("__b=").toLong).toSeq
    val compDir = new Path(root, "_compactions")

    // ---- recovery of any crashed prior epoch ----
    if (fs.exists(compDir)) {
      val names = fs.listStatus(compDir).map(_.getPath.getName)
      names.filter(_.endsWith(".intent")).foreach { iname =>
        val cname = iname.stripSuffix(".intent")
        val commit = new Path(compDir, cname)
        if (fs.exists(commit)) {
          // committed: finish the source deletes (dropping any cell dir
          // the deletes empty — the dir-exists-iff-data invariant the
          // normal path keeps must survive recovery too)
          val in = fs.open(commit)
          val srcs =
            try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
            finally in.close()
          srcs.filter(_.nonEmpty).foreach { rel =>
            val p = new Path(root, rel)
            if (fs.exists(p)) {
              fs.delete(p, true): Unit
              val parent = p.getParent
              if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
                fs.delete(parent, true): Unit
            }
          }
        } else {
          // uncommitted: drop the fold dirs, sources are intact
          val f = cname.stripPrefix("c_").toLong
          cellDirs().foreach { d =>
            val p = new Path(d, s"__b=$f")
            if (fs.exists(p)) fs.delete(p, true): Unit
          }
        }
        fs.delete(new Path(compDir, iname), false): Unit
      }
      // intent-less commit markers are fully done — prune them
      fs.listStatus(compDir).map(_.getPath)
        .filter(!_.getName.endsWith(".intent"))
        .foreach(p => fs.delete(p, false): Unit)
    }

    // ---- plan ----
    val dirs = cellDirs()
    if (dirs.isEmpty) return 0
    val allAddrs = dirs.flatMap(subAddrs).distinct
    val ingest = allAddrs.filter(_ >= 0)
    if (ingest.isEmpty) return 0
    val maxIngest = ingest.max
    // spare the replayable tail (the largest ingest batch), and EVERY
    // maintenance address whose centroid version is uncommitted: such
    // debris belongs to a crashed rebalance that the next stream start
    // will roll BACK — folding it into a permanent fold address would
    // put rolled-back rows beyond the rollback's reach (duplicates once
    // the re-run re-homes the still-intact sources again)
    def vCommitted(b: Long): Boolean = fs.exists(new Path(
      new Path(new Path(root, "_centroids"), s"v_$b"), "_GRAFT_COMMIT"))
    val excluded: Set[Long] =
      Set(maxIngest) ++
        allAddrs.filter(a => a < 0 && a > FoldBase && !vCommitted(-a - 1)).toSet
    val newFold =
      allAddrs.filter(_ <= FoldBase).minOption.getOrElse(FoldBase + 1) - 1
    val targetDirs = cells match {
      case Some(cs) =>
        val want = cs.toSet
        dirs.filter(d => want(d.getName.stripPrefix("cell_id=").toLong))
      case None => dirs
    }
    val sources: Seq[(Path, Long, Long)] = targetDirs.flatMap { d =>
      val cell = d.getName.stripPrefix("cell_id=").toLong
      subAddrs(d).filterNot(excluded).map(b => (new Path(d, s"__b=$b"), cell, b))
    }
      // a cell with a single foldable subdir gains nothing — rewriting
      // it would churn bytes for the same file count
      .groupBy(_._2).filter(_._2.length >= 2).values.flatten.toSeq
    if (sources.isEmpty) return 0
    val foldB = sources.map(_._3).distinct
    val foldCells = sources.map(_._2).distinct

    // ---- execute: intent → fold append → commit → source deletes ----
    // folding is where merge-on-read deletes become PHYSICAL: folded
    // output drops tombstoned ids (the sidecar itself is retained —
    // unfolded subdirs may still carry matching rows)
    val folded0 = spark.read.parquet(tablePath)
      .filter(col("cell_id").cast("long").isin(foldCells: _*) &&
        col("__b").cast("long").isin(foldB: _*))
    val rows = maintainedDeletes(spark, tablePath)
      .map(d => folded0.join(broadcast(d), Seq("id"), "left_anti"))
      .getOrElse(folded0)
      .withColumn("cell_id", col("cell_id").cast("long"))
      .withColumn("__b", lit(newFold))
    fs.mkdirs(compDir)
    val intent = new Path(compDir, s"c_$newFold.intent")
    fs.create(intent, true).close()
    hook("compact-intent")
    rows.repartition(col("cell_id"))
      .write.mode("append").partitionBy("cell_id", "__b").parquet(tablePath)
    hook("compact-appended")
    // atomic commit: temp-write + rename, so a crash can never leave a
    // half-listed source set that rolls forward partially
    val commit = new Path(compDir, s"c_$newFold")
    val commitTmp = new Path(compDir, s"c_$newFold.tmp")
    val out = fs.create(commitTmp, true)
    try out.write(sources
      .map { case (_, c, b) => s"cell_id=$c/__b=$b" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // THE FENCE: a zombie compactor aborts before the rename — its
    // intent + fold rows are the intent-only window recovery rolls back
    MaintainedLock.check(fs, root, lease)
    require(fs.rename(commitTmp, commit),
      s"could not commit compaction marker $commit")
    hook("compact-committed")
    sources.foreach { case (p, _, _) =>
      if (fs.exists(p)) {
        fs.delete(p, true): Unit
        // a cell whose every folded row was tombstoned writes no fold
        // subdir — drop the emptied directory (dir exists iff data)
        val parent = p.getParent
        if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
          fs.delete(parent, true): Unit
      }
    }
    fs.delete(intent, false)
    sources.length
  }

  /** Continuous query SERVING: a stream of (query id, embedding) rows
    * answered against a static corpus — the reference's request loop
    * (`coordinator/main.py:58-86`) as a structured stream instead of an
    * HTTP handler. Per micro-batch, scoring is the same broadcast
    * cross-join + codegen cosine + `TopKAggregator` bounded per-query
    * top-k as `VectorStore.searchBatch` — the corpus is scanned once
    * per batch regardless of the number of queries in it, which is the
    * batched-serving amortization the reference's per-request loop
    * can't do. Results append to `sink` (in deployment: a parquet/Kafka
    * response topic).
    *
    * `queries`: streaming (qidCol LONG, vecCol ARRAY<FLOAT>).
    * Emits (qid, id, score) per batch via foreachBatch (per-query
    * top-k is a per-batch aggregation — foreachBatch is the idiomatic
    * stream-side home for a bounded global agg over each batch).
    */
  def searchStream(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, qidCol: String, qVecCol: String, k: Int,
                   sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import graft.functions.{VectorFunctions => V}
    import graft.operators.TopK
    queries.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val scored = corpus.crossJoin(broadcast(batch))
          .select(col(qidCol), col(idCol),
            (round(V.cosine(col(vecCol), col(qVecCol)), 6) + lit(0.0))
              .as("__c"))
        val hits = TopK
          .topKPerKeyAgg(scored, Seq(col(qidCol)), col("__c"), col(idCol), k)
          .select(col(qidCol), col("id").as(idCol), col("score"))
        sink(hits, batchId)
      }
      .start()
  }

  /** Streaming corpus curation — the continuous flavor of
    * `operators.Curation.curate`. The per-row stages are stateless and
    * run unchanged on a stream: PII redaction, quantized quality +
    * repetition gates, and the deterministic md5-gate mixture sampling
    * (no RNG state to carry). Exact dedup runs with WATERMARK-BOUNDED
    * state: `dropDuplicatesWithinWatermark` on the clean-text
    * fingerprint, so a duplicate arriving within the horizon is dropped
    * and state is evicted as the watermark advances.
    *
    * Deliberately NOT streamed: the LSH near-dup tier — candidate
    * pairing is a corpus-wide self-join whose state a watermark cannot
    * bound; at scale it runs as periodic batch compaction over the
    * curated table (the standard lambda split, same discipline as
    * `streamInsertDurable` + batch reads). Dedup keeps the FIRST
    * arrival (stream semantics) where batch `curate` keeps the lowest
    * id — identical when ids arrive in order.
    *
    * Emits (idCol, stratumCol, tsCol, quality) rows that pass every gate.
    */
  def curateStream(docs: DataFrame, idCol: String, textCol: String,
                   stratumCol: String, tsCol: String, watermark: String,
                   minQuality: Double = 0.2, maxDup2gramFrac: Double = 0.5,
                   rates: Map[String, Double] = Map.empty,
                   defaultRate: Double = 1.0): DataFrame = {
    import graft.functions.{TextFunctions => T}
    import graft.operators.Sampling
    val gated = docs
      .withColumn("__clean", T.redactPii(col(textCol)))
      .withColumn("__quality", round(T.qualityScore(col("__clean")), 4))
      .withColumn("__dup2", round(T.dupFraction(T.ngrams(col("__clean"), 2)), 4))
      .filter(col("__quality") >= minQuality && col("__dup2") <= maxDup2gramFrac)
      .withColumn("__fp", T.fingerprint(col("__clean")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
    val sampled =
      if (rates.isEmpty && defaultRate >= 1.0) gated
      else Sampling.stratifiedSample(gated, col(stratumCol), col(idCol),
        rates, defaultRate)
    sampled.select(col(idCol), col(stratumCol), col(tsCol),
      col("__quality").as("quality"))
  }

  /** Continuous vector ingest: every micro-batch is validated, normalized
    * and routed through the same `VectorStore.insert` path as batch writes
    * (O1 streaming flavor — `readStream → foreachBatch(append)`).
    * `sink` receives the cumulative store after each batch.
    *
    * Each micro-batch is `localCheckpoint`ed (materialized, lineage
    * truncated) before joining the cumulative union: the foreachBatch
    * contract says the batch DataFrame must not be re-read outside the
    * call (the source may compact/expire), and without truncation the
    * union's plan would re-execute every past batch's read on each sink
    * action and grow without bound. The cumulative store itself is
    * re-checkpointed every `checkpointEvery` batches so plan size and
    * recompute depth stay O(checkpointEvery) for arbitrarily long streams.
    * (A production deployment would instead append to a durable table —
    * Parquet/Delta — and re-read it; this keeps the reference's
    * "in-memory index" semantics.)
    */
  def streamInsert(stream: DataFrame, initial: VectorStore,
                   checkpointEvery: Int = 8)
                  (sink: VectorStore => Unit): StreamingQuery = {
    var store = initial
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store = store.insert(batch.localCheckpoint())
        if (checkpointEvery > 0 && batchId % checkpointEvery == checkpointEvery - 1)
          store = store.checkpointed()
        sink(store)
      }
      .start()
  }

  /** DURABLE continuous vector ingest — the production flavor of
    * `streamInsert`: the same validate → normalize → route projection
    * (`VectorStore.prepare`) appended to an on-disk parquet table through
    * the file sink. Offsets live in `checkpointPath` and committed files
    * in the sink's `_spark_metadata` log, so a stream stopped anywhere —
    * including mid-batch — restarts with the SAME checkpoint and resumes
    * exactly-once: no lost rows, no duplicates (StreamingSpec's restart
    * test). Read the table back with `VectorStore.openDurable`.
    *
    * Scale: the sink only ever appends the current micro-batch (no
    * cumulative union, no growing lineage); at cluster scale the table
    * would be partitioned by `shard` for pruned reads.
    */
  def streamInsertDurable(stream: DataFrame, dim: Int, numShards: Int,
                          tablePath: String, checkpointPath: String): StreamingQuery =
    VectorStore.prepare(stream, dim, numShards)
      .writeStream
      .outputMode("append")
      .option("path", tablePath)
      .option("checkpointLocation", checkpointPath)
      .format("parquet")
      .start()

  /** Continuous incremental NEAR-dup ingest — the streaming flavor of
    * `Dedup.incrementalNearDups`: each micro-batch near-dups against
    * the PERSISTED signature store (never against corpus text) and
    * within itself (first/lowest id wins), then appends only the
    * survivors' signatures to the store. The state a watermark cannot
    * bound (corpus-wide near-dup needs every past signature) lives in
    * the store table instead of stream state — signatures are
    * ~(k+bands)·8 bytes/doc, and the candidate join prunes by band
    * bucket, so each micro-batch costs O(batch + collisions), not
    * O(corpus).
    *
    * Restart safety: each batch writes its survivors' signatures to a
    * batch-addressed subdirectory with overwrite semantics, so a
    * replayed micro-batch rewrites the same directory instead of
    * double-appending (foreachBatch's at-least-once becomes effectively
    * exactly-once). `onBatch` receives the surviving rows per batch.
    */
  def streamNearDupIngest(docs: DataFrame, idCol: String, textCol: String,
                          storePath: String, checkpointPath: String,
                          threshold: Double = 0.5)
                         (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val sigs = Dedup.signatureStore(batch, idCol, textCol)
          .localCheckpoint(false) // consumed by 2 dedup joins + the append
        val root = new org.apache.hadoop.fs.Path(storePath)
        // resolve against the PATH's filesystem (an object-store path
        // must not resolve against the default FS)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parts =
          if (fs.exists(root))
            fs.listStatus(root).filter(_.isDirectory)
              .map(_.getPath.toString)
              // a replayed batch must not near-dup against its own
              // previous attempt's signatures
              .filterNot(_.endsWith(s"batch_$batchId"))
          else Array.empty[String]
        val store =
          if (parts.isEmpty) sigs.limit(0)
          else spark.read.parquet(parts.toIndexedSeq: _*)
        val crossDrops = Dedup
          .incrementalNearDups(sigs, store, idCol, threshold)
          .select(col("batch_id").as(idCol))
        val withinDrops = Dedup
          .incrementalNearDups(sigs, sigs, idCol, threshold)
          .filter(col("batch_id") > col("corpus_id"))
          .select(col("batch_id").as(idCol))
        val dropIds = crossDrops.unionByName(withinDrops).distinct()
          .localCheckpoint(false) // consumed by both anti-joins below
        val survivors = batch.join(dropIds, Seq(idCol), "left_anti")
        sigs.join(dropIds, Seq(idCol), "left_anti")
          .write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
        onBatch(survivors, batchId)
        ()
      }
      .start()

  /** Continuous EVAL-LEAKAGE gate — the streaming twin of
    * [[graft.operators.Mining.semanticDecontaminate]]: every micro-batch
    * of incoming training docs is checked against the STATIC benchmark
    * set (broadcast-sized by nature), and the callback receives the
    * clean survivors plus the flagged audit rows
    * (train id, best eval match, score) — quarantine-don't-train, with
    * the evidence attached. The crawl front is exactly where eval
    * leakage enters a corpus; gating at ingest beats re-sweeping 100 TB
    * later.
    *
    * Stateless by construction: the eval set is fixed for the stream's
    * lifetime (a new benchmark drop = a new stream + one batch sweep of
    * the backlog), so each batch's verdict is a pure function of the
    * batch — replay is idempotent with no store, no watermark, no
    * batch-addressed partition to exclude.
    */
  def streamDecontaminateIngest(docs: DataFrame, idCol: String,
                                vecCol: String, evalDf: DataFrame,
                                evalIdCol: String, evalVecCol: String,
                                centroids: DataFrame, centIdCol: String,
                                centVecCol: String, nProbes: Int,
                                tau: Double, checkpointPath: String)
                               (onBatch: (DataFrame, DataFrame, Long) => Unit)
      : StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val flagged = graft.operators.Mining.semanticDecontaminate(
            batch, idCol, vecCol, evalDf, evalIdCol, evalVecCol,
            centroids, centIdCol, centVecCol, nProbes, tau)
          .localCheckpoint(false) // consumed by the anti-join + callback
        val clean = batch.join(
          flagged.select(col("train_id").as(idCol)), Seq(idCol), "left_anti")
        onBatch(clean, flagged, batchId)
        ()
      }
      .start()

  /** Continuous paragraph-level ingest dedup — the streaming twin of
    * `Dedup.incrementalParagraphDedup`: each micro-batch is rewritten
    * against the paragraph-fingerprint store (corpus-known paragraphs
    * drop, then the batch's own first-occurrence pick runs), and the
    * batch's SURVIVING paragraphs' fingerprints append to the store as
    * a batch-addressed partition.
    *
    * Unbounded state lives in the store TABLE (~16 B/distinct
    * paragraph), never in stream state. Replay-safe the same way as
    * [[streamNearDupIngest]]: the store partition is keyed by batchId
    * and overwrite-mode, so a mid-batch crash replays into the same
    * path (no duplicate fingerprints), and a replayed batch excludes
    * its own previous attempt's partition from the corpus side (no
    * self-dedup of the retry).
    */
  def streamParagraphIngest(docs: DataFrame, idCol: String, textCol: String,
                            storePath: String, checkpointPath: String,
                            paraTokens: Int = 10)
                           (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(storePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parts =
          if (fs.exists(root))
            fs.listStatus(root).filter(_.isDirectory)
              .map(_.getPath.toString)
              .filterNot(_.endsWith(s"batch_$batchId"))
          else Array.empty[String]
        val empty = Dedup.paragraphFingerprints(batch.limit(0), textCol,
          paraTokens)
        val store =
          if (parts.isEmpty) empty
          else spark.read.schema(empty.schema).parquet(parts.toIndexedSeq: _*)
        val rewritten = Dedup.paragraphDedupAgainstFps(batch, store,
            idCol, textCol, paraTokens)
          .localCheckpoint(false) // consumed by the append AND onBatch
        // the store grows by the fingerprints this batch now owns
        Dedup.paragraphFingerprints(
            rewritten.select(col("text_dedup").as(textCol)), textCol,
            paraTokens)
          .write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
        onBatch(rewritten, batchId)
        ()
      }
      .start()

  /** Continuous crawl-frontier URL dedup — the streaming twin of
    * `q_url_dedup`: each micro-batch canonicalizes its URLs
    * (`UrlFunctions.canonicalizeUrl`), drops rows whose canonical URL
    * already exists in the persisted URL store or earlier in the same
    * batch (first-seen = min idCol wins), and appends the SURVIVORS'
    * 128-bit canonical-URL fingerprints to the store as a
    * batch-addressed partition.
    *
    * The store holds one md5 fingerprint per distinct canonical URL
    * (16 B + hex overhead) — unbounded frontier state lives in the store
    * TABLE, never in stream state, so a year-long crawl's memory is a
    * parquet directory, not executor heap. Rows whose URL is not
    * absolute canonicalize to NULL and PASS THROUGH undeduplicated (a
    * real frontier always carries junk URLs; merging them under one
    * fallback key would silently drop every junk row after the first as
    * a "duplicate" of an unrelated record). Replay-safe the same way as
    * [[streamNearDupIngest]]: the store partition is keyed by batchId
    * and written overwrite-mode, so a mid-batch crash replays into the
    * same path (no duplicate fingerprints), and a replayed batch
    * excludes its own previous attempt's partition from the store side
    * (no self-dedup of the retry).
    */
  def streamUrlDedupIngest(docs: DataFrame, idCol: String, urlCol: String,
                           storePath: String, checkpointPath: String)
                          (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val keyed = batch
          .withColumn("__uf", md5(graft.functions.UrlFunctions
            .canonicalizeUrl(col(urlCol)).cast("binary")))
          .localCheckpoint(false) // consumed by anti-join, argmin + append
        val root = new org.apache.hadoop.fs.Path(storePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parts =
          if (fs.exists(root))
            fs.listStatus(root).filter(_.isDirectory)
              .map(_.getPath.toString)
              .filterNot(_.endsWith(s"batch_$batchId"))
          else Array.empty[String]
        val store =
          if (parts.isEmpty) keyed.select(col("__uf")).limit(0)
          else spark.read.parquet(parts.toIndexedSeq: _*)
        // malformed URLs (NULL fingerprint) bypass dedup entirely
        val malformed = keyed.filter(col("__uf").isNull)
        // store-known canonical URLs drop map-side (fingerprint
        // anti-join); then the batch's own first occurrence per
        // fingerprint survives via a map-side-combinable min aggregate.
        // dropDuplicates first: a batch re-emitting an identical
        // (id, url) row would otherwise survive the semi-join twice and
        // double-write its fingerprint
        val fresh = keyed.filter(col("__uf").isNotNull)
          .dropDuplicates("__uf", idCol)
          .join(store, Seq("__uf"), "left_anti")
        val firstSeen = fresh.groupBy(col("__uf"))
          .agg(min(col(idCol)).as(idCol))
        val survivors = fresh.join(firstSeen, Seq("__uf", idCol), "left_semi")
          .localCheckpoint(false) // consumed by the append AND onBatch
        survivors.select(col("__uf"))
          .write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
        onBatch(survivors.drop("__uf").unionByName(malformed.drop("__uf")),
          batchId)
        ()
      }
      .start()

  /** Continuous media ingest with frame-signature near-dup — the
    * streaming twin of `q_video_dedup`: each micro-batch frame-samples
    * its videos (`Multimodal.frameSignatures`, every `every`-th frame,
    * rasters never leave the decode boundary), drops videos sharing
    * ≥ `minShared` sampled-frame signatures with a single persisted
    * STORE video or with a surviving SMALLER-id video of the same
    * batch, and appends the SURVIVORS' signatures (keyed by their video
    * id) as a batch-addressed partition.
    *
    * Matching semantics (both sides mirror `q_video_dedup`'s per-PAIR
    * ≥ minShared contract):
    *   - store probe: signatures are grouped by the STORE-side video id
    *     before the threshold — a batch video sharing one frame each
    *     with two different stored videos is NOT a near-dup of either
    *     and survives (a pooled-store count would over-drop).
    *   - within batch: the pair graph (`Dedup.sharedSigPairs`, hot-
    *     bucket-capped like text LSH) resolves by GREEDY id order — a
    *     video drops only for a SURVIVING smaller-id near-dup; a video
    *     whose smaller near-dups were all themselves dropped (by the
    *     store or by even smaller ids) is kept, exactly as a sequential
    *     scan in id order would decide. The fixpoint decides at least
    *     the minimum undecided id per round (rounds ≤ dependency-chain
    *     depth, bounded by `maxRounds`, throwing rather than
    *     mis-deciding on a pathological chain).
    *
    * Signature = (frame_idx, dims, exact integer channel sums) — the
    * `q_video_dedup` key, integer-exact across engines and replays. The
    * store holds (video id, signature) rows only (a few longs per
    * sampled frame), so a year-long media crawl's state is a parquet
    * directory, not executor heap. Replay-safe the same way as
    * [[streamUrlDedupIngest]]: the store partition is keyed by batchId
    * and written overwrite-mode, so a mid-batch crash replays into the
    * same path (no duplicate signatures) and a replayed batch excludes
    * its own previous attempt's partition from the store side (no
    * self-dedup of the retry).
    */
  def streamFrameSigIngest(media: DataFrame, idCol: String, binCol: String,
                           storePath: String, checkpointPath: String,
                           every: Int = 2, minShared: Int = 2,
                           maxBucket: Int = Dedup.DefaultMaxBucket,
                           maxRounds: Int = 30)
                          (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    streamSigIngest(media, idCol, storePath, checkpointPath,
      Seq("__f", "__w", "__h", "__s0", "__s1", "__s2"),
      batch => graft.operators.Multimodal.frameSignatures(
          batch.select(col(idCol), col(binCol)), binCol, every)
        .select(col(idCol).as("__id"),
          col("sig.frame_idx").as("__f"),
          col("sig.width").as("__w"), col("sig.height").as("__h"),
          col("sig.s0").as("__s0"), col("sig.s1").as("__s1"),
          col("sig.s2").as("__s2")),
      minShared, maxBucket, maxRounds)(onBatch)

  /** Continuous AUDIO ingest with window-signature near-dup — the
    * `q_audio_dedup` streaming twin, completing image/video/audio parity
    * on the streaming side: same store/batch matching contract as
    * [[streamFrameSigIngest]] (per-store-clip threshold, capped batch
    * pair graph, greedy-by-id fixpoint, batch-addressed replay-safe
    * store), with signature = (win_idx, Σ samples, Σ |samples|) from
    * `Multimodal.audioWindowSignatures` — PCM never leaves the decode
    * boundary.
    */
  def streamAudioSigIngest(media: DataFrame, idCol: String, binCol: String,
                           storePath: String, checkpointPath: String,
                           winSize: Int = 16, minShared: Int = 2,
                           maxBucket: Int = Dedup.DefaultMaxBucket,
                           maxRounds: Int = 30)
                          (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    streamSigIngest(media, idCol, storePath, checkpointPath,
      Seq("__w", "__ws", "__wa"),
      batch => graft.operators.Multimodal.audioWindowSignatures(
          batch.select(col(idCol), col(binCol)), binCol, winSize)
        .select(col(idCol).as("__id"),
          col("sig.win_idx").as("__w"),
          col("sig.wsum").as("__ws"), col("sig.wabs").as("__wa")),
      minShared, maxBucket, maxRounds)(onBatch)

  /** Shared signature-ingest engine behind the media streaming twins:
    * `extract` turns a micro-batch into (__id, sigCols…) signature rows;
    * everything else — store probe grouped by the STORE-side id, capped
    * within-batch pair graph, greedy-by-id fixpoint, batch-addressed
    * overwrite-mode store append — is the contract documented on
    * [[streamFrameSigIngest]].
    */
  private def streamSigIngest(media: DataFrame, idCol: String,
                              storePath: String, checkpointPath: String,
                              sigCols: Seq[String],
                              extract: DataFrame => DataFrame,
                              minShared: Int, maxBucket: Int, maxRounds: Int)
                             (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    streamDedupIngest(media, idCol, storePath, checkpointPath, sigCols,
      extract,
      // ≥ minShared signatures shared with ONE stored item → near-dup
      // (grouped by the store-side id, never pooled)
      (sigs, store) => sigs.join(store, sigCols)
        .groupBy(col("__id"), col("__vid"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") >= minShared)
        .select(col("__id")).distinct(),
      // within-batch near-dup pair graph (id_a < id_b), hot-bucket
      // capped — only sig tuples shuffle, bucket = replica-group size
      sigs => Dedup.sharedSigPairs(sigs, "__id", sigCols, minShared, maxBucket)
        .select(col("id_a"), col("id_b")),
      maxRounds)(onBatch)

  /** Continuous IMAGE ingest with perceptual (dHash) near-dup — the
    * `q_dhash_neardup` streaming twin, completing the media-streaming
    * matrix beside [[streamFrameSigIngest]] (video) and
    * [[streamAudioSigIngest]] (audio). Per micro-batch: each decodable
    * PPM payload hashes once (`Multimodal.dhashed`); the store probe is
    * band-candidates (pigeonhole-complete for hamming ≤ bands−1)
    * verified by exact `bit_count(xor)` against every stored hash it
    * bands with; the within-batch pair graph is
    * `Multimodal.dhashPairsFromHashes` (capped band buckets, exact
    * verify); decisions and the batch-addressed replay-safe store
    * append follow the [[streamFrameSigIngest]] contract. Store rows
    * are (__vid, __h) — one long per image; bands recompute from the
    * hash on read, so the store never persists derivable columns.
    */
  def streamImageSigIngest(media: DataFrame, idCol: String, binCol: String,
                           storePath: String, checkpointPath: String,
                           maxHamming: Int = 3, bands: Int = 4,
                           maxBucket: Int = Dedup.DefaultMaxBucket,
                           maxRounds: Int = 30)
                          (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    streamDedupIngest(media, idCol, storePath, checkpointPath, Seq("__h"),
      batch => graft.operators.Multimodal.dhashed(
          batch.select(col(idCol), col(binCol)), binCol)
        .select(col(idCol).as("__id"), col("dh.dhash").as("__h")),
      (sigs, store) => {
        val sb = graft.operators.Multimodal.bandedHashes(sigs, "__id", bands)
        val stb = graft.operators.Multimodal.bandedHashes(
          store.select(col("__vid"), col("__h")), "__vid", bands)
        sb.join(stb, Seq("band_idx", "bv"))
          .select(col("__id"), col("__vid")).distinct()
          .join(sigs, Seq("__id"))
          .join(store.select(col("__vid"), col("__h").as("__sh")),
            Seq("__vid"))
          .filter(bit_count(col("__h").bitwiseXOR(col("__sh"))) <= maxHamming)
          .select(col("__id")).distinct()
      },
      sigs => graft.operators.Multimodal.dhashPairsFromHashes(
          sigs, "__id", maxHamming, bands, maxBucket)
        .select(col("id_a"), col("id_b")),
      maxRounds)(onBatch)

  /** Shared continuous-dedup-ingest engine behind ALL the media
    * streaming twins: `extract` turns a micro-batch into
    * (__id, storeCols…) signature rows; `probe(sigs, store)` returns
    * the batch __ids that near-dup ANY stored item; `pairGen(sigs)`
    * builds the within-batch (id_a, id_b) pair graph. Everything else —
    * store listing/schema-guarding, greedy-by-id fixpoint,
    * batch-addressed overwrite-mode store append — is the contract
    * documented on [[streamFrameSigIngest]].
    */
  private def streamDedupIngest(media: DataFrame, idCol: String,
                                storePath: String, checkpointPath: String,
                                storeCols: Seq[String],
                                extract: DataFrame => DataFrame,
                                probe: (DataFrame, DataFrame) => DataFrame,
                                pairGen: DataFrame => DataFrame,
                                maxRounds: Int)
                               (onBatch: (DataFrame, Long) => Unit): StreamingQuery =
    media.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val sigs = extract(batch)
          .localCheckpoint(false) // store probe + pair join + append
        val root = new org.apache.hadoop.fs.Path(storePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val parts =
          if (fs.exists(root))
            fs.listStatus(root).filter(_.isDirectory)
              .map(_.getPath.toString)
              .filterNot(_.endsWith(s"batch_$batchId"))
          else Array.empty[String]
        val store =
          if (parts.isEmpty)
            sigs.select((col("__id").as("__vid") +: storeCols.map(col)): _*)
              .limit(0)
          else {
            val st = spark.read.parquet(parts.toIndexedSeq: _*)
            // loud, actionable failure on a store written by an older
            // signature schema (e.g. the pre-round-6 frame store had only
            // (__f, __s0..__s2) from rounded float means) — an
            // AnalysisException deep inside the probe join would be
            // undiagnosable from a streaming driver log
            val want = "__vid" +: storeCols
            val missing = want.filterNot(st.columns.contains)
            if (missing.nonEmpty)
              throw new IllegalStateException(
                s"incompatible signature store at $storePath: existing " +
                  s"partitions lack column(s) ${missing.mkString(", ")} " +
                  s"(expected schema: ${want.mkString(", ")}). The store " +
                  "format changed; point storePath at a fresh directory " +
                  "and re-ingest — old signatures cannot be migrated " +
                  "(they were computed by a different kernel).")
            st
          }
        val storeHits = probe(sigs, store)
          .localCheckpoint(false) // fixpoint seed, re-read every round
        val pairs = pairGen(sigs)
          .localCheckpoint(false)
        // greedy-by-id fixpoint: kept/dropped/undecided
        val ids = sigs.select(col("__id")).distinct()
        var dropped = storeHits
        var kept = ids.limit(0)
        var undecided = ids.join(dropped, Seq("__id"), "left_anti")
          .localCheckpoint(false)
        var rounds = 0
        while (!undecided.isEmpty) {
          if (rounds >= maxRounds)
            throw new IllegalStateException(
              s"frame-sig greedy resolution did not converge in $maxRounds" +
                " rounds; raise maxRounds")
          // pairs whose smaller side is NOT dropped still block
          val live = pairs.join(dropped.withColumnRenamed("__id", "id_a"),
            Seq("id_a"), "left_anti")
          val byKept = live.join(kept.withColumnRenamed("__id", "id_a"),
              Seq("id_a"), "left_semi")
            .select(col("id_b").as("__id")).distinct()
          val byAny = live.select(col("id_b").as("__id")).distinct()
          val newDropped = undecided.join(byKept, Seq("__id"), "left_semi")
          val newKept = undecided.join(byAny, Seq("__id"), "left_anti")
          dropped = dropped.unionByName(newDropped).localCheckpoint(false)
          kept = kept.unionByName(newKept).localCheckpoint(false)
          undecided = undecided
            .join(newDropped.unionByName(newKept), Seq("__id"), "left_anti")
            .localCheckpoint(false)
          rounds += 1
        }
        val survivors = batch
          .join(dropped.withColumnRenamed("__id", idCol), Seq(idCol),
            "left_anti")
          .localCheckpoint(false) // consumed by the append AND onBatch
        sigs.join(survivors.select(col(idCol).as("__id")), Seq("__id"),
            "left_semi")
          .select((col("__id").as("__vid") +: storeCols.map(col)): _*)
          .write.mode("overwrite").parquet(s"$storePath/batch_$batchId")
        onBatch(survivors, batchId)
        ()
      }
      .start()
}
