package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.search.VectorStore

/** Structured Streaming surface — the extension the reference lacks
  * entirely (its only "streams" are CUDA async streams and asyncio
  * request concurrency, SURVEY.md §2.2).
  */
object Streaming {

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
}
