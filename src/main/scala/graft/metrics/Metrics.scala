package graft.metrics

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.util.LongAccumulator

/** Runtime observability — the reference's Prometheus surface
  * (`coordinator/main.py:16-21` defines Counters, `:37-40` serves
  * `/metrics`) re-expressed Spark-native:
  *
  *  - ENGINE counters from a `SparkListener`: jobs started / succeeded /
  *    failed, tasks completed, records read, shuffle bytes written —
  *    the coordinator-level health the reference tracks by hand.
  *  - OPERATOR counters as named `LongAccumulator`s: incremented on
  *    executors anywhere in a pipeline, aggregated by the driver — the
  *    cluster-correct replacement for the reference's in-process ints
  *    (which under-count the moment there is more than one process).
  *  - PER-QUERY metrics via `observe` (`Dataset.observe` /
  *    `Observation`): arbitrary aggregates computed inline with the
  *    query, no second job over the data.
  *  - `prometheusText()` renders the standard text exposition format,
  *    scrape-ready; binding it to an HTTP endpoint is deployment wiring,
  *    deliberately outside the library (the reference hard-codes aiohttp).
  *
  * Listener callbacks are driver-side and O(1) per event, so the overhead
  * is negligible at any cluster size.
  */
final class Metrics private (spark: SparkSession) extends AutoCloseable {

  private val jobsStarted = new AtomicLong
  private val jobsSucceeded = new AtomicLong
  private val jobsFailed = new AtomicLong
  private val tasksCompleted = new AtomicLong
  private val recordsRead = new AtomicLong
  private val shuffleBytesWritten = new AtomicLong

  private val listener = new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobsStarted.incrementAndGet()
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      e.jobResult match {
        case org.apache.spark.scheduler.JobSucceeded => jobsSucceeded.incrementAndGet()
        case _ => jobsFailed.incrementAndGet()
      }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      tasksCompleted.incrementAndGet()
      val m = e.taskMetrics
      if (m != null) {
        recordsRead.addAndGet(m.inputMetrics.recordsRead)
        shuffleBytesWritten.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }
  spark.sparkContext.addSparkListener(listener)

  private val counters = TrieMap.empty[String, LongAccumulator]

  /** Named operator counter (cluster-aggregated accumulator): call
    * `counter("inserts_total").add(1)` from any executor-side code path.
    * Idempotent per name.
    */
  def counter(name: String): LongAccumulator =
    counters.getOrElseUpdate(name, spark.sparkContext.longAccumulator(name))

  /** Attach per-query observed metrics: aggregates computed inline with
    * the query's own pass over the data (no extra job). Read them from
    * the returned `Observation` after an action completes.
    */
  def observe(df: DataFrame, name: String, metric: Column,
              more: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, metric, more: _*), obs)
  }

  /** Current values of every engine and operator counter. */
  def snapshot(): Seq[(String, Long)] =
    Seq(
      "graft_jobs_started_total" -> jobsStarted.get,
      "graft_jobs_succeeded_total" -> jobsSucceeded.get,
      "graft_jobs_failed_total" -> jobsFailed.get,
      "graft_tasks_completed_total" -> tasksCompleted.get,
      "graft_records_read_total" -> recordsRead.get,
      "graft_shuffle_bytes_written_total" -> shuffleBytesWritten.get
    ) ++ counters.toSeq.sortBy(_._1).map { case (n, acc) =>
      s"graft_$n" -> acc.value.longValue
    }

  /** Prometheus text exposition (version 0.0.4) of `snapshot()` — the
    * body the reference serves from `/metrics`.
    */
  def prometheusText(): String = {
    val sb = new StringBuilder
    snapshot().foreach { case (name, v) =>
      sb.append("# TYPE ").append(name).append(" counter\n")
      sb.append(name).append(' ').append(v).append('\n')
    }
    sb.result()
  }

  override def close(): Unit =
    spark.sparkContext.removeSparkListener(listener)
}

object Metrics {
  /** Start collecting for this session. `close()` detaches the listener. */
  def start(spark: SparkSession): Metrics = new Metrics(spark)
}
