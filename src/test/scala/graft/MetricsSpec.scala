package graft

import org.apache.spark.sql.functions._
import graft.metrics.Metrics

class MetricsSpec extends SparkSpec {

  test("engine counters track jobs/tasks; operator counters aggregate from executors") {
    val m = Metrics.start(spark)
    try {
      val inserts = m.counter("inserts_total")
      val df = spark.range(1000).repartition(4)
      df.foreachPartition { rows: Iterator[java.lang.Long] =>
        var n = 0L
        rows.foreach(_ => n += 1)
        inserts.add(n)
      }
      // listener events are delivered asynchronously; wait for the bus
      org.apache.spark.sql.GraftShim.waitForListenerBus(spark)
      assert(inserts.value == 1000L)
      val snap = m.snapshot().toMap
      assert(snap("graft_jobs_started_total") >= 1)
      assert(snap("graft_jobs_succeeded_total") >= 1)
      assert(snap("graft_tasks_completed_total") >= 4)
      assert(snap("graft_inserts_total") == 1000L)
    } finally m.close()
  }

  test("observe computes per-query metrics inline with the query's own pass") {
    val m = Metrics.start(spark)
    try {
      val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      val (df, obs) = m.observe(e, "scan_stats",
        count(lit(1)).as("rows"), approx_count_distinct(col("label")).as("labels"))
      val n = df.filter(col("vec_id") >= 0).count()
      val row = obs.get
      assert(row("rows") == n)
      assert(row("labels").asInstanceOf[Long] >= 9L)
    } finally m.close()
  }

  test("prometheusText renders the standard exposition format") {
    val m = Metrics.start(spark)
    try {
      m.counter("searches_total").add(3)
      spark.range(10).count()
      org.apache.spark.sql.GraftShim.waitForListenerBus(spark)
      val text = m.prometheusText()
      val lines = text.split("\n")
      assert(lines.contains("graft_searches_total 3"))
      assert(lines.exists(_.startsWith("# TYPE graft_jobs_started_total counter")))
      // every non-comment line is "name value" with a numeric value
      val metricLine = "^[a-z_]+ \\d+$".r
      lines.filterNot(_.startsWith("#")).filter(_.nonEmpty).foreach { l =>
        assert(metricLine.matches(l), s"bad exposition line: $l")
      }
    } finally m.close()
  }
}
