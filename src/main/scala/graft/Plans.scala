package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of selected queries (plan-
  * quality review — pushdown, broadcast choice, codegen spans).
  * Usage: runMain graft.Plans [queryName ...]  (default: a headline set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("GRAFT_ACC_DEBUG")) {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val eid = Option(js.properties)
            .map(_.getProperty("spark.sql.execution.id")).orNull
          val desc = Option(js.properties)
            .map(_.getProperty("spark.job.description")).orNull
          System.err.println(
            s"[accdbg] t=${System.currentTimeMillis()} jobStart " +
              s"${js.jobId} exec=$eid desc=$desc")
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          System.err.println(
            s"[accdbg] t=${System.currentTimeMillis()} jobEnd ${je.jobId}")
        override def onOtherEvent(e: SparkListenerEvent): Unit =
          e match {
            case s: org.apache.spark.sql.execution.ui
                .SparkListenerSQLExecutionStart =>
              def accIds(p: org.apache.spark.sql.execution.SparkPlanInfo)
                  : Seq[Long] =
                p.metrics.map(_.accumulatorId) ++
                  p.children.flatMap(accIds)
              val accs = accIds(s.sparkPlanInfo)
              val rng = if (accs.isEmpty) "-"
                else s"${accs.min}..${accs.max} (${accs.size})"
              System.err.println(
                s"[accdbg] t=${System.currentTimeMillis()} sqlStart " +
                  s"${s.executionId} accs=$rng ${s.description.take(60)}")
            case s: org.apache.spark.sql.execution.ui
                .SparkListenerSQLExecutionEnd =>
              System.err.println(
                s"[accdbg] t=${System.currentTimeMillis()} sqlEnd " +
                  s"${s.executionId}")
            case _ =>
          }
      })
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q5_join", "q_filtered_topk", "q_topk_cosine", "q1_agg", "q_range_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
