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
    names.foreach {
      // plan-audit shapes for the serve-walk internals (not declared
      // queries): the descent's entry-discovery agg and one fused
      // per-step fetch, against the parquet embeddings table — pins
      // ReadSchema/PushedFilters on the serving hot path
      case "descent_tops" =>
        println(s"\n========== descent_tops ==========")
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding"))
        graft.operators.Ann.descentTops(e, "vec_id", fanout = 8,
          maxLevel = 2).explain("formatted")
      case "walk_fetch" =>
        println(s"\n========== walk_fetch ==========")
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding"))
        val edges = e.limit(0).select(
          org.apache.spark.sql.functions.col("vec_id").as("src"),
          org.apache.spark.sql.functions.col("vec_id").as("dst"))
        val dir = java.nio.file.Files
          .createTempDirectory("graft_plan_edges_").toString
        graft.operators.Ann.writeEdges(edges, dir, files = 1)
        val layer = spark.read.parquet(dir)
        graft.operators.Ann.fetchWalkPlan(e, "vec_id", "embedding",
          Array.fill(4)(0.1f), 1.0, toScore = Seq(1L, 2L, 3L),
          layers = Seq(layer), toExpand = Seq((0, Seq(1L, 2L, 3L))))
          .get.explain("formatted")
      case n =>
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
