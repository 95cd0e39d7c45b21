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
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q5_join", "q_filtered_topk", "q_topk_cosine", "q1_agg", "q_range_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
