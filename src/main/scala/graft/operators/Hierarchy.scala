package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive hierarchy expansion — the `WITH RECURSIVE` ancestor-closure
  * surface Spark SQL lacks natively (org charts, category trees,
  * bill-of-materials, reply threads), expressed Spark-first as POINTER
  * DOUBLING rather than one join per level: each round every node's
  * known ancestor pointer jumps to ITS ancestor, so a depth-d hierarchy
  * closes in O(log d) rounds (the `Dedup.connectedComponents`
  * discipline — same localCheckpoint-per-round, same fixpoint throw
  * instead of silently truncated results at maxIters).
  */
object Hierarchy {

  /** (node, root, depth) for every node in `edges` (childCol, parentCol).
    *
    * A node whose parent equals itself is a ROOT (depth 0); every other
    * node must reach one — a cycle or a dangling parent chain never
    * reaches a self-parent and throws at `maxIters` (per-level
    * recursion would loop forever on a cycle; the bound makes the
    * malformed input loud). Each round: one self-join on the ancestor
    * pointer + an any-non-root count (the convergence action); only
    * (node, anc, depth) longs shuffle, state is one row per node.
    */
  def rootAndDepth(edges: DataFrame, childCol: String, parentCol: String,
                   maxIters: Int = 30): DataFrame = {
    var state = edges
      .select(col(childCol).cast("long").as("node"),
        col(parentCol).cast("long").as("anc"))
      .withColumn("depth",
        when(col("anc") === col("node"), 0L).otherwise(1L))
      .withColumn("done", col("anc") === col("node"))
      .localCheckpoint(false)
    var iters = 0
    while (state.filter(!col("done")).limit(1).count() > 0) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"hierarchy did not close in $maxIters pointer-doubling rounds " +
            "(cycle, dangling parent, or depth > 2^maxIters)")
      val jump = state.select(col("node").as("__jn"), col("anc").as("__ja"),
        col("depth").as("__jd"), col("done").as("__jdone"))
      state = state.join(jump, col("anc") === col("__jn"), "left")
        .select(col("node"),
          when(col("done") || col("__ja").isNull, col("anc"))
            .otherwise(col("__ja")).as("anc"),
          when(col("done") || col("__jd").isNull, col("depth"))
            .otherwise(col("depth") + col("__jd")).as("depth"),
          (col("done") || coalesce(col("__jdone"), lit(false))).as("done"))
        .localCheckpoint(false)
      iters += 1
    }
    state.select(col("node"), col("anc").as("root"), col("depth"))
  }
}
