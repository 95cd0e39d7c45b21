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

  /** Full transitive ANCESTOR closure — every (node, ancestor, dist)
    * pair — by closure doubling: each round joins the closure with
    * itself ((n, a, d₁) ⋈ (a, b, d₂) → (n, b, d₁+d₂)) and keeps the
    * MIN distance per pair, so a depth-d hierarchy closes in O(log d)
    * rounds with at most n·d rows ever materialized (document the d
    * factor before running this on deep chains — for tree-shaped data
    * d is the tree height). Works on DAGs and even cyclic graphs as
    * min-distance reachability (the min aggregate makes the fixpoint
    * well-defined); self-edges are dropped from the seed. Fixpoint =
    * no new pairs; `maxIters` bounds the rounds (throw, never a
    * silently partial closure).
    */
  def ancestorClosure(edges: DataFrame, childCol: String, parentCol: String,
                      maxIters: Int = 30): DataFrame = {
    var closure = edges
      .select(col(childCol).cast("long").as("node"),
        col(parentCol).cast("long").as("anc"))
      .filter(col("node") =!= col("anc"))
      .withColumn("dist", lit(1L))
      .localCheckpoint(false)
    var prev = -1L
    var n = closure.count()
    var iters = 0
    while (n != prev) {
      if (iters >= maxIters)
        throw new IllegalStateException(
          s"closure did not stabilize in $maxIters doubling rounds")
      val x = closure.select(col("node"), col("anc").as("__mid"),
        col("dist").as("__d1"))
      val y = closure.select(col("node").as("__mid"), col("anc").as("__anc"),
        col("dist").as("__d2"))
      val jumped = x.join(y, Seq("__mid"))
        .select(col("node"), col("__anc").as("anc"),
          (col("__d1") + col("__d2")).as("dist"))
      closure = closure.unionByName(jumped)
        .groupBy(col("node"), col("anc"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
      prev = n
      n = closure.count()
      iters += 1
    }
    closure
  }

  /** Proper-descendant counts per node (nodes with zero descendants are
    * absent — left-join against the node list to zero-fill), from
    * [[ancestorClosure]]: one map-side-combinable count over the
    * closure. The "subtree size" rollup of org/category/BOM analytics.
    */
  def subtreeSizes(edges: DataFrame, childCol: String,
                   parentCol: String): DataFrame =
    ancestorClosure(edges, childCol, parentCol)
      .groupBy(col("anc").as("node"))
      .agg(count(lit(1)).as("n_desc"))
}
