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
    // convergence probe = ONE full-scan aggregate per round; a limit(1)
    // probe would stop after the first undone partition and leave the
    // lazy localCheckpoint partially cached, forcing the next round's
    // join to recompute the rest — the full aggregate materializes every
    // partition AND answers convergence in the same job
    def undone(): Long = state
      .agg(coalesce(sum(when(col("done"), 0L).otherwise(1L)), lit(0L)).as("u"))
      .head.getLong(0)
    while (undone() > 0) {
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
    * rounds with at most n·d rows ever materialized. The n·d row count
    * is the closure's DEFINITION, not an implementation detail — a
    * 100k-message reply thread (one linear chain, d = n) closes to
    * n²/2 ≈ 5 billion rows. `maxRows` is the budget that makes that
    * loud: the per-round fixpoint count is checked against it and the
    * run THROWS (same discipline as `maxIters` — never a silently
    * partial or cluster-melting closure). Size it to rows you are
    * willing to shuffle; for tree-shaped data expect ≈ nodes × height.
    * Works on DAGs and even cyclic graphs as min-distance reachability
    * (the min aggregate makes the fixpoint well-defined); self-edges
    * are dropped from the seed. Fixpoint = no new pairs; `maxIters`
    * bounds the rounds.
    */
  def ancestorClosure(edges: DataFrame, childCol: String, parentCol: String,
                      maxIters: Int = 30,
                      maxRows: Long = 1L << 31): DataFrame = {
    require(maxRows >= 1, s"maxRows must be >= 1, got $maxRows")
    var closure = edges
      .select(col(childCol).cast("long").as("node"),
        col(parentCol).cast("long").as("anc"))
      .filter(col("node") =!= col("anc"))
      .withColumn("dist", lit(1L))
      .localCheckpoint(false)
    var prev = -1L
    var n = closure.count()
    var iters = 0
    def checkBudget(): Unit = if (n > maxRows)
      throw new IllegalStateException(
        s"ancestor closure exceeded the $maxRows-row budget at $n rows " +
          "(closure size is nodes × depth by definition — a deep chain " +
          "like a linear reply thread closes quadratically; raise maxRows " +
          "only if you intend to shuffle that many rows, or use " +
          "rootAndDepth for per-node root/depth without the full closure)")
    checkBudget()
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
      checkBudget()
      iters += 1
    }
    closure
  }

  /** Proper-descendant counts per node (nodes with zero descendants are
    * absent — left-join against the node list to zero-fill), from
    * [[ancestorClosure]]: one map-side-combinable count over the
    * closure. The "subtree size" rollup of org/category/BOM analytics.
    */
  def subtreeSizes(edges: DataFrame, childCol: String, parentCol: String,
                   maxIters: Int = 30, maxRows: Long = 1L << 31): DataFrame =
    ancestorClosure(edges, childCol, parentCol, maxIters, maxRows)
      .groupBy(col("anc").as("node"))
      .agg(count(lit(1)).as("n_desc"))
}
