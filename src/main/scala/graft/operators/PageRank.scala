package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the link-structure
  * quality prior large-scale crawl curation keys on (host-level ranks
  * decide which of 100 TB of pages are worth keeping; cf. the Common
  * Crawl host-rank datasets). Power iteration with damping and explicit
  * dangling-mass redistribution:
  *
  *   r₀(n)    = S/N
  *   r_{k+1}(n) = (1−d)·S/N + d·(Σ_{m→n} r_k(m)/deg(m) + D_k/N)
  *
  * where S is the micro-unit mass scale, D_k the mass parked on dangling
  * (out-degree-0) nodes, and every division is rounded to integer micro
  * units — ranks stay exact BIGINTs both engines reproduce bit-for-bit
  * (the DuckDB oracle unrolls the same iterations as CTEs; a float
  * formulation would drift with summation order).
  *
  * Scale shape: per iteration, ONE join of the edge list with the rank
  * table on src (shuffle keyed by src — at 100 TB the edge list is
  * pre-bucketed by src so this is exchange-free) and one map-side-
  * combined sum per dst; the dangling mass is a single-scalar driver
  * aggregate (bounded at any graph size). Rank tables are
  * localCheckpointed per round — the iterative-lineage discipline
  * `Dedup.connectedComponents` established (cluster deployments swap in
  * storage-backed checkpoints). Fixed `iters` (not convergence-probed)
  * keeps the oracle replicable; rank studies show ~5 damped iterations
  * already separate head from tail, which is what a keep/drop curation
  * gate needs.
  */
object PageRank {

  /** (node, r_micro) after `iters` damped rounds; Σ r_micro ≈ scale. */
  def ranks(spark: SparkSession, edges: DataFrame,
            srcCol: String, dstCol: String,
            iters: Int = 5, damping: Double = 0.85,
            scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1), got $damping")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val base = math.round((1.0 - damping) * scale / n)
    var r = nodes.select(col("node"),
      lit(math.round(scale.toDouble / n)).as("r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      // mass parked on dangling nodes this round: one scalar to the driver
      val dangling = r.join(deg, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L))).head.getLong(0)
      val dShare = math.round(dangling.toDouble / n)
      val inflow = e
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          round(col("r").cast("double") / col("deg")).cast("long").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      r = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            round((coalesce(col("inflow"), lit(0L)) + lit(dShare))
              .cast("double") * lit(damping)).cast("long")).as("r"))
        .localCheckpoint(false)
    }
    r.withColumnRenamed("r", "r_micro")
  }
}
