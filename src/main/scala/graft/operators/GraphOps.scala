package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph construction + counting beyond `PageRank`/`Dedup
  * .connectedComponents`: co-occurrence projection and triangle counting
  * — the link-structure signals (mirror rings, engagement farms, topic
  * cliques) crawl curation reads next to PageRank scores.
  */
object GraphOps {

  /** Item-item co-occurrence projection of a bipartite (user, item)
    * table: an edge (ia, ib) weighted by the number of distinct users
    * touching both, keeping edges with ≥ minShared users.
    *
    * The quadratic hazard is the per-user pair blow-up (one 10⁶-degree
    * user yields 10¹² pairs); `maxPerUser` caps each user's
    * contribution to its first `maxPerUser` items in item order — a
    * DETERMINISTIC cap (row_number over a total order, not a sample),
    * so results are stable across runs and engines and the oracle can
    * replicate it. Pair generation is a self-join on the user key:
    * shuffle carries (user, item) ids only, ≤ maxPerUser² pairs per
    * user.
    */
  def cooccurrenceEdges(df: DataFrame, user: Column, item: Column,
                        minShared: Long = 2L,
                        maxPerUser: Int = 256): DataFrame = {
    require(maxPerUser >= 2, s"maxPerUser must be >= 2, got $maxPerUser")
    val ui = df.select(user.as("u"), item.as("i")).distinct()
    val w = Window.partitionBy(col("u")).orderBy(col("i"))
    val capped = ui.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerUser).drop("__rn")
    capped.select(col("u"), col("i").as("ia"))
      .join(capped.select(col("u"), col("i").as("ib")), Seq("u"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact triangle count of an undirected graph given as canonical
    * (a < b) distinct edges, by degree-ordered wedge closure (the
    * MapReduce-classic of Suri & Vassilvitskii 2011): orient every edge
    * toward its higher-(degree, id) endpoint, emit wedges only at each
    * triangle's ORD-MINIMUM vertex (two out-edges), close against the
    * edge set. Orientation bounds every out-degree by O(√m) whatever
    * the raw degree distribution — the celebrity node that would
    * generate deg² wedges instead contributes ZERO (all its triangle
    * edges point toward it), which is what lets the count run on a
    * power-law web graph. Two joins, both on bounded-fanout keys; each
    * triangle counted exactly once. Returns one row (n_triangles).
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("s"), col("b").as("t")))
          .otherwise(struct(col("b").as("s"), col("a").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges at the ord-minimum vertex, canonical by id so each
    // unordered out-pair appears once; close against the raw edge set
    val wedges = oriented.select(col("s"), col("t").as("t1"))
      .join(oriented.select(col("s"), col("t").as("t2")), Seq("s"))
      .filter(col("t1") < col("t2"))
    wedges
      .join(e.select(col("a").as("t1"), col("b").as("t2")), Seq("t1", "t2"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — COMMUNITY
    * detection, the denser-than-connectivity grouping next to
    * `Dedup.connectedComponents` (CC merges anything touching; LPA
    * groups by neighborhood MAJORITY, so bridges between dense regions
    * don't fuse them): labels start as node ids; each round every node
    * adopts the most frequent label among its neighbors, majority ties
    * breaking to the SMALLEST label (fully deterministic — no RNG
    * tie-break, no async update order; both engines replay identically).
    * Runs a FIXED `rounds` count (the bounded-iteration discipline of
    * `PageRank`), which also keeps the bipartite two-coloring
    * oscillation bounded and reproducible rather than convergence-raced.
    *
    * Scale shape per round: one join moving (edge endpoint, 8-byte
    * label), one map-side-combined (node, label) count whose output is
    * bounded by nodes × distinct-neighbor-labels (shrinking every
    * round), one per-node min(struct) argmax — never a row_number
    * window over the message table. Total cost: rounds × O(m) shuffled
    * longs, the textbook distributed-LPA budget.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(false) // reused every round
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"), col("lab"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("__c")).as("__nc"), col("lab").as("__l")))
          .as("__top"))
        .select(col("node"), col("__top.__l").as("lab"))
        .localCheckpoint(false) // truncate the per-round lineage
    }
    labels
  }

  /** k-CORE of an undirected graph given as canonical (a < b) distinct
    * edges: the maximal subgraph where every node keeps degree ≥ k —
    * the density gate the link-quality toolchain uses where
    * `connectedComponents` is too loose (everything touching merges) and
    * `triangleCount` too global (one number): mirror farms and
    * interlinked spam rings survive k-core peeling, isolated tails and
    * one-off links don't (Seidman 1983; the standard web-graph spam/
    * cohesion feature next to PageRank and HITS).
    *
    * Synchronous batch peeling: each round drops EVERY node whose degree
    * in the current subgraph is < k, then re-derives the induced edge
    * set; repeats until a fixpoint. Rounds are bounded by the peel depth
    * (≤ the graph's degeneracy ordering length; in practice a handful —
    * each round removes whole layers, not single nodes like the
    * sequential textbook algorithm), and like `Dedup.connectedComponents`
    * the loop THROWS at `maxRounds` instead of silently returning an
    * under-peeled subgraph. Peeling at the fixpoint is idempotent, which
    * is what lets the oracle unroll a fixed round count.
    *
    * Scale shape per round: one map-side-combined degree count (node,
    * deg) and two semi-joins of the edge list against the surviving node
    * set — edges shuffle as (8-byte, 8-byte) id pairs only, and the
    * per-round edge table localCheckpoints (iterative-lineage
    * discipline). No window, no pairwise blow-up anywhere.
    *
    * Returns (node, deg) for k-core members, deg = degree INSIDE the core.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(col("a").as("node"))
        .unionAll(e.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var cur = edges.select(col("a"), col("b")).distinct()
      .localCheckpoint(false)
    var round = 0
    while (round < maxRounds) {
      val deg = degrees(cur)
      val nDrop = deg.filter(col("deg") < k).count()
      if (nDrop == 0L)
        return deg.filter(col("deg") >= k)
      val keep = deg.filter(col("deg") >= k).select(col("node"))
      cur = cur
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(false)
      round += 1
    }
    val deg = degrees(cur)
    if (deg.filter(col("deg") < k).count() == 0L) deg
    else throw new IllegalStateException(
      s"kCore did not reach a fixpoint in $maxRounds rounds — raise " +
        "maxRounds (peel depth exceeds the bound; never silently " +
        "return an under-peeled subgraph)")
  }

  /** HITS hubs & authorities over a (possibly bipartite) edge list —
    * PageRank's dual for graphs where pointing-well matters as much as
    * being-pointed-at (user→item interaction graphs: hub users curate,
    * authority items canonicalize).
    *
    * Fixed `iters` mutual-reinforcement rounds with integer micro-unit
    * L∞ normalization after every half-step: scores are exact BIGINT
    * sums; the per-round max is a single driver scalar (bounded at any
    * graph size) and re-scaling divides two exact integers in one fixed
    * association, so the oracle's unrolled CTEs replay every round
    * bit-for-bit (the q_pca_top power-iteration discipline on a graph).
    *
    * Per round: two edge⨝score joins keyed on src/dst (pre-bucketed at
    * cluster scale), each followed by a map-side-combined sum; score
    * tables localCheckpoint per round (iterative-lineage discipline).
    *
    * Returns (hubs(u, h_micro), authorities(t, a_micro)).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int = 3): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("t"))
      .distinct().localCheckpoint(false)
    var h = e.select(col("u")).distinct()
      .withColumn("h", lit(1000000L)).localCheckpoint(false)
    var a: DataFrame = null
    def renorm(df: DataFrame, c: String): DataFrame = {
      val m = df.agg(max(col(c))).head.getLong(0)
      df.select(col(df.columns.head),
        round(col(c).cast("double") * 1e6 / m.toDouble).cast("long").as(c))
        .localCheckpoint(false)
    }
    for (_ <- 1 to iters) {
      a = renorm(e.join(h, Seq("u")).groupBy(col("t"))
        .agg(sum(col("h")).as("a")), "a")
      h = renorm(e.join(a, Seq("t")).groupBy(col("u"))
        .agg(sum(col("a")).as("h")), "h")
    }
    (h.withColumnRenamed("h", "h_micro"), a.withColumnRenamed("a", "a_micro"))
  }

  /** Newman MODULARITY of a community assignment — the score that
    * grades what [[labelPropagation]] (or any clustering) produced:
    * Q = Σ_c (e_c/m − (d_c/2m)²) over communities c, where e_c counts
    * intra-community edges and d_c sums member degrees. Q ≈ 0 means no
    * better than random wiring at the same degrees; Q → 1 means dense
    * communities with sparse cut — the ACCEPT/RETUNE gate for a
    * community run, exactly as [[Mining.clusterPurity]] gates label
    * agreement.
    *
    * Arithmetic is exact until the one final division: the per-
    * community term is the integer `4·m·e_c − d_c²` accumulated in
    * DECIMAL(38,0) (d_c ≤ 2m, so the square fits far past any real
    * edge count), and Q = Σterms / 4m² happens once in DOUBLE, rounded
    * to 6 — order-independent across partitionings and replicated by
    * the oracle term for term. Scale shape: one distinct-edge pass,
    * two label joins, a degree aggregation — every intermediate is
    * edge- or community-bounded; nothing quadratic, no windows.
    * Returns one row: (m, n_comm, modularity). Self-loops are dropped
    * (the standard simple-graph convention); `labels` must cover every
    * endpoint (inner joins — a missing node fails loudly in counts).
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, nodeCol: String, labCol: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val m = und.count()
    require(m > 0, "modularity needs at least one non-loop edge")
    val lab = labels.select(col(nodeCol).as("__n"), col(labCol).as("__c"))
    val el = und
      .join(lab.select(col("__n").as("a"), col("__c").as("__ca")), Seq("a"))
      .join(lab.select(col("__n").as("b"), col("__c").as("__cb")), Seq("b"))
    val ec = el.filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("__c")).agg(count(lit(1)).as("__e"))
    val deg = und.select(col("a").as("__n"))
      .unionAll(und.select(col("b").as("__n")))
      .groupBy(col("__n")).agg(count(lit(1)).as("__d"))
    val dc = deg.join(lab, Seq("__n"))
      .groupBy(col("__c")).agg(sum(col("__d")).as("__dsum"))
    val terms = dc.join(ec, Seq("__c"), "left")
      .select(((lit(4L) * lit(m)).cast("decimal(38,0)") *
        coalesce(col("__e"), lit(0L)).cast("decimal(38,0)"))
        .minus(col("__dsum").cast("decimal(38,0)") *
          col("__dsum").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .as("__t"))
    val agg = terms.agg(sum(col("__t")).as("t"),
      count(lit(1)).as("n_comm")).head
    val q = java.math.BigDecimal.valueOf(
        BigDecimal(agg.getDecimal(0)).toDouble / (4.0 * m * m))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    Seq((m, agg.getLong(1), q + 0.0)).toDF("m", "n_comm", "modularity")
  }
}
