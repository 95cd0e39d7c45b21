package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {

  test("cooccurrenceEdges: hand-checked weights, minShared cut, dedup of repeat touches") {
    import spark.implicits._
    // u1 {a,b,c}, u2 {a,b}, u3 {a,b} (b touched twice — dedup), u4 {c}
    val ui = Seq(("u1", "a"), ("u1", "b"), ("u1", "c"), ("u2", "a"),
      ("u2", "b"), ("u3", "a"), ("u3", "b"), ("u3", "b"), ("u4", "c"))
      .toDF("u", "i")
    val e = GraphOps.cooccurrenceEdges(ui, col("u"), col("i"), minShared = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(e == Map(("a", "b") -> 3L), s"got $e") // (a,c),(b,c) have 1 user
  }

  test("cooccurrenceEdges: the per-user cap binds deterministically in item order") {
    import spark.implicits._
    val ui = (1 to 10).map(i => ("u1", f"i$i%02d")).toDF("u", "i")
    val e = GraphOps.cooccurrenceEdges(ui, col("u"), col("i"),
      minShared = 1, maxPerUser = 3)
    // first 3 items in order → C(3,2) pairs
    assert(e.count() == 3)
    assert(e.agg(max(col("ib"))).head.getString(0) == "i03")
  }

  test("triangleCount: K4 has 4 triangles; adding a pendant edge changes nothing") {
    import spark.implicits._
    val k4 = (for {
      a <- 1 to 4; b <- 1 to 4 if a < b
    } yield (a.toLong, b.toLong)).toDF("a", "b")
    assert(GraphOps.triangleCount(k4).head.getLong(0) == 4)
    val withPendant = k4.union(Seq((4L, 99L)).toDF("a", "b"))
    assert(GraphOps.triangleCount(withPendant).head.getLong(0) == 4)
  }

  test("triangleCount: star hub yields zero wedges at the hub (orientation bound)") {
    import spark.implicits._
    // hub 0 connected to 1..100, plus one closing edge (1,2): 1 triangle.
    // A naive wedge count at the hub would enumerate C(100,2) pairs; the
    // degree orientation points every spoke AT the hub instead.
    val star = (1 to 100).map(i => (0L, i.toLong)).toDF("a", "b")
      .union(Seq((1L, 2L)).toDF("a", "b"))
    assert(GraphOps.triangleCount(star).head.getLong(0) == 1)
    val e = star.select(col("a"), col("b"))
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val hubOut = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .filter(col("a") === 0L &&
        (col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))))
    assert(hubOut.count() == 0, "all hub edges must orient toward the hub")
  }

  test("triangleCount: triangle-free bipartite-ish graph counts zero") {
    import spark.implicits._
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(GraphOps.triangleCount(path).head.getLong(0) == 0)
  }

  test("labelPropagation: two cliques joined by one bridge stay two communities") {
    import spark.implicits._
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    val edges = Seq((1L,2L),(1L,3L),(2L,3L),(10L,11L),(10L,12L),(11L,12L),(3L,10L))
      .toDF("src", "dst")
    val labs = GraphOps.labelPropagation(edges, "src", "dst", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = Set(1L, 2L, 3L).map(labs)
    val c2 = Set(10L, 11L, 12L).map(labs)
    assert(c1.size == 1, s"clique A converges to one label: $labs")
    assert(c2.size == 1, s"clique B converges to one label: $labs")
    assert(c1 != c2, s"bridge must not fuse the cliques: $labs")
  }

  test("labelPropagation is deterministic across partitionings") {
    import spark.implicits._
    val edges = (1L to 60L).map(i => (i, 1L + i % 7)).toDF("src", "dst")
    val a = GraphOps.labelPropagation(edges.repartition(1), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.labelPropagation(edges.repartition(13), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("hits: authorities track in-links from strong hubs; scores stay micro-normalized") {
    import spark.implicits._
    // hub user 1 touches every item; item "hot" is touched by everyone
    val edges = Seq(
      (1L, "hot"), (1L, "warm"), (1L, "cold"),
      (2L, "hot"), (2L, "warm"),
      (3L, "hot")
    ).toDF("u", "t")
    val (hubs, auths) = GraphOps.hits(edges, "u", "t")
    val h = hubs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = auths.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // L∞ normalization: the max of each side is exactly 1e6
    assert(h.values.max == 1000000L && a.values.max == 1000000L)
    // orderings: user 1 > user 2 > user 3; hot > warm > cold
    assert(h(1L) > h(2L) && h(2L) > h(3L), h.toString)
    assert(a("hot") > a("warm") && a("warm") > a("cold"), a.toString)
    // duplicate edges don't change the result (distinct-edge semantics)
    val (h2, a2) = GraphOps.hits(edges.union(edges).repartition(9), "u", "t")
    assert(h2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == h)
    assert(a2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == a)
  }

  test("kCore: pendant peels away, core keeps in-core degrees") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4-1: 2-core = the triangle
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val core = GraphOps.kCore(edges, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: cascading peel reaches the empty fixpoint") {
    import spark.implicits._
    // a path graph has no 2-core; peeling eats it from both ends
    val chain = (1L to 5L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a", "b")
    assert(GraphOps.kCore(chain, 2).count() == 0L)
  }

  test("kCore throws at maxRounds instead of under-peeling") {
    import spark.implicits._
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a", "b")
    intercept[IllegalStateException] {
      GraphOps.kCore(chain, 2, maxRounds = 1)
    }
  }

  test("kCore: duplicate edges and partitioning don't change the result") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (2L, 4L),
      (1L, 4L), (4L, 5L)).toDF("a", "b")
    val base = GraphOps.kCore(edges, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val dup = GraphOps.kCore(edges.union(edges).repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == base)
  }

  test("modularity: two cliques + bridge score high, one community exactly 0, anti-partition negative") {
    import spark.implicits._
    // two 4-cliques joined by one bridge edge: 13 edges total
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L))).toDF("src", "dst")
    val natural = Seq(0L, 1L, 2L, 3L).map((_, 0L)) ++
      Seq(10L, 11L, 12L, 13L).map((_, 1L))
    val q = GraphOps.modularity(edges, "src", "dst",
      natural.toDF("node", "lab"), "node", "lab").head
    assert(q.getLong(0) == 13L && q.getLong(1) == 2L)
    assert(q.getDouble(2) > 0.4, s"natural split must score high: $q")
    // everything in one community: Q = 0 exactly (4m·m − (2m)² = 0)
    val one = GraphOps.modularity(edges, "src", "dst",
      natural.map(n => (n._1, 0L)).toDF("node", "lab"), "node", "lab").head
    assert(one.getDouble(2) == 0.0, one.toString)
    // the worst split — each clique sliced in half across communities —
    // scores BELOW the single-community baseline
    val anti = Seq(0L, 1L, 10L, 11L).map((_, 0L)) ++
      Seq(2L, 3L, 12L, 13L).map((_, 1L))
    val a = GraphOps.modularity(edges, "src", "dst",
      anti.toDF("node", "lab"), "node", "lab").head
    assert(a.getDouble(2) < 0.0, a.toString)
    // duplicate + reversed edges collapse to the same undirected set
    val messy = edges.unionAll(edges.select($"dst".as("src"), $"src".as("dst")))
      .repartition(7)
    val q2 = GraphOps.modularity(messy, "src", "dst",
      natural.toDF("node", "lab"), "node", "lab").head
    assert(q2.getDouble(2) == q.getDouble(2) && q2.getLong(0) == 13L)
  }
}
