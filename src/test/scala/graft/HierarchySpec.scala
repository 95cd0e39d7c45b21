package graft

import org.apache.spark.sql.functions._
import graft.operators.Hierarchy

class HierarchySpec extends SparkSpec {

  test("rootAndDepth: hand-built forest — roots at 0, two trees, exact depths") {
    import spark.implicits._
    // tree A: 1 <- 2 <- 3 <- 4 (chain), root 1; tree B: 10 <- {11, 12}
    val edges = Seq(
      (1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L),
      (10L, 10L), (11L, 10L), (12L, 10L)
    ).toDF("child", "parent")
    val got = Hierarchy.rootAndDepth(edges, "child", "parent")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L), (4L, 1L, 3L),
      (10L, 10L, 0L), (11L, 10L, 1L), (12L, 10L, 1L)), s"got $got")
  }

  test("rootAndDepth: depth-200 chain closes within the O(log d) round budget") {
    import spark.implicits._
    val chain = Seq((0L, 0L)) ++ (1L to 200L).map(i => (i, i - 1))
    val got = Hierarchy.rootAndDepth(chain.toDF("child", "parent"),
        "child", "parent", maxIters = 12) // log2(200) ~ 8; headroom
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    assert(got(200L) == ((0L, 200L)) && got(0L) == ((0L, 0L)))
  }

  test("rootAndDepth: a cycle or dangling parent throws instead of silently truncating") {
    import spark.implicits._
    // 2 -> 3 -> 2: no self-parent is ever reached
    intercept[IllegalStateException] {
      Hierarchy.rootAndDepth(
        Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("c", "p"), "c", "p",
        maxIters = 10).collect()
    }
    // 5's parent 99 is not a node in the state
    intercept[IllegalStateException] {
      Hierarchy.rootAndDepth(
        Seq((1L, 1L), (5L, 99L)).toDF("c", "p"), "c", "p",
        maxIters = 10).collect()
    }
  }

  test("ancestorClosure: every (node, ancestor, dist) pair on a hand-built tree") {
    import spark.implicits._
    // 1 <- 2 <- {3, 4}; 3 <- 5
    val edges = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L))
      .toDF("c", "p")
    val got = Hierarchy.ancestorClosure(edges, "c", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (2L, 1L, 1L), (3L, 2L, 1L), (4L, 2L, 1L), (5L, 3L, 1L),
      (3L, 1L, 2L), (4L, 1L, 2L), (5L, 2L, 2L), (5L, 1L, 3L)), s"got $got")
  }

  test("subtreeSizes: proper-descendant counts, leaves absent") {
    import spark.implicits._
    val edges = Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 3L))
      .toDF("c", "p")
    val got = Hierarchy.subtreeSizes(edges, "c", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 4L, 2L -> 3L, 3L -> 1L), s"got $got")
  }

  test("ancestorClosure: the maxRows budget throws loudly on a deep chain instead of shuffling a quadratic closure") {
    import spark.implicits._
    // a 200-deep linear chain (the reply-thread shape): closure is
    // 200·201/2 = 20100 rows — over a 10k budget the run must THROW,
    // not silently truncate or quietly melt the cluster
    val chain = (1L to 200L).map(i => (i, i - 1)) :+ ((0L, 0L))
    val edges = chain.toDF("c", "p")
    val e = intercept[IllegalStateException] {
      Hierarchy.ancestorClosure(edges, "c", "p", maxRows = 10000L).count()
    }
    assert(e.getMessage.contains("budget"), e.getMessage)
    assert(e.getMessage.contains("rootAndDepth"),
      "the error must point at the bounded alternative")
    // the same chain under a sufficient budget closes exactly
    val n = Hierarchy.ancestorClosure(edges, "c", "p", maxRows = 30000L)
      .count()
    assert(n == 200L * 201 / 2, s"got $n")
  }

  implicit private class Tup3Ops(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
