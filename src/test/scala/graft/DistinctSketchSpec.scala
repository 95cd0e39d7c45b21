package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DistinctSketch}
import graft.operators.DistinctSketch.KmvAgg

class DistinctSketchSpec extends SparkSpec {

  test("exact below capacity, with duplicates collapsed") {
    import spark.implicits._
    val df = ((1 to 300).map(i => s"v${i % 100}") ++ Seq.fill(50)("v7"))
      .toDF("x").repartition(8)
    val r = DistinctSketch.distinctCount(df, col("x"), k = 1024).head
    assert(r.getLong(0) == 100L && r.getBoolean(1))
  }

  test("beyond capacity: estimate within the 1/sqrt(k-2) error band, flagged inexact") {
    import spark.implicits._
    val n = 50000
    val k = 1024
    val df = (1 to n).map(i => s"item$i").toDF("x").repartition(8)
    val r = DistinctSketch.distinctCount(df, col("x"), k = k).head
    assert(!r.getBoolean(1), "over-capacity estimate must be flagged inexact")
    val est = r.getLong(0).toDouble
    val rel = math.abs(est - n) / n
    // 5 standard errors of the KMV bound — loose enough to be stable,
    // tight enough to catch a broken estimator (which would be off 10x)
    assert(rel < 5.0 / math.sqrt(k - 2.0), s"estimate $est vs true $n (rel $rel)")
  }

  test("deterministic across partitionings even when approximate") {
    import spark.implicits._
    val vals = (1 to 20000).map(i => s"d$i")
    def run(parts: Int): Long =
      DistinctSketch.distinctCount(vals.toDF("x").repartition(parts),
        col("x"), k = 512).head.getLong(0)
    assert(run(2) == run(16), "k-min-set must not depend on partitioning")
  }

  test("merge is a k-bounded sorted union without duplicates") {
    val agg = new KmvAgg(4)
    val a = Vector(1L, 5L, 9L)
    val b = Vector(1L, 3L, 9L, 11L)
    assert(agg.merge(a, b) == Vector(1L, 3L, 5L, 9L))
  }

  test("reduce keeps the k smallest distinct values") {
    val agg = new KmvAgg(3)
    val b = Seq(10L, 7L, 12L, 7L, 3L, 99L).foldLeft(agg.zero)(agg.reduce)
    assert(b == Vector(3L, 7L, 10L))
  }
}
