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

  test("overlapMatrix: exact union/intersection/jaccard below capacity") {
    import spark.implicits._
    // A = {0..99}, B = {50..149}, C = {200..209}: |A∩B| = 50, |A∩C| = 0
    val df = ((0 to 99).map(("a", _)) ++ (50 to 149).map(("b", _)) ++
      (200 to 209).map(("c", _))).map { case (k, v) => (k, s"v$v") }
      .toDF("k", "v").repartition(8)
    val sk = DistinctSketch.sketchByKey(df, col("k"), col("v"), k = 1024)
    val m = DistinctSketch.overlapMatrix(sk, 1024)
      .orderBy("key_a", "key_b").collect()
    val ab = m.find(r => r.getString(0) == "a" && r.getString(1) == "b").get
    assert(ab.getAs[Long]("n_a") == 100 && ab.getAs[Long]("n_b") == 100)
    assert(ab.getAs[Long]("n_union") == 150 && ab.getAs[Long]("n_inter") == 50)
    assert(math.abs(ab.getAs[Double]("jaccard") - 50.0 / 150) < 1e-6)
    assert(ab.getAs[Boolean]("is_exact"))
    val ac = m.find(r => r.getString(0) == "a" && r.getString(1) == "c").get
    assert(ac.getAs[Long]("n_inter") == 0 && ac.getAs[Double]("jaccard") == 0.0)
    assert(m.length == 3, "3 keys -> 3 unordered pairs")
  }

  test("overlapMatrix: over-capacity estimates land in the error band, flagged") {
    import spark.implicits._
    val k = 512
    // 20k-element sets with 10k shared: union 30k, jaccard 1/3
    val df = ((1 to 20000).map(("a", _)) ++
      (10001 to 30000).map(("b", _))).map { case (k, v) => (k, s"v$v") }
      .toDF("k", "v").repartition(16)
    val sk = DistinctSketch.sketchByKey(df, col("k"), col("v"), k = k)
    val r = DistinctSketch.overlapMatrix(sk, k).head()
    assert(!r.getAs[Boolean]("is_exact"))
    val band = 5.0 / math.sqrt(k - 2.0)
    assert(math.abs(r.getAs[Long]("n_union") - 30000.0) / 30000 < band,
      s"union ${r.getAs[Long]("n_union")}")
    // intersection inherits union error plus sampling error on the ratio
    assert(math.abs(r.getAs[Long]("n_inter") - 10000.0) / 10000 < 2 * band,
      s"inter ${r.getAs[Long]("n_inter")}")
  }
}
