package graft

import org.apache.spark.sql.functions._

import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.KllAgg

class QuantileSketchSpec extends SparkSpec {

  test("exact under capacity: quantiles equal the true order statistics") {
    import spark.implicits._
    // 1000 distinct values in scrambled order over 8 partitions — the
    // merge path runs, capacity is never exceeded, results must be exact
    val vals = (1 to 1000).map(i => ((i * 611) % 1000 + 1).toLong).distinct
    assert(vals.length == 1000)
    val df = vals.toDF("x").repartition(8)
    val r = QuantileSketch.quantiles(df, "x",
        Seq("0.25", "0.5", "0.75", "0.9", "0.99", "1.0").map(BigDecimal(_)),
        cap = 2048)
      .collect().map(x => (x.getDouble(0), x.getLong(1))).toMap
    // quantile_disc semantics: smallest value with rank ≥ ceil(q·n)
    assert(r(0.25) == 250L && r(0.5) == 500L && r(0.75) == 750L)
    assert(r(0.9) == 900L && r(0.99) == 990L && r(1.0) == 1000L)
  }

  test("decimal rank arithmetic: q=0.2 of n=5 picks the 1st element, not the 2nd") {
    import spark.implicits._
    // double 0.2*5 = 1.0000000000000002 — a naive ceil would return 2
    val r = QuantileSketch.quantiles(Seq(1L, 2L, 3L, 4L, 5L).toDF("x"), "x",
      Seq(BigDecimal("0.2")), cap = 16).collect()
    assert(r.head.getLong(1) == 1L)
  }

  test("beyond capacity: compacted sketch keeps rank error within the KLL bound") {
    import spark.implicits._
    val n = 20000
    val cap = 256
    val df = (1 to n).map(i => ((i.toLong * 7919) % n + 1)).toDF("x")
      .repartition(8)
    val levels = df.select(col("x").cast("double")).as[Double]
      .select(new KllAgg(cap).toColumn).head()
    // compaction must actually have fired for this test to mean anything
    assert(levels.length > 1 && levels.drop(1).exists(_.nonEmpty))
    // total weight stays within 1% of n (odd-sized promotions add ≤ 1
    // weight unit each)
    val w = levels.zipWithIndex.map { case (vs, i) => vs.length.toLong << i }.sum
    assert(math.abs(w - n) <= n / 100)
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = QuantileSketch.readQuantile(levels, BigDecimal(q.toString))
      val trueRank = q * n
      // generous 10× the asymptotic log(n/cap)/cap factor — the point is
      // "near the right rank", not a tight constant
      val tol = 10.0 * math.log(n.toDouble / cap) / cap * n
      assert(math.abs(est - trueRank) <= tol,
        s"q=$q: estimate $est vs true rank $trueRank (tol $tol)")
    }
  }

  test("empty input yields zero quantile rows, not a crash") {
    import spark.implicits._
    val r = QuantileSketch.quantiles(
      Seq.empty[Long].toDF("x"), "x", Seq(BigDecimal("0.5")), cap = 16)
    assert(r.collect().isEmpty)
  }

  test("weighted read-off walks cumulative weights, not item counts") {
    // hand-built sketch: level 0 = [10], level 1 = [1, 2] (weight 2 each)
    // sorted weighted stream: (1,2) (2,2) (10,1), W = 5
    val levels = Seq(Seq(10.0), Seq(1.0, 2.0))
    assert(QuantileSketch.readQuantile(levels, BigDecimal("0.4")) == 1.0) // rank 2
    assert(QuantileSketch.readQuantile(levels, BigDecimal("0.8")) == 2.0) // rank 4
    assert(QuantileSketch.readQuantile(levels, BigDecimal("1.0")) == 10.0) // rank 5
  }
}
