package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {

  test("ranks: hand-computed 2-node chain with dangling redistribution") {
    import spark.implicits._
    // A(0) → B(1); B dangling. N=2, S=1e9, d=0.85, base=75e6, r0=5e8.
    // iter1: D=5e8, ds=2.5e8; inflow(B)=5e8
    //   r1(A)=75e6+round(.85*2.5e8)=287,500,000
    //   r1(B)=75e6+round(.85*(5e8+2.5e8))=712,500,000
    // iter2: D=712.5e6, ds=356,250,000; inflow(B)=287,500,000
    //   r2(A)=75e6+round(.85*356,250,000)=377,812,500
    //   r2(B)=75e6+round(.85*643,750,000)=622,187,500
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val got = PageRank.ranks(spark, edges, "src", "dst", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 377812500L, 1L -> 622187500L), s"got $got")
  }

  test("ranks: mass conserved, sinks outrank sources, deterministic") {
    import spark.implicits._
    // star: 10 users all link items 100 and 101; items dangling
    val edges = (0L until 10L).flatMap(u => Seq((u, 100L), (u, 101L)))
      .toDF("src", "dst")
    val r = PageRank.ranks(spark, edges, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val total = r.values.sum
    // rounded redistributions keep total mass within micro-rounding slack
    assert(math.abs(total - 1000000000L) < 1000L, s"mass drifted: $total")
    assert(r(100L) == r(101L), "symmetric sinks must tie")
    assert(r(100L) > r(0L), "sinks collect source mass")
    val again = PageRank.ranks(spark, edges, "src", "dst", iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == again, "fixed-iteration integer ranks are deterministic")
  }
}
