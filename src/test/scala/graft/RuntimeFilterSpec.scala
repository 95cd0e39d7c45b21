package graft

import org.apache.spark.sql.functions._

import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends SparkSpec {

  test("bloomJoin result equals the plain inner join") {
    import spark.implicits._
    val probe = (1 to 5000).map(i => (i.toLong, s"p$i")).toDF("k", "pv")
      .repartition(8)
    val build = (1 to 5000).filter(_ % 37 == 0).map(i => (i.toLong, s"b$i"))
      .toDF("k", "bv")
    val got = RuntimeFilter.bloomJoin(probe, build, "k")
      .select("k", "pv", "bv").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val want = probe.join(build, Seq("k"))
      .select("k", "pv", "bv").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(got.sameElements(want))
    assert(got.length == 5000 / 37)
  }

  test("bloom pre-filter discards the overwhelming majority map-side") {
    import spark.implicits._
    val probe = (1 to 50000).map(i => (i.toLong, i)).toDF("k", "pv")
    val build = Seq((7L, "x"), (9999L, "y")).toDF("k", "bv")
    // count survivors of the FILTER alone (before the join): ~2 true
    // matches + ~0.8% false positives at 10 bits/key
    val hashes = build.select(
      graft.operators.Dedup.hash60($"k".cast("string")).as("h"))
      .as[Long].collect()
    val bits = graft.expressions.BloomExpression.buildBits(hashes)
    val survivors = probe.filter(
      graft.expressions.BloomExpression.mightContainF(
        graft.operators.Dedup.hash60($"k".cast("string")), bits)).count()
    assert(survivors >= 2 && survivors < 50000 / 50,
      s"survivors $survivors: filter must cut the probe side ~100x")
    // and the join still returns exactly the true matches
    assert(RuntimeFilter.bloomJoin(probe, build, "k").count() == 2)
  }

  test("empty build side yields an empty join, not a crash") {
    import spark.implicits._
    val probe = (1 to 100).map(i => (i.toLong, i)).toDF("k", "pv")
    val build = Seq.empty[(Long, String)].toDF("k", "bv")
    assert(RuntimeFilter.bloomJoin(probe, build, "k").count() == 0)
  }
}
