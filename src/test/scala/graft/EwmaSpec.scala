package graft

import java.sql.Timestamp

import graft.operators.Ewma

class EwmaSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  // key 1: steady 10.0 then a spike at the 6th event
  // key 2: too short for warmup — never flags
  private def events() = {
    import spark.implicits._
    (Seq.tabulate(5)(i => (1L, i.toLong, ts(i), 10.0)) ++
      Seq((1L, 5L, ts(5), 500.0)) ++
      Seq.tabulate(3)(i => (2L, 10L + i, ts(i), 999.0))
    ).toDF("user_id", "event_id", "ts", "value")
  }

  test("integer recurrence flags the spike with exact state") {
    val r = Ewma.anomalies(events(), "user_id", "event_id", "ts", "value")
      .collect()
    // key 1: x=10e6 constant → sq stays 10e6; dq: r=0 each step → dq=0
    // until the spike. Spike at rn=6: rq=490e6 > 3·dq requires dq>0 —
    // dq is 0, so NOT flagged (deviation-band needs nonzero scale).
    assert(r.isEmpty, r.mkString(","))
  }

  test("flags once deviation is established") {
    import spark.implicits._
    // alternating 10/12 builds dq>0; then a 500 spike after warmup
    val vals = Seq(10.0, 12.0, 10.0, 12.0, 10.0, 500.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (7L, i.toLong, ts(i), v) }
      .toDF("user_id", "event_id", "ts", "value")
    val r = Ewma.anomalies(df, "user_id", "event_id", "ts", "value").collect()
    assert(r.length == 1, r.mkString(","))
    val a = r.head
    assert(a.user_id == 7L && a.event_id == 5L && a.rn == 6L)
    // replay the recurrence by hand (micro-units)
    var sq = 10000000L; var dq = 0L
    for (v <- vals.tail.dropRight(1).map(x => (x * 1e6).toLong)) {
      val rq = math.abs(v - sq)
      sq = Math.floorDiv(3 * sq + v, 4L)
      dq = Math.floorDiv(3 * dq + rq, 4L)
    }
    assert(a.prev_sq == sq && a.prev_dq == dq)
    assert(a.rq == math.abs(500000000L - sq))
  }

  test("result is independent of input partitioning") {
    val base = events()
    val a = Ewma.anomalies(base.repartition(7), "user_id", "event_id",
      "ts", "value").collect().map(_.toString).sorted.toSeq
    val b = Ewma.anomalies(base.coalesce(1), "user_id", "event_id",
      "ts", "value").collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("plans exactly one exchange (the key repartition)") {
    val plan = Ewma.anomalies(events(), "user_id", "event_id", "ts", "value")
      .queryExecution.executedPlan.toString
    val n = "Exchange".r.findAllIn(plan).size
    assert(n == 1, s"expected 1 exchange, got $n:\n$plan")
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
  }
}
