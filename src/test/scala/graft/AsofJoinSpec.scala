package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 1.0),
      (10L, ts("2024-01-01 11:00:00"), 2.0),
      (20L, ts("2024-01-01 09:30:00"), 3.0) // after left row 3 — no match
    ).toDF("user_id", "ts", "value")

    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"asof.value")
      .collect.map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L) == Some(1.0))
    assert(got(2L) == Some(2.0))
    assert(got(3L) == None)
  }

  test("asofJoin is inclusive: right row at exactly left time matches") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((5L, ts("2024-01-01 10:00:00"), 9.9)).toDF("user_id", "ts", "value")
    val got = AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts")
      .select($"asof.value").head
    assert(!got.isNullAt(0) && got.getDouble(0) == 9.9)
  }

  test("asofJoin breaks (key, time) ties deterministically: highest right struct wins") {
    import spark.implicits._
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    // three right rows tied on (user_id, ts): pick must be the max struct
    // (user_id, ts, value) → value 7.0 — on every run and partitioning
    val right = Seq(
      (5L, ts("2024-01-01 09:00:00"), 3.0),
      (5L, ts("2024-01-01 09:00:00"), 7.0),
      (5L, ts("2024-01-01 09:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    (1 to 5).foreach { _ =>
      val got = AsofJoin.asofJoin(
        left, right.repartition(4), Seq("user_id"), "ts", "ts")
        .select($"asof.value").head.getDouble(0)
      assert(got == 7.0)
    }
  }

  test("asofJoin keeps every left row (left-join semantics)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i.toLong, (i % 7).toLong,
      ts(f"2024-01-01 ${i % 24}%02d:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((3L, ts("2024-01-01 05:00:00"), 1.0)).toDF("user_id", "ts", "value")
    assert(AsofJoin.asofJoin(left, right, Seq("user_id"), "ts", "ts").count() == 100)
  }
}
