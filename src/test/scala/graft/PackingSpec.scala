package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {

  private def corpus() = {
    import spark.implicits._
    Seq(
      ("g1", 0L, 100L), ("g1", 1L, 200L), ("g1", 2L, 50L),
      ("g2", 0L, 300L)
    ).toDF("grp", "id", "n_tokens")
  }

  test("packSequences: docs start at cumulative offsets, straddling allowed") {
    val r = Packing.packSequences(corpus(), Seq(col("grp")), col("id"),
        col("n_tokens"), 128)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(3), x.getLong(4)))
      .toSet
    // g1 starts: 0, 100, 300 → seq 0 off 0; seq 0 off 100; seq 2 off 44
    assert(r == Set(
      ("g1", 0L, 0L, 0L), ("g1", 1L, 0L, 100L), ("g1", 2L, 2L, 44L),
      ("g2", 0L, 0L, 0L)), r)
  }

  test("packSequences is independent of input partitioning") {
    val base = corpus()
    val a = Packing.packSequences(base.repartition(7), Seq(col("grp")),
      col("id"), col("n_tokens"), 128).collect().toSet
    val b = Packing.packSequences(base.coalesce(1), Seq(col("grp")),
      col("id"), col("n_tokens"), 128).collect().toSet
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("packSequences plans exactly one shuffle (the group-key exchange)") {
    val plan = Packing.packSequences(corpus(), Seq(col("grp")), col("id"),
      col("n_tokens"), 128).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("sequenceCounts: ceil of total tokens over budget") {
    val r = Packing.sequenceCounts(corpus(), Seq(col("grp")), col("n_tokens"), 128)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("g1") == (350L, 3L)) // ceil(350/128) = 3
    assert(r("g2") == (300L, 3L))
  }

  test("lengthBuckets: routing, truncation, and waste arithmetic hand-checked") {
    import spark.implicits._
    // lengths 10, 16 → bucket 16; 17 → 32; 100 → 128; 300 → 256 truncated
    val d = Seq(10L, 16L, 17L, 100L, 300L).toDF("nt")
    val r = Packing.lengthBuckets(d, col("nt"),
        ladder = Seq(16, 32, 64, 128, 256))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5)))).toMap
    assert(r(16L) == ((2L, 0L, 26L, 32L, 0.1875)))
    assert(r(32L) == ((1L, 0L, 17L, 32L, 0.4688)))
    assert(r(128L) == ((1L, 0L, 100L, 128L, 0.2188)))
    assert(r(256L) == ((1L, 1L, 256L, 256L, 0.0)))
    assert(r.size == 4, "empty buckets are absent, not zero rows")
    // ladder must be ascending and distinct
    intercept[IllegalArgumentException] {
      Packing.lengthBuckets(d, col("nt"), ladder = Seq(32, 16))
    }
  }
}
