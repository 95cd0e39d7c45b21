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

  test("curriculumStages: terciles by quality, highest-quality stage 0, hash order deterministic") {
    import spark.implicits._
    // quality = min(n/100,1)·(0.7+0.3·stopratio): long stopword-rich
    // docs are "easy", terse junk is "hard"
    val easy = (1L to 3L).map(i =>
      (i, ("the a of and to in is " * 20).trim))
    val mid = (4L to 6L).map(i => (i, "plain words without stopwords here"))
    val hard = (7L to 9L).map(i => (i, "zz"))
    val d = (easy ++ mid ++ hard).toDF("doc_id", "text")
    val out = Packing.curriculumStages(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    (1L to 3L).foreach(i => assert(out(i)._2 == 0, s"doc $i: ${out(i)}"))
    (4L to 6L).foreach(i => assert(out(i)._2 == 1, s"doc $i: ${out(i)}"))
    (7L to 9L).foreach(i => assert(out(i)._2 == 2, s"doc $i: ${out(i)}"))
    // stage ranks strictly by q4 terciles; ord is in [0, 1e6)
    assert(out.values.forall(v => v._3 >= 0 && v._3 < 1000000L))
    val again = Packing.curriculumStages(d.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    assert(again == out)
  }
}
