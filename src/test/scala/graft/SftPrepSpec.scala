package graft

import graft.operators.SftPrep

class SftPrepSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq(
      // 20 tokens: a full user(12) + assistant(8) split
      (0L, "en", "s0", (1 to 20).map(i => s"w$i").mkString(" ")),
      // 16 tokens: minimum accepted length
      (1L, "en", "s0", (1 to 16).map(i => s"t$i").mkString(" ")),
      // 10 tokens: too short, dropped
      (2L, "en", "s1", (1 to 10).map(i => s"u$i").mkString(" ")),
      // all-same tokens → diversity floor(1e6/18)
      (3L, "en", "s1", Seq.fill(18)("same").mkString(" "))
    ).toDF("doc_id", "lang", "source", "text")
  }

  test("renderSft: template, token counts, and loss-mask span") {
    val r = SftPrep.renderSft(docs(), "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(0L, 1L, 3L))
    val row = r(0L)
    val rendered = row.getString(3)
    val (start, end) = (row.getLong(4), row.getLong(5))
    val user = (1 to 12).map(i => s"w$i").mkString(" ")
    val asst = (13 to 20).map(i => s"w$i").mkString(" ")
    assert(rendered ==
      s"<|system|>\n${SftPrep.SystemPrompt}\n<|user|>\n$user\n<|assistant|>\n$asst\n<|end|>")
    // the span is exactly the assistant text
    assert(rendered.substring(start.toInt, end.toInt) == asst)
    assert(row.getLong(1) == 12L && row.getLong(2) == 8L)
  }

  test("diversityScore is exact integer micro-units") {
    import spark.implicits._
    val r = docs().select(SftPrep.diversityScore($"text").as("rq"))
      .collect().map(_.getLong(0)).sorted
    // doc3: 1 distinct / 18 → floor(1e6/18) = 55555
    assert(r.head == 55555L)
    // docs with all-distinct tokens → exactly 1e6
    assert(r.count(_ == 1000000L) == 3)
  }

  test("prefPairs: per-group argmax/argmin with margin>0 filter") {
    val r = SftPrep.prefPairs(docs(), "doc_id", "text", Seq("lang", "source"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    // s0: both docs all-distinct (rq ties at 1e6) → margin 0, dropped.
    // s1: doc2 all-distinct (1e6) vs doc3 (55555) → margin 944445.
    assert(r == Set(("en", "s1", 2L, 3L, 944445L)), r)
  }

  test("prefPairs plans no window (struct agg only)") {
    val plan = SftPrep.prefPairs(docs(), "doc_id", "text", Seq("lang"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
  }

  test("skipgramPairs: symmetric window-2 counts, no join in plan") {
    import spark.implicits._
    val df = Seq((0L, "a b c")).toDF("doc_id", "text")
    val r = SftPrep.skipgramPairs(df, "text", window = 2, topN = 50)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSet
    // forward: (a,b),(a,c),(b,c); backward mirrors — every pair count 1
    assert(r == Set(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L), ("c", "b", 1L)), r)
    val plan = SftPrep.skipgramPairs(df, "text").queryExecution
      .executedPlan.toString
    assert(!plan.contains("Join"), s"join in plan:\n$plan")
  }

  test("negSamplingTable: sqrt-composed 0.75 power and bounded cumsum") {
    import spark.implicits._
    val df = Seq((0L, "x x x x y y z")).toDF("doc_id", "text")
    val rows = SftPrep.negSamplingTable(df, "text", topN = 10).collect()
    val byWord = rows.map(x => x.getString(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    def w(c: Long) = math.round(math.sqrt(c.toDouble *
      math.sqrt(c.toDouble)) * 1e6)
    assert(byWord("x") == ((4L, w(4), w(4))))
    assert(byWord("y") == ((2L, w(2), w(4) + w(2))))
    assert(byWord("z") == ((1L, w(1), w(4) + w(2) + w(1))))
  }

  test("skipgramPairs and prefPairs are partitioning-independent") {
    val base = docs()
    def run(df: org.apache.spark.sql.DataFrame) =
      (SftPrep.skipgramPairs(df, "text").collect().map(_.toString).toSet,
        SftPrep.prefPairs(df, "doc_id", "text", Seq("source"))
          .collect().map(_.toString).toSet)
    assert(run(base.repartition(7)) == run(base.coalesce(1)))
  }

  test("contrastiveCrops: deterministic spans, short docs dropped, crops are real substrings") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, "too short to crop"),            // 4 toks < minToks=8
      (3L, (1 to 9).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = SftPrep.contrastiveCrops(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(2L))
    // crop length = floor(n/2); offsets inside [0, n-l]
    val r1 = out(1L)
    assert(r1.getLong(1) == 20L)
    val (oa, ob) = (r1.getInt(2), r1.getInt(3))
    assert(oa >= 0 && oa <= 10 && ob >= 0 && ob <= 10)
    assert(r1.getString(4).split(" ").length == 10)
    assert(r1.getString(4) != r1.getString(5) || oa == ob)
    // each crop is the contiguous token span at its offset
    val toks = (1 to 20).map(i => s"w$i")
    assert(r1.getString(4) == toks.slice(oa, oa + 10).mkString(" "))
    assert(r1.getString(5) == toks.slice(ob, ob + 10).mkString(" "))
    // pure function of the id: repartitioning changes nothing
    val again = SftPrep.contrastiveCrops(d.repartition(5), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.toString).toMap
    assert(again == out.map { case (k, v) => k -> v.toString })
  }
}
