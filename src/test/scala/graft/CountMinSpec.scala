package graft

import graft.operators.CountMin

class CountMinSpec extends SparkSpec {

  test("pointEstimates: one-sided overcount, exact in collision-free regime, missing term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "apple banana banana durian"),
      (3L, "cherry cherry cherry apple")).toDF("doc_id", "text")
    // wide sketch (w=4096, 12 tokens): collisions essentially impossible
    // → estimates are EXACT and overcount 0 for every queried term
    val wide = CountMin.pointEstimates(docs, "text",
        Seq("apple", "banana", "cherry", "ghost"), d = 4, w = 4096)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(wide("apple") == ((4L, 4L, 0L)), wide.toString)
    assert(wide("banana") == ((3L, 3L, 0L)), wide.toString)
    assert(wide("cherry") == ((4L, 4L, 0L)), wide.toString)
    assert(wide("ghost")._2 == 0L, "missing term has exact 0")
    // tiny sketch (w=2): collisions certain — the CMS guarantee is only
    // one-sided: est >= exact for EVERY term, never under
    val tiny = CountMin.pointEstimates(docs, "text",
        Seq("apple", "banana", "cherry", "durian", "ghost"), d = 2, w = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(tiny.forall { case (_, est, exact) => est >= exact },
      s"one-sided bound violated: ${tiny.toList}")
    // sketch table is d·w-bounded regardless of vocabulary
    assert(CountMin.sketch(docs, "text", d = 3, w = 8).count() <= 24)
  }
}
