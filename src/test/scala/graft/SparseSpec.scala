package graft

import org.apache.spark.sql.functions._

import graft.operators.Sparse

class SparseSpec extends SparkSpec {

  test("sparseSearch: inverted dot product, integer HALF_UP at exact .5 knife-edges, zero-overlap docs omitted") {
    import spark.implicits._
    // weights are micro-units; doc 1's dot lands EXACTLY on a .5
    // micro-boundary: 1e6·1.5e6 + 5e5·1 = 1.5e12 + 500000 → micro-score
    // 1_500_000.5 — the knife-edge where a double round of dot/1e12
    // flipped between engines at sf0.001 (32.2865085). The integer
    // (dot + 5e5) div 1e6 convention must round UP, always.
    val postings = Seq(
      (1L, "alpha", 1000000L), (1L, "beta", 500000L),
      (2L, "alpha", 2000000L), (2L, "beta", 1000000L),
      (3L, "gamma", 5000000L)           // no query overlap → omitted
    ).toDF("doc_id", "term", "wq")
    val q = Seq(("alpha", 1500000L), ("beta", 1L))
    val got = Sparse.sparseSearch(postings, "doc_id", "term", "wq", q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // doc 2: (2e6·1.5e6 + 1e6·1)/1e12 = 3.000001; doc 1: 1.5000005 → UP
    assert(got == Seq(2L -> 3.000001, 1L -> 1.500001), got.toList)
  }

  test("sparseSearch: the scan carries the query-term IN filter (inverted-index pruning), one aggregate exchange") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sparse_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "p").getAbsolutePath
    (1 to 100).map(i => (i.toLong, s"t${i % 10}", 1000000L))
      .toDF("doc_id", "term", "wq")
      .write.mode("overwrite").parquet(path)
    val post = spark.read.parquet(path)
    val df = Sparse.sparseSearch(post, "doc_id", "term", "wq",
      Seq(("t1", 1000000L), ("t2", 1000000L)), 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"query-term IN must reach the parquet scan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("championPrune: per-term top-p postings survive, id tie-break deterministic, search over pruned is the documented recall trade") {
    import spark.implicits._
    val postings = Seq(
      (1L, "alpha", 3000000L), (2L, "alpha", 2000000L),
      (3L, "alpha", 2000000L), (4L, "alpha", 1000000L),
      (5L, "beta", 9000000L)
    ).toDF("doc_id", "term", "wq")
    val pruned = Sparse.championPrune(postings, "doc_id", "term", "wq", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // alpha keeps weight-3 doc 1 and the TIE at weight 2 resolves to
    // the smaller id (doc 2); beta keeps its only posting
    assert(pruned == Set(("alpha", 1L, 3000000L), ("alpha", 2L, 2000000L),
      ("beta", 5L, 9000000L)), pruned)
    // doc 4 fell off alpha's champion list: unreachable by an
    // alpha-only query — the static-pruning contract
    val hits = Sparse.sparseSearch(
      Seq(("alpha", 1L, 3000000L), ("alpha", 2L, 2000000L),
        ("beta", 5L, 9000000L)).toDF("term", "doc_id", "wq"),
      "doc_id", "term", "wq", Seq(("alpha", 1000000L)), 10)
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 2L), hits)
  }
}
