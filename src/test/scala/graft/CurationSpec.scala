package graft

import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("curate: each stage drops exactly its target docs") {
    import spark.implicits._
    val wordsA = (1 to 40).map(i => s"w$i").mkString(" ")
    val wordsF = (1 to 40).map(i => s"v$i").mkString(" ")
    val wordsU = (1 to 40).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", wordsA),                                        // kept (canonical)
      (2L, "srcA", wordsA),                                        // exact dup of 1 → dropped
      (3L, "srcA", (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"), // near-dup of 1 → dropped
      (4L, "srcB", Seq.fill(40)("spam").mkString(" ")),            // repetition gate → dropped
      (5L, "srcB", "too short"),                                   // quality gate → dropped
      (6L, "srcB", wordsF),                                        // kept
      (7L, "srcC", wordsU + " mail a@b.co"),                       // redacts to same as 8 → kept (lower id)
      (8L, "srcC", wordsU + " mail c@d.co")                        // exact dup AFTER redaction → dropped
    ).toDF("doc_id", "source", "text")
    val kept = Curation.curate(docs, "doc_id", "text", "source")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 6L, 7L), s"got $kept")
  }

  test("curate keepBestQuality: cluster keeps its best copy even when the mirror's id sorts lower") {
    import spark.implicits._
    // 1 is a MANGLED mirror (shorter → lower quality) of 2; greedy
    // pairwise keeps the lower id regardless, the quality policy must
    // keep 2. Doc 5 unrelated.
    val full = (1 to 60).map(i => s"w$i").mkString(" ")
    val mangled = (1 to 42).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, "srcA", mangled),
      (2L, "srcA", full),
      (5L, "srcB", other)
    ).toDF("doc_id", "source", "text")
    val greedy = Curation.curate(docs, "doc_id", "text", "source")
      .collect().map(_.getLong(0)).toSet
    assert(greedy == Set(1L, 5L), s"greedy keeps the lower id: $greedy")
    val best = Curation.curate(docs, "doc_id", "text", "source",
        keepBestQuality = true)
      .collect().map(_.getLong(0)).toSet
    assert(best == Set(2L, 5L), s"quality policy keeps the best copy: $best")
  }

  test("curate plan shape: no cartesian, caller pushdown reaches the scan, pinned shuffle count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener

    // parquet-backed fixture with a decoy column: the composition must
    // prune it out of the scan and pass a caller predicate down to it
    val dir = java.nio.file.Files.createTempDirectory("graft_curplan_").toString
    (0 until 60).map { i =>
      val words = (1 to 40).map(j => s"t${i}x$j").mkString(" ")
      (i.toLong, s"src${i % 3}", words, s"junkpayload$i")
    }.toDF("doc_id", "source", "text", "decoy")
      .write.mode("overwrite").parquet(dir)

    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // deterministic plan strings
    spark.listenerManager.register(listener)
    try {
      val docs = spark.read.parquet(dir)
        .filter($"source" =!= "srcX") // caller predicate → must reach PushedFilters
        .select($"doc_id", $"source", $"text")
      val got = Curation.curate(docs, "doc_id", "text", "source").collect()
      assert(got.nonEmpty)
      // the SQL listener bus is async: poll until the capture stabilizes
      var last = -1
      var same = 0
      val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
      while (same < 3 && System.nanoTime < deadline) {
        Thread.sleep(200)
        if (plans.size == last) same += 1 else { same = 0; last = plans.size }
      }
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
    val all = scala.jdk.CollectionConverters.ListHasAsScala(plans).asScala.toList
    assert(all.nonEmpty, "no query executions captured")
    val joined = all.mkString("\n")
    // 1. no unbounded join shapes anywhere in the composition
    assert(!joined.contains("CartesianProduct") &&
      !joined.contains("BroadcastNestedLoopJoin"),
      "curate must never plan a cartesian/nested-loop join")
    // 2. the caller's predicate pushes through the redact/score stage
    //    down to the parquet scan (curate's own filters are on computed
    //    columns by design, so pushdown here means not BLOCKING it)
    assert(joined.contains("Not(EqualTo(source,srcX))"),
      "caller predicate must reach PushedFilters on the fixture scan")
    // 3. column pruning survives the composition: the decoy column never
    //    enters any scan
    assert(!joined.contains("decoy"), "unused column must be pruned from scans")
    // 4. pinned shuffle count — the composed pipeline is exactly 7 hash
    //    exchanges (fingerprint agg, semi-join pair, LSH band agg + pair
    //    joins, min-struct canonical agg, final anti-join; one of them
    //    reused). A future edit that adds a shuffle fails here and must
    //    update OPERATORS.md's curation row with the new measurement.
    val shuffles = "Exchange (hash|range|RoundRobin|Single)".r
      .findAllIn(joined).size
    assert(shuffles == 7, s"expected exactly 7 shuffle exchanges, got $shuffles")
  }

  test("curate: mixture rates gate the cleaned population deterministically") {
    import spark.implicits._
    val docs = (0 until 200).map { i =>
      val words = (1 to 40).map(j => s"t${i}x$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) "keepall" else "dropall", words)
    }.toDF("doc_id", "source", "text")
    val kept = Curation.curate(docs, "doc_id", "text", "source",
        rates = Map("keepall" -> 1.0, "dropall" -> 0.0), defaultRate = 1.0)
      .collect().map(_.getLong(0))
    assert(kept.length == 100 && kept.forall(_ % 2 == 0))
  }
}
