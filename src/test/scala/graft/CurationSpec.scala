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
