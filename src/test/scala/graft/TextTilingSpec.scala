package graft

import org.apache.spark.sql.functions._
import graft.operators.TextTiling

class TextTilingSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("segments: boundary opens where adjacent-block Jaccard drops") {
    val d = docs((0L, "a b c d a b c e x y z w"))
    val out = TextTiling.segments(d, "doc_id", "text",
        blockWords = 4, thresholdMicro = 300000L)
      .orderBy("block_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 4L))
    // coh: -1 (first), |{a,b,c}|/|{a,b,c,d,e}| = 600000, disjoint = 0
    assert(out.map(_.getLong(3)).toSeq == Seq(-1L, 600000L, 0L))
    // 600000 >= threshold -> same chunk; 0 < threshold -> new chunk
    assert(out.map(_.getLong(4)).toSeq == Seq(0L, 0L, 1L))
  }

  test("segments: within-block repeats dedup; ragged tail block counted") {
    val d = docs((0L, "a a b b a b z"))
    val out = TextTiling.segments(d, "doc_id", "text",
        blockWords = 4, thresholdMicro = 500000L)
      .orderBy("block_idx").collect()
    // blocks: [a a b b], [a b z] -> distinct {a,b} vs {a,b,z}
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 3L))
    assert(out(1).getLong(3) == 666666L) // 2/3 in floor millionths
    assert(out.map(_.getLong(4)).toSeq == Seq(0L, 0L))
  }

  test("segments: empty docs omitted, single-block doc is one chunk") {
    val out = TextTiling.segments(
        docs((0L, "   "), (1L, "only four little words")),
        "doc_id", "text", blockWords = 10, thresholdMicro = 100000L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 0L &&
      out(0).getLong(3) == -1L && out(0).getLong(4) == 0L)
  }

  test("segments: chunk ids are non-decreasing and start at 0 on fixture docs") {
    val f = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextTiling.segments(f, "doc_id", "text")
    import spark.implicits._
    val bad = out.groupBy($"doc_id")
      .agg(min($"chunk_idx").as("mn"),
        max($"chunk_idx").as("mx"),
        count(lit(1)).as("nb"),
        countDistinct($"chunk_idx").as("nc"))
      .filter($"mn" =!= 0L || $"mx" =!= $"nc" - 1L || $"nc" > $"nb")
      .count()
    assert(bad == 0)
  }
}
