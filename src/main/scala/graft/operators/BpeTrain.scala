package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** BPE merge-rule LEARNING (Sennrich et al. 2016) — the tokenizer-
  * training step of an LLM data pipeline, the counterpart of the
  * encode-side `expressions.BpeEncode` (which applies a trained merge
  * table).
  *
  * Scale shape, the one every real tokenizer trainer uses: the corpus-
  * sized work is ONE word-count aggregation (map-side combined, the
  * shuffle carries (word, partial count)); training then iterates over
  * the bounded VOCAB table driver-side — pair counts, argmax, merge —
  * never touching the corpus again. A 100 TB crawl and a 1 GB sample
  * with the same word distribution train the identical tokenizer.
  *
  * Determinism contract (engine-exact, DuckDB-replicable):
  *  - words = whitespace tokens of lower(text), stripped to [a-z]+;
  *  - pair counts sum over adjacent positions (overlapping: "aaa"
  *    contributes (a,a) twice), weighted by word count;
  *  - argmax tie-break: highest count, then lexicographically smallest
  *    "left|right" (ASCII byte order — both engines agree on [a-z|]);
  *  - a merge applies left-to-right, non-overlapping, to every word.
  */
object BpeTrain {

  /** Learn `nMerges` rules; returns (step, l, r, cnt) rows in learn
    * order. `maxVocab` caps the driver-side table (top words by count,
    * word tie-break) — 2²⁰ words ≈ tens of MB, far above any natural-
    * language vocabulary; the cap only matters for adversarial inputs.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges >= 1 && maxVocab >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(T.tokens(lower(col(textCol)))).as("__tok"))
      .select(regexp_replace(col("__tok"), "[^a-z]", "").as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    toMergesDF(spark, train(words, nMerges))
  }

  /** WordPiece merge-rule learning (Schuster & Nakajima 2012; the
    * BERT-tokenizer objective as implemented in HF tokenizers): same
    * loop as [[learnMerges]] but the argmax maximizes the LIKELIHOOD
    * RATIO score count(l,r) / (count(l) · count(r)) instead of the raw
    * pair count — merging the pair that most exceeds its independence
    * expectation, so rare-but-cohesive morphemes win over frequent
    * coincidences. (Continuation-marker bookkeeping (##) is rendering,
    * not learning — omitted here like the BPE side omits byte-fallback.)
    *
    * Determinism contract: the score compares as the exact integer
    * floor division c·10¹² div (count(l)·count(r)) — BigInt driver-side,
    * HUGEINT in the oracle — ties broken by smallest "l|r"; everything
    * else (word prep, overlap counting, left-to-right merge) is shared
    * with BPE, so the two trainers differ in exactly one line of
    * contract. Scale shape identical: ONE corpus-sized word count, then
    * bounded driver iteration.
    *
    * Returns (step, l, r, cnt, score12) in learn order.
    */
  def learnWordPieceMerges(docs: DataFrame, textCol: String, nMerges: Int,
                           maxVocab: Int = 1 << 20): DataFrame = {
    require(nMerges >= 1 && maxVocab >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(T.tokens(lower(col(textCol)))).as("__tok"))
      .select(regexp_replace(col("__tok"), "[^a-z]", "").as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trainWordPiece(words, nMerges).toDF("step", "l", "r", "cnt", "score12")
  }

  private val Score12 = BigInt(10).pow(12)

  private[graft] def trainWordPiece(words: Array[(String, Long)],
      nMerges: Int): Seq[(Int, String, String, Long, Long)] = {
    var segs: Array[Array[String]] = words.map(_._1.map(_.toString).toArray)
    val counts = words.map(_._2)
    val merges = Seq.newBuilder[(Int, String, String, Long, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val sc = scala.collection.mutable.HashMap.empty[String, Long]
      var w = 0
      while (w < segs.length) {
        val s = segs(w)
        var i = 0
        while (i < s.length) {
          sc.update(s(i), sc.getOrElse(s(i), 0L) + counts(w))
          if (i < s.length - 1) {
            val k = (s(i), s(i + 1))
            pc.update(k, pc.getOrElse(k, 0L) + counts(w))
          }
          i += 1
        }
        w += 1
      }
      if (pc.isEmpty) done = true
      else {
        def score(k: (String, String), c: Long): BigInt =
          (BigInt(c) * Score12) / (BigInt(sc(k._1)) * BigInt(sc(k._2)))
        val ((a, b), cnt) = pc.minBy { case (k, c) =>
          (-score(k, c), k._1 + "|" + k._2)
        }
        merges += ((step, a, b, cnt, score((a, b), cnt).toLong))
        segs = segs.map { s =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += s(i); i += 1 }
          }
          out.result()
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Driver-side Sennrich loop over the (word, count) vocab table. */
  private[graft] def train(words: Array[(String, Long)],
                           nMerges: Int): Seq[(Int, String, String, Long)] = {
    var segs: Array[Array[String]] = words.map(_._1.map(_.toString).toArray)
    val counts = words.map(_._2)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var w = 0
      while (w < segs.length) {
        val s = segs(w)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + counts(w))
          i += 1
        }
        w += 1
      }
      if (pc.isEmpty) done = true
      else {
        val ((a, b), cnt) =
          pc.minBy { case ((x, y), c) => (-c, x + "|" + y) }
        merges += ((step, a, b, cnt))
        segs = segs.map { s =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += s(i); i += 1 }
          }
          out.result()
        }
        step += 1
      }
    }
    merges.result()
  }

  private def toMergesDF(spark: SparkSession,
                         m: Seq[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    m.toDF("step", "l", "r", "cnt")
  }
}
