package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.UnigramSegment.unigramSegF

/** Unigram-LM (SentencePiece-style) tokenizer: corpus-derived piece
  * vocabulary + Viterbi segmentation — the probabilistic tokenizer next
  * to the merge-replay BPE family (`BpeTrain` / `BpeExpression`).
  *
  * Scale shape: vocabulary construction is one map-side-combined piece
  * count (pieces explode per row with array HOFs — no join) followed by
  * a TakeOrdered(topN); the bounded vocab (topN rows) collapses to a
  * driver literal and rides into the segmentation kernel broadcast-free
  * (the centroids-in-literal pattern), so segmentation itself is a
  * zero-shuffle per-row kernel at scan speed.
  *
  * Exactness: counts are integral; piece costs quantize
  * round(ln(total/cnt)·10⁶) to micro-unit longs (ln of identical
  * doubles in both engines; the round-6 grain makes a ULP flip
  * astronomically unlikely — same discipline as zipf/flesch); the DP
  * optimum is made UNIQUE by minimizing the full (cost, n, seg) triple,
  * which the oracle replays by exhaustive cover enumeration.
  */
object UnigramLm {

  val FallbackCost = 20000000L

  /** Top-`topN` substring pieces (length 1..maxLen, counted per token
    * occurrence) with micro-unit negative-log-frequency costs.
    */
  def pieceVocab(docs: DataFrame, textCol: String, maxLen: Int = 4,
                 topN: Int = 200): DataFrame = {
    val w = col("w")
    val pieces = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(w =!= "")
      .select(explode(flatten(transform(
        sequence(lit(1), length(w)),
        s => transform(
          sequence(lit(1), least(lit(maxLen), length(w) - s + 1)),
          l => w.substr(s, l))))).as("piece"))
    val top = pieces.groupBy(col("piece"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("piece"))
      .limit(topN)
    val total = top.agg(sum(col("cnt")).as("total"))
    top.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(log(col("total").cast("double") / col("cnt").cast("double"))
          * 1e6, 0).cast("long").as("cost"))
  }

  /** Segment the `topWords` most frequent corpus tokens with the Viterbi
    * kernel against the (bounded, driver-literal) vocabulary. Output:
    * (word, w_cnt, seg, cost, n_pieces).
    */
  def segmentTopWords(docs: DataFrame, textCol: String, maxLen: Int = 4,
                      topN: Int = 200, topWords: Int = 100): DataFrame = {
    val vocab: Seq[(String, Long)] = pieceVocab(docs, textCol, maxLen, topN)
      .select(col("piece"), col("cost")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("w_cnt"))
      .orderBy(col("w_cnt").desc, col("word"))
      .limit(topWords)
    words
      .withColumn("__s", unigramSegF(col("word"), vocab, maxLen, FallbackCost))
      .select(col("word"), col("w_cnt"), col("__s.seg").as("seg"),
        col("__s.cost").as("cost"), col("__s.n").as("n_pieces"))
  }

  /** Column form for callers with their own vocabulary. */
  def segment(word: Column, vocab: Seq[(String, Long)],
              maxLen: Int = 4): Column =
    unigramSegF(word, vocab, maxLen, FallbackCost)
}
