package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.ArrayExpressions.sortedIntersectCountF

/** TextTiling topic segmentation (Hearst 1997) — semantic chunking for
  * RAG ingest: split each document where LEXICAL COHESION between
  * adjacent fixed-width token blocks drops below a threshold, so chunk
  * boundaries land on topic shifts instead of arbitrary word offsets
  * (the upgrade over the reference's fixed-window chunker,
  * `rag_demo/ingest.py:22-25`). Cohesion is the Jaccard similarity of
  * the adjacent blocks' distinct-token sets — Hearst's block-comparison
  * score with set overlap in place of the cosine, keeping every step in
  * integer arithmetic.
  *
  * Scale shape: the whole computation is per-row array HOFs over the
  * token list — zero joins, zero shuffles, no window; the only
  * post-processing is the final posexplode to block rows. O(B·w) per
  * document for the block builds and O(B²) for the running boundary
  * count, with B = #blocks ~ len/w — bounded by document length, never
  * by corpus size.
  *
  * Cross-engine exactness: distinct blocks sort once and intersect via
  * the native sorted-merge kernel, Jaccard quantizes by integer floor
  * division to millionths, and the boundary rule is an integer compare —
  * bit-exact against the oracle's list-algebra replay at every block
  * (`q_semantic_chunks`).
  */
object TextTiling {

  /** Exact long floor division usable inside lambda scopes (where
    * `expr("a div b")` can't see the bound variables): a and b
    * non-negative, b > 0 — (a − a mod b) is an exact multiple of b, so
    * the double division is exact.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Block rows (idCol, block_idx, n_tokens, cohesion_micro, chunk_idx)
    * per document: tokens split into `blockWords`-word blocks,
    * cohesion_micro = Jaccard of adjacent distinct-token sets in integer
    * millionths (−1 for block 0 — no predecessor), and a new chunk
    * starts wherever cohesion drops below `thresholdMicro`. Documents
    * with no tokens are omitted.
    */
  def segments(docs: DataFrame, idCol: String, textCol: String,
               blockWords: Int = 15,
               thresholdMicro: Long = 100000L): DataFrame = {
    require(blockWords >= 1 && thresholdMicro >= 0)
    val w = blockWords
    val toks = when(trim(col(textCol)) === "",
        array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val base = docs.select(col(idCol), toks.as("__t"))
      .filter(size(col("__t")) > 0)
      // nb = ceil(len / w), sizes = per-block token counts
      .select(col(idCol), col("__t"),
        expr(s"(size(__t) + ${w - 1}) div $w").as("__nb"))
    val blocks = transform(sequence(lit(0), col("__nb") - 1),
      b => slice(col("__t"), b * w + 1, lit(w)))
    val staged = base.select(col(idCol), col("__nb"),
      transform(blocks, b => size(b).cast("long")).as("__ns"),
      transform(blocks, b => sort_array(array_distinct(b))).as("__db"))
    // cohesion[i] (0-based): −1 for i = 0, else Jaccard millionths of
    // distinct blocks i−1 and i (element_at is 1-based)
    val coh = transform(sequence(lit(0), col("__nb") - 1), i => {
      val prev = element_at(col("__db"), i.cast("int"))
      val cur = element_at(col("__db"), (i + 1).cast("int"))
      val inter = sortedIntersectCountF(prev, cur).cast("long")
      when(i === 0, lit(-1L))
        .otherwise(idiv(inter * 1000000L,
          size(prev).cast("long") + size(cur) - inter))
    })
    val withCoh = staged.select(col(idCol), col("__nb"), col("__ns"),
      coh.as("__coh"))
    // chunk_idx[i] = (# of boundaries among blocks 0..i) − 1; block 0's
    // −1 cohesion is always below any threshold, so it opens chunk 0
    val chunkIdx = transform(sequence(lit(0), col("__nb") - 1),
      i => aggregate(slice(col("__coh"), lit(1), i + 1), lit(0L),
        (acc, c) => acc + when(c < thresholdMicro, 1L).otherwise(0L)) - 1L)
    withCoh
      .select(col(idCol),
        posexplode(arrays_zip(col("__ns").as("n_tokens"),
          col("__coh").as("cohesion_micro"),
          chunkIdx.as("chunk_idx"))))
      .select(col(idCol), col("pos").cast("long").as("block_idx"),
        col("col.n_tokens").as("n_tokens"),
        col("col.cohesion_micro").as("cohesion_micro"),
        col("col.chunk_idx").as("chunk_idx"))
  }
}
