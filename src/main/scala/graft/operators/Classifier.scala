package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fasttext-style hashed-feature linear text classifier — the
  * model-based quality-filter tier of a training-data pipeline (the
  * CCNet / GPT-3 "quality classifier" stage that sits after the
  * heuristic gates): bag of words, each token hashed into one of
  * `buckets` feature slots, a fixed weight per slot, mean slot weight
  * as the document logit, keep when the logit clears a threshold.
  *
  * Weights here derive deterministically from md5 of the slot index —
  * a stand-in for learned weights that swaps for a broadcast weight
  * array at no API change — so the DuckDB oracle replicates scoring
  * bit-for-bit: per-token weights are INTEGERS in [-1000, 1000] and
  * the per-document reduction is an exact integer sum (order-proof
  * across engines), with the single division + round at the end. The
  * logit is reported raw (no sigmoid): sigmoid is monotone, so the
  * keep decision is identical, and exp() is the one primitive whose
  * last-ulp differs across engines.
  *
  * Scale shape: pure per-row projection (two md5s per token), no
  * shuffle, no state — runs at scan speed over 100 TB like the
  * reference's per-vector scan kernels (flat_kernels.cu:4-24).
  */
object Classifier {

  val DefaultBuckets = 4096

  /** Feature slot in [0, buckets) for a token. */
  def slot(tok: Column, buckets: Int = DefaultBuckets): Column =
    pmod(Dedup.hash60(tok), lit(buckets.toLong))

  /** Fixed integer weight in [-1000, 1000] for a feature slot. */
  def slotWeight(slotCol: Column): Column =
    pmod(Dedup.hash60(concat(lit("w:"), slotCol.cast("string"))),
      lit(2001L)) - 1000L

  /** Document logit: (Σ_token slotWeight) / (1000 · max(n_tokens, 1)),
    * at micro (10⁻⁶) resolution — mean feature weight scaled back to
    * [-1, 1].
    *
    * Rounding happens at the INTEGER micro-unit level — round(s·1000/n)
    * then /10⁶ — not as round(q, 6) on the quotient: the quotient's
    * exact rational ties (s and n are integers, so x.xxxxxx5 happens)
    * are invisible in the double, and Spark (exact-BigDecimal HALF_UP)
    * vs DuckDB (multiply-round-divide) resolve the neighborhood
    * differently — 3 of 5000 sf0.1 logits flipped. A half-integer
    * micro value IS exactly representable, both engines round it away
    * from zero, and the final /10⁶ is one correctly-rounded IEEE
    * division — bit-identical everywhere.
    */
  def logit(toks: Column, buckets: Int = DefaultBuckets): Column = {
    val s = aggregate(toks, lit(0L),
      (acc, t) => acc + slotWeight(slot(t, buckets)))
    val micro = round(s.cast("double") * lit(1000.0) /
      greatest(size(toks), lit(1)).cast("double")).cast("long")
    micro.cast("double") / lit(1000000.0) + lit(0.0)
  }

  /** Keep decision at a logit threshold (quantized compare — the
    * rounded logit is what crosses engines exactly).
    */
  def keep(toks: Column, threshold: Double = 0.0,
           buckets: Int = DefaultBuckets): Column =
    logit(toks, buckets) > threshold

  /** Full-batch gradient-descent TRAINER for a linear classifier with a
    * HARD-SIGMOID link — the train-the-quality-classifier step the
    * inference-only [[logit]] presumes already happened. Hard sigmoid
    * (clamp(0.25·z + 0.5, 0, 1) — the standard quantized-inference
    * surrogate) instead of the logistic link because exp() is the one
    * primitive whose last ulp differs across engines (see [[logit]]'s
    * scaladoc); every step here is rational arithmetic + explicit
    * round, so the trained weights are engine-exact.
    *
    * Squared-loss gradient, micro-unit discipline: features quantize to
    * integer micro-units ONCE; each iteration computes p (rounded 6),
    * then ONE map-side-combined aggregate of the per-feature integer
    * gradient sums (the only cluster work — d longs per partition cross
    * the wire); the weight update runs driver-side on d doubles
    * (bounded state, the k-means-centroid convention). Iterations are a
    * FIXED count — the bounded-round discipline of `PageRank`/LPA.
    * At 10¹² rows the per-row gradient terms are ≤ 2.5·10⁵, so the
    * int-64 sums hold to ~3.7·10¹³ rows per partition-free margin;
    * shard the sum as DECIMAL(38,0) past that (q_standardize note).
    *
    * `featsQ` must hold integer micro-unit feature columns and a 0/1
    * double `y`. Returns the final weights, round-6 doubles.
    */
  def trainHardSigmoid(featsQ: org.apache.spark.sql.DataFrame,
                       featCols: Seq[String], yCol: String,
                       iters: Int = 3, lr: Double = 2.0): Seq[Double] = {
    require(iters >= 1 && featCols.nonEmpty)
    val snap = featsQ.localCheckpoint(false) // scanned once per iteration
    val n = snap.count().toDouble
    require(n > 0, "trainHardSigmoid: empty training frame")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var w = Array.fill(featCols.size)(0.0)
    for (_ <- 1 to iters) {
      // z in FIXED term order; p = round(hard-sigmoid, 6)
      val z = featCols.zipWithIndex
        .map { case (c, j) => lit(w(j)) * col(c) }
        .reduce(_ + _) / lit(1000000.0)
      val p = round(least(greatest(lit(0.25) * z + lit(0.5), lit(0.0)),
        lit(1.0)), 6)
      val gAggs = featCols.map(c =>
        sum(round((p - col(yCol)) * lit(0.25) * col(c)).cast("long")))
      val row = snap.agg(gAggs.head, gAggs.tail: _*).head
      w = w.indices.map(j =>
        r6(w(j) - lr * (row.getLong(j) / 1000000.0) / n)).toArray
    }
    w.toSeq
  }
}
