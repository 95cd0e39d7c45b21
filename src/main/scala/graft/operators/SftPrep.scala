package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Instruction-tuning / preference training-data construction.
  *
  * The reference stops at RAG retrieval (rag_demo/ask.py:35-39 feeds the
  * retrieved context to a generator); a production corpus pipeline also
  * has to EMIT model-training data. These four ops cover the standard
  * shapes: chat-template rendering with loss-mask spans (SFT), chosen/
  * rejected pair construction (DPO/RLHF), skip-gram pair generation and
  * the smoothed negative-sampling table (word2vec-style embedding prep).
  *
  * Scale discipline (100 TB corpus):
  *  - rendering and skip-gram generation are per-row narrow maps — no
  *    shuffle at all; skip-gram pairs are generated with array HOFs
  *    (flatten∘transform), NOT a position self-join, so a d-token doc
  *    costs O(d·window) rows map-side and the only shuffle is the final
  *    map-side-combined (center, context) count;
  *  - preference pairs use a per-group min/max STRUCT aggregate (map-side
  *    combinable, one shuffle of group keys), not a window over ranked
  *    documents — a (lang, source) group can hold 10⁹ docs at corpus
  *    scale and a row_number over it would serialize the group;
  *  - the negative-sampling table bounds its window to the top-N rows
  *    AFTER a TakeOrdered(N), so the unpartitioned cumulative sum runs
  *    over N rows, never the vocabulary.
  *
  * Exactness discipline: scores and weights are integral or quantized
  * via correctly-rounded ops only — the doc score is integer floor-
  * division micro-units, and the 0.75-power of the sampling table is
  * computed as sqrt(c·sqrt(c)) because IEEE-754 requires sqrt (unlike
  * pow) to be correctly rounded, so Spark and the oracle agree bitwise.
  */
object SftPrep {

  /** One (user, assistant) turn pair from a token array: the first
    * `userTokens` tokens become the prompt, the next `asstTokens` the
    * response. Docs shorter than userTokens+minAsstTokens are dropped.
    */
  val SystemPrompt = "You are a helpful assistant."

  private def renderParts(u: Column, a: Column): (Column, Column, Column) = {
    val prefix = concat(lit("<|system|>\n" + SystemPrompt + "\n<|user|>\n"),
      u, lit("\n<|assistant|>\n"))
    val rendered = concat(prefix, a, lit("\n<|end|>"))
    (rendered, length(prefix), length(prefix) + length(a))
  }

  /** SFT chat-template rendering with the assistant loss-mask span.
    *
    * Output: (id, n_user_tokens, n_asst_tokens, rendered, asst_start,
    * asst_end) where [asst_start, asst_end) are 0-based char offsets of
    * the assistant text inside `rendered` — the span a trainer computes
    * loss on (everything else is masked). Pure narrow map.
    */
  def renderSft(df: DataFrame, idCol: String, textCol: String,
                userTokens: Int = 12, asstTokens: Int = 50,
                minAsstTokens: Int = 4): DataFrame = {
    val ts = split(col(textCol), " ")
    val u = array_join(slice(ts, 1, userTokens), " ")
    val a = array_join(slice(ts, userTokens + 1, asstTokens), " ")
    val (rendered, start, end) = renderParts(u, a)
    df.filter(size(ts) >= userTokens + minAsstTokens)
      .select(col(idCol),
        least(size(ts), lit(userTokens)).cast("long").as("n_user_tokens"),
        least(size(ts) - userTokens, lit(asstTokens)).cast("long")
          .as("n_asst_tokens"),
        rendered.as("rendered"),
        start.cast("long").as("asst_start"),
        end.cast("long").as("asst_end"))
  }

  /** Integer micro-unit lexical-diversity score: distinct-token ratio in
    * millionths — floor(distinct·10⁶ / total). The FP floor equals exact
    * integer division here: the numerator (≤ ~10⁹ for any real document)
    * is exactly representable, IEEE division is correctly rounded, and
    * its error (< 1 ulp ≈ 10⁻⁹ relative) is far below the smallest
    * nonzero remainder term 1/total — so the quotient can never round
    * across an integer boundary. The oracle's `//` agrees exactly.
    */
  def diversityScore(textCol: Column): Column = {
    val ts = split(textCol, " ")
    floor(size(array_distinct(ts)).cast("double") * 1e6 /
      size(ts).cast("double")).cast("long")
  }

  /** DPO/RLHF preference pairs: per group, (chosen, rejected) = the
    * highest- and lowest-scoring documents (ties broken toward the
    * smaller id on both sides); groups whose margin is 0 (including
    * single-doc groups) are dropped.
    *
    * One map-side-combinable struct min/max aggregate — deliberately NOT
    * a row_number window, which would serialize each group.
    */
  def prefPairs(df: DataFrame, idCol: String, textCol: String,
                groupCols: Seq[String]): DataFrame = {
    val scored = df.select(
      groupCols.map(col) :+ col(idCol).as("pid") :+
        diversityScore(col(textCol)).as("rq"): _*)
    scored
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(struct(col("rq").as("rq"), (-col("pid")).as("nid"))).as("mx"),
        min(struct(col("rq").as("rq"), col("pid").as("pid"))).as("mn"))
      .select(
        groupCols.map(col) :+
          (-col("mx.nid")).as("chosen_id") :+
          col("mn.pid").as("rejected_id") :+
          (col("mx.rq") - col("mn.rq")).as("margin"): _*)
      .filter(col("margin") > 0L)
  }

  /** Skip-gram (center, context) pair counts with a symmetric window,
    * generated per row with array HOFs — no self-join. Returns the top
    * `topN` pairs by count (ties: center, context ascending).
    */
  def skipgramPairs(df: DataFrame, textCol: String, window: Int = 2,
                    topN: Int = 50): DataFrame = {
    val ts = split(col(textCol), " ")
    val n = size(ts)
    val offs = sequence(lit(1), lit(window))
    val fwd = (i: Column) => transform(
      filter(offs, o => i + o < n),
      o => struct(element_at(ts, i + 1).as("center"),
        element_at(ts, i + o + 1).as("context")))
    val bwd = (i: Column) => transform(
      filter(offs, o => i + o < n),
      o => struct(element_at(ts, i + o + 1).as("center"),
        element_at(ts, i + 1).as("context")))
    df.filter(n > 1)
      .select(explode(flatten(transform(sequence(lit(0), n - 1),
        i => concat(fwd(i), bwd(i))))).as("p"))
      .groupBy(col("p.center").as("center"), col("p.context").as("context"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("center"), col("context"))
      .limit(topN)
  }

  /** Contriever-style INDEPENDENT-CROP positive pairs (Izacard et al.
    * 2022 §3.1): two token spans cropped independently from the same
    * document form an unsupervised positive pair for contrastive dense-
    * retriever pretraining — the query/passage supervision a 100 TB raw
    * corpus can manufacture without labels, feeding the same trainer as
    * `q_inbatch_negatives` (which supplies the negatives).
    *
    * Determinism contract: crop length L = max(1, floor(n·cropFrac));
    * the two start offsets are hash60(id:"a") and hash60(id:"b") mod
    * (n−L+1) — a pure function of the doc id, so re-runs, retries and
    * both engines cut identical spans (the mixture-gate RNG-free
    * discipline). Docs under `minToks` tokens are dropped (a crop of a
    * tiny doc is the whole doc — no signal).
    *
    * Scale shape: per-row narrow map, zero shuffle at any corpus size.
    * Returns (idCol, n_tokens, off_a, off_b, crop_a, crop_b).
    */
  def contrastiveCrops(df: DataFrame, idCol: String, textCol: String,
                       minToks: Int = 8,
                       cropFrac: Double = 0.5): DataFrame = {
    require(minToks >= 2, s"minToks must be >= 2, got $minToks")
    require(cropFrac > 0.0 && cropFrac <= 1.0,
      s"cropFrac must be in (0,1], got $cropFrac")
    val ts = when(trim(col(textCol)) === "",
      array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val n = size(ts)
    val len = greatest(lit(1), floor(n * lit(cropFrac)).cast("int"))
    val span = (n - len + 1).cast("long")
    def off(tag: String): Column =
      pmod(Dedup.hash60(concat(col(idCol).cast("string"), lit(":" + tag))),
        span).cast("int")
    df.filter(n >= minToks)
      .select(col(idCol), ts.as("__t"), n.cast("long").as("n_tokens"),
        len.as("__l"), off("a").as("off_a"), off("b").as("off_b"))
      .select(col(idCol), col("n_tokens"), col("off_a"), col("off_b"),
        array_join(slice(col("__t"), col("off_a") + 1, col("__l")), " ")
          .as("crop_a"),
        array_join(slice(col("__t"), col("off_b") + 1, col("__l")), " ")
          .as("crop_b"))
  }

  /** Word2vec-style negative-sampling table: the top-N unigrams with
    * count^0.75 weights (micro-unit longs) and their cumulative sum —
    * the inverse-CDF lookup table a sampler binary-searches.
    *
    * c^0.75 is computed as sqrt(c·sqrt(c)): IEEE-754 sqrt is correctly
    * rounded everywhere, pow is not. The cumulative window runs over the
    * top-N rows only (post-limit), so its single partition holds N rows.
    */
  def negSamplingTable(df: DataFrame, textCol: String,
                       topN: Int = 100): DataFrame = {
    val top = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(topN)
      .withColumn("wq",
        round(sqrt(col("cnt").cast("double") * sqrt(col("cnt").cast("double")))
          * 1e6, 0).cast("long"))
    top.withColumn("cum_wq",
      sum(col("wq")).over(Window.orderBy(col("cnt").desc, col("word"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
