package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pair evaluation metrics — the QA step of parallel-corpus /
  * paraphrase / distillation pipelines: score each (candidate, reference)
  * text pair with clipped-n-gram BLEU (Papineni et al. 2002) so low-overlap
  * bitext pairs, drifted paraphrases, or degenerate model outputs can be
  * gated before training. The reference repo has no eval surface at all;
  * this extends the engine the same way `Ann.rankQualityAtK` does for
  * retrieval.
  *
  * Scale shape: everything is per-row array compute on the pair frame —
  * zero shuffles, zero joins, whole-stage codegen HOFs. Pair construction
  * (align candidate to reference) is the caller's join; the metric itself
  * adds no exchange at any corpus size.
  *
  * Cross-engine exactness: modified precisions are integer
  * millionth-quantized via floor division, the brevity penalty is the only
  * transcendental (micro-quantized exp, the round-6 ln discipline), and the
  * final BLEU-2 combines them through exact-in-float64 integer products and
  * an IEEE-correctly-rounded sqrt, floored — both engines compute identical
  * doubles at every step (`q_bleu_pairs`).
  */
object TextEval {

  /** Whitespace tokens of trimmed text; empty array for blank text. */
  def toks(text: Column): Column =
    when(trim(text) === "", array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Adjacent-word bigrams ("a b") of a token array; empty below 2. */
  def bigrams(t: Column): Column =
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))

  /** Clipped match count: Σ over distinct candidate grams of
    * min(count-in-candidate, count-in-reference) — BLEU's modified
    * precision numerator. That sum is exactly the MULTISET intersection
    * size, so it computes as one sorted-merge pass of the native
    * `SortedIntersectCount` kernel (which advances BOTH cursors on
    * equality — multiset, not set, semantics): O(len log len) for the
    * sorts instead of the HOF spec's O(distinct·len) rescans.
    */
  def clippedMatches(cand: Column, ref: Column): Column =
    graft.expressions.ArrayExpressions
      .sortedIntersectCountF(sort_array(cand), sort_array(ref))
      .cast("long")

  /** Declarative HOF spec for [[clippedMatches]] — agreement-tested in
    * TextEvalSpec, never the hot path.
    */
  def clippedMatchesHof(cand: Column, ref: Column): Column =
    coalesce(aggregate(
      transform(array_distinct(cand),
        x => least(size(filter(cand, y => y === x)),
          size(filter(ref, y => y === x))).cast("long")),
      lit(0L), (acc, v) => acc + v), lit(0L))

  /** Sentence-level BLEU-2 per pair: (idCol, c_len, r_len, n1, n2,
    * bp_micro, bleu2_micro) — counts exact, brevity penalty and score in
    * integer millionths. Pairs where either side has no tokens are
    * omitted (BLEU undefined there).
    */
  def bleu2(pairs: DataFrame, idCol: String, candCol: String,
            refCol: String): DataFrame = {
    val c = toks(col(candCol))
    val r = toks(col(refCol))
    val base = pairs
      .select(col(idCol), c.as("__c"), r.as("__r"))
      .filter(size(col("__c")) > 0 && size(col("__r")) > 0)
      .select(col(idCol), col("__c"), col("__r"),
        bigrams(col("__c")).as("__c2"), bigrams(col("__r")).as("__r2"))
    val counted = base.select(col(idCol),
      size(col("__c")).cast("long").as("c_len"),
      size(col("__r")).cast("long").as("r_len"),
      clippedMatches(col("__c"), col("__r")).as("n1"),
      clippedMatches(col("__c2"), col("__r2")).as("n2"))
    // true integer floor division (Spark's `/` on longs is double division)
    val p1m = expr("(n1 * 1000000) div c_len")
    val p2m = expr("(n2 * 1000000) div greatest(c_len - 1, 1)")
    val bpMicro = when(col("c_len") >= col("r_len"), lit(1000000L))
      .otherwise(round(exp(lit(1.0) -
        col("r_len").cast("double") / col("c_len").cast("double"))
        * 1000000).cast("long"))
    counted.select(col(idCol), col("c_len"), col("r_len"), col("n1"),
      col("n2"), bpMicro.as("bp_micro"),
      floor(bpMicro.cast("double") *
        sqrt((p1m * p2m).cast("double")) / 1e6).cast("long")
        .as("bleu2_micro"))
  }

  /** Declarative HOF spec of the LCS rolling-row DP — the agreement twin
    * of the native `LcsLength` kernel (TextEvalSpec), never the hot path
    * (the prefix-max formulation is O(m²·n)). Row update per reference
    * token: e[i] = max(dp_old[i], dp_old[i-1] + match_i), then the new
    * row is the prefix running max of e (valid because LCS rows are
    * non-decreasing in i and the max-of-three recurrence is exact).
    */
  def lcsLengthHof(cand: Column, ref: Column): Column = {
    val init = transform(sequence(lit(0), size(cand)), _ => lit(0))
    val folded = aggregate(ref, init, (row, rt) => {
      val e = transform(sequence(lit(0), size(cand)), i =>
        when(i === 0, lit(0)).otherwise(
          greatest(element_at(row, i + 1),
            element_at(row, i) +
              when(element_at(cand, i) === rt, lit(1)).otherwise(lit(0)))))
      transform(sequence(lit(0), size(cand)),
        i => array_max(slice(e, lit(1), i + 1)))
    })
    when(size(cand) === 0 || size(ref) === 0, lit(0))
      .otherwise(element_at(folded, size(cand) + 1))
  }

  /** ROUGE-L per pair (Lin 2004): LCS-based precision/recall/F1 over
    * whitespace tokens — the summarization/compression QA gate beside
    * [[bleu2]] (contiguous n-grams) and [[chrF]] (char morphology): LCS
    * rewards in-order content coverage without contiguity, so sentence
    * compressions and paraphrases score where BLEU's clipped bigrams
    * collapse. Both sides are truncated to their first `maxToks` tokens
    * (the `q_edit_distance` prefix discipline — LCS is O(m·n) per pair,
    * so the caller bounds m and n, not the engine silently).
    *
    * Fully integer-exact: the LCS count comes from the native rolling-row
    * DP kernel (`LcsLength`), P/R quantize by integer floor division and
    * F1 = 2PR/(P+R) folds through exact long products — no float
    * anywhere, both engines agree bit-for-bit. Per-row kernel compute,
    * zero joins/shuffles at any corpus size (pair construction is the
    * caller's). Returns (idCol, c_len, r_len, lcs, p_micro, r_micro,
    * rouge_l_micro); pairs where either truncated side is empty are
    * omitted (ROUGE undefined there).
    */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, maxToks: Int = 40): DataFrame = {
    require(maxToks >= 1, s"maxToks must be >= 1, got $maxToks")
    val counted = pairs
      .select(col(idCol),
        slice(toks(col(candCol)), 1, maxToks).as("__c"),
        slice(toks(col(refCol)), 1, maxToks).as("__r"))
      .filter(size(col("__c")) > 0 && size(col("__r")) > 0)
      .select(col(idCol),
        size(col("__c")).cast("long").as("c_len"),
        size(col("__r")).cast("long").as("r_len"),
        graft.expressions.LcsExpression
          .lcsLengthF(col("__c"), col("__r")).cast("long").as("lcs"))
    counted.select(col(idCol), col("c_len"), col("r_len"), col("lcs"),
        expr("(lcs * 1000000) div c_len").as("p_micro"),
        expr("(lcs * 1000000) div r_len").as("r_micro"))
      .withColumn("rouge_l_micro",
        when(col("p_micro") + col("r_micro") === 0L, lit(0L))
          .otherwise(expr(
            "(2 * p_micro * r_micro) div (p_micro + r_micro)")))
  }

  /** SQuAD answer normalization (Rajpurkar et al. 2016 `normalize_
    * answer`): lowercase, punctuation → space, article removal
    * (a/an/the), whitespace collapse — the canonical QA-eval
    * preprocessing, word-boundary regex only (identical under Java
    * regex and RE2).
    */
  def squadNorm(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
      "[^a-z0-9 ]", " "), "\\b(a|an|the)\\b", " "), " +", " "))

  /** SQuAD-style QA scoring (Rajpurkar et al. 2016): EXACT MATCH on the
    * normalized strings plus token-level F1 via clipped multiset
    * overlap — the evaluation every extractive-QA and many RAG
    * harnesses report, closing the eval family beside BLEU (contiguous
    * n-grams), ROUGE-L (in-order subsequence), chrF (char morphology)
    * and groundedness (context containment).
    *
    * Same kernel economics as the rest: one sorted-merge
    * `SortedIntersectCount` pass per pair, integer-micro F1, per-row
    * compute with zero joins. Returns (idCol, em, n_pred, n_gold,
    * n_overlap, f1_micro); pairs where BOTH sides normalize to empty
    * score em=true, f1=10⁶ (the SQuAD convention for empty-gold), and
    * one-sided empties score zero.
    */
  def squadScore(pairs: DataFrame, idCol: String, predCol: String,
                 goldCol: String): DataFrame = {
    val staged = pairs
      .select(col(idCol), squadNorm(col(predCol)).as("__p"),
        squadNorm(col(goldCol)).as("__g"))
      .select(col(idCol), col("__p"), col("__g"),
        when(col("__p") === "", array().cast("array<string>"))
          .otherwise(split(col("__p"), " ")).as("__pt"),
        when(col("__g") === "", array().cast("array<string>"))
          .otherwise(split(col("__g"), " ")).as("__gt"))
      .select(col(idCol), (col("__p") === col("__g")).as("em"),
        col("__pt"), col("__gt"),
        size(col("__pt")).cast("long").as("n_pred"),
        size(col("__gt")).cast("long").as("n_gold"),
        clippedMatches(col("__pt"), col("__gt")).as("n_overlap"))
    staged.select(col(idCol), col("em"), col("n_pred"), col("n_gold"),
      col("n_overlap"),
      when(col("n_pred") === 0L && col("n_gold") === 0L, lit(1000000L))
        .when(col("n_overlap") === 0L, lit(0L))
        .otherwise(expr(
          """(2 * ((n_overlap * 1000000) div n_pred)
            |   * ((n_overlap * 1000000) div n_gold))
            | div (((n_overlap * 1000000) div n_pred)
            |   + ((n_overlap * 1000000) div n_gold))""".stripMargin))
        .as("f1_micro"))
  }

  /** GROUNDEDNESS of an answer against its retrieval context — the
    * RAG faithfulness gate (the deterministic core of RAGAS-style
    * faithfulness, Es et al. 2023): the fraction of the answer's word
    * bigrams that appear in the context, clipped multiset semantics
    * (an answer repeating a claim 3× needs 3 context occurrences to
    * stay fully grounded). An extractive answer scores 1.0 by
    * construction; fabricated content pulls toward 0 — gate generated
    * samples before they enter a training mix.
    *
    * Same kernel economics as [[bleu2]]: one sorted-merge
    * `SortedIntersectCount` pass per pair, pure per-row compute, zero
    * joins/shuffles (pair construction is the caller's). Integer
    * arithmetic throughout. Returns (idCol, a_len, n_grounded,
    * grounded_micro); answers with < 2 tokens are omitted (no bigram
    * to check).
    */
  def groundedness(pairs: DataFrame, idCol: String, answerCol: String,
                   contextCol: String): DataFrame = {
    // tokenize into COLUMNS first with a filter barrier between the
    // two projections — EXACTLY the bleu2 shape. Back-to-back selects
    // collapse (CollapseProject) and inline toks() into the bigram
    // lambda, re-evaluating the split per element: measured 5.1 s vs
    // 1.2 s at sf0.1 for the same work.
    pairs
      .select(col(idCol), toks(col(answerCol)).as("__a"),
        toks(col(contextCol)).as("__c"))
      .filter(size(col("__a")) > 1)
      .select(col(idCol), col("__a"), col("__c"),
        bigrams(col("__a")).as("__a2"), bigrams(col("__c")).as("__c2"))
      .select(col(idCol),
        size(col("__a2")).cast("long").as("a_len"),
        clippedMatches(col("__a2"), col("__c2")).as("n_grounded"))
      .withColumn("grounded_micro",
        expr("(n_grounded * 1000000) div a_len"))
  }

  /** chrF-style character-trigram F-score per pair (Popović 2015, the
    * n=3 / β=2 core): precision and recall of clipped char-trigram
    * matches over the [a-z0-9 ]-normalized texts (the `TrigramLm`
    * alphabet — one shared native kernel), combined as
    * F_2 = 5PR / (4P + R). Catches morphology-level agreement BLEU's
    * word n-grams miss; the usual MT-QA companion metric.
    *
    * Fully integer-exact: clipped counts are multiset intersections
    * (sorted-merge kernel), P/R quantize by integer floor division, and
    * F folds through exact long products — no transcendental anywhere,
    * so both engines agree bit-for-bit at every row. Returns (idCol,
    * n_c, n_r, n_match, p_micro, r_micro, chrf_micro); pairs where
    * either side has no trigrams are omitted.
    */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String): DataFrame = {
    val counted = pairs
      .select(col(idCol),
        TrigramLm.trigrams(col(candCol)).as("__c"),
        TrigramLm.trigrams(col(refCol)).as("__r"))
      .filter(size(col("__c")) > 0 && size(col("__r")) > 0)
      .select(col(idCol),
        size(col("__c")).cast("long").as("n_c"),
        size(col("__r")).cast("long").as("n_r"),
        clippedMatches(col("__c"), col("__r")).as("n_match"))
    counted.select(col(idCol), col("n_c"), col("n_r"), col("n_match"),
        expr("(n_match * 1000000) div n_c").as("p_micro"),
        expr("(n_match * 1000000) div n_r").as("r_micro"))
      .withColumn("chrf_micro",
        when(col("p_micro") + col("r_micro") === 0L, lit(0L))
          .otherwise(expr(
            "(5 * p_micro * r_micro) div (4 * p_micro + r_micro)")))
  }
}
