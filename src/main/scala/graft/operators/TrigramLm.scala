package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language model for perplexity filtering — the
  * statistical-LM quality gate of a training-data pipeline (the CCNet /
  * LLaMA preprocessing step that scores documents against a reference
  * corpus LM and drops the high-perplexity tail; KenLM stands in for
  * the reference implementation there, a char-trigram model here).
  *
  * Why this scales: the model is BOUNDED — a normalized [a-z0-9 ]
  * alphabet has ≤ 37³ ≈ 50k trigrams no matter the corpus size — so
  * training is one map-side-combined groupBy producing a table that
  * always broadcasts, and scoring is a broadcast-hash join + per-doc
  * partial aggregation: the only shuffle carries one (doc, partial sum)
  * row per doc per partition.
  *
  * Why it crosses engines exactly: per-trigram log-probabilities are
  * quantized to integer MICRO-UNITS (round-6 ln → ×10⁶ → integer, the
  * BM25/ADC discipline), so each document's sum is exact integer
  * arithmetic regardless of partitioning, with one final division.
  * Add-one smoothing: p(t) = (count(t)+1) / (total+V), V = distinct
  * trigram count; unseen trigrams (cross-corpus scoring) take
  * p = 1/(total+V).
  */
object TrigramLm {

  /** Lowercase, fold non-[a-z0-9] runs to single spaces, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Overlapping character trigrams of the normalized text (empty when
    * shorter than 3 chars). Native one-pass kernel
    * (`expressions.TrigramExpression`) — the HOF spec below re-runs the
    * normalize regex chain per element inside its lambda.
    */
  def trigrams(text: Column): Column =
    graft.expressions.TrigramExpression.trigramsF(text)

  /** Declarative HOF spec for `trigrams` — agreement-tested; O(len²)
    * interpreted regex work per row, never the hot path.
    */
  def trigramsHof(text: Column): Column = {
    val n = normalize(text)
    when(length(n) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(n) - 2),
        i => n.substr(i, lit(3))))
  }

  /** Trigram counts over a corpus: (tri, cnt). Map-side combined; the
    * result is ≤ ~50k rows at any corpus size.
    */
  def train(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(trigrams(col(textCol))).as("tri"))
      .groupBy(col("tri")).agg(count(lit(1)).as("cnt"))

  /** Per-document mean negative log-likelihood (nats/trigram, round-4)
    * under the trained model: (idCol, n_tri, nll). Documents with no
    * trigrams are omitted (nothing to score). Low nll ⇒ in-domain text;
    * perplexity filtering drops the high-nll tail.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            counts: DataFrame): DataFrame = {
    val stats = counts.agg(sum(col("cnt")), count(lit(1))).head
    if (stats.isNullAt(0)) // empty model (no trainable text) → nothing to score
      return docs.select(col(idCol), lit(0L).as("n_tri"),
        lit(0.0).as("nll")).limit(0)
    val total = stats.getLong(0).toDouble
    val v = stats.getLong(1).toDouble
    // micro-units: round(ln(p), 6) · 10⁶ as an exact integer
    def micro(p: Column): Column =
      round(round(log(p), 6) * 1000000).cast("long")
    val model = counts.select(col("tri"),
      micro((col("cnt").cast("double") + 1.0) / lit(total + v)).as("__lp"))
    val unseen = micro(lit(1.0) / lit(total + v))
    docs.select(col(idCol), explode(trigrams(col(textCol))).as("tri"))
      .join(broadcast(model), Seq("tri"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"),
        sum(coalesce(col("__lp"), unseen)).as("__s"))
      .select(col(idCol), col("n_tri"),
        (round((-col("__s")).cast("double") / 1000000.0 /
          col("n_tri").cast("double"), 4) + lit(0.0)).as("nll"))
  }
}
