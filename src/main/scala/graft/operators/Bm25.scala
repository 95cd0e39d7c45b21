package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** BM25 lexical retrieval — the keyword-search half of hybrid RAG
  * retrieval (the reference ships only the dense half; production
  * stacks pair it with BM25 and fuse ranks — see `rrfFuse`).
  *
  * Okapi BM25 with the +1 idf variant (always positive):
  * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1),
  * s(d,t) = idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
  *
  * Execution shape — ZERO corpus-sized shuffles: doc length and
  * per-query-term tf are per-row array computations over the token
  * array (never an exploded postings table), so the only aggregation
  * is ONE map-side-combined pass producing a single driver row
  * (N, Σdl, per-term df — a handful of longs at any corpus size); idf
  * then rides back in as literals and scoring + top-k are a second
  * scan with a k-bounded reduction. Per-term scores quantize to
  * integer micro-units before the fixed-order per-doc sum, so totals
  * are exact integer sums (order-proof across partitionings and
  * engines) with a single final division. A served index would
  * persist the (dl, tf-vector) projection once (`sources/Layout`
  * bucketing) and reuse it per query.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Top-k docs for a bag-of-words query. Scores rounded to 4 decimals;
    * total order (score desc, id asc).
    */
  def search(docs: DataFrame, idCol: String, textCol: String,
             terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty)
    val id = col(idCol)
    // per-row: doc length + one tf per query term, straight off the
    // token array — no explode, no postings shuffle
    val base = docs
      .select(id, T.tokens(lower(col(textCol))).as("__toks"))
      .select(id, size(col("__toks")).cast("long").as("__dl"),
        array(terms.map(t =>
          size(filter(col("__toks"), x => x === lit(t))).cast("long")): _*)
          .as("__tfs"))
      .localCheckpoint(false) // consumed by the stats pass AND scoring
    // one global aggregate → one driver row: N, Σdl, df per term
    val aggs = count(lit(1)) +: sum(col("__dl")) +:
      terms.indices.map(i =>
        sum((element_at(col("__tfs"), i + 1) > 0).cast("long")))
    val statsRow = base.agg(aggs.head, aggs.tail: _*).head
    val n = statsRow.getLong(0).toDouble
    val avgdl = statsRow.getLong(1).toDouble / n
    val dfs = terms.indices.map(i => statsRow.getLong(2 + i).toDouble)
    // idf as literals (round-6, same value the previous in-plan
    // round(log(...), 6) produced — BigDecimal HALF_UP both ways)
    val idfs = dfs.map { df =>
      java.math.BigDecimal.valueOf(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    // 2.2 as a PARSED literal, not K1+1: 1.2+1.0 in binary sits on a
    // round-to-even knife edge and may differ from decimal "2.2" by an
    // ulp — the oracle parses the same decimal text
    def termMicro(i: Int) = {
      val tf = element_at(col("__tfs"), i + 1).cast("double")
      round(lit(idfs(i)) * tf * lit(2.2) /
        (tf + lit(K1) * (lit(1.0) - lit(B) +
          lit(B) * col("__dl").cast("double") / lit(avgdl))) * 1000000)
        .cast("long")
    }
    val scored = base
      .filter(exists(col("__tfs"), t => t > 0)) // rank only matching docs
      .select(id,
        (round(terms.indices.map(termMicro).reduce(_ + _).cast("double")
          / 1000000.0, 4) + lit(0.0)).as("score"))
    TopK.topK(scored, col("score"), id, k)
  }

  /** Inverted-index (postings-list) build: one row per distinct term
    * with document frequency and the SORTED posting list — the
    * materialized index a served lexical stack persists (the shuffle-
    * free `search` above deliberately avoids it per query; a real
    * deployment builds this ONCE and writes it partitioned/bucketed by
    * term, `sources/Layout`).
    *
    * Scale shape: per-doc distinct terms (per-row projection), then one
    * shuffle carrying (term, doc_id) pairs with map-side-combined
    * aggregation. At web scale a head-term posting list ("the") is the
    * corpus itself — cap it out (`maxPostings`: keep lowest doc ids,
    * record true df) or drop stopword terms upstream; an uncapped
    * collect_list on a head term is the hot-bucket failure mode the
    * LSH cap guards against, same discipline.
    */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 10000): DataFrame = {
    require(maxPostings >= 1)
    docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(T.tokens(lower(col(textCol))))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        slice(sort_array(collect_list(col("__id"))), 1, maxPostings)
          .as("postings"))
  }

  /** Positional postings (id, pos, term), 0-based — the index shape
    * behind exact phrase queries (the non-positional [[buildPostings]]
    * can only answer bag-of-words membership).
    */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol),
      posexplode(T.tokens(lower(col(textCol)))).as(Seq("pos", "term")))

  /** Exact phrase search: docs containing the consecutive token sequence
    * `phrase`, with the match count. Each phrase term's postings are
    * pruned AT THE SCAN (a `term = …` filter per side, pushed below the
    * explode's generator input where possible), so the position-alignment
    * joins move only the phrase terms' occurrence lists — never the full
    * positional index; the k-way join keys on (id, aligned pos), both
    * engines' standard positional-index phrase plan. Corpus text is
    * scanned once per phrase term; at 100 TB the same joins run against a
    * PERSISTED positional-postings table instead (build once via
    * [[positionalPostings]], prune by term at the parquet scan).
    */
  def phraseHits(docs: DataFrame, idCol: String, textCol: String,
                 phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val p = positionalPostings(docs, idCol, textCol)
    val first = p.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (term, i)) =>
      acc.join(
        p.filter(col("term") === term)
          .select(col(idCol), (col("pos") - i).as("pos")),
        Seq(idCol, "pos"))
    }.groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }

  /** Pseudo-relevance-feedback expansion terms (the Rocchio/RM3 family:
    * assume the first-pass top-k docs are relevant, mine them for the
    * terms the query forgot): the `nTerms` highest summed-tf-idf terms
    * across the seed query's top-`kDocs` BM25 hits, seed terms excluded,
    * ties to term asc. Deterministic — no sampling, no model.
    *
    * Scale shape: the first-pass search is [[search]] (no corpus
    * shuffle); the mining side restricts [[Tfidf.vectorize]]'s exploded
    * weights to the top-k docs via a broadcast semi-join BEFORE the
    * vocab-bounded term aggregate, and only `nTerms` rows ever reach
    * the driver.
    */
  def prfExpansionTerms(docs: DataFrame, idCol: String, textCol: String,
                        seed: Seq[String], kDocs: Int = 10,
                        nTerms: Int = 5): Seq[String] = {
    require(nTerms >= 1, s"nTerms must be >= 1, got $nTerms")
    val top = search(docs, idCol, textCol, seed, kDocs)
    Tfidf.vectorize(docs, idCol, textCol)
      .join(broadcast(top.select(col(idCol))), Seq(idCol))
      .filter(!col("term").isInCollection(seed))
      .groupBy(col("term")).agg(sum(col("wq")).as("__w"))
      .orderBy(col("__w").desc, col("term")).limit(nTerms)
      .collect().map(_.getString(0)).toSeq
  }

  /** Two-pass PRF retrieval: BM25 with the seed query, expand with
    * [[prfExpansionTerms]], re-search with seed ++ expansion — the
    * recall-recovering second pass production lexical stacks run when
    * the first-pass results look thin.
    */
  def prfSearch(docs: DataFrame, idCol: String, textCol: String,
                seed: Seq[String], k: Int, kDocs: Int = 10,
                nTerms: Int = 5): DataFrame =
    search(docs, idCol, textCol,
      seed ++ prfExpansionTerms(docs, idCol, textCol, seed, kDocs, nTerms), k)

  /** Min-max normalize a K-BOUNDED candidate list's scores to [0, 1]
    * (round 6): the per-list calibration step of weighted score fusion
    * (RRF's rank-only alternative keeps no magnitude information; a
    * 0.95-vs-0.94 dense gap and a 12-vs-3 BM25 gap should not weigh
    * equally). The min/max aggregate runs over the top-k candidates —
    * bounded rows by contract — and rides back as a broadcast literal
    * row, so normalization adds no corpus-sized work. A degenerate list
    * (max = min) normalizes to 1.0 everywhere (every candidate is
    * equally best; both engines apply the same CASE).
    */
  def minMaxNorm(df: DataFrame, scoreCol: String,
                 outCol: String): DataFrame = {
    val mm = df.agg(min(col(scoreCol)).as("__mn"), max(col(scoreCol)).as("__mx"))
    df.crossJoin(broadcast(mm))
      .withColumn(outCol,
        when(col("__mx") === col("__mn"), lit(1.0))
          .otherwise(round((col(scoreCol) - col("__mn")) /
            (col("__mx") - col("__mn")), 6) + lit(0.0)))
      .drop("__mn", "__mx")
  }

  /** Weighted linear score fusion of two min-max-normalized candidate
    * lists (id, norm-score): blend = wa·a + (1−wa)·b at micro (1e-6)
    * precision, a doc missing from one list contributes 0 from that
    * side — the convex-combination hybrid (Bruch et al. 2023 analyze
    * exactly this fusion) next to [[rrfFuse]]'s rank-only one.
    *
    * The combination runs in INTEGER micro-units with an explicit
    * half-up carry, not a float round(·, 6): the inputs are 6-dp
    * quantized (minMaxNorm), so wa = 0.5 lands the sum on an exact
    * .5-micro tie for every odd micro total — a tie a float `round`
    * resolves differently across engines (Spark rounds the binary
    * double, DuckDB its shortest decimal repr; first seen as a 1-ulp
    * sf0.001 hash flip in `q_hybrid_blend`). Integer half-up is
    * deterministic everywhere. Products stay ≤ 1e12 — exact in long
    * AND in double, so both engines' arithmetic is identical.
    */
  def blendScores(a: DataFrame, b: DataFrame, idCol: String,
                  scoreCol: String, wa: Double = 0.5): DataFrame = {
    require(wa >= 0.0 && wa <= 1.0, s"wa must be in [0,1], got $wa")
    val wam = math.round(wa * 1e6) // micro-quantized weight
    val ra = a.select(col(idCol), col(scoreCol).as("__a"))
    val rb = b.select(col(idCol), col(scoreCol).as("__b"))
    val aq = round(coalesce(col("__a"), lit(0.0)) * 1e6, 0).cast("long")
    val bq = round(coalesce(col("__b"), lit(0.0)) * 1e6, 0).cast("long")
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol),
        (floor((aq * lit(wam) + bq * lit(1000000L - wam) + lit(500000L))
          .cast("double") / 1e6).cast("long").cast("double") / 1e6)
          .as("blend"))
  }

  /** Reciprocal-rank fusion of two ranked lists (id, rank):
    * rrf(d) = Σ 1/(c + rank_i(d)) over the lists containing d — the
    * standard hybrid-retrieval combiner (Cormack et al. 2009). Pure
    * rational arithmetic over integer ranks: engine-exact.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankCol: String, c: Int = 60): DataFrame = {
    val ra = a.select(col(idCol), col(rankCol).as("__ra"))
    val rb = b.select(col(idCol), col(rankCol).as("__rb"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast("double")), lit(0.0)),
          6).as("rrf"))
  }
}
