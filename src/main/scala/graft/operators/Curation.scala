package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** One-call corpus curation: the end-to-end cleaning pipeline a
  * training-data team runs over a raw crawl, composed from this
  * library's scan-speed filters and dedup tiers in the canonical order:
  *
  *   1. PII redaction (per-row regex rewrite — no shuffle),
  *   2. quality + repetition gates on the CLEAN text (per-row predicates
  *      on QUANTIZED scores, so threshold decisions are engine-exact),
  *   3. exact dedup — keep the lowest id per collapsed-text fingerprint
  *      (one hash shuffle, map-side combined),
  *   4. near-dup removal via MinHash-LSH: of every verified pair
  *      (id_a < id_b) the greedy survivor is the side that never appears
  *      as id_b (hot buckets capped by default, see
  *      `Dedup.lshCandidatePairs`); with `keepBestQuality = true` the
  *      pairs instead cluster (connected components) and each cluster
  *      keeps its max-quality member — the FineWeb-style policy that
  *      never drops a clean original for a mangled lower-id mirror, and
  *      handles transitive chains A≈B≈C the greedy pair walk under-merges,
  *   5. deterministic stratified mixture sampling (md5-gate — no RNG).
  *
  * Stage order matters and is part of the contract: redact before
  * fingerprinting (two docs differing only in PII are duplicates),
  * filter before dedup (junk must not become a fingerprint canonical and
  * shield a good copy from removal), sample last (rates apply to the
  * cleaned population). Every stage is an operator with its own oracle
  * query; `q_curation` oracle-checks the composition end to end.
  */
object Curation {

  /** Returns the curated rows: (idCol, stratumCol, quality). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             stratumCol: String,
             minQuality: Double = 0.2, maxDup2gramFrac: Double = 0.5,
             shingleSize: Int = 2, numHashes: Int = 16, bands: Int = 4,
             nearDupThreshold: Double = 0.2,
             rates: Map[String, Double] = Map.empty,
             defaultRate: Double = 1.0,
             keepBestQuality: Boolean = false,
             keepText: Boolean = false): DataFrame = {
    val id = col(idCol)

    // 1–2: redact, then gate on quantized quality/repetition scores.
    // TWO materialization points, both load-bearing (measured at sf0.1):
    //  - `cleaned`: Catalyst inlines a withColumn alias into every
    //    consumer expression, so without this barrier the 3-regex redact
    //    chain re-runs inside EVERY tokens()/ngrams() appearance in the
    //    quality and dup2 trees (~5× per row);
    //  - `scored`: the fingerprint-canonical branch, the semi-join
    //    branch, and the final projection each re-evaluate the whole
    //    scoring subplan otherwise (~3× the scan).
    val cleaned = docs
      .withColumn("__clean", T.redactPii(col(textCol)))
      .withColumn("__toks", T.tokens(col("__clean")))
      .localCheckpoint(false)
    val scored = cleaned
      .withColumn("__quality", round(T.qualityScoreOfTokens(col("__toks")), 4))
      .withColumn("__dup2",
        round(T.dupFraction(T.ngramsOfTokens(col("__toks"), 2)), 4))
      .filter(col("__quality") >= minQuality && col("__dup2") <= maxDup2gramFrac)
      .drop("__toks")
      .localCheckpoint(false)

    // 3: exact dedup on the clean text (keep lowest id per fingerprint)
    val canonical = scored
      .groupBy(T.fingerprint(col("__clean")).as("__fp"))
      .agg(min(id).as(idCol))
      .select(id)
    val uniq = scored.join(canonical, Seq(idCol), "left_semi")
      .localCheckpoint(false) // consumed by the LSH pipeline AND the final anti-join

    // 4: near-dup removal — greedy (drop the id_b side of every verified
    // pair; cheapest, no iteration) or quality-aware (cluster the pairs,
    // keep each cluster's max-quality member; costs the O(log diameter)
    // connected-components rounds on the PAIR list only — corpus-sized
    // stages are untouched)
    val pairs = Dedup.nearDupPairs(uniq, idCol, "__clean", shingleSize,
      numHashes, bands, nearDupThreshold)
    val deduped =
      if (keepBestQuality) {
        val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
        Dedup.keepBestPerCluster(uniq, clusters, idCol, "__quality")
      } else {
        val dropIds = pairs.select(col("id_b").as(idCol)).distinct()
        uniq.join(dropIds, Seq(idCol), "left_anti")
      }

    // 5: mixture sampling (identity when no rates are given)
    val sampled =
      if (rates.isEmpty && defaultRate >= 1.0) deduped
      else Sampling.stratifiedSample(deduped, col(stratumCol), id, rates, defaultRate)

    // keepText surfaces the already-computed REDACTED text for
    // downstream stages (e.g. SFT rendering) instead of forcing callers
    // to join back and re-redact.
    val outCols = Seq(id, col(stratumCol), col("__quality").as("quality")) ++
      (if (keepText) Seq(col("__clean").as("text_clean")) else Nil)
    sampled.select(outCols: _*)
  }
}
