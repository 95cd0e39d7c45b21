package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation.
  *
  * Everything gates on `hash60(key) mod 10⁶ < rate·10⁶` — a pure per-row
  * filter evaluated at scan speed with no shuffle and no RNG state, so a
  * sample is (a) reproducible across runs/partitionings, (b) consistent
  * between engines (the DuckDB oracle replicates the md5-derived hash
  * bit-for-bit), and (c) stable under re-partitioning — the properties
  * `rand()`-based sampling lacks. The same discipline as the reference's
  * md5-mod-N shard routing (`coordinator/main.py:43-45`), applied to
  * corpus curation instead of placement.
  */
object Sampling {

  private val Denom = 1000000L

  /** Ceiling on stratum cardinality for every per-stratum driver pull
    * ([[ratesForMixture]], [[temperatureRates]], [[tokenMixtureRates]])
    * and literal CASE chain ([[stratifiedSample]], [[tokenBudgetSample]]).
    * Strata are domains/languages/sources — thousands at most; a
    * mis-keyed stratum column (URL, doc id) would otherwise pull the
    * corpus cardinality to the driver. Every pull is `limit(MaxStrata+1)`
    * BEFORE collecting, so the validation itself is driver-bounded
    * (the `Ann.MaxCentroids` discipline).
    */
  val MaxStrata = 10000

  /** Bounded stratum pull: at most [[MaxStrata]]+1 rows reach the
    * driver; one row past the ceiling throws loudly instead of OOMing.
    */
  private def boundedStrata(df: DataFrame, what: String): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(MaxStrata + 1).collect()
    require(rows.length <= MaxStrata,
      s"$what exceeds MaxStrata = $MaxStrata distinct strata — the " +
        "stratum column looks mis-keyed (URL/id instead of " +
        "domain/language); per-stratum rates must stay driver-bounded")
    rows
  }

  /** Keep a row iff its hashed key falls under `rate` (0.0–1.0). */
  def hashSample(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(hashGate(key, lit(rate)))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spiliotis A-ES
    * via exponential keys): each row draws a deterministic hash-uniform
    * u ∈ (0, 1) from its key and is ranked by es = ln(u)/w — the global
    * top-k under es is an exact weighted sample without replacement
    * (equivalent to ranking by u^(1/w)). RNG-free, so re-runs and
    * retried tasks select identical rows, and the plan is one
    * TakeOrderedAndProject (per-partition heap + driver merge of k
    * rows) — no corpus shuffle at any input size. The selection key is
    * quantized (9 dp) with the id as tie-break, so borderline rows at
    * the k boundary resolve identically across engines.
    *
    * Returns the k sampled rows with the selection key as `es`.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (pmod(Dedup.hash60(key.cast("string")), lit(Denom)).cast("double") +
      lit(1.0)) / lit(Denom.toDouble + 1.0)
    val es = round(log(u) / weight.cast("double"), 9) + lit(0.0)
    df.withColumn("es", es)
      .orderBy(col("es").desc, key)
      .limit(k)
  }

  /** Domain-mixture sampling: each stratum (e.g. source/domain) keeps
    * rows at its own rate — how a 100 TB corpus is re-weighted toward a
    * target mixture without materializing intermediate copies. `rates`
    * maps stratum value → keep-rate; unlisted strata use `defaultRate`.
    * The rate lookup folds into a literal CASE chain: per-row compute
    * only, nothing to broadcast or join.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r"))
    require(rates.size <= MaxStrata,
      s"rates map has ${rates.size} strata > MaxStrata = $MaxStrata — " +
        "the literal CASE chain must stay plan-bounded")
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(hashGate(key, rateCol))
  }

  /** Per-stratum keep-rates that hit a target mixture: stratum s gets
    * rate min(1, targetWeight(s) · targetSize / count(s)). The stratum
    * count table is tiny by definition (one row per domain), so it is
    * collected driver-side — bounded by [[MaxStrata]] with a loud
    * require (a mis-keyed stratum column must fail validation, not OOM
    * the driver); the 100 TB corpus itself is only ever touched by the
    * resulting scan-speed filter.
    */
  def ratesForMixture(df: DataFrame, stratum: Column,
                      targetWeights: Map[String, Double],
                      targetSize: Long): Map[String, Double] = {
    val counts = boundedStrata(df.groupBy(stratum.as("__s")).count(),
        "ratesForMixture stratum count table")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targetWeights.map { case (s, w) =>
      val n = counts.getOrElse(s, 0L)
      s -> (if (n == 0) 0.0 else math.min(1.0, w * targetSize / n))
    }
  }

  /** Temperature-flattened mixture rates (the XLM-R / mT5 multilingual
    * balancing scheme, Conneau et al. 2020 §3.1): stratum s is sampled
    * with probability p_s ∝ n_s^alpha — alpha = 1 keeps natural
    * proportions, alpha → 0 flattens toward uniform, lifting
    * low-resource strata a proportional mixture starves. Per-doc keep
    * rate r_s = min(1, (n_s^alpha / Σ n^alpha) · targetSize / n_s),
    * quantized to 6 dp so the downstream md5 gate decides borderline
    * rows identically across engines. The stratum count table is one
    * bounded aggregate (one row per domain) collected driver-side; the
    * 100 TB corpus is only ever touched by the resulting scan-speed
    * filter (`stratifiedSample` with these rates). Σ n^alpha runs over
    * strata SORTED BY NAME — a fixed summation order the oracle can
    * replicate exactly.
    */
  def temperatureRates(df: DataFrame, stratum: Column, alpha: Double,
                       targetSize: Long): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    require(targetSize > 0, s"targetSize must be positive, got $targetSize")
    val counts = boundedStrata(df.groupBy(stratum.as("__s")).count(),
        "temperatureRates stratum count table")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sumPow = counts.toSeq.sortBy(_._1)
      .map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    counts.map { case (s, n) =>
      val r = math.pow(n.toDouble, alpha) / sumPow * targetSize / n
      s -> BigDecimal(math.min(1.0, r))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  /** Per-stratum keep-rates that hit a target TOKEN mixture (the
    * data-mixing step of an LLM training pipeline: proportions are
    * budgeted in tokens, not documents). Downsampling only — the
    * achievable corpus size is N = minₛ totalTokens(s)/propₛ, and
    * stratum s keeps rate propₛ·N/totalTokens(s), so the binding
    * stratum keeps everything and every other stratum is thinned to
    * proportion. All arithmetic is plain IEEE doubles over exact
    * integer token totals in a fixed order, so the DuckDB oracle
    * reproduces each rate bit-for-bit and the downstream hash gate
    * decides identically. The per-stratum totals table is one row per
    * source — collected driver-side; the corpus is only ever touched
    * by the resulting scan-speed filter.
    */
  def tokenMixtureRates(df: DataFrame, stratum: Column, tokenCount: Column,
                        targetProps: Map[String, Double]): Map[String, Double] = {
    targetProps.values.foreach(p =>
      require(p > 0.0 && p <= 1.0, s"proportion must be in (0,1], got $p"))
    val totals = boundedStrata(df.groupBy(stratum.as("__s"))
        .agg(sum(tokenCount).as("__t")),
        "tokenMixtureRates stratum token-total table")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val achievable = targetProps.flatMap { case (s, p) =>
      totals.get(s).map(t => t.toDouble / p)
    }
    require(achievable.nonEmpty, "no target stratum present in the data")
    val nMax = achievable.min
    targetProps.map { case (s, p) =>
      s -> totals.get(s).map(t => p * nMax / t.toDouble).getOrElse(0.0)
    }
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-unigram bag is under
    * the TARGET distribution (rows where `isTarget`) than under the raw
    * corpus distribution —
    *   w(d) = Σ_tok log( p_target(bucket(tok)) / p_raw(bucket(tok)) )
    * with add-one smoothing over `buckets` hashed vocabulary buckets.
    * Selecting the top-w docs tilts a web-scale corpus toward a small
    * high-quality target (the wiki/books trick) without training a
    * classifier.
    *
    * Scale shape: the two bucket distributions are B-bounded — the
    * count aggregation is map-side combined (shuffle carries (bucket,
    * partial count) × partitions rows) and collapses to B driver rows;
    * the per-bucket log-ratios ride back into the scoring scan as one
    * literal array, so scoring is a pure per-row projection (exact
    * integer micro-unit sum over the token array — order-proof) with a
    * k-bounded top-k reduction. No corpus-sized shuffle anywhere, at
    * any corpus size. Bucket hashing reuses the md5-derived `hash60`
    * (engine-replicable, seed-free), the same discipline as the
    * reference's md5-mod-N routing (`coordinator/main.py:43-45`).
    *
    * Returns (idCol, dsir_w) — weight rounded to 6 decimals; blank
    * docs weigh 0.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 64): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    import graft.functions.{TextFunctions => T}
    val id = col(idCol)
    val bucketOf = (tok: Column) =>
      pmod(Dedup.hash60(tok), lit(buckets.toLong))
    val base = docs
      .select(id, isTarget.as("__t"), T.tokens(lower(col(textCol))).as("__toks"))
      .localCheckpoint(false) // consumed by the stats pass AND scoring
    // one B-bounded aggregate → B driver rows: raw + target counts
    val cr = new Array[Long](buckets)
    val ct = new Array[Long](buckets)
    base.select(col("__t"), explode(col("__toks")).as("__tok"))
      .groupBy(bucketOf(col("__tok")).as("__b"))
      .agg(count(lit(1)).as("cr"),
        sum(col("__t").cast("long")).as("ct"))
      .collect().foreach { r =>
        cr(r.getLong(0).toInt) = r.getLong(1)
        ct(r.getLong(0).toInt) = r.getLong(2)
      }
    val tr = cr.sum.toDouble + buckets
    val tt = ct.sum.toDouble + buckets
    // per-bucket log-ratio in integer micro-units (round AFTER the
    // scale-up — HALF_UP matches DuckDB's away-from-zero ROUND(x, 0))
    val lrMicro: Seq[Long] = (0 until buckets).map { b =>
      val v = math.log(((ct(b) + 1).toDouble / tt) / ((cr(b) + 1).toDouble / tr))
      java.math.BigDecimal.valueOf(v * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
    val lrLit = typedLit(lrMicro)
    base.select(id,
      (round(
        aggregate(
          transform(col("__toks"),
            tok => element_at(lrLit, (bucketOf(tok) + 1).cast("int"))),
          lit(0L), (acc, x) => acc + x).cast("double") / 1000000.0,
        6) + lit(0.0)).as("dsir_w"))
  }

  /** Mikolov-style frequent-word subsampling (word2vec, 2013): token w
    * with corpus frequency f survives with
    *   p(w) = min(1, (√(f/(t·T)) + 1) · (t·T)/f)
    * (T = corpus tokens, t = `threshold`) — "the" mostly drops, rare
    * words always stay. The stochastic coin is replaced by the hash
    * gate over (token:doc:pos), so the thinned corpus is reproducible
    * across runs, partitionings, and engines.
    *
    * Scale shape — two paths, bit-identical results, chosen by the
    * MEASURED vocabulary size (a bounded `limit(maxVocabLiteral+1)`
    * probe, never an unbounded pull):
    *   - vocab ≤ `maxVocabLiteral`: the vocab-count aggregation
    *     (map-side combined) collapses to driver rates that ride back
    *     as a literal map; gating is a pure projection over the token
    *     array — no corpus-sized shuffle, no join.
    *   - vocab > `maxVocabLiteral` (web-scale corpora: 10⁸–10⁹ distinct
    *     tokens of typos/URLs): rates stay DISTRIBUTED — the same rate
    *     formula runs as a projection over the frequency table, the
    *     gate becomes a posexplode → rate-join → re-aggregate pipeline
    *     (AQE broadcasts the rate side while it fits, shuffle-joins
    *     past that), and nothing corpus-cardinality ever reaches the
    *     driver. Same micro-unit quantization (Spark's round(x, 0) IS
    *     BigDecimal HALF_UP on doubles), same hash gate, so both paths
    *     and both engines agree row for row.
    *
    * Returns (idCol, n_orig, n_kept) per document.
    */
  def subsampleFrequent(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.001,
                        maxVocabLiteral: Int = 65536): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    require(maxVocabLiteral >= 0,
      s"maxVocabLiteral must be >= 0, got $maxVocabLiteral")
    import graft.functions.{TextFunctions => T}
    val id = col(idCol)
    val base = docs
      .select(id, T.tokens(lower(col(textCol))).as("__toks"))
      .localCheckpoint(false) // consumed by the vocab agg AND gating
    val freqDf = base.select(explode(col("__toks")).as("__tk"))
      .groupBy(col("__tk")).agg(count(lit(1)).as("f"))
      .localCheckpoint(false) // consumed by the size probe AND one path
    // bounded probe: at most maxVocabLiteral + 1 rows decide the path
    val head = freqDf.limit(maxVocabLiteral + 1).collect()
    if (head.length <= maxVocabLiteral) {
      // literal path: head IS the whole vocabulary
      val freq = head.map(r => r.getString(0) -> r.getLong(1))
      val tT = threshold * freq.map(_._2).sum.toDouble
      val rateMicro: Map[String, Long] = freq.map { case (w, f) =>
        val p = (math.sqrt(f.toDouble / tT) + 1.0) * tT / f.toDouble
        w -> java.math.BigDecimal.valueOf(math.min(p, 1.0) * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }.toMap
      val ratesLit = typedLit(rateMicro)
      val keepAt = (i: Column) => {
        val w = element_at(col("__toks"), i)
        pmod(Dedup.hash60(
          concat(w, lit(":"), id.cast("string"), lit(":"), i.cast("string"))),
          lit(Denom)) < element_at(ratesLit, w)
      }
      base.select(id,
        size(col("__toks")).cast("long").as("n_orig"),
        when(size(col("__toks")) === 0, lit(0L)).otherwise(
          aggregate(
            transform(sequence(lit(1), size(col("__toks"))),
              i => when(keepAt(i), lit(1L)).otherwise(lit(0L))),
            lit(0L), (acc, x) => acc + x)).as("n_kept"))
    } else {
      // distributed path: only the ONE-row token total reaches the
      // driver; t·T is a scalar in the rate projection below, which
      // replays the literal path's exact double op sequence
      // ((√(f/tT) + 1) · tT / f, min 1, ·10⁶, HALF_UP)
      val tT = threshold *
        freqDf.agg(sum(col("f"))).head.getLong(0).toDouble
      val f = col("f").cast("double")
      val rates = freqDf.select(col("__tk"),
        round(least((sqrt(f / lit(tT)) + lit(1.0)) * lit(tT) / f,
          lit(1.0)) * lit(1000000.0), 0).cast("long").as("__rate"))
      // posexplode_outer keeps zero-token docs as one null row → the
      // left join misses → the keep test is null → counted 0
      val positions = base.select(id,
          size(col("__toks")).cast("long").as("__no"),
          posexplode_outer(col("__toks")).as(Seq("__p", "__w")))
        .join(rates, col("__w") === col("__tk"), "left")
      val keep = pmod(Dedup.hash60(
        concat(col("__w"), lit(":"), id.cast("string"), lit(":"),
          (col("__p") + 1).cast("string"))),
        lit(Denom)) < col("__rate")
      positions.groupBy(id)
        .agg(max(col("__no")).as("n_orig"),
          sum(when(keep, lit(1L)).otherwise(lit(0L))).as("n_kept"))
    }
  }

  /** Deterministic train/val/test split: the row's hash bucket
    * (hash60(key) mod 10⁶) lands in [0, tTrain) → "train",
    * [tTrain, tVal) → "val", else "test", with the thresholds quantized
    * to integer millionths so borderline rows resolve identically across
    * engines. Pure per-row compute at scan speed — no shuffle, no RNG —
    * and the assignment is a FUNCTION of the key: re-runs, retries, and
    * later incremental batches route the same document to the same
    * split, so train/test leakage can't creep in as the corpus grows
    * (the property a rand()-based splitter lacks). Split by a GROUPING
    * key (url host, cluster id) rather than the row id when leakage
    * between near-identical rows matters.
    */
  def threeWaySplit(df: DataFrame, key: Column, fracTrain: Double,
                    fracVal: Double): DataFrame = {
    require(fracTrain >= 0.0 && fracVal >= 0.0 && fracTrain + fracVal <= 1.0,
      s"fractions must be non-negative and sum <= 1, got $fracTrain/$fracVal")
    val tTrain = math.round(fracTrain * Denom)
    val tVal = math.round((fracTrain + fracVal) * Denom)
    val b = pmod(Dedup.hash60(key.cast("string")), lit(Denom))
    df.withColumn("split",
      when(b < tTrain, lit("train"))
        .when(b < tVal, lit("val"))
        .otherwise(lit("test")))
  }

  /** LEAKAGE-SAFE three-way split: route every document by its near-dup
    * CLUSTER representative instead of its own id, so a near-duplicate
    * pair can never straddle train and test (the eval-contamination hole
    * a row-keyed split leaves open — two crawl copies of the same page
    * land in different splits and the benchmark leaks). `pairs` is any
    * symmetric duplicate-pair list (`Dedup.nearDupPairs`,
    * `embeddingNearDups`, …); docs in no pair are their own singleton
    * cluster. The representative is the cluster's minimum member id from
    * `Dedup.connectedComponents` — a pure function of the pair list, so
    * re-runs and incremental batches route identically (the
    * [[threeWaySplit]] determinism contract lifted to clusters).
    *
    * Scale shape: connectedComponents is O(log diameter) rounds over the
    * PAIR list only (ids, never text); attaching representatives is one
    * left join keyed on the doc id; the gate itself is scan-speed hash
    * arithmetic. Returns the docs frame + (cluster_rep, split).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String, fracTrain: Double,
                       fracVal: Double): DataFrame = {
    val comps = graft.operators.Dedup.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("node", idCol)
    val withRep = docs.join(comps, Seq(idCol), "left")
      .withColumn("cluster_rep", coalesce(col("comp"), col(idCol)))
      .drop("comp")
    threeWaySplit(withRep, col("cluster_rep"), fracTrain, fracVal)
  }

  private def hashGate(key: Column, rate: Column): Column =
    pmod(Dedup.hash60(key.cast("string")), lit(Denom)).cast("double") <
      rate * lit(Denom.toDouble)

  /** Token-BUDGET sampling: per stratum, keep documents in seeded-hash
    * order until the stratum's token budget is spent ("2B tokens of each
    * language", the unit data mixtures are actually specified in — a
    * RATE can't hit a token target when doc lengths vary). A document is
    * kept iff the total tokens of hash-earlier documents in its stratum
    * is still under the budget, so the budget overshoots by at most one
    * document and the selection is a deterministic, engine-replayable
    * function of (key, stratum) like every sampler here.
    *
    * Scale shape — deliberately NOT one window over each stratum (a
    * 10⁹-doc language would serialize onto one reducer's sort):
    *   1. docs land in `buckets` hash-ORDERED buckets (top bits of the
    *      60-bit key hash, so bucket order = hash order);
    *   2. one map-side-combined (stratum, bucket) token-sum aggregate —
    *      a bounded table (strata × buckets) — yields each bucket's
    *      cumulative start; buckets that END under budget keep every
    *      doc, buckets that START at/over budget drop every doc, both
    *      decided by a BROADCAST probe at scan speed;
    *   3. only the one boundary bucket per stratum (~1/buckets of the
    *      data) pays an exact within-bucket window.
    */
  def tokenBudgetSample(df: DataFrame, stratum: Column, key: Column,
                        tokenCount: Column, budgets: Map[String, Long],
                        defaultBudget: Long, buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0 && buckets <= (1 << 20),
      s"buckets must be a power of two in [2, 2^20], got $buckets")
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      s"budgets must be non-negative")
    require(budgets.size <= MaxStrata,
      s"budgets map has ${budgets.size} strata > MaxStrata = $MaxStrata — " +
        "the literal CASE chain must stay plan-bounded")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(buckets)
    import org.apache.spark.sql.expressions.Window

    val budgetOf = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col("__s") === k, lit(v)).otherwise(acc)
    }
    val base = df
      .withColumn("__s", stratum.cast("string"))
      .withColumn("__h", Dedup.hash60(key.cast("string")))
      .withColumn("__b", shiftrightunsigned(col("__h"), shift))
      .withColumn("__n", tokenCount.cast("long"))

    // bounded (strata × buckets) table → its window is safe by size
    val stats = base.groupBy(col("__s"), col("__b"))
      .agg(sum(col("__n")).as("__bn"))
    val wb = Window.partitionBy(col("__s")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cls = stats
      .withColumn("__cb", sum(col("__bn")).over(wb) - col("__bn"))
      .withColumn("__budget", budgetOf)
      .withColumn("__keep_all", col("__cb") + col("__bn") <= col("__budget"))
      .withColumn("__drop_all", col("__cb") >= col("__budget"))
      .select(col("__s"), col("__b"), col("__cb"), col("__budget"),
        col("__keep_all"), col("__drop_all"))

    val tagged = base.join(broadcast(cls), Seq("__s", "__b"))
    val fullKeep = tagged.filter(col("__keep_all"))
    // boundary: exact within-bucket cumulative, offset by the bucket start
    val wd = Window.partitionBy(col("__s"), col("__b"))
      .orderBy(col("__h"), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKeep = tagged
      .filter(!col("__keep_all") && !col("__drop_all"))
      .withColumn("__before", col("__cb") + sum(col("__n")).over(wd) - col("__n"))
      .filter(col("__before") < col("__budget"))
      .drop("__before")
    fullKeep.unionByName(boundaryKeep)
      .drop("__s", "__h", "__b", "__n", "__cb", "__budget",
        "__keep_all", "__drop_all")
  }
}
