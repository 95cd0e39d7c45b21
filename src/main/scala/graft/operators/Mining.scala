package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{VectorFunctions => V}

/** Margin-based neighbor mining (Artetxe & Schwenk 2019 — the CCMatrix /
  * LASER bitext-mining criterion): a pair (x, y) scores
  *
  *   margin(x, y) = cos(x, y) / (½·(avgNNk(x) + avgNNk(y)))
  *
  * — raw cosine normalized by the two LOCAL neighborhood densities, which
  * suppresses hub vectors that score high against everything (the failure
  * mode of a plain cosine threshold) and surfaces pairs that are unusually
  * close *for their neighborhoods*. The primitive behind mined parallel
  * corpora (CCMatrix) and embedding-based near-dup auditing.
  */
object Mining {

  /** Pairs with pooled-neighborhood margin ≥ `threshold`.
    *
    * Exactness: cosines are quantized to integer ten-thousandths
    * (`cosm`), neighborhood sums stay exact BIGINTs, and the margin is a
    * single double division `cosm·(ka+kb)/(sa+sb)` rounded to 4 dp —
    * pooled-mean normalization (identical to the paper's ½(avg+avg) when
    * both sides have full k) that both engines reproduce bit-for-bit.
    * k-NN membership is decided on (cosm desc, id) — a total order, so
    * borderline neighbors resolve identically across engines. Pairs whose
    * pooled neighborhood sum is ≤ 0 (all-negative neighborhoods; absent
    * in practice) yield a negative/huge ratio and fall to the threshold.
    *
    * Scale shape: this fixture path scores ALL pairs (one broadcast-free
    * self-join) — correct up to ~10⁵ vectors per run. At corpus scale the
    * pair generation composes with the ANN tiers exactly like
    * `semanticDedup`: `Ann.ivfAssign` bounds pairs to IVF cells (or SRP
    * buckets), and the margin normalization uses within-cell kNN — the
    * standard practical approximation (CCMatrix mines against FAISS
    * shards the same way). The kNN stats pass is one window + one
    * map-side-combined sum keyed by vector id; sims are materialized once
    * (localCheckpoint) because the kNN stage and the final scoring both
    * consume them.
    */
  def marginPairs(emb: DataFrame, idCol: String, vecCol: String,
                  k: Int = 8, threshold: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = emb.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
        greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)).as("__n"))
      .localCheckpoint(false)
    val a = e.select(col("__id").as("id_a"), col("__v").as("va"), col("__n").as("na"))
    val b = e.select(col("__id").as("id_b"), col("__v").as("vb"), col("__n").as("nb"))
    val sims = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dotF(col("va"), col("vb")) / (col("na") * col("nb")) * 10000)
          .cast("long").as("cosm"))
    marginFromSims(sims, k, threshold)
  }

  /** [[marginPairs]] at corpus scale — the IVF-cell-bounded variant the
    * marginPairs scaladoc names as the practical approximation
    * (CCMatrix mines against FAISS shards the same way), implemented:
    * vectors are assigned to cells (`Ann.ivfAssign`, broadcast
    * centroids, deterministic 6-dp argmax), pair generation becomes a
    * CELL equi-join (n²/C instead of n²/2 candidates — the same
    * bounding `semanticDedup` uses), and the kNN normalization runs
    * over within-cell neighbors. Same integer ten-thousandths margin
    * contract; `q_margin_ivf` oracle-checks the whole composition
    * (assignment argmax + bounded pairs + margin) against DuckDB.
    *
    * Contract note (the standard approximation's semantics, declared):
    * cross-cell pairs are never scored, and a vector's neighborhood
    * density is estimated from its cell only — near a cell boundary the
    * margin can differ from the exact [[marginPairs]] value. Mitigation
    * at corpus scale is more centroids (smaller, tighter cells), not a
    * wider join.
    */
  def marginPairsIvf(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame, centIdCol: String,
                     centVecCol: String, k: Int = 8,
                     threshold: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val assigned = Ann.ivfAssign(emb, centroids, idCol, vecCol,
      centIdCol, centVecCol)
    val e = assigned.select(col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"), col("cell_id").as("__c"),
        greatest(sqrt(dotF(col(vecCol), col(vecCol))), lit(V.NormEps)).as("__n"))
      .localCheckpoint(false)
    val a = e.select(col("__c"), col("__id").as("id_a"), col("__v").as("va"),
      col("__n").as("na"))
    val b = e.select(col("__c"), col("__id").as("id_b"), col("__v").as("vb"),
      col("__n").as("nb"))
    val sims = a.join(b, Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dotF(col("va"), col("vb")) / (col("na") * col("nb")) * 10000)
          .cast("long").as("cosm"))
    marginFromSims(sims, k, threshold)
  }

  /** Shared margin-scoring tail: quantized pair cosines in, thresholded
    * (id_a, id_b, margin) out — the kNN-density normalization both the
    * exact and the cell-bounded front ends feed. Sims are materialized
    * once (localCheckpoint): the kNN stage and the final scoring both
    * consume them.
    */
  private def marginFromSims(simsPlan: DataFrame, k: Int,
                             threshold: Double): DataFrame = {
    val sims = simsPlan.localCheckpoint(false)
    val directed = sims
      .select(col("id_a").as("src"), col("id_b").as("nbr"), col("cosm"))
      .unionByName(
        sims.select(col("id_b").as("src"), col("id_a").as("nbr"), col("cosm")))
    val w = Window.partitionBy(col("src")).orderBy(col("cosm").desc, col("nbr"))
    val knn = directed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("src"))
      .agg(sum(col("cosm")).as("ksum"), count(lit(1)).as("kn"))
    sims
      .join(knn.select(col("src").as("id_a"),
        col("ksum").as("sa"), col("kn").as("ka")), Seq("id_a"))
      .join(knn.select(col("src").as("id_b"),
        col("ksum").as("sb"), col("kn").as("kb")), Seq("id_b"))
      .withColumn("margin",
        round(col("cosm").cast("double") * (col("ka") + col("kb")) /
          (col("sa") + col("sb")), 4) + lit(0.0))
      .filter(col("margin") >= threshold)
      .select(col("id_a"), col("id_b"), col("margin"))
  }

  /** Default hot-block cap for [[blockedBestMatch]] — same rationale as
    * `Dedup.DefaultMaxBucket`: a block of m candidates × d dirty records
    * runs m·d similarity kernels; one under-discriminating block key
    * ("Smith") at corpus scale would put millions of comparisons on one
    * key. 1024 bounds any block's per-dirty-record fan-out while sitting
    * far above organic block sizes.
    */
  val DefaultMaxBlock: Int = 1024

  /** Blocked fuzzy record linkage with hot-block discipline: each DIRTY
    * record is compared (native JaroWinkler kernel, round-6 — semantics
    * pinned to DuckDB's independent implementation in JaroWinklerSpec)
    * against the CANDIDATE records sharing its blocking key, and resolved
    * to its best match ≥ `minScore` by a map-side-combinable struct
    * argmax (ties to the smallest candidate id) — no window, no
    * all-pairs. Returns (dirty_id, best_id, best_jw, capped).
    *
    * Hot-block handling — the cap is ON by default (`DefaultMaxBlock`):
    * blocks whose CANDIDATE side exceeds `maxBlock` are truncated to the
    * `maxBlock` smallest candidate ids (deterministic, selected by the
    * k-bounded `TopKAggregator` — partial aggregation buffers ≤ maxBlock
    * entries per block, never a full-block sort on one reducer), and
    * every match emitted from such a block carries `capped = true`. A hot
    * block means the blocking key under-discriminates there ("Smith" on
    * real name data); the honest contract is a bounded, flagged search
    * over the block's canonical members — the caller re-blocks flagged
    * rows with a longer key rather than silently paying m·d kernels.
    * `maxBlock = 0` disables the cap (small-data exact twins).
    *
    * Scale shape: the block-stats aggregate is map-side combined and
    * bounded by distinct blocks; only (block, id, text) tuples shuffle;
    * the kernel runs inside the block equi-join — cost is linear in
    * Σ(block candidate size × block dirty size), each factor ≤ maxBlock
    * on the candidate side.
    */
  def blockedBestMatch(dirty: DataFrame, dirtyIdCol: String,
                       dirtyTextCol: String, cands: DataFrame,
                       candIdCol: String, candTextCol: String,
                       blockCol: String, minScore: Double = 0.9,
                       maxBlock: Int = DefaultMaxBlock): DataFrame = {
    import graft.expressions.JaroWinkler.jaroWinklerF
    val d = dirty.select(col(dirtyIdCol).as("dirty_id"),
      col(dirtyTextCol).as("__dtxt"), col(blockCol).as("__blk"))
    val c0 = cands.select(col(candIdCol).cast("long").as("__cid"),
      col(candTextCol).as("__ctxt"), col(blockCol).as("__blk"))
    val c =
      if (maxBlock <= 0) c0.withColumn("__capped", lit(false))
      else {
        // three consumers (stats + both routes) — materialize once
        val cc = c0.localCheckpoint(false)
        val hot = cc.groupBy(col("__blk")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBlock).select(col("__blk"))
        val small = cc.join(hot, Seq("__blk"), "left_anti")
          .withColumn("__capped", lit(false))
        // k-bounded per-block selection of the maxBlock smallest ids:
        // score is a CONSTANT, so the aggregator's exact Long id-asc
        // tie-break does the whole selection — precision-safe for any
        // id range (a -id-as-double score would collide above 2^53);
        // partial buffers stay ≤ maxBlock per (partition, block) — no
        // full-block sort lands on one reducer
        val keep = TopK.topKPerKeyAgg(
            cc.join(hot, Seq("__blk"), "left_semi"),
            Seq(col("__blk")), lit(0.0), col("__cid"),
            maxBlock)
          .select(col("__blk"), col("id").as("__cid"))
        val trimmedFull = cc.join(keep, Seq("__blk", "__cid"), "left_semi")
          .withColumn("__capped", lit(true))
        small.unionByName(trimmedFull)
      }
    d.join(c, Seq("__blk"))
      .withColumn("__jw",
        round(jaroWinklerF(col("__dtxt"), col("__ctxt")), 6) + lit(0.0))
      .filter(col("__jw") >= minScore)
      .groupBy(col("dirty_id"))
      .agg(max(struct(col("__jw").as("jw"), (-col("__cid")).as("nid")))
          .as("__mx"),
        max(col("__capped")).as("capped"))
      .select(col("dirty_id"), (-col("__mx.nid")).as("best_id"),
        col("__mx.jw").as("best_jw"), col("capped"))
  }

  /** Embedding drift between two corpus snapshots: per-label centroid
    * cosine — the monitoring number that catches a silently retrained /
    * re-quantized / corrupted embedder before it poisons an index
    * rebuild (centroids shift first; individual vectors are noisy).
    *
    * Each snapshot reduces to LABELS × DIM micro-unit integers (one
    * map-side-combined avg per (label, pos) — the corpora never join
    * row-to-row), then the cosine runs on the tiny centroid tables:
    * micro-unit products summed as exact BIGINTs (order-proof,
    * engine-exact), one rounded double division at the end. Labels
    * present in only one snapshot are dropped (inner join) — they are
    * coverage drift, not direction drift. Returns (label, cosine,
    * drift = 1 − cosine).
    */
  def embeddingDrift(snapA: DataFrame, snapB: DataFrame, labelCol: String,
                     vecCol: String): DataFrame = {
    def centroids(df: DataFrame): DataFrame = df
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x").cast("double")) * 1e6).cast("long").as("m"))
    val a = centroids(snapA).withColumnRenamed("m", "ma")
    val b = centroids(snapB).withColumnRenamed("m", "mb")
    a.join(b, Seq("label", "pos"))
      .groupBy(col("label"))
      .agg(sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("na"),
        sum(col("mb") * col("mb")).as("nb"))
      .withColumn("cosine", round(col("dot").cast("double")
        / sqrt(col("na").cast("double")) / sqrt(col("nb").cast("double")), 6))
      .select(col("label"), col("cosine"),
        round(lit(1.0) - col("cosine"), 6).as("drift"))
  }

  /** Cluster-purity evaluation against ground-truth labels — the
    * standard external clustering metric (purity = fraction of a
    * cluster's members sharing its majority label): per cluster,
    * (n, top_label, n_top, purity 4 dp). Majority ties break to the
    * SMALLEST label so both engines agree deterministically.
    *
    * Scale shape: one (cluster, label) count aggregate — bounded by
    * clusters × labels, not members — then a per-cluster min(struct)
    * argmax over that bounded table. Nothing corpus-sized survives the
    * first map-side-combined shuffle.
    */
  def clusterPurity(assigned: DataFrame, clusterCol: String,
                    labelCol: String): DataFrame = {
    val counts = assigned
      .groupBy(col(clusterCol), col(labelCol).cast("long").as("__lab"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(clusterCol))
      .agg(sum(col("__c")).as("n"),
        // min(struct(-count, label)): max count, ties to smallest label
        min(struct((-col("__c")).as("__nc"), col("__lab").as("__l")))
          .as("__top"))
      .select(col(clusterCol), col("n"),
        col("__top.__l").as("top_label"),
        (-col("__top.__nc")).as("n_top"),
        (round((-col("__top.__nc")).cast("double") / col("n"), 4) + lit(0.0))
          .as("purity"))
  }

  /** Per-group LEXICAL drift between two corpus snapshots: add-1-smoothed
    * unigram KL(new‖old) over the OLD snapshot's global top-`topN` vocab
    * — the cheap early-warning sibling of [[embeddingDrift]] (vocabulary
    * shifts show up before embedding centroids move, and this needs no
    * embedding at all).
    *
    * Exactness: each word's KL term quantizes independently to nano
    * units — round(p_new·ln(p_new/p_old)·10⁹) — and the per-group sum is
    * then an exact integer reduction, so summation order can't drift the
    * total (ln ULP risk only, the zipf/flesch discipline).
    *
    * Scale shape: the vocab is a bounded driver literal; both snapshots
    * fold to (group, word) map-side counts restricted to the vocab; the
    * term table is groups × topN — bounded — so every downstream step is
    * driver-cheap. Corpus text is scanned once per snapshot.
    */
  /** Two-sample KOLMOGOROV–SMIRNOV drift test on an integer-valued
    * metric column — the distribution-shape monitor completing the
    * drift family ([[embeddingDrift]] watches centroids,
    * [[lexicalDrift]] vocabulary; this watches any scalar quality
    * metric: doc length, token count, quality score). D = max |F_a −
    * F_b| over the pooled support, computed EXACTLY: per-value counts,
    * one ordered cumulative pass, and the max of |cumA·n_b − cumB·n_a|
    * in DECIMAL(38,0) (counts up to 10¹² keep the cross-product exact
    * where a long would overflow) — D is then one division, and the
    * α = 0.05 decision (c = 1.358, Smirnov's asymptotic) is made on the
    * ROUNDED statistic both engines print.
    *
    * Scale shape: two count aggregations (map-side combined), a
    * full-outer merge on value, ONE window pass over the DISTINCT
    * value grid — state bounded by the metric's support, not the row
    * count (quantize real-valued metrics first; doc metrics are
    * integers already). Returns one row: (n_a, n_b, ks, ks_stat,
    * reject).
    */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val ca = a.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("__na"))
    val cb = b.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("__nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("__ca", sum(col("__na")).over(w).cast("decimal(38,0)"))
      .withColumn("__cb", sum(col("__nb")).over(w).cast("decimal(38,0)"))
    // totals first (two longs to the driver), then the exact D pass
    val tot = merged.agg(sum(col("__na")), sum(col("__nb"))).head
    val (nA, nB) = (tot.getLong(0), tot.getLong(1))
    require(nA > 0 && nB > 0, s"both sides need rows, got $nA / $nB")
    val dRow = cum.agg(max(abs(
      col("__ca") * lit(nB).cast("decimal(38,0)") -
        col("__cb") * lit(nA).cast("decimal(38,0)"))).as("d")).head
    // the division happens in DOUBLE on both engines (D and n_a·n_b are
    // exact below 2^53 at any realistic support size) — identical IEEE
    // quotient, then the same HALF_UP rounding
    val d = BigDecimal(dRow.getDecimal(0)).toDouble
    val ks = java.math.BigDecimal.valueOf(
        d / (nA.toDouble * nB.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val stat = java.math.BigDecimal.valueOf(
        ks * math.sqrt(nA.toDouble * nB.toDouble / (nA.toDouble + nB.toDouble)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val spark = a.sparkSession
    import spark.implicits._
    Seq((nA, nB, ks + 0.0, stat + 0.0, if (stat > 1.358) 1 else 0))
      .toDF("n_a", "n_b", "ks", "ks_stat", "reject")
  }

  /** POPULATION STABILITY INDEX — the binned drift score ML monitoring
    * dashboards standardize on (banking/model-risk lineage): PSI =
    * Σ_bins (p_a − p_b)·ln(p_a/p_b) with the conventional read
    * < 0.1 stable, 0.1–0.25 moderate shift, ≥ 0.25 shifted. The
    * directional complement to [[ksDrift]]: KS finds the worst single
    * CDF gap, PSI integrates shift across all bins.
    *
    * Values quantize into the caller's `bins` (ascending upper-
    * inclusive boundaries + one overflow bin); Laplace add-1 smoothing
    * keeps empty bins finite and deterministic. Each bin's term
    * quantizes to integer NANO-units before summing (the
    * [[lexicalDrift]] KL discipline — ln ULP risk confined per-term),
    * so the sum is order-independent and oracle-replicable. State is
    * B-bounded everywhere. Returns one row:
    * (n_a, n_b, psi, band).
    */
  def psiDrift(a: DataFrame, b: DataFrame, valueCol: String,
               bins: Seq[Long]): DataFrame = {
    require(bins.nonEmpty && bins.size <= 256,
      s"need 1..256 bin boundaries, got ${bins.size}")
    require(bins == bins.sorted && bins.distinct.size == bins.size,
      "bin boundaries must be strictly ascending")
    val bCount = bins.size + 1
    def binOf(c: Column): Column =
      bins.zipWithIndex.foldRight(lit(bCount - 1): Column) {
        case ((up, i), acc) => when(c <= up, i).otherwise(acc)
      }
    def counts(df: DataFrame): Map[Int, Long] = df
      .groupBy(binOf(col(valueCol).cast("long")).as("__b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ca = counts(a)
    val cb = counts(b)
    val nA = ca.values.sum
    val nB = cb.values.sum
    require(nA > 0 && nB > 0, s"both sides need rows, got $nA / $nB")
    // bounded per-bin terms: the whole computation is B-sized, so it
    // finishes driver-side on exact longs — no job, no ordering hazard
    val sumNano = (0 until bCount).map { i =>
      val pa = (ca.getOrElse(i, 0L) + 1.0) / (nA + bCount)
      val pb = (cb.getOrElse(i, 0L) + 1.0) / (nB + bCount)
      math.round((pa - pb) * math.log(pa / pb) * 1e9)
    }.sum
    val psi = java.math.BigDecimal.valueOf(sumNano.toDouble / 1e9)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val band =
      if (psi < 0.1) "stable" else if (psi < 0.25) "moderate" else "shifted"
    val spark = a.sparkSession
    import spark.implicits._
    Seq((nA, nB, psi + 0.0, band)).toDF("n_a", "n_b", "psi", "band")
  }

  /** RELIABILITY DIAGRAM + expected calibration error — the standard
    * audit for any confidence-thresholded filter (quality classifiers
    * gate corpora on `conf > t`; if conf is miscalibrated the threshold
    * means nothing). Rows land in `nBins` equal-width confidence bins;
    * each bin reports its size, mean confidence, and empirical accuracy
    * (the label mean), and every row carries the dataset-level ECE =
    * Σ_b (n_b/N)·|acc_b − conf_b| computed from the same rounded
    * per-bin means the rows display (no hidden higher-precision value
    * can disagree with the table a human reads).
    *
    * Integer-exact: confidences quantize to micro-units at entry, bin
    * means re-quantize (the micro-mean discipline), the ECE numerator
    * sums n_b·|Δmicro| exactly in DECIMAL(38,0), one division at the
    * end. State is nBins-bounded. Confidence outside [0, 1] or a
    * non-0/1 label throws — a silent clamp would fake calibration.
    * Returns (bin, n, mean_conf, acc, ece) rows, bin ascending.
    */
  def reliabilityReport(df: DataFrame, confCol: String, labelCol: String,
                        nBins: Int = 10): DataFrame = {
    require(nBins >= 1 && nBins <= 1000, s"need 1..1000 bins, got $nBins")
    val conf = col(confCol).cast("double")
    val lab = col(labelCol).cast("long")
    val checked = df.select(
      when(conf.isNull || conf < 0.0 || conf > 1.0,
        raise_error(concat(lit("confidence outside [0,1]: "),
          conf.cast("string")))).otherwise(conf).as("__cf"),
      when(lab.isNull || (lab =!= 0L && lab =!= 1L),
        raise_error(concat(lit("label must be 0/1, got "),
          lab.cast("string")))).otherwise(lab).as("__y"))
    val binned = checked.select(
      least(floor(col("__cf") * nBins).cast("int"), lit(nBins - 1)).as("bin"),
      round(col("__cf") * 1e6, 0).cast("long").as("__c6"), col("__y"))
    val perBin = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__c6")).as("__sc"),
        sum(col("__y")).as("__sy"))
      .select(col("bin"), col("n"),
        round(round(col("__sc").cast("double") / 1e6 / col("n"), 6) * 1e6, 0)
          .cast("long").as("__cm6"),
        round(round(col("__sy").cast("double") / col("n"), 6) * 1e6, 0)
          .cast("long").as("__am6"))
      .localCheckpoint(true)
    val tot = perBin.agg(
      sum(col("n")).as("__N"),
      sum(abs(col("__cm6") - col("__am6")).cast("decimal(38,0)") *
        col("n").cast("decimal(38,0)")).as("__num")).head
    val n = tot.getLong(0)
    val ece = java.math.BigDecimal.valueOf(
        BigDecimal(tot.getDecimal(1)).toDouble / n / 1e6)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    perBin.select(col("bin"), col("n"),
      (round(col("__cm6").cast("double") / 1e6, 6) + lit(0.0)).as("mean_conf"),
      (round(col("__am6").cast("double") / 1e6, 6) + lit(0.0)).as("acc"),
      lit(ece + 0.0).as("ece"))
  }

  /** EMBEDDING-level train/eval decontamination — the semantic twin of
    * the exact n-gram decontamination pass (`q_decontaminate`): flag
    * every training document whose embedding is cosine-≥-`tau` close to
    * ANY benchmark/eval document, so paraphrased or lightly-edited eval
    * leakage (which exact n-gram matching misses by construction) is
    * caught before training. Output: one row per contaminated train doc
    * — (train_id, eval_id, score) with its single BEST eval match
    * (score desc, eval_id asc — a total order).
    *
    * Scale shape: the eval set is benchmark-sized (thousands), the train
    * side is the 100 TB corpus — so eval BROADCASTS and train never
    * self-joins. Train rows assign to IVF cells once (broadcast
    * centroids, the `ivfAssign` 6-dp argmax); each eval vector probes
    * its `nProbes` nearest cells; candidates are structurally
    * (train ∩ probed cells) via the cell equi-join; the exact cosine
    * verify and the k-bounded best-match aggregation touch only
    * candidates. Per-train-doc reduction through `topKPerKeyAgg` — the
    * exchange carries at most one (score, eval_id) per train doc, never
    * the candidate set.
    *
    * Contract note (the ANN trade, declared): a contaminated pair whose
    * train doc lands outside all of its eval doc's probed cells is
    * missed — recall follows the probe count exactly as in IVF search
    * (`probeRecallSweep` measures it). `tau` membership is decided on
    * the 6-dp-quantized score (the engine-wide convention).
    */
  def semanticDecontaminate(train: DataFrame, trainIdCol: String,
                            trainVecCol: String, evalDf: DataFrame,
                            evalIdCol: String, evalVecCol: String,
                            centroids: DataFrame, centIdCol: String,
                            centVecCol: String, nProbes: Int,
                            tau: Double): DataFrame = {
    require(nProbes >= 1, s"nProbes must be >= 1, got $nProbes")
    val assigned = Ann.ivfAssign(train, centroids, trainIdCol, trainVecCol,
        centIdCol, centVecCol)
      .select(col(trainIdCol).cast("long").as("train_id"),
        col("cell_id").cast("long").as("cell_id"),
        col(trainVecCol).as("__tv"))
    val q = evalDf.select(col(evalIdCol).cast("long").as("__eid"),
      col(evalVecCol).as("__ev"))
    val pw = Window.partitionBy(col("__eid"))
      .orderBy(col("__c").desc, col(centIdCol))
    val probes = centroids
      .crossJoin(broadcast(q))
      .withColumn("__c", round(V.cosine(col(centVecCol), col("__ev")), 6))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbes)
      .select(col("__eid"), col("__ev"),
        col(centIdCol).cast("long").as("cell_id"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .withColumn("score",
        round(V.cosine(col("__tv"), col("__ev")), 6) + lit(0.0))
      .filter(col("score") >= tau)
    TopK.topKPerKeyAgg(scored, Seq(col("train_id")), col("score"),
        col("__eid"), 1)
      .select(col("train_id"), col("id").as("eval_id"), col("score"))
  }

  def lexicalDrift(oldDocs: DataFrame, newDocs: DataFrame, groupCol: String,
                   textCol: String, topN: Int = 100): DataFrame = {
    val vocab: Seq[String] = oldDocs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(topN)
      .collect().map(_.getString(0)).toSeq
    val v = vocab.size
    val vLit = typedLit(vocab)

    def counts(df: DataFrame, c: String): DataFrame = df
      .select(col(groupCol).as("g"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(array_contains(vLit, col("w")))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as(c))

    val grid = oldDocs.select(col(groupCol).as("g")).distinct()
      .crossJoin(broadcast(
        oldDocs.sparkSession.createDataFrame(
          vocab.map(Tuple1(_))).toDF("w")))
    val joined = grid
      .join(counts(oldDocs, "co"), Seq("g", "w"), "left")
      .join(counts(newDocs, "cn"), Seq("g", "w"), "left")
      .select(col("g"), col("w"),
        coalesce(col("co"), lit(0L)).as("co"),
        coalesce(col("cn"), lit(0L)).as("cn"))
    val tot = joined.groupBy(col("g"))
      .agg(sum(col("co")).as("no"), sum(col("cn")).as("nn"))
    val pn = (col("cn") + 1).cast("double") / (col("nn") + v).cast("double")
    val po = (col("co") + 1).cast("double") / (col("no") + v).cast("double")
    joined.join(broadcast(tot), Seq("g"))
      .select(col("g"),
        round(pn * log(pn / po) * 1e9).cast("long").as("term"))
      .groupBy(col("g"))
      .agg(sum(col("term")).as("kl_nano"))
      .select(col("g").as(groupCol), lit(v.toLong).as("n_vocab"),
        col("kl_nano"))
  }
}
