package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
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

  /** Per-group trigram counts: (groupCol, tri, cnt) — one per-group model
    * per distinct group value (CCNet trains one KenLM per LANGUAGE). Still
    * bounded: ≤ |groups| · 50k rows, so the model table always broadcasts
    * for any realistic language set.
    */
  def trainBy(docs: DataFrame, textCol: String, groupCol: String): DataFrame =
    docs.select(col(groupCol), explode(trigrams(col(textCol))).as("tri"))
      .groupBy(col(groupCol), col("tri")).agg(count(lit(1)).as("cnt"))

  /** CCNet perplexity bucketing (Wenzek et al. 2020 §4.3): train one LM per
    * language on an in-domain REFERENCE corpus (CCNet: Wikipedia; here any
    * `ref` frame sharing `textCol`/`groupCol`), score every document, then
    * split each language at its own 33rd/66th perplexity percentiles into
    * head / middle / tail — `kept` drops the tail, CCNet's default gate.
    * Returns (idCol, groupCol, n_tri, nll, bucket, kept) for every doc
    * with ≥ 1 trigram in a group the reference covers (a language with no
    * reference LM is unscorable and omitted, CCNet's unknown-lang drop).
    *
    * Scale shape: the per-group model and the per-group (total, V) stats
    * are bounded (≤ |langs| · 50k rows) and broadcast, so scoring is a
    * map-side probe + one (doc, partial-sum) shuffle; the tercile
    * boundaries come from the mergeable KLL sketch per group (exact below
    * capacity — quantile_disc semantics, `q_group_quantiles` discipline)
    * and broadcast back, so bucket assignment is a scan-speed map. The
    * corpus never sorts and never shuffles text. Per-trigram log-probs are
    * integer micro-units, nll is round-4, and the tercile compare runs on
    * integer ten-thousandths — every step cross-engine exact
    * (`q_ppl_buckets`).
    */
  /** Interpolated KNESER-NEY scoring (Kneser & Ney 1995; Chen & Goodman
    * 1999's interpolated variant — the smoothing KenLM implements and
    * CCNet actually ships, where [[score]]'s add-one is the teaching
    * simplification): per-doc mean nll under a char-trigram KN model
    * with fixed discount D = 0.75 and CONTINUATION-count lower orders —
    * "how many contexts does this char complete" rather than raw
    * frequency, the distinction that stops high-count-but-single-context
    * grams (the "San Francisco" effect) from dominating backoff mass.
    *
    * Three quantized levels, every stored value round-6 (the micro-unit
    * discipline — both engines derive identical doubles from identical
    * integer counts through identical expression trees):
    *   pc(c)      = round(N1+(··c) / N, 6)
    *   pmid(b,c)  = round(max(N1+(·bc)−D,0)/N1+(·b·)
    *                      + (D·|{c: ·bc seen}|/N1+(·b·))·pc(c), 6)
    *   ptri(abc)  = round(max(c3−D,0)/c2(ab·) + lam(ab)·pmid(b,c), 6)
    *   lam(ab)    = round(D·N1+(ab·)/c2(ab·), 6)
    * Unseen fallbacks (contract, KenLM's backoff-weight-1 shape): seen
    * ab → round(lam·pmid, 6); unseen ab → pmid; unseen (b,c) but seen
    * b → round(fb·pc, 6) with fb = round(D·|{c}|/N1+(·b·), 6); unseen
    * b → pc; unseen c → round(1/(2N), 6). Per-trigram
    * lp = round(ln(p),6)·10⁶ integer micro, doc sums exact.
    *
    * Scale shape identical to [[score]]: every model table is bounded
    * by the alphabet (≤ 37³ rows) and broadcasts; scoring is ONE corpus
    * explode probed by five broadcast joins + a per-doc partial sum.
    * Returns (idCol, n_tri, nll) for docs with ≥ 1 trigram.
    */
  def knScore(docs: DataFrame, ref: DataFrame, idCol: String,
              textCol: String): DataFrame = {
    val D = 0.75
    val tri3 = train(ref, textCol).localCheckpoint(false)
    val n = tri3.count()
    require(n > 0L, "knScore: reference corpus has no trigrams")
    val a = substring(col("tri"), 1, 1)
    val b = substring(col("tri"), 2, 1)
    val c = substring(col("tri"), 3, 1)
    val uni = tri3.groupBy(c.as("__c"))
      .agg(count(lit(1)).as("__n1c"))
      .select(col("__c"), round(col("__n1c").cast("double") / n, 6).as("__pc"))
    val midCtx = tri3.groupBy(b.as("__b"))
      .agg(count(lit(1)).as("__nb"))                       // N1+(·b·)
    val nbTypes = tri3.select(b.as("__b"), c.as("__c")).distinct()
      .groupBy(col("__b")).agg(count(lit(1)).as("__nbt"))  // |{c: ·bc}|
    val fbT = midCtx.join(nbTypes, Seq("__b"))
      .select(col("__b"),
        round(lit(D) * col("__nbt") / col("__nb"), 6).as("__fb"))
    val mid = tri3.groupBy(b.as("__b"), c.as("__c"))
      .agg(count(lit(1)).as("__n1bc"))                     // N1+(·bc)
      .join(midCtx, Seq("__b")).join(nbTypes, Seq("__b"))
      .join(uni, Seq("__c"))
      .select(col("__b"), col("__c"),
        round(greatest(col("__n1bc") - lit(D), lit(0.0)) / col("__nb") +
          lit(D) * col("__nbt") / col("__nb") * col("__pc"), 6).as("__pmid"))
    val ctx2 = tri3.groupBy(a.as("__a"), b.as("__b"))
      .agg(sum(col("cnt")).as("__tot3"), count(lit(1)).as("__n1ab"))
      .select(col("__a"), col("__b"), col("__tot3"),
        round(lit(D) * col("__n1ab") / col("__tot3"), 6).as("__lam"))
    val midR = mid.select(col("__b").as("__mb"), col("__c").as("__mc"),
      col("__pmid"))
    val lpT = tri3
      .join(ctx2, a === col("__a") && b === col("__b"))
      .join(midR, b === col("__mb") && c === col("__mc"))
      .select(col("tri"),
        round(round(log(round(greatest(col("cnt") - lit(D), lit(0.0)) /
            col("__tot3") +
          col("__lam") * col("__pmid"), 6)), 6) * 1000000)
          .cast("long").as("__lp"))
    val pcUnseen = math.floor(1.0 / (2.0 * n) * 1e6 + 0.5) / 1e6
    val g = docs
      .select(col(idCol), explode(trigrams(col(textCol))).as("tri"))
      .select(col(idCol), col("tri"), a.as("__ga"), b.as("__gb"),
        c.as("__gc"))
    val joined = g
      .join(broadcast(lpT), Seq("tri"), "left")
      .join(broadcast(ctx2.select(col("__a").as("__ga"),
        col("__b").as("__gb"), col("__lam"))), Seq("__ga", "__gb"), "left")
      .join(broadcast(mid.select(col("__b").as("__gb"),
        col("__c").as("__gc"), col("__pmid"))), Seq("__gb", "__gc"), "left")
      .join(broadcast(fbT.select(col("__b").as("__gb"), col("__fb"))),
        Seq("__gb"), "left")
      .join(broadcast(uni.select(col("__c").as("__gc"), col("__pc"))),
        Seq("__gc"), "left")
    val pcEff = coalesce(col("__pc"), lit(pcUnseen))
    val pmidEff = coalesce(col("__pmid"),
      when(col("__fb").isNotNull, round(col("__fb") * pcEff, 6))
        .otherwise(pcEff))
    val pFallback = when(col("__lam").isNotNull,
      round(col("__lam") * pmidEff, 6)).otherwise(pmidEff)
    val lpEff = coalesce(col("__lp"),
      round(round(log(pFallback), 6) * 1000000).cast("long"))
    joined.select(col(idCol), lpEff.as("__lpe"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"), sum(col("__lpe")).as("__s"))
      .select(col(idCol), col("n_tri"),
        (round((-col("__s")).cast("double") / 1000000.0 /
          col("n_tri").cast("double"), 4) + lit(0.0)).as("nll"))
  }

  /** EXCESS-perplexity data selection (the RHO-1 / DoReMi excess-loss
    * move, Lin et al. 2024, at corpus granularity): score every document
    * under TWO LMs — a GENERAL model trained on the whole corpus and a
    * DOMAIN model trained on the in-domain reference slice — and rank by
    * excess = nll_general − nll_domain. High excess means the domain
    * model explains the document far better than the corpus-wide model
    * does: in-domain signal the general distribution hasn't absorbed,
    * exactly what a targeted data mix wants more of. Ranking by a
    * DIFFERENCE also cancels the length/vocabulary bias both absolute
    * perplexities share — the failure mode of plain ppl filtering, which
    * systematically keeps short formulaic text.
    *
    * Selection keeps documents with excess ≥ the corpus median
    * (`keepFrac = 0.5`; any quantile via the arg). Like [[pplBuckets]]
    * the threshold comes from the mergeable KLL sketch (exact below
    * capacity — quantile_disc semantics), computed on integer
    * ten-thousandths so the compare is cross-engine exact.
    *
    * Scale shape: two bounded model broadcasts (≤ ~50k trigram rows
    * each), one scoring pass shuffling (doc, partial-sum) rows per
    * model — the corpus is scanned, never sorted; the median is one
    * sketch row back to the driver. Returns (idCol, n_tri, nll_gen,
    * nll_dom, excess4, kept) for every doc with ≥ 1 trigram; excess4 is
    * integer ten-thousandths.
    */
  def excessSelect(docs: DataFrame, ref: DataFrame, idCol: String,
                   textCol: String, keepFrac: Double = 0.5,
                   sketchCap: Int = 8192): DataFrame = {
    require(keepFrac > 0.0 && keepFrac < 1.0,
      s"keepFrac must be in (0,1), got $keepFrac")
    // one corpus pass per COUNT table (localCheckpoint pins the bounded
    // ≤ ~37³-row result so stats + broadcast don't re-scan the corpus),
    // then BOTH models probe a SINGLE scoring explode — 3 corpus-scale
    // passes total where the naive twice-through-`score` shape takes 6
    def micro(p: Column): Column =
      round(round(log(p), 6) * 1000000).cast("long")
    def modelOf(counts: DataFrame, lpName: String): (DataFrame, Column) = {
      val st = counts.agg(sum(col("cnt")), count(lit(1))).head
      require(!st.isNullAt(0),
        "excessSelect: a model side has no trainable trigrams")
      val tv = st.getLong(0).toDouble + st.getLong(1).toDouble
      (counts.select(col("tri"),
        micro((col("cnt").cast("double") + 1.0) / lit(tv)).as(lpName)),
        micro(lit(1.0) / lit(tv)))
    }
    val (mGen, uGen) = modelOf(train(docs, textCol).localCheckpoint(false), "__lpg")
    val (mDom, uDom) = modelOf(train(ref, textCol).localCheckpoint(false), "__lpd")
    val scored = docs
      .select(col(idCol), explode(trigrams(col(textCol))).as("tri"))
      .join(broadcast(mGen), Seq("tri"), "left")
      .join(broadcast(mDom), Seq("tri"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"),
        sum(coalesce(col("__lpg"), uGen)).as("__sg"),
        sum(coalesce(col("__lpd"), uDom)).as("__sd"))
      .select(col(idCol), col("n_tri"),
        (round((-col("__sg")).cast("double") / 1000000.0 /
          col("n_tri").cast("double"), 4) + lit(0.0)).as("nll_gen"),
        (round((-col("__sd")).cast("double") / 1000000.0 /
          col("n_tri").cast("double"), 4) + lit(0.0)).as("nll_dom"))
      .withColumn("excess4",
        (round(col("nll_gen") * 10000) -
          round(col("nll_dom") * 10000)).cast("long"))
    val q = f"${1.0 - keepFrac}%.6f" // keep the TOP keepFrac by excess
    val sketch = udaf(
      new QuantileSketch.KllQuantilesAgg(sketchCap, Seq(q)),
      Encoders.scalaDouble)
    val bound = scored
      .agg(sketch(col("excess4").cast("double")).as("__qv"))
      .select(element_at(col("__qv"), 1).cast("long")).head.getLong(0)
    scored.select(col(idCol), col("n_tri"), col("nll_gen"), col("nll_dom"),
      col("excess4"), (col("excess4") >= bound).as("kept"))
  }

  def pplBuckets(docs: DataFrame, ref: DataFrame, idCol: String,
                 textCol: String, groupCol: String,
                 sketchCap: Int = 8192): DataFrame = {
    val counts = trainBy(ref, textCol, groupCol)
    val stats = counts.groupBy(col(groupCol))
      .agg(sum(col("cnt")).cast("double").as("__total"),
        count(lit(1)).cast("double").as("__v"))
    def micro(p: Column): Column =
      round(round(log(p), 6) * 1000000).cast("long")
    val model = counts.join(stats, Seq(groupCol))
      .select(col(groupCol), col("tri"),
        micro((col("cnt").cast("double") + 1.0) /
          (col("__total") + col("__v"))).as("__lp"))
    val unseen = stats.select(col(groupCol),
      micro(lit(1.0) / (col("__total") + col("__v"))).as("__ulp"))
    val scored = docs
      .select(col(idCol), col(groupCol),
        explode(trigrams(col(textCol))).as("tri"))
      .join(broadcast(model), Seq(groupCol, "tri"), "left")
      .join(broadcast(unseen), Seq(groupCol))
      .groupBy(col(idCol), col(groupCol))
      .agg(count(lit(1)).as("n_tri"),
        sum(coalesce(col("__lp"), col("__ulp"))).as("__s"))
      .select(col(idCol), col(groupCol), col("n_tri"),
        (round((-col("__s")).cast("double") / 1000000.0 /
          col("n_tri").cast("double"), 4) + lit(0.0)).as("nll"))
    val n4 = round(col("nll") * 10000).cast("long")
    val sketch = udaf(
      new QuantileSketch.KllQuantilesAgg(sketchCap, Seq("0.33", "0.66")),
      Encoders.scalaDouble)
    val bounds = scored.select(col(groupCol), n4.as("__n4"))
      .groupBy(col(groupCol))
      .agg(sketch(col("__n4").cast("double")).as("__qv"))
      .select(col(groupCol),
        element_at(col("__qv"), 1).cast("long").as("__b33"),
        element_at(col("__qv"), 2).cast("long").as("__b66"))
    scored.join(broadcast(bounds), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("n_tri"), col("nll"),
        when(n4 <= col("__b33"), "head")
          .when(n4 <= col("__b66"), "middle")
          .otherwise("tail").as("bucket"),
        (n4 <= col("__b66")).as("kept"))
  }
}
