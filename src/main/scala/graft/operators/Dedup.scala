package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.ArrayExpressions.sortedIntersectCountF
import graft.expressions.ShingleExpression.shinglesF
import graft.functions.{TextFunctions => T}

/** Near-duplicate detection operators for large-scale training-data
  * pipelines: word-shingle Jaccard, MinHash+LSH banding, and SimHash.
  *
  * Hashes are md5-derived (not Murmur3) so every stage is bit-replicable
  * in the DuckDB oracle; everything is built from codegen'd builtins and
  * higher-order array functions — per-row compute, no shuffle until the
  * LSH bucket join, which shuffles only (band, bucket-hash, id) tuples.
  * At 100 TB the bucket join is the standard LSH self-join: cardinality
  * is bounded by bucket occupancy, and hot buckets (boilerplate dups)
  * should be salted or capped — see `lshCandidatePairs`.
  */
object Dedup {

  /** 60-bit hash from the first 15 hex chars of md5 (fits a signed long;
    * same value as DuckDB's ('0x'||substr(md5(s),1,15))::BIGINT).
    */
  def hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Content-defined chunks of the TrigramLm-normalized text (Rabin
    * rolling-hash boundaries via the native `CdcChunkStarts` kernel,
    * Muthitacharoen et al. 2001 — the LBFS/backup-dedup classic): chunk
    * boundaries depend only on local window content, so an insertion
    * shifts at most the chunks up to the first surviving boundary and
    * everything after re-aligns — the robustness fixed-size chunking
    * lacks, and the third granularity tier between whole-doc
    * fingerprints and 8-token window spans. Returns the chunk STRING
    * array; per-row compute, no shuffle.
    */
  def cdcChunks(text: Column, w: Int = 16, d: Int = 32): Column =
    graft.expressions.CdcExpression.cdcChunksF(text, w, d)

  /** Declarative composition of [[cdcChunks]] — normalize column →
    * starts kernel → HOF slice; its lambda re-evaluates the normalize
    * chain per chunk element (the O(len·chunks) interpreted trap), so
    * it exists for DedupSpec agreement only.
    */
  def cdcChunksHof(text: Column, w: Int = 16, d: Int = 32): Column = {
    val nt = TrigramLm.normalize(text)
    val starts = graft.expressions.CdcExpression.cdcChunkStartsF(nt, w, d)
    val nS = size(starts)
    // sequence(1, 0) would DESCEND — guard the empty-text case
    when(nS === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), nS), k =>
        nt.substr(element_at(starts, k) + 1,
          when(k < nS, element_at(starts, k + 1)).otherwise(length(nt))
            - element_at(starts, k))))
  }

  /** Declarative HOF spec of the `CdcChunkStarts` kernel — recomputes
    * each window hash from scratch (O(len·w)); agreement-tested in
    * DedupSpec, never the hot path. Mirrors the oracle's formulation:
    * Σ code·B^(w−1−j) mod M with precomputed power literals.
    */
  def cdcStartsHof(ntext: Column, w: Int = 16, d: Int = 32): Column = {
    val M = 1000000007L
    val B = 257L
    val pows = Array.iterate(1L, w)(p => p * B % M).reverse // B^(w-1)..B^0
    val n = length(ntext)
    val bounds = filter(sequence(lit(w), greatest(n - 1, lit(w))), p => {
      val h = pows.indices.map(j =>
        ascii(ntext.substr(p - lit(w) + lit(1) + lit(j), lit(1))) *
          lit(pows(j))).reduce(_ + _) % lit(M)
      p <= n - 1 && h % d === d - 1
    })
    when(n === 0, array().cast("array<int>"))
      .when(n <= w, array(lit(0)))
      .otherwise(concat(array(lit(0)), transform(bounds, _.cast("int"))))
  }

  /** Distinct word n-gram shingles, SORTED ascending (binary string order);
    * fewer than n tokens → empty set. Sorting costs O(s log s) once per row
    * and buys the zero-allocation merge intersection in `jaccard` for every
    * pair the row later participates in. All downstream consumers (MinHash
    * min, band hashing of signatures, Jaccard) are order-independent, so
    * the sort is free semantically.
    *
    * Native single-pass kernel (`WordShingles`); `shinglesHof` below is the
    * readable declarative spec, agreement-tested in DedupSpec — the HOF
    * lambda chain evaluates interpreted and cost ~1.5 ms/doc at sf0.1,
    * dominating every dedup query.
    */
  def shingles(text: Column, n: Int): Column = shinglesF(text, n)

  /** Declarative spec for `shingles` (higher-order functions only). */
  def shinglesHof(text: Column, n: Int): Column = {
    val toks = T.tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_sort(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        j => array_join(slice(toks, j + 1, lit(n)), " ")))))
  }

  /** Set Jaccard similarity of two SORTED distinct string-array columns
    * (what `shingles` produces): single merge pass per pair, no per-pair
    * allocation. Agreement with `jaccardHof` is tested in DedupSpec.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = sortedIntersectCountF(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Readable-spec Jaccard over unsorted distinct arrays (hash-set
    * intersection per pair) — the semantic oracle for `jaccard`.
    */
  def jaccardHof(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Containment similarity |A∩B| / |A| — the ASYMMETRIC near-dup
    * measure (Broder 1997's "containment"): ≈1 when A's shingles are a
    * subset of B's, however much longer B is. Catches the
    * subset-duplication Jaccard structurally misses — a wire story
    * embedded in a portal page scores |A∩B|/|A| ≈ 1 but Jaccard
    * |A∩B|/|A∪B| ≈ |A|/|B| → arbitrarily low — which is why dedup
    * pipelines gate on BOTH (Jaccard for mutual near-dups, containment
    * for engulfed copies). Same codegen'd sorted-merge kernel as
    * [[jaccard]].
    */
  def containment(a: Column, b: Column): Column =
    sortedIntersectCountF(a, b).cast("double") / size(a)

  /** Candidate pairs scored by DIRECTED containment: both directions'
    * containment for every candidate pair; rows where either direction
    * clears `threshold`.
    *
    * Candidate generation is NOT MinHash-LSH: band collision probability
    * tracks JACCARD (≈ J^rows per band), so a short doc engulfed in a
    * much longer one — containment ≈ 1, Jaccard ≈ |A|/|B| → arbitrarily
    * low — essentially never collides (the containmentDups spec proves
    * the miss). Instead: a RARE-SHINGLE inverted index, the
    * prefix-filter idea from set-similarity joins (PPJoin family): two
    * docs pair when they share at least one shingle with document
    * frequency in [2, maxDf]. A contained doc shares ALL its shingles
    * with its container, so the pair is proposed unless every one of its
    * shingles is corpus-hot — the documented residual blind spot
    * (boilerplate-only docs; raise `maxDf` or use `duplicatedSpans`).
    *
    * Scale shape: shingles fold to 60-bit hashes before the self-join;
    * the df filter caps every posting list at `maxDf`, so candidate
    * cardinality is bounded by Σ df² over rare shingles (the same
    * hot-bucket discipline as the LSH path) and hot boilerplate shingles
    * generate NO pairs at all. Verify joins ship shingle arrays only for
    * surviving candidate ids.
    */
  def containmentDups(docs: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int = 2, threshold: Double = 0.8,
                      maxDf: Int = 64): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    val sh = docs
      .select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .localCheckpoint(false) // posting build + both verify sides
    val posted = sh.select(col(idCol), explode(col("__sh")).as("__g"))
      .select(col(idCol), hash60(col("__g")).as("__gh"))
    val rare = posted.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2 && col("__df") <= maxDf)
      .select(col("__gh"))
    val indexed = posted.join(rare, Seq("__gh"))
    val cands = indexed.select(col("__gh"), col(idCol).as("id_a"))
      .join(indexed.select(col("__gh"), col(idCol).as("id_b")), Seq("__gh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sha")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__shb")), Seq("id_b"))
      .withColumn("c_ab", round(containment(col("__sha"), col("__shb")), 4) + lit(0.0))
      .withColumn("c_ba", round(containment(col("__shb"), col("__sha")), 4) + lit(0.0))
      .filter(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .select(col("id_a"), col("id_b"), col("c_ab"), col("c_ba"))
  }

  /** Exact deduplication: keep one canonical row (lowest id) per text
    * fingerprint. One hash-shuffle on the 128-bit fingerprint — the
    * cheapest dedup tier of a training-data pipeline; at 100 TB this is a
    * single `HashAggregate` whose key cardinality is the number of DISTINCT
    * documents, with map-side partial aggregation eliminating intra-
    * partition duplicates before the exchange.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = T.fingerprint(col(textCol)).as("__fp")
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("__keep"), count(lit(1)).as("n_copies"))
      .join(df.withColumnRenamed(idCol, "__keep"), Seq("__keep"))
      .withColumnRenamed("__keep", idCol)
      .drop("__fp")
  }

  /** Incremental deduplication — the nightly-snapshot ingest path: dedup
    * a NEW batch within itself (exactDedup semantics: one canonical
    * min-id survivor per fingerprint, n_copies counted) and against an
    * already-ingested corpus, WITHOUT re-deduplicating the corpus.
    *
    * Scale shape: the existing corpus contributes only its DISTINCT
    * 128-bit fingerprints — at 100 TB that side is a pre-aggregated
    * single column (stored snapshots would persist the fingerprint table
    * so corpus text is never re-read), and the left-anti join shuffles
    * 16-byte fingerprints, never text. The within-batch tier is the same
    * single map-side-combined HashAggregate as `exactDedup`. Extends the
    * reference's append-only ingest (`coordinator/main.py:43-56`) with
    * the dedup-on-ingest contract real corpus builds need.
    */
  def incrementalDedup(newBatch: DataFrame, existing: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    val corpusFps = existing
      .select(T.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    exactDedup(newBatch, textCol, idCol)
      .withColumn("__fp", T.fingerprint(col(textCol)))
      .join(corpusFps, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** k-hash MinHash signature: sig[i] = min over shingles of
    * hash60(i + ":" + shingle). Readable HOF spec — the hot path is the
    * bit-identical native `TextHashExpressions.minhashSigF` (agreement
    * tested in DedupSpec).
    */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh,
        x => hash60(concat(i.cast("string"), lit(":"), x)))))

  /** LSH band hashes: md5 of the comma-joined decimal signature slice per
    * band. bands × rowsPerBand must equal the signature length.
    * Native kernel; `bandHashesHof` is the declarative spec
    * (agreement-tested in DedupSpec).
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    graft.expressions.TextHashExpressions.minhashBandsF(sig, bands, rowsPerBand)

  /** Declarative spec for `bandHashes` (HOF only). */
  def bandHashesHof(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => md5(array_join(
        transform(slice(sig, j * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          v => v.cast("string")), ",").cast("binary")))

  /** Default hot-bucket cap for LSH candidate generation. A bucket of m
    * members emits m²/2 pairs; one mass-duplicated boilerplate bucket of
    * m = 10⁶ at corpus scale would emit 5·10¹¹ pairs from a single
    * reducer. 1024 bounds any bucket's pair fan-out to ≤ ~524k while
    * being far above organic bucket sizes (max observed on the fixtures
    * is 4 at sf0.1).
    */
  val DefaultMaxBucket: Int = 1024

  /** Candidate pairs (idA < idB) sharing at least one LSH band bucket.
    * `df` must carry an id column and a band-hash array column.
    *
    * Scale-safe two-pass shape (the cap is ON by default):
    *   1. bucket stats — groupBy (band_idx, band_hash) → (count, min id).
    *      Bounded-memory partial aggregation; no member list is ever
    *      collected for an unbounded bucket.
    *   2a. buckets with 2 ≤ n ≤ maxBucket: collect the member list
    *      (buffer bounded by the cap) and emit all within-bucket pairs.
    *   2b. buckets with n > maxBucket: emit STAR pairs (bucket-min, id)
    *      streaming from a join — linear in m, no collect at all.
    * Only (band_idx, band_hash, id) tuples ever shuffle.
    *
    * The star routing keeps over-cap buckets in the dedup result instead
    * of dropping them: every member stays connected to the bucket's
    * canonical (minimum) id, so downstream union-find / keep-one-drop-rest
    * dedup reaches the same decisions (DedupSpec proves this on a
    * 1000×-duplicated hot-bucket fixture). What is deliberately traded
    * away is the full m²/2 pair ENUMERATION within a pathological bucket —
    * members of such a bucket are near-certain mutual duplicates, which is
    * exactly the exact-dedup tier's territory (`exactDedup`).
    *
    * `maxBucket = 0` disables the cap (small-data exact twin used by the
    * uncapped oracle query).
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, bandsCol: String,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val exploded = df.select(col(idCol),
      posexplode(col(bandsCol)).as(Seq("band_idx", "bh")))
    cappedPairsByKey(exploded, idCol, Seq("band_idx", "bh"), maxBucket)
  }

  /** Candidate pairs (id_a < id_b) sharing at least one bucket KEY — the
    * hot-bucket-capped pair generator behind every pairwise family:
    * MinHash-LSH bands ([[lshCandidatePairs]]), video frame signatures
    * (`Multimodal.frameSigPairs`), audio window signatures. One shared
    * routing, one shared cap discipline.
    *
    * `df` must carry one row per (key, id) with (keyCols, id) distinct —
    * duplicate rows would emit degenerate (x, x) pairs. Routing (cap ON
    * by default, `DefaultMaxBucket`):
    *   1. bucket stats — groupBy keyCols → (count, min id). Bounded-memory
    *      partial aggregation; no member list for an unbounded bucket.
    *   2a. buckets with 2 ≤ n ≤ maxBucket: collect the member list
    *      (buffer bounded by the cap) and emit all within-bucket pairs.
    *   2b. buckets with n > maxBucket: emit STAR pairs (bucket-min, id)
    *      streaming from a join — linear in the bucket size, no collect.
    * Only (keyCols, id) tuples ever shuffle. The capped input is
    * materialized once (localCheckpoint) because three branches consume
    * it — without it every branch re-runs the upstream signature kernels.
    *
    * Star routing keeps over-cap buckets CONNECTED (to the bucket min)
    * instead of dropping them, so component/keep-one dedup reaches the
    * same decisions; what's traded away is full m²/2 pair enumeration
    * inside a pathological bucket. Consumers that re-verify pairs
    * ([[sharedSigPairs]], `nearDupPairs`' Jaccard stage) score star pairs
    * with the TRUE pair statistic, so no fabricated similarity survives.
    * `maxBucket = 0` disables the cap (small-data exact twins).
    */
  def cappedPairsByKey(df: DataFrame, idCol: String, keyCols: Seq[String],
                       maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val kc = keyCols.map(col)
    val keyedPlan = df.select((kc :+ col(idCol)): _*)
    val keyed =
      if (maxBucket <= 0) keyedPlan else keyedPlan.localCheckpoint(false)
    if (maxBucket <= 0) {
      keyed
        .groupBy(kc: _*)
        .agg(collect_list(col(idCol)).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(explode(fullPairs(array_sort(col("ids")))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
    } else {
      val stats = keyed
        .groupBy(kc: _*)
        .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__min_id"))
        .filter(col("__n") >= 2)
      val smallPairs = keyed
        .join(stats.filter(col("__n") <= maxBucket).select(kc: _*),
          keyCols, "left_semi")
        .groupBy(kc: _*)
        .agg(collect_list(col(idCol)).as("ids"))
        .select(explode(fullPairs(array_sort(col("ids")))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      val starPairs = keyed
        .join(stats.filter(col("__n") > maxBucket)
          .select((kc :+ col("__min_id")): _*), keyCols)
        .filter(col(idCol) =!= col("__min_id"))
        .select(col("__min_id").as("id_a"), col(idCol).as("id_b"))
      smallPairs.unionByName(starPairs).distinct()
    }
  }

  /** Verified signature near-dup pairs: (id_a, id_b, n_shared) for every
    * candidate pair sharing ≥ `minShared` signature keys — the
    * generate-then-verify shape `nearDupPairs` uses for text, applied to
    * discrete signatures (video frame sums, audio window sums). Candidates
    * come from [[cappedPairsByKey]] (hot-bucket cap ON by default); the
    * verify join then recomputes the TRUE shared-key count per pair, so a
    * star-routed pair from an over-cap bucket is scored against the same
    * `minShared` contract as an enumerated one — the cap bounds WHICH
    * pairs are examined, never what a reported pair's count means.
    *
    * Cost shape: candidates shuffle as (keyCols, id) tuples; the verify
    * join is |cands| · m² with m = signatures per item (bounded by the
    * upstream sampling rate), never corpus-quadratic. The signature table
    * is materialized once (localCheckpoint) — candidate generation plus
    * both verify sides consume it.
    *
    * What the cap trades away (documented, same as LSH): a true pair
    * whose shared keys ALL sit in over-cap buckets and whose endpoints
    * are both non-min is not examined directly; connectivity is carried
    * by the star pairs to each bucket's min — PROVIDED those star pairs
    * themselves verify at ≥ `minShared`. Two sub-cases:
    *   - coinciding min: every over-cap bucket the pair shares has the
    *     SAME min m. Each endpoint then shares ≥ minShared keys with m,
    *     both star pairs survive the verify, and component decisions
    *     match the uncapped run (DedupSpec pins this on a
    *     1000×-shared-signature fixture).
    *   - different mins: the shared keys sit in over-cap buckets whose
    *     mins DIFFER, and an endpoint shares < minShared keys with each
    *     individual min. Those star pairs fail the verify and the pair's
    *     component can split relative to the uncapped run. This is a
    *     deliberate precision-first trade-off: the alternative — keeping
    *     sub-threshold star pairs for connectivity — would let one
    *     corpus-wide boilerplate key (a station jingle, a black frame)
    *     fuse every item that touches it into a single component at
    *     n_shared = 1, which is catastrophically worse than a rare
    *     split. DedupSpec pins the divergence on a different-min
    *     fixture so the boundary is test-documented.
    */
  def sharedSigPairs(sigs: DataFrame, idCol: String, keyCols: Seq[String],
                     minShared: Int = 2,
                     maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val s = sigs.select((col(idCol) +: keyCols.map(col)): _*)
      .localCheckpoint(false)
    val cands = cappedPairsByKey(s, idCol, keyCols, maxBucket)
    val aS = s.toDF("id_a" +: keyCols.map("__a_" + _): _*)
    val bS = s.toDF("id_b" +: keyCols.map("__b_" + _): _*)
    cands
      .join(aS, Seq("id_a"))
      .join(bS, Seq("id_b"))
      .filter(keyCols.map(c => col("__a_" + c) === col("__b_" + c))
        .reduce(_ && _))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** All (a, b) with a < b from a SORTED id array. */
  private def fullPairs(sorted: Column): Column =
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + 2, greatest(size(sorted) - i - 1, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))

  /** One-call near-duplicate detection: documents in, verified pairs out
    * (id_a < id_b, true shingle Jaccard ≥ threshold). Composes the full
    * MinHash-LSH pipeline — shingle → sign → band → bucket pairs →
    * Jaccard verify — with the shuffles/kernels documented on each stage;
    * `q_minhash_lsh` is the oracle-checked instantiation and
    * `q_minhash_lsh_capped` oracle-checks the hot-bucket routing.
    *
    * The hot-bucket cap is ON by default (`DefaultMaxBucket`) — see
    * `lshCandidatePairs` for the routing semantics; pass `maxBucket = 0`
    * only for small-data exact twins.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleSize: Int = 2, numHashes: Int = 16,
                   bands: Int = 4, threshold: Double = 0.5,
                   maxBucket: Int = DefaultMaxBucket,
                   materializeShingles: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val shPlan = docs.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // The shingle table fans out to THREE consumers (signature stage + both
    // verify-join sides); without materialization each branch re-runs the
    // scan + shingle kernel (~2× whole-pipeline cost, measured at sf0.1).
    // localCheckpoint = executor-local MEMORY_AND_DISK materialization —
    // the single-node stand-in for the cluster-storage checkpoint a 100 TB
    // run would put here.
    val sh = if (materializeShingles) shPlan.localCheckpoint(false) else shPlan
    val withBands = sh
      .withColumn("__sig",
        graft.expressions.TextHashExpressions.minhashSigF(col("__sh"), numHashes))
      .withColumn("__bands", bandHashes(col("__sig"), bands, numHashes / bands))
    val cands = lshCandidatePairs(
      withBands.select(col(idCol), col("__bands")), idCol, "__bands", maxBucket)
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("__shb")), "id_b")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Threshold sweep for near-dup tuning: the Jaccard histogram of ALL
    * LSH candidate pairs (threshold 0) in 0.1-wide buckets, with the
    * running "pairs kept at threshold ≥ bucket-low" count — the one
    * table that picks the dedup threshold from data instead of folklore
    * (a bimodal histogram separates true dups from band-collision
    * noise; the knee is the threshold). Costs ONE signature pass — the
    * same pipeline `nearDupPairs` runs, minus the filter — and the
    * histogram is 10 rows whatever the corpus size. Bucket index is
    * integer-safe: round-4 Jaccard → exact micro-units → integer
    * division (floor(j·10) on raw doubles mis-buckets 0.3·10 =
    * 2.999…96).
    */
  def nearDupThresholdSweep(docs: DataFrame, idCol: String, textCol: String,
                            shingleSize: Int = 2, numHashes: Int = 16,
                            bands: Int = 4,
                            maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val pairs = nearDupPairs(docs, idCol, textCol, shingleSize, numHashes,
      bands, threshold = 0.0, maxBucket)
    val micro = round(col("jaccard") * 10000).cast("long")
    val hist = pairs
      .withColumn("bucket",
        least(floor(micro / lit(1000.0)).cast("long"), lit(9L)))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist
      .withColumn("lo", round(col("bucket") / 10.0, 1))
      .withColumn("n_kept_at_lo", sum(col("n_pairs")).over(w))
      .select(col("bucket"), col("lo"), col("n_pairs"), col("n_kept_at_lo"))
  }

  /** CCNet-style paragraph (line) deduplication: strip from every
    * document the lines that repeat at least `minRepeats` times across
    * the CORPUS — navigation chrome, cookie banners, footers — while
    * keeping each document's unique content in original order. This is
    * the corpus-wide cleaning tier BETWEEN C4's per-page line heuristics
    * and document-level dedup: a line can be locally plausible yet
    * boilerplate because half the crawl carries it.
    *
    * Scale shape: lines fold to 60-bit hashes; the count aggregation is
    * map-side combined (shuffle carries (8-byte hash, partial count));
    * the strip is a left-anti join of the exploded lines against the
    * (rare) frequent-hash set; reassembly is one groupBy(id) whose
    * sort key is the original line position. Returns
    * (idCol, clean, n_kept, n_removed).
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       minRepeats: Long = 3): DataFrame = {
    val id = col(idCol)
    val lines = docs
      .select(id, posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
      .withColumn("__lh", hash60(trim(col("__line"))))
      .localCheckpoint(false) // consumed by the count agg AND the strip join
    val frequent = lines
      .groupBy(col("__lh")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minRepeats)
      .select(col("__lh"))
    val total = lines.groupBy(id).agg(count(lit(1)).as("__tot"))
    val kept = lines.join(frequent, Seq("__lh"), "left_anti")
      .groupBy(id)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")), "\n").as("clean"),
        count(lit(1)).as("n_kept"))
    // left from totals: a doc whose EVERY line is boilerplate still
    // comes back (clean = "", all lines removed)
    total.join(kept, Seq(idCol), "left")
      .select(id,
        coalesce(col("clean"), lit("")).as("clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__tot") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Per-document MinHash signature + LSH band hashes — the columns a
    * corpus SNAPSHOT persists (id, sig, bands; ~(k+bands)·8 bytes per
    * doc) so later crawls can near-dup against the corpus without ever
    * re-reading corpus text. Docs whose shingle set is empty (shorter
    * than the shingle size) carry no signature and are omitted, exactly
    * as in `nearDupPairs`.
    */
  def signatureStore(docs: DataFrame, idCol: String, textCol: String,
                     shingleSize: Int = 2, numHashes: Int = 16,
                     bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // the store's parameters ride along as column METADATA (Spark writes
    // it into the parquet footer, so a reloaded store still carries it):
    // incrementalNearDups requires both sides agree — signatures hashed
    // under different (shingleSize, numHashes, bands) collide only by
    // accident, and the band join would return silent garbage matches
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.shingleSize", shingleSize.toLong)
      .putLong("graft.numHashes", numHashes.toLong)
      .putLong("graft.bands", bands.toLong)
      .build()
    docs.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol),
        graft.expressions.TextHashExpressions
          .minhashSigF(col("__sh"), numHashes).as("sig", md))
      .select(col(idCol), col("sig"),
        bandHashes(col("sig"), bands, numHashes / bands).as("bands", md))
  }

  /** (shingleSize, numHashes, bands) recorded by `signatureStore`, if
    * the frame still carries them (absent on hand-built frames).
    */
  private def sigParams(sigs: DataFrame): Option[(Long, Long, Long)] =
    sigs.schema.find(_.name == "sig").flatMap { f =>
      val m = f.metadata
      if (m.contains("graft.numHashes") && m.contains("graft.bands") &&
          m.contains("graft.shingleSize"))
        Some((m.getLong("graft.shingleSize"), m.getLong("graft.numHashes"),
          m.getLong("graft.bands")))
      else None
    }

  /** Incremental near-duplicate detection — the recurring-crawl path:
    * find new-batch docs that near-duplicate an already-ingested corpus,
    * given only the corpus's persisted `signatureStore` (never its
    * text). Candidates are band-bucket collisions (the join carries
    * (band_idx, 16-byte hash, id) tuples only); verification is the
    * MinHash ESTIMATE of Jaccard — the fraction of agreeing signature
    * positions — computed from the two k-long signatures the store
    * already holds. The estimate's granularity is 1/numHashes, so pick
    * thresholds on that grid; text-true Jaccard for the batch side is
    * available to callers that need it, corpus text by design is not.
    *
    * Returns (batch_id, corpus_id, est_jaccard ≥ threshold).
    */
  def incrementalNearDups(batchSigs: DataFrame, corpusSigs: DataFrame,
                          idCol: String, threshold: Double = 0.5): DataFrame = {
    // schema guard: a store hashed under different parameters would
    // produce silent garbage (band buckets collide only by accident;
    // zip_with over unequal-length signatures null-pads) — fail loudly
    // instead. Hand-built frames without the metadata skip the check.
    (sigParams(batchSigs), sigParams(corpusSigs)) match {
      case (Some(b), Some(c)) =>
        require(b == c,
          s"incrementalNearDups: signature params disagree — batch " +
            s"(shingleSize, numHashes, bands)=$b vs corpus $c; rebuild " +
            "one side with the other's signatureStore parameters")
      case _ => ()
    }
    // NOTE each side is consumed twice (band explode + signature
    // lookup): a parquet-backed store re-reads for free, but a freshly
    // COMPUTED side should be localCheckpoint'd by the caller or its
    // shingle/minhash kernels run once per consumer (~2×, measured).
    val bBands = batchSigs.select(col(idCol).as("batch_id"),
      posexplode(col("bands")).as(Seq("band_idx", "bh")))
    val cBands = corpusSigs.select(col(idCol).as("corpus_id"),
      posexplode(col("bands")).as(Seq("band_idx", "bh")))
    val pairs = bBands.join(cBands, Seq("band_idx", "bh"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
    val est = round(
      size(filter(zip_with(col("__sb"), col("__sc"), (x, y) => x === y),
        b => b)).cast("double") /
        size(col("__sb")).cast("double"), 6) + lit(0.0)
    pairs
      .join(batchSigs.select(col(idCol).as("batch_id"), col("sig").as("__sb")),
        "batch_id")
      .join(corpusSigs.select(col(idCol).as("corpus_id"), col("sig").as("__sc")),
        "corpus_id")
      .withColumn("est_jaccard", est)
      .filter(col("est_jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("est_jaccard"))
  }

  /** Connected components over an undirected pair list (near-dup edges)
    * by iterative min-label propagation: every node starts labeled with
    * itself; each round replaces a node's label with the minimum label in
    * its closed neighborhood; convergence when no label changes. Returns
    * (node, component) where component = the minimum node id reachable —
    * the canonical representative real dedup pipelines keep per duplicate
    * CLUSTER (pairwise greedy "drop id_b" under-merges transitive
    * near-dup chains A≈B≈C where (A,C) was never itself a pair).
    *
    * Scale shape: each round is one join + one groupBy-min over the EDGE
    * list — no per-node adjacency materialization — and labels are
    * localCheckpointed per round (iterative lineage otherwise grows
    * exponentially). Each round ends with a POINTER-JUMP (comp :=
    * comp(comp)), so the effective hop distance doubles per round and
    * rounds needed are O(log diameter), not O(diameter) — a 2²⁰-long
    * chain converges inside the default `maxIters = 20`. The loop exits
    * early on convergence (a driver-side existence probe per round); if
    * `maxIters` is hit first the labels may be UNDER-MERGED, so that case
    * throws rather than silently returning wrong components.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIters)._1

  /** As [[connectedComponents]], also returning the number of propagation
    * rounds actually run — the observable behind the O(log diameter)
    * convergence claim (skew/diameter probes assert on it).
    */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(false)
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .select(col("node"), col("node").as("comp"))
      .localCheckpoint(false)
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("comp")).as("__nmin"))
      val propagated = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("__nmin"), col("comp"))).as("comp"),
          (col("__nmin") < col("comp")).as("__changed"))
      // Pointer-jump: comp := labels(comp). Labels are always node ids,
      // and a node's own label never exceeds itself, so labels(comp) ≤
      // comp — the jump only ever tightens. Jumping through the PREVIOUS
      // round's labels (already materialized) instead of the fresh
      // propagation keeps one materialization per round; the stale table
      // still doubles effective reach, so convergence stays O(log
      // diameter) (DedupSpec's long-chain test pins this down).
      val jumped = propagated.alias("l")
        .join(
          labels.select(col("node").as("__cn"), col("comp").as("__cc")),
          col("l.comp") === col("__cn"), "left")
        .select(col("l.node").as("node"),
          least(col("l.comp"), coalesce(col("__cc"), col("l.comp"))).as("comp"),
          (col("l.__changed") ||
            coalesce(col("__cc") < col("l.comp"), lit(false))).as("__changed"))
        .localCheckpoint(false)
      converged = jumped.filter(col("__changed")).limit(1).isEmpty
      labels = jumped.drop("__changed")
      iters += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds " +
        "(graph diameter > 2^maxIters); labels would be under-merged — " +
        "raise maxIters")
    (labels, iters)
  }

  /** Duplicate-cluster representative selection — the "keep the BEST
    * copy" step real curation pipelines run after clustering (min-id
    * canonicalization keeps an arbitrary copy; quality-aware selection
    * keeps the longest/cleanest one, the variant FineWeb/RefinedWeb-style
    * dedup prefers). Given the doc frame, cluster labels from
    * [[connectedComponents]] ((node, comp) over idCol values), and a
    * per-doc quality column, keeps exactly one doc per cluster — the
    * max-quality member, ties broken to the LOWEST id so selection is
    * deterministic — plus every unclustered doc unchanged.
    *
    * Scale shape: cluster labels cover only docs that near-duplicated
    * something (≪ corpus; the label table is join-key-sized — id + comp
    * longs). Unclustered docs exit via a label anti-join; clustered docs
    * reduce through ONE map-side-combinable max(struct(quality, -id))
    * aggregate whose exchange carries (comp, quality, id) triplets — the
    * winner-id semi-join back is again key-only. Document text never
    * shuffles; no window (a per-cluster row_number would sort-serialize
    * the biggest cluster onto one reducer's sort buffer).
    */
  def keepBestPerCluster(docs: DataFrame, clusters: DataFrame,
                         idCol: String, qualityCol: String): DataFrame = {
    val labels = clusters.select(col("node").as(idCol), col("comp"))
    val winners = docs.select(col(idCol), col(qualityCol))
      .join(labels, Seq(idCol))
      .groupBy(col("comp"))
      .agg(max(struct(col(qualityCol).as("q"), (-col(idCol)).as("nid")))
        .as("__w"))
      .select((-col("__w.nid")).as(idCol))
    docs.join(labels.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(docs.join(winners, Seq(idCol), "left_semi"))
  }

  /** Benchmark decontamination: for every training document, count the
    * word n-grams it shares with a benchmark/eval set (GPT-3 appendix-C
    * style: a training doc is contaminated when it contains any n-gram
    * that also appears in an evaluation document). Returns
    * (idCol, n_overlap) for contaminated docs only.
    *
    * Scale shape: grams are folded to 60-bit hashes BEFORE the join, so
    * the shuffle carries (8-byte hash, id) pairs — never gram strings —
    * and the benchmark side (distinct hashes; eval sets are tiny next to
    * a 100 TB corpus) is broadcast: the contamination check is a
    * map-side-only probe of the corpus scan, zero exchange of the train
    * side beyond the final per-doc count. Both engines join on the same
    * md5-derived hash, so even a collision replicates bit-identically in
    * the oracle (`q_decontaminate`).
    */
  /** Pair-level dedup EVALUATION against a labeled gold set: TP/FP/FN
    * and integer-micro precision/recall/F1 of a predicted duplicate-
    * pair list vs gold pairs — the QA harness that turns "we ran LSH"
    * into "LSH finds 97% of known duplicates at 82% precision", the
    * number a threshold choice is actually justified by (pairs with
    * swapped endpoints count once — both sides canonicalize to
    * (min, max) before comparing).
    *
    * Scale shape: two distinct-pair canonicalizations + one full outer
    * join on the pair key — ids only, never content; output is ONE row.
    */
  def pairEval(pred: DataFrame, gold: DataFrame, aCol: String,
               bCol: String): DataFrame = {
    def canon(df: DataFrame, tag: String): DataFrame =
      df.select(least(col(aCol), col(bCol)).as("__a"),
          greatest(col(aCol), col(bCol)).as("__b"))
        .distinct().withColumn(tag, lit(1))
    canon(pred, "__p").join(canon(gold, "__g"),
        Seq("__a", "__b"), "full_outer")
      .agg(
        count(when(col("__p").isNotNull && col("__g").isNotNull, 1))
          .as("tp"),
        count(when(col("__p").isNotNull && col("__g").isNull, 1)).as("fp"),
        count(when(col("__p").isNull && col("__g").isNotNull, 1)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        expr("(tp * 1000000) div greatest(tp + fp, 1)").as("p_micro"),
        expr("(tp * 1000000) div greatest(tp + fn, 1)").as("r_micro"))
      .withColumn("f1_micro",
        when(col("p_micro") + col("r_micro") === 0L, 0L)
          .otherwise(expr(
            "(2 * p_micro * r_micro) div (p_micro + r_micro)")))
  }

  def contaminationOverlap(train: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           n: Int = 8): DataFrame = {
    val benchHashes = bench
      .select(explode(shingles(col(textCol), n)).as("__g"))
      .select(hash60(col("__g")).as("__gh"))
      .distinct()
    train
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__g"))
      .select(col(idCol), hash60(col("__g")).as("__gh"))
      .join(broadcast(benchHashes), Seq("__gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** N-gram novelty scoring — the inverse of decontamination: for every
    * document, the fraction of its distinct word n-grams ABSENT from a
    * reference corpus (a previous crawl snapshot, a training set). High
    * novelty flags genuinely new content worth ingesting; near-zero
    * novelty flags recombined/templated text and — scored against a
    * model's training set — the memorization candidates (Carlini et al.
    * 2022 measure extraction risk over exactly this n-gram overlap).
    *
    * Scale shape inherited from [[contaminationOverlap]]: grams fold to
    * 60-bit hashes before any join, the reference side broadcasts as a
    * distinct-hash set (swap in the Bloom variant past broadcast size),
    * and the corpus side is a map-side probe + one per-doc count — the
    * corpus never shuffles text. Returns (idCol, n_grams, n_known,
    * novelty) for every doc with ≥ 1 n-gram, novelty quantized 4 dp.
    */
  def noveltyScore(docs: DataFrame, ref: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    val grams = docs
      .select(col(idCol), shingles(col(textCol), n).as("__g"))
      .filter(size(col("__g")) > 0)
    val refSet = ref
      .select(explode(shingles(col(textCol), n)).as("__gram"))
      .select(hash60(col("__gram")).as("__gh"))
      .distinct()
    val known = grams
      .select(col(idCol), explode(col("__g")).as("__gram"))
      .select(col(idCol), hash60(col("__gram")).as("__gh"))
      .join(broadcast(refSet), Seq("__gh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_known"))
    grams.select(col(idCol), size(col("__g")).cast("long").as("n_grams"))
      .join(known, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        (round(lit(1.0) - coalesce(col("n_known"), lit(0L)).cast("double") /
          col("n_grams"), 4) + lit(0.0)).as("novelty"))
  }

  /** Bloom-pre-filtered decontamination: same semantics (and same output)
    * as `contaminationOverlap`, with a Bloom filter over the benchmark
    * n-gram hashes probed map-side BEFORE any exchange of the train side.
    *
    * Why it matters at scale: `contaminationOverlap` broadcasts the
    * benchmark's exact distinct-hash table — at ~10⁹ benchmark n-grams an
    * 8-byte-key hash table is tens of GB with overhead, past broadcast
    * limits. The Bloom bitset is `bitsPerKey` BITS per key (10 bits/key ≈
    * 1.25 GB at 10⁹ keys, ~0.8% FP), so the map-side prune survives when
    * the exact broadcast cannot; only the surviving ~FP + true-overlap
    * fraction of the corpus' grams reaches the exact verify join (a
    * shuffle join on the 8-byte hash — no broadcast on either side).
    * False positives cost only wasted verify-join rows, never wrong
    * answers: the result is bit-identical to the exact operator
    * (DedupSpec proves agreement even at a deliberately FP-heavy
    * 2 bits/key), so the DuckDB oracle is the plain exact-overlap SQL.
    *
    * The benchmark hash set is collected driver-side to build the bitset
    * (eval sets are the small side by contract); the bitset rides in the
    * probe expression — the single-JVM stand-in for a broadcast variable.
    */
  def contaminationOverlapBloom(train: DataFrame, bench: DataFrame,
                                idCol: String, textCol: String,
                                n: Int = 8,
                                bitsPerKey: Int = graft.expressions.BloomExpression.DefaultBitsPerKey,
                                numProbes: Int = graft.expressions.BloomExpression.DefaultNumProbes): DataFrame = {
    import graft.expressions.BloomExpression
    val benchHashes = bench
      .select(explode(shingles(col(textCol), n)).as("__g"))
      .select(hash60(col("__g")).as("__gh"))
      .distinct()
    val bits = BloomExpression.buildBits(
      benchHashes.collect().map(_.getLong(0)), bitsPerKey, numProbes)
    train
      .select(col(idCol), explode(shingles(col(textCol), n)).as("__g"))
      .select(col(idCol), hash60(col("__g")).as("__gh"))
      .filter(BloomExpression.mightContainF(col("__gh"), bits, numProbes))
      .join(benchHashes, Seq("__gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Declarative spec for `expressions.WindowHashes` (HOF only): hash60
    * of every overlapping n-token window, positional, duplicates kept.
    */
  def windowHashesHof(text: Column, n: Int): Column = {
    val toks = T.tokens(text)
    when(size(toks) < n, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        j => hash60(array_join(slice(toks, j + 1, lit(n)), " "))))
  }

  /** Exact duplicated-SPAN detection (the suffix-array dedup family of
    * "Deduplicating Training Data Makes Language Models Better", Lee et
    * al. 2022, re-expressed relationally): a token span is duplicated
    * when some `minLen`-token window of it occurs ≥ `minOccurrences`
    * times in the whole corpus (cross-document or repeated within one
    * document — both are training-data redundancy). Overlapping/adjacent
    * duplicated windows are merged into MAXIMAL spans per document; a
    * window flags tokens [pos, pos+minLen).
    *
    * Returns one row per document that contains at least one duplicated
    * window: (idCol, n_dup_windows, n_spans, dup_tokens, total_tokens,
    * dup_frac) — dup_frac is the fraction of the document's tokens
    * covered by duplicated spans, the per-doc signal a curation pipeline
    * thresholds on (drop, or cut the spans out).
    *
    * Scale shape — this IS the distributed stand-in for a suffix array,
    * which cannot be built across a 100 TB corpus:
    *   1. one native-kernel pass hashes every overlapping window (60-bit
    *      hashes, so the exploded table is (id, pos, 8-byte hash) — never
    *      window text);
    *   2. the exploded table is materialized once (three consumers) and
    *      shuffled once by window hash with map-side partial counts to
    *      find duplicated hashes;
    *   3. duplicated positions come from a shuffle semi-join (the
    *      surviving side is only the duplicated windows — on real
    *      corpora a few % — so the per-doc window merge that follows
    *      sorts a small fraction of the original windows);
    *   4. span merge is one window function partitioned by document —
    *      per-doc state only, any document fits a partition.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      minLen: Int = 8, minOccurrences: Long = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ex = docs
      .select(col(idCol),
        size(T.tokens(col(textCol))).cast("long").as("__tt"),
        posexplode(
          graft.expressions.TextHashExpressions.windowHashesF(col(textCol), minLen))
          .as(Seq("pos", "__h")))
      .localCheckpoint(false)
    val dupH = ex.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minOccurrences)
      .select(col("__h"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = ex.join(dupH, Seq("__h"), "left_semi")
      .withColumn("__lag", lag(col("pos"), 1).over(w))
      .withColumn("__new",
        when(col("__lag").isNull || col("pos") > col("__lag") + minLen, 1)
          .otherwise(0))
      .withColumn("__span", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__span"))
      .agg(min(col("pos")).as("__s"), max(col("pos")).as("__e"),
        count(lit(1)).as("__nw"), max(col("__tt")).as("__ttm"))
    spans.groupBy(col(idCol))
      .agg(sum(col("__nw")).as("n_dup_windows"),
        count(lit(1)).as("n_spans"),
        sum(col("__e") - col("__s") + minLen).cast("long").as("dup_tokens"),
        max(col("__ttm")).as("total_tokens"))
      .withColumn("dup_frac",
        round(col("dup_tokens").cast("double") / col("total_tokens"), 6) + lit(0.0))
  }

  /** ExactSubstr REMOVAL (the rewrite half of Lee et al. 2022, which
    * `duplicatedSpans` only detects): cut every duplicated token span
    * out of the corpus while keeping exactly one canonical occurrence —
    * the one at the minimal (document id, position). A span is
    * duplicated when its `minLen`-token windows occur ≥ `minOccurrences`
    * times corpus-wide; every non-canonical occurrence of a duplicated
    * window marks its `minLen` token positions for removal, and each
    * document is reassembled from its surviving tokens in original
    * order (token-level rewrite — Lee et al. likewise operate on the
    * tokenized corpus, not raw bytes).
    *
    * Returns one row per input document:
    * (idCol, clean, n_kept, n_removed) — untouched documents pass
    * through BYTE-IDENTICAL with n_removed = 0 (rewritten documents are
    * reassembled as single-space token joins, i.e. whitespace-normalized
    * — only docs that actually lost a span pay that), fully-duplicated
    * documents survive as empty strings (the curation pipeline may then
    * drop them).
    *
    * Scale shape (the reason this is NOT a suffix array):
    *   1. window hashing is one native-kernel scan; the exploded table
    *      is (id, pos, 8-byte hash60) — window text never shuffles;
    *   2. duplicated hashes and the canonical occurrence both come from
    *      map-side-combinable aggregates over that table (count, and
    *      min(struct(id, pos)) — deliberately an aggregate-then-join,
    *      NOT a row_number window: a boilerplate window occurring 10⁸
    *      times would serialize onto one reducer's sort under
    *      row_number, while min() partial-aggregates on the map side);
    *   3. only non-canonical duplicated occurrences fan out ×minLen
    *      into covered positions (a few % of tokens on real corpora);
    *   4. reassembly is one groupBy(id) sorted by position — per-doc
    *      state only, the same shape as `stripBoilerplate`.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            minLen: Int = 8, minOccurrences: Long = 2): DataFrame = {
    val id = col(idCol)
    // one materialization feeds the window-hash explode AND the token
    // reassembly scan (and the explode itself has two consumers)
    val base = docs.select(id, col(textCol).as("__text")).localCheckpoint(false)
    val ex = base
      .select(id, posexplode(
        graft.expressions.TextHashExpressions.windowHashesF(col("__text"), minLen))
        .as(Seq("pos", "__h")))
      .localCheckpoint(false) // consumed by the dup-count agg and the occurrence semi-join
    val dupH = ex.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minOccurrences)
      .select(col("__h"))
    val occ = ex.join(dupH, Seq("__h"), "left_semi")
    val canon = occ.groupBy(col("__h"))
      .agg(min(struct(id, col("pos"))).as("__c"))
      .select(col("__h"), col("__c")(idCol).as("__cid"), col("__c")("pos").as("__cpos"))
    // no distinct: overlapping windows emit the same position twice, but
    // the anti-join below is insensitive to right-side duplicates
    val covered = occ.join(canon, Seq("__h"))
      .filter(!(id === col("__cid") && col("pos") === col("__cpos")))
      .select(id, explode(sequence(col("pos"), col("pos") + lit(minLen - 1))).as("__tp"))
    val toks = base.select(id,
      posexplode(T.tokens(col("__text"))).as(Seq("__tp", "__tok")))
    val kept = toks.join(covered, Seq(idCol, "__tp"), "left_anti")
      .groupBy(id)
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__tp"), col("__tok")))),
          s => s.getField("__tok")), " ").as("clean"),
        count(lit(1)).as("n_kept"))
    // totals come from a third tokenization scan of the checkpointed
    // base — deliberate: the alternative (checkpointing the exploded
    // token table so counts come from it) materializes every
    // (id, pos, token) row, corpus-sized IO at 100 TB, to save one
    // cheap re-split of already-checkpointed text; 10× probes showed
    // no win for it either (both shapes within the run-to-run band)
    base.select(id, col("__text"), size(T.tokens(col("__text"))).cast("long").as("__tot"))
      .join(kept, Seq(idCol), "left")
      .select(id,
        // untouched docs keep their original bytes (no whitespace
        // normalization unless a span was actually removed)
        when(coalesce(col("n_kept"), lit(0L)) === col("__tot"), col("__text"))
          .otherwise(coalesce(col("clean"), lit(""))).as("clean"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__tot") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Bit p (0 = LSB) of an 8-hex-char string, via hex-digit arithmetic
    * (no Column-shift builtin needed; exact in double for digits ≤ 15).
    */
  private def hexBit(hx: Column, p: Column): Column = {
    val pos = lit(8) - floor(p.cast("double") / 4).cast("int")
    val digit = conv(hx.substr(pos, lit(1)), 16, 10).cast("int")
    val divisor = element_at(typedLit(Seq(1, 2, 4, 8)), (pmod(p, lit(4)) + 1).cast("int"))
    pmod(floor(digit.cast("double") / divisor).cast("long"), lit(2L))
  }

  /** 32-bit SimHash over a token array: per-bit majority vote of the
    * tokens' md5-derived 32-bit hashes (duplicate tokens vote repeatedly —
    * natural frequency weighting). Tie (vote sum 0) → bit 0.
    * Readable HOF spec — the hot path is the bit-identical native
    * `TextHashExpressions.simhash32F` (agreement tested in DedupSpec).
    */
  def simhash32(toks: Column): Column = {
    val powers = typedLit((0 until 32).map(1L << _))
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, p) => {
      val vote = aggregate(toks, lit(0L),
        (a, t) => a + hexBit(substring(md5(t.cast("binary")), 1, 8), p) * 2 - 1)
      acc + when(vote > 0, element_at(powers, p.cast("int") + 1)).otherwise(lit(0L))
    })
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1997) — the THIRD
    * blocking family next to LSH banding and SimHash buckets: sort the
    * corpus by a normalized key (text prefix here; entity-resolution
    * deployments use name/address keys), then compare each record only
    * with its `window − 1` successors in sort order. Catches near-dups
    * whose edit distance defeats shingle-set hashing but whose sort keys
    * collide (prefix-stable truncation/suffix edits).
    *
    * Scale shape: the sort window is PARTITIONED by a coarse key prefix
    * (`blockLen` chars) — a global-order window without partitioning
    * would serialize the corpus onto one reducer's sort, the same
    * scale-killer the span-dedup canonical selection avoids. The cost of
    * blocking is boundary blindness (neighbors straddling a block edge
    * are not compared — standard for blocked SNM; multi-pass with a
    * second key recovers them), bought for one partitioned sort + a
    * window·corpus comparison budget, no self-join anywhere.
    */
  /** CCNet-style paragraph-level exact dedup (Wenzek et al. 2020:
    * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    * Data" deduplicates at paragraph granularity before any document
    * scoring): split each document into consecutive `paraTokens`-token
    * paragraphs (the corpus has no newline structure, so the paragraph
    * boundary is the [[graft.functions.TextFunctions.chunks]] chunker —
    * on newline-structured text, substitute a `split(text, '\n')`
    * exploder and everything downstream is unchanged), fingerprint each
    * paragraph, keep only the corpus-wide FIRST occurrence of every
    * fingerprint (ordered by (id, paragraph index) — deterministic under
    * any partitioning), and reassemble the surviving paragraphs in
    * document order.
    *
    * Returns one row per document: (idCol, n_paras, n_kept, text_dedup).
    * A document whose every paragraph survives passes its text through
    * BYTE-IDENTICAL; only rewritten documents are re-joined
    * single-spaced (same contract as `removeDuplicatedSpans`).
    *
    * Scale shape — three linear passes, text crosses the wire once:
    *   1. explode to (id, idx, md5-fingerprint) — paragraph TEXT is
    *      dropped before any exchange; the canonical-occurrence pick is
    *      a map-side-combinable min(struct) per fingerprint (never a
    *      row_number window, which would serialize hot fingerprints);
    *   2. survivors fold back to ONE bounded row per document (a sorted
    *      index list, ≤ n_paras ints) via a map-side-combinable
    *      collect_list;
    *   3. one hash join by id against the original table re-slices the
    *      kept paragraphs from the in-row token array — the only
    *      exchange that moves document text, and the join the 100 TB
    *      deployment makes shuffle-free by bucketing both sides by id
    *      (`sources/Layout.bucketBy`).
    */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
                     paraTokens: Int = 10): DataFrame = {
    require(paraTokens >= 1, s"paraTokens must be >= 1, got $paraTokens")
    keepFirstParas(docs, paraFingerprints(docs, idCol, textCol, paraTokens),
      idCol, textCol, paraTokens)
  }

  /** Incremental paragraph-level dedup — [[paragraphDedup]] for the
    * recurring-crawl shape: dedup a new batch's paragraphs within the
    * batch AND against the already-ingested corpus. The corpus side
    * contributes only DISTINCT 16-byte paragraph fingerprints (at scale
    * a persisted snapshot column maintained per ingest — corpus TEXT is
    * never re-read), anti-joined before the batch's own first-occurrence
    * pick, so per-batch cost tracks the batch plus one fingerprint
    * join, not corpus size — the same contract as [[incrementalDedup]]
    * at document granularity.
    */
  def incrementalParagraphDedup(newBatch: DataFrame, existing: DataFrame,
                                idCol: String, textCol: String,
                                paraTokens: Int = 10): DataFrame =
    paragraphDedupAgainstFps(newBatch,
      paragraphFingerprints(existing, textCol, paraTokens),
      idCol, textCol, paraTokens)

  /** The DISTINCT paragraph-fingerprint snapshot of a corpus — the
    * ~16 B/paragraph store column [[incrementalParagraphDedup]] and the
    * streaming ingest twin maintain instead of re-reading corpus text.
    * One column, `fp` (md5 hex).
    */
  def paragraphFingerprints(docs: DataFrame, textCol: String,
                            paraTokens: Int = 10): DataFrame = {
    require(paraTokens >= 1, s"paraTokens must be >= 1, got $paraTokens")
    docs
      .select(explode(T.chunks(col(textCol), paraTokens)).as("__para"))
      .select(T.fingerprint(col("__para")).as("fp"))
      .distinct()
  }

  /** [[incrementalParagraphDedup]] against an already-materialized
    * fingerprint snapshot (one `fp` column, [[paragraphFingerprints]]) —
    * the entry point a persisted store or a streaming ingest uses
    * directly, skipping the corpus-side re-derivation.
    */
  def paragraphDedupAgainstFps(newBatch: DataFrame, fps: DataFrame,
                               idCol: String, textCol: String,
                               paraTokens: Int = 10): DataFrame = {
    require(paraTokens >= 1, s"paraTokens must be >= 1, got $paraTokens")
    val fresh = paraFingerprints(newBatch, idCol, textCol, paraTokens)
      .join(fps.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
    keepFirstParas(newBatch, fresh, idCol, textCol, paraTokens)
  }

  /** (id, __idx, __fp) paragraph-fingerprint projection — paragraph
    * text is dropped before any exchange.
    */
  private def paraFingerprints(docs: DataFrame, idCol: String,
                               textCol: String, paraTokens: Int): DataFrame =
    docs
      .select(col(idCol), posexplode(T.chunks(col(textCol), paraTokens))
        .as(Seq("__idx", "__para")))
      .select(col(idCol), col("__idx"),
        T.fingerprint(col("__para")).as("__fp"))

  /** Shared tail of the paragraph-dedup family: corpus-wide
    * first-occurrence pick over `paras` (already corpus-filtered for
    * the incremental variant), survivor fold-back, in-row reassembly.
    */
  private def keepFirstParas(docs: DataFrame, paras: DataFrame,
                             idCol: String, textCol: String,
                             paraTokens: Int): DataFrame = {
    val id = col(idCol)
    val canon = paras.groupBy(col("__fp"))
      .agg(min(struct(id.as("__cid"), col("__idx").as("__cidx"))).as("__first"))
    val kept = paras.join(canon, Seq("__fp"))
      .filter(col("__first.__cid") === id && col("__first.__cidx") === col("__idx"))
      .groupBy(id)
      .agg(sort_array(collect_list(col("__idx"))).as("__keep"))
    val chunksCol = T.chunks(col(textCol), paraTokens)
    docs.join(kept, Seq(idCol), "left")
      .select(id,
        size(chunksCol).cast("long").as("n_paras"),
        coalesce(size(col("__keep")), lit(0)).cast("long").as("n_kept"),
        when(size(chunksCol) === coalesce(size(col("__keep")), lit(0)),
          col(textCol))
          // entirely-duplicate doc: __keep is NULL (no survivors) → ""
          .otherwise(array_join(transform(
            coalesce(col("__keep"), array().cast("array<int>")),
            i => element_at(chunksCol, i + 1)), " "))
          .as("text_dedup"))
  }

  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String, textCol: String,
                              window: Int = 3, keyLen: Int = 24,
                              blockLen: Int = 8, shingleSize: Int = 2,
                              threshold: Double = 0.2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(blockLen >= 1 && keyLen >= blockLen,
      s"need keyLen >= blockLen >= 1, got keyLen=$keyLen blockLen=$blockLen")
    import org.apache.spark.sql.expressions.Window
    val base = docs
      .select(col(idCol).as("__id"),
        substring(lower(trim(col(textCol))), 1, keyLen).as("__key"),
        shingles(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__blk", substring(col("__key"), 1, blockLen))
    val w = Window.partitionBy(col("__blk")).orderBy(col("__key"), col("__id"))
    val leads = (1 until window).map(i =>
      lead(struct(col("__id").as("nid"), col("__sh").as("nsh")), i)
        .over(w).as(s"__n$i"))
    val withNext = base.select(
      Seq(col("__id"), col("__sh")) ++ leads: _*)
    val pairs = (1 until window).map(i =>
        withNext.select(col("__id").as("id_a"),
            col(s"__n$i.nid").as("id_b"),
            col("__sh").as("__sha"), col(s"__n$i.nsh").as("__shb"))
          .filter(col("id_b").isNotNull))
      .reduce(_ unionByName _)
    pairs
      .withColumn("jaccard", round(jaccard(col("__sha"), col("__shb")), 4) + lit(0.0))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
