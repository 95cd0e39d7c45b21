/** =graft: a Spark-native analytics engine for LLM retrieval and training-data pipelines=
  *
  * This page is the CODE-LEVEL INDEX of the public surface: capability →
  * entry point. Every operator listed here is oracle-checked against
  * DuckDB through [[graft.SparkEntry]] (the driver contract) and/or
  * spec-pinned in `src/test`; `OPERATORS.md` holds the full
  * capability → implementation → oracle → test table with file:line
  * citations, and `README.md` the narrative overview.
  *
  * ==Vector search and retrieval==
  *
  *  - Vector store (insert with md5-mod-N shard routing, L2-normalize at
  *    ingest, dim validation, cosine/L2 top-k, delete/upsert, range
  *    search, count/health): [[graft.search.VectorStore]]
  *  - Top-k primitives (global top-k via `TakeOrderedAndProject`,
  *    per-key two-phase k-bounded aggregation — the shard-topk +
  *    coordinator-merge shape): [[graft.operators.TopK]]
  *  - ANN index family — IVF assign/train/search, PQ encode + ADC
  *    scoring, IVF-PQ, SQ8, binary and Matryoshka quantization, batched
  *    IVF search, graph (NSW-style) beam search single and batched, kNN
  *    join, recall/rank-quality evaluation, index persistence:
  *    [[graft.operators.Ann]]
  *  - Filtered search (selectivity-routed pre/post-filter paths) and
  *    namespaced multi-tenant batch search:
  *    [[graft.operators.Ann.searchFiltered]],
  *    [[graft.operators.Ann.searchNamespacedBatch]]
  *  - Index quality and tuning — per-cell simplified silhouette (fresh
  *    geometry + stored-assignment drift modes), probe auto-tuning
  *    (recall-vs-cost sweep with chosen level), PQ distortion sweep:
  *    [[graft.operators.Ann.silhouetteSimplified]],
  *    [[graft.operators.Ann.probeRecallSweep]],
  *    [[graft.operators.Ann.pqDistortionSweep]]
  *  - Lexical retrieval — BM25 with bounded shuffles, positional
  *    postings + exact phrase search, pseudo-relevance-feedback
  *    expansion, score normalization/blending, reciprocal-rank fusion:
  *    [[graft.operators.Bm25]]; TF-IDF vectors/search/keywords:
  *    [[graft.operators.Tfidf]]
  *  - Second-stage reranking (broadcast retrieve→rerank, MMR
  *    diversification): [[graft.operators.Rerank]]
  *  - Codegen'd float-vector kernels (dot, cosine, L2) usable from SQL:
  *    [[graft.expressions.FloatVectorExpressions]],
  *    [[graft.functions.VectorFunctions]]
  *
  * ==Deduplication==
  *
  *  - Text near-dup — shingles, MinHash signatures, LSH banding,
  *    Jaccard/containment verify, one-call [[graft.operators.Dedup.nearDupPairs]],
  *    threshold sweeps, exact/incremental/cluster dedup, CDC and
  *    substring-span rewrite (`removeDuplicatedSpans`), paragraph dedup,
  *    connected components, canonical-survivor selection:
  *    [[graft.operators.Dedup]]
  *  - The shared hot-bucket-capped pair engine behind EVERY pairwise
  *    family (decision-preserving star routing + true-statistic
  *    verification): [[graft.operators.Dedup.cappedPairsByKey]] /
  *    [[graft.operators.Dedup.sharedSigPairs]]
  *  - Embedding near-dup (SRP-LSH, cosine verify) and semantic dedup:
  *    [[graft.expressions.SrpExpression]] + `q_srp_neardup` /
  *    `q_semantic_dedup` in [[graft.SparkEntry]]
  *  - Media near-dup — video frame signatures, shot-level content
  *    signatures (re-cut robust), image tile signatures, perceptual
  *    dHash with pigeonhole-complete banding, audio window signatures,
  *    segment-gated audio pairs, end-to-end keep-representative
  *    decisions: [[graft.operators.Multimodal]]
  *  - Record linkage (Jaro-Winkler blocked best-match with flagged
  *    hot-block truncation): [[graft.operators.Mining.blockedBestMatch]]
  *
  * ==Text analysis and quality==
  *
  *  - Chunking (word/sliding/sentence), language id, quality scoring,
  *    token statistics, fingerprinting, mojibake/unicode repair, C4 and
  *    Gopher rules, boilerplate, PII redaction:
  *    [[graft.functions.TextFunctions]],
  *    [[graft.expressions.UnicodeExpressions]],
  *    [[graft.operators.Privacy]]
  *  - Tokenizer TRAINING (BPE, WordPiece likelihood-ratio merges):
  *    [[graft.operators.BpeTrain]]; unigram-LM Viterbi segmentation:
  *    [[graft.operators.UnigramLm]]; WordPiece INFERENCE encode (the
  *    BERT BasicTokenizer recipe): [[graft.embed.WordPieceTokenizer]]
  *  - LM scoring — char-trigram perplexity filters, interpolated
  *    Kneser-Ney, CCNet-style perplexity bucketing, RHO excess-ppl
  *    selection: [[graft.operators.TrigramLm]]
  *  - Text-pair QA — BLEU/chrF/ROUGE-L, SQuAD EM/F1, rank-biased
  *    overlap: [[graft.operators.TextEval]]; Gale-Church and
  *    self-rewrite sentence alignment: [[graft.operators.Align]]
  *  - Semantic chunking (TextTiling): [[graft.operators.TextTiling]];
  *    quality classification (hashed-feature fasttext shape, trainable):
  *    [[graft.operators.Classifier]]
  *
  * ==Selection, curation, and training prep==
  *
  *  - One-call curation pipeline (redact → gates → dedup tiers →
  *    mixture): [[graft.operators.Curation]]
  *  - Sampling — stratified, weighted without replacement, hash-gated
  *    mixtures, token-budget mixtures, temperature flattening, DSIR:
  *    [[graft.operators.Sampling]]
  *  - Coresets (k-center farthest-point): [[graft.operators.Coreset]]
  *  - SFT/DPO prep — chat-template rendering with loss masks,
  *    preference pairs, skip-gram/negative tables, span corruption,
  *    curriculum staging: [[graft.operators.SftPrep]]
  *  - Sequence packing (concat-and-chunk with boundary map):
  *    [[graft.operators.Packing]]
  *  - Decontamination (broadcast hash-set + Bloom pre-filter,
  *    leakage-safe splits): `q_decontaminate` / `q_bloom_decontaminate`
  *    / `q_leakage_split` in [[graft.SparkEntry]],
  *    [[graft.operators.RuntimeFilter]]; EMBEDDING-level semantic
  *    decontamination (IVF-bounded cosine vs a broadcast eval set):
  *    [[graft.operators.Mining.semanticDecontaminate]], with a
  *    continuous ingest-gate twin
  *    [[graft.streaming.Streaming.streamDecontaminateIngest]]
  *
  * ==Sketches and aggregation==
  *
  *  - Heavy hitters (Misra-Gries with certified exact recount):
  *    [[graft.operators.HeavyHitters]]
  *  - Quantiles (KLL, exact below capacity, grouped + streaming):
  *    [[graft.operators.QuantileSketch]]
  *  - Distinct counts and sketch SET OPERATIONS (KMV):
  *    [[graft.operators.DistinctSketch]]
  *  - Count-min point estimates: [[graft.operators.CountMin]]
  *  - PMI collocations, Zipf fits, autocomplete, OOV rates:
  *    [[graft.operators.Collocations]]
  *
  * ==Graphs and hierarchy==
  *
  *  - Co-occurrence projection, degree-ordered triangle counting, label
  *    propagation, k-core peeling, HITS: [[graft.operators.GraphOps]]
  *  - Link-graph PageRank: [[graft.operators.PageRank]]
  *  - WITH RECURSIVE surface by pointer doubling (root/depth, budgeted
  *    ancestor closure, subtree sizes): [[graft.operators.Hierarchy]]
  *
  * ==Joins and relational==
  *
  *  - As-of join: [[graft.operators.AsofJoin]]; salted skew join:
  *    [[graft.operators.SkewJoin]]; Bloom runtime-filtered join:
  *    [[graft.operators.RuntimeFilter]]
  *  - The TPC-H 22/22 sweep and 283 oracle-checked relational/pipeline
  *    queries: [[graft.SparkEntry]]
  *
  * ==Embedding and RAG==
  *
  *  - Pluggable per-partition embedder boundary (open/embedBatch/close
  *    lifecycle), deterministic hashing + quantized MLP/attention
  *    stand-ins, batched `mapPartitions` driver: [[graft.embed.Embed]],
  *    [[graft.embed.Embedder]]
  *  - Real-weights ONNX session boundary (reflective load, WordPiece
  *    encode, mask-mean-pool + L2): [[graft.embed.OnnxEmbedder]]
  *  - RAG ingest (chunk → embed → store) and ask (retrieve → assemble →
  *    generate): [[graft.rag.Rag]], [[graft.rag.Generation]]; the ask
  *    face against the MAINTAINED on-disk index (chunk text as
  *    passthrough metadata, probe-pruned retrieval, snapshot pins):
  *    [[graft.rag.Rag.askMaintained]]
  *
  * ==Multimodal plumbing==
  *
  *  - Binary payload decode boundary (PPM/WAV/concat-video parsers,
  *    partitioned decoders, frame sampling, feature stubs), media
  *    analysis (shot detection, audio energy segmentation):
  *    [[graft.operators.Multimodal]]
  *
  * ==Monitoring and evaluation==
  *
  *  - Embedding/lexical drift, margin mining, cluster purity:
  *    [[graft.operators.Mining]]
  *  - EWMA anomaly detection (integer-exact, streaming twin):
  *    [[graft.operators.Ewma]]
  *  - Data validation rule packs: [[graft.operators.Validation]]
  *  - Job metrics (listener histograms): [[graft.metrics.Metrics]]
  *
  * ==Storage layout and interchange==
  *
  *  - Range-sorted shard layout, disjointness manifests, z-order,
  *    parquet bloom indexes (writeBloomIndexed), content digests,
  *    versioned time-travel snapshots, merge-on-read tombstones +
  *    vacuum, schema evolution (readEvolved / backfillColumn),
  *    incremental materialized rollups (refreshRollup), fingerprint-
  *    cached derived artifacts (derive): [[graft.sources.Layout]]
  *  - Table loading and synthetic corpora: [[graft.sources.Tables]],
  *    [[graft.sources.Synthetic]]
  *
  * ==Streaming twins==
  *
  *  - Windowed aggs/sketches, stream-stream interval joins (inner +
  *    outer), sessionization, continuous dedup/near-dup/curation
  *    ingest, media signature ingest (video frame, audio window, image
  *    dHash) with batch-addressed replay-safe stores:
  *    [[graft.streaming.Streaming]]
  *  - Continuous IVF ingest with in-stream index maintenance
  *    (insert + crash-safe split/merge rebalance, versioned centroid
  *    store): [[graft.streaming.Streaming.streamInsertIndexedMaintained]];
  *    probe-pruned serving, single and batched (one scan per query
  *    batch), both with metadata-predicate filtering over passthrough
  *    columns: [[graft.streaming.Streaming.searchMaintained]],
  *    [[graft.streaming.Streaming.searchMaintainedBatch]];
  *    merge-on-read deletes made physical at compaction:
  *    [[graft.streaming.Streaming.deleteMaintained]],
  *    [[graft.streaming.Streaming.compactMaintained]];
  *    stored-assignment drift report against committed centroids:
  *    [[graft.streaming.Streaming.silhouetteMaintained]];
  *    SNAPSHOT-pinned reads (a permanent `__b0` row version survives
  *    folds and moves; deletes read current):
  *    [[graft.streaming.Streaming.maintainedSnapshot]];
  *    exact-scan ground truth + per-query recall audit of the probed
  *    serving: [[graft.streaming.Streaming.searchMaintainedExact]],
  *    [[graft.streaming.Streaming.recallMaintained]];
  *    grouped (top-documents) serving against the on-disk index:
  *    [[graft.streaming.Streaming.searchMaintainedGrouped]];
  *    late-interaction (ColBERT MaxSim) serving — full-vector probe,
  *    exact per-slice re-rank:
  *    [[graft.streaming.Streaming.searchMaintainedMaxSim]];
  *    crash-safe FULL CENTROID RETRAIN (k-means rebuild, tombstones
  *    purged, intent/commit recovery, ingest refusal over a crashed
  *    rebuild): [[graft.streaming.Streaming.retrainMaintained]];
  *    the maintenance RUNBOOK AS CODE (census + drift → compact /
  *    vacuum / retrain advice, one-call safe-order execution):
  *    [[graft.streaming.Streaming.adviseMaintenance]],
  *    [[graft.streaming.Streaming.autoMaintain]];
  *    storage-integrity fsck (duplicates, misfiled rows, rollback
  *    debris, dead tombstones, pending intents):
  *    [[graft.streaming.Streaming.fsckMaintained]];
  *    duplicate-query collapse, keyset pagination, predicate purge,
  *    tombstone-sidecar vacuum, one-call state report:
  *    [[graft.streaming.Streaming.searchMaintainedBatchCollapsed]],
  *    [[graft.streaming.Streaming.deleteMaintainedWhere]],
  *    [[graft.streaming.Streaming.vacuumDeletes]],
  *    [[graft.streaming.Streaming.describeMaintained]]
  *
  * ==SQL surface==
  *
  *  - Native kernels as SQL functions (`graft_dot`,
  *    `graft_minhash_sig`, …) via `spark.sql.extensions` or live
  *    registration: [[graft.ext.GraftFunctions]]
  *
  * ==Driver mains==
  *
  *  - Correctness dump for the DuckDB oracle: [[graft.Verify]];
  *    benchmark: [[graft.Bench]]; scale-curve probes: [[graft.Profile]];
  *    plan printer: [[graft.Plans]]; smoke: [[graft.Smoke]]
  */
package object graft
