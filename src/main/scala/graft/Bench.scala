package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.FloatVectorExpressions.dotF
import graft.operators.TopK
import graft.sources.Tables

/** Per-round benchmark (driver → BENCH_r{N}.json, judged against
  * BASELINE.md).
  *
  * Two workload families:
  *  1. The reference's own bench semantics (`scripts/bench.py`): 200 random
  *     unit-vector queries, k=10, cosine, over the normalized in-memory
  *     store. Spark-first shape = ONE batched job (broadcast the query
  *     table, score with the codegen dot product, per-query top-k);
  *     plus a 20-query sequential loop for per-query latency percentiles
  *     and the reference's `q/Σlat` QPS formula (BASELINE.md caveats).
  *  2. Headline analytics/dedup queries from SparkEntry at the bench SF.
  *
  * Each timed query runs once as warmup (JIT + page cache) and once timed.
  */
object Bench {

  // package-visible: BenchCensusSpec pins headline ⊇ SparkEntry.queries
  // (minus the documented exclusions) so an implemented-but-unbenched
  // query can't recur silently
  private[graft] val headline = Seq(
    "q1_agg", "q5_join", "q_window_topk", "q_sessionize", "q_asof_join",
    "q_tumbling", "q_topk_cosine", "q_embed_neardup", "q_ann_ivf",
    "q_minhash_lsh", "q_ngram_jaccard", "q_simhash", "q_chunk",
    // round-2 additions
    "q_srp_neardup", "q_hash_embed", "q_session_window", "q_dedup_exact",
    "q_salted_join", "q_batch_topk",
    // round-3 additions: training-data curation surface
    "q_decontaminate", "q_pii_redact", "q_repetition", "q_stratified_sample",
    "q_seq_pack", "q_curation", "q_dedup_clusters", "q_corpus_stats",
    "q_bm25", "q_hybrid_rrf", "q_ann_pq",
    // round-4 additions
    "q_substring_dedup", "q_bloom_decontaminate", "q_ann_ivfpq",
    "q_token_mixture", "q_incremental_dedup", "q_c4_clean",
    "q_sq_search", "q_quality_classifier", "q_incremental_neardup",
    "q_rerank", "q_vocab_topn", "q_trigram_lm", "q_boilerplate",
    "q_semantic_dedup", "q_bq_search", "q_mrl_search", "q_late_interaction",
    // round-5 additions: retrieval-training data prep + quality signals
    "q_dsir_sample", "q_mmr_rerank", "q_hard_negatives", "q_char_entropy",
    "q_range_search", "q_train_shard", "q_bpe_train", "q_mlp_embed",
    "q_pca_top", "q_quality_gate", "q_word_subsample", "q_postings",
    "q_min_span", "q_abtt",
    // round-6 additions: substring rewrite + bounded-shuffle heavy hitters
    "q_substr_removal", "q_heavy_hitters", "q_jsonl_roundtrip",
    "q_quantile_sketch", "q_outer_join", "q_unicode_clean",
    "q_distinct_sketch", "q_group_quantiles", "q_gap_fill", "q_group_top_terms",
    "q_grouping_sets", "q_window_funcs", "q_conditional_agg",
    "q_funnel", "q_retention", "q_index_health", "q_export_manifest",
    "q_standardize", "q_null_semantics", "q_user_paths", "q_mlm_mask",
    "q_snapshot_diff",
    // round-7 additions: quality rules, phrase index, graph rank, mining
    "q_gopher_rules", "q_phrase_search", "q_weighted_sample",
    "q_csv_roundtrip", "q_orc_roundtrip", "q_pagerank",
    "q_sorted_neighborhood", "q_margin_mining", "q_recall_eval",
    "q_winsorize", "q_temperature_mix", "q_dedup_keep_best",
    "q_source_overlap", "q_span_corrupt", "q_novelty_score",
    "q_cms_counts", "q_containment_dups", "q_robust_scale",
    // round-8 additions: sketch set ops, graph counting, release gates
    "q_kmv_setops", "q_pmi_collocations", "q_three_way_split",
    "q_table_digest", "q_runtime_filter_join", "q_zipf_fit",
    "q_cooccur_edges", "q_triangle_count", "q_length_buckets",
    "q_k_anonymity", "q_autocomplete", "q_embed_drift", "q_oov_rate",
    "q_readability", "q_neardup_sweep", "q_data_quality",
    // round-9 additions: lexical VSM, paragraph dedup, cluster balance,
    // keywords, pseudonymization, purity eval, LPA communities
    "q_tfidf_search", "q_paragraph_dedup", "q_cluster_balance",
    "q_tfidf_keywords", "q_pseudonymize", "q_cluster_purity",
    "q_label_prop", "q_token_fertility", "q3_shipping",
    "q_hybrid_blend", "q_prf_expand", "q_incremental_paradedup",
    "q_rank_quality", "q_norm_audit", "q10_returns", "q_knn_join",
    "q_paragraph_stats", "q_classifier_train", "q_blocklist",
    // round-10 additions: crawl-front ops (URL + HTML) and TPC-H sweeps
    "q_url_canonical", "q_url_dedup", "q_html_extract",
    "q6_revenue", "q14_promo", "q18_large_orders",
    "q_domain_stats", "q_domain_gate", "q7_volume", "q19_discount",
    "q_curation_best",
    // round 7 additions
    "q8_market_share", "q13_cust_dist", "q15_top_supplier",
    "q17_small_qty", "q22_idle_customers", "q_sft_render", "q_pref_pairs",
    "q_skipgram_pairs", "q_neg_table", "q_jaro_linkage", "q_ewma_anomaly",
    "q_sft_pipeline", "q_token_budget", "q_quality_calibrate",
    "q_unigram_segment", "q_hits", "q_range_layout", "q_lexical_drift",
    "q_interarrival", "q_inbatch_negatives", "q_attribution",
    "q_script_mix",
    // round-8 additions: CCNet ppl bucketing, BLEU/chrF pair QA,
    // TextTiling semantic chunking
    "q_ppl_buckets", "q_bleu_pairs", "q_chrf_pairs", "q_semantic_chunks",
    // round-5-of-build additions: ROUGE-L, coreset, k-core, leak-safe
    // split, excess-ppl selection
    "q_rouge_pairs", "q_kcenter", "q_kcore", "q_leakage_split",
    "q_excess_ppl", "q_wordpiece_train", "q_contrastive_crops",
    "q_kn_ppl", "q_curriculum", "q_cdc_dedup", "q_groundedness",
    "q_l_diversity", "q_graph_ann", "q_ppm_decode", "q_wav_decode",
    "q_graph_ann_batch", "q_dedup_eval", "q_jackknife", "q_mojibake",
    "q_sentence_chunks", "q_squad_eval",
    // ranking comparison + sentence-alignment provenance + video frames
    "q_rbo_rankers", "q_sentence_align", "q_frame_sample", "q_video_dedup",
    // round-6 media-parity additions: capped audio window-signature,
    // image tile-signature, and perceptual dHash dedup
    "q_audio_dedup", "q_image_dedup", "q_dhash_neardup",
    // TPC-H gap fill (schema-adapted Q4/Q9/Q11/Q12/Q16)
    "q4_priority", "q9_profit", "q16_parts", "q11_brand_value",
    "q12_priority_class",
    // round-6: the three hardest TPC-H shapes (correlated min-subquery,
    // nested-IN selection, multi-EXISTS) complete the sweep
    "q2_min_cost_supp", "q20_surplus_suppliers", "q21_waiting_suppliers",
    // round-6 census fill: every remaining SparkEntry query, so
    // BENCH_FULL covers the complete surface and any query's regression
    // is visible round over round
    "q_anti_join", "q_approx_sketch", "q_bpe_real", "q_bpe_tokens",
    "q_chunk_sliding", "q_count_by_label", "q_cube", "q_distinct_users",
    "q_edit_distance", "q_embed_centroid", "q_filtered_topk",
    "q_fingerprint", "q_hash_sample", "q_histogram", "q_langid",
    "q_media_dedup", "q_minhash_bands", "q_minhash_lsh_capped",
    "q_multimodal", "q_normalize", "q_percentile", "q_pivot",
    "q_props_json", "q_rag_context", "q_rag_prompt", "q_range_join",
    "q_rolling_fp", "q_rollup", "q_running_window", "q_sample_exact",
    "q_scalar_subq", "q_semi_join", "q_setops", "q_shard_route",
    "q_simhash_dups", "q_sliding", "q_sql_agg", "q_sql_kernels",
    "q_text_quality", "q_token_stats", "q_topk_l2", "q_topk_l2_decl",
    "q_trending", "q_zorder",
    // round-6: cell-bounded margin mining + e2e video dedup decisions +
    // media analysis (VAD-shaped segmentation, shot detection)
    "q_margin_ivf", "q_video_dedup_e2e", "q_audio_segments",
    "q_shot_detect", "q_tree_closure", "q_subtree_sizes", "q_dhash_sweep",
    // round-7 additions: shot-level e2e video dedup (re-cut robust),
    // segment-gated audio near-dup, and the image/audio e2e decision
    // pipelines completing the media trio
    "q_shot_dedup_e2e", "q_audio_dedup_gated", "q_image_dedup_e2e",
    "q_audio_dedup_e2e",
    // round-7 index-lifecycle additions: deterministic IVF rebalance,
    // merge-on-read tombstone vacuum, reshard planning
    "q_ivf_rebalance", "q_ivf_rebalance_search", "q_tombstone_vacuum",
    "q_reshard_plan", "q_schema_evolve", "q_incremental_rollup",
    // round-7 serving additions: selectivity-routed filtered search and
    // namespaced (multi-tenant) batch search
    "q_filtered_ann_pre", "q_filtered_ann_post", "q_ns_search",
    "q_silhouette", "q_probe_tune", "q_pq_distortion", "q_ks_drift",
    "q_jsonl_tolerant", "q_maintained_lifecycle", "q_modularity",
    "q_psi_drift", "q_anisotropy", "q_reliability",
    // round-8 additions: embedding-level train/eval decontamination +
    // snapshot-pinned serving over the maintained table
    "q_semantic_decontaminate", "q_maintained_snapshot",
    "q_maintained_recall", "q_kmeans_train", "q_maintained_retrain",
    "q_maintained_grouped", "q_rag_maintained", "q_maintained_maxsim",
    // round-9: HNSW layered graph-ANN, single + batched
    "q_hnsw_ann", "q_hnsw_ann_batch",
    // round-10: incremental HNSW ingest (batch insert, no rebuild) +
    // soft delete (tombstones route but never surface) + tombstone
    // purge (touched-cell re-link ≡ build-on-survivors)
    "q_hnsw_insert", "q_hnsw_delete", "q_hnsw_compact",
    // round-11: the DURABLE on-disk HNSW index — streamed fenced ingest
    // and physical purge, served back off disk (oracle rows are
    // fixture-inclusive; hnsw_refresh_op/hnsw_compact_op isolate the
    // op costs)
    "q_hnsw_maintained", "q_hnsw_maintained_purge",
    // round-12: durable soft delete (streamed tombstones, honored by
    // the serve faces) and the vacuum (purge everything pending +
    // retire the sidecar); hnsw_softdelete_op / hnsw_sdserve_op
    // isolate the op costs beside the fixture-inclusive oracle rows
    "q_hnsw_maintained_delete", "q_hnsw_maintained_vacuum",
    // round-12: metadata-filtered durable serving (passthrough columns
    // riding the sidecar; hnsw_filtered_serve isolates the op)
    "q_hnsw_maintained_filtered", "q_hnsw_maintained_retrain",
    "q_hnsw_maintained_namespaced",
    // round-10 census fill (BenchCensusSpec now pins headline ⊇
    // SparkEntry.queries, so a gap like this can't recur silently):
    // sparse/grouped/recommend serving faces that predated the census
    "q_grouped_search", "q_recommend", "q_recommend_filtered",
    "q_sparse_pruned", "q_sparse_search",
    // round-13: grouped RAG-page serving, the RAG loop on the graph
    // index, predicate soft delete, late-interaction MaxSim, and the
    // pinned-serve erasure law — all on the durable HNSW (oracle rows
    // are fixture-inclusive; hnsw_grouped_serve / hnsw_maxsim_serve /
    // hnsw_collapsed_serve / hnsw_sdwhere_op isolate the op costs)
    "q_hnsw_maintained_grouped", "q_rag_hnsw",
    "q_hnsw_maintained_sdwhere", "q_hnsw_maintained_maxsim",
    "q_hnsw_pinned_erasure")

  /** Force FULL materialization of every output column: xxhash64 over all
    * columns, summed. `.count()` alone under-measures — Catalyst prunes
    * projections count(1) doesn't need (e.g. q_chunk's md5 chunk_id was
    * never computed in the r2 benched plan), so timings looked better
    * than the work a real consumer would trigger.
    */
  private def materialize(df: DataFrame): Unit = {
    // bit_xor, not sum: ANSI mode (Spark 4 default) raises on long overflow
    df.agg(bit_xor(xxhash64(df.columns.map(col): _*))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Benign-noise suppression, bench main ONLY: early-terminating jobs
    // (limit / take / isEmpty) cancel their stages' remaining tasks; a
    // killed task that still completes reports its accumulators after the
    // job ended, and once ContextCleaner has reaped them DAGScheduler logs
    // an ERROR stack (accessNonExistentAccumulatorError) per late update —
    // thousands of lines inside the measurement window with zero effect on
    // results. The listener-bus quiesce before System.gc() narrows the
    // window; this silences the rest so the captured artifact tail stays
    // the JSON line.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.FATAL)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // Optional args restrict the run: headline queries filter by exact
    // name, and the vector/ann/maintained/skew sections run only when
    // unrestricted or when an arg names one of their rows. Combined
    // with `run / fork := true`, `runMain graft.Bench <row...>` is a
    // FRESH-JVM isolated timing of exactly those rows — the
    // noise-adjudication tool (tools/isolated_bench.sh drives it).
    val only = args.toSet
    def sectionOn(prefix: String): Boolean =
      only.isEmpty || only.exists(_.startsWith(prefix))

    // -------- 1. vector workload (reference bench shape) ----------------
    val dim = 64
    val rnd = new scala.util.Random(42)
    def randUnit(): Seq[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }

    // the "in-memory index": normalized store, cached like the shard matrix
    val e = Tables.load(spark, sfDir, "embeddings")
    lazy val store = {
      val s = e
        .withColumn("__n", greatest(sqrt(dotF(col("embedding"), col("embedding"))),
          lit(1e-12)))
        .withColumn("embedding",
          transform(col("embedding"), x => (x.cast("double") / col("__n")).cast("float")))
        .select(col("vec_id"), col("embedding"))
        .persist()
      s.count() // materialize
      s
    }

    // batched: 200 queries in ONE job — broadcast queries, score, topk/query
    if (sectionOn("vector")) {
      import spark.implicits._
      val queries = (0 until 200).map(i => (i.toLong, randUnit())).toDF("qid", "qe")
      def scored() = store.crossJoin(broadcast(queries))
        .select(col("qid"), col("vec_id"), dotF(col("embedding"), col("qe")).as("score"))
      def batchedRun(): Long =
        TopK.topKPerKey(scored(), Seq(col("qid")), col("score"), col("vec_id"), 10).count()
      // aggregator formulation: partial top-k buffers instead of a full
      // window sort — the shuffle carries ≤ partitions × queries × k rows
      def batchedAggRun(): Long =
        TopK.topKPerKeyAgg(scored(), Seq(col("qid")), col("score"), col("vec_id"), 10).count()
      batchedRun() // warmup
      results("vector_batch_200q") = time(batchedRun())
      batchedAggRun() // warmup
      results("vector_batch_agg_200q") = time(batchedAggRun())
    }

    // sequential: 20 single-query jobs for latency percentiles
    if (sectionOn("vector")) {
      val lats = (0 until 20).map { _ =>
        val q = randUnit()
        time {
          TopK.topK(
            store.withColumn("score", dotF(col("embedding"), typedLit(q))),
            col("score"), col("vec_id"), 10).collect()
        }
      }.sorted
      def pct(p: Double) = lats((p * (lats.length - 1)).round.toInt)
      results("vector_seq_p50") = pct(0.50)
      results("vector_seq_p95") = pct(0.95)
      results("vector_seq_qps_refformula") = lats.length / lats.sum
    }

    // IVF probe sweep: measured cost of scanning 1/2/4/8 of 16 cells —
    // the accuracy/cost dial an operator actually turns (recall@10 per
    // probe count is pinned in AnnSpec; this is the latency half).
    if (sectionOn("ann_ivf")) {
      import graft.operators.Ann
      val e = Tables.load(spark, sfDir, "embeddings")
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding",
        "cent_id", "cvec").persist()
      assigned.count()
      val query = e.filter(col("vec_id") === 42)
        .select(col("embedding")).head.getSeq[Float](0)
      for (p <- Seq(1, 2, 4, 8)) {
        def run(): Unit = {
          val probes = Ann.probeCellIds(cents, query, "cent_id", "cvec", p)
          TopK.topK(
            assigned.filter(col("cell_id").isin(probes: _*))
              .withColumn("score", dotF(col("embedding"), typedLit(query))),
            col("score"), col("vec_id"), 10).collect()
          ()
        }
        run() // warmup
        // best of two, same as the headline loop: one GC pause must not
        // bend the probe-count latency curve
        results(s"ann_ivf_probe$p") = math.min(time(run()), time(run()))
      }
      assigned.unpersist()
    }

    // maintained ON-DISK serving: the same 200-query batch shape
    // answered against a streamInsertIndexedMaintained-layout table
    // through searchMaintainedBatch — one partition-pruned scan per
    // batch (4/16 cells probed per query), vs vector_batch_200q's
    // in-memory full scan. The delta between the two rows is the price
    // of serving from the continuously-maintained index instead of a
    // cached table.
    if (sectionOn("maintained")) {
      import graft.streaming.{Streaming => Strm}
      import graft.operators.Ann
      import spark.implicits._
      val e = Tables.load(spark, sfDir, "embeddings")
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      val d = java.nio.file.Files.createTempDirectory("graft_bench_mnt_").toFile
      d.deleteOnExit()
      val table = new java.io.File(d, "t").getAbsolutePath
      Ann.ivfAssign(
          graft.search.VectorStore.prepare(
            e.select(col("vec_id").as("id"), col("embedding")), dim, 8),
          cents, "id", "embedding", "cent_id", "cvec")
        .withColumn("__b0", lit(0L)) // the ingest's permanent row version
        .withColumn("__b", lit(0L))
        .write.mode("overwrite").partitionBy("cell_id", "__b").parquet(table)
      val queries = (0 until 200).map(i => (i.toLong, randUnit()))
        .toDF("qid", "qvec")
      def run(): Long = Strm.searchMaintainedBatch(spark, table, cents,
        "cent_id", "cvec", queries, "qid", "qvec", nProbes = 4, k = 10).count()
      run() // warmup
      results("maintained_batch_200q") = math.min(time(run()), time(run()))

      // the hot-query shape: 2000 query slots, only 25 unique vectors
      // (80 copies each). The plain batch pays the 2000-query routing
      // join; the collapsed batch pays a 25-query one plus two
      // broadcast fan-back joins. The pair is the direct measurement
      // of what duplicate collapse buys; the full 200/2k/20k storm
      // curve (7x at 20k slots) lives in Profile `collapse`.
      val hotQueries = (0 until 2000).map(i => (i.toLong, i % 25))
        .toDF("qid", "__u")
        .join(broadcast((0 until 25).map(u => (u, randUnit()))
          .toDF("__u", "qvec")), Seq("__u"))
        .select(col("qid"), col("qvec"))
        .localCheckpoint(true)
      def runHotPlain(): Long = Strm.searchMaintainedBatch(spark, table,
        cents, "cent_id", "cvec", hotQueries, "qid", "qvec",
        nProbes = 4, k = 10).count()
      def runHotColl(): Long = Strm.searchMaintainedBatchCollapsed(spark,
        table, cents, "cent_id", "cvec", hotQueries, "qid", "qvec",
        nProbes = 4, k = 10).count()
      runHotPlain(); runHotColl() // warmup
      results("maintained_batch_hot2k_plain") =
        math.min(time(runHotPlain()), time(runHotPlain()))
      results("maintained_batch_hot2k_collapsed") =
        math.min(time(runHotColl()), time(runHotColl()))

      // ---- serve-only twins (round-9): the q_maintained_* oracle
      // queries necessarily build their fixture INSIDE the timed query
      // (the oracle must replay the build); these rows time the
      // serving/maintenance OPERATOR alone against the table built once
      // above, so the bench diff tracks the operator, not the fixture.
      // A 1% tombstone sidecar first: serving without the anti-join
      // path would flatter every row below.
      Strm.deleteMaintained(spark, table,
        e.filter(pmod(col("vec_id"), lit(100)) === 0)
          .select(col("vec_id").as("id")), "id")
      val oneQ = randUnit()
      def runServe(): Long = Strm.searchMaintained(spark, table, cents,
        "cent_id", "cvec", oneQ, nProbes = 4, k = 10).count()
      runServe() // warmup
      results("maintained_search_serve") =
        math.min(time(runServe()), time(runServe()))
      val pin = Strm.maintainedSnapshot(spark, table)
      def runPinned(): Long = Strm.searchMaintained(spark, table, cents,
        "cent_id", "cvec", oneQ, nProbes = 4, k = 10,
        asOf = Some(pin)).count()
      runPinned() // warmup
      results("maintained_snapshot_serve") =
        math.min(time(runPinned()), time(runPinned()))
      def runExact(): Long = Strm.searchMaintainedExact(spark, table,
        oneQ, k = 10).count()
      runExact() // warmup
      results("maintained_exact_serve") =
        math.min(time(runExact()), time(runExact()))
      val recallQs = (0 until 20).map(i => (i.toLong, randUnit()))
        .toDF("qid", "qvec")
      def runRecall(): Long = Strm.recallMaintained(spark, table, cents,
        "cent_id", "cvec", recallQs, "qid", "qvec", nProbes = 4,
        k = 10).count()
      runRecall() // warmup
      results("maintained_recall_serve") =
        math.min(time(runRecall()), time(runRecall()))
      // the rebuild op itself, isolated from fixture build: each timed
      // run is a FULL retrain of the tombstone-bearing table (k-means
      // over live rows, re-home, physical purge) — no warmup row, the
      // first rebuild is the one a maintenance window pays
      results("maintained_retrain_op") = {
        val t1 = time(Strm.retrainMaintained(spark, table, k = 16,
          iters = 1))
        math.min(t1, time(Strm.retrainMaintained(spark, table, k = 16,
          iters = 1)))
      }
    }

    // HNSW on-disk serving twins: the q_hnsw_ann / q_hnsw_ann_batch
    // oracle rows time BUILD + search (the oracle must replay the
    // build); these rows build the hierarchy once per session, persist
    // it src-sorted (Ann.writeHnswLayers — row-group-prunable layout,
    // the on-disk index shape), and time the SEARCH faces alone — the
    // single driver-loop face and the distributed 200-query batch face
    // (the one that matters at 100×), matching the maintained-family
    // serve-twin discipline.
    if (sectionOn("hnsw")) {
      import graft.operators.Ann
      import spark.implicits._
      val e = Tables.load(spark, sfDir, "embeddings")
      val cents = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      val built = Ann.hnswBuild(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val d = java.nio.file.Files.createTempDirectory("graft_bench_hnsw_")
        .toFile
      d.deleteOnExit()
      val idx = new java.io.File(d, "layers").getAbsolutePath
      Ann.writeHnswLayers(built, idx)
      val layers = Ann.readHnswLayers(spark, idx, maxLevel = 1)
      val query = e.filter(col("vec_id") === 42)
        .select(col("embedding")).head.getSeq[Float](0)
      def runSingle(): Long = Ann.hnswSearch(layers, e, "vec_id",
        "embedding", query, fanout = 4, beam = 8, hops = 3,
        descentHops = 2).count()
      runSingle() // warmup
      results("hnsw_search_serve") =
        math.min(time(runSingle()), time(runSingle()))
      val hq = (0 until 200).map(i => (i.toLong, randUnit()))
        .toDF("qid", "qvec").localCheckpoint(true)
      def runBatch(): Long = Ann.hnswSearchBatch(layers, e, hq, "vec_id",
        "embedding", "qid", "qvec", fanout = 4, beam = 8, hops = 3,
        descentHops = 2).count()
      runBatch() // warmup
      results("hnsw_batch_200q_serve") =
        math.min(time(runBatch()), time(runBatch()))

      // the INGEST op isolated from the q_hnsw_insert oracle row's
      // in-query build (the oracle must replay the build): a 10% batch
      // lands in the persisted 90% hierarchy — the continuously-
      // crawling pipeline's steady-state cost (maintained_retrain_op's
      // graph-family sibling)
      val exist = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
      val batch = e.filter(pmod(col("vec_id"), lit(10)) === 7)
      val icents = exist.filter(col("vec_id") < 18)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
      val ibuilt = Ann.hnswBuild(exist, icents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
      val iidx = new java.io.File(d, "ins_layers").getAbsolutePath
      Ann.writeHnswLayers(ibuilt, iidx)
      val ilayers = Ann.readHnswLayers(spark, iidx, maxLevel = 1)
      // build-time assignment sidecar, persisted partitioned by cell —
      // the steady-state ingest path (touched-cell partitions only)
      val iasg = new java.io.File(d, "ins_assigned").getAbsolutePath
      Ann.hnswAssignLevels(exist, icents, "vec_id", "embedding",
          "cent_id", "cvec", fanout = 4, maxLevel = 1)
        .zipWithIndex.foreach { case (a, i) =>
          a.write.partitionBy("cell_id").mode("overwrite")
            .parquet(s"$iasg/level_$i")
        }
      val iassigned = (0 to 1).map(i =>
        spark.read.parquet(s"$iasg/level_$i"))
      // deltaOnly: time the rows a refresh WRITES (new + re-ranked
      // adjacency), not a pass-through scan of the untouched edge list
      def runInsert(): Long = Ann.hnswInsert(ilayers, exist, batch,
        icents, "vec_id", "embedding", "cent_id", "cvec", k = 4,
        fanout = 4, deltaOnly = true,
        existingAssigned = iassigned).map(_.count()).sum
      runInsert() // warmup
      results("hnsw_insert_op") =
        math.min(time(runInsert()), time(runInsert()))

      // soft-delete SERVING twin: q_hnsw_delete is build-inclusive by
      // oracle necessity; this times the tombstone-filtered search
      // against the persisted src-sorted hierarchy alone
      val tomb = e.filter(pmod(col("vec_id"), lit(17)) === 3)
        .select(col("vec_id").as("id")).localCheckpoint(true)
      def runDel(): Long = Ann.hnswSearchDeleted(layers, e, "vec_id",
        "embedding", query, tomb, "id", fanout = 4, beam = 8, hops = 3,
        k = 5, descentHops = 2).count()
      runDel() // warmup
      results("hnsw_delete_serve") =
        math.min(time(runDel()), time(runDel()))

      // purge OP twin: the compact delta through the persisted
      // sidecar — the maintenance-window cost beside hnsw_insert_op
      // (q_hnsw_compact is build-inclusive). verifySidecar = false is
      // the steady-state path: the durable index maintains the
      // coverage invariant transactionally
      val ctomb = exist.filter(pmod(col("vec_id"), lit(17)) === 3)
        .select(col("vec_id").as("id")).localCheckpoint(true)
      def runCompact(): Long = Ann.hnswCompact(ilayers, exist, ctomb,
        "id", icents, "vec_id", "embedding", "cent_id", "cvec", k = 4,
        fanout = 4, deltaOnly = true, existingAssigned = iassigned,
        verifySidecar = false).map(_.count()).sum
      runCompact() // warmup
      results("hnsw_compact_op") =
        math.min(time(runCompact()), time(runCompact()))

      // the DURABLE refresh end to end: HnswIndex.ingest applies a
      // batch to the persisted bucketed index under the fence —
      // intent, touched-bucket rewrite, sidecar refresh, atomic
      // commit, GC. Epochs are one-shot (a replay skips), so the two
      // timed runs ingest the two halves of the 10% batch (~5% each)
      // into the same index and fold min; no warmup run exists for a
      // write-once op
      val midx = new java.io.File(d, "m_idx").getAbsolutePath
      graft.streaming.HnswIndex.build(spark, midx, exist, icents,
        "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4,
        maxLevel = 1)
      val mb1 = batch.filter(pmod(col("vec_id"), lit(20)) === 7)
      val mb2 = batch.filter(pmod(col("vec_id"), lit(20)) === 17)
      results("hnsw_refresh_op") = math.min(
        time(graft.streaming.HnswIndex.ingest(spark, midx, mb1)),
        time(graft.streaming.HnswIndex.ingest(spark, midx, mb2)))

      // durable SOFT-delete twin: the fenced tombstone-sidecar commit
      // (no data file touched) — two disjoint delete sets, fold min
      // (write-once epochs, the hnsw_refresh_op discipline)
      val sdt1 = exist.filter(pmod(col("vec_id"), lit(34)) === 3)
        .select(col("vec_id").as("id"))
      val sdt2 = exist.filter(pmod(col("vec_id"), lit(34)) === 20)
        .select(col("vec_id").as("id"))
      results("hnsw_softdelete_op") = math.min(
        time(graft.streaming.HnswIndex.softDelete(spark, midx, sdt1, "id")),
        time(graft.streaming.HnswIndex.softDelete(spark, midx, sdt2, "id")))

      // tombstone-honoring durable serve twin: beam over the persisted
      // hierarchy + broadcast anti-join + k-trim, deletes pending
      val sq = exist.filter(col("vec_id") === 42)
        .select(col("embedding")).head.getSeq[Float](0)
      def runSdServe(): Long = graft.streaming.HnswIndex.search(
        spark, midx, sq, beam = 8, hops = 3, k = 5).count()
      runSdServe() // warmup
      results("hnsw_sdserve_op") =
        math.min(time(runSdServe()), time(runSdServe()))

      // the VACUUM twin: purge everything pending + retire the sidecar
      // in one fenced transaction (write-once: single timed run)
      results("hnsw_vacuum_op") =
        time(graft.streaming.HnswIndex.purgeDeletes(spark, midx))

      // METADATA-FILTERED durable serve twin: beam + sidecar-metadata
      // join + pred + re-rank over a passthrough-carrying index
      val fidx = new java.io.File(d, "f_idx").getAbsolutePath
      val eLbl = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"), col("label"))
      graft.streaming.HnswIndex.build(spark, fidx, eLbl, icents,
        "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4,
        maxLevel = 1, passthrough = Seq("label"))
      def runFiltered(): Long = graft.streaming.HnswIndex.searchFiltered(
        spark, fidx, sq, pmod(col("label"), lit(2)) === 0, beam = 8,
        hops = 3, k = 5).count()
      runFiltered() // warmup
      results("hnsw_filtered_serve") =
        math.min(time(runFiltered()), time(runFiltered()))

      // GROUPED (RAG-page) durable serve twin: one beam walk + sidecar
      // group join + grouped ranking (q_hnsw_maintained_grouped is
      // build-inclusive by oracle necessity)
      def runGrouped(): Long = graft.streaming.HnswIndex.searchGrouped(
        spark, fidx, sq, "label", beam = 8, hops = 3, nGroups = 3,
        perGroup = 2).count()
      runGrouped() // warmup
      results("hnsw_grouped_serve") =
        math.min(time(runGrouped()), time(runGrouped()))

      // late-interaction MaxSim durable serve twin: pooled-query beam
      // candidates + exact slice-cosine re-rank over <= beam rows
      def runMaxSim(): Long = graft.streaming.HnswIndex.searchMaxSim(
        spark, midx, sq, nSlices = 4, beam = 8, hops = 3, k = 5).count()
      runMaxSim() // warmup
      results("hnsw_maxsim_serve") =
        math.min(time(runMaxSim()), time(runMaxSim()))

      // duplicate-query collapse twin: 200 queries over 10 unique
      // vectors — beam cost scales with UNIQUE vectors (compare
      // hnsw_batch_200q_serve, the all-distinct raw-operator face)
      val uniqVecs = exist.orderBy(col("vec_id")).limit(10)
        .select(col("embedding")).collect().map(_.getSeq[Float](0))
      val hot = (0 until 200).map(i => (i.toLong, uniqVecs(i % 10)))
        .toDF("qid", "qvec").localCheckpoint(true)
      // the PLAIN half of the pair: the same 200 hot slots through the
      // uncollapsed durable batch serve (the maintained_batch_hot2k
      // plain/collapsed pair discipline, on the graph index)
      def runHotPlain(): Long = graft.streaming.HnswIndex.searchBatch(
        spark, midx, hot, "qid", "qvec", beam = 8, hops = 3, k = 5)
        .count()
      runHotPlain() // warmup
      results("hnsw_hotbatch_serve") =
        math.min(time(runHotPlain()), time(runHotPlain()))
      def runCollapsed(): Long =
        graft.streaming.HnswIndex.searchBatchCollapsed(spark, midx, hot,
          "qid", "qvec", beam = 8, hops = 3, k = 5).count()
      runCollapsed() // warmup
      results("hnsw_collapsed_serve") =
        math.min(time(runCollapsed()), time(runCollapsed()))

      // predicate soft delete op twin (write-once epochs: two disjoint
      // predicates, fold min) — LAST in this section so the tombstones
      // it pends cannot color the serve twins above
      results("hnsw_sdwhere_op") = math.min(
        time(graft.streaming.HnswIndex.softDeleteWhere(spark, fidx,
          pmod(col("label"), lit(16)) === 1)),
        time(graft.streaming.HnswIndex.softDeleteWhere(spark, fidx,
          pmod(col("label"), lit(16)) === 3)))
    }

    // -------- 2. headline analytics / dedup queries ---------------------
    // warmup once (codegen compile + page cache), then best of two timed
    // runs: a stop-the-world GC landing on a random query otherwise
    // distorts a single-shot measurement by seconds
    // optional args restrict the run to the named queries (dev iteration);
    // the driver invokes with no args -> full headline sweep
    val picked = if (args.nonEmpty) headline.filter(args.toSet) else headline
    picked.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try {
          // stderr breadcrumb so any mid-census log line (codegen
          // fallback, GC warning) attributes to a query by position
          System.err.println(s"[bench] running $name")
          materialize(fn(spark, sfDir)) // warmup
          // collect garbage from the warmup OUTSIDE the timed window: a
          // stop-the-world pause from earlier allocation otherwise lands
          // inside both timed runs and best-of-2 can't damp it.
          // Quiesce first: the GC lets ContextCleaner reap warmup
          // accumulators, and any task-completion event still in flight
          // would then log a (benign) accessNonExistentAccumulatorError
          // stack inside the measurement window
          org.apache.spark.sql.GraftShim.waitForListenerBus(spark)
          Thread.sleep(50)
          System.gc()
          results(name) = math.min(
            time(materialize(fn(spark, sfDir))),
            time(materialize(fn(spark, sfDir))))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          results(name) = -1.0
        }
      }
    }

    // -------- 3. skew-join evidence: plain vs salted vs AQE --------------
    // One hot key carrying ~90% of an 8×-replicated lineitem (the power-law
    // domain of a web corpus): a plain shuffle join lands ~4.3M rows on ONE
    // reducer while 31 cores idle. Broadcast is disabled for all three runs
    // to model the big⋈big case where salting is the tool; AQE's runtime
    // skew-join split is measured beside explicit salting.
    if (sectionOn("skew")) {
      val li = Tables.load(spark, sfDir, "lineitem")
        .withColumn("rep", explode(sequence(lit(0), lit(7))))
        .withColumn("k",
          when(pmod(col("l_orderkey"), lit(10)) < 9, lit(1L))
            .otherwise(col("l_orderkey")))
        .select(col("k"), col("l_extendedprice"), col("l_discount"),
          col("l_linenumber"), col("l_orderkey"), col("rep"))
        // the fixture parquet is one row-group → one scan partition; spread
        // BEFORE caching so the shuffle write is parallel in all variants
        // and the reduce-side straggler is the only difference
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
      li.count()
      val o = Tables.load(spark, sfDir, "orders")
        .withColumn("k",
          when(pmod(col("o_orderkey"), lit(10)) < 9, lit(1L))
            .otherwise(col("o_orderkey")))
        .select(col("k"), col("o_orderpriority"))
        // pre-dedup the right side: the hot key must stay unique on the
        // dim side or the join itself becomes a cross-product blow-up
        .groupBy(col("k")).agg(first(col("o_orderpriority")).as("o_orderpriority"))
        .persist()
      o.count()
      def agg(j: DataFrame): Unit = {
        j.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)), sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .collect()
        ()
      }
      def withConf(pairs: (String, String)*)(body: => Double): Double = {
        val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
        pairs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body
        finally olds.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      def plainRun(): Unit = agg(li.join(o, "k"))
      def saltedRun(): Unit = agg(graft.operators.SkewJoin.saltedInnerJoin(
        li, o, li("k"), o("k"), 16,
        xxhash64(col("l_orderkey"), col("l_linenumber"), col("rep"))))
      val noBcastNoAqe = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false")
      results("skew_plain_join") = withConf(noBcastNoAqe: _*) {
        plainRun(); math.min(time(plainRun()), time(plainRun()))
      }
      results("skew_salted_join") = withConf(noBcastNoAqe: _*) {
        saltedRun(); math.min(time(saltedRun()), time(saltedRun()))
      }
      results("skew_aqe_join") = withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
        // without force, OptimizeSkewedJoin declines when the downstream
        // agg would need an extra shuffle anyway — give AQE its best shot
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
        plainRun(); math.min(time(plainRun()), time(plainRun()))
      }
      li.unpersist()
      o.unpersist()
    }

    val timed = results.filter { case (k, v) => v >= 0 && !k.startsWith("vector_seq_qps") }
    val total = timed.values.sum
    // queries sorted BY NAME: the driver's artifact capture keeps only
    // the output tail, so a name-sorted map gives a stable cross-round
    // diff window; the full map additionally lands in
    // target/bench_full.json (committed per round as BENCH_FULL_r{N}
    // .json) so every query is regression-trackable regardless of
    // truncation.
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_full.json"), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_full.json write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
