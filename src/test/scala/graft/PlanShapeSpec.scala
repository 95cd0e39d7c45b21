package graft

/** Physical-plan shape pins for the crawl-front + TPC-H sweep queries —
  * the properties that make them survive a 100× scale-up, asserted so a
  * future edit that silently regresses the plan fails here.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // deterministic plan strings
    try SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q6_revenue: every predicate reaches the parquet scan, aggregate is two-phase") {
    val p = plan("q6_revenue")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"),
      s"all three predicates must push to the scan, got: $pushed")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "sum must partial-aggregate map-side before the gather")
  }

  test("q18_large_orders: top-100 is TakeOrderedAndProject, no cartesian") {
    val p = plan("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must be a partial top-k, not a global sort + limit")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_keep_best: survivor selection is Window-free") {
    // the per-cluster argmax must stay a map-side-combinable aggregate —
    // a row_number window would sort-serialize the biggest cluster
    val p = plan("q_dedup_keep_best")
    assert(!p.contains("Window"), "keepBestPerCluster must not plan a Window")
  }

  test("q_domain_gate: bounded domain stats broadcast back onto the scan") {
    val p = plan("q_domain_gate")
    assert(p.contains("BroadcastHashJoin"),
      "the domain gate must be a map-side broadcast probe")
  }

  test("url/domain queries: no cartesian anywhere") {
    for (q <- Seq("q_url_canonical", "q_url_dedup", "q_domain_stats")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q plans a cartesian")
    }
  }

  test("q7_volume: nation filter pushes to its scan and prunes via broadcast joins") {
    val p = plan("q7_volume")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("n_name"),
      s"the two-nation filter must reach the nation scan, got: $pushed")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "both nation aliases must broadcast into their dimensions")
    assert(!p.contains("CartesianProduct"))
  }

  test("q8_market_share: part/region filters push to their scans, no cartesian") {
    val p = plan("q8_market_share")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("p_type") && pushed.contains("r_name"),
      s"part-type and region filters must push to their scans, got: $pushed")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sft_pipeline: no cartesian beyond intended broadcasts; packing is the only window") {
    val p = plan("q_sft_pipeline")
    assert(!p.contains("CartesianProduct"), s"cartesian in sft pipeline:\n$p")
    // exactly one Window: packSequences' per-source cumsum — the render
    // and curation stages must stay window-free
    val windows = "Window".r.findAllIn(p).size
    assert(windows == 1, s"expected exactly 1 window (packing), got $windows")
  }

  test("q_jaro_linkage and q_inbatch_negatives: equi-joins only, no cartesian") {
    for (q <- Seq("q_jaro_linkage", "q_inbatch_negatives")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay equi-join only:\n$p")
    }
  }

  test("q_ppl_buckets: model/stats/bounds all broadcast, corpus never sorts") {
    val p = plan("q_ppl_buckets")
    // per-lang model, unseen floor, and tercile bounds each join broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"model/unseen/bounds must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    // the only Sort allowed is the query's final orderBy presentation
    assert(!p.contains("Window"), "bucketing must not plan a window")
  }

  test("q_bleu_pairs: metric adds no exchange beyond the pairing window") {
    val p = plan("q_bleu_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"bleu scoring must be join-free:\n$p")
    // one Window: the lead() pair construction; the metric itself is
    // per-row HOF compute
    assert("Window".r.findAllIn(p).size == 1, s"expected 1 window:\n$p")
  }

  test("q_semantic_chunks: zero joins and zero aggregates — per-row compute only") {
    val p = plan("q_semantic_chunks")
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("HashAggregate"), s"segmentation must stay per-row:\n$p")
  }

  test("q_rouge_pairs: LCS scoring is join-free; the pairing window is the only exchange") {
    val p = plan("q_rouge_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"rougeL scoring must be join-free:\n$p")
    assert("Window".r.findAllIn(p).size == 1, s"expected 1 window:\n$p")
    assert(p.contains("lcslength"), s"the native LCS kernel must be in the plan:\n$p")
  }

  test("q_excess_ppl: both LM model probes broadcast, corpus never sorts") {
    val p = plan("q_excess_ppl")
    // two scoring passes, each a broadcast model probe
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both LM probes must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the corpus must never shuffle-sort for a bounded model:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
  }

  test("q_leakage_split: gate is scan-speed hash arithmetic — no window, no cartesian") {
    val p = plan("q_leakage_split")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
    assert(!p.contains("Window"),
      s"split routing must not serialize through a window:\n$p")
  }

  test("q_kcore final degree count partial-aggregates before the gather") {
    val p = plan("q_kcore")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"degree count must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
  }

  test("q_sentence_align: per-row kernel compute — no joins, no window") {
    val p = plan("q_sentence_align")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"alignment is per-row; nothing may join:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    // only the explicit spread() repartition and the output ordering may
    // exchange — a third exchange means staged arrays leaked a shuffle
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"only spread + final orderBy may exchange:\n$p")
  }

  test("q_rbo_rankers: broadcast cross score, k-bounded two-phase top-k, no window") {
    val p = plan("q_rbo_rankers")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the bounded query set must broadcast against the corpus scan")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the corpus must never shuffle-sort against the query set:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      "per-(query, ranker) top-10 must be the two-phase TopKAggregator")
    assert(!p.contains("Window"),
      s"rankings come from the k-bounded aggregate, not row_number:\n$p")
  }

  test("q2_min_cost_supp: correlated min plans as agg + joins, filters push, no cartesian") {
    val p = plan("q2_min_cost_supp")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("p_type") && pushed.contains("r_name"),
      s"part-type and region filters must push to their scans, got: $pushed")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
    // the per-(part, supplier) cost and the per-part min are both
    // two-phase aggregates; the "subquery" is a join, not a re-scan
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"both aggregates must partial-combine map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must be a partial top-k, not a global sort + limit")
  }

  test("q20_surplus_suppliers: nested INs plan as semi-joins, name filter pushes") {
    val p = plan("q20_surplus_suppliers")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("p_name") && pushed.contains("r_name"),
      s"part-name prefix and region filters must push, got: $pushed")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"both IN levels must plan as semi-joins:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
  }

  test("q21_waiting_suppliers: EXISTS rewrite stays window-free with broadcast dims") {
    val p = plan("q21_waiting_suppliers")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"no cartesian:\n$p")
    assert(!p.contains("Window"),
      s"the per-order rollup must be an aggregate, not a window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the region-filtered supplier dim must broadcast")
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 must be a partial top-k")
  }

  test("hierarchy queries: no cartesian, no window — equi-joins and aggregates only") {
    for (q <- Seq("q_tree_closure", "q_subtree_sizes")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q plans a cartesian:\n$p")
      assert(!p.contains("Window"), s"$q must stay window-free:\n$p")
    }
  }

  test("media pair queries: no cartesian, no window — capped bucket joins only") {
    for (q <- Seq("q_video_dedup", "q_audio_dedup", "q_image_dedup",
        "q_dhash_neardup")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must never plan a cartesian:\n$p")
      assert(!p.contains("Window"),
        s"$q pair generation must stay window-free:\n$p")
    }
  }

  // AQE-ON twins for the headline queries: PlanShapeSpec pins plans with
  // AQE off for deterministic strings, but production runs AQE on —
  // broadcast-threshold decisions and skew-join splitting can change
  // shapes, so the scale-critical properties are asserted in BOTH modes.
  private def aqePlan(name: String): String = {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = SparkEntry.queries(name)(spark, sf0001)
      // materialize so AQE finalizes every stage, then read the final plan
      df.queryExecution.executedPlan.executeCollect()
      df.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("AQE-on twins: headline plans keep their scale properties under adaptive execution") {
    val p6 = aqePlan("q6_revenue")
    assert(p6.linesIterator.filter(_.contains("PushedFilters")).mkString
        .contains("l_shipdate"), "q6 predicates must still push under AQE")
    assert("HashAggregate".r.findAllIn(p6).size >= 2)

    val p18 = aqePlan("q18_large_orders")
    assert(p18.contains("TakeOrderedAndProject") &&
      !p18.contains("CartesianProduct"))

    val pk = aqePlan("q_dedup_keep_best")
    assert(!pk.contains("Window"),
      "keepBestPerCluster must stay window-free under AQE")

    val pg = aqePlan("q_domain_gate")
    assert(pg.contains("BroadcastHashJoin"),
      "the domain gate must stay a broadcast probe under AQE")

    val pc = aqePlan("q_curation")
    assert(!pc.contains("CartesianProduct") && !pc.contains("Window"),
      s"curation must stay cartesian- and window-free under AQE:\n$pc")
  }

  test("AQE-on twins: capped pair-engine queries keep star/small routing, no cartesian, no window") {
    // skew-join splitting is exactly the runtime optimization that could
    // re-shape star-pair joins — assert the scale properties survive it
    for (q <- Seq("q_dhash_neardup", "q_video_dedup_e2e", "q_audio_dedup")) {
      val p = aqePlan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must never plan a cartesian under AQE:\n$p")
      assert(!p.contains("Window"),
        s"$q pair generation must stay window-free under AQE:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
        p.contains("ShuffledHashJoin"),
        s"$q candidate/verify joins must stay equi-joins under AQE:\n$p")
    }
  }

  test("AQE-on twins: semantic decontamination broadcasts the eval side, never cartesians, stays window-free") {
    val p = aqePlan("q_semantic_decontaminate")
    assert(!p.contains("CartesianProduct"),
      s"decontamination must never cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the eval-probe routing must stay a broadcast equi-join under AQE")
    // the per-train best match is the k-bounded aggregator, not a window
    // over all candidates; the ONE window in the plan is probe selection
    // over the (centroids × eval) cross — bounded by index × benchmark
    // size, never the train corpus
    assert(p.contains("topkaggregator"),
      "best-match selection must be the k-bounded aggregator under AQE")
    // the AQE string prints Final + Initial plans — count nodes in the
    // final section only
    val finalP = p.split("== Initial Plan ==").head
    assert(finalP.linesIterator.count(_.contains("Window [")) <= 1,
      s"only the bounded probe-selection window node is allowed:\n$finalP")
  }

  test("q_maintained_recall: the exact side is ONE scan against the broadcast query batch, k-bounded reduction") {
    val p = plan("q_maintained_recall")
    // the only acceptable product is the deliberate (row × broadcast
    // query-batch) scoring cross — bounded by the benchmark-sized batch
    assert(!p.contains("CartesianProduct") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"exact side must score against a broadcast batch:\n$p")
    assert(!p.contains("Window"),
      "both rankings reduce through the k-bounded aggregator, not a window")
  }

  test("OPERATORS.md never references a query that does not exist") {
    // doc-drift guard: every q_/qN oracle name cited in OPERATORS.md must
    // be a real SparkEntry.queries key (rows describing spec-only
    // operators cite suites, not query names, so this stays exact)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("OPERATORS.md")), "UTF-8")
    val cited = "`(q[0-9]*_[a-z0-9_]+)`".r.findAllMatchIn(text)
      .map(_.group(1)).toSet
    val known = SparkEntry.queries.keySet
    val ghosts = cited.diff(known)
    assert(ghosts.isEmpty, s"OPERATORS.md cites nonexistent queries: $ghosts")
  }

  test("REVERSE census: every SparkEntry.queries key appears in OPERATORS.md") {
    // the component table must provably COVER the oracle suite — an
    // implemented-but-undocumented query is coverage the inventory
    // can't account for (the forward test above catches the opposite
    // drift: documented-but-unimplemented)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("OPERATORS.md")), "UTF-8")
    val cited = "`(q[0-9]*_[a-z0-9_]+)`".r.findAllMatchIn(text)
      .map(_.group(1)).toSet
    val orphans = SparkEntry.queries.keySet.diff(cited)
    assert(orphans.isEmpty,
      s"queries missing from the OPERATORS.md census: ${orphans.toSeq.sorted}")
  }
}
