package graft

import org.apache.spark.sql.functions._
import graft.expressions.FloatVectorExpressions.dotF
import graft.functions.{VectorFunctions => V}
import graft.operators.{Ann, TopK}

class AnnSpec extends SparkSpec {

  private lazy val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val cents = e.filter(col("vec_id") < 16)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  test("ivfAssign assigns every vector to its max-cosine centroid") {
    import spark.implicits._
    val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
    assert(assigned.count() == e.count())
    // brute-force argmax via window on the cross product, quantized the same way
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("c", round(V.cosine($"embedding", $"cvec"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"vec_id").orderBy($"c".desc, $"cent_id".asc)
    val brute = scored.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"cent_id".as("cell_id"))
    val diff = assigned.select("vec_id", "cell_id")
      .exceptAll(brute).count()
    assert(diff == 0)
  }

  test("ivfAssign plan is a pure projection: no Exchange, no Window, no Join") {
    val assigned = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
    assigned.count() // materialize through AQE so executedPlan is final
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
    assert(!plan.contains("Window"), s"assignment must not window-sort:\n$plan")
    assert(!plan.contains("Join"), s"assignment must not join:\n$plan")
  }

  test("probing ALL cells is exact: equals brute-force top-k") {
    import spark.implicits._
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val viaAnn = Ann.search(e, cents, "vec_id", "embedding", "cent_id", "cvec",
      query, nProbes = 16, k = 10).collect().map(_.getLong(0)).toSeq
    val brute = TopK.topK(
      e.withColumn("score", V.cosine($"embedding", typedLit(query))),
      $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSeq
    assert(viaAnn == brute)
  }

  test("searchFactory: every spec returns a k-ranking; FLAT is exact; full-probe IVF == FLAT") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val q = e.filter($"vec_id" === 17).head.getSeq[Float](1)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq
    val flat = Ann.searchFactory("FLAT", e, "vec_id", "embedding", q, 10)
    val brute = TopK.topK(
      e.withColumn("score", V.cosine($"embedding", typedLit(q))),
      $"score", $"vec_id", 10)
    assert(ids(flat) == ids(brute))
    assert(ids(flat).head == 17L) // self-match first
    // IVF probing every cell is exact search
    val ivfAll = Ann.searchFactory("IVF8", e, "vec_id", "embedding", q, 10,
      nProbes = 8)
    assert(ids(ivfAll) == ids(flat))
    // quantized tiers: right shape, k rows, descending scores
    Seq("IVF8", "PQ8", "SQ8", "IVF8,PQ8").foreach { spec =>
      val r = Ann.searchFactory(spec, e, "vec_id", "embedding", q, 10)
        .collect()
      assert(r.length == 10, spec)
      val scores = r.map(_.getDouble(1)).toSeq
      assert(scores == scores.sorted.reverse, s"$spec not ranked")
    }
    // SQ8 is near-lossless on the fixture: self-match survives
    assert(ids(Ann.searchFactory("SQ8", e, "vec_id", "embedding", q, 10))
      .contains(17L))
    intercept[IllegalArgumentException](
      Ann.searchFactory("HNSW32", e, "vec_id", "embedding", q, 10))
  }

  test("searchBatchIvf: full probes = per-query brute force; partial probes lose only recall") {
    import spark.implicits._
    val qs = e.filter($"vec_id" % 100 === 42)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Ann.searchBatchIvf(e, cents, "vec_id", "embedding",
      "cent_id", "cvec", qs, "qid", "qvec", nProbes = 16, k = 5)
    // brute force per query: broadcast cross + quantized score + window top-5
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"score".desc, $"vec_id")
    val brute = e.crossJoin(broadcast(qs))
      .withColumn("score", round(V.cosine($"embedding", $"qvec"), 6) + lit(0.0))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"qid", $"vec_id", $"score")
    assert(exact.exceptAll(brute).count() == 0 &&
      brute.exceptAll(exact).count() == 0)
    // partial probes: each query's own nearest (itself, score 1.0) lives
    // in its probed home cell, so the self-match always survives
    val approx = Ann.searchBatchIvf(e, cents, "vec_id", "embedding",
      "cent_id", "cvec", qs, "qid", "qvec", nProbes = 4, k = 5)
    val self = approx.filter($"qid" === $"vec_id").count()
    assert(self == qs.count(), "self-match must survive probing")
    // scale shape: probe table broadcasts; no corpus-sized exchange
    // beyond the per-query top-k window
    val plan = exact.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("recallAtK: distributed per-query overlap matches hand computation") {
    import spark.implicits._
    // q1: exact {1,2,3}, approx {2,3,9} → 2/3; q2: exact {4,5}, approx
    // hits none → 0; q3: exact {7}, approx {7} → 1
    val exact = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L), (3L, 7L))
      .toDF("qid", "id")
    val approx = Seq((1L, 2L), (1L, 3L), (1L, 9L), (2L, 8L), (3L, 7L))
      .toDF("qid", "id")
    val r = Ann.recallAtK(exact, approx, "qid", "id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((3L, 2L, 0.666667)))
    assert(r(2L) == ((2L, 0L, 0.0)))
    assert(r(3L) == ((1L, 1L, 1.0)))
  }

  test("k-means-trained centroids lift recall@10 at 4/16 probes on clustered data") {
    // The parquet fixture embeddings are isotropic random (same-label and
    // cross-label cosine both ~0, top-10 neighbor label purity ~9% =
    // chance), so IVF recall there is bounded by the probe fraction no
    // matter how good the centroids are — an ideal k-means moves nothing.
    // Train/measure on a clustered corpus instead, where centroid quality
    // is what determines recall.
    import spark.implicits._
    val data = graft.sources.Synthetic
      .clusteredUnitVectors(spark, n = 2000, dim = 32, k = 16, spread = 0.8)
      .select($"vec_id", $"embedding")
    data.persist().count()
    val init = data.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    val trained = Ann.kmeansTrain(data, "vec_id", "embedding", c = 16, iters = 3)
    assert(trained.count() == 16)
    val queries = (0L until 200L by 10L).toSeq
    def recallWith(cdf: org.apache.spark.sql.DataFrame): Double = {
      val recalls = queries.map { qid =>
        val query = data.filter($"vec_id" === qid).head.getSeq[Float](1)
        val ann = Ann.search(data, cdf, "vec_id", "embedding", "cent_id", "cvec",
          query, nProbes = 4, k = 10).collect().map(_.getLong(0)).toSet
        val brute = TopK.topK(
          data.withColumn("score", V.cosine($"embedding", typedLit(query))),
          $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSet
        (ann & brute).size.toDouble / brute.size
      }
      recalls.sum / recalls.size
    }
    val rTrained = recallWith(trained)
    val rInit = recallWith(init)
    data.unpersist()
    info(f"clustered recall@10 at 4/16 probes: trained $rTrained%.2f vs first-C init $rInit%.2f")
    assert(rTrained >= rInit + 0.05,
      f"training must materially lift recall ($rTrained%.2f vs $rInit%.2f)")
    assert(rTrained >= 0.9, f"trained recall collapsed: $rTrained%.2f")
  }

  test("PQ: codes well-formed, ADC matches a driver-side recompute, recall measured") {
    import spark.implicits._
    val cb = e.filter($"vec_id" < 16).orderBy($"vec_id")
      .select($"embedding").collect().map(_.getSeq[Float](0)).toSeq
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val lut = Ann.pqLut(query, cb, 8)
    // native kernel ⇄ HOF spec agreement over the whole fixture
    val disagree = e.select(
        Ann.pqEncode($"embedding", cb, 8).as("n"),
        Ann.pqEncodeHof($"embedding", cb, 8).as("h"))
      .filter($"n" =!= $"h").count()
    assert(disagree == 0L, "native PqEncode must match the HOF spec")
    val coded = e.withColumn("codes", Ann.pqEncode($"embedding", cb, 8))
      .withColumn("score", Ann.pqAdcScore($"codes", lut))
      .select($"vec_id", $"codes", $"score").collect()
    // structure: 8 codes per vector, each in [0, 16)
    coded.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16), r)
    }
    // a codebook row's own subslices are distance 0 → encodes to itself
    val self = coded.find(_.getLong(0) == 5L).get.getSeq[Int](1)
    assert(self == Seq.fill(8)(5), s"vec 5 must self-encode, got $self")
    // ADC score == driver-side LUT sum over the emitted codes
    coded.foreach { r =>
      val want = BigDecimal(
        r.getSeq[Int](1).zipWithIndex.map { case (c, mi) => lut(mi)(c) }.sum.toDouble
          / 1000000.0).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == want, r)
    }
    // recall vs exact dot top-10 — informational + floor
    val pqTop = coded.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      .take(10).map(_.getLong(0)).toSet
    val brute = TopK.topK(
      e.withColumn("score", V.cosine($"embedding", typedLit(query))),
      $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSet
    val recall = (pqTop & brute).size.toDouble / brute.size
    info(f"PQ ADC recall@10 (16-entry first-vector codebooks, isotropic fixture): $recall%.2f")
    assert(pqTop.contains(42L), "the query's own vector must surface")
  }

  test("SQ8: codes in range, reconstruction within one step, high recall vs exact") {
    import spark.implicits._
    val (mn, mx) = Ann.sqTrain(e, "embedding")
    assert(mn.length == 64 && mx.length == 64)
    assert(mn.zip(mx).forall { case (a, b) => a <= b })
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val coded = e
      .withColumn("codes", Ann.sqEncode($"embedding", mn, mx))
      .withColumn("score", Ann.sqDot($"codes", query, mn, mx))
      .select($"vec_id", $"codes", $"embedding", $"score").collect()
    // every code in [0, 255]; midpoint dequant within one step of the original
    coded.foreach { r =>
      val cs = r.getSeq[Long](1)
      val vs = r.getSeq[Float](2)
      assert(cs.length == 64 && cs.forall(c => c >= 0 && c <= 255), r)
      cs.indices.foreach { d =>
        val step = (mx(d) - mn(d)) / 255.0
        val deq = mn(d) + (cs(d) + 0.5) * (mx(d) - mn(d)) / 255.0
        assert(math.abs(deq - vs(d)) <= math.max(step, 1e-9),
          s"dim $d deq $deq vs ${vs(d)} step $step")
      }
    }
    // SQ8 ranking ≈ exact dot ranking (4x compression should be near-lossless)
    val sqTop = coded.sortBy(r => (-r.getDouble(3), r.getLong(0)))
      .take(10).map(_.getLong(0)).toSet
    val brute = TopK.topK(
      e.withColumn("score", round(dotF($"embedding", typedLit(query)), 6)),
      $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSet
    val recall = (sqTop & brute).size.toDouble / brute.size
    info(f"SQ8 recall@10 vs exact dot: $recall%.2f")
    assert(recall >= 0.8, s"SQ8 recall@10 $recall below 0.8")
    assert(sqTop.contains(42L), "the query's own vector must surface")
  }

  test("searchIvfPq with all cells probed equals the full-scan PQ ADC ranking") {
    import spark.implicits._
    val cb = e.filter($"vec_id" < 16).orderBy($"vec_id")
      .select($"embedding").collect().map(_.getSeq[Float](0)).toSeq
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val lut = Ann.pqLut(query, cb, 8)
    // probing every cell removes the IVF approximation: result must be
    // exactly the full PQ scan's top-k
    val full = TopK.topK(
        e.withColumn("codes", Ann.pqEncode($"embedding", cb, 8))
          .withColumn("score", Ann.pqAdcScore($"codes", lut)),
        $"score", $"vec_id", 10)
      .select($"vec_id", $"score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivfpqAll = Ann.searchIvfPq(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", cb, 8, query, nProbes = 16, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfpqAll == full)
    // 4/16 probes: approximate, but the query's own vector must surface
    val ivfpq4 = Ann.searchIvfPq(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", cb, 8, query, nProbes = 4, k = 10)
      .collect().map(_.getLong(0))
    assert(ivfpq4.contains(42L))
    val recall = (ivfpq4.toSet & full.map(_._1).toSet).size.toDouble / full.size
    info(f"IVF-PQ recall@10 vs full PQ at 4/16 probes: $recall%.2f")
  }

  test("recall@10 with 4/16 probes is useful and measured") {
    import spark.implicits._
    val queries = Seq(42L, 7L, 100L, 250L, 333L)
    val recalls = queries.map { qid =>
      val query = e.filter($"vec_id" === qid).head.getSeq[Float](1)
      val ann = Ann.search(e, cents, "vec_id", "embedding", "cent_id", "cvec",
        query, nProbes = 4, k = 10).collect().map(_.getLong(0)).toSet
      val brute = TopK.topK(
        e.withColumn("score", V.cosine($"embedding", typedLit(query))),
        $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSet
      (ann & brute).size.toDouble / brute.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@10 at 4/16 probes: $mean%.2f (${recalls.map(r => f"$r%.1f").mkString(", ")})")
    assert(mean >= 0.5, s"recall collapsed: $recalls")
  }

  test("knnJoin: neighbors stay within the cell, k-bounded, self excluded") {
    import spark.implicits._
    // two well-separated clusters around e1 and e2 axes
    def v(main: Int, eps: Float): Seq[Float] =
      Seq.tabulate(4)(i => (if (i == main) 1.0f else 0.0f) +
        (if (i == 3) eps else 0.0f))
    val vecs = Seq(
      (0L, v(0, 0.00f)), (1L, v(0, 0.01f)), (2L, v(0, 0.02f)), (3L, v(0, 0.03f)),
      (10L, v(1, 0.00f)), (11L, v(1, 0.01f)), (12L, v(1, 0.02f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((100L, v(0, 0.0f)), (200L, v(1, 0.0f)))
      .toDF("cent_id", "cvec")
    val got = graft.operators.Ann.knnJoin(vecs, cents, "vec_id", "embedding",
        "cent_id", "cvec", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    val bySrc = got.groupBy(_._1)
    assert(bySrc.keySet == Set(0L, 1L, 2L, 3L, 10L, 11L, 12L))
    bySrc.foreach { case (src, edges) =>
      assert(edges.size <= 2, s"k bound violated for $src")
      assert(!edges.exists(_._2 == src), s"self edge for $src")
      val sameCluster = if (src < 10) Set(0L, 1L, 2L, 3L) else Set(10L, 11L, 12L)
      edges.foreach { case (_, dst) =>
        assert(sameCluster.contains(dst), s"$src -> $dst crossed cells")
      }
    }
  }

  test("rankQualityAtK: hand-checked nDCG and MRR, no-hit query scores zero") {
    import spark.implicits._
    // exact top-3 per query; approx q1 finds ids 1,3 at ranks 1,3 (miss 2),
    // q2 finds nothing relevant
    val exact = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 7L), (2L, 8L), (2L, 9L))
      .toDF("qid", "vec_id")
    val approx = Seq(
      (1L, 1L, 0.9), (1L, 99L, 0.8), (1L, 3L, 0.7),
      (2L, 50L, 0.9), (2L, 51L, 0.8))
      .toDF("qid", "vec_id", "score")
    val got = graft.operators.Ann.rankQualityAtK(exact, approx, "qid", "vec_id", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def m(r: Int) = math.round(1e6 * math.log(2.0) / math.log(r + 1.0))
    val ndcg1 = BigDecimal((m(1) + m(3)).toDouble / (m(1) + m(2) + m(3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, 2L, ndcg1, 1.0)), s"got ${got(1L)}")
    assert(got(2L) == ((3L, 0L, 0.0, 0.0)), "no hits → zero ndcg and mrr")
  }

  test("graphBeamSearch: walks the kNN graph toward the query, beats the entry point") {
    import spark.implicits._
    import graft.operators.Ann
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val edges = Ann.knnJoin(e, cents, "vec_id", "embedding",
      "cent_id", "cvec", 4).localCheckpoint(false)
    val query = e.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val beam = Ann.graphBeamSearch(edges, e, "vec_id", "embedding",
      query, beam = 8, hops = 3).collect()
    assert(beam.length == 8)
    assert(beam.map(_.getInt(0)).toSeq == (1 to 8))
    // scores sorted best-first; the walk found the query itself or its
    // close neighbors — far better than the entry point's own score
    val scores = beam.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val entryScore = Ann.graphBeamSearch(edges, e, "vec_id", "embedding",
      query, beam = 1, hops = 0).head.getDouble(2)
    assert(scores.head > entryScore,
      s"beam head ${scores.head} must beat the raw entry $entryScore")
    // hops=0 returns exactly the entry point
    assert(Ann.graphBeamSearch(edges, e, "vec_id", "embedding", query,
      8, 0).count() == 1)
    // deterministic across partitioning
    val again = Ann.graphBeamSearch(edges.repartition(7), e.repartition(5),
      "vec_id", "embedding", query, 8, 3).collect().map(_.toSeq).toSeq
    assert(again == beam.map(_.toSeq).toSeq)
    // the BATCHED walk agrees with the single-query walk per qid
    val queries = e.filter(col("vec_id").isin(42L, 137L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = Ann.graphBeamSearchBatch(edges, e, queries, "vec_id",
        "embedding", "qid", "qvec", 8, 3)
      .collect().groupBy(_.getLong(0))
    Seq(42L, 137L).foreach { qid =>
      val qv = e.filter(col("vec_id") === qid)
        .select(col("embedding")).head.getSeq[Float](0)
      val single = Ann.graphBeamSearch(edges, e, "vec_id", "embedding",
        qv, 8, 3).collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      val b = batch(qid).sortBy(_.getInt(1))
        .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(b == single.toSeq, s"qid $qid: batch $b vs single ${single.toSeq}")
    }
  }

  test("searchFiltered routes narrow→pre (exact) and broad→post (⊆ probed cells)") {
    import spark.implicits._
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    // narrow: label=5 is ~10% < 4/16 probed fraction → pre, and pre is
    // EXACT: must equal brute-force top-k over the filtered rows
    val pre = Ann.searchFiltered(e, cents, "vec_id", "embedding", "cent_id",
      "cvec", query, 10, $"label" === 5, 4).collect()
    assert(pre.forall(_.getString(2) == "pre"))
    val brute = TopK.topK(
      e.filter($"label" === 5)
        .withColumn("score", round(V.cosine($"embedding", typedLit(query)), 6)),
      $"score", $"vec_id", 10).collect().map(_.getLong(0)).toSeq
    assert(pre.map(_.getLong(0)).toSeq == brute)
    // broad: even labels ~50% > 25% → post; every hit must sit in a
    // probed cell AND satisfy the predicate
    val post = Ann.searchFiltered(e, cents, "vec_id", "embedding", "cent_id",
      "cvec", query, 10, $"label" % 2 === 0, 4).collect()
    assert(post.nonEmpty && post.forall(_.getString(2) == "post"))
    val probes = Ann.probeCellIds(cents, query, "cent_id", "cvec", 4).toSet
    val cellOf = Ann.ivfAssign(e, cents, "vec_id", "embedding", "cent_id", "cvec")
      .select($"vec_id", $"cell_id", $"label").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    post.foreach { r =>
      val (cell, label) = cellOf(r.getLong(0))
      assert(probes.contains(cell), s"hit ${r.getLong(0)} outside probed cells")
      assert(label % 2 == 0, s"hit ${r.getLong(0)} violates the predicate")
    }
  }

  test("searchFiltered: knownSelectivity overrides the scan, and post can starve") {
    import spark.implicits._
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    // force the post path onto a narrow predicate: fewer than k survivors
    // may remain inside the probed cells — the starvation regime the
    // switch normally routes to pre (which cannot starve)
    val forced = Ann.searchFiltered(e, cents, "vec_id", "embedding", "cent_id",
      "cvec", query, 10, $"label" === 5, 4, knownSelectivity = Some(0.9))
      .collect()
    assert(forced.forall(_.getString(2) == "post"))
    val exactN = Ann.searchFiltered(e, cents, "vec_id", "embedding", "cent_id",
      "cvec", query, 10, $"label" === 5, 4).collect().length
    assert(forced.length <= exactN,
      s"post path returned ${forced.length} > pre's $exactN for the same ask")
    // and the reverse override: a broad predicate forced onto pre stays exact
    val forcedPre = Ann.searchFiltered(e, cents, "vec_id", "embedding",
      "cent_id", "cvec", query, 10, $"label" % 2 === 0, 4,
      knownSelectivity = Some(0.01)).collect()
    assert(forcedPre.forall(_.getString(2) == "pre"))
    assert(forcedPre.length == 10)
  }

  test("searchNamespacedBatch: structural tenant isolation; full probe == exact per namespace") {
    import spark.implicits._
    val qs = e.filter($"vec_id" % 100 === 42)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qns"))
    val hits = Ann.searchNamespacedBatch(e, cents, "vec_id", "embedding",
      "label", "cent_id", "cvec", qs, "qid", "qvec", "qns", nProbes = 16, k = 5)
    val nsOf = e.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qns = qs.select($"qid", $"qns").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = hits.collect()
    assert(got.nonEmpty)
    // isolation: every hit lives in its query's namespace
    got.foreach { r =>
      assert(nsOf(r.getLong(1)) == qns(r.getLong(0)),
        s"qid ${r.getLong(0)} leaked a hit from namespace ${nsOf(r.getLong(1))}")
    }
    // probing ALL cells makes the namespace search exact: per query it
    // must equal brute-force top-k within the namespace
    val byQ = got.groupBy(_.getLong(0))
    qns.foreach { case (qid, ns) =>
      val qv = e.filter($"vec_id" === qid).head.getSeq[Float](1)
      val brute = TopK.topK(
        e.filter($"label" === ns)
          .withColumn("score", round(V.cosine($"embedding", typedLit(qv)), 6)),
        $"score", $"vec_id", 5).collect().map(_.getLong(0)).toSeq
      val mine = byQ(qid).sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .map(_.getLong(1)).toSeq
      assert(mine == brute, s"qid $qid: $mine vs exact $brute")
    }
  }

  test("pqDistortionSweep: distortion decreases in m, codewords quantize losslessly, bad m throws") {
    import spark.implicits._
    val cbs: Seq[Seq[Float]] = e.filter($"vec_id" < 16)
      .orderBy($"vec_id").select($"embedding")
      .collect().map(_.getSeq[Float](0)).toSeq
    val sweep = Ann.pqDistortionSweep(e, "embedding", cbs, Seq(2, 4, 8))
      .orderBy($"m").collect()
    assert(sweep.map(_.getInt(0)).toSeq == Seq(2, 4, 8))
    val errs = sweep.map(_.getDouble(2))
    assert(errs.forall(_ > 0.0), errs.toSeq)
    assert(errs.zip(errs.tail).forall { case (a, b) => a >= b },
      s"more subspaces must not increase distortion: ${errs.toSeq}")
    // a corpus that IS the codebook reconstructs exactly: zero error
    val exact = Ann.pqDistortionSweep(
      e.filter($"vec_id" < 16), "embedding", cbs, Seq(2, 4, 8)).collect()
    assert(exact.forall(_.getDouble(2) == 0.0), exact.toSeq.toString)
    intercept[IllegalArgumentException] {
      Ann.pqDistortionSweep(e, "embedding", cbs, Seq(3))
    }
  }

  test("probeRecallSweep: monotone curve, exact level always meets, separable clusters tune to 1 probe") {
    import spark.implicits._
    // the real corpus: recall must be non-decreasing in probes and the
    // full-probe level is exact (recall 1.0, meets, chosen fallback)
    val qs = e.filter($"vec_id" % 100 === 42)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val sweep = Ann.probeRecallSweep(e, cents, "vec_id", "embedding",
      "cent_id", "cvec", qs, "qid", "qvec", 10, 0.999)
      .orderBy($"n_probes").collect()
    assert(sweep.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
    val recalls = sweep.map(_.getDouble(3))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      recalls.toSeq)
    assert(recalls.last == 1.0 && sweep.last.getInt(4) == 1)
    assert(sweep.map(_.getInt(5)).sum == 1, "exactly one chosen level")
    // two tight, well-separated clusters with on-centroid queries:
    // 1 probe already captures the full top-k → chosen = 1
    val pts = (0 until 12).map(i => (i.toLong,
      Seq(1f, i * 0.001f, 0f, 0f))) ++ (0 until 12).map(i =>
      (100L + i, Seq(0f, i * 0.001f, 1f, 0f)))
    val v = pts.toDF("vec_id", "embedding")
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)))
      .toDF("cent_id", "cvec")
    val qs2 = Seq((900L, Seq(1f, 0f, 0f, 0f)), (901L, Seq(0f, 0f, 1f, 0f)))
      .toDF("qid", "qvec")
    val tuned = Ann.probeRecallSweep(v, cc, "vec_id", "embedding",
      "cent_id", "cvec", qs2, "qid", "qvec", 10, 0.95)
      .orderBy($"n_probes").collect()
    assert(tuned.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(tuned.head.getDouble(3) == 1.0 && tuned.head.getInt(5) == 1,
      tuned.toSeq.toString)
  }

  test("silhouetteSimplified: fresh s ∈ [0,1] (1 at tight clusters); stale assignment negative; dropped centroid throws") {
    import spark.implicits._
    val v = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(1f, 0.01f, 0f, 0f)),
      (10L, Seq(0f, 1f, 0f, 0f)), (11L, Seq(0f, 1f, 0.01f, 0f)))
      .toDF("vec_id", "embedding")
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
      .toDF("cent_id", "cvec")
    // members sitting (almost) on their centroids: a ≈ 0, s ≈ 1
    val fresh = Ann.silhouetteSimplified(v, cc, "vec_id", "embedding",
      "cent_id", "cvec").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(fresh.map(_._1).toSet == Set(0L, 1L))
    fresh.foreach { case (cell, n, meanA, meanS) =>
      assert(n == 2 && meanA < 0.001 && meanS > 0.99, (cell, n, meanA, meanS))
    }
    // the real corpus: fresh-assignment silhouette is in [0, 1] and
    // covers every row
    val rep = Ann.silhouetteSimplified(e, cents, "vec_id", "embedding",
      "cent_id", "cvec").collect()
    assert(rep.map(_.getLong(1)).sum == e.count())
    rep.foreach { r =>
      val s = r.getDouble(3)
      assert(s >= 0.0 && s <= 1.0, s"fresh mean_s out of [0,1]: $s")
    }
    // a maximally STALE stored assignment (every row filed in the other
    // cluster's cell): s = −1 per row
    val staled = v.withColumn("cell",
      when($"vec_id" < 10L, 1L).otherwise(0L))
    val st = Ann.silhouetteSimplified(staled, cc, "vec_id", "embedding",
      "cent_id", "cvec", assignCol = Some("cell")).collect()
    st.foreach { r =>
      assert(r.getDouble(3) < -0.99,
        s"misfiled cell ${r.getLong(0)} must score ~-1, got ${r.getDouble(3)}")
    }
    // an assignment pointing at a dropped centroid fails loudly
    val dangling = v.withColumn("cell", lit(99L))
    val ex = intercept[Exception] {
      Ann.silhouetteSimplified(dangling, cc, "vec_id", "embedding",
        "cent_id", "cvec", assignCol = Some("cell")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("searchNamespacedBatch plan: no cartesian, broadcast probe join — with and without AQE") {
    import spark.implicits._
    val qs = e.filter($"vec_id" % 100 === 42)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qns"))
    def planOf(): String = {
      val hits = Ann.searchNamespacedBatch(e, cents, "vec_id", "embedding",
        "label", "cent_id", "cvec", qs, "qid", "qvec", "qns", 4, 5)
      hits.queryExecution.executedPlan.executeCollect(): Unit
      hits.queryExecution.executedPlan.toString
    }
    val plan = planOf()
    assert(!plan.contains("CartesianProduct"),
      s"namespace routing must be an equi-join, not a cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe table must broadcast:\n$plan")
    // adaptive execution must keep the same shape (skew-join splitting
    // is exactly the rewrite that could re-plan the routing join)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val p = planOf()
      assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
        s"AQE must not re-shape the namespace join:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("searchFiltered post-path plan under AQE: pruned isin scan, no exchange before top-k") {
    import spark.implicits._
    val query = e.filter($"vec_id" === 42).head.getSeq[Float](1)
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val post = Ann.searchFiltered(e, cents, "vec_id", "embedding",
        "cent_id", "cvec", query, 10, $"label" % 2 === 0, 4,
        knownSelectivity = Some(0.5))
      post.queryExecution.executedPlan.executeCollect(): Unit
      val p = post.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("Join"),
        s"post path is a pure pruned scan + top-k, no join:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
        s"top-k must be TakeOrderedAndProject (k rows per partition):\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("hnswLevel: nested md5 pyramid — level fractions ≈ 1/fanout per step, deterministic") {
    import spark.implicits._
    val ids = (0L until 4096L).toDF("id")
    val lv = ids.select(col("id"),
        Ann.hnswLevel(col("id"), fanout = 8, maxLevel = 2).as("l"))
      .groupBy("l").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n1 = lv.getOrElse(1, 0L) + lv.getOrElse(2, 0L)
    val n2 = lv.getOrElse(2, 0L)
    // expected 4096/8 = 512 at level >= 1, 64 at level >= 2 (md5 is
    // uniform; allow wide tolerance, the pyramid SHAPE is the claim)
    assert(n1 > 256 && n1 < 1024, s"level>=1 count: $n1")
    assert(n2 > 16 && n2 < 256, s"level>=2 count: $n2")
    // determinism: same ids, same levels
    val again = ids.select(Ann.hnswLevel(col("id"), 8, 2).as("l"))
      .groupBy("l").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == lv)
  }

  test("hnswSearch: the layered descent reaches a cluster the flat walk's fixed entry NEVER can") {
    import spark.implicits._
    // Two far-apart clusters, one IVF cell each at layer 0 — the knnJoin
    // graph has NO cross-cell edge, so a flat walk entering in cluster A
    // is trapped there at ANY hop count. The HNSW hierarchy's top layer
    // coarsens to ONE cell spanning both clusters: the descent crosses.
    // Cluster membership is chosen around the (deterministic) md5
    // levels: compute them first, then put level>=1 nodes in BOTH
    // clusters and the smallest id in cluster A.
    val candidates = (0L until 200L).toDF("id")
      .select(col("id"), Ann.hnswLevel(col("id"), 4, 1).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val elevated = candidates.filter(_._2 >= 1).keys.toSeq.sorted
    assert(elevated.size >= 2, s"fixture needs two level-1 ids: $elevated")
    val (ea, eb) = (elevated(0), elevated(1))
    // cluster A on the x-axis (includes id 0 = the flat entry and ea),
    // cluster B on the y-axis (includes eb) — query points at B
    def va(i: Long) = Seq(9f, (i % 7).toFloat * 0.1f, 0f, 0f)
    def vb(i: Long) = Seq(0f, 0.1f * (i % 5).toFloat, 9f, 0f)
    // fillers are LEVEL-0 ids only, so the top layer is exactly
    // {ea, eb} — one long-range link between the clusters, the HNSW
    // picture in miniature
    val level0 = candidates.filter(_._2 == 0).keys.toSeq.sorted
    val aIds = (Seq(ea) ++ level0.take(8)).distinct
    val bIds = (Seq(eb) ++ level0.drop(8).take(8)).distinct
    val rows = aIds.map(i => (i, va(i))) ++ bIds.map(i => (i, vb(i)))
    val vecs = rows.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)))
      .toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val layers = Ann.hnswBuild(vecs, cc, "id", "embedding", "cent_id",
      "cvec", k = 4, fanout = 4, maxLevel = 1)
    val query = Seq(0f, 0f, 9f, 1f) // cluster B's direction
    // flat walk from the fixed smallest-id entry (id 0, cluster A):
    // trapped — its best hit is an A vector, near-orthogonal to q
    val flat = Ann.graphBeamSearch(layers.head, vecs, "id", "embedding",
      query, beam = 4, hops = 6)
    assert(flat.head.getDouble(2) < 0.2,
      s"flat walk must be trapped in cluster A: ${flat.collect().toSeq}")
    // hnsw: the coarse top layer spans both clusters, the descent lands
    // in B, and the layer-0 beam refines to the true top-3
    val hnsw = Ann.hnswSearch(layers, vecs, "id", "embedding", query,
      fanout = 4, beam = 6, hops = 3)
    val got = hnsw.collect().map(_.getLong(1)).toSeq.take(3)
    val brute = TopK.topK(
      vecs.withColumn("score", round(V.cosine(col("embedding"),
        typedLit(query)), 6)), col("score"), col("id"), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute, s"hnsw $got must equal brute-force $brute")
    // the descent itself is the O(levels·degree) part: it must land in
    // cluster B before the beam runs
    val entry = Ann.hnswDescend(layers, vecs, "id", "embedding", query,
      fanout = 4, descentHops = 3)
    assert(bIds.contains(entry), s"descent entry $entry must be in B $bIds")
  }

  test("hnswSearchBatch ≡ hnswSearch per qid; the batched descent lands every query's own entry") {
    import spark.implicits._
    // same two-cluster fixture as the single-face test: queries pointed
    // at BOTH clusters, so the batch must descend to DIFFERENT entries
    val candidates = (0L until 200L).toDF("id")
      .select(col("id"), Ann.hnswLevel(col("id"), 4, 1).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val elevated = candidates.filter(_._2 >= 1).keys.toSeq.sorted
    val (ea, eb) = (elevated(0), elevated(1))
    def va(i: Long) = Seq(9f, (i % 7).toFloat * 0.1f, 0f, 0f)
    def vb(i: Long) = Seq(0f, 0.1f * (i % 5).toFloat, 9f, 0f)
    val level0 = candidates.filter(_._2 == 0).keys.toSeq.sorted
    val aIds = (Seq(ea) ++ level0.take(8)).distinct
    val bIds = (Seq(eb) ++ level0.drop(8).take(8)).distinct
    val rows = aIds.map(i => (i, va(i))) ++ bIds.map(i => (i, vb(i)))
    val vecs = rows.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)))
      .toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val layers = Ann.hnswBuild(vecs, cc, "id", "embedding", "cent_id",
      "cvec", k = 4, fanout = 4, maxLevel = 1)
    val qA = Seq(9f, 0.2f, 0f, 0.5f)
    val qB = Seq(0f, 0f, 9f, 1f)
    val queries = Seq((1L, qA), (2L, qB)).toDF("qid", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    // batched descent picks each query's OWN entry (A-query → A,
    // B-query → B — per-query entries, not one shared seed)
    val entries = Ann.hnswDescendBatch(layers, vecs, "id", "embedding",
        queries, "qid", "qvec", fanout = 4, descentHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aIds.contains(entries(1L)), s"A-query entry: ${entries(1L)}")
    assert(bIds.contains(entries(2L)), s"B-query entry: ${entries(2L)}")
    // batch ≡ single, row for row per qid
    val batch = Ann.hnswSearchBatch(layers, vecs, queries, "id",
        "embedding", "qid", "qvec", fanout = 4, beam = 6, hops = 3,
        descentHops = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val single = Seq((1L, qA), (2L, qB)).flatMap { case (qid, qv) =>
      Ann.hnswSearch(layers, vecs, "id", "embedding", qv, fanout = 4,
          beam = 6, hops = 3, descentHops = 3)
        .collect().map(r => (qid, r.getInt(0), r.getLong(1),
          r.getDouble(2)))
    }.toSet
    assert(batch == single, s"batch $batch != singles $single")
  }

  test("zero-norm query: single faces clamp like the batch faces — batch ≡ single, scores 0, never NaN") {
    import spark.implicits._
    val vecs = (0L until 12L).map(i =>
        (i, Seq(1f + (i % 3), (i % 5).toFloat, 1f, 0f)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f))).toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val edges = Ann.knnJoin(vecs, cc, "id", "embedding", "cent_id",
      "cvec", 3)
    val zero = Seq(0f, 0f, 0f, 0f)
    val single = Ann.graphBeamSearch(edges, vecs, "id", "embedding",
        zero, beam = 4, hops = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(single.forall(!_._2.isNaN), s"NaN scores: $single")
    assert(single.forall(_._2 == 0.0), s"zero query must score 0: $single")
    val batch = Ann.graphBeamSearchBatch(edges, vecs,
        Seq((7L, zero)).toDF("qid", "qvec")
          .withColumn("qvec", col("qvec").cast("array<float>")),
        "id", "embedding", "qid", "qvec", beam = 4, hops = 2)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toSet
    assert(batch == single, s"batch $batch != single $single")
    // the layered descent uses the same clamp
    val layers = Ann.hnswBuild(vecs, cc, "id", "embedding", "cent_id",
      "cvec", k = 3, fanout = 4, maxLevel = 1)
    val e1 = Ann.hnswDescend(layers, vecs, "id", "embedding", zero,
      fanout = 4, descentHops = 2)
    val eB = Ann.hnswDescendBatch(layers, vecs, "id", "embedding",
        Seq((7L, zero)).toDF("qid", "qvec")
          .withColumn("qvec", col("qvec").cast("array<float>")),
        "qid", "qvec", fanout = 4, descentHops = 2)
      .head.getLong(1)
    assert(e1 == eB, s"descent entries diverge on a zero query: $e1 vs $eB")
  }

  test("hnswInsert: batch ingest without a rebuild — bounded degree, new nodes reachable, untouched cells byte-identical, partition-independent, empty batch = identity") {
    import spark.implicits._
    // the two-cluster fixture, with a HELD-OUT insert batch: three
    // level-0 ids + one elevated id, all pointed at cluster B, so cell 0
    // (cluster A) is untouched at layer 0 and the level-1 path is
    // exercised by the elevated id. Geometry is class-controlled under
    // round-6 quantization: same-class existing vectors are IDENTICAL
    // (cos 1.0), cross-class cos ≈ 0.999938, and each new vector sits at
    // cos ≈ 0.999985 from its class — strictly between, so it must enter
    // its class peers' top-4 yet never ties 1.0 with any existing vector
    val candidates = (0L until 200L).toDF("id")
      .select(col("id"), Ann.hnswLevel(col("id"), 4, 1).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val elevated = candidates.filter(_._2 >= 1).keys.toSeq.sorted
    assert(elevated.size >= 3, s"fixture needs three level-1 ids: $elevated")
    val (ea, eb, en) = (elevated(0), elevated(1), elevated(2))
    def va(i: Long) = Seq(9f, (i % 7).toFloat * 0.1f, 0f, 0f)
    def vb(i: Long) = Seq(0f, 0.1f * (i % 5).toFloat, 9f, 0f)
    def vn(i: Long) = Seq(0f, 0.1f * (i % 5).toFloat, 9f, 0.05f)
    val level0 = candidates.filter(_._2 == 0).keys.toSeq.sorted
    val aIds = (Seq(ea) ++ level0.take(8)).distinct
    // ≤ 2 existing members per mod-5 class: every class member's top-4
    // keeps room below its (≤ 2) same-class 1.0 twins for the new node
    val bPool = level0.drop(8)
    val bIds = (Seq(eb) ++
      (0 until 5).flatMap(c => bPool.filter(_ % 5 == c).take(2))).distinct
    val used = (aIds ++ bIds).toSet
    // one new id per class PRESENT in bIds → every new vector is
    // round-6-unique and has same-class existing peers to link through
    val bClasses = bIds.map(_ % 5).toSet
    val newPool = level0.filterNot(used)
    val newL0 = newPool.filter(i => bClasses.contains(i % 5))
      .groupBy(_ % 5).toSeq.sortBy(_._1).map(_._2.head).take(3)
    assert(newL0.size == 3, s"fixture needs 3 class-aligned new ids")
    val newIds = Seq(en) ++ newL0
    val existing = (aIds.map(i => (i, va(i))) ++ bIds.map(i => (i, vb(i))))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val batch = newIds.map(i => (i, vn(i))).toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)))
      .toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val layers = Ann.hnswBuild(existing, cc, "id", "embedding", "cent_id",
      "cvec", k = 4, fanout = 4, maxLevel = 1)
    val merged = Ann.hnswInsert(layers, existing, batch, cc, "id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1. bounded degree everywhere, both layers
    merged.zipWithIndex.foreach { case (layer, l) =>
      val maxDeg = layer.groupBy(col("src")).count()
        .agg(max(col("count"))).head.getLong(0)
      assert(maxDeg <= 4, s"layer $l degree $maxDeg exceeds k=4")
    }
    // 2. every new node is linked: src of its own edges; the
    // class-aligned ones are dst of an EXISTING node's re-ranked
    // adjacency (reachability depends on the reverse link), and the
    // elevated one is linked by both upper-layer nodes (coarse layer-1
    // cell holds only {ea, eb, en} — everything fits in k)
    val l0 = edgeSet(merged.head)
    newIds.foreach { n =>
      assert(l0.exists(_._1 == n), s"new node $n has no out-edges")
    }
    newL0.foreach { n =>
      assert(l0.exists { case (s, d) => d == n && !newIds.contains(s) },
        s"no existing node links new node $n")
    }
    val l1 = edgeSet(merged(1))
    assert(l1.contains((ea, en)) && l1.contains((eb, en)),
      s"layer-1 must link the elevated new node $en: $l1")
    // 3. a search over the merged graph FINDS a new node: query = the
    // round-6-unique vector of a class-distinct new id, rank 1 = itself
    // (the insert-then-serve contract), checked against brute force
    val qId = newL0.find(_ % 5 != en % 5).get
    val all = existing.unionByName(batch)
    val brute = TopK.topK(
      all.withColumn("score", round(V.cosine(col("embedding"),
        typedLit(vn(qId))), 6)), col("score"), col("id"), 1)
      .head.getLong(0)
    assert(brute == qId, s"fixture: brute top-1 $brute must be $qId")
    val hit = Ann.hnswSearch(merged, all, "id", "embedding",
      vn(qId), fanout = 4, beam = 6, hops = 3)
    assert(hit.head.getLong(1) == qId,
      s"merged-graph search must find the new node $qId: " +
        s"${hit.collect().toSeq}")
    // 4. untouched pass-through: every new vector lands in cell 1, so
    // cluster A's layer-0 adjacency is byte-identical to the build's
    assert(edgeSet(merged.head.filter(col("src").isin(aIds: _*))) ==
      edgeSet(layers.head.filter(col("src").isin(aIds: _*))),
      "untouched cell-0 adjacency must pass through unchanged")
    // 5. partition-count independence
    val merged2 = Ann.hnswInsert(layers, existing.repartition(5),
      batch.repartition(3), cc, "id", "embedding", "cent_id", "cvec",
      k = 4, fanout = 4)
    merged.zip(merged2).zipWithIndex.foreach { case ((m1, m2), l) =>
      assert(edgeSet(m1) == edgeSet(m2),
        s"layer $l edges differ across partitionings")
    }
    // 5b. the persisted-assignment sidecar path is bit-identical to the
    // recompute path (assignment is deterministic)
    val asg = Ann.hnswAssignLevels(existing, cc, "id", "embedding",
      "cent_id", "cvec", fanout = 4, maxLevel = 1)
    val mergedAsg = Ann.hnswInsert(layers, existing, batch, cc, "id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4,
      existingAssigned = asg)
    merged.zip(mergedAsg).zipWithIndex.foreach { case ((m1, m2), l) =>
      assert(edgeSet(m1) == edgeSet(m2),
        s"layer $l: sidecar path differs from recompute path")
    }
    // 6. empty batch = identity
    val mergedEmpty = Ann.hnswInsert(layers, existing, batch.limit(0),
      cc, "id", "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    layers.zip(mergedEmpty).zipWithIndex.foreach { case ((b, m), l) =>
      assert(edgeSet(b) == edgeSet(m), s"layer $l not identity on empty batch")
    }
    // 7. deltaOnly carries exactly the refresh-writer rows: merged =
    // delta ∪ (old edges of srcs the delta does not rewrite)
    val delta = Ann.hnswInsert(layers, existing, batch, cc, "id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4,
      deltaOnly = true)
    merged.zip(delta).zip(layers).zipWithIndex.foreach {
      case (((m, d), b), l) =>
        val dSet = edgeSet(d)
        val dSrcs = dSet.map(_._1)
        val passThrough = edgeSet(b).filterNot(e => dSrcs.contains(e._1))
        assert(edgeSet(m) == dSet ++ passThrough,
          s"layer $l: merged != delta ∪ untouched pass-through")
    }
  }

  test("hnswSearchDeleted: a tombstoned bridge still ROUTES but never surfaces; batch ≡ single") {
    import spark.implicits._
    // the two-cluster fixture: eb is the ONLY layer-1 node in cluster B,
    // i.e. the only descent bridge from A to B. Tombstone it: a hard
    // delete (dropping it from the graph) would strand cluster B —
    // soft delete must still answer B-pointed queries THROUGH eb while
    // never returning it.
    val candidates = (0L until 200L).toDF("id")
      .select(col("id"), Ann.hnswLevel(col("id"), 4, 1).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val elevated = candidates.filter(_._2 >= 1).keys.toSeq.sorted
    val (ea, eb) = (elevated(0), elevated(1))
    def va(i: Long) = Seq(9f, (i % 7).toFloat * 0.1f, 0f, 0f)
    def vb(i: Long) = Seq(0f, 0.1f * (i % 5).toFloat, 9f, 0f)
    val level0 = candidates.filter(_._2 == 0).keys.toSeq.sorted
    val aIds = (Seq(ea) ++ level0.take(8)).distinct
    val bIds = (Seq(eb) ++ level0.drop(8).take(8)).distinct
    val rows = aIds.map(i => (i, va(i))) ++ bIds.map(i => (i, vb(i)))
    val vecs = rows.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)))
      .toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val layers = Ann.hnswBuild(vecs, cc, "id", "embedding", "cent_id",
      "cvec", k = 4, fanout = 4, maxLevel = 1)
    val query = Seq(0f, 0f, 9f, 1f) // cluster B's direction
    val tomb = Seq(Tuple1(eb)).toDF("id")
    val got = Ann.hnswSearchDeleted(layers, vecs, "id", "embedding",
      query, tomb, "id", fanout = 4, beam = 6, hops = 3, k = 3)
    val gotIds = got.collect().map(_.getLong(1)).toSeq
    assert(!gotIds.contains(eb), s"tombstoned $eb surfaced: $gotIds")
    assert(gotIds.forall(bIds.contains),
      s"B-cluster results expected (routing through the tombstoned " +
        s"bridge): $gotIds")
    // survivors = brute-force top-3 excluding the tombstone
    val brute = TopK.topK(
      vecs.filter(col("id") =!= eb)
        .withColumn("score", round(V.cosine(col("embedding"),
          typedLit(query)), 6)), col("score"), col("id"), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(gotIds == brute, s"got $gotIds, brute-minus-tombstone $brute")
    // ranks are a clean 1..k page after the filter
    assert(got.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // batch face ≡ single face per qid
    val queries = Seq((7L, query)).toDF("qid", "qvec")
      .withColumn("qvec", col("qvec").cast("array<float>"))
    val batch = Ann.hnswSearchBatchDeleted(layers, vecs, queries, "id",
        "embedding", "qid", "qvec", tomb, "id", fanout = 4, beam = 6,
        hops = 3, k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    val single = got.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(batch == single, s"batch $batch != single $single")
  }

  test("hnswCompact: purge = build-on-survivors exactly; untouched cells pass through; empty tombstones = identity") {
    import spark.implicits._
    // two-cluster fixture; tombstone TWO cluster-B members (cell 1), so
    // cell 0 is untouched and must pass through byte-identical
    val candidates = (0L until 200L).toDF("id")
      .select(col("id"), Ann.hnswLevel(col("id"), 4, 1).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val elevated = candidates.filter(_._2 >= 1).keys.toSeq.sorted
    val (ea, eb) = (elevated(0), elevated(1))
    def va(i: Long) = Seq(9f, (i % 7).toFloat * 0.1f, 0f, 0f)
    def vb(i: Long) = Seq(0f, 0.1f * (i % 5).toFloat, 9f, 0f)
    val level0 = candidates.filter(_._2 == 0).keys.toSeq.sorted
    val aIds = (Seq(ea) ++ level0.take(8)).distinct
    val bIds = (Seq(eb) ++ level0.drop(8).take(8)).distinct
    val rows = aIds.map(i => (i, va(i))) ++ bIds.map(i => (i, vb(i)))
    val vecs = rows.toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cc = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 0f)))
      .toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val layers = Ann.hnswBuild(vecs, cc, "id", "embedding", "cent_id",
      "cvec", k = 4, fanout = 4, maxLevel = 1)
    val dead = Seq(bIds(1), bIds(2))
    val tomb = dead.map(Tuple1(_)).toDF("id")
    def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compacted = Ann.hnswCompact(layers, vecs, tomb, "id", cc, "id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    // THE contract: compacted ≡ build on survivors, level for level
    val survivors = vecs.filter(!col("id").isin(dead.map(Long.box): _*))
    val rebuilt = Ann.hnswBuild(survivors, cc, "id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    compacted.zip(rebuilt).zipWithIndex.foreach { case ((c, r), l) =>
      assert(edgeSet(c) == edgeSet(r),
        s"layer $l: compacted != build-on-survivors")
    }
    // no dead src or dst anywhere
    val all = compacted.map(edgeSet).reduce(_ ++ _)
    dead.foreach { d =>
      assert(!all.exists(e => e._1 == d || e._2 == d),
        s"tombstoned $d survives in $all")
    }
    // untouched cell 0 (cluster A) passes through byte-identical
    assert(edgeSet(compacted.head.filter(col("src").isin(aIds: _*))) ==
      edgeSet(layers.head.filter(col("src").isin(aIds: _*))),
      "untouched cell-0 adjacency must pass through unchanged")
    // deltaOnly = exactly the re-linked touched-cell adjacency:
    // compacted minus pass-through
    val delta = Ann.hnswCompact(layers, vecs, tomb, "id", cc, "id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4,
      deltaOnly = true)
    compacted.zip(delta).zip(layers).zipWithIndex.foreach {
      case (((c, d), b), l) =>
        val dSet = edgeSet(d)
        val dSrcs = dSet.map(_._1)
        val dDead = dead.toSet
        val passThrough = edgeSet(b).filterNot(e =>
          dSrcs.contains(e._1) || dDead.contains(e._1))
        assert(edgeSet(c) == dSet ++ passThrough,
          s"layer $l: compacted != delta ∪ pass-through")
    }
    // empty tombstones = identity
    val ident = Ann.hnswCompact(layers, vecs, tomb.limit(0), "id", cc,
      "id", "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    layers.zip(ident).zipWithIndex.foreach { case ((b, m), l) =>
      assert(edgeSet(b) == edgeSet(m), s"layer $l not identity")
    }
  }

  test("writeEdges layout: a hop filter row-group-prunes the src-sorted edge table") {
    import spark.implicits._
    // a chain graph over 4096 nodes — enough rows that range layout
    // spreads real row groups across the requested files
    val edges = (0L until 4096L).map(i => (i, (i + 1) % 4096L))
      .toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft_edges_")
      .toString
    Ann.writeEdges(edges, dir, files = 8)
    val total = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(total >= 8, s"expected >= 8 range files, got $total")
    val back = spark.read.parquet(dir)
    val probe = back.filter(col("src") === 2048L)
    // the hop filter reaches the parquet scan...
    val formatted = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") &&
      formatted.contains("EqualTo(src,2048)"),
      s"src filter must push to parquet:\n$formatted")
    // ...and the sorted layout makes it PRUNE: every file/row group
    // whose [min,max] src range misses 2048 is skipped on footer stats,
    // so the SCAN emits at most one range file's rows (4096/8), not the
    // whole edge list — the per-hop O(degree) on-disk serving property
    assert(probe.collect().map(_.getLong(1)).toSeq == Seq(2049L))
    val exec = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = exec.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    val scanned = scan.metrics("numOutputRows").value
    // range boundaries come from a sampled sketch (seeded by rdd id,
    // which shifts with suite ordering), so a file can hold slightly
    // more than rows/files — the property is "about one file's rows,
    // not the whole edge list", so bound at 2 files' worth
    assert(scanned > 0 && scanned <= 2 * 4096 / 8,
      s"scan emitted $scanned rows — row groups did not prune " +
        "(unsorted layout would surface ~4096)")
  }

  test("ivfAssign kernel path ≡ unrolled path bit-exactly; >threshold assignment matches the driver-side fold") {
    import spark.implicits._
    // vectors: deterministic spread + a zero vector (eps clamp) + rows
    // landing on exact ties (duplicate centroid vectors)
    val vecs = ((0L until 100L).map { i =>
      (i, Seq.tabulate(8)(d => ((i * (d + 3)) % 97).toFloat / 10f))
    } :+ (100L, Seq.fill(8)(0f)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    def centSeq(c: Int): Seq[(Long, Seq[Float])] =
      (0 until c).map { j =>
        // centroids 7 and 8 are EXACT duplicates — ties must break to 7
        val k = if (j == 8) 7 else j
        (j.toLong, Seq.tabulate(8)(d => ((k * (d + 5)) % 89).toFloat / 10f))
      }
    val small = centSeq(40)
    val smallDf = small.toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    // 1. same centroid set: the public (unrolled, C < threshold) path
    // and the kernel expression agree row for row
    val unrolled = Ann.ivfAssign(vecs, smallDf, "id", "embedding",
        "cent_id", "cvec")
      .select(col("id"), col("cell_id"))
    val kernel = vecs.withColumn("cell_id",
        graft.expressions.RehomeExpressions.assignArgmax(col("embedding"),
          small, graft.functions.VectorFunctions.NormEps))
      .select(col("id"), col("cell_id"))
    assert(unrolled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      kernel.collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      "kernel and unrolled assignment must agree bit-exactly")
    // the duplicate-centroid tie resolves to the LOWEST id on both paths
    assert(!unrolled.collect().exists(_.getLong(1) == 8L) &&
      !kernel.collect().exists(_.getLong(1) == 8L),
      "exact duplicate centroid must never win over its lower-id twin")
    // 2. past the threshold the public API switches to the kernel —
    // verify against an independent driver-side fold with the same
    // sequential-sum + HALF_UP round + (score desc, id asc) order
    val big = centSeq(Ann.UnrollCentroids + 44)
    val bigDf = big.toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val got = Ann.ivfAssign(vecs, bigDf, "id", "embedding",
        "cent_id", "cvec")
      .select(col("id"), col("cell_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def round6(x: Double) =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val eps = graft.functions.VectorFunctions.NormEps
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
    rows.foreach { case (id, v) =>
      val vn = math.max(math.sqrt(
        v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)), eps)
      val want = big.map { case (cid, cv) =>
        val cn = math.max(math.sqrt(
          cv.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)), eps)
        val dot = v.zip(cv).foldLeft(0.0)((a, p) =>
          a + p._1.toDouble * p._2.toDouble)
        (round6(dot / (vn * cn)), cid)
      }.minBy { case (s, cid) => (-s, cid) }._2
      assert(got(id) == want, s"row $id: kernel ${got(id)} != fold $want")
    }
  }

  test("incremental-op guards throw loudly: id collision, stale sidecar, oversized tombstone set") {
    import spark.implicits._
    def vecs(ids: Seq[Long]) = ids.map(i => (i, Seq(1f, (i % 7).toFloat)))
      .toDF("id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val existing = vecs(0L until 20L)
    val cc = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("cent_id", "cvec")
      .withColumn("cvec", col("cvec").cast("array<float>"))
    val layers = Ann.hnswBuild(existing, cc, "id", "embedding", "cent_id",
      "cvec", k = 2, fanout = 4, maxLevel = 1)
    // 1. batch-ids-disjoint contract ENFORCED: a colliding id would
    // silently carry both its re-ranked old adjacency and a new-node
    // edge set (bounded degree broken) — now it throws, naming the id
    val collide = intercept[IllegalArgumentException] {
      Ann.hnswInsert(layers, existing, vecs(Seq(5L, 100L)), cc, "id",
        "embedding", "cent_id", "cvec", k = 2, fanout = 4)
    }
    assert(collide.getMessage.contains("5") &&
      collide.getMessage.contains("already exists"), collide.getMessage)
    // ...and checkDisjoint = false is the documented transactional-
    // wrapper escape hatch (same call, disjoint batch, no throw)
    assert(Ann.hnswInsert(layers, existing, vecs(Seq(100L)), cc, "id",
      "embedding", "cent_id", "cvec", k = 2, fanout = 4,
      checkDisjoint = false).nonEmpty)
    // 2. a STALE sidecar (missing rows vs existing — the state after an
    // unrefreshed ingest) fails the coverage require on both ops
    val stale = Ann.hnswAssignLevels(existing.filter(col("id") < 10), cc,
      "id", "embedding", "cent_id", "cvec", fanout = 4, maxLevel = 1)
    val staleIns = intercept[IllegalArgumentException] {
      Ann.hnswInsert(layers, existing, vecs(Seq(100L)), cc, "id",
        "embedding", "cent_id", "cvec", k = 2, fanout = 4,
        existingAssigned = stale)
    }
    assert(staleIns.getMessage.contains("stale sidecar"), staleIns.getMessage)
    val staleCmp = intercept[IllegalArgumentException] {
      Ann.hnswCompact(layers, existing, Seq(3L).toDF("id"), "id", cc,
        "id", "embedding", "cent_id", "cvec", k = 2, fanout = 4,
        existingAssigned = stale)
    }
    assert(staleCmp.getMessage.contains("stale sidecar"), staleCmp.getMessage)
    // 3. tombstone sets past the broadcast ceiling refuse loudly (conf-
    // lowered so the spec doesn't need 10⁶ rows); the count is
    // limit-guarded so even a huge mis-keyed set can't OOM the check
    spark.conf.set("graft.maintained.maxTombstones", "3")
    try {
      val tomb = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      val big = intercept[IllegalArgumentException] {
        Ann.hnswCompact(layers, existing, tomb, "id", cc, "id",
          "embedding", "cent_id", "cvec", k = 2, fanout = 4)
      }
      assert(big.getMessage.contains("maxTombstones"), big.getMessage)
      val bigSearch = intercept[IllegalArgumentException] {
        Ann.hnswSearchDeleted(layers, existing, "id", "embedding",
          Seq(1f, 0f), tomb, "id", fanout = 4, beam = 4, hops = 2, k = 2)
      }
      assert(bigSearch.getMessage.contains("maxTombstones"),
        bigSearch.getMessage)
      val bigBatch = intercept[IllegalArgumentException] {
        Ann.hnswSearchBatchDeleted(layers, existing,
          Seq((0L, Seq(1f, 0f))).toDF("qid", "qvec")
            .withColumn("qvec", col("qvec").cast("array<float>")),
          "id", "embedding", "qid", "qvec", tomb, "id", fanout = 4,
          beam = 4, hops = 2, k = 2)
      }
      assert(bigBatch.getMessage.contains("maxTombstones"),
        bigBatch.getMessage)
      // within the ceiling the same faces run clean
      assert(Ann.hnswSearchDeleted(layers, existing, "id", "embedding",
        Seq(1f, 0f), Seq(1L, 2L).toDF("id"), "id", fanout = 4, beam = 4,
        hops = 2, k = 2).count() > 0)
    } finally spark.conf.unset("graft.maintained.maxTombstones")
  }
}
