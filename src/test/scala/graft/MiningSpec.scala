package graft

import org.apache.spark.sql.functions.transform

import graft.operators.Mining

class MiningSpec extends SparkSpec {

  test("marginPairs: mines locally-tight pairs, demotes the hub vector") {
    import spark.implicits._
    // two tight pairs on orthogonal axes + a hub equally close to all:
    // raw cosine ranks hub pairs ~0.71, but margin normalization divides
    // by neighborhood density — the hub's neighborhood is itself dense,
    // so its pairs fall below 1.0 while (a,b) and (c,d) rise above it.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),          // a
      (1L, Array(0.999f, 0.0447f)),     // b ≈ a
      (2L, Array(0.0f, 1.0f)),          // c
      (3L, Array(0.0447f, 0.999f)),     // d ≈ c
      (4L, Array(0.7071f, 0.7071f))     // hub
    ).toDF("vec_id", "embedding")
    val got = Mining.marginPairs(vecs, "vec_id", "embedding",
        k = 2, threshold = 1.05)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (2L, 3L)), s"got $got")
    // the hub participates in no mined pair despite ~0.71 raw cosine
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("marginPairs: deterministic and symmetric in the pooled normalizer") {
    import spark.implicits._
    val vecs = (0L until 12L).map(i =>
        (i, Array.tabulate(4)(d => math.cos(i * 1.7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val once = Mining.marginPairs(vecs, "vec_id", "embedding", k = 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val again = Mining.marginPairs(vecs, "vec_id", "embedding", k = 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(once == again && once.nonEmpty)
    assert(once.forall { case (a, b, _) => a < b }, "pairs emitted once, a < b")
  }

  test("embeddingDrift: identical snapshots cos 1, negated cos -1, rotation in between") {
    import spark.implicits._
    val vecs = Seq(
      ("l1", Array(1.0f, 0.0f, 0.5f)), ("l1", Array(0.8f, 0.2f, 0.4f)),
      ("l2", Array(0.0f, 1.0f, 0.0f)), ("l2", Array(0.1f, 0.9f, 0.1f)))
      .toDF("label", "embedding")
    val same = Mining.embeddingDrift(vecs, vecs, "label", "embedding")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(same == Map("l1" -> 0.0, "l2" -> 0.0), s"got $same")
    val negated = vecs.select($"label",
      transform($"embedding", x => -x).as("embedding"))
    val neg = Mining.embeddingDrift(vecs, negated, "label", "embedding")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(neg == Map("l1" -> -1.0, "l2" -> -1.0), s"got $neg")
    // a label missing from one snapshot is coverage drift — dropped
    val partial = Mining.embeddingDrift(vecs,
      vecs.filter($"label" === "l1"), "label", "embedding")
    assert(partial.select("label").collect().map(_.getString(0)).toSeq ==
      Seq("l1"))
  }

  test("clusterPurity: majority fractions with ties to the smallest label") {
    import spark.implicits._
    // cell 1: labels 5,5,7 -> top 5, purity 2/3; cell 2: tie 3 vs 9 -> 3
    val assigned = Seq((1L, 5), (1L, 5), (1L, 7), (2L, 9), (2L, 3))
      .toDF("cell_id", "label")
    val got = Mining.clusterPurity(assigned, "cell_id", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((3L, 5L, 2L, 0.6667)))
    assert(got(2L) == ((2L, 3L, 1L, 0.5)), "tie must break to label 3")
  }

  test("lexicalDrift: zero for identical snapshots, positive under shift") {
    import spark.implicits._
    val base = Seq((0L, "a", "x x y z"), (1L, "a", "x y y z"),
      (2L, "b", "x y z z")).toDF("doc_id", "source", "text")
    val same = Mining.lexicalDrift(base, base, "source", "text", topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(same.values.forall(_ == 0L), same.toString)
    // new snapshot for source a is all-x → KL(new‖old) must be positive
    val drifted = Seq((0L, "a", "x x x x"), (1L, "a", "x x x x"),
      (2L, "b", "x y z z")).toDF("doc_id", "source", "text")
    val d = Mining.lexicalDrift(base, drifted, "source", "text", topN = 10)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(d("a") > 0L, d.toString)
    assert(d("b") == 0L, d.toString)
    // vocab column reports the true bounded vocab size (3 words here)
    val v = Mining.lexicalDrift(base, base, "source", "text", topN = 10)
      .head().getLong(1)
    assert(v == 3L)
  }

  test("marginPairsIvf: one cell reproduces marginPairs exactly; two cells bound pairs and kNN to cells") {
    import spark.implicits._
    def v(xs: Double*) = xs.map(_.toFloat)
    // two tight clusters far apart in direction
    val emb = Seq(
      (1L, v(1, 0, 0.1, 0)), (2L, v(1, 0.05, 0, 0)), (3L, v(0.9, 0.1, 0, 0)),
      (10L, v(0, 1, 0, 0.1)), (11L, v(0.05, 1, 0, 0)), (12L, v(0, 0.9, 0.1, 0))
    ).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // single centroid -> one cell -> exact marginPairs agreement
    val one = Seq((0L, v(1, 1, 0, 0))).toDF("cent_id", "cvec")
    assert(pairs(Mining.marginPairsIvf(emb, "vec_id", "embedding",
        one, "cent_id", "cvec", k = 3, threshold = 0.0)) ==
      pairs(Mining.marginPairs(emb, "vec_id", "embedding",
        k = 3, threshold = 0.0)))

    // two centroids on the cluster axes: pairs stay within clusters, and
    // each cluster's margins equal marginPairs run on that cluster alone
    val two = Seq((0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)))
      .toDF("cent_id", "cvec")
    val ivf = pairs(Mining.marginPairsIvf(emb, "vec_id", "embedding",
      two, "cent_id", "cvec", k = 3, threshold = 0.0))
    assert(ivf.forall(p => (p._1 < 10) == (p._2 < 10)),
      s"cross-cell pairs must not be scored: $ivf")
    val exactA = pairs(Mining.marginPairs(
      emb.filter($"vec_id" < 10), "vec_id", "embedding", k = 3, threshold = 0.0))
    val exactB = pairs(Mining.marginPairs(
      emb.filter($"vec_id" >= 10), "vec_id", "embedding", k = 3, threshold = 0.0))
    assert(ivf == exactA ++ exactB, s"got $ivf vs ${exactA ++ exactB}")
  }

  test("blockedBestMatch: best candidate per dirty record, argmax ties to smallest id, threshold gates") {
    import spark.implicits._
    val dirty = Seq(
      (1L, "jonathan smyth", "b1"),
      (2L, "zzzz qqqq", "b1"),     // nothing close -> absent from output
      (3L, "maria lopez", "b2")
    ).toDF("id", "name", "blk")
    val cands = Seq(
      (10L, "jonathan smith", "b1"),
      (11L, "jonathan smitt", "b1"),
      (20L, "maria lopes", "b2"),
      (30L, "maria lopez", "b9")   // right name, wrong block -> unseen
    ).toDF("id", "name", "blk")
    val got = Mining.blockedBestMatch(dirty, "id", "name",
        cands, "id", "name", "blk", minScore = 0.9)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    assert(got.map(_._1) == Set(1L, 3L), s"got $got")
    assert(got.forall(!_._3), "no block is hot here")
    assert(got.contains((3L, 20L, false)))
  }

  test("blockedBestMatch: hot block truncates to the maxBlock smallest ids and flags, cap-0 twin is exact") {
    import spark.implicits._
    // a "Smith" block of 500 candidates; the best match for the dirty
    // record has the LARGEST id, so truncation must (a) flag the row and
    // (b) fall back to the best among the kept smallest ids
    val dirty = Seq((1L, "john smith", "smith"), (2L, "ann jones", "j"))
      .toDF("id", "name", "blk")
    val hot = (100L until 599L).map(i => (i, s"john smith $i", "smith"))
    val best = Seq((999L, "john smith", "smith"), (50L, "ann jones", "j"))
    val cands = (hot ++ best).toDF("id", "name", "blk")

    val capped = Mining.blockedBestMatch(dirty, "id", "name",
        cands, "id", "name", "blk", minScore = 0.8, maxBlock = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      .toMap2
    // kept = ids 100..115; all score identically vs "john smith" (same
    // shared prefix, same-length suffixes) so the argmax ties to the
    // smallest kept id
    assert(capped(1L) == ((100L, true)),
      s"hot block must keep ids 100..115 and flag, got ${capped(1L)}")
    assert(capped(2L) == ((50L, false)), "cold block must stay exact")

    val uncapped = Mining.blockedBestMatch(dirty, "id", "name",
        cands, "id", "name", "blk", minScore = 0.8, maxBlock = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      .toMap2
    assert(uncapped(1L) == ((999L, false)), "uncapped finds the true best")
  }

  test("blockedBestMatch: hot-block truncation is exact for ids above 2^53 (no double collision)") {
    import spark.implicits._
    // consecutive ids at 2^53 are indistinguishable as doubles — a
    // -id-as-double ranking would select nondeterministically here; the
    // constant-score + exact-Long-tie-break selection must keep exactly
    // the maxBlock smallest ids
    val base = 1L << 53
    val dirty = Seq((1L, "john smith", "smith")).toDF("id", "name", "blk")
    val cands = (0L until 40L).map(i => (base + i, "john smith", "smith"))
      .toDF("id", "name", "blk")
    val got = Mining.blockedBestMatch(dirty, "id", "name",
        cands, "id", "name", "blk", minScore = 0.9, maxBlock = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      .toMap2
    // all candidates score 1.0, so argmax ties to the smallest KEPT id;
    // kept must be exactly base..base+15, hence best = base
    assert(got(1L) == ((base, true)), s"got ${got(1L)}")
  }

  implicit private class Tup3Ops(rows: Array[(Long, Long, Boolean)]) {
    def toMap2: Map[Long, (Long, Boolean)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("ksDrift: identical samples score 0, disjoint supports score 1 and reject, partition-independent") {
    import spark.implicits._
    val a = (1L to 400L).map(i => i % 20).toDF("v")
    // identical distribution → D = 0, keep
    val same = Mining.ksDrift(a, a, "v").head
    assert(same.getDouble(2) == 0.0 && same.getInt(4) == 0, same.toString)
    // disjoint supports → D = 1 and (at n=400 a side) a confident reject
    val b = (1L to 400L).map(i => 100L + i % 20).toDF("v")
    val dis = Mining.ksDrift(a, b, "v").head
    assert(dis.getDouble(2) == 1.0 && dis.getInt(4) == 1, dis.toString)
    // the exact-integer D is partition-independent
    val p = Mining.ksDrift(a.repartition(7), b.repartition(5), "v").head
    assert(p.getDouble(2) == dis.getDouble(2) &&
      p.getDouble(3) == dis.getDouble(3))
    // an empty side fails loudly
    intercept[IllegalArgumentException] {
      Mining.ksDrift(a.filter($"v" < 0), a, "v")
    }
  }

  test("psiDrift: identical samples stable at ~0, mass shifted off-support flags shifted, asymmetry-free bands") {
    import spark.implicits._
    val bins = Seq(10L, 20L, 30L)
    val a = (1L to 400L).map(_ % 40).toDF("v")
    val same = Mining.psiDrift(a, a, "v", bins).head
    assert(same.getDouble(2) == 0.0 && same.getString(3) == "stable",
      same.toString)
    // everything pushed past the last boundary: a maximal shift
    val b = (1L to 400L).map(i => 100L + i % 40).toDF("v")
    val dis = Mining.psiDrift(a, b, "v", bins).head
    assert(dis.getDouble(2) >= 0.25 && dis.getString(3) == "shifted",
      dis.toString)
    // PSI is symmetric under side swap (the (p−q)·ln(p/q) form)
    val rev = Mining.psiDrift(b, a, "v", bins).head
    assert(rev.getDouble(2) == dis.getDouble(2))
    // partition-independent
    val p = Mining.psiDrift(a.repartition(7), b.repartition(3), "v", bins).head
    assert(p.getDouble(2) == dis.getDouble(2))
    intercept[IllegalArgumentException] {
      Mining.psiDrift(a, b, "v", Seq(3L, 2L))
    }
  }

  test("semanticDecontaminate: flags near-eval train docs with their best match; probe count gates recall") {
    import spark.implicits._
    val cents = Seq((0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f)))
      .toDF("cent_id", "cvec")
    val ev = Seq(
      (100L, Seq(0.9f, 0.1f, 0f, 0f)),   // ≈ t1
      (101L, Seq(1f, 0f, 0f, 0f)),       // = t3
      (102L, Seq(1f, 0f, 0f, 0f)),       // duplicate of 101: tie-break case
      (103L, Seq(0.71f, 0.70f, 0f, 0f))  // probes cell 0 at nProbes=1, but t5 lives in cell 1
    ).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Seq(0.9f, 0.1f, 0f, 0f)),  // contaminated: exactly e100
      (2L, Seq(0f, 0f, 1f, 0f)),      // clean: orthogonal to every eval doc
      (3L, Seq(1f, 0f, 0f, 0f)),      // contaminated: equals e101 AND e102
      (5L, Seq(0.6f, 0.8f, 0f, 0f))   // near e103 but assigned to cell 1
    ).toDF("vec_id", "embedding")
    def run(nProbes: Int) = Mining.semanticDecontaminate(
        train, "vec_id", "embedding", ev, "vec_id", "embedding",
        cents, "cent_id", "cvec", nProbes, 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val full = run(2)
    // t1's best match is e100 at exactly 1.0; t2 is never flagged
    assert(full(1L) == ((100L, 1.0)), full)
    assert(!full.contains(2L), full)
    // t3 scores 1.0 against BOTH e101 and e102 — the (score desc,
    // eval_id asc) total order must pick 101
    assert(full(3L) == ((101L, 1.0)), full)
    // t5 ~0.99-close to e103: caught when both cells are probed
    assert(full.contains(5L) && full(5L)._1 == 103L, full)
    // ...but at nProbes=1 e103 probes only cell 0 while t5 sits in
    // cell 1 — the declared ANN recall trade: the pair is missed
    val narrow = run(1)
    assert(!narrow.contains(5L), narrow)
    assert(narrow(1L) == ((100L, 1.0)) && narrow(3L) == ((101L, 1.0)), narrow)
  }

  test("reliabilityReport: perfect calibration scores ECE 0, inverted scores ~1, bad inputs throw") {
    import spark.implicits._
    // perfectly calibrated: conf c ⇒ exactly fraction c of labels are 1
    // (bins of 10 rows at conf .05,.15,…, k ones each → acc == conf? use
    // conf equal to the bin's realized accuracy directly)
    val perfect = (0 until 10).flatMap { b =>
      val conf = (b * 10 + 5) / 100.0 // mid-bin confidence
      val ones = math.round(conf * 20).toInt
      (0 until 20).map(i => (conf, if (i < ones) 1L else 0L))
    }.toDF("conf", "y")
    val p = Mining.reliabilityReport(perfect, "conf", "y", 10)
      .orderBy($"bin").collect()
    assert(p.length == 10)
    assert(p.head.getDouble(4) == 0.0, s"perfect calibration must ECE 0: ${p.head}")
    p.foreach(r => assert(r.getDouble(2) == r.getDouble(3), r.toString))
    // inverted: high confidence on the 0 class → ECE near 1
    val inverted = (0 until 100).map(i =>
      (if (i < 50) 0.995 else 0.005, if (i < 50) 0L else 1L)).toDF("conf", "y")
    val inv = Mining.reliabilityReport(inverted, "conf", "y", 10).collect()
    assert(inv.head.getDouble(4) > 0.98, inv.head.toString)
    // loud failures: conf out of range, label not 0/1
    intercept[Exception] {
      Mining.reliabilityReport(Seq((1.5, 1L)).toDF("conf", "y"), "conf", "y")
        .collect()
    }
    intercept[Exception] {
      Mining.reliabilityReport(Seq((0.5, 2L)).toDF("conf", "y"), "conf", "y")
        .collect()
    }
  }
}
