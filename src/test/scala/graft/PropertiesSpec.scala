package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{VectorFunctions => V}
import graft.operators.TopK

/** Property-based checks (SURVEY.md §5.2) driven by seeded ScalaCheck
  * generators — each property is asserted over a set of generated datasets
  * (ties, skew, random partitioning included by construction).
  */
class PropertiesSpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // scores with deliberate ties (small discrete value space)
  private val scoredRows: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 300)
    scores <- Gen.listOfN(n, Gen.choose(0, 20).map(_ / 10.0))
  } yield scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }

  test("prop: topK == brute force under (score desc, id asc), any k / partitioning / ties") {
    import spark.implicits._
    (1 to 8).foreach { seed =>
      val rows = sample(scoredRows, seed)
      val k = sample(Gen.choose(1, 25), seed * 31)
      val parts = sample(Gen.choose(1, 7), seed * 17)
      val df = rows.toDF("id", "score").repartition(parts)
      val got = TopK.topK(df, col("score"), col("id"), k)
        .collect.map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = rows.map { case (id, s) => (id, s) }
        .sortBy { case (id, s) => (-s, id) }.take(k)
      assert(got == want, s"seed=$seed k=$k parts=$parts")
    }
  }

  test("prop: TopKAggregator == window topKPerKey on multi-key data with ties") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val rows = sample(scoredRows, seed + 100)
      val k = sample(Gen.choose(1, 8), seed * 13)
      val df = rows.map { case (id, s) => (id % 5, id, s) }
        .toDF("qid", "id", "score").repartition(4)
      val viaAgg = TopK.topKPerKeyAgg(df, Seq(col("qid")), col("score"), col("id"), k)
        .collect.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      val viaWin = TopK.topKPerKey(df, Seq(col("qid")), col("score"), col("id"), k)
        .select(col("qid"), col("score"), col("id"))
        .collect.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
      assert(viaAgg == viaWin, s"seed=$seed k=$k")
    }
  }

  private val vecs: Gen[List[Seq[Float]]] = for {
    n <- Gen.choose(2, 40)
    dim <- Gen.choose(2, 16)
    vs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-100, 100).map(_ / 10.0f)))
  } yield vs.map(_.toSeq)

  test("prop: connectedComponents == driver-side union-find on random graphs") {
    import spark.implicits._
    import graft.operators.Dedup
    val graphGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.choose(2, 60)
      nEdges <- Gen.choose(1, 90)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nNodes - 1L)
        b <- Gen.choose(0L, nNodes - 1L)
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.filter(e => e._1 != e._2)
    (1 to 8).foreach { seed =>
      val edges = sample(graphGen, seed)
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(n => n -> find(n)).toMap
        val got = Dedup.connectedComponents(
            edges.toDF("id_a", "id_b").repartition(3), "id_a", "id_b", 64)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"seed=$seed edges=$edges")
      }
    }
  }

  test("prop: packSequences == sequential concat-and-chunk simulation, any partitioning") {
    import spark.implicits._
    import graft.operators.Packing
    val corpusGen: Gen[List[(String, Long, Long)]] = for {
      nGroups <- Gen.choose(1, 4)
      n <- Gen.choose(1, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nGroups - 1)
        t <- Gen.choose(0L, 300L)
      } yield (s"g$g", t))
    } yield rows.zipWithIndex.map { case ((g, t), i) => (g, i.toLong, t) }
    (1 to 8).foreach { seed =>
      val rows = sample(corpusGen, seed)
      val budget = sample(Gen.choose(1, 200), seed * 13)
      val parts = sample(Gen.choose(1, 7), seed * 7)
      val df = rows.toDF("grp", "id", "n_tokens").repartition(parts)
      val got = Packing.packSequences(df, Seq(col("grp")), col("id"),
          col("n_tokens"), budget)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getLong(4))).toMap
      // driver-side simulation: per group in id order, running offset
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var off = 0L
        rs.sortBy(_._2).map { case (_, id, t) =>
          val r = (g, id) -> (off / budget, off % budget)
          off += t
          r
        }
      }
      assert(got == want, s"seed=$seed budget=$budget parts=$parts")
    }
  }

  test("prop: l2-on-normalized is rank-equivalent to cosine (SURVEY §1.2 quirk)") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val vs = sample(vecs, seed + 500).filter(v => v.exists(_ != 0.0f))
      if (vs.size >= 2) {
        val q = vs.head
        val df = vs.tail.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
          .withColumn("cos", V.cosine(col("v"), typedLit(q)))
          .withColumn("l2n", V.negSqL2(V.l2Normalize(col("v")),
            V.l2Normalize(typedLit(q))))
        val byCos = df.orderBy(desc("cos"), col("id")).select("id")
          .collect.map(_.getLong(0)).toSeq
        val byL2 = df.orderBy(desc("l2n"), col("id")).select("id")
          .collect.map(_.getLong(0)).toSeq
        assert(byCos == byL2, s"seed=$seed")
      }
    }
  }

  test("prop: normalization is idempotent and unit-norm (1e-12 guard aside)") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val vs = sample(vecs, seed + 900).filter(v => v.exists(math.abs(_) > 0.01f))
      val df = vs.toDF("v")
      val maxErr = df.select(
        max(abs(sqrt(V.norm2(V.l2Normalize(col("v")))) - 1.0))).head.getDouble(0)
      assert(maxErr < 1e-9, s"seed=$seed unit-norm violated: $maxErr")
      // idempotence: normalize twice == normalize once (elementwise ≤ 1e-12)
      val idemErr = df.select(max(aggregate(
        zip_with(V.l2Normalize(col("v")), V.l2Normalize(V.l2Normalize(col("v"))),
          (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)))).head.getDouble(0)
      assert(idemErr < 1e-12, s"seed=$seed idempotence violated: $idemErr")
    }
  }

  // random undirected graphs: ≤ 12 nodes, arbitrary edge subsets
  private val graphs: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 12)
    pairs = (for { a <- 0 until n; b <- a + 1 until n } yield (a.toLong, b.toLong)).toList
    edges <- Gen.someOf(pairs)
  } yield edges.toList

  test("prop: triangleCount == driver-side brute force on random graphs") {
    import spark.implicits._
    import graft.operators.GraphOps
    (1 to 10).foreach { seed =>
      val edges = sample(graphs, seed + 1300)
      if (edges.nonEmpty) {
        val es = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val brute = (for {
          a <- nodes; b <- nodes if a < b; c <- nodes if b < c
          if es((a, b)) && es((b, c)) && es((a, c))
        } yield 1).size.toLong
        val parts = sample(Gen.choose(1, 5), seed * 13)
        val got = GraphOps.triangleCount(
          edges.toDF("a", "b").repartition(parts)).head.getLong(0)
        assert(got == brute, s"seed=$seed: got $got want $brute (${edges.size} edges)")
      }
    }
  }

  test("prop: KMV pair union estimate == sketch-of-the-union, below AND above capacity") {
    import spark.implicits._
    import graft.operators.DistinctSketch
    (1 to 6).foreach { seed =>
      val k = 64 // small capacity so half the seeds land in the estimate regime
      val nA = sample(Gen.choose(5, 200), seed + 1400)
      val nB = sample(Gen.choose(5, 200), seed + 1500)
      val shift = sample(Gen.choose(0, 150), seed + 1600)
      val a = (0 until nA).map(i => ("a", s"v$i"))
      val b = (0 until nB).map(i => ("b", s"v${i + shift}"))
      val df = (a ++ b).toDF("g", "v").repartition(4)
      val sk = DistinctSketch.sketchByKey(df, col("g"), col("v"), k)
      val m = DistinctSketch.overlapMatrix(sk, k).head()
      // the merged pair sketch IS the sketch of A ∪ B (k smallest of the
      // union), so its read-off must equal distinctCount over the union
      val direct = DistinctSketch.distinctCount(df.select(col("v")), col("v"), k)
        .head()
      assert(m.getAs[Long]("n_union") == direct.getLong(0),
        s"seed=$seed: pair ${m.getAs[Long]("n_union")} vs direct ${direct.getLong(0)}")
      assert(m.getAs[Boolean]("is_exact") == direct.getBoolean(1), s"seed=$seed")
      // exact regime: every reported number is the true cardinality
      if (m.getAs[Boolean]("is_exact")) {
        val union = (a ++ b).map(_._2).distinct.size.toLong
        val inter = a.map(_._2).toSet.intersect(b.map(_._2).toSet).size.toLong
        assert(m.getAs[Long]("n_union") == union && m.getAs[Long]("n_inter") == inter,
          s"seed=$seed")
      }
    }
  }

  test("prop: bloomJoin == plain inner join on random key sets") {
    import spark.implicits._
    import graft.operators.RuntimeFilter
    (1 to 6).foreach { seed =>
      val nProbe = sample(Gen.choose(50, 2000), seed + 1800)
      val keep = sample(Gen.choose(1, 40), seed + 1900)
      val probe = (1 to nProbe).map(i => (i.toLong, s"p$i")).toDF("k", "pv")
        .repartition(sample(Gen.choose(1, 6), seed))
      val build = (1 to nProbe).filter(_ % keep == 0)
        .map(i => (i.toLong, s"b$i")).toDF("k", "bv")
      val got = RuntimeFilter.bloomJoin(probe, build, "k")
        .select("k").collect().map(_.getLong(0)).sorted
      val want = probe.join(build, Seq("k"))
        .select("k").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want), s"seed=$seed")
    }
  }

  test("prop: contentDigest is permutation-invariant and edit-sensitive") {
    import graft.sources.Layout
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val n = sample(Gen.choose(20, 300), seed + 2000)
      val rows = (0 until n).map(i => (s"g${i % 3}", s"value $i $seed"))
      def dig(d: org.apache.spark.sql.DataFrame) =
        Layout.contentDigest(d, col("g"), col("v")).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
          .toMap
      val base = dig(rows.toDF("g", "v").repartition(3))
      val shuffled = dig(scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed)).shuffle(rows).toDF("g", "v").repartition(7))
      assert(base == shuffled, s"seed=$seed: digest must ignore order/partitioning")
      val victim = sample(Gen.choose(0, n - 1), seed + 2100)
      val edited = dig(rows.updated(victim,
        (rows(victim)._1, rows(victim)._2 + "!")).toDF("g", "v"))
      assert(edited(rows(victim)._1) != base(rows(victim)._1),
        s"seed=$seed: a one-row edit must flip its group digest")
    }
  }

  test("prop: threeWaySplit is total, deterministic, and subset-stable for random fractions") {
    import graft.operators.Sampling
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val fT = sample(Gen.choose(0, 100), seed + 2200) / 100.0
      val fV = sample(Gen.choose(0, 100 - (fT * 100).toInt), seed + 2300) / 100.0
      val ids = (1 to 500).map(_.toLong).toDF("id")
      val s = Sampling.threeWaySplit(ids, col("id"), fT, fV)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(s.size == 500 && s.values.forall(Set("train", "val", "test")))
      // any subset routes identically (the no-leakage-creep property)
      val sub = Sampling.threeWaySplit(ids.filter(col("id") % 3 === 0),
        col("id"), fT, fV).collect().map(r => r.getLong(0) -> r.getString(1))
      assert(sub.forall { case (id, sp) => s(id) == sp }, s"seed=$seed")
    }
  }

  test("prop: lengthBuckets conserves docs and tokens, capacity bounds totals") {
    import graft.operators.Packing
    import spark.implicits._
    (1 to 5).foreach { seed =>
      val lens = sample(Gen.listOfN(200, Gen.choose(0, 400)), seed + 2400)
        .map(_.toLong)
      val r = Packing.lengthBuckets(lens.toDF("nt"), col("nt"),
        ladder = Seq(16, 64, 256)).collect()
      assert(r.map(_.getAs[Long]("n_docs")).sum == 200, s"seed=$seed")
      val expectTokens = lens.map(math.min(_, 256L)).sum
      assert(r.map(_.getAs[Long]("total_tokens")).sum == expectTokens)
      r.foreach { row =>
        assert(row.getAs[Long]("capacity") >= row.getAs[Long]("total_tokens"))
        assert(row.getAs[Long]("capacity") ==
          row.getAs[Long]("n_docs") * row.getAs[Long]("bucket"))
      }
    }
  }

  test("prop: native span-corruption kernel == staged-HOF spec on random docs") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    (1 to 4).foreach { seed =>
      val docs = (0 until 25).map { i =>
        val n = sample(Gen.choose(0, 60), seed * 100 + i)
        (i.toLong + seed * 1000, (1 to n).map(j => s"w$j").mkString(" "))
      }.toDF("id", "text")
      val pct = sample(Gen.oneOf(0, 13, 25, 50, 100), seed + 1700)
      def run(f: (org.apache.spark.sql.DataFrame, String, String, Int, String) =>
          org.apache.spark.sql.DataFrame) =
        f(docs, "id", "text", pct, s"salt$seed")
          .select("id", "inputs", "targets").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(run(T.spanCorruptDf) == run(T.spanCorruptDfHof),
        s"seed=$seed pct=$pct")
    }
  }

  // random small-vocabulary corpora — duplication arises naturally
  private val corpora: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(2, 60)
    texts <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 12)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" "))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("prop: paragraphDedup is idempotent, conservative, and globally duplicate-free") {
    import spark.implicits._
    import graft.operators.Dedup
    (1 to 6).foreach { seed =>
      val rows = sample(corpora, seed + 500)
      val parts = sample(Gen.choose(1, 7), seed * 19)
      val df = rows.toDF("doc_id", "text").repartition(parts)
      val once = Dedup.paragraphDedup(df, "doc_id", "text", 2)
      val got = once.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      // conservative: n_kept ≤ n_paras, and kept paragraphs are a
      // sub-multiset of the original document's paragraphs
      got.foreach { case (id, np, nk, _) =>
        assert(nk <= np, s"seed=$seed doc=$id kept $nk of $np")
      }
      // globally duplicate-free: across ALL rewritten docs, every
      // surviving paragraph fingerprint occurs exactly once
      val survived = got.flatMap { case (_, _, _, t) =>
        if (t.trim.isEmpty) Nil
        else t.trim.split("\\s+").grouped(2).map(_.mkString(" ")).toList
      }
      assert(survived.distinct.length == survived.length,
        s"seed=$seed: duplicate paragraph survived")
      // idempotent: a second pass removes nothing
      val again = Dedup.paragraphDedup(
        once.select(col("doc_id"), col("text_dedup").as("text")),
        "doc_id", "text", 2)
      assert(again.filter(col("n_kept") =!= col("n_paras")).count() == 0,
        s"seed=$seed: second pass removed paragraphs")
    }
  }

  test("prop: labelPropagation labels are graph nodes and deterministic under partitioning") {
    import spark.implicits._
    import graft.operators.GraphOps
    (1 to 5).foreach { seed =>
      val n = sample(Gen.choose(4, 40), seed + 900)
      val m = sample(Gen.choose(3, 80), seed * 23)
      val edges = (0 until m).map { i =>
        val a = sample(Gen.choose(0, n - 1), seed * 1000L + i)
        val b = sample(Gen.choose(0, n - 1), seed * 2000L + i)
        (a.toLong, b.toLong)
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val labs = GraphOps.labelPropagation(df.repartition(3), "src", "dst", 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
        assert(labs.keySet == nodes, s"seed=$seed: node set mismatch")
        assert(labs.values.toSet.subsetOf(nodes),
          s"seed=$seed: a label is not a graph node")
        val labs2 = GraphOps.labelPropagation(df.repartition(7), "src", "dst", 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(labs == labs2, s"seed=$seed: partitioning changed labels")
      }
    }
  }

  test("prop: unigram Viterbi DP == brute-force cover enumeration") {
    import graft.expressions.UnigramSegment
    val fallback = 1000L
    val wordGen = for {
      n <- Gen.choose(1, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val vocabGen = for {
      n <- Gen.choose(1, 10)
      ps <- Gen.listOfN(n, for {
        l <- Gen.choose(1, 3)
        cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c'))
        c <- Gen.choose(1L, 50L)
      } yield (cs.mkString, c))
    } yield ps.toMap.toSeq // dedup pieces, keep one cost each

    def brute(w: String, vocab: Map[String, Long]): (String, Long, Long) = {
      if (w.isEmpty) return ("", 0L, 0L)
      def covers(pos: Int): Seq[List[String]] =
        if (pos == w.length) Seq(Nil)
        else (1 to math.min(4, w.length - pos)).flatMap { l =>
          val p = w.substring(pos, pos + l)
          if (vocab.contains(p) || l == 1)
            covers(pos + l).map(p :: _)
          else Seq.empty
        }
      covers(0).map { ps =>
        (ps.map(p => vocab.getOrElse(p, fallback)).sum,
          ps.length.toLong, ps.mkString(" "))
      }.min match { case (c, n, s) => (s, c, n) }
    }

    import spark.implicits._
    for (seed <- 1L to 30L) {
      val w = sample(wordGen, seed)
      val vocab = sample(vocabGen, seed + 1000)
      val got = Seq(w).toDF("w")
        .select(UnigramSegment.unigramSegF($"w", vocab, 4, fallback).as("s"))
        .select("s.seg", "s.cost", "s.n").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).head
      val want = brute(w, vocab.toMap)
      assert(got == want, s"seed=$seed word=$w vocab=$vocab: $got vs $want")
    }
  }

  // integer metric samples with deliberate repeats (small value space)
  private val metricRows: Gen[List[Long]] = for {
    n <- Gen.choose(1, 200)
    vs <- Gen.listOfN(n, Gen.choose(0L, 15L))
  } yield vs

  test("prop: ksDrift is symmetric, bounded in [0,1], zero iff identical counts, brute-force exact") {
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val va = sample(metricRows, seed + 500)
      val vb = sample(metricRows, seed * 37 + 1)
      val a = va.toDF("v").repartition(3)
      val b = vb.toDF("v").repartition(5)
      val ab = graft.operators.Mining.ksDrift(a, b, "v").head
      val ba = graft.operators.Mining.ksDrift(b, a, "v").head
      assert(ab.getDouble(2) == ba.getDouble(2), s"seed=$seed not symmetric")
      val ks = ab.getDouble(2)
      assert(ks >= 0.0 && ks <= 1.0, s"seed=$seed ks=$ks")
      // brute-force ECDF max-gap on the pooled support
      val support = (va ++ vb).distinct.sorted
      val na = va.size.toDouble
      val nb = vb.size.toDouble
      val brute = support.map { x =>
        math.abs(va.count(_ <= x) / na - vb.count(_ <= x) / nb)
      }.max
      val bruteR = java.math.BigDecimal.valueOf(brute)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(math.abs(ks - bruteR) < 2e-6,
        s"seed=$seed ks=$ks brute=$bruteR")
      if (va.groupBy(identity).view.mapValues(_.size).toMap ==
        vb.groupBy(identity).view.mapValues(_.size).toMap)
        assert(ks == 0.0)
    }
  }

  test("prop: searchFiltered results always satisfy the predicate and never beat exact") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val query = e.filter(col("vec_id") === 42).head.getSeq[Float](1)
    (1 to 4).foreach { seed =>
      val m = sample(Gen.choose(2L, 5L), seed + 900)
      val r = sample(Gen.choose(0L, 1L), seed * 41 + 7)
      val pred = col("vec_id") % m === r
      val sel = sample(Gen.choose(0, 1).map(_.toDouble), seed * 7) // force both paths
      val hits = graft.operators.Ann.searchFiltered(e, cents, "vec_id",
        "embedding", "cent_id", "cvec", query, 10, pred, 4,
        knownSelectivity = Some(if (sel == 0.0) 0.01 else 0.9)).collect()
      val allowed = e.filter(pred).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      hits.foreach(h => assert(allowed.contains(h.getLong(0)),
        s"seed=$seed hit ${h.getLong(0)} violates pred vec_id % $m = $r"))
      // the post path can only ever return a SUBSET-scored ranking: its
      // best score never exceeds the exact pre path's best
      val exactTop = graft.operators.Ann.searchFiltered(e, cents, "vec_id",
        "embedding", "cent_id", "cvec", query, 10, pred, 4,
        knownSelectivity = Some(0.0)).collect()
      if (hits.nonEmpty && exactTop.nonEmpty)
        assert(hits.head.getDouble(1) <= exactTop.head.getDouble(1) + 1e-9)
    }
  }
}
