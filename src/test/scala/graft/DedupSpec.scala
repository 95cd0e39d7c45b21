package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private def docs(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("shingles: distinct word n-grams; short text yields empty set") {
    val r = docs((0L, "a b c b a b")).select(Dedup.shingles(col("text"), 2))
      .head.getSeq[String](0)
    assert(r.toSet == Set("a b", "b c", "c b", "b a"))
    assert(docs((0L, "solo")).select(Dedup.shingles(col("text"), 2))
      .head.getSeq[String](0).isEmpty)
  }

  test("jaccard: exact on hand-computed sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).head.getDouble(0)
    assert(math.abs(j - 2.0 / 4.0) < 1e-12)
  }

  test("minhash signature similarity estimates jaccard for near-dup docs") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = docs((0L, base), (1L, nearDup), (2L, other))
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 2), 32).as("sig"))
    val sigs = df.orderBy("doc_id").collect.map(_.getSeq[Long](1))
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs(0), sigs(1)) > 0.5, "near-dups should agree on most hashes")
    assert(est(sigs(0), sigs(2)) < 0.2, "unrelated docs should rarely agree")
  }

  test("LSH candidate pairs recall the near-dup pair and not the unrelated one") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = docs((0L, base), (1L, nearDup), (2L, other))
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 16))
      .withColumn("bands", Dedup.bandHashes(col("sig"), 4, 4))
    val pairs = Dedup.lshCandidatePairs(df.select(col("doc_id"), col("bands")),
      "doc_id", "bands")
      .collect.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "near-dup pair must be a candidate")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)),
      "unrelated docs must not collide")
  }

  test("connectedComponents: transitive chains merge, separate clusters stay apart") {
    import spark.implicits._
    // chain 1-2-3-4-5 (diameter 4), pair (10,11), triangle (20,21),(21,22),(20,22)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(comp(_) == 1L), comp)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert((20L to 22L).forall(comp(_) == 20L))
    // maxIters bounds a long chain without breaking shorter graphs
    val longChain = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val c2 = Dedup.connectedComponents(longChain, "id_a", "id_b", maxIters = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 30L).forall(c2(_) == 1L))
  }

  test("connectedComponents: skewed mega-cluster converges in O(log diameter) rounds") {
    import spark.implicits._
    // One component holds ~half of all edges: a diameter-256 chain whose
    // head node 0 is also a 2000-spoke star hub (the "every crawl copy
    // links the boilerplate page" skew shape). The rest is 2300 isolated
    // 2-node components. The hot hub is absorbed by the map-side-combined
    // min-per-dst aggregate, and pointer jumping must converge in ~log2
    // (diameter) rounds — a per-hop propagation would need 256+.
    val chain = (0L until 255L).map(i => (i, i + 1))
    val star = (0L until 2000L).map(i => (0L, 10000L + i))
    val small = (0L until 2300L).map(i => (1000000L + 2 * i, 1000001L + 2 * i))
    val pairs = (chain ++ star ++ small).toDF("id_a", "id_b")
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(pairs, "id_a", "id_b")
    val comp = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 255L).forall(comp(_) == 0L), "chain nodes must label 0")
    assert((0L until 2000L).forall(i => comp(10000L + i) == 0L),
      "star spokes must label 0")
    assert((0L until 2300L).forall(i =>
      comp(1000000L + 2 * i) == 1000000L + 2 * i &&
        comp(1000001L + 2 * i) == 1000000L + 2 * i),
      "small components must stay apart")
    // log2(256) = 8; stale-table pointer jumping needs a couple extra
    assert(rounds <= 12, s"expected O(log d) rounds, got $rounds")
    // the same skewed graph refuses to under-merge when capped too low
    intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIters = 3)
    }
  }

  test("keepBestPerCluster: max-quality member kept, ties to lowest id, unclustered pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.7), // cluster comp=1 → keep 2 (best q)
      (5L, 0.4), (6L, 0.4),            // cluster comp=5, tie → keep 5 (low id)
      (9L, 0.1)                        // unclustered → passes through
    ).toDF("doc_id", "q")
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)
    ).toDF("node", "comp")
    val kept = Dedup.keepBestPerCluster(docs, clusters, "doc_id", "q")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 5L, 9L), kept.toSeq)
  }

  test("sortedNeighborhoodPairs: prefix-sorted near-dups found, window bound honored, no self-join") {
    import spark.implicits._
    // docs 1/2 share a long prefix (suffix edit LSH-style shingles still
    // catch); doc 3 same block but pushed beyond the window by 4-6;
    // doc 10 in a different block entirely
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon omega"),
      (3L, "alpha beta zzz yyy xxx www"),
      (4L, "alpha beta mmm nnn ooo ppp"),
      (5L, "alpha beta qqq rrr sss ttt"),
      (6L, "alpha beta uuu vvv aaa bbb"),
      (10L, "totally different text over here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text",
      window = 2, keyLen = 24, blockLen = 8, threshold = 0.2)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"adjacent near-dups must pair: $got")
    // window=2 compares each doc with its single successor only — 1 and 2
    // sort adjacent; every found pair must be a true near-dup
    assert(got.forall { case (a, b) => Set((1L, 2L)).contains((a, b)) },
      s"low-jaccard window neighbors must be filtered: $got")
    // scale shape: blocked window sort, no join anywhere in the plan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // widening the window to 3 compares 1-3 hops: still only true
    // near-dups survive the jaccard gate
    val w3 = Dedup.sortedNeighborhoodPairs(d, "doc_id", "text",
      window = 3, keyLen = 24, blockLen = 8, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w3.contains((1L, 2L)), s"got $w3")
  }

  test("contaminationOverlap: counts shared n-grams, misses clean docs, broadcast probe") {
    val bench = docs((0L, "the quick brown fox jumps over the lazy dog"))
    val train = docs(
      (10L, "he saw the quick brown fox yesterday"), // shares "the quick brown", "quick brown fox"
      (11L, "a totally different sentence about spark engines"),
      (12L, "over the lazy dog it went")) // shares "over the lazy", "the lazy dog"
    val r = Dedup.contaminationOverlap(train, bench, "doc_id", "text", 3)
      .collect.map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(10L -> 2L, 12L -> 2L), s"got $r")
    // scale shape: the benchmark hash set reaches the probe as a broadcast
    val plan = Dedup.contaminationOverlap(train, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("containmentDups: engulfed doc scores ~1 directionally where jaccard stays low") {
    import spark.implicits._
    val short = (1 to 20).map(i => s"w$i").mkString(" ")
    val long = (1 to 80).map(i => s"w$i").mkString(" ") // contains all of short
    val other = (200 to 260).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val got = Dedup.containmentDups(d, "doc_id", "text", threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.contains((1L, 2L)), s"engulfed pair must surface: $got")
    val (cab, cba) = got((1L, 2L))
    assert(cab == 1.0, "all of short's shingles are in long")
    assert(cba < 0.3, "long is NOT contained in short")
    // the same pair's jaccard is far below a symmetric near-dup gate
    val j = d.filter($"doc_id" <= 2)
      .select(Dedup.shingles($"text", 2).as("sh"))
      .collect().map(_.getSeq[String](0).toSet)
    val jac = j(0).intersect(j(1)).size.toDouble / j(0).union(j(1)).size
    assert(jac < 0.3, s"jaccard $jac would miss this duplication")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)),
      "unrelated docs stay out")
  }

  test("noveltyScore: ref docs score 0, fresh docs 1, mixed in between; broadcast probe") {
    val ref = docs((0L, "alpha beta gamma delta epsilon"))
    val corpus = docs(
      (0L, "alpha beta gamma delta epsilon"),     // in ref → novelty 0
      (1L, "completely fresh words only here"),   // disjoint → novelty 1
      (2L, "alpha beta gamma zeta eta theta"))    // 1 of 4 grams known
    val r = Dedup.noveltyScore(corpus, ref, "doc_id", "text", n = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(0L) == ((3L, 3L, 0.0)), r.toString)
    assert(r(1L) == ((3L, 0L, 1.0)), r.toString)
    assert(r(2L) == ((4L, 1L, 0.75)), r.toString)
    val plan = Dedup.noveltyScore(corpus, ref, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("simhash32: identical docs equal; near-dups within small hamming; unrelated far") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = docs((0L, base), (1L, base), (2L, nearDup), (3L, other))
      .select(col("doc_id"),
        Dedup.simhash32(graft.functions.TextFunctions.tokens(col("text"))).as("sh"))
    val m = df.collect.map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(0L) == m(1L))
    assert(ham(m(0L), m(2L)) <= 8)
    assert(ham(m(0L), m(3L)) > 8)
  }

  test("hash60 is non-negative and stable") {
    import spark.implicits._
    val v = Seq("x").toDF("s").select(Dedup.hash60(col("s"))).head.getLong(0)
    val v2 = Seq("x").toDF("s").select(Dedup.hash60(col("s"))).head.getLong(0)
    assert(v == v2 && v >= 0)
  }

  // ---- native kernel ⇄ HOF spec agreement (the dual-path discipline) ----

  test("native shingles kernel is bit-identical to the HOF shinglesHof on fixture docs") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val mismatches = d
      .select(Dedup.shingles(col("text"), 2).as("fast"),
        Dedup.shinglesHof(col("text"), 2).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
    // edge cases: tabs at edges (leading empty token), repeats, short text
    val edge = docs((0L, "\ta b\t"), (1L, "x x x x"), (2L, "solo"), (3L, "  "))
    val edgeMismatch = edge
      .select(Dedup.shingles(col("text"), 2).as("fast"),
        Dedup.shinglesHof(col("text"), 2).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(edgeMismatch == 0)
  }

  test("native minhashSigF is bit-identical to the HOF minhashSignature on fixture docs") {
    import graft.expressions.TextHashExpressions.minhashSigF
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    val mismatches = d
      .select(minhashSigF(col("sh"), 16).as("fast"),
        Dedup.minhashSignature(col("sh"), 16).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("native bandHashes is bit-identical to the HOF bandHashesHof on fixture sigs") {
    import graft.expressions.TextHashExpressions.minhashSigF
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSigF(col("sh"), 16))
    val mismatches = d
      .select(Dedup.bandHashes(col("sig"), 4, 4).as("fast"),
        Dedup.bandHashesHof(col("sig"), 4, 4).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("native simhash32F is bit-identical to the HOF simhash32 on fixture docs") {
    import graft.expressions.TextHashExpressions.simhash32F
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val mismatches = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(simhash32F(toks).as("fast"), Dedup.simhash32(toks).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("bloom filter: no false negatives; FP-heavy config still yields exact overlap") {
    import graft.expressions.BloomExpression
    // no false negatives, ever
    val hs = (0 until 5000).map(i => Dedup.hash60(lit(s"k$i")))
    val hashVals = docs((0L, "x")).select(array(hs: _*)).head.getSeq[Long](0).toArray
    val bits = BloomExpression.buildBits(hashVals)
    import spark.implicits._
    val misses = hashVals.toSeq.toDF("h")
      .filter(!BloomExpression.mightContainF(col("h"), bits)).count()
    assert(misses == 0)
    // exactness under deliberate false-positive pressure: 2 bits/key, 1
    // probe → heavy FPs in the pre-filter, identical final answer (the
    // verify join is what guarantees semantics, not the bloom)
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val train = d.filter(col("doc_id") >= 25)
    val bench = d.filter(col("doc_id") < 25)
    val exact = Dedup.contaminationOverlap(train, bench, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloomed = Dedup.contaminationOverlapBloom(train, bench, "doc_id", "text", 4,
        bitsPerKey = 2, numProbes = 1)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloomed == exact)
  }

  test("native windowHashes kernel is bit-identical to the HOF windowHashesHof on fixture docs") {
    import graft.expressions.TextHashExpressions.windowHashesF
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val mismatches = d
      .select(windowHashesF(col("text"), 8).as("fast"),
        Dedup.windowHashesHof(col("text"), 8).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
    // edges: repeated windows kept positionally, short text, whitespace
    val edge = docs((0L, "a b c a b c a b"), (1L, "x y"), (2L, "  "),
      (3L, "\tp q r s\t"))
    val edgeMismatch = edge
      .select(windowHashesF(col("text"), 3).as("fast"),
        Dedup.windowHashesHof(col("text"), 3).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(edgeMismatch == 0)
  }

  test("duplicatedSpans: maximal spans, counts, and fractions on a hand-built corpus") {
    // doc 0 and 1 share the 6-token run "s1..s6" (two overlapping 5-windows
    // → one maximal span of 6 tokens each); doc 2 repeats its own 5-token
    // run twice (self-repetition also flags); doc 3 is clean.
    val shared = "s1 s2 s3 s4 s5 s6"
    val d = docs(
      (0L, s"a1 a2 $shared a3 a4"),
      (1L, s"b1 $shared b2 b3 b4"),
      (2L, "r1 r2 r3 r4 r5 m1 m2 r1 r2 r3 r4 r5"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
    val r = Dedup.duplicatedSpans(d, "doc_id", "text", minLen = 5)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val byId = r.map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // doc 0: windows at pos 2,3 merge → span tokens [2, 8) = 6 of 10
    assert(byId(0L) == ((2L, 1L, 6L, 10L)))
    assert(byId(1L) == ((2L, 1L, 6L, 10L)))
    // doc 2: "r1 r2 r3 r4 r5" at pos 0 and 7 — two disjoint spans
    assert(byId(2L) == ((2L, 2L, 10L, 12L)))
    val frac0 = r.find(_.getLong(0) == 0L).get.getDouble(5)
    assert(math.abs(frac0 - 0.6) < 1e-9)
  }

  test("removeDuplicatedSpans: canonical occurrence survives, later copies are cut") {
    val passage = "a1 a2 a3 a4 a5 a6 a7 a8" // exactly one 8-token window
    val d = docs(
      (0L, s"$passage u1 u2"),          // canonical (lowest doc_id)
      (1L, s"v1 v2 $passage v3"),       // cross-doc copy → cut
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9"), // clean, passes through
      (3L, s"$passage u1 u2"),          // full duplicate of doc 0 → emptied
      (4L, s"r1 r2 r3 r4 r5 r6 r7 r8 z r1 r2 r3 r4 r5 r6 r7 r8")) // self-repeat
    val r = Dedup.removeDuplicatedSpans(d, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect()
    assert(r.length == 5, "one row per input document")
    val byId = r.map(x =>
      x.getLong(0) -> ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    // doc 0 holds every canonical occurrence: untouched
    assert(byId(0L) == ((s"$passage u1 u2", 10L, 0L)))
    // doc 1: the copied 8 tokens are cut, its own framing survives
    assert(byId(1L) == (("v1 v2 v3", 3L, 8L)))
    assert(byId(2L) == (("c1 c2 c3 c4 c5 c6 c7 c8 c9", 9L, 0L)))
    // doc 3 duplicates doc 0 entirely — all three windows canonicalize to
    // doc 0, covering every token
    assert(byId(3L) == (("", 0L, 10L)))
    // doc 4: within-doc repeat — first occurrence (pos 0) is canonical,
    // the pos-9 repeat is cut
    assert(byId(4L) == (("r1 r2 r3 r4 r5 r6 r7 r8 z", 9L, 8L)))
  }

  test("removeDuplicatedSpans: a 20-token cross-document overlap is cut precisely") {
    val d = docs(
      (0L, (1 to 30).map(i => s"w$i").mkString(" ")),
      (1L, ((11 to 30) ++ (100 to 109)).map(i => s"w$i").mkString(" ")),
      (2L, (200 to 220).map(i => s"w$i").mkString(" ")))
    val rem = Dedup.removeDuplicatedSpans(d, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect()
    // doc 0 is fully canonical (lowest id): nothing removed
    assert(rem(0).getLong(3) == 0L)
    // doc 1: tokens w11..w30 (positions 0..19) are covered by windows
    // duplicated against doc 0 → 20 tokens cut, the 10 fresh ones kept
    assert(rem(1).getString(1) == (100 to 109).map(i => s"w$i").mkString(" "))
    assert(rem(1).getLong(2) == 10L && rem(1).getLong(3) == 20L)
    assert(rem(2).getLong(3) == 0L)
  }

  test("removeDuplicatedSpans: untouched documents pass through byte-identical") {
    // odd whitespace survives when no span is removed — only rewritten
    // docs are whitespace-normalized by token reassembly
    val weird = "  a1   a2\ta3 a4 a5 a6 a7 a8 a9 "
    val d = docs(
      (0L, weird),                              // no duplicated window
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 t"),        // canonical copy
      (2L, "x  b1 b2 b3 b4 b5 b6 b7 b8   y"))   // loses the span → normalized
    val r = Dedup.removeDuplicatedSpans(d, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) == weird)
    assert(r(1).getString(1) == "b1 b2 b3 b4 b5 b6 b7 b8 t")
    assert(r(2).getString(1) == "x y" && r(2).getLong(3) == 8L)
  }

  test("removeDuplicatedSpans plan has no Window operator (hot-hash safety)") {
    // the canonical-occurrence pick must stay a partial-aggregable min,
    // never a row_number sort — a boilerplate window with 10⁸
    // occurrences would otherwise serialize onto one reducer
    val d = docs((0L, "a b c d e f g h i"), (1L, "a b c d e f g h j"))
    val r = Dedup.removeDuplicatedSpans(d, "doc_id", "text", minLen = 8)
    r.count()
    val plan = r.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no Window expected:\n$plan")
  }

  test("merge jaccard (sorted arrays) agrees with the hash-set jaccardHof on fixture pairs") {
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("ib"), col("sh").as("sb"))
    val mismatches = a.join(b, col("ia") < col("ib"))
      .select(Dedup.jaccard(col("sa"), col("sb")).as("fast"),
        Dedup.jaccardHof(col("sa"), col("sb")).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
  }

  test("nearDupPairs (one-call pipeline) finds the near-dup pair above threshold") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val got = Dedup.nearDupPairs(
      docs((0L, base), (1L, nearDup), (2L, other)), "doc_id", "text",
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L)))
  }

  test("hot-bucket cap loses no dedup decisions on a 1000x-duplicated fixture") {
    // one boilerplate doc duplicated 1000x (the pathological bucket), plus
    // organic near-dups and unrelated docs
    val boiler = (1 to 40).map(i => s"b$i").mkString(" ")
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val fixture = docs(Seq((0L, base), (1L, nearDup), (2L, other)) ++
      (0 until 1000).map(i => (100L + i, boiler)): _*)

    val uncapped = Dedup.nearDupPairs(fixture, "doc_id", "text",
      threshold = 0.5, maxBucket = 0)
    val capped = Dedup.nearDupPairs(fixture, "doc_id", "text",
      threshold = 0.5, maxBucket = 8)

    // the capped run emits linear star pairs for the hot bucket, so raw
    // pair counts differ by construction...
    val nUncapped = uncapped.count()
    val nCapped = capped.count()
    assert(nUncapped >= 1000L * 999 / 2, s"uncapped must enumerate the hot bucket, got $nUncapped")
    assert(nCapped <= 2000, s"capped must stay linear in the hot bucket, got $nCapped")

    // ...but the DEDUP DECISIONS are identical: the set of docs flagged as
    // duplicates-of-a-lower-id (= the rows keep-one-drop-rest removes) and
    // the canonical survivors they map to.
    def decisions(pairs: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      pairs.groupBy(col("id_b")).agg(min(col("id_a")).as("canon"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(decisions(capped) == decisions(uncapped))
  }

  test("exactDedup keeps one canonical (min-id) row per duplicated text") {
    val df = docs((0L, "same text here"), (1L, "same  text   here"),
      (2L, "different entirely"), (3L, "same text here"))
    val got = Dedup.exactDedup(df, "text", "doc_id")
      .select(col("doc_id"), col("n_copies"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // whitespace-collapsed fingerprint: 0,1,3 are one group, canonical 0
    assert(got == Map(0L -> 3L, 2L -> 1L))
  }

  test("stripBoilerplate removes corpus-frequent lines, keeps unique content in order") {
    val footer = "all rights reserved"
    val pages = docs(
      (0L, s"alpha one\n$footer\nalpha two"),
      (1L, s"beta one\n$footer\nbeta two"),
      (2L, s"gamma one\n$footer\ngamma two"),
      (3L, footer)) // all-boilerplate page
    val got = Dedup.stripBoilerplate(pages, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == (("alpha one\nalpha two", 2L, 1L)))
    assert(got(1L) == (("beta one\nbeta two", 2L, 1L)))
    assert(got(2L) == (("gamma one\ngamma two", 2L, 1L)))
    assert(got(3L) == (("", 0L, 1L)), "all-boilerplate doc must survive, emptied")
    // below threshold nothing is stripped
    val loose = Dedup.stripBoilerplate(pages, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(loose.values.forall(_ == 0L))
  }

  test("incrementalNearDups flags batch docs colliding with stored corpus signatures") {
    val corpus = docs(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated corpus content about spark shuffles"))
    val batch = docs(
      (11L, "the quick brown fox jumps over the lazy dog tonight"), // exact → est 1.0
      (13L, "the quick brown fox jumps over the lazy cat tonight"), // near
      (15L, "fresh new content sharing nothing with the corpus at all"))
    val cs = Dedup.signatureStore(corpus, "doc_id", "text")
    val bs = Dedup.signatureStore(batch, "doc_id", "text")
    val got = Dedup.incrementalNearDups(bs, cs, "doc_id", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.get((11L, 0L)).contains(1.0), s"exact replay must estimate 1.0: $got")
    assert(!byPair.keySet.exists(_._1 == 15L), s"fresh doc must not match: $got")
    assert(byPair.keySet.forall(_._2 == 0L), s"only corpus doc 0 is similar: $got")
  }

  test("incrementalNearDups refuses mismatched signature-store parameters") {
    val corpus = docs((0L, "the quick brown fox jumps over the lazy dog"))
    val batch = docs((11L, "the quick brown fox jumps over the lazy dog"))
    // parquet round-trip: the guard must work on a RELOADED store, so
    // the params have to survive the write (column metadata does)
    val dir = java.nio.file.Files.createTempDirectory("graft_sigstore_").toString
    Dedup.signatureStore(corpus, "doc_id", "text", numHashes = 16, bands = 4)
      .write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val bs = Dedup.signatureStore(batch, "doc_id", "text", numHashes = 32, bands = 8)
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalNearDups(bs, reloaded, "doc_id", 0.5)
    }
    assert(e.getMessage.contains("signature params disagree"), e.getMessage)
    // matching params still work through the same round-trip
    val ok = Dedup.signatureStore(batch, "doc_id", "text", numHashes = 16, bands = 4)
    assert(Dedup.incrementalNearDups(ok, reloaded, "doc_id", 0.5).count() == 1)
  }

  test("incrementalDedup drops already-ingested texts, dedups within batch, keeps fresh") {
    val corpus = docs((0L, "already ingested doc"), (1L, "another old doc"))
    val batch = docs(
      (10L, "already  ingested   doc"), // exact replay (modulo whitespace) → drop
      (11L, "brand new doc"),           // fresh → survives
      (12L, "brand new doc"),           // within-batch dup → merged into 11
      (13L, "second fresh doc"))
    val got = Dedup.incrementalDedup(batch, corpus, "text", "doc_id")
      .select(col("doc_id"), col("n_copies"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(11L -> 2L, 13L -> 1L))
  }

  test("nearDupThresholdSweep: buckets partition the candidates, kept-count is the tail sum") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),   // exact dup of 1 → jac 1.0
      (3L, "alpha beta gamma delta other words"),    // partial overlap
      (4L, "totally different content here now ok")).toDF("doc_id", "text")
    val sweep = Dedup.nearDupThresholdSweep(docs, "doc_id", "text")
      .orderBy("bucket").collect()
    val all = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.0)
    assert(sweep.map(_.getLong(2)).sum == all.count(),
      "histogram must partition all candidate pairs")
    assert(sweep.last.getLong(0) == 9 && sweep.last.getLong(2) >= 1,
      "the exact dup lands in the top bucket")
    // n_kept_at_lo is the suffix sum: monotone non-increasing in bucket
    val kept = sweep.map(_.getLong(3))
    assert(kept.zip(kept.drop(1)).forall { case (a, b) => a >= b })
    assert(kept.head == all.count(), "threshold 0 keeps every candidate")
  }

  test("pairEval: hand-computed confusion counts, endpoint order and dups ignored") {
    import spark.implicits._
    // pred: (1,2) swapped + duplicated, (3,4), (5,6); gold: (1,2), (3,4), (7,8)
    val pred = Seq((2L, 1L), (1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val gold = Seq((1L, 2L), (4L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Dedup.pairEval(pred, gold, "id_a", "id_b").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 1L)))
    assert(r.getLong(3) == 2000000L / 3)        // precision 2/3
    assert(r.getLong(4) == 2000000L / 3)        // recall 2/3
    assert(r.getLong(5) == 666666L)             // F1 = harmonic of equals
    // empty prediction: zero precision/recall without dividing by zero
    val e = Dedup.pairEval(pred.limit(0), gold, "id_a", "id_b").head
    assert(e.getLong(0) == 0 && e.getLong(2) == 3 && e.getLong(5) == 0)
  }

  test("CdcChunkStarts kernel agrees with the HOF spec; chunks tile the text") {
    import spark.implicits._
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(graft.operators.TrigramLm.normalize(col("text")).as("nt"))
    val edge = Seq("", "ab", "a" * 16, "a" * 17, "the quick brown fox " * 10)
      .toDF("nt")
    Seq(fixture, edge).foreach { df =>
      val mism = df.select(
          graft.expressions.CdcExpression.cdcChunkStartsF($"nt", 16, 32)
            .as("fast"),
          Dedup.cdcStartsHof($"nt", 16, 32).as("spec"))
        .filter(not($"fast" <=> $"spec")).count()
      assert(mism == 0L)
    }
    // chunks concatenate back to the normalized text exactly
    val bad = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(graft.operators.TrigramLm.normalize(col("text")).as("nt"),
        Dedup.cdcChunks(col("text")).as("ch"))
      .filter(length($"nt") > 0 &&
        concat_ws("", $"ch") =!= $"nt").count()
    assert(bad == 0L)
    // fused kernel == declarative composition on fixture + edge docs
    val fused = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(Dedup.cdcChunks(col("text")).as("a"),
        Dedup.cdcChunksHof(col("text")).as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(fused == 0L)
  }

  test("CdcChunkStarts: interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq("", "short", "the quick brown fox jumps over the lazy dog " * 5)
      .toDF("nt")
    val expr = graft.expressions.CdcExpression.cdcChunkStartsF($"nt", 16, 32)
    val fast = df.select(expr.as("v"))
    val codegen = fast.collect().map(_.getSeq[Int](0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = fast.collect().map(_.getSeq[Int](0)).toSeq
      assert(codegen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("CDC boundaries re-align after a prefix insertion (the anti-fixed-size property)") {
    import spark.implicits._
    val body = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight again and again"
    val shifted = "inserted new prefix words " + body
    val Seq(a, b) = Seq(body, shifted).toDF("t")
      .select(Dedup.cdcChunks($"t").as("ch")).collect()
      .map(_.getSeq[String](0)).toSeq
    // every chunk of the original after the first boundary reappears
    // identically in the shifted version (fixed-size chunking would
    // desynchronize every chunk after the insertion point)
    val tailChunks = a.drop(1)
    assert(tailChunks.nonEmpty && tailChunks.forall(b.contains),
      s"original tail chunks $tailChunks must survive in $b")
  }

  test("cappedPairsByKey: exact pairs under cap, linear star routing over it") {
    import spark.implicits._
    // bucket A: 4 members (under any cap); bucket B: 1000 members (hot)
    val rows = (1L to 4L).map(i => ("A", i)) ++
      (101L to 1100L).map(i => ("B", i))
    val df = rows.toDF("k", "id")
    val uncapped = Dedup.cappedPairsByKey(df, "id", Seq("k"), maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.size == 6 + 1000 * 999 / 2)
    val capped = Dedup.cappedPairsByKey(df, "id", Seq("k"), maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucket A fully enumerated; bucket B = 999 star pairs to min id 101
    assert(capped.count(_._2 <= 4L) == 6)
    val star = capped.filter(p => p._1 >= 101L || p._2 >= 101L)
    assert(star.size == 999 && star.forall(_._1 == 101L), s"got ${star.take(5)}")
    // decision preservation: every hot-bucket member stays connected to
    // the bucket canonical (min id) — keep-one-drop-rest reaches the
    // same survivors as the uncapped enumeration
    def survivors(pairs: Set[(Long, Long)]): Set[Long] = {
      val droppedIds = pairs.map(_._2)
      rows.map(_._2).toSet -- droppedIds
    }
    assert(survivors(capped) == survivors(uncapped))
  }

  test("sharedSigPairs: true shared counts, capped == uncapped decisions on a 1000x-shared-sig fixture") {
    import spark.implicits._
    // videos 1 and 2 share sig keys (0,"x") and (1,"y") -> n_shared 2;
    // video 3 shares only (0,"x") with them -> below minShared;
    // 1000 clip replicas (ids 100..1099) all share the SAME 3 keys —
    // the corpus-wide-bumper hot bucket
    val organic = Seq(
      (1L, 0, "x"), (1L, 1, "y"), (1L, 2, "z1"),
      (2L, 0, "x"), (2L, 1, "y"), (2L, 2, "z2"),
      (3L, 0, "x"), (3L, 1, "q"), (3L, 2, "z3"))
    val hot = (100L until 1100L).flatMap(i =>
      Seq((i, 10, "h0"), (i, 11, "h1"), (i, 12, "h2")))
    val sigs = (organic ++ hot).toDF("id", "f", "s")

    val uncapped = Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
      minShared = 2, maxBucket = 0)
    val capped = Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
      minShared = 2, maxBucket = 8)

    // organic pair found with its TRUE count in both modes; no (1,3)/(2,3)
    def organicPairs(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("id_a") < 100).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(organicPairs(uncapped) == Set((1L, 2L, 2L)))
    assert(organicPairs(capped) == Set((1L, 2L, 2L)))

    // hot bucket: uncapped enumerates ~500k pairs, capped stays linear
    // (star pairs to the replica-group min, each verified at TRUE count 3)
    assert(uncapped.count() == 1 + 1000L * 999 / 2)
    val star = capped.filter(col("id_a") >= 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(star.length == 999 && star.forall(p => p._1 == 100L && p._3 == 3L))

    // DECISIONS (keep-min-drop-rest) identical in both modes
    def dropped(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
    assert(dropped(capped) == dropped(uncapped))
  }

  test("sharedSigPairs: DOCUMENTED boundary — different-min over-cap buckets can split a component the uncapped run joins") {
    import spark.implicits._
    // x=5000, y=5001 share exactly 2 keys, BOTH sitting in over-cap
    // buckets whose mins DIFFER (100 and 2000) — and both x,y are
    // NON-MIN in each bucket. Every other member carries only its own
    // bucket's key, so each star pair (min, x) verifies at true count
    // 1 < minShared and is filtered (precision-first: keeping it would
    // fuse every member of a boilerplate bucket at n_shared = 1).
    // The uncapped run reports (5000, 5001, 2); the capped run reports
    // nothing — the trade-off the scaladoc documents, pinned here.
    val h1 = (100L until 1100L).map(i => (i, 0, "h1"))
    val h2 = (2000L until 3000L).map(i => (i, 1, "h2"))
    val xy = Seq((5000L, 0, "h1"), (5000L, 1, "h2"),
      (5001L, 0, "h1"), (5001L, 1, "h2"))
    val sigs = (h1 ++ h2 ++ xy).toDF("id", "f", "s")
    val uncapped = Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
      minShared = 2, maxBucket = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(uncapped == Set((5000L, 5001L, 2L)),
      s"uncapped must find the organic pair, got $uncapped")
    val capped = Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
      minShared = 2, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped.isEmpty,
      s"different-min star pairs verify below minShared and are " +
        s"(deliberately) filtered, got $capped")
  }

  test("cappedPairsByKey: maxBucket = 1 routes EVERY bucket as stars; empty and singleton inputs yield no pairs") {
    import spark.implicits._
    val df = ((1L to 5L).map(i => ("A", i)) ++ Seq(("B", 9L))).toDF("k", "id")
    // every >=2 bucket over the cap -> pure star routing to the min
    val star = Dedup.cappedPairsByKey(df, "id", Seq("k"), maxBucket = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == (2L to 5L).map((1L, _)).toSet, s"got $star")
    // singleton bucket and empty input contribute nothing
    assert(Dedup.cappedPairsByKey(Seq(("X", 1L)).toDF("k", "id"),
      "id", Seq("k"), maxBucket = 8).count() == 0)
    assert(Dedup.cappedPairsByKey(Seq.empty[(String, Long)].toDF("k", "id"),
      "id", Seq("k"), maxBucket = 8).count() == 0)
  }

  test("sharedSigPairs: minShared = 1 keeps single-key pairs and star pairs verify at their true counts") {
    import spark.implicits._
    val sigs = Seq((1L, 0, "x"), (2L, 0, "x"), (2L, 1, "y"), (3L, 1, "y"))
      .toDF("id", "f", "s")
    val got = Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
        minShared = 1, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)), s"got $got")
  }

  test("sharedSigPairs: a one-shared-key bumper stays below minShared in both modes, capped emits linear candidates") {
    import spark.implicits._
    // 500 distinct videos each containing the SAME intro frame plus
    // unique content: no pair shares >= 2 keys, so NOTHING is a dup —
    // and the capped run must reach that verdict without enumerating
    // the 125k-pair bumper bucket
    val rows = (1L to 500L).flatMap(i =>
      Seq((i, 0, "bumper"), (i, 1, s"u$i"), (i, 2, s"v$i")))
    val sigs = rows.toDF("id", "f", "s")
    assert(Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
      minShared = 2, maxBucket = 16).count() == 0)
    assert(Dedup.sharedSigPairs(sigs, "id", Seq("f", "s"),
      minShared = 2, maxBucket = 0).count() == 0)
    // candidate generation itself is linear under the cap
    assert(Dedup.cappedPairsByKey(sigs, "id", Seq("f", "s"),
      maxBucket = 16).count() == 499)
  }
}
