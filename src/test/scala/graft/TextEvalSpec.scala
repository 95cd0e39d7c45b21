package graft

import org.apache.spark.sql.functions._
import graft.operators.TextEval

class TextEvalSpec extends SparkSpec {

  private def pairs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "cand", "ref")
  }

  test("bleu2: identical pair scores a perfect 1.0") {
    val out = TextEval.bleu2(
      pairs((0L, "the quick brown fox", "the quick brown fox")),
      "id", "cand", "ref").head
    assert(out.getLong(1) == 4 && out.getLong(2) == 4)      // c_len, r_len
    assert(out.getLong(3) == 4 && out.getLong(4) == 3)      // n1, n2
    assert(out.getLong(5) == 1000000L)                      // bp
    assert(out.getLong(6) == 1000000L)                      // bleu2
  }

  test("bleu2: disjoint pair scores zero; clipping caps repeated tokens") {
    val rows = TextEval.bleu2(pairs(
        (0L, "alpha beta gamma", "delta epsilon zeta"),
        (1L, "the the the the", "the cat sat down")),
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(3) == 0 && rows(0L).getLong(6) == 0)
    // clipped unigram matches: min(count("the" in cand)=4, in ref=1) = 1
    assert(rows(1L).getLong(3) == 1)
    assert(rows(1L).getLong(4) == 0)                        // no shared bigram
    assert(rows(1L).getLong(6) == 0)                        // p2 = 0 -> bleu 0
  }

  test("bleu2: brevity penalty fires only when candidate is shorter") {
    val rows = TextEval.bleu2(pairs(
        (0L, "the quick brown", "the quick brown fox jumps"),   // c < r
        (1L, "the quick brown fox jumps", "the quick brown")),  // c > r
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    val bp0 = rows(0L).getLong(5)
    assert(bp0 == math.round(math.exp(1.0 - 5.0 / 3.0) * 1e6))
    assert(rows(1L).getLong(5) == 1000000L)
    // perfect prefix overlap: short side still pays the penalty
    assert(rows(0L).getLong(6) == bp0)
    assert(rows(0L).getLong(6) < rows(1L).getLong(6))
  }

  test("rougeL: textbook LCS values, perfect pair, and disjoint pair") {
    val rows = TextEval.rougeL(pairs(
        (0L, "a b c b d a b", "b d c a b a"),    // LCS = 4 (b c b a / b d a b)
        (1L, "the quick brown fox", "the quick brown fox"),
        (2L, "alpha beta", "gamma delta")),
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(3) == 4)                        // lcs
    assert(rows(0L).getLong(4) == 4000000L / 7)             // p = 4/7
    assert(rows(0L).getLong(5) == 4000000L / 6)             // r = 4/6
    assert(rows(1L).getLong(3) == 4 &&
      rows(1L).getLong(6) == 1000000L)                      // F1 = 1
    assert(rows(2L).getLong(3) == 0 && rows(2L).getLong(6) == 0)
  }

  test("rougeL: maxToks truncates both sides before the DP") {
    val long = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = TextEval.rougeL(pairs((0L, long, long)),
      "id", "cand", "ref", maxToks = 40).head
    assert(out.getLong(1) == 40 && out.getLong(2) == 40)
    assert(out.getLong(3) == 40 && out.getLong(6) == 1000000L)
  }

  test("LcsLength kernel agrees with the HOF spec on fixture pairs") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val p = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source",
        slice(TextEval.toks($"text"), 1, 12).as("c"),
        slice(TextEval.toks(lead($"text", 1).over(w)), 1, 12).as("r"))
      .filter($"r".isNotNull)
    val mism = p.select(
        graft.expressions.LcsExpression.lcsLengthF($"c", $"r").as("fast"),
        TextEval.lcsLengthHof($"c", $"r").as("spec"))
      .filter($"fast" =!= $"spec").count()
    assert(mism == 0L)
  }

  test("LcsLength: interpreted eval agrees with codegen") {
    import spark.implicits._
    val p = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "a")),
      (Seq.empty[String], Seq("x")),
      (Seq("x"), Seq.empty[String]),
      (Seq("a", "a", "a"), Seq("a", "a"))).toDF("c", "r")
    val fast = p.select(
      graft.expressions.LcsExpression.lcsLengthF($"c", $"r").as("v"))
    val codegen = fast.collect().map(_.getInt(0)).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = fast.collect().map(_.getInt(0)).toSeq
      assert(codegen == interp && codegen == Seq(2, 0, 0, 2))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("squadScore: normalization, exact match, token F1, empty conventions") {
    val rows = TextEval.squadScore(pairs(
        (0L, "The quick FOX!", "quick fox"),        // normalizes to equal
        (1L, "a cat sat", "the cat ran"),           // partial: cat + sat/ran
        (2L, "totally wrong", "right answer"),
        (3L, "the a an", "the an a"),               // all-articles -> both empty
        (4L, "something", "a the")),                // one-sided empty
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getBoolean(1) && rows(0L).getLong(5) == 1000000L)
    val r1 = rows(1L)
    assert(!r1.getBoolean(1))
    // pred [cat, sat], gold [cat, ran]: overlap 1, P = R = 1/2, F1 = 1/2
    assert(r1.getLong(2) == 2 && r1.getLong(3) == 2 && r1.getLong(4) == 1)
    assert(r1.getLong(5) == 500000L)
    assert(rows(2L).getLong(5) == 0L && !rows(2L).getBoolean(1))
    // SQuAD empty-gold convention: both-empty scores EM + full F1
    assert(rows(3L).getBoolean(1) && rows(3L).getLong(5) == 1000000L)
    assert(!rows(4L).getBoolean(1) && rows(4L).getLong(5) == 0L)
  }

  test("groundedness: extractive answers score 1.0, fabrication 0, clipping binds") {
    val rows = TextEval.groundedness(pairs(
        (0L, "the cat sat on the mat", "yesterday the cat sat on the mat quietly"),
        (1L, "aliens built the pyramids", "the cat sat on the mat"),
        (2L, "the cat the cat the cat", "the cat sat"),
        (3L, "x", "anything at all")),  // 1 token -> omitted
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(3) == 1000000L)          // fully grounded
    assert(rows(1L).getLong(2) == 0 && rows(1L).getLong(3) == 0)
    // "the cat" appears 3x in the answer but once in context -> clipped 1;
    // "cat the" 2x vs 0 -> 0. grounded = 1 of 5 bigrams
    assert(rows(2L).getLong(1) == 5 && rows(2L).getLong(2) == 1)
    assert(rows(2L).getLong(3) == 1000000L / 5)
    assert(!rows.contains(3L))
  }

  test("clippedMatches kernel agrees with the HOF spec on fixture pairs") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
    val p = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"source", TextEval.toks($"text").as("c"),
        TextEval.toks(lead($"text", 1).over(w)).as("r"))
      .filter($"r".isNotNull)
    val mism = p.select(
        TextEval.clippedMatches($"c", $"r").as("fast"),
        TextEval.clippedMatchesHof($"c", $"r").as("spec"))
      .filter($"fast" =!= $"spec").count()
    assert(mism == 0)
    // multiset (not set) semantics pinned by hand
    val one = pairs((0L, "a a a b", "a a c")).select(
      TextEval.clippedMatches(TextEval.toks($"cand"),
        TextEval.toks($"ref"))).head.getLong(0)
    assert(one == 2) // min(3,2) for 'a', plus nothing else
  }

  test("bleu2: pairs with an empty side are omitted") {
    val out = TextEval.bleu2(pairs(
        (0L, "", "the cat"), (1L, "the cat", "   "), (2L, "a b", "a b")),
      "id", "cand", "ref")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("chrF: perfect match scores 1.0, disjoint scores 0, asymmetry shows in P vs R") {
    val rows = TextEval.chrF(pairs(
        (0L, "matching text", "matching text"),
        (1L, "aaaa bbbb cccc", "xxxx yyyy zzzz"),
        (2L, "shared prefix words", "shared prefix words and a longer tail")),
      "id", "cand", "ref")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getLong(6) == 1000000L)
    assert(rows(0L).getLong(4) == 1000000L && rows(0L).getLong(5) == 1000000L)
    assert(rows(1L).getLong(3) == 0 && rows(1L).getLong(6) == 0)
    // candidate is a prefix of the reference: precision ~1, recall < 1,
    // and F2 (recall-weighted) sits below precision but above recall
    val (p2, r2, f2) = (rows(2L).getLong(4), rows(2L).getLong(5),
      rows(2L).getLong(6))
    assert(p2 == 1000000L && r2 < p2)
    assert(f2 > r2 && f2 < p2)
    // exact integer formula pinned
    assert(f2 == 5L * p2 * r2 / (4L * p2 + r2))
  }

  test("chrF: trigram-free sides are omitted (alphabet-normalized)") {
    val out = TextEval.chrF(pairs(
        (0L, "!!", "the cat"), (1L, "ab", "cd"), (2L, "abcd", "abcd")),
      "id", "cand", "ref")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
