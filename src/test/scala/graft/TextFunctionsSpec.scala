package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

class TextFunctionsSpec extends SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("chunks: non-overlapping n-token windows, last chunk short (ingest.py:22-25 semantics)") {
    val r = docs("a b c d e f g").select(T.chunks(col("text"), 3)).head.getSeq[String](0)
    assert(r == Seq("a b c", "d e f", "g"))
  }

  test("chunks: text shorter than n gives one chunk; empty text gives none") {
    assert(docs("x y").select(T.chunks(col("text"), 5)).head.getSeq[String](0) == Seq("x y"))
    assert(docs("").select(T.chunks(col("text"), 5)).head.getSeq[String](0).isEmpty)
    assert(docs("   ").select(T.chunks(col("text"), 5)).head.getSeq[String](0).isEmpty)
  }

  test("chunks: exact multiple of n has no trailing short chunk") {
    val r = docs("a b c d").select(T.chunks(col("text"), 2)).head.getSeq[String](0)
    assert(r == Seq("a b", "c d"))
  }

  test("repetition signals: hand-computed fractions on a repetitive doc") {
    // toks = [the,cat,the,cat,the,dog]: 6 total, 3 distinct
    // 2-grams = [the cat, cat the, the cat, cat the, the dog]: 5 total, 3 distinct
    val df = docs("the cat the cat the dog")
    val r = df.select(
      T.dupFraction(T.tokens(col("text"))),
      T.dupFraction(T.ngrams(col("text"), 2)),
      T.maxRepeat(T.ngrams(col("text"), 2)),
      T.repeatedCharFraction(T.tokens(col("text")))).head
    assert(math.abs(r.getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(1) - 0.4) < 1e-12)
    assert(r.getLong(2) == 2L)
    // repeated chars: "the"*3 + "cat"*2 = 15 of 18 total
    assert(math.abs(r.getDouble(3) - 15.0 / 18.0) < 1e-12)
    // empty + single-token edges
    val e = docs("", "solo").select(
      T.dupFraction(T.tokens(col("text"))),
      T.maxRepeat(T.ngrams(col("text"), 2)),
      T.repeatedCharFraction(T.tokens(col("text")))).collect()
    e.foreach { row =>
      assert(row.getDouble(0) == 0.0 && row.getLong(1) == 0L && row.getDouble(2) == 0.0)
    }
  }

  test("RepeatStats native kernel agrees with the HOF specs on fixture docs") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = docs("", "solo", "a a a", "x y x y x")
    Seq(fixture, edge).foreach { df =>
      val toks = T.tokens(col("text"))
      val g2 = T.ngrams(col("text"), 2)
      val bad = df.select(
          T.maxRepeat(toks).as("a1"), T.maxRepeatHof(toks).as("a2"),
          T.maxRepeat(g2).as("b1"), T.maxRepeatHof(g2).as("b2"),
          T.repeatedCharFraction(toks).as("c1"),
          T.repeatedCharFractionHof(toks).as("c2"))
        .filter(col("a1") =!= col("a2") || col("b1") =!= col("b2") ||
          col("c1") =!= col("c2"))
        .count()
      assert(bad == 0L)
    }
  }

  test("MinSpan kernel: hand-checked windows, absent term → null") {
    import graft.expressions.MinSpan.minSpanF
    def span(text: String, terms: Seq[String]): Option[Long] = {
      val r = docs(text).select(
        minSpanF(T.tokens(col("text")), typedLit(terms)).as("s")).head
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    assert(span("a x x b", Seq("a", "b")) == Some(4L))
    // tighter window later in the doc wins
    assert(span("a x x b a b", Seq("a", "b")) == Some(2L))
    // repeated left term: latest occurrence shrinks the window
    assert(span("a a b", Seq("a", "b")) == Some(2L))
    assert(span("b a", Seq("a", "b")) == Some(2L))
    assert(span("a a a", Seq("a")) == Some(1L))
    assert(span("a x", Seq("a", "b")) == None)
    assert(span("", Seq("a")) == None)
  }

  test("BpeTrain.train: overlapping pair counts, left-to-right merge, count-then-lex tie-break") {
    import graft.operators.BpeTrain
    // "aaa"×2: pair (a,a) counts 2 per word (overlapping) → cnt 4;
    // merging left-to-right gives [aa, a], NOT [a, aa] or [aa, aa]
    val m1 = BpeTrain.train(Array("aaa" -> 2L), 2)
    assert(m1.head == ((1, "a", "a", 4L)))
    // after merge 1, "aaa" = [aa, a] → step 2 learns (aa, a) with cnt 2
    assert(m1(1) == ((2, "aa", "a", 2L)))
    // tie-break: (a,b) and (c,d) both cnt 1 → lexicographically smaller
    // "a|b" wins
    val m2 = BpeTrain.train(Array("ab" -> 1L, "cd" -> 1L), 1)
    assert(m2.head == ((1, "a", "b", 1L)))
    // exhausted vocab stops early: single-char words learn nothing
    assert(BpeTrain.train(Array("a" -> 5L), 3).isEmpty)
  }

  test("trainWordPiece: likelihood-ratio argmax diverges from BPE's raw count") {
    import graft.operators.BpeTrain
    // "ab" is the most FREQUENT pair (cnt 4) but both symbols are
    // common; "xy" is rare (cnt 2) with rare symbols. BPE picks (a,b);
    // WordPiece's c/(cl·cr) score picks (x,y):
    //   score(a,b) = 4/(6·6)  = 0.111…, score(x,y) = 2/(2·2) = 0.5
    val vocab = Array("ab" -> 4L, "xy" -> 2L, "ba" -> 2L)
    assert(BpeTrain.train(vocab, 1).head == ((1, "a", "b", 4L)))
    val wp = BpeTrain.trainWordPiece(vocab, 1).head
    assert(wp == ((1, "x", "y", 2L, 500000000000L)),
      s"wordpiece must pick the cohesive rare pair, got $wp")
    // exact floor-division score: 4·10¹² / 36 = 111111111111
    val wp2 = BpeTrain.trainWordPiece(Array("ab" -> 4L, "ba" -> 2L), 1)
    assert(wp2.head._5 == 4L * 1000000000000L / 36L)
    // tie-break on equal scores: lexicographically smallest pair
    val tie = BpeTrain.trainWordPiece(Array("ab" -> 1L, "cd" -> 1L), 1)
    assert(tie.head._2 == "a" && tie.head._3 == "b")
  }

  test("CharEntropy native kernel agrees with the HOF spec; hand-checked values") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val edge = docs("", "aaaa", "ab", "abab cdcd", "x")
    Seq(fixture, edge).foreach { df =>
      val bad = df.select(
          T.charEntropyMicro(col("text")).as("k"),
          T.charEntropyMicroHof(col("text")).as("h"))
        .filter(col("k") =!= col("h")).count()
      assert(bad == 0L)
    }
    // "aaaa": one symbol → 0 entropy; "": 0; "ab": 2 equiprobable symbols
    // → ln 2 = 0.693147 nats → 693147 micro-nats (two 346574-rounded
    // terms sum to 693148 — per-term quantization, documented)
    val vals = docs("", "aaaa", "ab")
      .select(col("text"), T.charEntropyMicro(col("text")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vals("") == 0L)
    assert(vals("aaaa") == 0L)
    assert(math.abs(vals("ab") - 693147L) <= 2L)
  }

  test("redactPii: email/phone/ip replaced with typed placeholders; count matches") {
    val txt = "mail a.user+x@sub.example.org, call +1 (415) 555-0199, host 192.168.0.1 ok"
    val r = docs(txt).select(
      T.redactPii(col("text")), T.piiCount(col("text"))).head
    assert(r.getString(0) == "mail <EMAIL>, call <PHONE>, host <IP> ok", r.getString(0))
    assert(r.getLong(1) == 3L)
    // clean text passes through untouched
    val clean = docs("no personal data here at all").select(
      T.redactPii(col("text")), T.piiCount(col("text"))).head
    assert(clean.getString(0) == "no personal data here at all")
    assert(clean.getLong(1) == 0L)
  }

  test("chunkId is deterministic and formatted {doc}::chunk{idx}::{md5[:8]}") {
    val df = docs("hello world")
    val id1 = df.select(T.chunkId(col("doc_id"), lit(0), lit("hello world"))).head.getString(0)
    val id2 = df.select(T.chunkId(col("doc_id"), lit(0), lit("hello world"))).head.getString(0)
    assert(id1 == id2)
    assert(id1.matches("0::chunk0::[0-9a-f]{8}"))
  }

  test("fingerprint is invariant to whitespace collapse and case") {
    val df = docs("Hello   World", "hello world", "  hello\tworld ")
    val fps = df.select(T.fingerprint(col("text"))).collect.map(_.getString(0))
    assert(fps.distinct.length == 1)
  }

  test("fingerprint differs for different content") {
    val fps = docs("abc", "abd").select(T.fingerprint(col("text")))
      .collect.map(_.getString(0))
    assert(fps.distinct.length == 2)
  }

  test("langId picks the language with the strictly dominant stopword count") {
    val df = docs(
      "the cat of the house and a dog",  // en
      "el perro de la casa y los gatos", // es
      "der hund und die katze ist ein")  // de
    val got = df.orderBy("doc_id").select(T.langId(col("text"))).collect.map(_.getString(0))
    assert(got.sameElements(Array("en", "es", "de")))
  }

  test("qualityScore is in [0,1] and increases with length saturation") {
    val df = docs(("word " * 10).trim, ("word " * 200).trim)
    val q = df.orderBy("doc_id").select(T.qualityScore(col("text"))).collect.map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1) > q(0))
  }

  test("bpeTokenCount: letter runs, digit runs, single punct glyphs") {
    // "Hello, world v2.0!" → Hello , world v 2 . 0 ! = 8
    val got = docs("Hello, world v2.0!")
      .select(T.bpeTokenCount(col("text"))).head.getInt(0)
    assert(got == 8)
    assert(docs("").select(T.bpeTokenCount(col("text"))).head.getInt(0) == 0)
  }

  test("bpeEncode: hand-checked merges, leftmost-lowest-rank order, vocab misses stay chars") {
    def enc(w: String): Seq[String] =
      docs(w).select(T.bpeEncode(col("text"))).head.getSeq[String](0)
    // t+h→th, th+e→the (rank chaining), th+is→this (multi-char pair)
    assert(enc("the") == Seq("the"))
    assert(enc("this") == Seq("this"))
    // "and": a|n (rank 3) merges before a bare n|d (not in vocab) → an+d→and
    assert(enc("and") == Seq("and"))
    assert(enc("xqz") == Seq("x", "q", "z"), "no applicable merges → chars")
    assert(enc("") == Seq.empty)
    // leftmost wins among equal-rank occurrences: "inin" → in|in
    assert(enc("inin") == Seq("in", "in"))
  }

  test("native bpeEncode is bit-identical to the HOF bpeEncodeHof on fixture prefixes") {
    val w = regexp_replace(lower(substring(col("text"), 1, 24)), "[^a-z]", "")
    val mismatches = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(T.bpeEncode(w).as("fast"), T.bpeEncodeHof(w).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(mismatches == 0)
    // edge cases beyond the fixture
    val edge = docs("aaaa", "thethethe", "zzzz", "a", "")
    val edgeMismatch = edge
      .select(T.bpeEncode(col("text")).as("fast"),
        T.bpeEncodeHof(col("text")).as("hof"))
      .filter(col("fast") =!= col("hof")).count()
    assert(edgeMismatch == 0)
  }

  test("c4 cleaning: line keep rules and page gate") {
    val page = Seq(
      "A proper first sentence with enough words.", // keep
      "too short",                                  // no punct, <3 words
      "Please enable JavaScript to continue.",      // javascript (case-folded)
      "Is this line long enough to survive?",       // keep
      "ends without punctuation here"               // no terminal punct
    ).mkString("\n")
    val row = docs(page)
      .select(T.c4CleanLines(col("text")).as("clean"),
        T.c4PageOk(col("text")).as("ok"))
      .head
    assert(row.getString(0) ==
      "A proper first sentence with enough words.\nIs this line long enough to survive?")
    assert(row.getBoolean(1))
    // page gates: lorem ipsum and code braces kill the page
    val lorem = page + "\nLorem Ipsum dolor sit amet placeholder text."
    val brace = page + "\nif (x) { return y; }"
    assert(!docs(lorem).select(T.c4PageOk(col("text"))).head.getBoolean(0))
    assert(!docs(brace).select(T.c4PageOk(col("text"))).head.getBoolean(0))
    // minLines: a page with only one surviving line fails the gate
    assert(!docs("Just one good line survives here today.")
      .select(T.c4PageOk(col("text"))).head.getBoolean(0))
  }

  test("rollingHash: order-sensitive (reordering tokens changes it), whitespace-insensitive") {
    val h = (t: String) => docs(t).select(T.rollingHash(col("text"))).head.getLong(0)
    assert(h("a b c") == h("a  b   c"), "whitespace collapse must not change the hash")
    assert(h("a b c") != h("c b a"), "token order must change the hash")
    assert(h("") == 0L, "empty text folds to the init value")
    assert(h("a b c") >= 0 && h("a b c") < 1000000007L)
  }

  test("maskTokens: deterministic hash gate, rate in the right ballpark, empty doc untouched") {
    import spark.implicits._
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    def run(): Seq[String] =
      Seq((7L, text)).toDF("id", "text")
        .select(T.maskTokens(col("id"), col("text"), 15, "mlm"))
        .head.getSeq[String](0)
    val a = run()
    assert(a == run(), "same (id, pos, salt) must mask identically every run")
    assert(a.length == 400, "masking never changes token count")
    val masked = a.count(_ == "[MASK]")
    // hash gate at 15%: expect ~60 of 400 — wide band, the gate is not RNG
    assert(masked > 25 && masked < 100, s"masked $masked of 400")
    // different doc id masks different positions
    val b = Seq((8L, text)).toDF("id", "text")
      .select(T.maskTokens(col("id"), col("text"), 15, "mlm"))
      .head.getSeq[String](0)
    assert(a != b, "gate must depend on the document id")
    // empty doc → empty array (no phantom [MASK] from the zip_with pad)
    assert(Seq((1L, "")).toDF("id", "text")
      .select(T.maskTokens(col("id"), col("text"), 15, "mlm"))
      .head.getSeq[String](0).isEmpty)
  }

  test("spanCorrupt: sentinels numbered in order, spans disjoint, round-trip reassembles") {
    import spark.implicits._
    val text = (1 to 120).map(i => s"w$i").mkString(" ")
    val r = T.spanCorruptDf(Seq((7L, text)).toDF("id", "text"),
        "id", "text", 25, "t5")
      .select("inputs", "targets").head
    val inputs = r.getString(0).split(" ").toSeq
    val targets = r.getString(1).split(" ").toSeq
    val sentinel = "<extra_id_(\\d+)>".r
    val inSent = inputs.collect { case sentinel(k) => k.toInt }
    val tgSent = targets.collect { case sentinel(k) => k.toInt }
    assert(inSent.nonEmpty, "25% gate over 120 tokens must start spans")
    assert(inSent == inSent.indices.toList, s"input sentinels numbered 0..n: $inSent")
    assert(tgSent == inSent, "targets carry the same sentinels in order")
    // each target span hides at most spanLen=3 tokens and at least 1
    val spans = r.getString(1).split("<extra_id_\\d+>").toSeq
      .map(_.trim).filter(_.nonEmpty)
    assert(spans.forall(s => { val n = s.split(" ").length; n >= 1 && n <= 3 }),
      s"span sizes out of range: $spans")
    // splicing each span back in place of its sentinel reassembles the doc
    val rebuilt = inSent.zip(spans).foldLeft(r.getString(0)) {
      case (acc, (k, span)) => acc.replace(s"<extra_id_$k>", span)
    }
    assert(rebuilt == text, "inputs + targets must reassemble the original")
    // masked fraction is in the ballpark of the gate rate
    val hidden = spans.map(_.split(" ").length).sum
    assert(hidden > 10 && hidden < 90, s"hidden $hidden of 120")
    // empty doc → empty struct fields
    val e = T.spanCorruptDf(Seq((1L, "")).toDF("id", "text"),
        "id", "text", 25, "t5")
      .select("inputs", "targets").head
    assert(e.getString(0) == "" && e.getString(1) == "")
  }

  test("fleschScore: hand-checked counts and formula, zero-guard on fragments") {
    import spark.implicits._
    def f(text: String) = Seq((1L, text)).toDF("id", "text")
      .select(T.fleschScore(col("text")).as("f")).select("f.*").head
    // 5 words, 2 sentence runs, 5 vowel groups
    val r = f("The cat sat. It ran!")
    assert(r.getLong(0) == 5 && r.getLong(1) == 2 && r.getLong(2) == 5)
    // 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975
    assert(r.getDouble(3) == 119.6975, r.toString)
    // no terminal punctuation → sentence floor of 1, not a divide-by-zero
    val frag = f("just a fragment")
    assert(frag.getLong(1) == 0 && !frag.getDouble(3).isNaN)
    // empty text → 0 counts, finite score
    assert(!f("").getDouble(3).isNaN)
  }

  test("spanCorrupt: native kernel agrees with the staged-HOF spec") {
    import spark.implicits._
    val docs = ((1 to 40).map(i =>
      (i.toLong, (1 to i * 3).map(j => s"t$j").mkString(" "))) ++
      Seq((98L, ""), (99L, "  "), (100L, "one"))).toDF("id", "text")
    val fast = T.spanCorruptDf(docs, "id", "text", 25, "t5")
      .select("id", "inputs", "targets").collect().sortBy(_.getLong(0))
    val spec = T.spanCorruptDfHof(docs, "id", "text", 25, "t5")
      .select("id", "inputs", "targets").collect().sortBy(_.getLong(0))
    fast.zip(spec).foreach { case (f, s) =>
      assert(f.getString(1) == s.getString(1), s"inputs diverge at id ${f.getLong(0)}")
      assert(f.getString(2) == s.getString(2), s"targets diverge at id ${f.getLong(0)}")
    }
  }

  test("gopherStats: hand-checked signals, bound gating, empty doc") {
    import spark.implicits._
    def stats(text: String) =
      Seq((1L, text)).toDF("id", "text")
        .select(T.gopherStats(col("text")).as("g")).select("g.*").head
    // 60 words, all alphabetic, stopwords present, mean length in range
    val good = (1 to 58).map(i => s"word$i").mkString("the quick ", " ", "")
    val g = stats(good)
    assert(g.getAs[Long]("n_words") == 60)
    assert(g.getAs[Double]("alpha_frac") == 1.0)
    assert(g.getAs[Double]("sym_ratio") == 0.0)
    assert(g.getAs[Long]("stop_hits") == 1L) // only "the"
    assert(!g.getAs[Boolean]("keep"), "needs >= 2 stopword hits")
    val g2 = stats("the " + good) // second stopword occurrence
    assert(g2.getAs[Boolean]("keep"), g2.toString)
    // too short fails the word-count bound even with perfect ratios
    assert(!stats("the quick brown fox and the dog").getAs[Boolean]("keep"))
    // symbol-heavy page fails the symbol-to-word ratio
    val symbols = (1 to 50).map(_ => "#tag").mkString("the of ", " ", "")
    val gs = stats(symbols)
    assert(gs.getAs[Double]("sym_ratio") > 0.9 && !gs.getAs[Boolean]("keep"))
    // numeric-only words drag alpha_frac below the 0.8 gate
    val numeric = (1 to 60).map(i => s"$i").mkString("the of and to ", " ", "")
    val gn = stats(numeric)
    assert(gn.getAs[Double]("alpha_frac") < 0.8 && !gn.getAs[Boolean]("keep"))
    // empty doc → zeroed struct, keep = false
    val ge = stats("")
    assert(ge.getAs[Long]("n_words") == 0L && !ge.getAs[Boolean]("keep"))
  }

  private def extract(html: String): String =
    docs(html).select(T.extractHtmlText(col("text"))).head.getString(0)

  test("extractHtmlText: tags word-separate, script/style bodies vanish") {
    assert(extract("<p>hello</p><p>world</p>") == "hello world")
    assert(extract("<script>var x = '<p>not text</p>';</script>after") == "after")
    assert(extract("<style>p { color: red }</style>after") == "after")
    // case-insensitive element match, attributes allowed
    assert(extract("<SCRIPT type=\"a\">x</SCRIPT>ok") == "ok")
  }

  test("extractHtmlText: comments drop, entities decode, amp decodes last") {
    assert(extract("a<!-- hidden -->b") == "a b")
    assert(extract("Tom &amp; Jerry &lt;3 &quot;q&#39; &nbsp;.") ==
      "Tom & Jerry <3 \"q' .")
    // double-escaped entity stays literal: &amp;lt; → &lt; (not <)
    assert(extract("&amp;lt;") == "&lt;")
  }

  test("extractHtmlText: multi-line elements and whitespace collapse") {
    assert(extract("<div>\n  <span>a</span>\n  b\n</div>\n<script>\nx\ny\n</script>") == "a b")
  }

  test("extractHtmlText: unterminated script/style tails drop (truncated crawl pages)") {
    assert(extract("before<script>var x=1; document.write('hi')") == "before")
    assert(extract("a<style>p { color:") == "a")
    // balanced element earlier in the page still extracts what follows it
    assert(extract("<script>x</script>mid<script>tail never closes") == "mid")
  }

  test("extractHtmlText: self-closing script/style tags are not element openers") {
    // XHTML-style <script .../> has no body — the tail fallback must not
    // swallow the rest of the page
    assert(extract("<script src=\"a.js\"/><p>content</p>") == "content")
    assert(extract("<style type=\"text/css\"/>visible") == "visible")
    // nor may a self-closing tag pair up with a LATER real close tag
    assert(extract("<script src=\"a\"/><p>x</p><script>y</script>z") == "x z")
  }

  test("sentenceChunkRows: whole sentences, prefix-sum budget, bounded overflow") {
    import spark.implicits._
    import graft.functions.{TextFunctions => T}
    val text = "one two three. four five six seven! eight nine? ten"
    val rows = T.sentenceChunkRows(
        Seq((1L, text)).toDF("id", "t"), "t", maxTokens = 5)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // sentences split on terminator+space; last keeps no terminator
    assert(rows.map(_._2).toSeq ==
      Seq("one two three", "four five six seven", "eight nine", "ten"))
    assert(rows.map(_._3).toSeq == Seq(3L, 4L, 2L, 1L))
    // cum-before: 0, 3, 7, 9 → chunks 0, 0, 1, 1 at budget 5
    assert(rows.map(_._4).toSeq == Seq(0L, 0L, 1L, 1L))
    // leading separators yield no empty sentences; blank text yields no rows
    val edge = T.sentenceChunkRows(
      Seq((1L, ". leading"), (2L, "   "), (3L, "no terminator here"))
        .toDF("id", "t"), "t", 5)
      .collect().map(r => r.getLong(0) -> r.getString(2))
    assert(edge.toSeq == Seq(1L -> "leading", 3L -> "no terminator here"))
  }

  test("mojibake: detection counts artifacts; repair round-trips real corruptions") {
    import graft.functions.{TextFunctions => T}
    // corrupt by the actual mechanism: utf-8 bytes re-read as cp1252/latin1
    def corrupt(clean: String, cs: String): String =
      new String(clean.getBytes("UTF-8"), java.nio.charset.Charset.forName(cs))
    val cafe = "café"                      // café
    val quote = "it’s “fine… – ok"         // cp1252-recoverable punctuation
    Seq("windows-1252", "ISO-8859-1").foreach { cs =>
      val badCafe = corrupt(cafe, cs)
      assert(badCafe != cafe)
      assert(T.repairMojibake(badCafe) == cafe, s"$cs: $badCafe")
    }
    val badQuote = corrupt(quote, "windows-1252")
    assert(T.repairMojibake(badQuote) == quote)
    // ” maps through cp1252's UNDEFINED byte 0x9D -> the decoder
    // replaced it; strict repair correctly refuses and passes through
    val lossy = corrupt("”", "windows-1252")
    assert(T.repairMojibake(lossy) == lossy)
    // clean text (even non-ASCII) passes through untouched
    assert(T.repairMojibake(cafe) == cafe)
    assert(T.repairMojibake("plain ascii.") == "plain ascii.")
    assert(T.repairMojibake(null) == null)
    // the column-level count sees the corruption and not the clean text
    import spark.implicits._
    val n = Seq(corrupt(cafe, "ISO-8859-1"), cafe, "x")
      .toDF("t").select(T.mojibakeCount(col("t")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    assert(n == Seq(1L, 0L, 0L), n.toString)
  }
}
