package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{OnnxEmbedder, WordPieceTokenizer => W}

class OnnxEmbedderSpec extends AnyFunSuite {

  private val vocab = W.fromTokens(Map(
    "[PAD]" -> 0, "[CLS]" -> 1, "[SEP]" -> 2, "[UNK]" -> 3,
    "the" -> 10, "un" -> 11, "##affable" -> 12, "##able" -> 13,
    "##aff" -> 14, "run" -> 15, "##ning" -> 16, "." -> 17, "," -> 18,
    "a" -> 19))

  test("basicTokens: lowercase, whitespace split, punctuation isolated") {
    assert(W.basicTokens("The  Run, a.").toSeq ==
      Seq("the", "run", ",", "a", "."))
    assert(W.basicTokens("").isEmpty && W.basicTokens("   ").isEmpty)
  }

  test("basicTokens: lowercasing is locale-independent (tr_TR dotless-i trap)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // default-locale toLowerCase would yield dotless 'ı' here,
      // changing token ids vs every other deployment
      assert(W.basicTokens("I LIKE IT").toSeq == Seq("i", "like", "it"))
    } finally java.util.Locale.setDefault(prev)
  }

  test("basicTokens: BERT BasicTokenizer golden fixtures — CJK isolation, accent strip, NBSP, control chars, symbol retention") {
    // Each expectation hand-derived from the published HF
    // BasicTokenizer(do_lower_case=True) algorithm — the strongest
    // real-tokenizer check the no-network sandbox allows.
    // CJK ideographs: one token per character, even inside latin text
    assert(W.basicTokens("天气好").toSeq == Seq("天", "气", "好"))
    assert(W.basicTokens("the天气test").toSeq ==
      Seq("the", "天", "气", "test"))
    // accents strip via NFD + Mn-drop (both precomposed and combining)
    assert(W.basicTokens("Café").toSeq == Seq("cafe"))
    assert(W.basicTokens("Cafe\u0301").toSeq == Seq("cafe"))
    assert(W.basicTokens("naïve résumé").toSeq == Seq("naive", "resume"))
    // U+00A0 NBSP is Zs whitespace in BERT (Java isWhitespace says no)
    assert(W.basicTokens("the\u00A0run").toSeq == Seq("the", "run"))
    // NUL / replacement / control chars are DROPPED (the word joins)
    assert(W.basicTokens("th\u0000e ru\uFFFDn a\u0007b").toSeq ==
      Seq("the", "run", "ab"))
    // ASCII symbol ranges split (BERT punctuation even though category S)
    assert(W.basicTokens("a+b=c").toSeq == Seq("a", "+", "b", "=", "c"))
    // non-ASCII math symbol (Sm) is NOT punctuation — stays in the word
    assert(W.basicTokens("a∀b").toSeq == Seq("a∀b"))
    // Unicode punctuation (Pd em-dash, Pi/Pf quotes) splits
    assert(W.basicTokens("“quote”—end").toSeq ==
      Seq("“", "quote", "”", "—", "end"))
  }

  test("encode: real bert-base-uncased ids for the canonical smoke string") {
    // Token ids from the published bert-base-uncased vocab ([CLS]=101,
    // [SEP]=102, [UNK]=100, hello=7592, world=2088, ','=1010, '!'=999) —
    // a real-model golden fixture small enough to hand-verify.
    val real = W.fromTokens(Map(
      "[PAD]" -> 0, "[UNK]" -> 100, "[CLS]" -> 101, "[SEP]" -> 102,
      "hello" -> 7592, "world" -> 2088, "," -> 1010, "!" -> 999))
    val (ids, mask) = W.encode("Hello, World!", real, maxLen = 128)
    assert(ids.toSeq == Seq(101L, 7592L, 1010L, 2088L, 999L, 102L))
    assert(mask.toSeq == Seq.fill(6)(1L))
  }

  test("wordPieces: greedy LONGEST match with ## continuations") {
    // "unaffable": un + ##affable (greedy takes the longest continuation,
    // not ##aff + ##able)
    assert(W.wordPieces("unaffable", vocab).toSeq == Seq(11, 12))
    assert(W.wordPieces("running", vocab).toSeq == Seq(15, 16))
    // unmatched word → whole-word UNK (BERT semantics), even when a
    // prefix matched
    assert(W.wordPieces("unz", vocab).toSeq == Seq(vocab.unkId))
    assert(W.wordPieces("xyz", vocab).toSeq == Seq(vocab.unkId))
  }

  test("encode: CLS/SEP framing, truncation keeps SEP, mask all-ones") {
    val (ids, mask) = W.encode("the running.", vocab, maxLen = 16)
    assert(ids.toSeq == Seq(1L, 10L, 15L, 16L, 17L, 2L))
    assert(mask.toSeq == Seq.fill(6)(1L))
    val (tids, _) = W.encode("the running.", vocab, maxLen = 4)
    assert(tids.toSeq == Seq(1L, 10L, 15L, 2L), "SEP must survive truncation")
  }

  test("meanPoolNormalize: mask-weighted mean then unit norm; padded rows ignored") {
    val hidden = Array(
      Array(1f, 0f, 0f),
      Array(0f, 2f, 0f),
      Array(100f, 100f, 100f)) // padded row — mask 0
    val v = OnnxEmbedder.meanPoolNormalize(hidden, Array(1L, 1L, 0L), 3)
    // mean = (0.5, 1.0, 0) → norm = sqrt(1.25)
    val n = math.sqrt(1.25)
    assert(math.abs(v(0) - 0.5 / n) < 1e-6 && math.abs(v(1) - 1.0 / n) < 1e-6
      && v(2) == 0f)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
  }

  private def onnxRuntimePresent: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException => false }

  test("open() without an ONNX runtime raises the documented classpath error") {
    assume(!onnxRuntimePresent,
      "onnxruntime jar is on the classpath — the absent-runtime error " +
        "path cannot be exercised (the end-to-end test below runs instead)")
    val e = intercept[IllegalStateException] {
      OnnxEmbedder("/nonexistent/model.onnx", "/nonexistent/vocab.txt").open()
    }
    assert(e.getMessage.contains("ONNX Runtime is not on the classpath"))
    assert(e.getMessage.contains("QuantizedAttentionEmbedder"),
      "the error must point at the sandbox fallback")
  }

  test("END-TO-END real weights (auto-skips without the vendored jar + model): session runs, unit-norm vectors, semantic neighbors outscore strangers") {
    // The one-file-drop deployment path: `lib/*.jar` joins the
    // classpath (build.sbt unmanagedJars), the exported model + vocab
    // land at lib/model.onnx + lib/vocab.txt (or GRAFT_ONNX_MODEL /
    // GRAFT_ONNX_VOCAB). Absent any piece, this CANCELS (not fails) —
    // the sandbox has no egress; a deployment runs it for real.
    val model = sys.env.getOrElse("GRAFT_ONNX_MODEL", "lib/model.onnx")
    val vocabPath = sys.env.getOrElse("GRAFT_ONNX_VOCAB", "lib/vocab.txt")
    assume(onnxRuntimePresent, "no onnxruntime jar in lib/ — drop " +
      "onnxruntime-<ver>.jar there to enable the real-weights run")
    assume(new java.io.File(model).isFile && new java.io.File(vocabPath).isFile,
      s"no model/vocab at $model / $vocabPath — export MiniLM to ONNX " +
        "and place both files (or set GRAFT_ONNX_MODEL/GRAFT_ONNX_VOCAB)")
    val e = OnnxEmbedder(model, vocabPath)
    e.open()
    try {
      val out = e.embedBatch(Array(
        "the cat sat on the mat",
        "a kitten rests on a rug",
        "stochastic gradient descent converges"))
      assert(out.length == 3 && out.forall(_.length == e.dim))
      out.foreach { v =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        assert(math.abs(n - 1.0) < 1e-3, s"not unit-norm: $n")
      }
      def cos(a: Array[Float], b: Array[Float]) =
        a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      assert(cos(out(0), out(1)) > cos(out(0), out(2)),
        "semantically close pair must outscore the unrelated pair")
    } finally e.close()
  }
}
