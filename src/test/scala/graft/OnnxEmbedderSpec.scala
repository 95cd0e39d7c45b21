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

  test("open() without an ONNX runtime raises the documented classpath error") {
    val e = intercept[IllegalStateException] {
      OnnxEmbedder("/nonexistent/model.onnx", "/nonexistent/vocab.txt").open()
    }
    assert(e.getMessage.contains("ONNX Runtime is not on the classpath"))
    assert(e.getMessage.contains("QuantizedAttentionEmbedder"),
      "the error must point at the sandbox fallback")
  }
}
