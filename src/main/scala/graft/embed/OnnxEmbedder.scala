package graft.embed

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

/** Greedy longest-match WordPiece INFERENCE tokenizer (Wu et al. 2016;
  * the encode side of BERT/MiniLM tokenization — the TRAINING side lives
  * in `operators/BpeTrain.learnWordPieceMerges`): lowercase, split on
  * whitespace, split punctuation into single-char tokens, then per word
  * repeatedly take the LONGEST vocab prefix (continuations carry the
  * `##` marker); any word with no matchable piece becomes `[UNK]`.
  * Output is `[CLS] pieces… [SEP]` truncated to `maxLen`, as
  * (input_ids, attention_mask) — exactly what a MiniLM ONNX session
  * consumes.
  *
  * Pure JVM and deterministic, so it is fully spec-testable without any
  * model runtime present (OnnxEmbedderSpec pins greedy matching,
  * continuation pieces, UNK fallback, punctuation splitting and
  * truncation).
  */
object WordPieceTokenizer {

  final case class Vocab(ids: Map[String, Int], clsId: Int, sepId: Int,
                         unkId: Int, padId: Int)

  val Cls = "[CLS]"
  val Sep = "[SEP]"
  val Unk = "[UNK]"
  val Pad = "[PAD]"

  /** Load a BERT-style vocab.txt (one token per line; line number = id). */
  def loadVocab(path: String): Vocab = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
    val ids = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i < lines.size()) { ids.put(lines.get(i), i); i += 1 }
    fromTokens(ids.toMap)
  }

  /** Vocab from an explicit token → id map (test fixtures). */
  def fromTokens(ids: Map[String, Int]): Vocab = {
    def need(t: String): Int = ids.getOrElse(t,
      throw new IllegalArgumentException(s"vocab is missing required token $t"))
    Vocab(ids, need(Cls), need(Sep), need(Unk), ids.getOrElse(Pad, 0))
  }

  /** BERT's `_is_punctuation`: the four ASCII symbol ranges (which pull
    * in `$`, `+`, `` ` ``, `~` — category S, not P) plus every Unicode
    * P* category. NOT Java's "neither letter nor digit": a math symbol
    * like `∀` (Sm) stays inside its word, exactly as HF tokenizes it.
    */
  private def isPunct(c: Char): Boolean = {
    val cp = c.toInt
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
    (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
      val t = Character.getType(c)
      t == Character.CONNECTOR_PUNCTUATION ||
      t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION ||
      t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION ||
      t == Character.OTHER_PUNCTUATION
    }
  }

  /** BERT's `_is_whitespace`: \t \n \r, space, or category Zs — which
    * includes U+00A0 NBSP (Java's isWhitespace does NOT).
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      Character.getType(c) == Character.SPACE_SEPARATOR

  /** BERT's `_is_chinese_char` CJK-ideograph ranges (each becomes its
    * own token — CJK has no whitespace word boundaries).
    */
  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  /** The full do_lower_case=True BERT BasicTokenizer recipe (HF
    * `BasicTokenizer.tokenize`): clean (drop NUL/U+FFFD/control chars,
    * normalize whitespace), isolate CJK ideographs as single-char
    * tokens, lowercase with Locale.ROOT (BERT's lowercasing is
    * locale-independent; the default-locale overload would turn 'I'
    * into dotless 'ı' on a tr_TR JVM), strip accents (NFD, drop Mn
    * combining marks), then whitespace-split with punctuation isolated
    * into standalone single-char tokens.
    */
  def basicTokens(text: String): Array[String] = {
    // clean + CJK isolation (surrogate-pair aware for non-BMP CJK)
    val cleaned = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val typ = Character.getType(cp)
      val control = cp != '\t' && cp != '\n' && cp != '\r' &&
        (typ == Character.CONTROL || typ == Character.FORMAT ||
          typ == Character.UNASSIGNED || typ == Character.PRIVATE_USE ||
          typ == Character.SURROGATE)
      if (cp == 0 || cp == 0xFFFD || control) ()
      else if (isCjk(cp)) {
        cleaned.append(' '); cleaned.appendCodePoint(cp); cleaned.append(' ')
      } else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
          typ == Character.SPACE_SEPARATOR)
        cleaned.append(' ')
      else cleaned.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // lowercase + accent strip: NFD then drop NON_SPACING_MARK
    val nfd = java.text.Normalizer.normalize(
      cleaned.toString.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFD)
    val out = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    var j = 0
    while (j < nfd.length) {
      val c = nfd.charAt(j)
      if (Character.getType(c) == Character.NON_SPACING_MARK) ()
      else if (isWs(c)) flush()
      else if (isPunct(c)) { flush(); out += c.toString }
      else cur.append(c)
      j += 1
    }
    flush()
    out.toArray
  }

  /** Greedy longest-match pieces for one basic token. */
  def wordPieces(word: String, vocab: Vocab,
                 maxCharsPerWord: Int = 200): Array[Int] = {
    if (word.length > maxCharsPerWord) return Array(vocab.unkId)
    val out = ArrayBuffer.empty[Int]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found = -1
      while (end > start && found < 0) {
        val piece =
          (if (start > 0) "##" else "") + word.substring(start, end)
        vocab.ids.get(piece) match {
          case Some(id) => found = id
          case None => end -= 1
        }
      }
      if (found < 0) return Array(vocab.unkId) // whole word → UNK
      out += found
      start = end
    }
    out.toArray
  }

  /** `[CLS] pieces… [SEP]`, truncated to `maxLen` (the SEP always
    * survives truncation — BERT convention), plus the all-ones
    * attention mask.
    */
  def encode(text: String, vocab: Vocab,
             maxLen: Int): (Array[Long], Array[Long]) = {
    require(maxLen >= 2, s"maxLen must fit [CLS] and [SEP], got $maxLen")
    val pieces = basicTokens(text).flatMap(wordPieces(_, vocab))
    val body = pieces.take(maxLen - 2)
    val ids = new Array[Long](body.length + 2)
    ids(0) = vocab.clsId.toLong
    var i = 0
    while (i < body.length) { ids(i + 1) = body(i).toLong; i += 1 }
    ids(body.length + 1) = vocab.sepId.toLong
    (ids, Array.fill(ids.length)(1L))
  }
}

/** REAL-weights embedding boundary: a MiniLM-class ONNX session driven
  * through the same per-partition `Embedder` contract the quantized
  * stand-ins proved (reference `rag_demo/ingest.py:27` —
  * `SentenceTransformer("all-MiniLM-L6-v2")`).
  *
  * The session is loaded REFLECTIVELY (`ai.onnxruntime.*`), so this file
  * compiles and ships with zero added dependencies; at runtime it needs
  * `onnxruntime-<ver>.jar` on the executor classpath (`spark.jars`) plus
  * the exported model + vocab on each executor's filesystem. This
  * container has no ONNX runtime and no network egress, so `open()`
  * here raises the documented IllegalStateException — that error path,
  * the tokenizer, and the pooling arithmetic are what the spec pins;
  * a deployment with the jar present changes nothing but the classpath.
  *
  * Inference recipe (the sentence-transformers export convention):
  * WordPiece encode → session.run(input_ids, attention_mask
  * [, token_type_ids = 0]) → last_hidden_state [B, L, H] →
  * attention-mask MEAN-POOL over tokens → L2 normalize. Per-partition
  * lifecycle: `open()` once (env + session + vocab), then batched
  * `embedBatch` calls — the exact shape `Embed.withEmbeddingBatched`
  * feeds.
  */
final case class OnnxEmbedder(modelPath: String, vocabPath: String,
                              dim: Int = 384, maxLen: Int = 256,
                              withTokenTypes: Boolean = true)
    extends Embedder {

  @transient private var vocab: WordPieceTokenizer.Vocab = _
  @transient private var env: AnyRef = _
  @transient private var session: AnyRef = _
  @transient private var tensorClass: Class[_] = _

  override def open(): Unit = {
    val envClass =
      try Class.forName("ai.onnxruntime.OrtEnvironment")
      catch {
        case _: ClassNotFoundException =>
          throw new IllegalStateException(
            "ONNX Runtime is not on the classpath. Real-weight embedding " +
              "needs com.microsoft.onnxruntime:onnxruntime on spark.jars " +
              "and the exported MiniLM model at " + modelPath +
              "; in sandboxes without it, use QuantizedAttentionEmbedder " +
              "(same Embedder boundary, deterministic stand-in weights).")
      }
    vocab = WordPieceTokenizer.loadVocab(vocabPath)
    env = envClass.getMethod("getEnvironment").invoke(null)
    session = envClass
      .getMethod("createSession", classOf[String])
      .invoke(env, modelPath)
    tensorClass = Class.forName("ai.onnxruntime.OnnxTensor")
  }

  private def ensureOpen(): Unit = if (session == null) open()

  override def embed(text: String): Array[Float] =
    embedBatch(Array(text))(0)

  override def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    ensureOpen()
    val encoded = texts.map(WordPieceTokenizer.encode(_, vocab, maxLen))
    val maxB = math.max(1, encoded.map(_._1.length).max)
    // right-pad to the batch max (PAD id, mask 0) — one rectangular tensor
    val ids = encoded.map { case (i, _) =>
      i ++ Array.fill(maxB - i.length)(vocab.padId.toLong)
    }
    val mask = encoded.map { case (_, m) => m ++ Array.fill(maxB - m.length)(0L) }
    val create = tensorClass.getMethod("createTensor",
      Class.forName("ai.onnxruntime.OrtEnvironment"),
      classOf[Object])
    // OnnxTensor wraps NATIVE (off-heap) memory — every tensor created
    // for a batch must be close()d or a corpus-scale job leaks native
    // buffers until the executor dies. Track them all; release in finally.
    val created = ArrayBuffer.empty[AnyRef]
    def tensor(a: Array[Array[Long]]): AnyRef = {
      val t = create.invoke(null, env, a).asInstanceOf[AnyRef]
      created += t
      t
    }
    var result: AnyRef = null
    try {
      val inputs = new java.util.HashMap[String, AnyRef]()
      inputs.put("input_ids", tensor(ids))
      inputs.put("attention_mask", tensor(mask))
      if (withTokenTypes)
        inputs.put("token_type_ids", tensor(ids.map(_.map(_ => 0L))))
      result = session.getClass
        .getMethod("run", classOf[java.util.Map[String, _]])
        .invoke(session, inputs)
      val first = result.getClass.getMethod("get", classOf[Int])
        .invoke(result, Integer.valueOf(0))
      val hidden = first.getClass.getMethod("getValue").invoke(first)
        .asInstanceOf[Array[Array[Array[Float]]]] // [B, L, H]
      texts.indices.toArray.map { b =>
        meanPoolNormalize(hidden(b), mask(b), dim)
      }
    } finally {
      if (result != null) result.getClass.getMethod("close").invoke(result)
      created.foreach(t => t.getClass.getMethod("close").invoke(t))
    }
  }

  /** Release the native session (idempotent). The OrtEnvironment is a
    * process-wide singleton and is deliberately NOT closed — other
    * partitions on the same executor share it.
    */
  override def close(): Unit = {
    if (session != null) {
      session.getClass.getMethod("close").invoke(session)
      session = null
    }
  }

  /** Mask-weighted mean pool + L2 normalize — pure arithmetic, spec-
    * tested directly (no session needed).
    */
  def meanPoolNormalize(hidden: Array[Array[Float]], mask: Array[Long],
                        d: Int): Array[Float] =
    OnnxEmbedder.meanPoolNormalize(hidden, mask, d)
}

object OnnxEmbedder {
  /** Attention-mask mean pooling over [L, H] then L2 normalization —
    * the sentence-transformers pooling recipe, factored out so the
    * arithmetic is testable without any ONNX runtime present.
    */
  def meanPoolNormalize(hidden: Array[Array[Float]], mask: Array[Long],
                        d: Int): Array[Float] = {
    val acc = new Array[Double](d)
    var n = 0L
    var i = 0
    while (i < hidden.length) {
      if (i < mask.length && mask(i) == 1L) {
        var j = 0
        while (j < d) { acc(j) += hidden(i)(j); j += 1 }
        n += 1
      }
      i += 1
    }
    val m = math.max(n, 1L).toDouble
    var s = 0.0
    var j = 0
    while (j < d) { acc(j) /= m; s += acc(j) * acc(j); j += 1 }
    val norm = math.max(math.sqrt(s), 1e-12)
    val out = new Array[Float](d)
    j = 0
    while (j < d) { out(j) = (acc(j) / norm).toFloat; j += 1 }
    out
  }
}
