package graft.rag

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

/** Pluggable LLM-generation boundary (reference: FLAN-T5-small at
  * `rag_demo/ask.py:35-39`). Interface only, per SURVEY.md O16 — model
  * inference is out of the analytics core. The plumbing mirrors
  * `embed.Embedder`: one generator per partition (`open()` loads the
  * model), rows streamed through `mapPartitions`.
  */
trait Generator extends Serializable {
  def open(): Unit = ()
  def generate(prompt: String): String

  /** Batched generation — the shape a real decoder session is fed
    * (B prompts stepped together). Default delegates row-wise;
    * batch-native decoders (`TinyQuantizedLm`) override with true
    * step-synchronized batch decoding.
    */
  def generateBatch(prompts: Array[String]): Array[String] =
    prompts.map(generate)
}

/** Deterministic stand-in: echoes a truncated prompt digest — enough to
  * test the plumbing (schema, per-partition init, batch shape) without a
  * model in the container.
  */
final case class EchoGenerator(maxChars: Int = 160) extends Generator {
  override def generate(prompt: String): String =
    "[echo] " + prompt.takeRight(math.min(prompt.length, maxChars))
}

/** Deterministic extractive answerer: picks the context bullet sharing
  * the most (lower-cased, stopword-stripped) tokens with the question —
  * the classic extractive fallback real RAG stacks ship beside the
  * neural path. Unlike `EchoGenerator` this does the actual selection
  * work over the actual prompt shape (`Rag.ask`: "Context:\n- …\n\n- …
  * \n\nQuestion: …\nAnswer:"); a neural generator (e.g. ONNX seq2seq)
  * drops in behind the same trait without touching the plumbing.
  * Ties break toward the earliest bullet (= highest retrieval score,
  * since `Rag.ask` orders context by score).
  */
final case class ExtractiveGenerator(maxChars: Int = 160) extends Generator {
  private val stop = Set(
    "the", "a", "an", "of", "and", "to", "in", "is", "are", "was",
    "what", "which", "who", "how", "why", "where", "when", "does", "do")

  private def toks(s: String): Set[String] =
    s.toLowerCase.split("[^a-z0-9]+").iterator
      .filter(t => t.nonEmpty && !stop(t)).toSet

  override def generate(prompt: String): String = {
    val ctxStart = prompt.indexOf("Context:\n")
    val qStart = prompt.lastIndexOf("\n\nQuestion:")
    if (ctxStart < 0 || qStart <= ctxStart) return ""
    val context = prompt.substring(ctxStart + "Context:\n".length, qStart)
    val afterQ = prompt.substring(qStart + "\n\nQuestion:".length)
    val question = afterQ.takeWhile(_ != '\n').trim
    val qToks = toks(question)
    val bullets = context.split("\n\n").iterator
      .map(_.stripPrefix("- ").trim).filter(_.nonEmpty).toVector
    if (bullets.isEmpty) return ""
    val best = bullets.zipWithIndex
      .map { case (b, i) => (toks(b).count(qToks), -i, b) }
      .max(Ordering.by((t: (Int, Int, String)) => (t._1, t._2)))
      ._3
    best.take(maxChars)
  }
}

/** Quantized greedy decoder LM: a real (if tiny) autoregressive forward
  * pass standing in for the FLAN-T5 session the sandbox can't host
  * (`rag_demo/ask.py:35-39`) — the generation-side twin of
  * `embed.QuantizedMlpEmbedder`. Exercises everything a production
  * decoder needs from the Spark side: per-partition weight load
  * (`open()`, md5-derived int8 matrix), BATCH-SYNCHRONIZED greedy
  * decoding (all prompts in a batch advance one step per outer
  * iteration — the batching discipline of real LM servers), integer
  * accumulation with relu+shift requantization.
  *
  * The candidate vocabulary is COPY-CONSTRAINED to the prompt's own
  * distinct tokens (pointer-network style), so output stays grounded in
  * the provided context rather than hallucinated from a bundled word
  * list. Per step: pool the last `ctxWindow` token vectors (integer
  * mean) → hid = relu(W·pool)>>6 clamped to int8 range → score each
  * candidate by dot(hid, tokenVec(candidate)) → argmax, ties to the
  * lexicographically-first candidate. All arithmetic is exact integer,
  * so output is bit-stable across partitionings, batch sizes, and JVMs.
  */
final case class TinyQuantizedLm(tokDim: Int = 32, ctxWindow: Int = 16,
                                 maxNewTokens: Int = 12, seed: Long = 23L)
    extends Generator {
  require(tokDim % 16 == 0, "tokDim must be a multiple of the md5 block")

  import graft.expressions.Md5Kernel

  @transient private var w: Array[Byte] = _ // tokDim × tokDim, row-major

  override def open(): Unit = {
    val a = new Array[Byte](tokDim * tokDim)
    var i = 0
    while (i < a.length) {
      a(i) = ((Md5Kernel.hash60(s"$seed:w:$i".getBytes("UTF-8")) % 255) - 127).toByte
      i += 1
    }
    w = a
  }

  private def ensureOpen(): Unit = if (w == null) open()

  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  private def tokenVec(tok: String): Array[Byte] = {
    val out = new Array[Byte](tokDim)
    var block = 0
    while (block * 16 < tokDim) {
      val d = Md5Kernel.digest(s"$seed:t$block:$tok".getBytes("UTF-8"))
      System.arraycopy(d, 0, out, block * 16, 16)
      block += 1
    }
    out
  }

  override def generate(prompt: String): String =
    generateBatch(Array(prompt))(0)

  override def generateBatch(prompts: Array[String]): Array[String] = {
    ensureOpen()
    val b = prompts.length
    // per-prompt decode state: context token vectors (ring of last
    // ctxWindow), copy-vocab with cached vectors, emitted tokens
    val vocab = new Array[Array[String]](b)
    val vocabVecs = new Array[Array[Array[Byte]]](b)
    val ctx = new Array[scala.collection.mutable.ArrayDeque[Array[Byte]]](b)
    val out = Array.fill(b)(new scala.collection.mutable.ArrayBuffer[String])
    var r = 0
    while (r < b) {
      val t = prompts(r).trim
      val toks = if (t.isEmpty) Array.empty[String] else ws.split(t, -1)
      vocab(r) = toks.distinct.sorted
      vocabVecs(r) = vocab(r).map(tokenVec)
      ctx(r) = scala.collection.mutable.ArrayDeque.from(
        toks.takeRight(ctxWindow).map(tokenVec))
      r += 1
    }
    // batch-synchronized greedy decode: one step per outer iteration
    var step = 0
    while (step < maxNewTokens) {
      r = 0
      while (r < b) {
        if (vocab(r).nonEmpty) {
          // integer mean-pool of the context window
          val pool = new Array[Int](tokDim)
          val n = ctx(r).length
          if (n > 0) {
            val acc = new Array[Long](tokDim)
            ctx(r).foreach { tv =>
              var j = 0
              while (j < tokDim) { acc(j) += tv(j); j += 1 }
            }
            var j = 0
            while (j < tokDim) { pool(j) = (acc(j) / n).toInt; j += 1 }
          }
          // hid = clamp(relu(W · pool) >> 6)
          val hid = new Array[Int](tokDim)
          var o = 0
          while (o < tokDim) {
            var acc = 0L
            var j = 0
            val base = o * tokDim
            while (j < tokDim) { acc += w(base + j) * pool(j); j += 1 }
            hid(o) = if (acc > 0) math.min(acc >> 6, 127L).toInt else 0
            o += 1
          }
          // argmax over the copy vocab (ties → first = lexicographic)
          var best = 0
          var bestScore = Long.MinValue
          var c = 0
          while (c < vocab(r).length) {
            val cv = vocabVecs(r)(c)
            var s = 0L
            var j = 0
            while (j < tokDim) { s += hid(j) * cv(j); j += 1 }
            if (s > bestScore) { bestScore = s; best = c }
            c += 1
          }
          out(r) += vocab(r)(best)
          ctx(r).append(vocabVecs(r)(best))
          if (ctx(r).length > ctxWindow) ctx(r).removeHead()
        }
        r += 1
      }
      step += 1
    }
    out.map(_.mkString(" "))
  }
}

object Generation {

  /** Append `outCol` with the generator's output over `promptCol`. */
  def withGeneration(df: DataFrame, promptCol: String, outCol: String,
                     generator: Generator): DataFrame = {
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { rows =>
      generator.open()
      rows.map { r =>
        val p = if (r.isNullAt(idx)) "" else r.getString(idx)
        Row.fromSeq(r.toSeq :+ generator.generate(p))
      }
    }(Encoders.row(schema))
  }

  /** `withGeneration` through the BATCHED decode path: prompts are fed
    * to `generateBatch` in `batchSize` groups — the feeding pattern a
    * real decoder session needs to amortize per-call overhead.
    * Semantics identical to `withGeneration` (EmbedRagSpec asserts
    * agreement).
    */
  def withGenerationBatched(df: DataFrame, promptCol: String, outCol: String,
                            generator: Generator,
                            batchSize: Int = 32): DataFrame = {
    require(batchSize >= 1)
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(promptCol)
    df.mapPartitions { rows =>
      generator.open()
      rows.grouped(batchSize).flatMap { chunk =>
        val prompts = chunk.map(r => if (r.isNullAt(idx)) "" else r.getString(idx)).toArray
        val answers = generator.generateBatch(prompts)
        chunk.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ answers(i))
        }
      }
    }(Encoders.row(schema))
  }
}
