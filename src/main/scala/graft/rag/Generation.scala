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
}
