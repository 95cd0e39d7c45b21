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
