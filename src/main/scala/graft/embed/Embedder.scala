package graft.embed

import java.util.regex.Pattern

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.expressions.Md5Kernel

/** Pluggable text-embedding boundary (reference: SentenceTransformers
  * MiniLM at `rag_demo/ingest.py:27,33` / `rag_demo/ask.py:15-16`).
  *
  * Real models (ONNX via JNI) are out of core scope; the contract is the
  * Spark-side plumbing: one `Embedder` instance per PARTITION (model
  * loaded once, not per row — `open()` is the load hook), batched text-in
  * / vector-out, fixed output dimension. `HashingEmbedder` is the
  * deterministic stand-in used by tests and oracles.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Called once per partition before any `embed` call (model load). */
  def open(): Unit = ()

  def embed(text: String): Array[Float]
}

/** Deterministic hashing-trick embedder (feature hashing à la
  * Weinberger et al. 2009): each whitespace token votes ±1 into
  * bucket = md5₆₀(token) mod dim, sign from the next hash bit; the vote
  * vector is L2-normalized.
  *
  * Every intermediate value is an exact small integer in double
  * precision (votes are ±1; the squared norm is an integer), so the
  * result is bit-identical regardless of token order, partitioning, or
  * engine — the property that lets the DuckDB oracle replicate the whole
  * embedding in SQL (q_hash_embed).
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {

  @transient private lazy val ws = Pattern.compile("\\s+")

  override def embed(text: String): Array[Float] = {
    val v = new Array[Double](dim)
    val t = text.trim
    if (t.nonEmpty) {
      val toks = ws.split(t, -1)
      var i = 0
      while (i < toks.length) {
        val h = Md5Kernel.hash60(toks(i).getBytes("UTF-8"))
        val bucket = (h % dim).toInt
        val sign = if (((h / dim) % 2) == 0L) 1.0 else -1.0
        v(bucket) += sign
        i += 1
      }
    }
    var s = 0.0
    var i = 0
    while (i < dim) { s += v(i) * v(i); i += 1 }
    val n = math.max(math.sqrt(s), 1e-12)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (v(i) / n).toFloat; i += 1 }
    out
  }
}

object Embed {

  /** Append an `ARRAY<FLOAT>` embedding column computed by `embedder`
    * over `textCol`, via `mapPartitions` — the embedder opens once per
    * partition (the model-load contract), then maps rows. This is the
    * scalable shape for JNI/ONNX inference: no per-row model state, no
    * driver involvement, parallelism = partitions.
    */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
                    embedder: Embedder): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      embedder.open()
      rows.map { r =>
        val text = if (r.isNullAt(idx)) "" else r.getString(idx)
        Row.fromSeq(r.toSeq :+ (embedder.embed(text).toSeq))
      }
    }(Encoders.row(schema))
  }
}
