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

  /** Called once per partition after the last `embed` call — the hook
    * for releasing native resources (ONNX sessions hold off-heap
    * memory; a long-lived executor that never closes them leaks native
    * buffers across jobs). Must be idempotent; pure-JVM embedders keep
    * the default no-op.
    */
  def close(): Unit = ()

  def embed(text: String): Array[Float]

  /** Batched inference — the shape a real model session is fed (B texts
    * in, B×dim out). Default delegates row-wise; batch-native models
    * (e.g. `QuantizedMlpEmbedder`) override with a true batched forward
    * pass.
    */
  def embedBatch(texts: Array[String]): Array[Array[Float]] =
    texts.map(embed)
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

/** Quantized integer-arithmetic mini-model: a real (if tiny) neural
  * forward pass standing in for the ONNX/JNI session the sandbox can't
  * host, exercising everything a production embedder needs from the
  * Spark side — per-partition weight load (`open`), BATCHED inference
  * (B×tokDim → B×hidden → B×dim GEMM loops), int8 weights with integer
  * accumulation and requantization (the int8-inference discipline of
  * quantized transformer runtimes).
  *
  * Pipeline per batch: whitespace tokens → md5-derived int8 token
  * vectors, integer mean-pool → int8 dense W1 + ReLU + >>6 requantize →
  * int8 dense W2 → L2-normalized float32. Every intermediate is exact
  * integer arithmetic, so results are bit-stable across partitionings,
  * batch sizes, and JVMs; weights are md5-derived from `seed` at
  * `open()` time (~4 KB — the "bundled model").
  *
  * Reference anchor: replaces SentenceTransformers MiniLM at
  * `rag_demo/ingest.py:27` behind the same `Embedder` boundary.
  */
final case class QuantizedMlpEmbedder(dim: Int = 32, hidden: Int = 48,
                                      tokDim: Int = 32, seed: Long = 11L)
    extends Embedder {
  require(tokDim % 16 == 0, "tokDim must be a multiple of the md5 block (16 bytes)")

  @transient private var w1: Array[Byte] = _ // hidden × tokDim, row-major
  @transient private var w2: Array[Byte] = _ // dim × hidden, row-major

  /** Model load: materialize the int8 weight matrices (once per
    * partition in the `Embed` pipelines).
    */
  override def open(): Unit = {
    w1 = genWeights("w1", hidden * tokDim)
    w2 = genWeights("w2", dim * hidden)
  }

  private def ensureOpen(): Unit = if (w1 == null) open()

  private def genWeights(name: String, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // md5₆₀ % 255 - 127 ∈ [-127, 127]
      a(i) = ((Md5Kernel.hash60(s"$seed:$name:$i".getBytes("UTF-8")) % 255) - 127).toByte
      i += 1
    }
    a
  }

  @transient private lazy val ws = Pattern.compile("\\s+")

  /** int8 token vector: tokDim signed bytes from chained md5 digests. */
  private def tokenVec(tok: String): Array[Byte] = {
    val out = new Array[Byte](tokDim)
    var block = 0
    while (block * 16 < tokDim) {
      val d = Md5Kernel.digest(s"$seed:e$block:$tok".getBytes("UTF-8"))
      System.arraycopy(d, 0, out, block * 16, 16)
      block += 1
    }
    out
  }

  override def embed(text: String): Array[Float] =
    embedBatch(Array(text))(0)

  override def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    ensureOpen()
    val b = texts.length
    // ---- pool: integer mean of int8 token vectors → B × tokDim ----
    val pooled = Array.ofDim[Int](b, tokDim)
    var r = 0
    while (r < b) {
      val t = texts(r).trim
      if (t.nonEmpty) {
        val toks = ws.split(t, -1)
        val acc = new Array[Long](tokDim)
        var i = 0
        while (i < toks.length) {
          val tv = tokenVec(toks(i))
          var j = 0
          while (j < tokDim) { acc(j) += tv(j); j += 1 }
          i += 1
        }
        var j = 0
        while (j < tokDim) { pooled(r)(j) = (acc(j) / toks.length).toInt; j += 1 }
      }
      r += 1
    }
    // ---- layer 1: h = clamp(relu(W1 · p) >> 6) — B × hidden GEMM ----
    val h = Array.ofDim[Int](b, hidden)
    r = 0
    while (r < b) {
      var o = 0
      while (o < hidden) {
        var acc = 0L
        var j = 0
        val base = o * tokDim
        while (j < tokDim) { acc += w1(base + j) * pooled(r)(j); j += 1 }
        val relu = if (acc > 0) acc >> 6 else 0L
        h(r)(o) = math.min(relu, 127L).toInt
        o += 1
      }
      r += 1
    }
    // ---- layer 2 + normalize: out = l2norm(W2 · h) — B × dim GEMM ----
    val out = new Array[Array[Float]](b)
    r = 0
    while (r < b) {
      val acc = new Array[Long](dim)
      var o = 0
      while (o < dim) {
        var s = 0L
        var j = 0
        val base = o * hidden
        while (j < hidden) { s += w2(base + j) * h(r)(j); j += 1 }
        acc(o) = s
        o += 1
      }
      var n2 = 0.0
      o = 0
      while (o < dim) { n2 += acc(o).toDouble * acc(o).toDouble; o += 1 }
      val n = math.max(math.sqrt(n2), 1e-12)
      val v = new Array[Float](dim)
      o = 0
      while (o < dim) { v(o) = (acc(o) / n).toFloat; o += 1 }
      out(r) = v
      r += 1
    }
    out
  }
}

/** Transformer-shaped quantized embedder: one integer self-attention
  * block in front of the output projection — the minimal forward pass
  * with the SHAPE a production sentence-transformer session has
  * (token sequence → positional encoding → Q/K/V projections →
  * content-dependent token mixing → pooled projection), standing in for
  * the MiniLM ONNX session at reference `rag_demo/ingest.py:27` behind
  * the same `Embedder` boundary.
  *
  * Integer discipline throughout (the int8-runtime convention):
  *  - token/position vectors are md5-derived int8; their sum is clamped
  *    back to int8 range;
  *  - Q/K/V are int8 GEMMs with long accumulation, >>7 requantize,
  *    clamp to [-127, 127];
  *  - attention is RECTIFIED-LINEAR (ReLA, Zhang et al. 2021: softmax →
  *    relu keeps attention integer-exact — no exp, so no cross-JVM ulp
  *    drift): w_ij = max(q_i·k_j, 0) with a +1 self-edge so the
  *    normalizing sum is never zero; the weighted value average uses
  *    floorDiv;
  *  - mean-pool over attended tokens, int8 output GEMM, L2-normalize to
  *    float32 only at the very end.
  * Every intermediate is exact integer arithmetic → bit-stable across
  * partitionings, batch sizes, and JVMs (EmbedRagSpec pins this, plus
  * the property the MLP embedder can't have: TOKEN ORDER matters).
  *
  * `embedBatch` is a true batched path: the md5 token-vector table is
  * built once per batch (deduped across rows) — the analogue of a real
  * session amortizing tokenization/transfer per call.
  */
final case class QuantizedAttentionEmbedder(dim: Int = 32, tokDim: Int = 32,
                                            maxLen: Int = 64, seed: Long = 17L)
    extends Embedder {
  require(tokDim % 16 == 0, "tokDim must be a multiple of the md5 block (16 bytes)")

  @transient private var wq: Array[Byte] = _ // tokDim × tokDim, row-major
  @transient private var wk: Array[Byte] = _
  @transient private var wv: Array[Byte] = _
  @transient private var wo: Array[Byte] = _ // dim × tokDim, row-major
  @transient private var pos: Array[Array[Byte]] = _ // maxLen × tokDim

  override def open(): Unit = {
    wq = genWeights("wq", tokDim * tokDim)
    wk = genWeights("wk", tokDim * tokDim)
    wv = genWeights("wv", tokDim * tokDim)
    wo = genWeights("wo", dim * tokDim)
    pos = Array.tabulate(maxLen)(p => tokenBytes(s"pos:$p"))
  }

  private def ensureOpen(): Unit = if (wq == null) open()

  private def genWeights(name: String, n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) {
      a(i) = ((Md5Kernel.hash60(s"$seed:$name:$i".getBytes("UTF-8")) % 255) - 127).toByte
      i += 1
    }
    a
  }

  /** tokDim signed bytes from chained md5 digests of `key`. */
  private def tokenBytes(key: String): Array[Byte] = {
    val out = new Array[Byte](tokDim)
    var block = 0
    while (block * 16 < tokDim) {
      val d = Md5Kernel.digest(s"$seed:a$block:$key".getBytes("UTF-8"))
      System.arraycopy(d, 0, out, block * 16, 16)
      block += 1
    }
    out
  }

  @transient private lazy val wsPat = Pattern.compile("\\s+")

  private def clamp8(v: Long): Int =
    if (v > 127L) 127 else if (v < -127L) -127 else v.toInt

  /** int8 GEMV with >>7 requantize: y = clamp((W · x) >> 7). */
  private def proj(w: Array[Byte], x: Array[Int]): Array[Int] = {
    val out = new Array[Int](tokDim)
    var o = 0
    while (o < tokDim) {
      var acc = 0L
      var j = 0
      val base = o * tokDim
      while (j < tokDim) { acc += w(base + j) * x(j); j += 1 }
      out(o) = clamp8(acc >> 7)
      o += 1
    }
    out
  }

  override def embed(text: String): Array[Float] =
    embedBatch(Array(text))(0)

  override def embedBatch(texts: Array[String]): Array[Array[Float]] = {
    ensureOpen()
    // batch-shared token table: md5 work deduped across the whole call
    val tokCache = new java.util.HashMap[String, Array[Byte]]()
    def tokVec(t: String): Array[Byte] = {
      var v = tokCache.get(t)
      if (v == null) { v = tokenBytes(s"tok:$t"); tokCache.put(t, v) }
      v
    }
    texts.map { text =>
      val t = text.trim
      if (t.isEmpty) new Array[Float](dim)
      else {
        val toks = wsPat.split(t, -1)
        val L = math.min(toks.length, maxLen)
        // X_i = clamp(token + position) — int8-range token states
        val x = Array.tabulate(L) { i =>
          val tv = tokVec(toks(i))
          val pv = pos(i)
          Array.tabulate(tokDim)(d => clamp8(tv(d).toLong + pv(d).toLong))
        }
        val q = x.map(proj(wq, _))
        val k = x.map(proj(wk, _))
        val v = x.map(proj(wv, _))
        // rectified-linear attention + mean-pool, all integer
        val pooled = new Array[Long](tokDim)
        var i = 0
        while (i < L) {
          val wRow = new Array[Long](L)
          var wSum = 0L
          var j = 0
          while (j < L) {
            var s = 0L
            var d = 0
            while (d < tokDim) { s += q(i)(d).toLong * k(j)(d); d += 1 }
            val wij = (if (s > 0) s else 0L) + (if (i == j) 1L else 0L)
            wRow(j) = wij
            wSum += wij
            j += 1
          }
          var d = 0
          while (d < tokDim) {
            var num = 0L
            j = 0
            while (j < L) { num += wRow(j) * v(j)(d); j += 1 }
            pooled(d) += Math.floorDiv(num, wSum)
            d += 1
          }
          i += 1
        }
        // output projection over the mean-pooled attended state
        val acc = new Array[Long](dim)
        var o = 0
        while (o < dim) {
          var s = 0L
          var d = 0
          val base = o * tokDim
          while (d < tokDim) { s += wo(base + d) * Math.floorDiv(pooled(d), L); d += 1 }
          acc(o) = s
          o += 1
        }
        var n2 = 0.0
        o = 0
        while (o < dim) { n2 += acc(o).toDouble * acc(o).toDouble; o += 1 }
        val n = math.max(math.sqrt(n2), 1e-12)
        val outV = new Array[Float](dim)
        o = 0
        while (o < dim) { outV(o) = (acc(o) / n).toFloat; o += 1 }
        outV
      }
    }
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
      closeOnExhaustion(embedder, rows.map { r =>
        val text = if (r.isNullAt(idx)) "" else r.getString(idx)
        Row.fromSeq(r.toSeq :+ (embedder.embed(text).toSeq))
      })
    }(Encoders.row(schema))
  }

  /** Wrap a partition iterator so `embedder.close()` fires exactly once
    * when the iterator is exhausted — the release half of the
    * open-once-per-partition contract (native ONNX sessions must not
    * outlive the partition). Exhaustion alone is not enough: a `limit`/
    * `take` that short-circuits, or an exception thrown mid-partition by
    * `embed`/`embedBatch`, abandons the iterator without draining it —
    * so the close is ALSO registered as a task-completion listener
    * (fires on success, failure, and cancellation alike). The two paths
    * share one flag, so `close()` still fires exactly once per
    * partition whichever path gets there first.
    */
  private def closeOnExhaustion(embedder: Embedder,
                                it: Iterator[Row]): Iterator[Row] = {
    val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def closeOnce(): Unit =
      if (closed.compareAndSet(false, true)) embedder.close()
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeOnce())
    new Iterator[Row] {
      override def hasNext: Boolean = {
        val h = it.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): Row = it.next()
    }
  }

  /** `withEmbedding` through the BATCHED inference path: rows are fed to
    * `embedder.embedBatch` in `batchSize` groups — the feeding pattern a
    * real model session needs to amortize per-call overhead (GPU kernel
    * launch / JNI crossing / ONNX session dispatch). Semantics are
    * identical to `withEmbedding` (EmbedRagSpec asserts agreement).
    */
  def withEmbeddingBatched(df: DataFrame, textCol: String, outCol: String,
                           embedder: Embedder, batchSize: Int = 64): DataFrame = {
    require(batchSize >= 1)
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      embedder.open()
      closeOnExhaustion(embedder, rows.grouped(batchSize).flatMap { chunk =>
        val texts = chunk.map(r => if (r.isNullAt(idx)) "" else r.getString(idx)).toArray
        val vecs = embedder.embedBatch(texts)
        chunk.iterator.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ vecs(i).toSeq)
        }
      })
    }(Encoders.row(schema))
  }
}
