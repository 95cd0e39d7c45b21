package graft

import org.apache.spark.sql.functions._
import graft.embed.{Embed, HashingEmbedder}
import graft.functions.{VectorFunctions => V}
import graft.rag.Rag

class EmbedRagSpec extends SparkSpec {

  test("HashingEmbedder: deterministic, unit-norm, order-sensitive buckets not order-sensitive result") {
    val e = HashingEmbedder(64)
    val a = e.embed("the quick brown fox")
    val b = e.embed("the quick brown fox")
    assert(a.toSeq == b.toSeq)
    // token order must NOT matter (bag-of-words votes)
    assert(e.embed("fox brown quick the").toSeq == a.toSeq)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(e.embed("").forall(_ == 0.0f))
  }

  test("Embed.withEmbedding appends ARRAY<FLOAT> via mapPartitions, preserving columns") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val out = Embed.withEmbedding(df, "text", "embedding", HashingEmbedder(16))
    assert(out.columns.toSeq == Seq("doc_id", "text", "embedding"))
    val row = out.filter($"doc_id" === 1).head
    assert(row.getSeq[Float](2).length == 16)
    // same text through the column path equals the direct call
    assert(row.getSeq[Float](2).toArray.toSeq ==
      HashingEmbedder(16).embed("alpha beta").toSeq)
  }

  test("Embedder.close() fires exactly once per non-empty partition, after the last row (native-session release contract)") {
    import spark.implicits._
    LifecycleCounters.reset()
    val df = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(4)
    Embed.withEmbedding(df, "text", "embedding", CountingEmbedder(8))
      .count()
    // local[32] shares one JVM, so the object counters see all "executors"
    assert(LifecycleCounters.opens.get() == 4,
      s"open per partition, got ${LifecycleCounters.opens.get()}")
    assert(LifecycleCounters.closes.get() == 4,
      s"close per partition, got ${LifecycleCounters.closes.get()}")
    LifecycleCounters.reset()
    Embed.withEmbeddingBatched(df, "text", "embedding", CountingEmbedder(8), 7)
      .count()
    assert(LifecycleCounters.closes.get() == 4,
      s"batched path must close too, got ${LifecycleCounters.closes.get()}")
    assert(LifecycleCounters.outOfOrder.get() == 0,
      "no embed call may arrive after close")
  }

  test("Embedder.close() fires even when the partition iterator is abandoned early (limit short-circuit)") {
    import spark.implicits._
    LifecycleCounters.reset()
    // one partition, 40 rows, but the action takes only 3 — the wrapper
    // iterator is never drained; the task-completion listener must
    // still release the session (the native-leak path the listener
    // exists for), and exactly once (shared flag with the exhaustion
    // check)
    val df = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1)
    val taken = Embed.withEmbedding(df, "text", "embedding", CountingEmbedder(8))
      .limit(3).collect()
    assert(taken.length == 3)
    assert(LifecycleCounters.opens.get() == LifecycleCounters.closes.get(),
      s"abandoned iterator leaked a session: opens=${LifecycleCounters.opens.get()} " +
        s"closes=${LifecycleCounters.closes.get()}")
    assert(LifecycleCounters.closes.get() >= 1, "at least one partition ran")
  }

  test("QuantizedMlpEmbedder: deterministic int8 forward pass, unit norm, batch == single") {
    import graft.embed.QuantizedMlpEmbedder
    val m = QuantizedMlpEmbedder()
    val texts = Array("the quick brown fox", "jumps over", "", "the quick brown fox",
      "a completely different document about spark")
    val batch = m.embedBatch(texts)
    // fresh instance (fresh weights load) → identical vectors
    val m2 = QuantizedMlpEmbedder()
    assert(batch.map(_.toSeq).toSeq == m2.embedBatch(texts).map(_.toSeq).toSeq)
    // batched forward == row-wise forward, element for element
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(m.embed(t).toSeq == batch(i).toSeq, s"batch/single diverge on '$t'")
    }
    // identical texts → identical vectors; different texts → different
    assert(batch(0).toSeq == batch(3).toSeq)
    assert(batch(0).toSeq != batch(4).toSeq)
    // unit norm (or all-zero for empty text)
    val n0 = math.sqrt(batch(0).map(x => x.toDouble * x).sum)
    assert(math.abs(n0 - 1.0) < 1e-6)
    assert(batch(2).forall(_ == 0.0f) ||
      math.abs(math.sqrt(batch(2).map(x => x.toDouble * x).sum) - 1.0) < 1e-6)
  }

  test("withEmbeddingBatched: per-partition batched inference, partition- and batch-size-independent") {
    import spark.implicits._
    import graft.embed.QuantizedMlpEmbedder
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
    val m = QuantizedMlpEmbedder()
    def run(parts: Int, batchSize: Int): Map[Long, Seq[Float]] =
      Embed.withEmbeddingBatched(docs.repartition(parts), "text", "embedding", m, batchSize)
        .select(col("doc_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val base = run(1, 64)
    assert(base.size == 100)
    assert(run(7, 8) == base, "embeddings must not depend on partitioning or batch size")
    // row-wise plumbing agrees with batched plumbing
    val rowwise = Embed.withEmbedding(docs, "text", "embedding", m)
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rowwise == base)
  }

  test("QuantizedAttentionEmbedder: deterministic transformer-shaped forward, batch == single") {
    import graft.embed.QuantizedAttentionEmbedder
    val m = QuantizedAttentionEmbedder()
    val texts = Array("the quick brown fox jumps", "over the lazy dog", "",
      "the quick brown fox jumps",
      "a completely different document about spark shuffles")
    val batch = m.embedBatch(texts)
    // fresh instance (fresh weight/position load) → identical vectors
    assert(batch.map(_.toSeq).toSeq ==
      QuantizedAttentionEmbedder().embedBatch(texts).map(_.toSeq).toSeq)
    // batched forward (shared token table) == row-wise forward
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(m.embed(t).toSeq == batch(i).toSeq, s"batch/single diverge on '$t'")
    }
    assert(batch(0).toSeq == batch(3).toSeq)
    assert(batch(0).toSeq != batch(4).toSeq)
    // unit norm (empty text is the zero vector)
    assert(math.abs(math.sqrt(batch(0).map(x => x.toDouble * x).sum) - 1.0) < 1e-6)
    assert(batch(2).forall(_ == 0.0f))
  }

  test("QuantizedAttentionEmbedder: token ORDER matters (the property pooling can't have)") {
    import graft.embed.{QuantizedAttentionEmbedder, QuantizedMlpEmbedder}
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "zeta epsilon delta gamma beta alpha"
    val att = QuantizedAttentionEmbedder()
    assert(att.embed(a).toSeq != att.embed(b).toSeq,
      "positional encoding + attention must distinguish permuted token order")
    // contrast: the mean-pooled MLP embedder is order-invariant by design
    val mlp = QuantizedMlpEmbedder()
    assert(mlp.embed(a).toSeq == mlp.embed(b).toSeq)
  }

  test("QuantizedAttentionEmbedder through the batched boundary: partition/batch-size independent") {
    import graft.embed.QuantizedAttentionEmbedder
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    val m = QuantizedAttentionEmbedder()
    def run(parts: Int, batchSize: Int): Map[Long, Seq[Float]] =
      Embed.withEmbeddingBatched(docs.repartition(parts), "text", "embedding", m, batchSize)
        .select(col("doc_id"), col("embedding"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val base = run(1, 64)
    assert(base.size == 60)
    assert(run(5, 7) == base, "embeddings must not depend on partitioning or batch size")
    val rowwise = Embed.withEmbedding(docs, "text", "embedding", m)
      .select(col("doc_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rowwise == base)
  }

  test("Generation.withGeneration streams prompts through a per-partition generator") {
    import spark.implicits._
    import graft.rag.{EchoGenerator, Generation}
    val df = Seq((1L, "prompt one"), (2L, "prompt two")).toDF("id", "prompt")
      .repartition(3)
    val out = Generation.withGeneration(df, "prompt", "answer", EchoGenerator(20))
    assert(out.schema.fieldNames.toSeq == Seq("id", "prompt", "answer"))
    val m = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(1L) == "[echo] prompt one" && m(2L) == "[echo] prompt two")
  }

  test("ExtractiveGenerator answers with the best-overlap context bullet") {
    import spark.implicits._
    import graft.rag.{ExtractiveGenerator, Generation}
    val prompt =
      "Answer strictly from the context.\n\nContext:\n" +
        "- the warehouse ships orders every weekday morning\n\n" +
        "- spark executors cache shuffle blocks on local disk\n\n" +
        "- paris is the capital city of france\n\n" +
        "Question: what is the capital of france\nAnswer:"
    val g = ExtractiveGenerator()
    assert(g.generate(prompt) == "paris is the capital city of france")
    // no context → empty answer; malformed prompt → empty answer
    assert(g.generate("Context:\n\n\nQuestion: q\nAnswer:") == "")
    assert(g.generate("no structure at all") == "")
    // through the mapPartitions plumbing
    val out = Generation.withGeneration(
      Seq((1L, prompt)).toDF("id", "prompt").repartition(2),
      "prompt", "answer", ExtractiveGenerator())
    assert(out.collect().head.getString(2) == "paris is the capital city of france")
  }

  test("TinyQuantizedLm: deterministic, copy-constrained, batch == single") {
    import spark.implicits._
    import graft.rag.{Generation, TinyQuantizedLm}
    val lm = TinyQuantizedLm()
    val prompts = (0 until 12).map(i =>
      (i.toLong, s"alpha$i beta gamma delta$i epsilon zeta eta theta"))
    // batch decode == row-wise decode, for every batch size
    lm.open()
    val single = prompts.map { case (_, p) => lm.generate(p) }
    Seq(1, 3, 32).foreach { bs =>
      val batched = prompts.grouped(bs).flatMap(g =>
        lm.generateBatch(g.map(_._2).toArray)).toSeq
      assert(batched == single, s"batchSize=$bs")
    }
    // copy constraint: every emitted token came from the prompt
    prompts.zip(single).foreach { case ((_, p), ans) =>
      val vocab = p.split("\\s+").toSet
      assert(ans.nonEmpty && ans.split(" ").forall(vocab), s"$ans not ⊆ $p")
    }
    // empty prompt → empty answer
    assert(lm.generate("") == "")
    // through the batched mapPartitions plumbing, partition-independent
    val df = prompts.toDF("id", "prompt")
    val a = Generation.withGenerationBatched(df.repartition(5), "prompt", "ans", lm, 4)
      .select("id", "ans").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Generation.withGeneration(df.coalesce(1), "prompt", "ans", lm)
      .select("id", "ans").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("Synthetic.randomUnitVectors: unit-norm, deterministic, partition-independent") {
    import graft.sources.Synthetic
    val a = Synthetic.randomUnitVectors(spark, 50, 16, seed = 7)
    val norms = a.select(max(abs(sqrt(V.norm2(col("embedding"))) - 1.0))).head.getDouble(0)
    assert(norms < 1e-9)
    val b = Synthetic.randomUnitVectors(spark, 50, 16, seed = 7).repartition(5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val c = Synthetic.randomUnitVectors(spark, 50, 16, seed = 8)
    assert(a.exceptAll(c).count() > 0, "different seed must change vectors")
  }

  test("Rag.ingestMaintained streams chunk→embed→index to disk; askMaintained serves the loop continuously") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ragm_").toFile
    dir.deleteOnExit()
    val in = new java.io.File(dir, "in").getAbsolutePath
    new java.io.File(in).mkdirs()
    val table = new java.io.File(dir, "t").getAbsolutePath
    val ckpt = new java.io.File(dir, "c").getAbsolutePath
    val embedder = HashingEmbedder(32)
    // centroids from two distinctive phrases so cells separate
    val cents = Seq(
      (0L, embedder.embed("spark rules the cluster").toSeq),
      (1L, embedder.embed("vectors live in shards").toSeq)
    ).toDF("cent_id", "cvec")
    val schema = "doc_id LONG, text STRING"
    val q = Rag.ingestMaintained(
      spark.readStream.schema(schema).parquet(in),
      "doc_id", "text", embedder, cents, "cent_id", "cvec",
      table, ckpt, chunkTokens = 40)
    Seq((0L, ("spark rules the cluster " * 30).trim))
      .toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(in)
    q.processAllAvailable()
    // the second batch arrives AFTER the first is already servable —
    // the continuous-ingest story
    Seq((1L, ("vectors live in shards " * 30).trim), (2L, "tiny doc"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    // 3 chunks each for docs 0,1; 1 for doc 2; ids = doc_id·2^20 + idx
    val rows = spark.read.parquet(table)
    assert(rows.count() == 7)
    val ids = rows.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 2L, (1L << 20), (1L << 20) + 1,
      (1L << 20) + 2, 2L << 20), ids)
    val ans = Rag.askMaintained(spark, table, cents, "cent_id", "cvec",
      embedder, "where do vectors live", "chunk", nProbes = 1, k = 2).head
    assert(ans.getString(0) == "where do vectors live")
    assert(ans.getString(1).contains("vectors live in shards"),
      s"top chunks must come from doc 1: ${ans.getString(1).take(120)}")
    assert(ans.getString(2).startsWith("Answer strictly from the context."))
  }

  test("Rag.ingest chunks, embeds and stores normalized vectors; ask assembles a prompt") {
    import spark.implicits._
    val docs = Seq(
      (0L, ("spark rules the cluster " * 30).trim),
      (1L, ("vectors live in shards " * 30).trim),
      (2L, "tiny doc")
    ).toDF("doc_id", "text")
    val embedder = HashingEmbedder(32)
    val (store, chunks) = Rag.ingest(docs, "doc_id", "text", embedder, chunkTokens = 40)
    // 120 tokens / 40 → 3 chunks each for docs 0,1; 1 chunk for doc 2
    assert(chunks.count() == 7)
    assert(store.count() == 7)
    val norms = store.vectors.select(sqrt(V.norm2($"embedding")).as("n"))
      .agg(min($"n"), max($"n")).head
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
    assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)

    val ans = Rag.ask(spark, store, chunks, embedder, "where do vectors live", k = 2).head
    assert(ans.getString(0) == "where do vectors live")
    val prompt = ans.getString(2)
    assert(prompt.contains("Context:") && prompt.contains("Question: where do vectors live"))
    assert(prompt.contains("vectors live in shards"),
      "top chunk for the question should come from doc 1")
  }
}

/** JVM-wide lifecycle counters — valid because local[*] tests share one
  * JVM across all "executor" threads.
  */
object LifecycleCounters {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)
  val outOfOrder = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { opens.set(0); closes.set(0); outOfOrder.set(0) }
}

/** Embedder instrumented to verify the open → embed… → close partition
  * lifecycle `Embed.withEmbedding*` promises native-session embedders.
  */
final case class CountingEmbedder(dim: Int) extends graft.embed.Embedder {
  @transient private var closedHere = false
  override def open(): Unit = { LifecycleCounters.opens.incrementAndGet(); () }
  override def close(): Unit = {
    closedHere = true
    LifecycleCounters.closes.incrementAndGet()
    ()
  }
  override def embed(text: String): Array[Float] = {
    if (closedHere) LifecycleCounters.outOfOrder.incrementAndGet()
    new Array[Float](dim)
  }
}
