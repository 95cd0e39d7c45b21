package graft.rag

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.{Embed, Embedder}
import graft.functions.{TextFunctions => T}
import graft.search.VectorStore

/** The reference's RAG pipelines (`rag_demo/ingest.py`, `rag_demo/ask.py`)
  * as single DataFrame flows — SURVEY.md §3.3:
  *
  *   ingest: docs → chunk (O11) → chunk-id (O13) → embed (O12, per-
  *           partition model) → normalize + route (O1–O3 via VectorStore)
  *   ask:    question → embed → top-k search (O4–O8) → join chunks →
  *           ordered context assembly (O15) → prompt template (O16)
  *
  * Generation (FLAN-T5 in the reference, `rag_demo/ask.py:35-39`) stays a
  * pluggable boundary — the pipeline ends at the prompt column.
  */
object Rag {

  /** Chunked document table: one row per (doc, chunk) with deterministic
    * chunk ids (the reference's uuid4 suffix replaced by a content hash,
    * `rag_demo/ingest.py:34`).
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(T.chunks(col(textCol), chunkTokens)).as(Seq("chunk_idx", "chunk")))
      .withColumn("chunk_id", T.chunkId(col("doc_id"), col("chunk_idx"), col("chunk")))

  /** Full ingest: chunk → embed → insert. Returns (store, chunks). */
  def ingest(docs: DataFrame, idCol: String, textCol: String,
             embedder: Embedder, chunkTokens: Int = 120,
             numShards: Int = 8): (VectorStore, DataFrame) = {
    val chunks = chunkDocs(docs, idCol, textCol, chunkTokens)
    val embedded = Embed.withEmbedding(chunks, "chunk", "embedding", embedder)
    val store = VectorStore.fromDataFrame(
      embedded.select(col("chunk_id"), col("embedding")),
      "chunk_id", "embedding", embedder.dim, numShards)
    (store, chunks)
  }

  /** Question → context + prompt. One row: (question, context, prompt). */
  def ask(spark: SparkSession, store: VectorStore, chunks: DataFrame,
          embedder: Embedder, question: String, k: Int = 4): DataFrame = {
    val hits = store.search(embedder.embed(question).toSeq, k, "cosine")
    val ctx = hits.join(chunks, hits("id") === chunks("chunk_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(
            (-round(col("score"), 6)).as("negs"), col("chunk_id").as("cid"),
            col("chunk").as("t")))),
          x => concat(lit("- "), x.getField("t"))),
        "\n\n").as("context"))
    ctx.select(
      lit(question).as("question"),
      col("context"),
      format_string(
        "Answer strictly from the context.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
        col("context"), lit(question)).as("prompt"))
  }

  /** [[ask]] against a MAINTAINED on-disk index
    * ([[graft.streaming.Streaming.streamInsertIndexedMaintained]]) —
    * the serving half of a continuously-ingested RAG store: the chunk
    * TEXT rides the table as a passthrough metadata column (`textCol`),
    * so retrieval is one probe-pruned scan (tombstones honored, `asOf`
    * snapshot pins supported) and context assembly joins the hits back
    * to their own pruned rows — no side chunk table to keep in sync.
    * Output one row: (question, context, prompt), hits ordered
    * (score desc, id asc) in the context.
    */
  def askMaintained(spark: SparkSession, tablePath: String,
                    fallbackCentroids: DataFrame, centIdCol: String,
                    centVecCol: String, queryVec: Seq[Float],
                    question: String, textCol: String, nProbes: Int,
                    k: Int = 4,
                    asOf: Option[Long] = None): DataFrame = {
    import graft.operators.Ann
    import graft.streaming.Streaming
    val hits = Streaming.searchMaintained(spark, tablePath,
      fallbackCentroids, centIdCol, centVecCol, queryVec, nProbes, k,
      asOf = asOf)
    // texts come from the SAME probed cells the hits did (probe ranking
    // is deterministic, so every hit's row is in this pruned scan) — a
    // k-row context join must not pay a whole-table scan; the
    // dropDuplicates guards the committed-but-unrecovered maintenance
    // window where an id can briefly be stored twice (fsckMaintained's
    // duplicate_ids check anticipates exactly this)
    val cents = Streaming.maintainedCentroids(spark, tablePath,
      fallbackCentroids)
    val probes = Ann.probeCellIds(cents, queryVec, centIdCol, centVecCol,
      nProbes)
    val texts = Ann.readIvfCells(spark, tablePath, probes)
      .filter(Streaming.visibleAsOf(asOf))
      .select(col("id"), col(textCol).as("__t"))
      .dropDuplicates("id")
    val ctx = broadcast(hits).join(texts, Seq("id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(
            (-round(col("score"), 6)).as("negs"), col("id").as("cid"),
            col("__t").as("t")))),
          x => concat(lit("- "), x.getField("t"))),
        "\n\n").as("context"))
    ctx.select(
      lit(question).as("question"),
      col("context"),
      format_string(
        "Answer strictly from the context.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
        col("context"), lit(question)).as("prompt"))
  }

  /** CONTINUOUS RAG ingest into a maintained on-disk index — the full
    * reference ingest (`rag_demo/ingest.py`: chunk → embed → insert)
    * as ONE streaming query against
    * [[graft.streaming.Streaming.streamInsertIndexedMaintained]]'s
    * table: chunking is a per-row explode, embedding runs through the
    * per-partition `Embedder` lifecycle, and the chunk TEXT (plus the
    * content-hash chunk id) rides into the table as passthrough
    * metadata, so [[askMaintained]] serves context without any side
    * chunk table. Row ids synthesize as `doc_id · 2²⁰ + chunk_idx` —
    * integral (the maintained-table id contract), collision-free while
    * `chunk_idx < 2²⁰` and `doc_id < 2⁴³` (guarded per batch).
    */
  def ingestMaintained(docs: DataFrame, idCol: String, textCol: String,
                       embedder: Embedder, centroids: DataFrame,
                       centIdCol: String, centVecCol: String,
                       tablePath: String, checkpointPath: String,
                       chunkTokens: Int = 120, numShards: Int = 8,
                       maxCell: Long = 1000000L)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val chunks = chunkDocs(docs, idCol, textCol, chunkTokens)
    // the range guard lives INSIDE the id expression so column pruning
    // can never optimize the check away
    val idExpr = when(
      col("doc_id") >= 0 && col("doc_id") < (1L << 43) &&
        col("chunk_idx") < (1 << 20),
      col("doc_id") * lit(1L << 20) + col("chunk_idx"))
      .otherwise(raise_error(lit(
        "ingestMaintained id synthesis needs 0 <= doc_id < 2^43 and " +
          "chunk_idx < 2^20")).cast("long"))
    val embedded = Embed.withEmbedding(chunks, "chunk", "embedding", embedder)
      .select(idExpr.cast("long").as("id"),
        col("embedding"), col("chunk_id"), col("chunk"))
    graft.streaming.Streaming.streamInsertIndexedMaintained(
      embedded, embedder.dim, numShards, centroids, centIdCol, centVecCol,
      tablePath, checkpointPath, maxCell = maxCell)
  }

  /** [[askMaintained]] with the question EMBEDDED by `embedder` — the
    * text-in face (`rag_demo/ask.py:27-34`: embed the question with the
    * same model as ingest, then search).
    */
  def askMaintained(spark: SparkSession, tablePath: String,
                    fallbackCentroids: DataFrame, centIdCol: String,
                    centVecCol: String, embedder: Embedder,
                    question: String, textCol: String, nProbes: Int,
                    k: Int): DataFrame =
    askMaintained(spark, tablePath, fallbackCentroids, centIdCol,
      centVecCol, embedder.embed(question).toSeq, question, textCol,
      nProbes, k)

  /** RAG ask against the DURABLE HNSW index
    * ([[graft.streaming.HnswIndex]]) — the graph-index twin of
    * [[askMaintained]], serving the GROUPED page shape: hits come from
    * one [[graft.streaming.HnswIndex.searchGrouped]] beam walk (top
    * `nGroups` parent documents by best chunk, `perGroup` chunks each
    * — one strong document cannot flood the context), the chunk TEXT
    * rides the index as a passthrough metadata column (`textCol`,
    * declared at build beside `groupCol`), and the context assembles
    * in the grouped page order (grp_rank, rnk) — document-coherent
    * context, the reference's assembly (`rag_demo/ask.py:24`) upgraded
    * to the page shape its multi-chunk corpora need. Tombstones and
    * `asOf` pins honored by the serve. Output one row:
    * (question, context, prompt).
    */
  def askHnsw(spark: SparkSession, indexPath: String,
              queryVec: Seq[Float], question: String, textCol: String,
              groupCol: String, beam: Int, hops: Int, nGroups: Int = 3,
              perGroup: Int = 2,
              asOf: Option[Long] = None): DataFrame = {
    import graft.streaming.HnswIndex
    val meta = HnswIndex.readMeta(spark, indexPath)
    require(meta.passthrough.exists(_.name == textCol),
      s"text column '$textCol' is not a passthrough column of this index")
    val hits = HnswIndex.searchGrouped(spark, indexPath, queryVec,
      groupCol, beam, hops, nGroups, perGroup, asOf = asOf)
    // the page is ≤ nGroups × perGroup rows — broadcast it against the
    // sidecar's (id, text) columns (column-pruned scan, no vectors)
    val texts = HnswIndex.readVectors(spark, indexPath)
      .select(col(meta.idCol).cast("long").as("__tid2"),
        col(textCol).as("__t"))
    val ctx = broadcast(hits)
      .join(texts, col(meta.idCol).cast("long") === col("__tid2"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(
            col("grp_rank").as("g"), col("rnk").as("r"),
            col("__t").as("t")))),
          x => concat(lit("- "), x.getField("t"))),
        "\n\n").as("context"))
    ctx.select(
      lit(question).as("question"),
      col("context"),
      format_string(
        "Answer strictly from the context.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
        col("context"), lit(question)).as("prompt"))
  }

  /** [[askHnsw]] with the question EMBEDDED by `embedder` — the
    * text-in face, parity with the [[askMaintained]] overload (embed
    * the question with the same model as ingest, then search the
    * graph index).
    */
  def askHnsw(spark: SparkSession, indexPath: String,
              embedder: Embedder, question: String, textCol: String,
              groupCol: String, beam: Int, hops: Int, nGroups: Int,
              perGroup: Int): DataFrame =
    askHnsw(spark, indexPath, embedder.embed(question).toSeq, question,
      textCol, groupCol, beam, hops, nGroups, perGroup)
}
