package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order within each packing group and chunked into
  * fixed-token-budget training sequences (documents may straddle a
  * boundary — the concat-and-chunk discipline of GPT-style pipelines,
  * handled downstream by attention masking). Each doc gets the sequence
  * index and offset where it STARTS.
  *
  * Execution shape: one window cumsum per packing group — a single
  * shuffle on the group key, then a streaming in-partition pass. All
  * arithmetic is integer (token counts), so results are bit-identical
  * across engines and partitionings. At 100 TB the group key must be a
  * bounded-size unit (per output file / hash bucket, not one giant
  * global group): packing is embarrassingly parallel across groups and
  * each group's window sort is the only per-group cost.
  */
object Packing {

  /** Adds `seq_idx` (which packed sequence this doc starts in) and
    * `seq_offset` (token offset inside it). `order` must be a total
    * order within each group for determinism.
    */
  def packSequences(df: DataFrame, group: Seq[Column], order: Column,
                    tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(group: _*).orderBy(order.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(tokens).over(w) - tokens).cast("long")
    df.withColumn("__start", start)
      .withColumn("seq_idx", floor(col("__start") / lit(budget)).cast("long"))
      .withColumn("seq_offset", pmod(col("__start"), lit(budget.toLong)))
      .drop("__start")
  }

  /** Packed-sequence count per group: ceil(total_tokens / budget) —
    * the planning aggregate (how many training sequences a corpus
    * yields at a given context length).
    */
  def sequenceCounts(df: DataFrame, group: Seq[Column], tokens: Column,
                     budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    df.groupBy(group: _*)
      .agg(sum(tokens).cast("long").as("total_tokens"))
      .withColumn("n_sequences",
        ceil(col("total_tokens").cast("double") / lit(budget)).cast("long"))
  }
}
