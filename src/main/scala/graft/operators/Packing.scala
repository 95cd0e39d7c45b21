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

  /** Deterministic per-epoch shuffle + shard assignment for N
    * data-parallel trainers: every row gets
    *   shard = md5-hash(epoch:key) mod nShards   (which trainer)
    *   seq   = rank of the same hash within the shard (read order)
    * — a seeded global permutation with no RNG state, reproducible
    * across runs/partitionings/engines (change `epoch` to reshuffle).
    * The data-loading step between a curated corpus and the training
    * job; write the result `partitionBy("shard")` (`sources/Layout`)
    * and each trainer reads exactly its directory in `seq` order.
    *
    * Execution shape: one hash shuffle on `shard` (uniform by
    * construction — md5 has no hot keys), then a per-shard window sort
    * on the hash, i.e. the sort each trainer's file order needs anyway.
    * Collision note: ties in the 60-bit hash break by the hash of the
    * key alone, so `seq` stays total as long as keys are unique.
    */
  /** CURRICULUM staging (Bengio et al. 2009 applied to corpus prep):
    * assign every document a difficulty tercile from its quality score —
    * stage 0 = easiest (highest-quality) third, stage 2 = hardest — plus
    * a deterministic within-stage traversal order, so a trainer can feed
    * stages in sequence (the easy→hard schedule) while each stage
    * streams in reproducible hash order.
    *
    * Boundaries come from the mergeable KLL sketch over integer
    * ten-thousandth scores (exact below capacity — quantile_disc
    * semantics, the pplBuckets discipline), broadcast back as two
    * literals; stage assignment and the hash order are then scan-speed
    * per-row compute. Nothing global-sorts: the ORDER is a column
    * (ord), not a physical sort — the trainer's reader sorts its own
    * stage shard, which is the only place a sort can be afforded at
    * 100 TB. Returns (idCol, q4, stage, ord).
    */
  def curriculumStages(docs: DataFrame, idCol: String, textCol: String,
                       sketchCap: Int = 8192): DataFrame = {
    import org.apache.spark.sql.Encoders
    val q4 = round(round(graft.functions.TextFunctions
      .qualityScore(col(textCol)), 4) * 10000).cast("long")
    val scored = docs.select(col(idCol), q4.as("q4"))
    val sketch = udaf(
      new QuantileSketch.KllQuantilesAgg(sketchCap, Seq("0.33", "0.66")),
      Encoders.scalaDouble)
    val b = scored.agg(sketch(col("q4").cast("double")).as("__qv"))
      .select(element_at(col("__qv"), 1).cast("long"),
        element_at(col("__qv"), 2).cast("long")).head
    val (b33, b66) = (b.getLong(0), b.getLong(1))
    // high quality = easy = stage 0; terciles of the SCORE distribution
    scored.select(col(idCol), col("q4"),
      when(col("q4") > b66, 0).when(col("q4") > b33, 1).otherwise(2)
        .as("stage"),
      pmod(Dedup.hash60(col(idCol).cast("string")), lit(1000000L)).as("ord"))
  }

  def trainerShards(df: DataFrame, key: Column, nShards: Int,
                    epoch: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = Dedup.hash60(concat(lit(epoch.toString), lit(":"), key.cast("string")))
    val withShard = df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, Dedup.hash60(key.cast("string")).asc)
    withShard.withColumn("seq", row_number().over(w).cast("long"))
      .drop("__h")
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

  /** Length-bucketed batching manifest — the padded-INFERENCE sibling of
    * `packSequences`' concat-and-chunk (packing is for training;
    * inference batches pad every sequence to the batch max, so batching
    * similar lengths together is what keeps GPUs busy). Each doc routes
    * to the smallest ladder bucket ≥ its token count (over-ladder docs
    * go to the top bucket as `truncated`); per bucket: doc count,
    * truncation count, real token total (post-truncation), padded
    * capacity (n_docs · bucket), and the padding-waste fraction — the
    * number that justifies the ladder. The ladder is an explicit CASE
    * chain (integer compares, no float log2 whose boundary rounding
    * could differ across engines). One scan + one bounded groupBy.
    */
  def lengthBuckets(df: DataFrame, tokens: Column,
                    ladder: Seq[Int] = Seq(16, 32, 64, 128, 256, 512, 1024,
                      2048, 4096)): DataFrame = {
    require(ladder.nonEmpty && ladder.forall(_ > 0) &&
      ladder == ladder.sorted && ladder.distinct == ladder,
      s"ladder must be ascending positive and distinct, got $ladder")
    val top = ladder.max
    val bucket = ladder.reverse.foldLeft(lit(top)) {
      case (acc, v) => when(tokens <= v, lit(v)).otherwise(acc)
    }
    df.select(bucket.cast("long").as("bucket"),
        tokens.cast("long").as("__t"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("__t") > top, 1)).as("n_truncated"),
        sum(least(col("__t"), lit(top.toLong))).as("total_tokens"))
      .withColumn("capacity", col("n_docs") * col("bucket"))
      .withColumn("pad_waste",
        round(lit(1.0) - col("total_tokens").cast("double")
          / col("capacity").cast("double"), 4))
  }
}
