package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k selection operators.
  *
  * The reference's distributed top-k is two-phase: per-shard bounded heaps
  * (`shard/fallback_numpy_index.py:31-32`, `shard/src/shard_binding.cpp:92-95`)
  * merged by a coordinator min-heap (`coordinator/main.py:76-85`).
  * Spark's `orderBy(...).limit(k)` plans as `TakeOrderedAndProject`, which is
  * exactly that: per-partition bounded top-k, then a driver-side merge — no
  * full sort, no shuffle of non-winners. This scales to arbitrarily many
  * partitions because only k rows per partition reach the driver.
  *
  * Ties: the reference would crash comparing dicts on equal scores
  * (`coordinator/main.py:82`); we define a total order (score desc, id asc)
  * instead — SURVEY.md §2.2.
  */
object TopK {

  /** Global top-k by score (desc), id as deterministic tie-break. */
  def topK(df: DataFrame, score: Column, id: Column, k: Int): DataFrame =
    df.orderBy(score.desc, id.asc).limit(k)

  /** Per-key top-k (batched many-queries-at-once search): window row_number.
    * One shuffle on the query key; rank ≤ k filter is evaluated streaming
    * within each window partition so memory stays O(row).
    */
  def topKPerKey(df: DataFrame, key: Seq[Column], score: Column, id: Column,
                 k: Int): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(score.desc, id.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }
}
