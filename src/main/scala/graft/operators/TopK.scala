package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.{Aggregator, Window}
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
    *
    * NOTE: the window formulation shuffles and SORTS every scored row.
    * For the 100 TB shape — N rows × Q queries scored, only k survivors
    * per query — prefer `topKPerKeyAgg`: partial aggregation keeps a
    * k-bounded buffer per (partition, key), so the exchange carries at
    * most partitions × keys × k entries instead of all N × Q.
    */
  def topKPerKey(df: DataFrame, key: Seq[Column], score: Column, id: Column,
                 k: Int): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(score.desc, id.asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .drop("__rank")
  }

  /** Per-key top-k as a two-phase AGGREGATION — the literal Spark
    * re-expression of the reference's shard-topk + coordinator-merge
    * (`fallback_numpy_index.py:31-32` partial, `coordinator/main.py:76-85`
    * final): map-side partial keeps a k-bounded sorted buffer, the
    * shuffle moves only those buffers, the final merge concatenates-and-
    * trims. Output: key columns + (score, id) rows, k per key, ordered
    * (score desc, id asc) within each key.
    *
    * `score` must be DOUBLE and `id` LONG (the fixture id shape); the
    * generic-typed variant is `TopKAggregator` itself.
    */
  def topKPerKeyAgg(df: DataFrame, key: Seq[Column], score: Column, id: Column,
                    k: Int): DataFrame =
    perKeyAgg[Long](df, key, score, id.cast("long"), k)

  /** `topKPerKeyAgg` for STRING ids (e.g. `VectorStore`'s chunk ids) —
    * same two-phase partial/final aggregation, same k-bounded buffers.
    */
  def topKPerKeyAggStr(df: DataFrame, key: Seq[Column], score: Column,
                       id: Column, k: Int): DataFrame =
    perKeyAgg[String](df, key, score, id.cast("string"), k)

  private def perKeyAgg[I: TypeTag: Ordering](
      df: DataFrame, key: Seq[Column], score: Column, id: Column,
      k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator[I](k))
    df.groupBy(key: _*)
      .agg(agg(score.cast("double"), id).as("__top"))
      .select(col("*"), posexplode(col("__top")).as(Seq("__rank", "__hit")))
      .select((key.map(c => col(c.toString)) :+
        col("__hit.score").as("score") :+ col("__hit.id").as("id")): _*)
  }
}

/** Scored hit for `TopKAggregator` — id type is generic (LONG for the
  * fixture queries, STRING for `VectorStore` chunk ids).
  */
case class Scored[I](score: Double, id: I)

/** k-bounded top-k Aggregator: buffer = sorted (score desc, id asc) list
  * of ≤ k hits. `reduce` drops non-competitive rows in O(1) (compare with
  * the current worst) — the bounded-heap scan of
  * `flat_index.hpp:39-53` — and `merge` is the coordinator's heap merge.
  * Spark plans this as ObjectHashAggregate with partial + final phases,
  * giving map-side combining for free.
  */
class TopKAggregator[I](k: Int)(implicit ord: Ordering[I],
    stt: TypeTag[Seq[Scored[I]]])
    extends Aggregator[Scored[I], Seq[Scored[I]], Seq[Scored[I]]] {
  require(k >= 1)

  private def lt(a: Scored[I], b: Scored[I]): Boolean =
    a.score > b.score || (a.score == b.score && ord.lt(a.id, b.id))

  override def zero: Seq[Scored[I]] = Vector.empty

  override def reduce(buf: Seq[Scored[I]], x: Scored[I]): Seq[Scored[I]] =
    if (buf.size >= k && !lt(x, buf.last)) buf
    else {
      val (before, after) = buf.span(lt(_, x))
      ((before :+ x) ++ after).take(k)
    }

  override def merge(a: Seq[Scored[I]], b: Seq[Scored[I]]): Seq[Scored[I]] = {
    val out = Vector.newBuilder[Scored[I]]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.size || j < b.size)) {
      if (j >= b.size || (i < a.size && lt(a(i), b(j)))) { out += a(i); i += 1 }
      else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[Scored[I]]): Seq[Scored[I]] = buf

  override def bufferEncoder: Encoder[Seq[Scored[I]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored[I]]]()
  override def outputEncoder: Encoder[Seq[Scored[I]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored[I]]]()
}
