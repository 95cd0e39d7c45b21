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

  private def perKeyAgg[I: TypeTag: Ordering: scala.reflect.ClassTag](
      df: DataFrame, key: Seq[Column], score: Column, id: Column,
      k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator[I](k))
    df.groupBy(key: _*)
      .agg(agg(score.cast("double"), id).as("__top"))
      .select(col("*"), posexplode(col("__top")).as(Seq("__rank", "__hit")))
      .select((key.map(c => col(c.toString)) :+
        col("__hit.score").as("score") :+ col("__hit.id").as("id")): _*)
  }

  /** Grouped search (the vector-DB `group_by` surface: Qdrant
    * search_groups, Milvus group-by search): from a scored candidate
    * set, return the top `nGroups` groups — ranked by each group's
    * best hit — with the top `perGroup` hits inside each. The RAG
    * serving shape: a chunk-level index where `group` is the parent
    * document, so one strong document cannot flood the result page
    * with its own chunks.
    *
    * Scale shape: ONE pass over the scored rows through the k-bounded
    * two-phase aggregator (exchange ≤ groups × perGroup entries, never
    * the candidates); group ranking is a per-partition-heap
    * `TakeOrderedAndProject` over the one-best-row-per-group set; the
    * winning `nGroups` rows broadcast back to trim the hits. The only
    * unpartitioned windows run over ≤ nGroups and ≤ nGroups × perGroup
    * rows respectively — driver-bounded by the request, not the data.
    *
    * Ties: quantize `score` before calling (the caller's `round`),
    * hits order (score desc, id asc), groups order (best desc, group
    * asc). Output: (group, grp_rank, rnk, id, score), ordered.
    */
  def groupedTopK(scored: DataFrame, groupCol: String, score: Column,
                  id: Column, nGroups: Int, perGroup: Int): DataFrame = {
    val g = col(groupCol)
    val hits = topKPerKeyAgg(scored, Seq(g), score, id, perGroup)
    val best = topKPerKeyAgg(hits, Seq(g), col("score"), col("id"), 1)
    val top = topK(best.select(g, col("score")), col("score"), g, nGroups)
    val ranked = top.withColumn("grp_rank",
        row_number().over(Window.orderBy(col("score").desc, g.asc)))
      .select(g, col("grp_rank"))
    hits.join(broadcast(ranked), Seq(groupCol))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(g).orderBy(col("score").desc, col("id").asc)))
      .select(g, col("grp_rank"), col("rnk"), col("id"), col("score"))
      .orderBy(col("grp_rank"), col("rnk"))
  }
}

/** Scored hit for `TopKAggregator` — id type is generic (LONG for the
  * fixture queries, STRING for `VectorStore` chunk ids).
  */
case class Scored[I](score: Double, id: I)

/** k-bounded top-k Aggregator: buffer = PAIRED FLAT ARRAYS
  * (scores, ids), sorted (score desc, id asc), ≤ k entries. `reduce`
  * drops non-competitive rows in O(1) (compare with the current worst) —
  * the bounded-heap scan of `flat_index.hpp:39-53` — and `merge` is the
  * coordinator's heap merge. Spark plans this as ObjectHashAggregate
  * with partial + final phases, giving map-side combining for free.
  *
  * Why arrays, not `Seq[Scored[I]]`: the buffer crosses the encoder
  * boundary on every partial-aggregation spill/shuffle; a struct-array
  * buffer encodes one object per hit, while (Array[Double], Array[I])
  * encodes two flat arrays (primitive for the scores, and for LONG ids)
  * — fewer allocations and fewer shuffle bytes per key at large key
  * counts.
  */
class TopKAggregator[I](k: Int)(implicit ord: Ordering[I],
    ct: scala.reflect.ClassTag[I],
    btt: TypeTag[(Array[Double], Array[I])],
    stt: TypeTag[Seq[Scored[I]]])
    extends Aggregator[Scored[I], (Array[Double], Array[I]), Seq[Scored[I]]] {
  require(k >= 1)

  // (score desc, id asc) strict order over parallel arrays
  private def lt(s1: Double, i1: I, s2: Double, i2: I): Boolean =
    s1 > s2 || (s1 == s2 && ord.lt(i1, i2))

  override def zero: (Array[Double], Array[I]) =
    (Array.emptyDoubleArray, Array.empty[I])

  override def reduce(buf: (Array[Double], Array[I]),
                      x: Scored[I]): (Array[Double], Array[I]) = {
    val (ss, ids) = buf
    val n = ss.length
    if (n >= k && !lt(x.score, x.id, ss(n - 1), ids(n - 1))) buf
    else {
      var p = 0
      while (p < n && lt(ss(p), ids(p), x.score, x.id)) p += 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m)
      val ni = new Array[I](m)
      var q = 0
      while (q < p) { ns(q) = ss(q); ni(q) = ids(q); q += 1 }
      ns(p) = x.score
      ni(p) = x.id
      q = p
      while (q + 1 < m) { ns(q + 1) = ss(q); ni(q + 1) = ids(q); q += 1 }
      (ns, ni)
    }
  }

  override def merge(a: (Array[Double], Array[I]),
                     b: (Array[Double], Array[I])): (Array[Double], Array[I]) = {
    val (as, ai) = a
    val (bs, bi) = b
    val m = math.min(as.length + bs.length, k)
    val ns = new Array[Double](m)
    val ni = new Array[I](m)
    var (i, j, n) = (0, 0, 0)
    while (n < m) {
      if (j >= bs.length ||
          (i < as.length && lt(as(i), ai(i), bs(j), bi(j)))) {
        ns(n) = as(i); ni(n) = ai(i); i += 1
      } else {
        ns(n) = bs(j); ni(n) = bi(j); j += 1
      }
      n += 1
    }
    (ns, ni)
  }

  override def finish(buf: (Array[Double], Array[I])): Seq[Scored[I]] =
    buf._1.indices.map(i => Scored(buf._1(i), buf._2(i)))

  override def bufferEncoder: Encoder[(Array[Double], Array[I])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[I])]()
  override def outputEncoder: Encoder[Seq[Scored[I]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored[I]]]()
}
