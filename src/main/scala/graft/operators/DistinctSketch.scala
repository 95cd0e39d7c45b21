package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-count estimation via a K-Minimum-Values sketch (Bar-Yossef
  * et al. 2002) — the cardinality member of the sketch family
  * (`HeavyHitters` = frequencies, `QuantileSketch` = percentiles):
  * keep the k smallest DISTINCT 60-bit hashes of the values; the k-th
  * smallest hash's position in [0, 2^60) estimates the density of
  * distinct hashes, so n̂ = (k−1)·2^60/kth. Mergeable (union, keep k
  * smallest) and — unlike most sketches — fully DETERMINISTIC at any
  * scale: "k smallest distinct hashes" is order- and
  * partitioning-independent, so repeated runs agree bit-for-bit.
  *
  * Exactness contract: while true cardinality < k the sketch holds
  * every distinct hash and the count is EXACT (reported via the
  * `is_exact` flag); beyond k the estimate has relative error
  * ~1/√(k−2). Input is the PRE-HASHED column (`Dedup.hash60` — a
  * codegen'd builtin chain), so the aggregator itself only maintains a
  * bounded sorted set: shuffle carries ≤ k longs per partition,
  * whatever the column's cardinality. `q_distinct_users`'s
  * count(DISTINCT) twin shuffles every distinct value at least once.
  */
object DistinctSketch {

  /** Buffer = ascending distinct hashes, ≤ k of them. */
  class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k >= 2)

    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], h: Long): Seq[Long] = {
      val n = b.length
      // fast reject: full and not smaller than the current k-th min
      if (n >= k && h >= b(n - 1)) b
      else {
        val i = searchInsert(b, h)
        if (i < n && b(i) == h) b // already present
        else {
          // single-copy insert (patch), not take+append+drop (two copies);
          // still O(k) per ACCEPTED insert — only ~k·ln(k) values are ever
          // accepted per partial, so ramp-up cost is bounded
          val grown = b.patch(i, Seq(h), 0)
          if (grown.length > k) grown.dropRight(1) else grown
        }
      }
    }

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      // sorted-merge union, stop at k
      val out = Vector.newBuilder[Long]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        val next =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val v = a(i); if (j < b.length && b(j) == v) j += 1; i += 1; v
          } else { val v = b(j); j += 1; v }
        out += next
        n += 1
      }
      out.result()
    }

    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    private def searchInsert(b: Seq[Long], h: Long): Int = {
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
  }

  /** hash60 domain size: hashes are uniform in [0, 2^60). */
  private val HashSpace = 1L << 60

  /** Cardinality read-off: exact when the sketch isn't full. The k-th
    * minimum is clamped to ≥ 1 — hash 0 is possible (if absurdly
    * unlikely) and must not divide to infinity.
    */
  def estimate(minima: Seq[Long], k: Int): (Long, Boolean) =
    if (minima.length < k) (minima.length.toLong, true)
    else {
      val kth = math.max(minima.last, 1L).toDouble
      ((((k - 1).toDouble * HashSpace) / kth).round, false)
    }

  /** One-row (n_distinct, is_exact) for a string column. `hashCol`
    * values are md5-folded to 60 bits scan-side (codegen), the
    * aggregation state is ≤ k longs per partial.
    */
  def distinctCount(df: DataFrame, valueCol: Column, k: Int = 8192): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null values hash to null and would decode as 0L — drop them (a
    // null is "no value", not a distinct member)
    val minima = df.select(Dedup.hash60(valueCol).as("h"))
      .filter(col("h").isNotNull).as[Long]
      .select(new KmvAgg(k).toColumn).head()
    val (n, exact) = estimate(minima, k)
    Seq((n, exact)).toDF("n_distinct", "is_exact")
  }

  /** Per-key KMV sketches: one (key, minima) row per distinct key.
    * State ≤ k longs per (partition, key) partial — the grouped twin of
    * `distinctCount`, and the input to `overlapMatrix`. At 100 TB this
    * is the "sketch each dataset once, compare cheaply forever" shape:
    * the output is ≤ 8·k bytes per key and mergeable across snapshots.
    */
  def sketchByKey(df: DataFrame, keyCol: Column, valueCol: Column,
                  k: Int = 8192): DataFrame = {
    val kmv = org.apache.spark.sql.functions.udaf(
      new KmvAgg(k), org.apache.spark.sql.Encoders.scalaLong)
    df.select(keyCol.as("key"), Dedup.hash60(valueCol).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("key")).agg(kmv(col("h")).as("minima"))
  }

  /** Pairwise set-operation estimates between per-key sketches
    * (Beyer et al. 2007 §3): for every key pair a < b, the k smallest
    * hashes of A ∪ B are the k smallest of (minima_a ∪ minima_b), so
    *   n̂_union = KMV read-off of the merged sketch,
    *   n̂_inter = (|{h ∈ merged : h ∈ A ∧ h ∈ B}| / |merged|) · n̂_union,
    *   jaccard = n̂_inter / n̂_union.
    * Below capacity every sketch holds its full hash set, so all three
    * are EXACT (`is_exact` — the oracle regime); beyond, relative error
    * ~1/√(k−2) on the union and proportionally on the rest. The pair
    * matrix is #keys² rows — this is a DATASET-level comparator (sources,
    * crawl snapshots, shards), not a per-row operator; per-pair work is
    * array merges over ≤ k longs, no re-scan of the underlying data.
    */
  def overlapMatrix(sketches: DataFrame, k: Int): DataFrame = {
    val a = sketches.select(col("key").as("key_a"), col("minima").as("__ma"))
    val b = sketches.select(col("key").as("key_b"), col("minima").as("__mb"))
    def readOff(m: Column): Column =
      when(size(m) < k, size(m).cast("long"))
        .otherwise(round(lit((k - 1).toDouble * HashSpace.toDouble)
          / element_at(m, k).cast("double")).cast("long"))
    val merged = slice(array_sort(array_union(col("__ma"), col("__mb"))),
      lit(1), lit(k))
    val common =
      size(array_intersect(array_intersect(col("__merged"), col("__ma")),
        col("__mb")))
    val nUnion = readOff(col("__merged"))
    val nInter = when(size(col("__merged")) < k, common.cast("long"))
      .otherwise(round(common.cast("double") / size(col("__merged"))
        * nUnion.cast("double")).cast("long"))
    a.join(b, col("key_a") < col("key_b"))
      .withColumn("__merged", merged)
      .withColumn("n_a", readOff(col("__ma")))
      .withColumn("n_b", readOff(col("__mb")))
      .withColumn("n_union", nUnion)
      .withColumn("n_inter", nInter)
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / col("n_union"), 6))
      .withColumn("is_exact", size(col("__merged")) < k)
      .drop("__ma", "__mb", "__merged")
  }
}
