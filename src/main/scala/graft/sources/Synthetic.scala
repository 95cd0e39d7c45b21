package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generators (reference `scripts/load.py`:
  * random unit vectors for bulk loading and benchmarking).
  *
  * Distributed and seed-stable: `spark.range` partitions the id space,
  * each row derives its vector from (seed, id) alone — no driver-side
  * materialization, any scale.
  */
object Synthetic {

  /** `n` unit vectors of dimension `dim`: components are md5-derived
    * uniform values in [-0.5, 0.5), then L2-normalized. Deterministic in
    * (seed, id) — independent of partitioning.
    */
  def randomUnitVectors(spark: SparkSession, n: Long, dim: Int,
                        seed: Long = 42L): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    val raw = transform(sequence(lit(0), lit(dim - 1)),
      i => (conv(substring(md5(concat_ws(":",
          lit(seed), col("id"), i.cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("double") / 4294967296.0) - 0.5)
    spark.range(n)
      .select(col("id").as("vec_id"),
        V.l2Normalize(raw).as("embedding"))
  }

  /** md5-derived uniform value in [-0.5, 0.5), deterministic in the
    * colon-joined parts.
    */
  private def uniform(parts: Column*): Column =
    (conv(substring(md5(concat_ws(":", parts: _*).cast("binary")), 1, 8), 16, 10)
      .cast("double") / 4294967296.0) - 0.5

  /** `n` unit vectors (ARRAY<FLOAT>) drawn around `k` well-separated
    * cluster centers: point = normalize(center(cluster) + spread·noise).
    * Cluster membership is md5(id)-derived (NOT id-mod-k, so any id
    * prefix is a random cluster draw), centers and noise are md5-derived
    * from (seed, cluster/id, dim-pos) alone — deterministic, partition-
    * independent, any scale. `spread` controls cluster overlap (~0.35 =
    * tight, ~1.2 = heavily overlapped).
    *
    * Output: (vec_id BIGINT, cluster BIGINT, embedding ARRAY<FLOAT>).
    * The isotropic fixtures have NO neighborhood structure (same-label
    * cosine ≈ 0), so IVF recall there is probe-fraction-bound by
    * construction; this generator provides the clustered regime where
    * centroid quality actually moves recall (AnnSpec's k-means test).
    */
  def clusteredUnitVectors(spark: SparkSession, n: Long, dim: Int, k: Int,
                           spread: Double, seed: Long = 7L): DataFrame = {
    import graft.functions.{VectorFunctions => V}
    val cluster = pmod(conv(substring(md5(concat_ws(":",
      lit(seed), lit("cl"), col("id")).cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(k.toLong))
    val center = transform(sequence(lit(0), lit(dim - 1)), j =>
      uniform((lit(seed * 31) + col("cluster")).cast("string"), lit("c"), j.cast("string")))
    val noise = transform(sequence(lit(0), lit(dim - 1)), j =>
      uniform(lit(seed), col("id"), j.cast("string")))
    val raw = zip_with(V.l2Normalize(center), noise,
      (c, e) => c + lit(spread) * e)
    spark.range(n)
      .withColumn("cluster", cluster)
      .select(col("id").as("vec_id"), col("cluster"),
        transform(V.l2Normalize(raw), x => x.cast("float")).as("embedding"))
  }
}
