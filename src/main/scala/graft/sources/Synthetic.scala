package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
