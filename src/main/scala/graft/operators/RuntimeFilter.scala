package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.BloomExpression

/** Runtime-filtered joins: discard probe-side rows that cannot match
  * BEFORE they reach the shuffle.
  *
  * The classic 100 TB join shape is fact × selective-dimension: the
  * dimension's surviving keys are few, but the fact side still shuffles
  * every row to find that out. `bloomJoin` builds a Bloom filter over
  * the build side's join keys (10 bits per DISTINCT key — two orders of
  * magnitude smaller than the rows themselves, so it stays shippable
  * long after the build side outgrows a broadcast-HASH-relation) and
  * probes it map-side on the fact scan; only candidate rows enter the
  * exchange. The join itself is unchanged, and Bloom filters have no
  * false negatives, so the RESULT is exactly the plain inner join — the
  * ~0.8% false-positive survivors are eliminated by the equi-join
  * condition. This is the manual, inspectable twin of AQE's
  * `runtime.bloomFilter` rewrite, and the positive-filter sibling of
  * `Dedup.contaminationOverlapBloom`'s negative filter.
  *
  * Contract: the BUILD side's distinct key set must be driver-bounded
  * (the bitset is built from one distinct-hash collect — ~1.25 MB per
  * million keys at 10 bits/key). That is the same bound a broadcast
  * join needs, minus the ~100× row payload.
  */
object RuntimeFilter {

  /** Exact inner equi-join of `probe` ⋈ `build` on the shared column
    * `key`, with a Bloom pre-filter on the probe scan.
    */
  def bloomJoin(probe: DataFrame, build: DataFrame, key: String,
                bitsPerKey: Int = BloomExpression.DefaultBitsPerKey,
                numProbes: Int = BloomExpression.DefaultNumProbes): DataFrame = {
    val spark = probe.sparkSession
    import spark.implicits._
    val hashes = build
      .select(Dedup.hash60(col(key).cast("string")).as("h"))
      .filter(col("h").isNotNull).distinct().as[Long].collect()
    if (hashes.isEmpty) probe.filter(lit(false)).join(build, Seq(key))
    else {
      val bits = BloomExpression.buildBits(hashes, bitsPerKey, numProbes)
      probe
        .filter(BloomExpression.mightContainF(
          Dedup.hash60(col(key).cast("string")), bits, numProbes))
        .join(build, Seq(key))
    }
  }
}
