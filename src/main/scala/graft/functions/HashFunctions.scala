package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shard-routing hash, an exact semantic replica of the reference's
  * `int(md5(id).hexdigest(), 16) % n_shards` (`coordinator/main.py:43-45`).
  *
  * Spark has no 128-bit integer, so the 32-hex-digit md5 is folded with
  * Horner's rule over four 8-hex (32-bit) chunks:
  *   m ← 0; for each chunk c: m ← (m·2³² + c) mod N
  * which equals the full 128-bit value mod N. All intermediates fit in a
  * signed 64-bit long as long as N < 2³¹.
  *
  * Note: this exact-replica hash is for semantic parity tests. For pure
  * placement balance at scale, `repartition(N, col)` (Murmur3) is the
  * idiomatic choice — see SURVEY.md §1.3.
  */
object HashFunctions {

  /** shard id in [0, nShards) for an id column (stringified like the
    * reference, which hashes the utf-8 id string).
    */
  def shardHash(id: Column, nShards: Int): Column = {
    require(nShards > 0 && nShards < Int.MaxValue, "nShards must be in (0, 2^31)")
    val hex = md5(id.cast("string").cast("binary"))
    val two32 = lit(4294967296L)
    (0 until 4).foldLeft(lit(0L)) { (m, i) =>
      val chunk = conv(substring(hex, 1 + 8 * i, 8), 16, 10).cast("long")
      pmod(m * two32 + chunk, lit(nShards.toLong))
    }
  }
}
