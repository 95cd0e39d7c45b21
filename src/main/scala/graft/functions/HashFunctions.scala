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

  /** Rendezvous (highest-random-weight) shard routing — Thaler &
    * Ravishankar 1996: shard = argmax over s of w(id, s) where
    * w = the first 60 bits of md5("id:s") (ties, i.e. 60-bit collisions,
    * to the lowest s). Unlike the reference's mod-N (above), growing
    * N → N+k moves ONLY the keys whose new argmax lands on a new shard —
    * k/(N+k) of the data in expectation, versus ~(1 − 1/N) for mod-N
    * where nearly every key re-homes. At 100 TB that is the difference
    * between copying ~17% and copying ~90% of the corpus when going
    * 8 → 10 shards; `q_reshard_plan` measures both on the fixture and
    * HashFunctionsSpec pins the only-into-new-shards property.
    *
    * The argmax is an in-literal `array_max` over per-shard
    * (weight, -s) structs — a pure per-row projection, no join, no
    * shuffle, same discipline as `Ann.ivfAssign`. Cost is O(nShards)
    * md5 calls per row; for thousand-shard fleets prefer a log-time
    * scheme (jump hash) — this surface targets the reference's
    * coordinator-scale shard counts.
    */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards > 0 && nShards <= 4096,
      "rendezvousShard: nShards must be in [1, 4096] (O(n) weights per row)")
    val idStr = id.cast("string")
    val weights = (0 until nShards).map { s =>
      val hex = md5(concat(idStr, lit(":" + s)).cast("binary"))
      struct(
        conv(substring(hex, 1, 15), 16, 10).cast("long").as("w"),
        lit(-s.toLong).as("negs"))
    }
    -array_max(array(weights: _*)).getField("negs")
  }
}
