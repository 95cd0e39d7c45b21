package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Integer-exact EWMA smoothing + deviation-band anomaly detection over
  * per-key ordered event streams — the monitoring-shaped temporal fold
  * (metric drift, abusive-client detection, ingest-rate spikes) that a
  * corpus pipeline runs beside its windowed aggregates.
  *
  * The recurrence is INTEGER, so every engine replays it bit-exactly:
  * values quantize to micro-units, and with smoothing 1/A (A = alphaDen)
  *
  *   s_t = floor(((A-1)·s_{t-1} + x_t) / A)        (level)
  *   d_t = floor(((A-1)·d_{t-1} + |x_t − s_{t-1}|) / A)   (mean abs dev)
  *
  * using FLOOR division on both sides (Math.floorDiv here, `//` in the
  * oracle — Long `/` truncates toward zero and diverges on negatives).
  * An event is anomalous when its residual exceeds k·d_{t-1}, after a
  * warmup of `warmup` prior events and only when d_{t-1} > 0.
  *
  * Scale shape: ONE shuffle (repartition by key) + sortWithinPartitions
  * (secondary sort) + a streaming per-partition fold that keeps O(1)
  * state per key run — no per-group buffering, no window function, so a
  * key with 10⁹ events costs memory O(1), not O(group). Max |x| up to
  * ~2⁶² / (A−1) is overflow-safe in the Long arithmetic.
  */
object Ewma {

  final case class Anomaly(user_id: Long, event_id: Long, rn: Long,
                           xq: Long, prev_sq: Long, prev_dq: Long, rq: Long)

  /** Flag deviation-band anomalies per key. Input columns: a LONG key, a
    * LONG event id (the per-key order tiebreak), an orderable timestamp,
    * and a DOUBLE value (micro-quantized internally).
    */
  def anomalies(events: DataFrame, keyCol: String, idCol: String,
                tsCol: String, valCol: String, alphaDen: Int = 4,
                k: Int = 3, warmup: Int = 4): Dataset[Anomaly] = {
    require(alphaDen >= 2, s"alphaDen must be >= 2, got $alphaDen")
    require(k >= 1 && warmup >= 1, s"need k/warmup >= 1, got $k/$warmup")
    val spark = events.sparkSession
    import spark.implicits._
    val a1 = (alphaDen - 1).toLong
    events
      .select(col(keyCol).cast("long").as("k"),
        col(idCol).cast("long").as("id"),
        unix_micros(col(tsCol).cast("timestamp")).as("tsu"),
        round(col(valCol) * 1e6, 0).cast("long").as("xq"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("tsu"), col("id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var started = false
        var sq = 0L
        var dq = 0L
        var rn = 0L
        it.flatMap { case (key, id, _, xq) =>
          if (!started || key != curKey) {
            curKey = key; started = true
            sq = xq; dq = 0L; rn = 1L
            Iterator.empty
          } else {
            rn += 1
            val rq = math.abs(xq - sq)
            val hit = rn > warmup && dq > 0L && rq > k.toLong * dq
            val out = if (hit) Iterator.single(
              Anomaly(key, id, rn, xq, sq, dq, rq)) else Iterator.empty
            sq = Math.floorDiv(a1 * sq + xq, alphaDen.toLong)
            dq = Math.floorDiv(a1 * dq + rq, alphaDen.toLong)
            out
          }
        }
      }
  }
}
