package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection (Gonzalez 1985 farthest-point
  * traversal) — the geometric data-SELECTION move beside the dedup
  * family's data-REMOVAL: pick k embeddings that 2-approximate the
  * optimal k-center cover, i.e. a maximally spread subset. The active
  * curation literature uses exactly this (Sener & Savarese 2018 coreset
  * active learning) to choose which documents to label/keep when the
  * budget is k, complementing `q_cluster_balance` (which caps head
  * clusters) by *constructing* the diverse subset directly.
  *
  * Algorithm: seed with the smallest id (deterministic — no RNG seed to
  * disagree across engines), then k−1 rounds of "pick the point farthest
  * from the chosen set". The classic incremental trick keeps a per-point
  * running min squared-distance to the chosen set, so each round is ONE
  * corpus scan (update dmin against the single new center) plus ONE
  * map-side-combined max aggregate — never a k-way or pairwise join.
  *
  * Scale shape: driver state is the chosen set only (k rows, k·dim
  * floats — bounded by contract like the centroid/vocab collects); each
  * round broadcasts one center vector as a literal and shuffles one
  * 1-row argmax. Total cost k scans; the state frame is
  * localCheckpoint'd per round (the `connectedComponents` iterative-
  * lineage discipline). At 100 TB pick k ≤ a few thousand or run on the
  * IVF-assigned cell representatives first.
  *
  * Cross-engine exactness: squared L2 between float32 vectors in double
  * (exact products, `q_embed_neardup` discipline), quantized round-4 →
  * integer ten-thousandths BEFORE comparisons; argmax ties break to the
  * SMALLEST id via a single min(struct(-d4, id)) aggregate, so both
  * engines replay the same k picks bit-for-bit.
  *
  * Returns the chosen rows (sel_round, id, d4) where d4 is the point's
  * quantized squared distance to the previously-chosen set at selection
  * time (the seed's d4 is NULL — nothing chosen before it); the max d4
  * of the LAST row bounds the cover radius² of the whole corpus within
  * 2× of optimal.
  */
object Coreset {

  /** Quantized squared L2 between a vector column and a literal center:
    * round(Σ(x−c)², 4)·10⁴ as BIGINT.
    */
  private def dist4(vec: Column, center: Array[Float]): Column = {
    val c = lit(center)
    round(round(aggregate(
      zip_with(vec.cast("array<double>"), c.cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v), 4) * 10000).cast("long")
  }

  def farthestPointSample(df: DataFrame, idCol: String, vecCol: String,
                          k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._

    val base = df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .localCheckpoint(false)

    def vecOf(row: Row): Array[Float] =
      row.getSeq[Float](row.fieldIndex("__v")).toArray

    // deterministic seed: the smallest id (one bounded min aggregate);
    // remaining-point count tracked driver-side (n − 1 − picks), so no
    // per-round isEmpty job
    val n0 = base.count()
    val seedRow = base.orderBy(col("id")).head
    val seedId = seedRow.get(0)
    var chosen = List[(Any, Option[Long], Int)]((seedId, None, 0))
    var center = vecOf(seedRow)

    // state: every point's running min distance to the chosen set
    var state = base.filter(col("id") =!= lit(seedId))
      .select(col("id"), col("__v"), dist4(col("__v"), center).as("__d4"))
      .localCheckpoint(false)

    for (r <- 1 until math.min(k.toLong, n0).toInt) {
      // argmax d4 with ties to the smallest id, CARRYING the winning
      // vector in the struct tail (id is unique, so the vector never
      // participates in the comparison) — one map-side-combined agg per
      // round instead of agg + a second lookup scan
      val top = state
        .agg(min(struct((-col("__d4")).as("nd"), col("id").as("i"),
          col("__v").as("v"))).as("t"))
        .select(col("t.i"), col("t.nd"), col("t.v")).head
      val pickId = top.get(0)
      val pickD4 = -top.getLong(1)
      chosen = (pickId, Some(pickD4), r) :: chosen
      center = top.getSeq[Float](2).toArray
      state = state.filter(col("id") =!= lit(pickId))
        .select(col("id"), col("__v"),
          least(col("__d4"), dist4(col("__v"), center)).as("__d4"))
        .localCheckpoint(false)
    }

    val rows = chosen.reverse.map { case (id, d4, r) =>
      (r, id.toString, d4)
    }
    rows.toDF("sel_round", "id", "d4")
  }
}
