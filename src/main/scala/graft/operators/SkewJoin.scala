package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * A plain shuffle join on a power-law key (the norm in web-scale training
  * corpora: one domain = 10% of all documents) sends every row of a hot key
  * to ONE reducer — the straggler that dominates wall-clock at 100 TB.
  * Salting splits each hot key into `numSalts` sub-keys: the left
  * (large, skewed) side gets a deterministic salt in [0, numSalts); the
  * right side is replicated once per salt value. The join result is
  * EXACTLY the unsalted inner join (every left row still meets each
  * matching right row exactly once), but the hot key's rows now spread
  * over `numSalts` reducers.
  *
  * Spark's AQE skew-join handles many cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when the skew is known ahead of time, when the right side must
  * not be broadcast, or when AQE's post-shuffle splitting can't apply
  * (e.g. aggregations keyed on the hot key downstream).
  */
object SkewJoin {

  /** Inner-join `left` with `right` on leftKey = rightKey, salted
    * `numSalts` ways. `saltOf` must be a deterministic function of left
    * columns (any hash spreading rows uniformly; it does NOT need to
    * involve the join key). `right` is replicated `numSalts`× — keep it
    * the smaller side.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      leftKey: Column, rightKey: Column,
                      numSalts: Int, saltOf: Column): DataFrame = {
    require(numSalts > 0)
    val saltedLeft = left.withColumn("__salt", pmod(saltOf, lit(numSalts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedLeft.join(saltedRight,
      leftKey === rightKey && saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
