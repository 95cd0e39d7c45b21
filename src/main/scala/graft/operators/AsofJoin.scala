package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row with
  * the same key and right.time <= left.time (inclusive).
  *
  * Spark has no built-in as-of join; the naive formulation
  * (equi-join + filter + groupBy-max + join-back) shuffles both sides twice
  * and explodes on skewed keys. This implementation does ONE shuffle:
  * tag both sides, union, and run a single `last(_, ignoreNulls)` window
  * ordered by (time, side) — right rows sort before left rows at equal
  * timestamps, giving inclusive semantics. State per window partition is
  * O(1) (only the running last payload), so it scales to arbitrarily large
  * per-key histories.
  */
object AsofJoin {

  /** Returns all left columns plus a nullable `asof` struct holding the
    * matched right row (null when no right row precedes the left row).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(right.columns.toIndexedSeq.map(col): _*)
    val lType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)

    val lt = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rt = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    // Final orderBy key __r makes the pick among right rows that tie on
    // (key, time) deterministic: last() takes the row whose full struct
    // sorts highest. (DuckDB's ASOF JOIN leaves the tied pick unspecified,
    // so oracle fixtures must be tie-free — AsofJoinSpec asserts the
    // deterministic choice on a synthetic tied input.)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lt.unionByName(rt)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("asof"))
  }
}
