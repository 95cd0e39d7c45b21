package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers: the write-side half of shuffle avoidance.
  *
  * At 100 TB the cheapest shuffle is the one the layout already paid for:
  *   - BUCKETING pre-hashes a join/aggregation key at write time; a join
  *     of two tables bucketed on the same key by the same count needs NO
  *     exchange on either side (LayoutSpec asserts the plan).
  *   - PARTITIONING by a low-cardinality column turns predicates on it
  *     into directory pruning — the IVF probe below reads only the
  *     probed cells' files, never touching the rest of the corpus.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table (bucket pruning and
    * exchange-free joins for every future reader of `key`).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Write `df` partitioned by `partCol` (directory-per-value layout). */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Read back only the partitions whose `partCol` is in `values` —
    * Catalyst turns the IN filter into PartitionFilters (no data files
    * outside the listed directories are opened).
    */
  def readPartitions(spark: SparkSession, path: String, partCol: String,
                     values: Seq[Any]): DataFrame =
    spark.read.parquet(path).filter(col(partCol).isin(values: _*))
}
