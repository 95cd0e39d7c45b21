package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Merge-on-read tombstone deletes + threshold-gated vacuum.
  *
  * Fixture: partitions a (50% dead), b (10% dead), c (100% dead);
  * vacuum at minDeadFraction 0.4 must rewrite a, leave b merge-on-read
  * byte-identical, and remove c's directory entirely.
  */
class TombstoneSpec extends SparkSpec {

  private def freshTable(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tomb_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "t").getAbsolutePath
    val rows =
      (0L until 10L).map(i => (i, s"a$i", "a")) ++
        (100L until 110L).map(i => (i, s"b$i", "b")) ++
        (200L until 204L).map(i => (i, s"c$i", "c"))
    rows.toDF("k", "payload", "part")
      .write.mode("overwrite").partitionBy("part").parquet(path)
    path
  }

  private def listing(path: String): Seq[(String, Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .sortBy(_._1).toSeq
  }

  private def tombs(path: String) = {
    import spark.implicits._
    Seq(
      (0L until 10L).filter(_ % 2 == 0).map(i => (i, "a")), // 5/10 dead
      Seq((100L, "b")), // 1/10 dead
      (200L until 204L).map(i => (i, "c")) // 4/4 dead
    ).flatten.toDF("k", "part")
  }

  test("appendTombstones touches no table file; readLogical hides the keys") {
    val path = freshTable()
    val before = Seq("a", "b", "c").map(p => listing(s"$path/part=$p"))
    Layout.appendTombstones(spark, path, tombs(path), "k", "part")
    val after = Seq("a", "b", "c").map(p => listing(s"$path/part=$p"))
    assert(before == after, "delete must be an append to the sidecar only")
    // raw read still sees every physical row; logical read hides 10
    assert(spark.read.parquet(path).count() == 24)
    val logical = Layout.readLogical(spark, path, "k", "part")
    assert(logical.count() == 14)
    assert(logical.filter(col("part") === "c").count() == 0)
    assert(logical.filter(col("part") === "a").count() == 5)
  }

  test("vacuum rewrites only partitions past the gate; logical view is invariant") {
    val path = freshTable()
    Layout.appendTombstones(spark, path, tombs(path), "k", "part")
    val logicalBefore = Layout.readLogical(spark, path, "k", "part")
      .orderBy("k").collect().toSeq
    val bBefore = listing(s"$path/part=b")
    val (nParts, purged) =
      Layout.vacuumTombstones(spark, path, "k", "part", 0.4)
    assert(nParts == 2, "a (50%) and c (100%) pass the 0.4 gate")
    assert(purged == 9, "a's 5 + c's 4 tombstones purged")
    // b stayed merge-on-read: byte-identical files, tombstone retained
    assert(listing(s"$path/part=b") == bBefore)
    // c is gone physically
    assert(listing(s"$path/part=c").isEmpty)
    // a holds only survivors now
    assert(spark.read.parquet(path).filter(col("part") === "a").count() == 5)
    // the logical view never changed
    val logicalAfter = Layout.readLogical(spark, path, "k", "part")
      .orderBy("k").collect().toSeq
    assert(logicalAfter == logicalBefore)
    // sidecar = exactly b's surviving tombstone
    assert(spark.read.parquet(s"$path/_tombstones").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))) == Seq((100L, "b")))
  }

  test("vacuum is idempotent and duplicate tombstones collapse") {
    val path = freshTable()
    Layout.appendTombstones(spark, path, tombs(path), "k", "part")
    Layout.appendTombstones(spark, path, tombs(path), "k", "part") // dup batch
    assert(Layout.readLogical(spark, path, "k", "part").count() == 14)
    val (n1, p1) = Layout.vacuumTombstones(spark, path, "k", "part", 0.4)
    assert(n1 == 2 && p1 == 9, "distinct() collapses the duplicate batch")
    val (n2, p2) = Layout.vacuumTombstones(spark, path, "k", "part", 0.4)
    assert(n2 == 0 && p2 == 0L)
    assert(Layout.readLogical(spark, path, "k", "part").count() == 14)
  }

  test("no tombstones: vacuum is a no-op; bad threshold throws") {
    val path = freshTable()
    assert(Layout.vacuumTombstones(spark, path, "k", "part", 0.5) == ((0, 0L)))
    intercept[IllegalArgumentException] {
      Layout.vacuumTombstones(spark, path, "k", "part", 0.0)
    }
    intercept[IllegalArgumentException] {
      Layout.vacuumTombstones(spark, path, "k", "part", 1.5)
    }
  }

  test("tombstones against a vanished partition are purged, not orphaned") {
    import spark.implicits._
    val path = freshTable()
    Layout.appendTombstones(spark, path, tombs(path), "k", "part")
    Layout.vacuumTombstones(spark, path, "k", "part", 0.4): Unit // removes c
    assert(!new java.io.File(s"$path/part=c").exists())
    // an at-least-once delete retries c's keys after the dir is gone —
    // the gate must still purge them (zero physical rows, nothing to
    // rewrite) or the sidecar grows without bound
    Layout.appendTombstones(spark, path,
      (200L until 204L).map(i => (i, "c")).toDF("k", "part"), "k", "part")
    val (nP, purged) = Layout.vacuumTombstones(spark, path, "k", "part", 0.4)
    assert(nP == 0 && purged == 4L, (nP, purged))
    val (n2, p2) = Layout.vacuumTombstones(spark, path, "k", "part", 0.4)
    assert(n2 == 0 && p2 == 0L, "second vacuum must find a clean sidecar")
    assert(Layout.readLogical(spark, path, "k", "part").count() == 14)
  }

  test("fully-dead partition with ESCAPED characters in its value is physically removed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tombesc_").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "t").getAbsolutePath
    // ':' and ' ' are escaped in partition dir names (ts-shaped value)
    val hot = "2026-01-01 00:00:00"
    ((0L until 4L).map(i => (i, hot)) ++ (10L until 20L).map(i => (i, "cold")))
      .toDF("k", "part").write.mode("overwrite").partitionBy("part").parquet(path)
    Layout.appendTombstones(spark, path,
      (0L until 4L).map(i => (i, hot)).toDF("k", "part"), "k", "part")
    val (nP, purged) = Layout.vacuumTombstones(spark, path, "k", "part", 0.4)
    assert(nP == 1 && purged == 4L, (nP, purged))
    // the escaped directory must be GONE — a raw-path delete would
    // silently no-op and resurrect the rows once the sidecar is purged
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.forall(!_.contains("2026")), dirs)
    assert(spark.read.parquet(path).count() == 10)
    assert(Layout.readLogical(spark, path, "k", "part").count() == 10)
  }

  test("readLogical broadcasts the sidecar: no shuffle on the table side") {
    val path = freshTable()
    Layout.appendTombstones(spark, path, tombs(path), "k", "part")
    val logical = Layout.readLogical(spark, path, "k", "part")
    logical.count()
    val plan = logical.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"sidecar anti-join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"table must not shuffle for deletes:\n$plan")
  }
}
