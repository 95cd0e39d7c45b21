package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.streaming.{MaintainedLock, Streaming}

/** Multi-writer fencing for the maintained table: the epoch-fenced
  * `_LOCK` lease. Three layers — lease-unit semantics (refuse / renew /
  * takeover / fence), the two-driver refusal through the PUBLIC ops,
  * and the zombie-writer fence proving a lost lease can never tear a
  * commit (the fenced batch's debris is exactly the uncommitted-crash
  * window the existing replay recovery heals).
  */
class MaintainedLockSpec extends SparkSpec {

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("lease unit: foreign-live refuses, same-owner re-enters, stale takes over with a higher epoch, old holder is fenced") {
    val root = new Path(Files.createTempDirectory("graft_lock_").toString)
    val fs = fsOf(root)
    var now = 1000000L
    val clock = () => now

    val a = MaintainedLock.acquire(fs, root, "A", staleMs = 5000, clock)
    assert(a.epoch == 1L && !a.reentrant)
    // foreign writer, fresh heartbeat: refused loudly
    val e1 = intercept[RuntimeException] {
      MaintainedLock.acquire(fs, root, "B", staleMs = 5000, clock)
    }
    assert(e1.getMessage.contains("held by writer 'A'"), e1.getMessage)
    // same owner: re-entrant, keeps the epoch, renews the heartbeat
    now += 3000
    val a2 = MaintainedLock.acquire(fs, root, "A", staleMs = 5000, clock)
    assert(a2.epoch == 1L && a2.reentrant)
    // the renewal pushed the heartbeat: B is still refused 4s later
    now += 4000
    intercept[RuntimeException] {
      MaintainedLock.acquire(fs, root, "B", staleMs = 5000, clock)
    }
    // ... but past staleness B takes over with epoch 2
    now += 2000
    val b = MaintainedLock.acquire(fs, root, "B", staleMs = 5000, clock)
    assert(b.epoch == 2L && !b.reentrant)
    // the fence: A's commit-point check now throws; B's passes
    val e2 = intercept[RuntimeException] {
      MaintainedLock.check(fs, root, a)
    }
    assert(e2.getMessage.contains("fenced"), e2.getMessage)
    MaintainedLock.check(fs, root, b)
    // release of a re-entrant hold keeps the file; fresh hold deletes it
    MaintainedLock.release(fs, a2) // reentrant: no-op (and A is superseded)
    MaintainedLock.release(fs, b)
    val c = MaintainedLock.acquire(fs, root, "C", staleMs = 5000, clock)
    assert(c.epoch == 1L, s"released dir restarts epochs, got ${c.epoch}")
  }

  private val maintSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))

  private def batch0(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(
      (1L, Seq(9f, 1f, 0.1f, 0f)), (2L, Seq(9f, 0.1f, 4f, 0f)),
      (3L, Seq(9f, 1.1f, 0f, 0f)), (4L, Seq(9f, 0.9f, 0f, 0.1f)),
      (5L, Seq(9f, 0f, 4.2f, 0f)), (6L, Seq(9f, 0.2f, 3.9f, 0f)),
      (100L, Seq(0f, 9f, 1f, 0f))).toDF("id", "embedding")
  }

  test("two drivers, public API: a second driver's maintenance and deletes REFUSE while the streaming writer's lease is live") {
    val sessA = spark.newSession()
    sessA.conf.set("graft.maintained.owner", "driverA")
    val sessB = spark.newSession()
    sessB.conf.set("graft.maintained.owner", "driverB")
    import sessA.implicits._

    val in = Files.createTempDirectory("graft_2drv_in_").toString
    val table = Files.createTempDirectory("graft_2drv_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_2drv_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")

    batch0(sessA).coalesce(1).write.mode("overwrite").parquet(in)
    val q = Streaming.streamInsertIndexedMaintained(
      sessA.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 40L)
    q.processAllAvailable()

    // driver A's lease is live (heartbeat = the batch just processed):
    // every maintenance/delete face of driver B refuses loudly
    val eC = intercept[Exception] {
      Streaming.compactMaintained(sessB, table)
    }
    assert(eC.getMessage.contains("held by writer 'driverA'"), eC.getMessage)
    val eD = intercept[Exception] {
      Streaming.deleteMaintained(sessB, table,
        sessA.range(1).select(col("id")), "id")
    }
    assert(eD.getMessage.contains("held by writer 'driverA'"), eD.getMessage)
    val eR = intercept[Exception] {
      Streaming.retrainMaintained(sessB, table, k = 2)
    }
    assert(eR.getMessage.contains("held by writer 'driverA'"), eR.getMessage)
    // driver A itself re-enters its own lease fine
    Streaming.compactMaintained(sessA, table): Unit
    q.stop()

    // the stream never releases; the hand-off is the lease going STALE.
    // Age the heartbeat past staleness: driver B now takes over.
    val root = new Path(table)
    val fs = fsOf(root)
    val lockDir = new Path(root, "_LOCK")
    fs.listStatus(lockDir).foreach(st =>
      fs.setTimes(st.getPath, System.currentTimeMillis() - 3600L * 1000, -1))
    assert(Streaming.compactMaintained(sessB, table) >= 0)
    // B's one-shot op released: A can come back (fresh epoch, no fight)
    assert(Streaming.compactMaintained(sessA, table) >= 0)
  }

  test("zombie fence: a writer that loses its lease mid-batch ABORTS before the commit rename; replay after takeover heals exactly-once") {
    val sessA = spark.newSession()
    sessA.conf.set("graft.maintained.owner", "driverA")
    import sessA.implicits._

    val in = Files.createTempDirectory("graft_znb_in_").toString
    val table = Files.createTempDirectory("graft_znb_tbl_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_znb_ckpt_").toString + "/c"
    val cents = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("cent_id", "cvec")
    val root = new Path(table)
    val fs = fsOf(root)
    val usurp = new java.util.concurrent.atomic.AtomicBoolean(true)

    def start() = Streaming.streamInsertIndexedMaintained(
      sessA.readStream.schema(maintSchema).parquet(in),
      dim = 4, numShards = 2, cents, "cent_id", "cvec", table, ckpt,
      maxCell = 4L,
      maintHook = p =>
        // between the maintenance append and its commit, a replacement
        // driver takes over (simulated as its higher-epoch lease file
        // appearing — what acquire() writes after staleness)
        if (p == "maint-appended" && usurp.getAndSet(false)) {
          val out = fs.create(new Path(root, "_LOCK/e_99__driverZ.lease"),
            true)
          try out.write("driverZ".getBytes("UTF-8")) finally out.close()
        })

    batch0(sessA).coalesce(1).write.mode("overwrite").parquet(in)
    val q0 = start()
    q0.processAllAvailable() // batch 0: no maintenance, lands clean
    q0.stop()
    Seq((7L, Seq(8f, 0.5f, 0f, 0f)), (101L, Seq(0f, 8f, 0f, 1f)))
      .toDF("id", "embedding").coalesce(1).write.mode("append").parquet(in)
    val q1 = start()
    val e = intercept[Exception] { q1.processAllAvailable() }
    q1.stop()
    assert(e.getMessage.contains("fenced"), e.getMessage)
    // NO TORN COMMIT: the rename never happened — debris yes (that is
    // the ordinary uncommitted-crash window), commit marker no
    assert(!new java.io.File(s"$table/_centroids/v_1/_GRAFT_COMMIT")
      .exists(), "fenced writer must not have committed")
    assert(new java.io.File(s"$table/cell_id=0").exists(),
      "sources untouched by the fenced writer")

    // the usurper died too; its lease is swept and driver A replays —
    // rollback of the fenced debris + a clean re-run, exactly-once
    fs.delete(new Path(root, "_LOCK/e_99__driverZ.lease"), false)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val t = spark.read.parquet(table)
      .withColumn("cell_id", col("cell_id").cast("long"))
    val ids = t.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L, 101L), ids)
    assert(!new java.io.File(s"$table/cell_id=0").exists(),
      "maintenance completed exactly once after the heal")
    val cc = Streaming.maintainedCentroids(spark, table, cents)
      .select("cent_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(cc == Seq(1L, 2L, 3L), cc)
  }

  test("heartbeat survives setTimes-unsupported filesystems (object-store fallback rewrites the lease file)") {
    // S3A & friends throw UnsupportedOperationException from setTimes;
    // the fallback rewrites the lease file in place, which refreshes
    // mtime and keeps the filename-encoded epoch/owner identity
    val fs = new NoSetTimesFs
    fs.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(Files.createTempDirectory("graft_lock_uoe_").toString)
    val a = MaintainedLock.acquire(fs, root, "A", staleMs = 600000)
    assert(a.epoch == 1L && !a.reentrant)
    val mt0 = fs.getFileStatus(a.path).getModificationTime
    Thread.sleep(25)
    // re-acquire = heartbeat; must NOT throw despite setTimes failing
    val a2 = MaintainedLock.acquire(fs, root, "A", staleMs = 600000)
    assert(a2.epoch == 1L && a2.reentrant)
    val mt1 = fs.getFileStatus(a2.path).getModificationTime
    assert(mt1 > mt0, s"heartbeat did not refresh mtime: $mt0 -> $mt1")
    // the renewed lease still fences a foreign writer
    val e = intercept[RuntimeException] {
      MaintainedLock.acquire(fs, root, "B", staleMs = 600000)
    }
    assert(e.getMessage.contains("held by writer 'A'"), e.getMessage)
  }

  test("fence census: every commit rename in Streaming.scala sits behind a MaintainedLock.check") {
    // grep-census (the OPERATORS.md census pattern): a future writer-path
    // helper that renames a commit file without the fence fails this
    // test at review time, not in production
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/Streaming.scala"))
    import scala.jdk.CollectionConverters._
    val renames = lines.asScala.zipWithIndex.filter { case (l, _) =>
      l.contains("fs.rename(") &&
        !l.trim.startsWith("*") && !l.trim.startsWith("//")
    }
    assert(renames.size >= 3,
      s"census is vacuous: expected >= 3 rename sites, found ${renames.size}")
    renames.foreach { case (l, i) =>
      assert(l.contains("commit"),
        s"Streaming.scala:${i + 1} renames a non-commit path — extend " +
          s"this census consciously if that is intended: $l")
      val before = lines.asScala.slice(math.max(0, i - 3), i)
      assert(before.exists(_.contains("MaintainedLock.check(")),
        s"commit rename at Streaming.scala:${i + 1} has no " +
          "MaintainedLock.check in the 3 preceding lines — unfenced " +
          "commit point")
    }
  }
}

/** RawLocalFileSystem twin of an object-store FS: setTimes unsupported
  * (the S3AFileSystem behavior the heartbeat fallback exists for).
  */
class NoSetTimesFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
    throw new UnsupportedOperationException("setTimes is not supported")
}
