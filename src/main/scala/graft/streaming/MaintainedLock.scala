package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Epoch-fenced writer lease for a maintained table — the multi-writer
  * guard the crash-safety protocol (intent → append → atomic-commit →
  * delete, `Streaming.streamInsertIndexedMaintained` /
  * `compactMaintained` / `retrainMaintained`) needs once more than one
  * driver can point at the same `tablePath`. The reference's
  * coordinator is a single process (`coordinator/main.py:47-86` — one
  * asyncio loop owns all shard clients), so it never faces this; a
  * shared-filesystem table does.
  *
  * Protocol (the classic fencing-token lease, e.g. Chubby/ZooKeeper
  * semantics re-expressed over atomic `create(overwrite = false)` +
  * rename-free reads):
  *
  *   - the lease is a file `_LOCK/e_<epoch>__<owner>.lease`; the LIVE
  *     lease is the highest epoch, and its file's modification time is
  *     the heartbeat (renewed by every [[acquire]] of the same owner);
  *   - a second writer [[acquire]]-ing while a FOREIGN lease's
  *     heartbeat is fresher than `staleMs` REFUSES loudly — no queue,
  *     no wait: concurrent maintained-table writers are a deployment
  *     error, not a scheduling problem;
  *   - a writer may TAKE OVER a stale lease by creating epoch + 1
  *     (atomic create — two racers on the same epoch collide on the
  *     filename and one loses; a post-create re-list catches the
  *     cross-epoch race). Old epochs are pruned on takeover;
  *   - the FENCE: every commit point calls [[check]] immediately before
  *     its atomic rename. A zombie driver that lost its lease (paused
  *     past `staleMs`, then resumed) sees the higher epoch and ABORTS
  *     before renaming — its appended debris is exactly the
  *     uncommitted-crash window the existing replay recovery already
  *     rolls back.
  *
  * The fence is BEST-EFFORT, the standard filesystem-lease limitation:
  * check-then-rename is not atomic, so a takeover landing inside that
  * window still renames (and two different-owner racers on the same
  * stale lease can briefly both believe they hold it — the loser is
  * caught at its next [[check]]). What the protocol guarantees is
  * narrower and sufficient: a writer paused LONGER than the window
  * between its last [[check]] and its rename cannot commit after a
  * takeover, and every mixed outcome is one writer's atomic rename
  * plus uncommitted debris the replay recovery rolls back. True
  * mutual exclusion needs a coordination service (ZooKeeper/etcd)
  * issuing monotonic fencing tokens the STORAGE validates; a
  * filesystem cannot validate tokens at rename time.
  *
  * Owner identity defaults to the Spark `applicationId` (one lease per
  * driver, shared by the streaming writer and any same-driver
  * maintenance call — same-owner re-acquire is re-entrant and keeps
  * the epoch). Override with the session conf
  * `graft.maintained.owner`; staleness with
  * `graft.maintained.leaseMs` (default 600 000 ms). A streaming writer
  * renews per batch and never releases — its lease simply goes stale
  * `staleMs` after the last batch, which IS the intended hand-off
  * point for a replacement driver.
  */
object MaintainedLock {

  /** A held (or re-entrantly shared) lease. `reentrant` leases are not
    * deleted by [[release]] — the original holder (e.g. the streaming
    * writer this maintenance call runs beside) keeps it.
    */
  final case class Lease(epoch: Long, owner: String, path: Path,
                         reentrant: Boolean)

  private def lockDir(root: Path) = new Path(root, "_LOCK")

  private def parse(name: String): Option[(Long, String)] =
    if (!name.startsWith("e_") || !name.endsWith(".lease")) None
    else {
      val body = name.stripPrefix("e_").stripSuffix(".lease")
      val i = body.indexOf("__")
      if (i <= 0) None
      else scala.util.Try(body.substring(0, i).toLong).toOption
        .map(e => (e, body.substring(i + 2)))
    }

  /** (epoch, owner, path, heartbeatMs) of every lease file, unsorted. */
  private def leases(fs: FileSystem, root: Path)
      : Seq[(Long, String, Path, Long)] = {
    val d = lockDir(root)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.flatMap { st =>
      parse(st.getPath.getName)
        .map { case (e, o) => (e, o, st.getPath, st.getModificationTime) }
    }
  }

  private def live(fs: FileSystem, root: Path)
      : Option[(Long, String, Path, Long)] =
    leases(fs, root).sortBy { case (e, o, _, _) => (-e, o) }.headOption

  /** Acquire (or re-entrantly renew) the table's writer lease. Throws
    * if a foreign lease's heartbeat is within `staleMs`; takes over
    * (epoch + 1) if it is stale. `nowMs` is a test seam.
    */
  def acquire(fs: FileSystem, root: Path, owner: String, staleMs: Long,
              nowMs: () => Long = () => System.currentTimeMillis())
      : Lease = {
    require(owner.nonEmpty && !owner.contains("__") && !owner.contains("/"),
      s"lease owner must be non-empty without '__' or '/'; got '$owner'")
    require(staleMs > 0, s"staleMs must be positive; got $staleMs")
    live(fs, root) match {
      case Some((e, o, p, _)) if o == owner =>
        // heartbeat: bump the lease file's mtime. Object-store
        // FileSystems (S3A & friends) don't support setTimes — fall
        // back to rewriting the file in place (create-overwrite of the
        // SAME path refreshes mtime and keeps the filename-encoded
        // epoch/owner identity; racing a same-owner rewrite is benign)
        try fs.setTimes(p, nowMs(), -1)
        catch { case _: UnsupportedOperationException =>
          val out = fs.create(p, true)
          try out.write(owner.getBytes("UTF-8")) finally out.close()
        }
        Lease(e, owner, p, reentrant = true)
      case Some((e, o, _, hb)) if nowMs() - hb <= staleMs =>
        sys.error(s"maintained table $root is held by writer '$o' " +
          s"(epoch $e, heartbeat ${nowMs() - hb} ms ago < lease " +
          s"$staleMs ms): concurrent maintained-table writers are " +
          "refused. If that driver is dead, wait out the lease or " +
          s"remove ${lockDir(root)} by hand.")
      case prev =>
        val epoch = prev.map(_._1 + 1L).getOrElse(1L)
        val p = new Path(lockDir(root), s"e_${epoch}__$owner.lease")
        fs.mkdirs(lockDir(root)): Unit
        // atomic create-no-overwrite: same-epoch racers collide here
        val out = fs.create(p, false)
        try out.write(owner.getBytes("UTF-8")) finally out.close()
        val top = live(fs, root).get
        if (top._1 != epoch || top._2 != owner) {
          fs.delete(p, false): Unit
          sys.error(s"lost lease takeover race for $root to " +
            s"'${top._2}' (epoch ${top._1})")
        }
        // prune superseded epochs so the dir stays O(1)
        leases(fs, root).filter(_._1 < epoch)
          .foreach(l => fs.delete(l._3, false): Unit)
        Lease(epoch, owner, p, reentrant = false)
    }
  }

  /** THE FENCE — call immediately before every commit rename. Throws
    * if this lease is no longer the live maximum (a replacement writer
    * took over after deeming this one dead): the caller must abort
    * without renaming, leaving only uncommitted debris the normal
    * replay recovery rolls back.
    */
  def check(fs: FileSystem, root: Path, lease: Lease): Unit =
    live(fs, root) match {
      case Some((e, o, _, _)) if e == lease.epoch && o == lease.owner => ()
      case Some((e, o, _, _)) =>
        sys.error(s"writer fenced at $root: lease epoch ${lease.epoch} " +
          s"('${lease.owner}') superseded by epoch $e ('$o') — " +
          "aborting before commit")
      case None =>
        sys.error(s"writer fenced at $root: lease epoch ${lease.epoch} " +
          s"('${lease.owner}') vanished — aborting before commit")
    }

  /** Release a lease acquired fresh by this call chain; re-entrant
    * holds are left for their original owner.
    */
  def release(fs: FileSystem, lease: Lease): Unit =
    if (!lease.reentrant) { fs.delete(lease.path, false): Unit }

  /** Lease owner for this session: `graft.maintained.owner` conf if
    * set (the two-driver test seam — one JVM cannot hold two
    * applicationIds), else the applicationId.
    */
  def ownerOf(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.getOption("graft.maintained.owner")
      .getOrElse(spark.sparkContext.applicationId)

  /** Lease staleness for this session (`graft.maintained.leaseMs`,
    * default 10 min — generous against GC pauses; a fenced zombie is
    * caught by [[check]] regardless).
    */
  def staleMsOf(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.maintained.leaseMs")
      .map(_.toLong).getOrElse(600000L)

  /** Acquire → run → release. The maintenance-op wrapper: a same-driver
    * call beside a live streaming writer shares its lease re-entrantly
    * (release keeps it); a standalone driver takes a fresh epoch and
    * releases it. An in-JVM failure releases too — any intent the op
    * left behind is the recovery path's job, and holding a dead lease
    * would only delay it.
    */
  def withLease[T](spark: org.apache.spark.sql.SparkSession, root: Path)
                  (f: Lease => T): T = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = acquire(fs, root, ownerOf(spark), staleMsOf(spark))
    try f(lease) finally release(fs, lease)
  }
}
