package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StructField, StructType}

import graft.operators.Ann

/** The DURABLE on-disk HNSW index — the gap between "HNSW lifecycle
  * operators" and "HNSW index", closed: [[Ann.hnswInsert]] /
  * [[Ann.hnswCompact]] produce batch-proportional `deltaOnly` write
  * sets, and this writer APPLIES them to a persisted hierarchy, keeps
  * the [[Ann.hnswAssignLevels]] assignment sidecar fresh in the SAME
  * commit (the sidecar-staleness hazard of calling the raw operators
  * by hand cannot arise here), and fences every commit through
  * [[MaintainedLock]] with the maintained family's intent → append →
  * atomic-commit → recovery protocol. The reference analogue is the
  * coordinator's continuous insert path into a served index
  * (`coordinator/main.py:47-56` routes, `shard/server.py:60-67`
  * appends); this is that loop for the graph index its README aspires
  * to (`rag_demo/ingest.py:13-14`), crash-safe on a shared filesystem.
  *
  * == Layout ==
  * {{{
  * <root>/
  *   _META                          idCol/vecCol/… (k=v lines)
  *   _centroids/                    the coarse centroids (immutable)
  *   _LOCK/                         MaintainedLock lease files
  *   layer_<l>/__c=<cell>/__e=<n>/  edge rows (cell_id, src, dst, score)
  *   _sidecar/level_<l>/__c=<c>/__e=<n>/   (cell_id, id, vec) rows
  *   _refresh/e_<n>.intent          touched leaf-parent dirs, pre-append
  *   _refresh/e_<n>.commit          THE commit point (atomic rename)
  * }}}
  *
  * Edge leaves partition by the src's LEVEL-l CELL, not by id range —
  * the load-bearing choice. HNSW edges are strictly within-cell, and
  * the repair semantics of [[Ann.hnswInsert]]/[[Ann.hnswCompact]] mean
  * every member of a touched cell gets a complete new adjacency while
  * untouched cells change nothing — so a refresh writes EXACTLY the
  * changed rows (delta = the touched cells' full new content, zero
  * read-modify-write of old edge rows) and rewrites exactly the
  * touched cells' leaf dirs. An id-range bucketing would be rewritten
  * nearly in full every refresh: a batch's touched members scatter
  * uniformly across the id space, so every range bucket intersects
  * the delta — write amplification ∝ corpus, not batch. Per-cell
  * leaves keep it ∝ batch at any corpus size. Directory count is
  * structure-bounded (cells ≤ [[Ann.MaxCentroids]], never corpus-
  * bounded); each leaf file is sorted by `src`, so serving-time hop
  * filters still row-group-prune on footer stats (the cost moved from
  * "scan few range files" to "check C footers, read O(degree) rows" —
  * index-structure-bounded either way).
  *
  * == Visibility and crash safety ==
  * Every leaf directory is versioned by an epoch subdir and data files
  * are NEVER rewritten in place: a refresh appends `__e=<n>` leaves,
  * then atomically renames `_refresh/e_<n>.commit` into place — the
  * single commit point. Readers take, per leaf dir, the highest
  * COMMITTED epoch, so an uncommitted crash leaves invisible debris
  * and a committed crash is already fully visible; [[recover]] (run
  * automatically at the start of every maintenance op) rolls the
  * intent's listed dirs back (delete uncommitted `__e=<n>`) or forward
  * (garbage-collect superseded epochs), both idempotent. A zombie
  * writer that lost its lease is stopped by [[MaintainedLock.check]]
  * immediately before the commit rename — its appended debris is
  * exactly the uncommitted window recovery rolls back. HnswIndexSpec
  * injects crashes at both windows and proves serve-from-refreshed ≡
  * serve-from-merged either way.
  *
  * == Exactly-once streaming ==
  * [[streamInsertHnswMaintained]] maps micro-batch n to epoch n + 1
  * (epoch 0 is the build): a replayed batch whose commit marker exists
  * is skipped whole (the refresh already happened — idempotent), one
  * whose intent never committed is rolled back and re-applied. Do not
  * mix manual [[ingest]] calls into a live stream's epoch space; run
  * them before the stream starts or after it stops (the lease enforces
  * the single-writer half of this).
  *
  * Scale shape per refresh: touched-cell pair scoring + k-bounded
  * re-rank (batch-proportional, [[Ann.hnswInsert]]'s contract), reads
  * of touched sidecar/edge cells only, writes of exactly the touched
  * cells. Ids must be non-negative integral. Epochs GC to one per
  * touched leaf after every commit.
  */
object HnswIndex {

  /** Build-time parameters, persisted in `_META` and read back by
    * every op — the index is self-describing.
    */
  final case class Meta(idCol: String, vecCol: String, centIdCol: String,
                        centVecCol: String, maxLevel: Int, fanout: Int,
                        k: Int)

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaPath(root: Path) = new Path(root, "_META")
  private def refreshDir(root: Path) = new Path(root, "_refresh")
  private def commitPath(root: Path, e: Long) =
    new Path(refreshDir(root), s"e_$e.commit")
  private def intentPath(root: Path, e: Long) =
    new Path(refreshDir(root), s"e_$e.intent")
  private def layerDir(root: Path, l: Int) = new Path(root, s"layer_$l")
  private def sidecarDir(root: Path, l: Int) =
    new Path(new Path(root, "_sidecar"), s"level_$l")

  private def writeFile(fs: FileSystem, p: Path, body: String): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def readFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The committed epoch set — `_refresh/e_<n>.commit` markers. */
  private def committedEpochs(fs: FileSystem, root: Path): Set[Long] = {
    val d = refreshDir(root)
    if (!fs.exists(d)) Set.empty
    else fs.listStatus(d).map(_.getPath.getName).collect {
      case n if n.startsWith("e_") && n.endsWith(".commit") =>
        n.stripPrefix("e_").stripSuffix(".commit").toLong
    }.toSet
  }

  /** Current leaf (highest committed `__e=` subdir) of one cell parent
    * dir. An empty leaf dir (no files) is a real state — it supersedes
    * older epochs with "no rows here anymore".
    */
  private def currentLeaf(fs: FileSystem, parent: Path,
                          committed: Set[Long]): Option[Path] = {
    val es = fs.listStatus(parent).filter(_.isDirectory).map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("__e=")) Some(n.stripPrefix("__e=").toLong -> p)
        else None
      }
      .filter { case (e, _) => committed.contains(e) }
    if (es.isEmpty) None else Some(es.maxBy(_._1)._2)
  }

  /** Current leaf dirs under `dir` (`__c=` parents), restricted to
    * leaves that actually hold parquet files.
    */
  private def currentLeaves(fs: FileSystem, dir: Path,
                            committed: Set[Long]): Seq[Path] = {
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("__c="))
      .flatMap(p => currentLeaf(fs, p, committed))
      .filter(leaf => fs.exists(leaf) && fs.listStatus(leaf)
        .exists(_.getPath.getName.endsWith(".parquet")))
      .toSeq
  }

  /** Current leaves of the NAMED cells only — path-level pruning: the
    * listing is per requested cell, never the whole index.
    */
  private def cellLeaves(fs: FileSystem, dir: Path, committed: Set[Long],
                         cells: Seq[Long]): Seq[Path] =
    cells.map(c => new Path(dir, s"__c=$c"))
      .filter(fs.exists(_))
      .flatMap(p => currentLeaf(fs, p, committed))
      .filter(leaf => fs.listStatus(leaf)
        .exists(_.getPath.getName.endsWith(".parquet")))

  private def edgeSchema = StructType(Seq(
    StructField("cell_id", LongType), StructField("src", LongType),
    StructField("dst", LongType), StructField("score", DoubleType)))

  private def sidecarSchema(meta: Meta) = StructType(Seq(
    StructField("cell_id", LongType), StructField(meta.idCol, LongType),
    StructField(meta.vecCol, ArrayType(FloatType))))

  private def readPaths(spark: SparkSession, paths: Seq[Path],
                        schema: StructType): DataFrame =
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths.map(_.toString): _*)

  /** Persisted build-time parameters. */
  def readMeta(spark: SparkSession, path: String): Meta = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(fs.exists(metaPath(root)), s"no HNSW index at $path (no _META)")
    val kv = readFile(fs, metaPath(root)).linesIterator
      .filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    Meta(kv("idCol"), kv("vecCol"), kv("centIdCol"), kv("centVecCol"),
      kv("maxLevel").toInt, kv("fanout").toInt, kv("k").toInt)
  }

  /** The coarse centroid table the index was built under (immutable —
    * a retrain is a rebuild, the [[Ann.hnswBuild]] contract).
    */
  def readCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(new Path(new Path(path), "_centroids").toString)

  /** The current committed hierarchy, index i = level i's edge table
    * as (cell_id, src, dst, score) — the `layers` shape every [[Ann]]
    * search face walks (they select src/dst/score; cell_id rides along
    * for cell-pruned reads). Each leaf file is src-sorted, so a hop
    * filter row-group-prunes on footer stats.
    */
  def readLayers(spark: SparkSession, path: String): Seq[DataFrame] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val meta = readMeta(spark, path)
    val committed = committedEpochs(fs, root)
    (0 to meta.maxLevel).map { l =>
      readPaths(spark, currentLeaves(fs, layerDir(root, l), committed),
        edgeSchema)
    }
  }

  /** The current committed vector table (level-0 sidecar): one row per
    * live member — (cell_id, idCol, vecCol). This is the `vectors`
    * argument the search faces take; the index is self-contained.
    */
  def readVectors(spark: SparkSession, path: String): DataFrame =
    readSidecar(spark, path).head

  /** The current committed assignment sidecar, one table per level —
    * the [[Ann.hnswAssignLevels]] shape [[Ann.hnswInsert]] /
    * [[Ann.hnswCompact]] take as `existingAssigned`.
    */
  def readSidecar(spark: SparkSession, path: String): Seq[DataFrame] = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val meta = readMeta(spark, path)
    val committed = committedEpochs(fs, root)
    (0 to meta.maxLevel).map { l =>
      readPaths(spark, currentLeaves(fs, sidecarDir(root, l), committed),
        sidecarSchema(meta))
    }
  }

  /** Append one level's edge rows as `__c=<cell>/__e=<epoch>` leaves —
    * never touching an existing file. Each leaf file is src-sorted so
    * hop filters keep their row-group pruning after any refresh.
    */
  private def writeEdgeLeaves(edges: DataFrame, dir: Path,
                              epoch: Long): Unit =
    edges.select(col("cell_id").cast("long").as("cell_id"),
        col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("score").cast("double").as("score"))
      .withColumn("__c", col("cell_id"))
      .withColumn("__e", lit(epoch))
      .repartition(col("__c"))
      .sortWithinPartitions("__c", "src", "dst")
      .write.mode("append").partitionBy("__c", "__e")
      .parquet(dir.toString)

  /** Append one level's sidecar rows as `__c=<cell>/__e=<epoch>`
    * leaves. `cell_id` rides as a DATA column too (leaf-path reads see
    * no partition inference).
    */
  private def writeSidecarLeaves(rows: DataFrame, meta: Meta, dir: Path,
                                 epoch: Long): Unit =
    rows.select(col("cell_id").cast("long").as("cell_id"),
        col(meta.idCol).cast("long").as(meta.idCol), col(meta.vecCol))
      .withColumn("__c", col("cell_id"))
      .withColumn("__e", lit(epoch))
      .repartition(col("__c"))
      .write.mode("append").partitionBy("__c", "__e")
      .parquet(dir.toString)

  /** Make sure every touched parent dir carries an `__e=<epoch>` leaf:
    * a touched cell whose new content is EMPTY (fully-tombstoned cell,
    * edge-less singleton) still needs the epoch dir, or its superseded
    * rows would stay current.
    */
  private def ensureLeaves(fs: FileSystem, root: Path, dirs: Seq[String],
                           epoch: Long): Unit =
    dirs.foreach { d =>
      val leaf = new Path(new Path(root, d), s"__e=$epoch")
      if (!fs.exists(leaf)) { fs.mkdirs(leaf): Unit }
    }

  /** Garbage-collect the listed parent dirs down to their single
    * highest committed epoch (idempotent — safe to re-run from
    * recovery after a post-commit crash).
    */
  private def gc(fs: FileSystem, root: Path, dirs: Seq[String],
                 committed: Set[Long]): Unit =
    dirs.foreach { d =>
      val parent = new Path(root, d)
      if (fs.exists(parent)) {
        val es = fs.listStatus(parent).filter(_.isDirectory).map(_.getPath)
          .flatMap { p =>
            val n = p.getName
            if (n.startsWith("__e=")) Some(n.stripPrefix("__e=").toLong -> p)
            else None
          }
        val keep = es.filter(e => committed.contains(e._1))
          .sortBy(_._1).lastOption.map(_._1)
        es.foreach { case (e, p) =>
          if (!keep.contains(e)) { fs.delete(p, true): Unit }
        }
      }
    }

  /** Roll every leftover refresh intent back (uncommitted: delete its
    * epoch's leaves) or forward (committed: finish the GC), then drop
    * the intent. Runs automatically at the head of [[ingest]] /
    * [[purge]]; call directly to clean a crashed index before serving
    * storage is reclaimed. Idempotent.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val d = refreshDir(root)
    if (!fs.exists(d)) return
    val committed = committedEpochs(fs, root)
    fs.listStatus(d).map(_.getPath)
      .filter(p => p.getName.startsWith("e_") &&
        p.getName.endsWith(".intent"))
      .foreach { ip =>
        val e = ip.getName.stripPrefix("e_").stripSuffix(".intent").toLong
        val dirs = readFile(fs, ip).linesIterator.filter(_.nonEmpty).toSeq
        if (committed.contains(e)) gc(fs, root, dirs, committed)
        else dirs.foreach { dir =>
          val leaf = new Path(new Path(root, dir), s"__e=$e")
          if (fs.exists(leaf)) { fs.delete(leaf, true): Unit }
        }
        fs.delete(ip, false): Unit
      }
  }

  /** Build the index from scratch at `path` (must not already hold
    * one): [[Ann.hnswBuild]] hierarchy + [[Ann.hnswAssignLevels]]
    * sidecar + centroids + meta, committed as epoch 0. Edge rows get
    * their level-l cell from the sidecar (edges are within-cell, so
    * the src's assignment IS the edge's cell).
    */
  def build(spark: SparkSession, path: String, vectors: DataFrame,
            centroids: DataFrame, idCol: String, vecCol: String,
            centIdCol: String, centVecCol: String,
            k: Int, fanout: Int, maxLevel: Int): Unit = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    require(!fs.exists(metaPath(root)) && committedEpochs(fs, root).isEmpty,
      s"$path already holds an HNSW index — build into a fresh " +
        "directory (a half-built one must be deleted by hand)")
    MaintainedLock.withLease(spark, root) { lease =>
      val v = vectors.select(col(idCol).cast("long").as(idCol),
        col(vecCol))
      val neg = v.filter(col(idCol) < 0).limit(1).collect()
      require(neg.isEmpty, "ids must be non-negative integrals")
      val meta = Meta(idCol, vecCol, centIdCol, centVecCol, maxLevel,
        fanout, k)
      val layers = Ann.hnswBuild(v, centroids, idCol, vecCol, centIdCol,
        centVecCol, k, fanout, maxLevel)
      val sidecar = Ann.hnswAssignLevels(v, centroids, idCol, vecCol,
        centIdCol, centVecCol, fanout, maxLevel)
      layers.zipWithIndex.foreach { case (edges, l) =>
        val withCell = edges
          .select(col("src").cast("long").as("src"),
            col("dst").cast("long").as("dst"),
            col("score").cast("double").as("score"))
          .join(sidecar(l).select(col(idCol).cast("long").as("src"),
            col("cell_id").cast("long").as("cell_id")), Seq("src"))
        writeEdgeLeaves(withCell, layerDir(root, l), epoch = 0L)
      }
      sidecar.zipWithIndex.foreach { case (rows, l) =>
        writeSidecarLeaves(rows, meta, sidecarDir(root, l), epoch = 0L)
      }
      centroids.select(col(centIdCol).cast("long").as(centIdCol),
          col(centVecCol))
        .write.mode("overwrite")
        .parquet(new Path(root, "_centroids").toString)
      writeFile(fs, metaPath(root),
        s"idCol=$idCol\nvecCol=$vecCol\ncentIdCol=$centIdCol\n" +
          s"centVecCol=$centVecCol\nmaxLevel=$maxLevel\nfanout=$fanout\n" +
          s"k=$k\n")
      fs.mkdirs(refreshDir(root)): Unit
      val tmp = new Path(refreshDir(root), "e_0.commit.tmp")
      writeFile(fs, tmp, "build\n")
      MaintainedLock.check(fs, root, lease)
      require(fs.rename(tmp, commitPath(root, 0L)),
        s"could not commit build marker at $path")
    }
  }

  /** One refresh transaction shared by [[ingest]] and [[purge]]:
    * given, per level, the touched cells, their COMPLETE new adjacency
    * (`delta` — the repair rewrites every touched cell's member, so
    * the delta IS the cell's new content; no old edge row is read) and
    * their new sidecar content — write intent, append `__e=epoch`
    * leaves, fence, commit atomically, GC. `hook` is the test seam for
    * crash injection ("intent" / "appended" / "committed").
    */
  private def applyRefresh(spark: SparkSession, root: Path, meta: Meta,
      lease: MaintainedLock.Lease, committed: Set[Long], epoch: Long,
      perLevel: Seq[(Seq[Long], DataFrame, DataFrame)],
      hook: String => Unit): Unit = {
    val fs = fsOf(spark, root)
    val touchedDirs = perLevel.zipWithIndex.flatMap {
      case ((cells, _, _), l) =>
        cells.map(c => s"layer_$l/__c=$c") ++
          cells.map(c => s"_sidecar/level_$l/__c=$c")
    }
    if (touchedDirs.isEmpty) return // nothing to refresh at any level
    fs.mkdirs(refreshDir(root)): Unit
    writeFile(fs, intentPath(root, epoch),
      touchedDirs.mkString("", "\n", "\n"))
    hook("intent")
    perLevel.zipWithIndex.foreach { case ((cells, delta, newSide), l) =>
      if (cells.nonEmpty) {
        writeEdgeLeaves(delta, layerDir(root, l), epoch)
        writeSidecarLeaves(newSide, meta, sidecarDir(root, l), epoch)
      }
    }
    ensureLeaves(fs, root, touchedDirs, epoch)
    hook("appended")
    val tmp = new Path(refreshDir(root), s"e_$epoch.commit.tmp")
    writeFile(fs, tmp, touchedDirs.mkString("", "\n", "\n"))
    // THE FENCE: a writer that lost its lease must abort here — its
    // appended leaves are the uncommitted debris recovery rolls back
    MaintainedLock.check(fs, root, lease)
    require(fs.rename(tmp, commitPath(root, epoch)),
      s"could not commit refresh marker for epoch $epoch")
    hook("committed")
    gc(fs, root, touchedDirs, committed + epoch)
    fs.delete(intentPath(root, epoch), false): Unit
  }

  /** Resolve this op's epoch: explicit (the streaming replay contract)
    * or next after the highest committed. Returns None if the explicit
    * epoch is already committed — the whole refresh already applied.
    */
  private def resolveEpoch(committed: Set[Long],
                           epoch: Option[Long]): Option[Long] = {
    require(committed.nonEmpty,
      "index has no committed build epoch — build() first")
    val maxC = committed.max
    epoch match {
      case Some(e) if committed.contains(e) => None
      case Some(e) =>
        require(e > maxC,
          s"explicit epoch $e is below max committed $maxC — epochs " +
            "are monotonic (one stream OR manual calls, not both)")
        Some(e)
      case None => Some(maxC + 1L)
    }
  }

  /** Attach each delta edge's level-l cell from the touched-cell
    * id→cell map (srcs of a refresh delta are exactly the touched
    * cells' members ∪ the batch — both present in `idCells`). No
    * broadcast hint: the map is touched-cell-bounded, which is small
    * for a cell-local batch but corpus-sized for a scattered one —
    * let AQE pick the join side from the real size.
    */
  private def withCells(delta: DataFrame, idCells: DataFrame): DataFrame =
    delta.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("score").cast("double").as("score"))
      .join(idCells, Seq("src"))

  /** Append a batch of new vectors DURABLY: compute the
    * [[Ann.hnswInsert]] delta against the persisted hierarchy through
    * the persisted sidecar (touched cells only), rewrite exactly the
    * touched cells' edge leaves (the delta is their complete new
    * adjacency — nothing else changed, nothing else is read or
    * written), refresh the touched sidecar cells (old members ∪ batch
    * — the sidecar covers the index EXACTLY after every commit), all
    * in one fenced intent→append→commit→GC transaction. Batch ids
    * must be new (loud require — the [[Ann.hnswInsert]] contract,
    * checked here against the full level-0 sidecar id column; this is
    * the ONE corpus-row-count term in the refresh — an id-only
    * column-pruned scan. `checkDisjoint = false` skips it for
    * producers that guarantee fresh ids structurally, e.g. a crawler
    * assigning monotonic ids — the collision failure mode is then
    * silent graph corruption, so leave it on unless the scan is
    * measured to matter). Returns the committed epoch; a replay whose
    * epoch already committed is skipped whole and returns it
    * unchanged.
    */
  def ingest(spark: SparkSession, path: String, batch: DataFrame,
             epoch: Option[Long] = None,
             hook: String => Unit = _ => (),
             checkDisjoint: Boolean = true): Long = {
    val root = new Path(path)
    MaintainedLock.withLease(spark, root) { lease =>
      recover(spark, path)
      val fs = fsOf(spark, root)
      val meta = readMeta(spark, path)
      val committed = committedEpochs(fs, root)
      val e = resolveEpoch(committed, epoch) match {
        case None => return epoch.get // already applied — idempotent
        case Some(v) => v
      }
      val cents = readCentroids(spark, path)
      val b = batch.select(col(meta.idCol).cast("long").as(meta.idCol),
        col(meta.vecCol)).localCheckpoint(false)
      val bounds = b.agg(min(col(meta.idCol)), max(col(meta.idCol))).head
      if (bounds.isNullAt(0)) return committed.max // empty batch: no-op
      require(bounds.getLong(0) >= 0, "ids must be non-negative integrals")
      val vecTable = readVectors(spark, path)
      if (checkDisjoint) {
        // disjointness against the FULL membership (a collision's twin
        // can live in an untouched cell): id-column-pruned scan, limit-1
        val allIds = vecTable.select(col(meta.idCol).cast("long").as("__id"))
        val clash = b.select(col(meta.idCol).cast("long").as("__id"))
          .join(allIds, Seq("__id"), "left_semi").limit(1).collect()
        require(clash.isEmpty,
          s"ingest: batch id ${clash.head.getLong(0)} already exists in " +
            "the index — ids are append-only; dedup the batch or route " +
            "updates through purge + ingest")
      }
      val bAsg = Ann.hnswAssignLevels(b, cents, meta.idCol, meta.vecCol,
        meta.centIdCol, meta.centVecCol, meta.fanout, meta.maxLevel)
        .map(_.localCheckpoint(false))
      val perLevel = (0 to meta.maxLevel).map { l =>
        val cells = bAsg(l).select(col("cell_id").cast("long"))
          .distinct().collect().map(_.getLong(0)).sorted.toSeq
        val touchedSide = readPaths(spark,
          cellLeaves(fs, sidecarDir(root, l), committed, cells),
          sidecarSchema(meta))
        (cells, touchedSide,
          touchedSide.unionByName(
            bAsg(l).select(col("cell_id").cast("long").as("cell_id"),
              col(meta.idCol), col(meta.vecCol))))
      }
      // restricted current layers: the delta only reuses the stored
      // adjacency of touched cells' members — read exactly those leaves
      val restricted = (0 to meta.maxLevel).map { l =>
        readPaths(spark,
          cellLeaves(fs, layerDir(root, l), committed, perLevel(l)._1),
          edgeSchema)
          .select(col("src"), col("dst"), col("score"))
      }
      val vectors = vecTable.select(col(meta.idCol), col(meta.vecCol))
      val deltas = Ann.hnswInsert(restricted, vectors, b, cents,
        meta.idCol, meta.vecCol, meta.centIdCol, meta.centVecCol,
        meta.k, meta.fanout, deltaOnly = true,
        existingAssigned = perLevel.map(_._2),
        checkDisjoint = false, verifySidecar = false)
      val plans = (0 to meta.maxLevel).map { l =>
        val (cells, _, newSide) = perLevel(l)
        // id→cell of everything a delta src can be: the new sidecar
        // content (touched members ∪ batch)
        val idCells = newSide
          .select(col(meta.idCol).cast("long").as("src"),
            col("cell_id").cast("long").as("cell_id"))
        (cells, withCells(deltas(l), idCells), newSide)
      }
      applyRefresh(spark, root, meta, lease, committed, e, plans, hook)
      e
    }
  }

  /** PHYSICAL tombstone purge, durable: the [[Ann.hnswCompact]] delta
    * (survivor×survivor re-link of exactly the cells holding a
    * tombstoned member) applied to the persisted hierarchy, dead rows
    * dropped from the touched cells' edges AND sidecar in the same
    * commit — the compacted index equals a fresh [[build]] on the
    * survivors (the operator's EXACT contract; HnswIndexSpec and the
    * `q_hnsw_maintained_purge` oracle both pin it). Tombstone→cell
    * discovery scans the per-level sidecar's (cell_id, id) columns
    * (ids defeat min/max pruning); member reads and every write stay
    * cell-local. Unknown ids are ignored (idempotent replay).
    */
  def purge(spark: SparkSession, path: String, tombstones: DataFrame,
            tombIdCol: String, epoch: Option[Long] = None,
            hook: String => Unit = _ => ()): Long = {
    val root = new Path(path)
    MaintainedLock.withLease(spark, root) { lease =>
      recover(spark, path)
      val fs = fsOf(spark, root)
      val meta = readMeta(spark, path)
      val committed = committedEpochs(fs, root)
      val e = resolveEpoch(committed, epoch) match {
        case None => return epoch.get
        case Some(v) => v
      }
      val tomb = Ann.boundedTombstones(tombstones, tombIdCol)
        .localCheckpoint(false)
      val sidecar = readSidecar(spark, path)
      val plans = (0 to meta.maxLevel).map { l =>
        val cells = sidecar(l)
          .select(col("cell_id").cast("long").as("cell_id"),
            col(meta.idCol).cast("long").as("__id"))
          .join(tomb, col("__id") === col("__tid"))
          .select(col("cell_id")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        val members = readPaths(spark,
          cellLeaves(fs, sidecarDir(root, l), committed, cells),
          sidecarSchema(meta)).localCheckpoint(false)
        val survivors = members.join(tomb,
          col(meta.idCol).cast("long") === col("__tid"), "left_anti")
        (cells, members, survivors)
      }
      // the compact delta, against restricted layers (the touched
      // cells' leaves — the only stored adjacency the purge re-links)
      val restricted = (0 to meta.maxLevel).map { l =>
        readPaths(spark,
          cellLeaves(fs, layerDir(root, l), committed, plans(l)._1),
          edgeSchema)
          .select(col("src"), col("dst"), col("score"))
      }
      val vectors = readVectors(spark, path)
        .select(col(meta.idCol), col(meta.vecCol))
      val deltas = Ann.hnswCompact(restricted, vectors, tombstones,
        tombIdCol, readCentroids(spark, path), meta.idCol, meta.vecCol,
        meta.centIdCol, meta.centVecCol, meta.k, meta.fanout,
        deltaOnly = true, existingAssigned = plans.map(_._2),
        verifySidecar = false, boundedTomb = Some(tomb))
      val perLevel = (0 to meta.maxLevel).map { l =>
        val (cells, _, survivors) = plans(l)
        val idCells = survivors
          .select(col(meta.idCol).cast("long").as("src"),
            col("cell_id").cast("long").as("cell_id"))
        (cells, withCells(deltas(l), idCells), survivors)
      }
      applyRefresh(spark, root, meta, lease, committed, e, perLevel, hook)
      e
    }
  }

  /** Serve one query from the persisted index — descent + beam over
    * the current committed hierarchy and vector table.
    */
  def search(spark: SparkSession, path: String, query: Seq[Float],
             beam: Int, hops: Int, descentHops: Int = 2): DataFrame = {
    val meta = readMeta(spark, path)
    Ann.hnswSearch(readLayers(spark, path), readVectors(spark, path),
      meta.idCol, meta.vecCol, query, meta.fanout, beam, hops,
      descentHops)
  }

  /** Serve a query TABLE from the persisted index — the distributed
    * batch face ([[Ann.hnswSearchBatch]]): bounded jobs for any query
    * count.
    */
  def searchBatch(spark: SparkSession, path: String, queries: DataFrame,
                  qidCol: String, qvecCol: String, beam: Int, hops: Int,
                  descentHops: Int = 2): DataFrame = {
    val meta = readMeta(spark, path)
    Ann.hnswSearchBatch(readLayers(spark, path),
      readVectors(spark, path), queries, meta.idCol, meta.vecCol,
      qidCol, qvecCol, meta.fanout, beam, hops, descentHops)
  }

  /** Operational state report — the `DESCRIBE INDEX` runbook surface,
    * the [[Streaming.describeMaintained]] twin for the graph index:
    * per level (cells, edge rows, members, leaf files, bytes) from
    * listings and parquet footers plus table-level rollups, as
    * (metric, level, value) long-format rows. `epoch_debt` counts leaf
    * dirs still holding more than one committed epoch (un-GC'd — a
    * crashed post-commit window [[recover]] would fold);
    * `pending_refresh` counts intents awaiting recovery. Cost is
    * index-structure-bounded: listings + footers, no data pages.
    */
  def describe(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val meta = readMeta(spark, path)
    val committed = committedEpochs(fs, root)
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer[(String, Int, Long)]()
    def leafStats(dir: Path): (Long, Long, Long, Long) = {
      // (parents, leaf files, bytes, multi-epoch parents)
      if (!fs.exists(dir)) return (0L, 0L, 0L, 0L)
      val parents = fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("__c="))
      var files = 0L; var bytes = 0L; var debt = 0L
      parents.foreach { p =>
        val es = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
          .filter(q => q.getName.startsWith("__e=") &&
            committed.contains(
              q.getName.stripPrefix("__e=").toLong))
        if (es.length > 1) debt += 1
        es.foreach { leaf =>
          fs.listStatus(leaf)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .foreach { st => files += 1; bytes += st.getLen }
        }
      }
      (parents.length.toLong, files, bytes, debt)
    }
    var debtTotal = 0L
    (0 to meta.maxLevel).foreach { l =>
      val (cells, files, bytes, debt) = leafStats(layerDir(root, l))
      val (_, sFiles, sBytes, sDebt) = leafStats(sidecarDir(root, l))
      debtTotal += debt + sDebt
      out += (("cells", l, cells))
      out += (("edge_rows", l,
        readPaths(spark, currentLeaves(fs, layerDir(root, l), committed),
          edgeSchema).count()))
      out += (("members", l,
        readPaths(spark,
          currentLeaves(fs, sidecarDir(root, l), committed),
          sidecarSchema(meta)).count()))
      out += (("files", l, files + sFiles))
      out += (("bytes", l, bytes + sBytes))
    }
    out += (("epochs_committed", -1, committed.size.toLong))
    out += (("max_epoch", -1, if (committed.isEmpty) -1L else committed.max))
    out += (("epoch_debt", -1, debtTotal))
    val pend =
      if (!fs.exists(refreshDir(root))) 0L
      else fs.listStatus(refreshDir(root))
        .count(_.getPath.getName.endsWith(".intent")).toLong
    out += (("pending_refresh", -1, pend))
    out.toSeq.toDF("metric", "level", "value").orderBy($"metric", $"level")
  }

  /** Structural invariant check — the [[Streaming.fsckMaintained]]
    * twin: returns (check, bad_count, detail) rows, all zero on a
    * healthy index. Checks: duplicate sidecar ids; members whose
    * stored cell is not the argmax under the stored centroids; edge
    * rows whose src/dst is absent from the level's membership
    * (dangling adjacency); edge rows filed under a different cell than
    * their src's assignment; srcs past the bounded degree k;
    * uncommitted leaf debris no intent covers ([[recover]] cannot see
    * it — a manual listing, this is the check that finds it); pending
    * refresh intents. Full-scan by design (fsck is the offline audit).
    */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val meta = readMeta(spark, path)
    val committed = committedEpochs(fs, root)
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val side = readSidecar(spark, path)
    val dups = side.head.groupBy(col(meta.idCol)).count()
      .filter(col("count") > 1)
      .agg(count(lit(1)), sum(col("count") - 1)).head
    out += (("duplicate_ids",
      if (dups.isNullAt(1)) 0L else dups.getLong(1),
      if (dups.getLong(0) == 0) ""
      else s"${dups.getLong(0)} ids stored more than once"))
    val cents = readCentroids(spark, path)
    val misfiled = Ann.ivfAssign(
        side.head.select(col(meta.idCol), col(meta.vecCol),
          col("cell_id").as("__stored")),
        cents, meta.idCol, meta.vecCol, meta.centIdCol, meta.centVecCol)
      .filter(col("cell_id") =!= col("__stored")).count()
    out += (("misfiled_members", misfiled,
      if (misfiled == 0) ""
      else "stored cell != argmax under stored centroids"))
    var dangling = 0L; var crossCell = 0L; var overdeg = 0L
    (0 to meta.maxLevel).foreach { l =>
      val edges = readPaths(spark,
        currentLeaves(fs, layerDir(root, l), committed), edgeSchema)
      val ids = side(l).select(col(meta.idCol).cast("long").as("__id"),
        col("cell_id").cast("long").as("__mc"))
      dangling += edges.join(ids, col("src") === col("__id"), "left_anti")
        .count()
      dangling += edges.join(ids, col("dst") === col("__id"), "left_anti")
        .count()
      crossCell += edges.join(ids, col("src") === col("__id"))
        .filter(col("cell_id") =!= col("__mc")).count()
      val od = edges.groupBy(col("src")).count()
        .filter(col("count") > meta.k).count()
      overdeg += od
    }
    out += (("dangling_edges", dangling,
      if (dangling == 0) "" else "edge endpoint absent from membership"))
    out += (("cross_cell_edges", crossCell,
      if (crossCell == 0) "" else "edge filed under a foreign cell"))
    out += (("overdegree_srcs", overdeg,
      if (overdeg == 0) "" else s"adjacency larger than k=${meta.k}"))
    // uncommitted debris: __e dirs whose epoch never committed AND no
    // intent lists them (crash inside the intent write window, or a
    // hand-damaged tree) — recover() cannot find these via intents
    var debris = 0L
    def scanDebris(dir: Path): Unit =
      if (fs.exists(dir))
        fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith("__c="))
          .foreach { p =>
            fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
              .foreach { q =>
                val n = q.getName
                if (n.startsWith("__e=") &&
                  !committed.contains(n.stripPrefix("__e=").toLong))
                  debris += 1
              }
          }
    (0 to meta.maxLevel).foreach { l =>
      scanDebris(layerDir(root, l)); scanDebris(sidecarDir(root, l))
    }
    val intents =
      if (!fs.exists(refreshDir(root))) 0L
      else fs.listStatus(refreshDir(root))
        .count(_.getPath.getName.endsWith(".intent")).toLong
    out += (("uncommitted_debris", debris,
      if (debris == 0) ""
      else s"$debris uncommitted leaf dirs (run recover; " +
        s"$intents intents pending)"))
    out += (("pending_refresh", intents,
      if (intents == 0) "" else "run recover"))
    out.toSeq.toDF("check", "bad_count", "detail").orderBy($"check")
  }

  /** Continuous durable ingest — the graph-index twin of
    * [[Streaming.streamInsertIndexedMaintained]]: every micro-batch of
    * (idCol, vecCol) rows lands in the persisted hierarchy through ONE
    * fenced [[ingest]] transaction, exactly-once under replay
    * (micro-batch n is epoch n + 1; a committed epoch skips whole, an
    * uncommitted crash rolls back and re-applies). Chunk→embed
    * upstream transforms compose in front of `stream` as ordinary
    * DataFrame ops (the `streamDecontaminateIngest` precedent).
    * `onIngest(batchId, epoch)` fires after each committed refresh;
    * `hook` is the crash-injection test seam passed through to
    * [[ingest]].
    */
  def streamInsertHnswMaintained(stream: DataFrame, indexPath: String,
      checkpointPath: String,
      onIngest: (Long, Long) => Unit = (_, _) => (),
      hook: String => Unit = _ => (),
      checkDisjoint: Boolean = true): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val e = ingest(batch.sparkSession, indexPath, batch,
            epoch = Some(batchId + 1L), hook = hook,
            checkDisjoint = checkDisjoint)
          onIngest(batchId, e)
        }
        ()
      }
      .start()
}
