package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Z-order (Morton) value of two non-negative integer columns at
    * `bits` bits each: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Sorting by this value clusters rows that are close in
    * BOTH dimensions into the same files, so parquet min/max stats
    * prune a two-sided box predicate far better than a single-column
    * sort (which only ever skips on its leading column) — the standard
    * multi-dimensional data-skipping layout. The expression is an
    * unrolled chain of literal shift/mask builtins — whole-stage
    * codegen'd, and replicated term-for-term in the q_zorder oracle.
    */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31)
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (z, i) =>
      z + shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Write with per-column PARQUET BLOOM FILTERS — the point-lookup
    * complement to [[writeZOrdered]]'s min/max skipping: an equality
    * probe on a high-cardinality UNSORTED column (doc ids, url hashes,
    * join keys) gets row-group skipping from the bloom even though its
    * min/max stats span everything, and without spending the one sort
    * order the layout has on it. Costs ~`ndv`-sized bitsets per row
    * group at write time, nothing at all on non-probe reads. Readers
    * need no code change: Spark pushes the equality predicate into
    * parquet-mr, which consults the bloom per row group before
    * decoding a byte (LayoutSpec probes the written blooms directly —
    * present keys hit, absent keys miss — and pins that only the
    * listed columns carry one).
    */
  def writeBloomIndexed(df: DataFrame, path: String, cols: Seq[String],
                        expectedNdv: Long = 100000L): Unit = {
    require(cols.nonEmpty, "writeBloomIndexed: name at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"writeBloomIndexed: no such columns $missing")
    cols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  /** Sort by the interleaved z-value and write `numFiles` files — the
    * write-side half of two-dimensional data skipping.
    */
  def writeZOrdered(df: DataFrame, path: String, a: String, b: String,
                    bits: Int, numFiles: Int): Unit =
    df.withColumn("__z", zValue2(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory to ~`targetFileBytes` files — the
    * small-files maintenance pass every continuously-ingested table
    * needs (`streamInsert`'s per-micro-batch appends, IVF cell
    * directories): a 100 TB table accreting thousands of KB-sized
    * files per hour makes every scan pay file-open + footer-parse per
    * file and starves split planning. File count = ceil(current bytes
    * / target), sized from the source listing (compression ratio
    * carries over since the format is unchanged). Round-robin
    * repartition spreads rows evenly; rewrite-then-swap is the caller's
    * transaction (write to a new path, then move — object stores have
    * no atomic directory overwrite).
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              targetFileBytes: Long = 128L << 20): (Int, Int) = {
    require(targetFileBytes >= 1)
    val hconf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(hconf)
    val files = fs.listStatus(src)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(srcPath)
      .repartition(nOut)
      .write.mode("overwrite").parquet(dstPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(dstPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (files.length, after)
  }

  /** Copy-on-write MERGE (upsert) into a partitioned parquet table —
    * the continuous-ingest maintenance op a table format (Delta/Iceberg)
    * would provide, built from Spark's own dynamic partition overwrite:
    *
    *   1. the updates' partition values prune the read (only TOUCHED
    *      partitions are scanned — at 100 TB a daily upsert reads the
    *      affected days, never the table);
    *   2. merge = left-anti on `keyCol` (drop old versions of updated
    *      keys) + union of the updates — updates WIN, new keys append;
    *   3. `partitionOverwriteMode=dynamic` rewrites ONLY the partition
    *      directories present in the merged frame; every other
    *      partition's files are untouched bytes on disk (asserted in
    *      LayoutSpec by file listing).
    *
    * Readers see old-or-new per partition (parquet has no multi-dir
    * transaction — the per-partition swap itself is atomic-enough for
    * append-mostly ingest; a table format adds the cross-partition
    * commit log, nothing else in this op changes).
    *
    * PRECONDITION — stable partitioning: `partCol` must be a pure
    * function of `keyCol` (dates keyed by event id, shards by hash…),
    * i.e. an update may not MOVE a key to a different partition. A
    * migrated key's old row lives in a partition this op deliberately
    * never reads, so it would survive as a stale duplicate. Migrating
    * keys need the full-table merge (read everything, left-anti, rewrite
    * everything) — the exact cost this partition-local op exists to
    * avoid, so it refuses to pay it silently.
    *
    * Returns the number of rewritten partitions.
    */
  def mergeUpsert(spark: SparkSession, tableDir: String, updates: DataFrame,
                  keyCol: String, partCol: String): Int =
    mergeCdc(spark, tableDir, updates,
      updates.select(col(keyCol), col(partCol)).limit(0), keyCol, partCol)

  /** Build (or fully seed) a materialized ROLLUP — see [[refreshRollup]],
    * which this delegates to: on an empty destination every source
    * partition counts as changed, so the initial build and the
    * incremental refresh are literally the same operation.
    */
  def materializeRollup(spark: SparkSession, srcPath: String, dstPath: String,
                        partCol: String, dims: Seq[String],
                        aggs: Seq[Column]): Int =
    refreshRollup(spark, srcPath, dstPath, partCol, dims, aggs)

  /** Incrementally refresh a materialized rollup (summary table) over a
    * PARTITIONED source — the incremental-view-maintenance staple:
    * summary rows are `groupBy(partCol, dims).agg(aggs)` WITHIN each
    * source partition, stored partitioned by the same column beside a
    * `_rollup_manifest` that records each source partition's FILE
    * FINGERPRINT (md5 of the sorted name:length file listing — a
    * metadata-only decision, no source data is read for unchanged
    * partitions). A refresh recomputes ONLY partitions whose
    * fingerprint changed or appeared, deletes summary partitions whose
    * source vanished, and leaves every other summary partition
    * byte-identical on disk (file-listing-asserted in LayoutSpec).
    * Returns #partitions refreshed + removed; 0 means nothing changed.
    *
    * Crash safety by idempotence: the manifest writes LAST, so a crash
    * mid-refresh leaves stale fingerprints and the next run simply
    * re-derives those partitions (recompute-on-doubt — no marker
    * protocol, unlike the maintained-table moves where rows change
    * ADDRESS; here recomputation is pure).
    *
    * The summary grain must include `partCol`; cross-partition grains
    * aggregate the summary further at read time (the standard
    * two-level rollup — counts/sums/mins/maxes compose). `aggs` are
    * pre-aliased aggregate Columns. A rollup over a NON-composable
    * aggregate (exact median, …) belongs in a sketch column instead.
    */
  def refreshRollup(spark: SparkSession, srcPath: String, dstPath: String,
                    partCol: String, dims: Seq[String],
                    aggs: Seq[Column]): Int = {
    require(aggs.nonEmpty, "refreshRollup: name at least one aggregate")
    val srcRoot = new org.apache.hadoop.fs.Path(srcPath)
    val fs = srcRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(srcRoot), s"refreshRollup: no source at $srcPath")
    def fingerprint(d: org.apache.hadoop.fs.Path): String = {
      val listing = fs.listStatus(d).filter(_.isFile)
        .map(s => s.getPath.getName + ":" + s.getLen).sorted
        .mkString("\n")
      java.security.MessageDigest.getInstance("MD5")
        .digest(listing.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // keys are the ESCAPED directory names — the one spelling that is
    // stable across listing, writing, and deleting
    val srcParts: Map[String, String] = fs.listStatus(srcRoot)
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(s"$partCol="))
      .map(d => d.getName -> fingerprint(d)).toMap
    val manifestPath = s"$dstPath/_rollup_manifest"
    val manifest: Map[String, String] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(manifestPath))) Map.empty
      else spark.read.parquet(manifestPath)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val changed = srcParts.collect {
      case (p, fp) if !manifest.get(p).contains(fp) => p
    }.toSeq.sorted
    val removed = (manifest.keySet -- srcParts.keySet).toSeq.sorted
    if (changed.isEmpty && removed.isEmpty) return 0

    // a changed partition that became file-less produces no summary
    // rows (dynamic overwrite would leave its stale dir) — treat it
    // like a removed one
    val (changedEmpty, changedLive) = changed.partition(p =>
      fingerprintIsEmptySource(fs, new org.apache.hadoop.fs.Path(s"$srcPath/$p")))
    var truncated: Seq[String] = Seq.empty
    if (changedLive.nonEmpty) {
      val read0 = spark.read.option("basePath", srcPath)
        .parquet(changedLive.map(p => s"$srcPath/$p"): _*)
      // when every changed partition is the NULL-keyed one, partition
      // inference sees only __HIVE_DEFAULT_PARTITION__ and types the
      // column VOID — unpartitionable on the rewrite. Recover the real
      // type from the full source (a listing-cost schema read, same
      // metadata the fingerprints already walked).
      val read =
        if (read0.schema(partCol).dataType !=
            org.apache.spark.sql.types.NullType) read0
        else {
          val t = spark.read.parquet(srcPath).schema(partCol).dataType match {
            case org.apache.spark.sql.types.NullType =>
              org.apache.spark.sql.types.StringType
            case other => other
          }
          read0.withColumn(partCol, col(partCol).cast(t))
        }
      val rows = read
        .groupBy((partCol +: dims).map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .localCheckpoint(false) // reused: the write + the produced-set
      withDynamicPartitionOverwrite(spark) {
        rows
          .select(rows.columns.filter(_ != partCol).map(col) :+ col(partCol): _*)
          .write.mode("overwrite").partitionBy(partCol).parquet(dstPath)
      }
      // a changed partition whose files hold ZERO rows (truncated by an
      // external writer) also emits nothing — the overwrite left its
      // stale summary; find it by diffing the produced partition set
      // NULL partition values must reach getPartitionPathString AS null
      // (it emits the __HIVE_DEFAULT_PARTITION__ escape Spark writes);
      // String.valueOf(null) would build "part=null", never matching the
      // written dir, so a null-keyed truncated partition would keep its
      // stale summary
      val producedDirs = rows.select(col(partCol)).distinct().collect()
        .map(r => org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partCol,
            if (r.isNullAt(0)) null else String.valueOf(r.get(0)))).toSet
      truncated = changedLive.filterNot(producedDirs)
    }
    (changedEmpty ++ truncated ++ removed).foreach { p =>
      val sd = new org.apache.hadoop.fs.Path(s"$dstPath/$p")
      if (fs.exists(sd)) fs.delete(sd, true): Unit
    }
    // manifest LAST (see crash-safety note)
    import spark.implicits._
    srcParts.toSeq.sortBy(_._1).toDF("part", "fp")
      .coalesce(1).write.mode("overwrite").parquet(manifestPath)
    changed.length + removed.length
  }

  private def fingerprintIsEmptySource(
      fs: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path): Boolean =
    !fs.exists(d) || fs.listStatus(d).forall(!_.isFile)

  /** Run `body` with `partitionOverwriteMode=dynamic`, restoring the
    * previous session value after — the shared wrapper for every
    * partition-scoped rewrite in this file.
    */
  private def withDynamicPartitionOverwrite[T](spark: SparkSession)
                                              (body: => T): T = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Derived-artifact CACHE keyed by input file fingerprints — the
    * generalization of [[refreshRollup]]'s change detection to ANY
    * pipeline stage: `derive(spark, inputs, dstPath)(compute)` returns
    * the parquet at `dstPath`, recomputing it only when some input
    * table's recursive file listing (name:length, metadata-only)
    * changed since the artifact was built. A 100 TB pipeline re-run
    * after a partial upstream refresh then skips every stage whose
    * inputs are untouched — make(1) semantics for DataFrames.
    *
    * Crash safety by idempotence (the [[refreshRollup]] discipline):
    * the fingerprint manifest (`_derive_manifest` beside the artifact)
    * writes LAST, so a crash mid-compute leaves a stale manifest and
    * the next call recomputes. `compute` must be DETERMINISTIC in its
    * inputs — that is what makes the cached artifact equivalent to a
    * fresh run (the same contract an incremental build system's rule
    * carries). Returns (artifact, recomputed?).
    */
  def derive(spark: SparkSession, inputs: Seq[String], dstPath: String)
            (compute: => DataFrame): (DataFrame, Boolean) = {
    require(inputs.nonEmpty, "derive: name at least one input path")
    val conf = spark.sparkContext.hadoopConfiguration
    def fingerprint(root: String): String = {
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(conf)
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).sortBy(_.getPath.getName).foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else parts += st.getPath.toUri.getPath + ":" + st.getLen
        }
      if (fs.exists(p)) walk(p) else parts += "<absent>"
      java.security.MessageDigest.getInstance("MD5")
        .digest(parts.mkString("\n").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    val now: Seq[(String, String)] =
      inputs.sorted.map(i => i -> fingerprint(i))
    val manifestPath = s"$dstPath/_derive_manifest"
    val dst = new org.apache.hadoop.fs.Path(dstPath)
    val fs = dst.getFileSystem(conf)
    val cached =
      fs.exists(new org.apache.hadoop.fs.Path(manifestPath)) && {
        val prev = spark.read.parquet(manifestPath)
          .collect().map(r => (r.getString(0), r.getString(1))).toSeq
        prev.sorted == now
      }
    if (cached) (spark.read.parquet(dstPath), false)
    else {
      compute.write.mode("overwrite").parquet(dstPath)
      import spark.implicits._
      now.toDF("input", "fp").coalesce(1)
        .write.mode("overwrite").parquet(manifestPath)
      (spark.read.parquet(dstPath), true)
    }
  }

  /** Read a table whose files span SCHEMA GENERATIONS (additive column
    * evolution): `mergeSchema` unions the per-file schemas, and
    * `defaults` fills the null holes older-generation files leave —
    * merge-on-read for COLUMNS, the way the tombstone sidecar is
    * merge-on-read for deletes. Adding a column to a 100 TB table costs
    * NOTHING at write time (new files simply carry it); every reader
    * pays one `coalesce` per evolved column until [[backfillColumn]]
    * materializes it. A default may be any Column over the row's other
    * columns (a DERIVED backfill, e.g. `length(col("text"))`), not just
    * a literal. Columns in `defaults` that no file carries yet are
    * created outright, so the read schema is stable across the whole
    * evolution window.
    */
  def readEvolved(spark: SparkSession, path: String,
                  defaults: Map[String, Column]): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    defaults.toSeq.sortBy(_._1).foldLeft(df) { case (d, (name, default)) =>
      if (d.columns.contains(name))
        d.withColumn(name, coalesce(col(name), default))
      else d.withColumn(name, default)
    }
  }

  /** Materialize an evolved column PHYSICALLY, touching only the
    * partitions whose files still lack it: the decision reads parquet
    * FOOTERS per partition directory (no data), lagging partitions are
    * rewritten with `value` computed from their existing columns, and
    * every already-evolved partition stays byte-identical on disk
    * (dynamic partition overwrite names only the lagging ones — the
    * [[vacuumTombstones]] scope discipline). Idempotent: a second run
    * finds no lagging partition and rewrites nothing. Returns the
    * number of partitions rewritten.
    *
    * `value` must replay the [[readEvolved]] default exactly if readers
    * are live during the backfill — merge-on-read and post-backfill
    * answers then agree bit-for-bit (q_schema_evolve hash-checks
    * exactly that equivalence).
    *
    * Detection is per DIRECTORY: a directory where some file already
    * carries the column counts as evolved (its older files' null holes
    * remain [[readEvolved]]'s to fill). Partition-aligned writes
    * (`partitionBy`, the maintained ingest) never produce that mixed
    * shape.
    */
  def backfillColumn(spark: SparkSession, path: String, partCol: String,
                     colName: String, value: Column): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // file-less dirs cannot lag (nothing to read or rewrite) and would
    // crash schema inference — skip them
    val dirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith(s"$partCol="))
      .filterNot(fingerprintIsEmptySource(fs, _)).toSeq
    val lagging0 = dirs.filter { d =>
      !spark.read.option("mergeSchema", "true").parquet(d.toString)
        .schema.fieldNames.contains(colName)
    }
    // a lagging dir whose files hold ZERO rows can never be rewritten
    // (dynamic overwrite writes no empty partition) and would make
    // every later run re-count it — drop the empty dir instead (the
    // dir-exists-iff-data discipline)
    val (laggingEmpty, lagging) = lagging0.partition(d =>
      spark.read.parquet(d.toString).isEmpty)
    laggingEmpty.foreach(d => fs.delete(d, true): Unit)
    if (lagging.isEmpty) return laggingEmpty.length
    // a lagging dir carries the column in NO file (merged-schema check
    // above), so the backfill is a plain projection over its rows
    val evolved = spark.read.option("basePath", path)
      .option("mergeSchema", "true")
      .parquet(lagging.map(_.toString): _*)
      .withColumn(colName, value)
      .localCheckpoint(true) // the read must finish before the overwrite
    withDynamicPartitionOverwrite(spark) {
      evolved
        .select(evolved.columns.filter(_ != partCol).map(col) :+ col(partCol): _*)
        .write.mode("overwrite").partitionBy(partCol).parquet(path)
    }
    laggingEmpty.length + lagging.length
  }

  /** CDC merge — [[mergeUpsert]] plus DELETES (the full
    * change-data-capture apply a lakehouse MERGE statement performs):
    * `deletes` is a (keyCol, partCol) frame of tombstones; a deleted
    * key's row disappears from its partition in the same per-partition
    * rewrite that applies the upserts. Same stable-partitioning
    * precondition (partCol is a pure function of keyCol — which is
    * exactly why the CDC feed can always supply the tombstone's
    * partition), same dynamic-partition-overwrite scope: only
    * partitions named by the batch are read or rewritten.
    *
    * Contract: a key must not appear in both `updates` and `deletes`
    * (a CDC batch with update-then-delete collapses upstream to just
    * the delete, delete-then-insert to just the insert) — enforced
    * with one batch-sized join, refused loudly otherwise.
    */
  def mergeCdc(spark: SparkSession, tableDir: String, updates: DataFrame,
               deletes: DataFrame, keyCol: String, partCol: String): Int = {
    val both = updates.select(col(keyCol))
      .join(deletes.select(col(keyCol)), Seq(keyCol), "left_semi")
      .limit(1).count()
    require(both == 0L,
      s"mergeCdc: a '$keyCol' appears in both updates and deletes — " +
        "collapse the CDC batch to one terminal action per key first")
    // one key per batch row, enforced: two rows for one key (a CDC batch
    // with two successive changes) would BOTH survive the union and
    // silently break the key-uniqueness invariant an upsert exists to
    // maintain — collapse upstream (last-writer-wins on a version
    // column) before calling. The check is one aggregate over the
    // (batch-sized) updates frame.
    val dupKeys = updates.groupBy(col(keyCol)).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"mergeUpsert: updates batch has duplicate '$keyCol' values — " +
        "collapse to one row per key (e.g. last-writer-wins) first")
    // touched partition VALUES: bounded by the batch's spread (a daily
    // ingest touches a handful) — a driver-side list by design
    val parts = updates.select(col(partCol))
      .unionByName(deletes.select(col(partCol)))
      .distinct().collect().map(_.get(0))
    // first-ever batch: no table yet → the merge degenerates to a plain
    // partitioned write of the updates (an empty-dir read would throw)
    val path = new org.apache.hadoop.fs.Path(tableDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tableExists = fs.exists(path) && fs.listStatus(path).exists { st =>
      val n = st.getPath.getName
      st.isDirectory || n.endsWith(".parquet")
    }
    if (!tableExists) {
      updates.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
      return parts.length
    }
    // explicit schema = the updates', positioned like the on-disk table
    // (data columns then the partition column): directory-name inference
    // could otherwise type partCol differently from the updates frame
    // (e.g. date-like strings → DATE), breaking the isin pruning filter
    // and the unionByName
    val tableSchema = org.apache.spark.sql.types.StructType(
      updates.schema.filter(_.name != partCol) ++
        updates.schema.filter(_.name == partCol))
    val existing = spark.read.schema(tableSchema).parquet(tableDir)
      .filter(col(partCol).isin(parts: _*)) // partition-pruned scan
    // one anti-join retires BOTH upserted keys' old rows and tombstoned
    // keys' rows; only the upserts come back
    val gone = updates.select(col(keyCol))
      .unionByName(deletes.select(col(keyCol)))
    val merged = existing
      .join(gone, Seq(keyCol), "left_anti")
      .unionByName(updates.select(existing.columns.map(col): _*))
    // materialize BEFORE the overwrite: the merged frame reads the same
    // files the write replaces (Spark rejects read-from-overwrite-target
    // lineage, and correctness demands the read complete first anyway).
    // localCheckpoint = the single-node stand-in for the cluster-storage
    // checkpoint a production run would use (same convention as the
    // dedup pipelines).
    val snap = merged.localCheckpoint(true)
    withDynamicPartitionOverwrite(spark) {
      snap.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
    }
    parts.length
  }

  /** Order-independent per-group content digest: row count, XOR of the
    * rows' 60-bit content hashes, and their sum mod 2^60 (accumulated as
    * DECIMAL(38,0) — overflow-free to ~10^19 rows — then folded back to
    * BIGINT). Both reductions are commutative — the digest is identical
    * under any partitioning/ordering, so two 100 TB table snapshots (or
    * a table and its replica on another cluster) compare by shipping one
    * tiny digest row per group instead of the data. XOR and SUM together
    * catch what either alone misses: XOR is blind to even-multiplicity
    * changes (a row duplicated twice cancels), SUM is blind to
    * compensating pairs; count pins cardinality. Map-side combined,
    * shuffle = one digest row per (partition, group).
    */
  def contentDigest(df: DataFrame, group: Column, value: Column): DataFrame =
    df.select(group.as("grp"),
        graft.operators.Dedup.hash60(value).as("__h"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("digest_xor"),
        pmod(sum(col("__h").cast("decimal(38,0)")),
          lit(1152921504606846976L)).cast("long").as("digest_sum"))

  /** Merge two digest tables (snapshot ⊎ delta): every component is
    * commutative-monoidal — counts add, XORs xor, sums add mod 2^60 —
    * so `merge(digest(A), digest(B)) == digest(A ⊎ B)` exactly, and an
    * incremental pipeline maintains its table digest from APPEND BATCH
    * DIGESTS ALONE: the 100 TB snapshot is never rescanned (the digest
    * twin of `Dedup.incrementalDedup`'s fingerprint-snapshot
    * discipline). Groups present in only one input pass through.
    */
  def mergeDigests(a: DataFrame, b: DataFrame): DataFrame = {
    val fold = lit(1152921504606846976L)
    a.select(col("grp"), col("n_rows").as("__na"),
        col("digest_xor").as("__xa"), col("digest_sum").as("__sa"))
      .join(b.select(col("grp"), col("n_rows").as("__nb"),
        col("digest_xor").as("__xb"), col("digest_sum").as("__sb")),
        Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L)))
          .as("n_rows"),
        expr("coalesce(__xa, 0L) ^ coalesce(__xb, 0L)").as("digest_xor"),
        pmod(coalesce(col("__sa"), lit(0L)) + coalesce(col("__sb"), lit(0L)),
          fold).as("digest_sum"))
  }

  /** Deterministic range-shard assignment for a globally range-sorted
    * layout (the terasort/ORDER-BY-export shape): shard i holds values in
    * (b_{i-1}, b_i], with boundaries the exact i/n quantiles from the
    * mergeable KLL sketch (exact below capacity) — NOT Spark's
    * `repartitionByRange`, whose reservoir sampling makes boundaries (and
    * thus file contents) run-dependent; a re-run of a deterministic
    * pipeline must re-produce byte-identical shards.
    *
    * Returns (df + shard column, boundaries). Boundaries are a bounded
    * driver literal (nShards−1 longs); assignment is a scan-speed map.
    * Write with `partitionBy("shard")` + `sortWithinPartitions` for the
    * on-disk sorted layout; `rangeManifest` certifies it.
    */
  def rangeShards(df: DataFrame, valueCol: String, nShards: Int,
                  sketchCap: Int = 262144): (DataFrame, Seq[Long]) = {
    require(nShards >= 2, s"nShards must be >= 2, got $nShards")
    import graft.operators.QuantileSketch
    // below sketchCap rows the boundaries are EXACT order statistics
    // (quantile_disc); above, KLL-approximate — shard sizes blur but the
    // layout stays valid (ranges disjoint by construction either way)
    val qs = (1 until nShards).map(i => BigDecimal(i) / nShards)
    val bounds = QuantileSketch.quantiles(df, valueCol, qs, sketchCap)
      .collect().map(_.getLong(1)).toSeq
    val v = col(valueCol).cast("long")
    val shard = bounds.zipWithIndex.foldRight(lit(nShards - 1)) {
      case ((b, i), acc) => when(v <= b, lit(i)).otherwise(acc)
    }
    (df.withColumn("shard", shard.cast("long")), bounds)
  }

  /** Per-shard certificate for a range-sharded layout: row count,
    * min/max value — non-overlap is checkable by eye (and asserted in
    * LayoutSpec): shard i's max ≤ shard i+1's min. One map-side-combined
    * aggregate. */
  def rangeManifest(sharded: DataFrame, valueCol: String): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol).cast("long")).as("min_v"),
        max(col(valueCol).cast("long")).as("max_v"))
      .orderBy(col("shard"))

  // ------------------------------------------------ versioned snapshots

  private def versionDirs(spark: SparkSession, tableDir: String): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) =>
        n.drop(1).toInt }
      .sorted.toSeq
  }

  /** All committed versions of a versioned table, ascending. */
  def versions(spark: SparkSession, tableDir: String): Seq[Int] =
    versionDirs(spark, tableDir)

  /** Commit `df` as the table's next immutable snapshot version and
    * return its number. Prior versions are never touched — time-travel
    * reads stay byte-identical (LayoutSpec asserts file-level isolation).
    *
    * This is SNAPSHOT-granularity copy-on-write: every commit writes the
    * full frame, which is the right trade for dimension/config/manifest
    * tables (the audit axis matters, the data is small). For a 100 TB
    * fact table, version at PARTITION granularity instead — compose
    * `mergeUpsert` (which already rewrites only touched partitions) with
    * a version directory per commit holding just the rewritten
    * partitions plus a manifest referencing inherited ones.
    */
  def writeVersion(spark: SparkSession, tableDir: String,
                   df: DataFrame): Int = {
    val next = versionDirs(spark, tableDir).lastOption.getOrElse(-1) + 1
    df.write.mode("errorifexists").parquet(s"$tableDir/v$next")
    next
  }

  /** Read a specific snapshot version (default: latest). */
  def readVersion(spark: SparkSession, tableDir: String,
                  version: Option[Int] = None): DataFrame = {
    val vs = versionDirs(spark, tableDir)
    require(vs.nonEmpty, s"no versions at $tableDir")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs")
    spark.read.parquet(s"$tableDir/v$v")
  }

  /** RETENTION GC for a versioned table ("vacuum"): delete snapshot
    * directories older than the newest `keepVersions`, returning the
    * versions removed. The latest version is never deletable
    * (`keepVersions >= 1` enforced), deletion runs OLDEST-FIRST so a
    * crash mid-vacuum leaves a contiguous retained suffix (readers of
    * surviving versions are untouched — snapshots are immutable
    * directories, so there is no tombstone/manifest rewrite to corrupt),
    * and re-running after a crash is idempotent. The lakehouse
    * maintenance counterpart of `compact`: time travel is only free
    * until storage bills for every version forever.
    */
  def vacuumVersions(spark: SparkSession, tableDir: String,
                     keepVersions: Int): Seq[Int] = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val vs = versionDirs(spark, tableDir)
    val drop = vs.dropRight(keepVersions)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/v$v"), true)
    }
    drop
  }

  /** Key-level upsert as a NEW version: latest snapshot merged with
    * `updates` (updates win on key), committed immutably; returns the
    * new version number. Time travel to any prior version is unaffected.
    */
  def upsertVersion(spark: SparkSession, tableDir: String,
                    updates: DataFrame, keyCol: String): Int = {
    val merged =
      if (versionDirs(spark, tableDir).isEmpty) updates
      else {
        val cur = readVersion(spark, tableDir)
        cur.join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
          .unionByName(updates)
      }
    // materialize BEFORE writing: the merged plan reads the latest
    // version directory, and writing a new sibling dir while the scan
    // is lazy would be fragile under retries
    writeVersion(spark, tableDir, merged.localCheckpoint(false))
  }

  // ---------------------------------------------------------------------
  // merge-on-read deletes: tombstone sidecar + threshold-gated vacuum
  //
  // `mergeCdc` applies deletes copy-on-write — every delete batch
  // rewrites its partitions. At 100 TB with trickle deletes (GDPR keys,
  // retention sweeps) that rewrites the same hot partitions daily for a
  // handful of dead rows each. The merge-on-read discipline (Delta/
  // Iceberg deletion vectors, Hudi MOR) decouples the two costs:
  // deleting APPENDS a tombstone (O(batch)); readers anti-join the
  // sidecar (bounded, broadcast); and `vacuumTombstones` pays the
  // rewrite ONLY where tombstones have accumulated past a threshold —
  // the physical delete is amortized, never per-batch.
  //
  // The sidecar lives at `<tableDir>/_tombstones`; underscore-prefixed
  // paths are invisible to Spark's file listing, so plain
  // `spark.read.parquet(tableDir)` still sees the raw table and ONLY
  // [[readLogical]] applies deletes. Same preconditions as `mergeCdc`:
  // keys unique table-wide, partCol a pure function of keyCol (which is
  // why every tombstone can carry its partition).
  // ---------------------------------------------------------------------

  private def tombstonePath(tableDir: String) = s"$tableDir/_tombstones"

  /** Record deletes as tombstones — an APPEND of (keyCol, partCol) rows
    * to the sidecar; no table file is touched. Duplicate tombstones for
    * a key are harmless (anti-join semantics) and collapse at vacuum.
    */
  def appendTombstones(spark: SparkSession, tableDir: String,
                       deletes: DataFrame, keyCol: String,
                       partCol: String): Unit =
    deletes.select(col(keyCol), col(partCol))
      .write.mode("append").parquet(tombstonePath(tableDir))

  private def tombstones(spark: SparkSession, tableDir: String,
                         keyCol: String, partCol: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(tombstonePath(tableDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(tombstonePath(tableDir))
    else spark.read.parquet(tableDir).select(col(keyCol), col(partCol)).limit(0)
  }

  /** The logical table: raw files minus tombstoned keys. The sidecar is
    * bounded (vacuum keeps it trimmed), so the anti-join broadcasts it —
    * a reader pays one in-memory hash probe per row, never a shuffle.
    */
  def readLogical(spark: SparkSession, tableDir: String, keyCol: String,
                  partCol: String): DataFrame =
    spark.read.parquet(tableDir).join(
      broadcast(tombstones(spark, tableDir, keyCol, partCol)
        .select(col(keyCol)).distinct()),
      Seq(keyCol), "left_anti")

  /** Physically purge tombstoned rows from every partition whose dead
    * fraction (tombstones / physical rows) has reached `minDeadFraction`
    * — the amortization gate: cold partitions with a stray tombstone
    * stay merge-on-read, hot ones pay one rewrite and shed their
    * sidecar entries. Partitions that end up FULLY dead have their
    * directories removed (dynamic partition overwrite cannot write an
    * empty partition). The sidecar is rewritten to exactly the surviving
    * tombstones, de-duplicated. Re-running is a no-op (vacuumed
    * partitions have no tombstones left).
    *
    * Scale shape: only partitions NAMED BY TOMBSTONES are ever read
    * (isin pruning), and of those only the ones past the gate are
    * rewritten; dead/live counts are two map-side-combined aggregates
    * over the pruned scan. Driver state: one (partition, counts) row per
    * tombstoned partition.
    *
    * Returns (partitions rewritten or removed, tombstones purged).
    */
  def vacuumTombstones(spark: SparkSession, tableDir: String,
                       keyCol: String, partCol: String,
                       minDeadFraction: Double): (Int, Long) = {
    require(minDeadFraction > 0.0 && minDeadFraction <= 1.0,
      s"minDeadFraction must be in (0, 1], got $minDeadFraction")
    val ts = tombstones(spark, tableDir, keyCol, partCol)
      .select(col(keyCol), col(partCol)).distinct()
      .localCheckpoint(true) // the sidecar dir itself gets rewritten below
    val deadPerPart = ts.groupBy(col(partCol)).agg(count(lit(1)).as("__dead"))
    val parts = deadPerPart.select(col(partCol)).collect().map(_.get(0))
    if (parts.isEmpty) return (0, 0L)

    val tableSchema = org.apache.spark.sql.types.StructType(
      spark.read.parquet(tableDir).schema.fields.toSeq
        .sortBy(f => if (f.name == partCol) 1 else 0))
    val touched = spark.read.schema(tableSchema).parquet(tableDir)
      .filter(col(partCol).isin(parts: _*)) // partition-pruned scan
    val livePerPart = touched.groupBy(col(partCol)).agg(count(lit(1)).as("__rows"))
    // LEFT join: a tombstoned partition with ZERO physical rows (its dir
    // was fully vacuumed earlier, then an at-least-once delete retried)
    // must still reach the gate — an inner join would orphan its
    // tombstones in the sidecar forever
    val gate = deadPerPart.join(livePerPart, Seq(partCol), "left")
      .select(col(partCol), col("__dead"),
        coalesce(col("__rows"), lit(0L)).as("__rows"))
      .collect()
      .map(r => (r.get(0), r.getLong(1), r.getLong(2)))
    val chosen = gate.filter { case (_, d, n) =>
      n == 0 || d.toDouble / n >= minDeadFraction
    }
    if (chosen.isEmpty) return (0, 0L)
    val chosenVals = chosen.map(_._1)
    val fullyDead = chosen.filter { case (_, d, n) => n > 0 && d == n }.map(_._1)
    val partial = chosen.filter { case (_, d, n) => n > 0 && d < n }.map(_._1)

    // rewrite the partially-dead partitions without their tombstoned keys
    if (partial.nonEmpty) {
      val doomedKeys = ts.filter(col(partCol).isin(partial: _*)).select(col(keyCol))
      val kept = touched.filter(col(partCol).isin(partial: _*))
        .join(doomedKeys, Seq(keyCol), "left_anti")
        .select(tableSchema.fieldNames.map(col): _*)
        .localCheckpoint(true) // read completes before the overwrite
      withDynamicPartitionOverwrite(spark) {
        kept.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
      }
    }
    // fully-dead partitions: no surviving row to carry the overwrite —
    // remove the directory itself
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fullyDead.foreach { v =>
      // Spark escapes special characters in partition directory names
      // (':', '=', '%', …) — the delete must target the ESCAPED path or
      // it silently no-ops while the tombstones below ARE purged,
      // resurrecting the "deleted" rows
      // NULL passes through as null → __HIVE_DEFAULT_PARTITION__ escape
      val dir = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partCol,
          if (v == null) null else String.valueOf(v))
      fs.delete(new org.apache.hadoop.fs.Path(s"$tableDir/$dir"), true): Unit
    }
    // sidecar compaction: only non-vacuumed partitions keep tombstones
    val purged = ts.filter(col(partCol).isin(chosenVals: _*)).count()
    val survive = ts.filter(!col(partCol).isin(chosenVals: _*))
      .localCheckpoint(true)
    survive.write.mode("overwrite").parquet(tombstonePath(tableDir))
    (chosen.count(_._3 > 0), purged)
  }
}
