package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ann
import graft.streaming.HnswIndex

/** The durable on-disk HNSW index: build → ingest → purge as fenced
  * intent→append→commit transactions, serve-from-refreshed ≡
  * serve-from-merged under injected crashes at both windows, sidecar
  * kept exactly fresh, appended files immutable, streaming ingest
  * exactly-once under checkpoint replay.
  */
class HnswIndexSpec extends SparkSpec {

  private def freshDir(tag: String): String =
    Files.createTempDirectory(tag).toString + "/idx"

  // the q_hnsw_insert fixture: embeddings split 90/10, centroids from
  // the existing side — multi-level, multi-cell, deterministic
  private lazy val e = spark.read
    .parquet(s"$sf0001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private lazy val existing = e.filter(pmod(col("vec_id"), lit(10)) =!= 7)
  private lazy val batch = e.filter(pmod(col("vec_id"), lit(10)) === 7)
  private lazy val cents = existing.filter(col("vec_id") < 18)
    .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))

  private def buildAt(path: String): Unit =
    HnswIndex.build(spark, path, existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)

  private def edgeSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("src").cast("long"), col("dst").cast("long"),
        col("score").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  private def layersOf(path: String): Seq[Set[(Long, Long, Double)]] =
    HnswIndex.readLayers(spark, path).map(edgeSet)

  private def allFiles(path: String): Map[String, (Long, Long)] = {
    val base = new java.io.File(path)
    def walk(f: java.io.File): Seq[java.io.File] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(walk)
    }
    walk(base).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(base.getAbsolutePath) ->
        (f.length(), f.lastModified()))
      .toMap
  }

  test("build + readLayers/readVectors round-trips the hnswBuild hierarchy exactly") {
    val path = freshDir("graft_hidx_build_")
    buildAt(path)
    val built = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(built.map(edgeSet)).zipWithIndex.foreach {
      case ((got, want), l) =>
        assert(got == want, s"layer $l differs from hnswBuild")
    }
    val ids = HnswIndex.readVectors(spark, path)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val want = existing.select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == want, "readVectors must hold exactly the built corpus")
    // self-describing: meta round-trips
    val m = HnswIndex.readMeta(spark, path)
    assert(m.idCol == "vec_id" && m.k == 4 && m.fanout == 4 &&
      m.maxLevel == 1)
    // a second build into the same dir refuses
    val dup = intercept[IllegalArgumentException](buildAt(path))
    assert(dup.getMessage.contains("already holds"), dup.getMessage)
  }

  test("ingest: serve-from-refreshed ≡ serve-from-merged; sidecar exactly fresh; appended files immutable; superseded leaves GC'd") {
    // this test pins the GC mechanics themselves — run at retain 1 so
    // one refresh already retires the superseded generation (the
    // serving default keeps one grace generation)
    spark.conf.set("graft.hnsw.gcRetain", "1")
    try {
    val path = freshDir("graft_hidx_ing_")
    buildAt(path)
    val before = allFiles(path)
    val layers = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val merged = Ann.hnswInsert(layers, existing, batch, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    val epoch = HnswIndex.ingest(spark, path, batch,
      txn = Some(("wA", 0L)))
    assert(epoch == 1L)
    layersOf(path).zip(merged.map(edgeSet)).zipWithIndex.foreach {
      case ((got, want), l) =>
        assert(got == want, s"layer $l: refreshed index != hnswInsert merge")
    }
    // sidecar freshness: level-0 covers existing ∪ batch with the same
    // assignment hnswAssignLevels computes on the full corpus
    val all = existing.unionByName(batch)
    val wantSide = Ann.hnswAssignLevels(all, cents, "vec_id", "embedding",
        "cent_id", "cvec", fanout = 4, maxLevel = 1)
      .map(_.select(col("cell_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    HnswIndex.readSidecar(spark, path)
      .map(_.select(col("cell_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .zip(wantSide).zipWithIndex.foreach { case ((got, want), l) =>
        assert(got == want, s"level $l sidecar not exactly fresh")
      }
    // immutability: every surviving pre-ingest file is byte-identical
    // (same length, same mtime) — the refresh APPENDED new leaves and
    // GC'd superseded ones, it never rewrote a file in place
    val after = allFiles(path)
    val survived = before.keySet.intersect(after.keySet)
    survived.foreach { f =>
      assert(before(f) == after(f), s"pre-existing file rewritten: $f")
    }
    assert(before.keySet.diff(after.keySet).nonEmpty,
      "GC must have removed at least one superseded leaf file")
    assert(after.keySet.diff(before.keySet).nonEmpty,
      "the refresh must have appended new leaf files")
    // cell LOCALITY — the load-bearing layout property: a one-vector
    // ingest rewrites EXACTLY its own cell's leaf per level; every
    // other cell's leaf files survive byte-identical. (An id-range
    // bucketing would fail this: the touched cell's members scatter
    // across the id space, intersecting every range bucket.)
    val path1 = freshDir("graft_hidx_loc_")
    buildAt(path1)
    val before1 = allFiles(path1)
    HnswIndex.ingest(spark, path1, batch.orderBy(col("vec_id")).limit(1))
    val after1 = allFiles(path1)
    val survived1 = before1.keySet.intersect(after1.keySet)
      .filter(f => before1(f) == after1(f))
    def cellsOf(files: Set[String], layer: String): Set[String] =
      files.filter(_.contains(layer)).flatMap(
        _.split("/").find(_.startsWith("__c=")))
    val l0CellsBefore = cellsOf(before1.keySet, "layer_0")
    val l0CellsSurvived = cellsOf(survived1, "layer_0")
    assert(l0CellsBefore.diff(l0CellsSurvived).size <= 1,
      s"one-vector ingest must rewrite at most its ONE layer-0 cell; " +
        s"rewritten: ${l0CellsBefore.diff(l0CellsSurvived)}")
    assert(l0CellsSurvived.size >= l0CellsBefore.size - 1 &&
      l0CellsBefore.size >= 10,
      s"expected a multi-cell fixture with all but one cell untouched: " +
        s"${l0CellsSurvived.size} of ${l0CellsBefore.size}")
    // serve: a search over the refreshed index finds a batch vector
    val q = batch.orderBy(col("vec_id")).select(col("embedding"))
      .head.getSeq[Float](0)
    val hits = HnswIndex.search(spark, path, q, beam = 8, hops = 3)
      .collect().map(_.getLong(1)).toSet
    assert(hits.nonEmpty)
    // a replayed txn is skipped whole: same (writer, batch) → same state
    val snap = allFiles(path)
    assert(HnswIndex.ingest(spark, path, batch,
      txn = Some(("wA", 0L))) == 1L)
    assert(allFiles(path) == snap, "replay of a committed txn must no-op")
    } finally spark.conf.unset("graft.hnsw.gcRetain")
  }

  test("purge ≡ hnswCompact ≡ build-on-survivors; ingest-then-purge proves the sidecar stays usable across ops") {
    val path = freshDir("graft_hidx_prg_")
    buildAt(path)
    val tomb = existing.filter(pmod(col("vec_id"), lit(17)) === 3)
      .select(col("vec_id").as("id"))
    HnswIndex.purge(spark, path, tomb, "id")
    val survivors = existing.join(tomb,
      existing("vec_id") === tomb("id"), "left_anti")
    val want = Ann.hnswBuild(survivors, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(want.map(edgeSet)).zipWithIndex.foreach {
      case ((got, w), l) =>
        assert(got == w, s"layer $l: purged index != build on survivors")
    }
    val ids = HnswIndex.readVectors(spark, path)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val wantIds = survivors.select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == wantIds, "purge must drop tombstones from the sidecar")

    // the LIFECYCLE the raw operators cannot do safely by hand
    // (ADVICE: a stale sidecar after insert breaks compact): ingest a
    // batch, then purge — the transactional sidecar refresh makes the
    // compact exact, so the result equals a fresh build on the final
    // survivor set
    val path2 = freshDir("graft_hidx_life_")
    buildAt(path2)
    HnswIndex.ingest(spark, path2, batch)
    val tomb2 = e.filter(pmod(col("vec_id"), lit(17)) === 3)
      .select(col("vec_id").as("id"))
    HnswIndex.purge(spark, path2, tomb2, "id")
    val fin = e.join(tomb2, e("vec_id") === tomb2("id"), "left_anti")
    val want2 = Ann.hnswBuild(fin, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path2).zip(want2.map(edgeSet)).zipWithIndex.foreach {
      case ((got, w), l) =>
        assert(got == w,
          s"layer $l: ingest→purge != build on final survivors")
    }
  }

  test("crash windows: pre-commit rolls back to the old state, post-commit is already visible; recovery converges both") {
    // retain 1: the recovery-finishes-GC assertion below needs the
    // superseded generation actually retired
    spark.conf.set("graft.hnsw.gcRetain", "1")
    try {
    val path = freshDir("graft_hidx_crash_")
    buildAt(path)
    val pre = layersOf(path)
    val layers = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val merged = Ann.hnswInsert(layers, existing, batch, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4).map(edgeSet)

    // window 1: crash AFTER the appends, BEFORE the commit rename —
    // the new leaves are invisible (uncommitted), serving is unchanged
    class Boom extends RuntimeException("injected crash")
    intercept[Boom] {
      HnswIndex.ingest(spark, path, batch,
        hook = s => if (s == "appended") throw new Boom)
    }
    assert(layersOf(path) == pre,
      "uncommitted appends must stay invisible to readers")
    // the intent is still on disk; re-running the op recovers (rolls
    // the debris back) and applies cleanly
    val e1 = HnswIndex.ingest(spark, path, batch)
    assert(e1 == 1L)
    assert(layersOf(path) == merged, "post-recovery refresh != merged")

    // window 2: crash AFTER the commit rename, BEFORE GC — the refresh
    // is already fully visible; a replay skips whole and recovery
    // finishes the GC
    val path2 = freshDir("graft_hidx_crash2_")
    buildAt(path2)
    intercept[Boom] {
      HnswIndex.ingest(spark, path2, batch, txn = Some(("wB", 0L)),
        hook = s => if (s == "committed") throw new Boom)
    }
    assert(layersOf(path2) == merged,
      "a committed refresh must be visible even before GC")
    val filesPreGc = allFiles(path2)
    assert(HnswIndex.ingest(spark, path2, batch,
      txn = Some(("wB", 0L))) == 1L)
    assert(layersOf(path2) == merged)
    assert(allFiles(path2).size < filesPreGc.size,
      "recovery must finish the interrupted GC")
    // no intent debris left behind on either index
    Seq(path, path2).foreach { p =>
      val left = Option(new java.io.File(p + "/_refresh").listFiles())
        .map(_.toSeq).getOrElse(Seq.empty)
        .filter(_.getName.endsWith(".intent"))
      assert(left.isEmpty, s"intent debris at $p: $left")
    }
    } finally spark.conf.unset("graft.hnsw.gcRetain")
  }

  test("ingest guards: colliding id refuses loudly; empty batch is a no-op") {
    val path = freshDir("graft_hidx_grd_")
    buildAt(path)
    val snap = allFiles(path)
    val dup = existing.limit(1)
    val clash = intercept[IllegalArgumentException] {
      HnswIndex.ingest(spark, path, dup)
    }
    assert(clash.getMessage.contains("already exists"), clash.getMessage)
    assert(allFiles(path) == snap, "a refused ingest must write nothing")
    assert(HnswIndex.ingest(spark, path, batch.limit(0)) == 0L)
    assert(allFiles(path) == snap, "an empty ingest must write nothing")
  }

  test("streamInsertHnswMaintained: two micro-batches land exactly-once; checkpoint replay adds nothing") {
    val base = Files.createTempDirectory("graft_hidx_str_").toString
    val path = base + "/idx"
    val in = base + "/in"
    val ckpt = base + "/ckpt"
    buildAt(path)
    // split the held-out batch (ids ≡ 7 mod 10) into two micro-batches
    val b1 = batch.filter(pmod(col("vec_id"), lit(20)) === 7)
    val b2 = batch.filter(pmod(col("vec_id"), lit(20)) === 17)
    val schema = batch.schema
    def start() = HnswIndex.streamInsertHnswMaintained(
      spark.readStream.schema(schema).parquet(in), path, ckpt)
    b1.coalesce(1).write.mode("overwrite").parquet(in)
    val q = start()
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable()
    q.stop()
    // the sequential raw-operator contract: insert b1 then b2
    val layers = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val step1 = Ann.hnswInsert(layers, existing, b1, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    val step2 = Ann.hnswInsert(step1, existing.unionByName(b1), b2,
      cents, "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    layersOf(path).zip(step2.map(edgeSet)).zipWithIndex.foreach {
      case ((got, want), l) =>
        assert(got == want, s"layer $l: streamed index != sequential inserts")
    }
    // restart on the same checkpoint with no new input: nothing changes
    val snap = allFiles(path)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(allFiles(path) == snap, "checkpoint replay must be exactly-once")
    // the final index serves every inserted vector's own neighborhood
    val qv = b2.orderBy(col("vec_id")).select(col("embedding"))
      .head.getSeq[Float](0)
    assert(HnswIndex.search(spark, path, qv, beam = 8, hops = 3)
      .count() > 0)
  }

  test("describe + fsck: healthy index reports clean; crash debris, GC debt and hand-damage surface with names") {
    import spark.implicits._
    val path = freshDir("graft_hidx_ops_")
    buildAt(path)
    HnswIndex.ingest(spark, path, batch)
    // healthy: every fsck check zero, describe structure coherent
    val checks = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.values.forall(_ == 0L), s"healthy index not clean: " +
      checks.filter(_._2 != 0L).toSeq.sorted.mkString(", "))
    val desc = HnswIndex.describe(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(desc(("members", 0)) == e.count(),
      "level-0 members must equal the full corpus after ingest")
    assert(desc(("epochs_committed", -1)) == 2L &&
      desc(("max_epoch", -1)) == 1L)
    assert(desc(("epoch_debt", -1)) == 0L &&
      desc(("pending_refresh", -1)) == 0L)
    assert(desc(("edge_rows", 0)) > desc(("edge_rows", 1)),
      "upper layer must be geometrically sparser")

    // crash AFTER commit, BEFORE GC: describe reports epoch debt and a
    // pending intent; recover() folds both back to zero
    class Boom extends RuntimeException("injected")
    val tomb = e.filter(pmod($"vec_id", lit(17)) === 3)
      .select($"vec_id".as("id"))
    intercept[Boom] {
      HnswIndex.purge(spark, path, tomb, "id",
        hook = s => if (s == "committed") throw new Boom)
    }
    val descCrash = HnswIndex.describe(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(descCrash(("epoch_debt", -1)) > 0L &&
      descCrash(("pending_refresh", -1)) == 1L,
      s"post-commit crash must surface as debt + intent: $descCrash")
    HnswIndex.recover(spark, path)
    val descRec = HnswIndex.describe(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(descRec(("epoch_debt", -1)) == 0L &&
      descRec(("pending_refresh", -1)) == 0L)

    // hand-damage the tree: a foreign uncommitted leaf dir (no intent
    // covers it) and a duplicated sidecar row — fsck names both
    val root = new java.io.File(path)
    val cellDir = new java.io.File(root, "layer_0").listFiles()
      .filter(_.getName.startsWith("__c=")).head
    assert(new java.io.File(cellDir, "__e=999").mkdirs())
    // the CURRENT (highest-epoch) leaf — at the default gcRetain a
    // superseded generation may also still be on disk, and a duplicate
    // planted there would be invisible to readers by design
    val sideLeaf = new java.io.File(root, "_sidecar/level_0").listFiles()
      .filter(_.getName.startsWith("__c=")).head.listFiles()
      .filter(_.getName.startsWith("__e="))
      .maxBy(_.getName.stripPrefix("__e=").toLong)
    val dupRow = spark.read.parquet(sideLeaf.getAbsolutePath).limit(1)
    dupRow.write.mode("append").parquet(sideLeaf.getAbsolutePath)
    val damaged = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(damaged("uncommitted_debris") == 1L,
      s"fsck must find the orphan leaf: $damaged")
    assert(damaged("duplicate_ids") == 1L,
      s"fsck must find the duplicated member: $damaged")
  }

  test("zombie fence: a writer that loses its lease mid-refresh aborts before the commit; the heal applies exactly-once") {
    val path = freshDir("graft_hidx_znb_")
    buildAt(path)
    val pre = layersOf(path)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // between the appends and the commit rename a replacement driver
    // takes over (simulated as its higher-epoch lease file appearing —
    // what acquire() writes after staleness)
    val fenced = intercept[RuntimeException] {
      HnswIndex.ingest(spark, path, batch, hook = s =>
        if (s == "appended") {
          val out = fs.create(new org.apache.hadoop.fs.Path(root,
            "_LOCK/e_99__driverZ.lease"), true)
          try out.write("driverZ".getBytes("UTF-8")) finally out.close()
        })
    }
    assert(fenced.getMessage.contains("fenced"), fenced.getMessage)
    // NO TORN COMMIT: the rename never happened — the appended leaves
    // are invisible uncommitted debris, serving still sees the build
    assert(!new java.io.File(s"$path/_refresh/e_1.commit").exists(),
      "fenced writer must not have committed")
    assert(layersOf(path) == pre, "fenced refresh must stay invisible")
    // the usurper died too; sweep its lease and re-run: recovery rolls
    // the debris back and the refresh applies exactly once
    fs.delete(new org.apache.hadoop.fs.Path(root,
      "_LOCK/e_99__driverZ.lease"), false)
    assert(HnswIndex.ingest(spark, path, batch) == 1L)
    val layers = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val merged = Ann.hnswInsert(layers, existing, batch, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    assert(layersOf(path) == merged.map(edgeSet),
      "post-heal refresh must equal the merge exactly once")
  }

  test("writer-scoped replay: manual ingest between stream restarts loses nothing; fresh-checkpoint replay refuses loudly") {
    val base = Files.createTempDirectory("graft_hidx_txn_").toString
    val path = base + "/idx"
    val in = base + "/in"
    val ckpt = base + "/ckpt"
    buildAt(path)
    val b1 = batch.filter(pmod(col("vec_id"), lit(20)) === 7)
    val b2 = batch.filter(pmod(col("vec_id"), lit(20)) === 17)
    // a manual batch with ids disjoint from the whole fixture
    val m = b1.limit(3).withColumn("vec_id", col("vec_id") + lit(9000000L))
    val schema = batch.schema
    def start(ck: String) = HnswIndex.streamInsertHnswMaintained(
      spark.readStream.schema(schema).parquet(in), path, ck)
    b1.coalesce(1).write.mode("overwrite").parquet(in)
    val q1 = start(ckpt)
    q1.processAllAvailable(); q1.stop()
    // the ADVICE scenario: a manual ingest BETWEEN stream restarts —
    // under the old epoch-positional skip the stream's next batch
    // would land on a committed epoch and be silently dropped
    HnswIndex.ingest(spark, path, m)
    b2.coalesce(1).write.mode("append").parquet(in)
    val q2 = start(ckpt)
    q2.processAllAvailable(); q2.stop()
    val layers = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val s1 = Ann.hnswInsert(layers, existing, b1, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    val s2 = Ann.hnswInsert(s1, existing.unionByName(b1), m, cents,
      "vec_id", "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    val s3 = Ann.hnswInsert(s2,
      existing.unionByName(b1).unionByName(m), b2, cents, "vec_id",
      "embedding", "cent_id", "cvec", k = 4, fanout = 4)
    layersOf(path).zip(s3.map(edgeSet)).zipWithIndex.foreach {
      case ((got, want), l) =>
        assert(got == want,
          s"layer $l: stream + interleaved manual != sequential inserts")
    }
    // a restart on a FRESH checkpoint is a NEW writer: its re-delivered
    // batch 0 is new work, and the disjointness guard refuses it loudly
    // instead of silently skipping it as a replay
    val q3 = start(base + "/ckpt_fresh")
    val boom = intercept[Exception] {
      q3.processAllAvailable()
    }
    q3.stop()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(boom).exists(_.contains("already exists")),
      s"fresh-checkpoint replay must hit the disjointness guard: " +
        messages(boom).mkString(" | "))
  }

  test("build is crash-recoverable: a half-built index rolls back via its own intent; no hand deletion") {
    val path = freshDir("graft_hidx_bcr_")
    class Boom extends RuntimeException("injected")
    intercept[Boom] {
      HnswIndex.build(spark, path, existing, cents, "vec_id",
        "embedding", "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        hook = s => if (s == "appended") throw new Boom)
    }
    // debris is on disk (uncommitted), intent pending
    assert(new java.io.File(path, "_refresh/e_0.intent").exists())
    assert(!new java.io.File(path, "_refresh/e_0.commit").exists())
    // a re-build rolls the debris back itself and succeeds
    buildAt(path)
    val built = Ann.hnswBuild(existing, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(built.map(edgeSet)).zipWithIndex.foreach {
      case ((got, want), l) =>
        assert(got == want, s"layer $l differs after crash-recovered build")
    }
    // standalone recover() on a crashed build wipes it back to empty
    val path2 = freshDir("graft_hidx_bcr2_")
    intercept[Boom] {
      HnswIndex.build(spark, path2, existing, cents, "vec_id",
        "embedding", "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        hook = s => if (s == "appended") throw new Boom)
    }
    HnswIndex.recover(spark, path2)
    val left = Option(new java.io.File(path2).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty).map(_.getName)
      .filterNot(n => n == "_LOCK" || n == "_refresh")
    assert(left.isEmpty, s"recover must wipe a crashed build: $left")
  }

  test("gcRetain: a retained superseded generation keeps a concurrent reader's snapshot readable across a refresh") {
    val path = freshDir("graft_hidx_ret_")
    spark.conf.set("graft.hnsw.gcRetain", "2")
    try {
      buildAt(path)
      val before = allFiles(path)
      // a reader resolves its snapshot (epoch 0) ...
      val pinned = HnswIndex.readLayers(spark, path)
      val want = pinned.map(edgeSet)
      // ... a refresh commits concurrently ...
      HnswIndex.ingest(spark, path, batch)
      // ... every pre-refresh file is still on disk (retained), so the
      // already-resolved snapshot still collects, byte-identical
      val after = allFiles(path)
      assert(before.keySet.subsetOf(after.keySet),
        "gcRetain=2 must keep the superseded generation on disk: " +
          before.keySet.diff(after.keySet).take(3).mkString(", "))
      assert(pinned.map(edgeSet) == want,
        "a pre-refresh snapshot must still serve after the refresh")
      // the window slides: a second refresh retires epoch 0's leaves
      // in the cells it touches
      HnswIndex.purge(spark, path,
        batch.limit(2).select(col("vec_id").as("id")), "id")
      val after2 = allFiles(path)
      assert(before.keySet.diff(after2.keySet).nonEmpty ||
        after2.size < after.size,
        "the retention window must slide, not grow without bound")
    } finally spark.conf.unset("graft.hnsw.gcRetain")
  }

  test("softDelete: tombstones route but never surface; no data file touched; purge retires them; purged ids re-ingest") {
    // retain 1: the retired-sidecar-holds-no-file assertion inspects
    // ALL on-disk generations, not just the current one
    spark.conf.set("graft.hnsw.gcRetain", "1")
    try {
    val path = freshDir("graft_hidx_sd_")
    HnswIndex.build(spark, path, e, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val before = allFiles(path)
    val tomb = e.filter(pmod(col("vec_id"), lit(17)) === 3)
      .select(col("vec_id").as("id"))
    val tombIds = tomb.collect().map(_.getLong(0)).toSet
    HnswIndex.softDelete(spark, path, tomb, "id")
    // delete-cheap-now: NO data file was touched — only the _deletes
    // sidecar (and its commit marker) appeared
    val after = allFiles(path)
    before.keySet.foreach { f =>
      assert(after.get(f).contains(before(f)),
        s"softDelete must not touch data files: $f")
    }
    assert(after.keySet.diff(before.keySet)
      .forall(_.contains("_deletes")),
      "softDelete may only write the tombstone sidecar")
    // tombstoned nodes still ROUTE (edges unchanged) ...
    val layers = Ann.hnswBuild(e, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(layers.map(edgeSet)).foreach { case (got, want) =>
      assert(got == want, "softDelete must leave the hierarchy intact")
    }
    // ... but never SURFACE: both serve faces match the raw operator
    // twins, and no tombstone appears in any page
    val q = e.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val got = HnswIndex.search(spark, path, q, beam = 8, hops = 3, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val want = Ann.hnswSearchDeleted(layers, e, "vec_id", "embedding",
        q, tomb, "id", fanout = 4, beam = 8, hops = 3, k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq,
      "durable tombstone-honoring serve must equal hnswSearchDeleted")
    assert(got.forall { case (_, id, _) => !tombIds.contains(id) })
    val queries = e.filter(col("vec_id").isin(42L, 137L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val gotB = HnswIndex.searchBatch(spark, path, queries, "qid",
      "qvec", beam = 8, hops = 3, k = 5).collect()
    assert(gotB.nonEmpty &&
      gotB.forall(r => !tombIds.contains(r.getLong(2))),
      "batch serve must filter tombstones")
    // describe surfaces the backlog; fsck stays clean (soft-deleted
    // ids are still members — that is the point)
    val desc = HnswIndex.describe(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(desc(("tombstones", -1)) == tombIds.size.toLong)
    val checks = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.values.forall(_ == 0L),
      s"soft-deleted index must fsck clean: ${checks.filter(_._2 != 0L)}")
    // the VACUUM: purgeDeletes re-links physically, retires the
    // sidecar, and the result equals a fresh build on the survivors
    HnswIndex.purgeDeletes(spark, path)
    assert(HnswIndex.readDeletes(spark, path).isEmpty,
      "purgeDeletes must retire the tombstones it makes physical")
    val survivors = e.join(tomb, e("vec_id") === tomb("id"), "left_anti")
    val wantP = Ann.hnswBuild(survivors, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(wantP.map(edgeSet)).zipWithIndex.foreach {
      case ((g, w), l) =>
        assert(g == w, s"layer $l: purgeDeletes != build on survivors")
    }
    // the serve path is back to the plain face (k-trim only): a fully
    // retired sidecar leaves NO parquet file behind, so serving stops
    // paying the tombstone anti-join
    val delLeaves = Option(new java.io.File(path, "_deletes").listFiles())
      .map(_.toSeq).getOrElse(Seq.empty).filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty))
      .filter(_.getName.endsWith(".parquet"))
    assert(delLeaves.isEmpty,
      s"a fully-retired sidecar must hold no data file: $delLeaves")
    val postRows = HnswIndex.search(spark, path, q, beam = 8, hops = 3)
      .collect()
    assert(postRows.nonEmpty)
    // the documented update path: a purged id re-ingests cleanly
    val reborn = e.filter(col("vec_id") === tombIds.head)
      .select(col("vec_id"), col("embedding"))
    HnswIndex.ingest(spark, path, reborn)
    val ids = HnswIndex.readVectors(spark, path)
      .select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    assert(ids.contains(tombIds.head),
      "a purged id must be re-ingestable (purge + ingest = update)")
    // a second purgeDeletes with nothing pending consumes no epoch
    val snap = allFiles(path)
    HnswIndex.purgeDeletes(spark, path)
    assert(allFiles(path) == snap, "empty vacuum must be a no-op")
    } finally spark.conf.unset("graft.hnsw.gcRetain")
  }

  test("streamDeleteHnswMaintained: delete micro-batches land exactly-once and serve around immediately") {
    val base = Files.createTempDirectory("graft_hidx_sds_").toString
    val path = base + "/idx"
    val in = base + "/in"
    val ckpt = base + "/ckpt"
    HnswIndex.build(spark, path, e, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val d1 = e.filter(pmod(col("vec_id"), lit(34)) === 3)
      .select(col("vec_id").as("id"))
    val d2 = e.filter(pmod(col("vec_id"), lit(34)) === 20)
      .select(col("vec_id").as("id"))
    def start() = HnswIndex.streamDeleteHnswMaintained(
      spark.readStream.schema(d1.schema).parquet(in), "id", path, ckpt)
    d1.coalesce(1).write.mode("overwrite").parquet(in)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    d2.coalesce(1).write.mode("append").parquet(in)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val want = d1.unionByName(d2).collect().map(_.getLong(0)).toSet
    assert(HnswIndex.readDeletes(spark, path).collect()
      .map(_.getLong(0)).toSet == want)
    // replay on the same checkpoint adds nothing (no new epoch)
    val snap = allFiles(path)
    val q3 = start(); q3.processAllAvailable(); q3.stop()
    assert(allFiles(path) == snap, "delete replay must be exactly-once")
    // serving filters the streamed tombstones
    val qv = e.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val hits = HnswIndex.search(spark, path, qv, beam = 8, hops = 3)
      .collect().map(_.getLong(1)).toSet
    assert(hits.intersect(want).isEmpty)
    // the ceiling guards the sidecar: a delete pushing past
    // maxTombstones refuses loudly, naming the vacuum
    spark.conf.set("graft.maintained.maxTombstones", "4")
    try {
      val big = e.limit(9).select(col("vec_id").as("id"))
      val boom = intercept[IllegalArgumentException] {
        HnswIndex.softDelete(spark, path, big, "id")
      }
      assert(boom.getMessage.contains("purge"), boom.getMessage)
    } finally spark.conf.unset("graft.maintained.maxTombstones")
  }

  test("membership bitmap: exact group-pruned disjointness probe, folded in the same commit, cleared by purge, legacy-upgradable") {
    val path = freshDir("graft_hidx_mem_")
    buildAt(path)
    def fsckMap() = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def descMap() = HnswIndex.describe(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(descMap()(("membership_groups", -1)) > 0L,
      "build must write the membership bitmap")
    assert(fsckMap()("membership_mismatch") == 0L)
    // exact collision detection through the bitmap probe
    val clash = intercept[IllegalArgumentException] {
      HnswIndex.ingest(spark, path, existing.limit(1))
    }
    assert(clash.getMessage.contains("already exists"), clash.getMessage)
    // the bitmap folds the batch in within the SAME commit — never stale
    HnswIndex.ingest(spark, path, batch)
    assert(fsckMap()("membership_mismatch") == 0L,
      "bitmap must cover existing ∪ batch after the ingest commit")
    val reClash = intercept[IllegalArgumentException] {
      HnswIndex.ingest(spark, path, batch.limit(1))
    }
    assert(reClash.getMessage.contains("already exists"))
    // purge CLEARS bits (deletable, no rebuild): the purged id
    // re-ingests, and the bitmap still matches the sidecar exactly
    val victim = batch.orderBy(col("vec_id")).limit(1)
    HnswIndex.purge(spark, path,
      victim.select(col("vec_id").as("id")), "id")
    assert(fsckMap()("membership_mismatch") == 0L,
      "bitmap must drop purged ids in the purge commit")
    HnswIndex.ingest(spark, path, victim)
    assert(fsckMap()("membership_mismatch") == 0L)
    // LEGACY upgrade: an index without the sidecar (pre-round-12
    // layout) falls back to the full scan — and still catches the
    // collision — then buildMembership turns the probe on
    val path2 = freshDir("graft_hidx_mem2_")
    buildAt(path2)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(): Unit
    }
    rmrf(new java.io.File(path2, "_membership"))
    val metaF = new java.io.File(path2, "_META")
    val stripped = scala.io.Source.fromFile(metaF).getLines()
      .filterNot(_.startsWith("memberShift=")).mkString("", "\n", "\n")
    val w = new java.io.PrintWriter(metaF); w.write(stripped); w.close()
    // drop the local-fs checksum sidecar the hand-edit invalidated
    new java.io.File(path2, "._META.crc").delete(): Unit
    val legacyClash = intercept[IllegalArgumentException] {
      HnswIndex.ingest(spark, path2, existing.limit(1))
    }
    assert(legacyClash.getMessage.contains("already exists"),
      "legacy fallback must still catch collisions")
    val legacyChecks = HnswIndex.fsck(spark, path2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(legacyChecks("membership_mismatch")._1 == 0L &&
      legacyChecks("membership_mismatch")._2.contains("buildMembership"),
      "fsck must name the missing bitmap on a legacy index")
    HnswIndex.buildMembership(spark, path2)
    assert(HnswIndex.readMeta(spark, path2).memberShift >= 0)
    val upChecks = HnswIndex.fsck(spark, path2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(upChecks("membership_mismatch") == 0L,
      "rebuilt bitmap must match the sidecar exactly")
    val upClash = intercept[IllegalArgumentException] {
      HnswIndex.ingest(spark, path2, existing.limit(1))
    }
    assert(upClash.getMessage.contains("already exists"))
    // buildMembership is idempotent
    val snap = allFiles(path2)
    HnswIndex.buildMembership(spark, path2)
    assert(allFiles(path2) == snap, "a second buildMembership must no-op")
  }

  test("asOf pins: post-pin ingest invisible, deletes read current, outside-retention pin fails loudly") {
    val path = freshDir("graft_hidx_pin_")
    val q = e.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    spark.conf.set("graft.hnsw.gcRetain", "3")
    try {
      buildAt(path) // epoch 0
      def serve(asOf: Option[Long]) =
        HnswIndex.search(spark, path, q, beam = 8, hops = 3, k = 5,
          asOf = asOf).collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val pre = serve(None)
      assert(serve(Some(0L)) == pre, "pin at build must equal the build")
      // post-pin ingest is INVISIBLE at the pin, visible current
      HnswIndex.ingest(spark, path, batch) // epoch 1
      assert(serve(Some(0L)) == pre,
        "a post-pin ingest must be invisible at the pin")
      assert(serve(None) != pre || HnswIndex.search(spark, path, q,
        beam = 8, hops = 3).count() > 0)
      // deletes read CURRENT regardless of the pin (the IVF policy):
      // soft-delete the pin's top hit — the pinned serve drops it too
      val top = pre.head._2
      HnswIndex.softDelete(spark, path,
        e.filter(col("vec_id") === top).select(col("vec_id").as("id")),
        "id") // epoch 2
      val pinnedAfterDelete = serve(Some(0L))
      assert(!pinnedAfterDelete.exists(_._2 == top),
        "a pin is a corpus snapshot, not a deletion-law exemption")
      // ... while the CORPUS stays pinned: no post-pin batch id (the
      // mod-10 == 7 slice) may surface, even as the page re-ranks
      assert(pinnedAfterDelete.nonEmpty &&
        pinnedAfterDelete.forall(_._2 % 10 != 7),
        "pinned-after-delete must still serve the pinned corpus only")
      // a non-committed pin refuses
      val bad = intercept[IllegalArgumentException](serve(Some(99L)))
      assert(bad.getMessage.contains("not a committed epoch"))
      // outside the retention window: with gcRetain back at 1 the next
      // refresh GCs the pinned generations of the cells it touches —
      // the pin then fails LOUDLY instead of serving a partial graph
      spark.conf.unset("graft.hnsw.gcRetain")
      HnswIndex.purge(spark, path,
        batch.limit(5).select(col("vec_id").as("id")), "id") // epoch 3
      val gone = intercept[IllegalArgumentException](serve(Some(0L)))
      assert(gone.getMessage.contains("retention window"),
        gone.getMessage)
    } finally spark.conf.unset("graft.hnsw.gcRetain")
  }

  test("filtered serving: pred over passthrough columns, carried through ingest, composed with soft delete; batch ≡ single per qid") {
    val path = freshDir("graft_hidx_flt_")
    val e2 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    val ex2 = e2.filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val b2 = e2.filter(pmod(col("vec_id"), lit(10)) === 7)
    HnswIndex.build(spark, path, ex2, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
      passthrough = Seq("label"))
    assert(HnswIndex.readMeta(spark, path).passthrough.map(_.name) ==
      Seq("label"))
    // the sidecar CARRIES the passthrough column through a refresh
    HnswIndex.ingest(spark, path, b2)
    val side = HnswIndex.readVectors(spark, path)
    assert(side.columns.contains("label"))
    val labelOf = e2.select(col("vec_id").cast("long"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sideLabels = side.select(col("vec_id").cast("long"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sideLabels == labelOf,
      "every member (existing AND ingested) must carry its label")
    // filtered serve ≡ manual beam + filter + re-rank
    val q = e2.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val pred = pmod(col("label"), lit(2)) === 0
    val got = HnswIndex.searchFiltered(spark, path, q, pred, beam = 8,
      hops = 3, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val raw = HnswIndex.search(spark, path, q, beam = 8, hops = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val want = raw.filter { case (id, _) => labelOf(id) % 2 == 0 }
      .sortBy { case (id, sc) => (-sc, id) }.take(5)
      .zipWithIndex.map { case ((id, sc), r) => (r + 1, id, sc) }.toSeq
    assert(got == want, s"filtered serve mismatch: $got vs $want")
    assert(got.nonEmpty && got.forall { case (_, id, _) =>
      labelOf(id) % 2 == 0 })
    // batch face ≡ single face per qid
    val queries = e2.filter(col("vec_id").isin(42L, 137L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val gotB = HnswIndex.searchBatchFiltered(spark, path, queries,
      "qid", "qvec", pred, beam = 8, hops = 3, k = 5)
      .filter(col("qid") === 42L)
      .select(col("rank"), col("vec_id"), col("score")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(gotB == got, "batch filtered face must equal the single face")
    // composes with soft delete: tombstone the filtered top hit
    val top = got.head._2
    HnswIndex.softDelete(spark, path,
      e2.filter(col("vec_id") === top).select(col("vec_id").as("id")),
      "id")
    val afterDel = HnswIndex.searchFiltered(spark, path, q, pred,
      beam = 8, hops = 3, k = 5).collect().map(_.getLong(1)).toSet
    assert(!afterDel.contains(top),
      "filtered serve must honor pending soft deletes")
    // NAMESPACED batch face: each query restricted to its OWN
    // namespace (label), multi-tenant in one pass, deletes honored
    val nsQ = e2.filter(col("vec_id").isin(42L, 137L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qns"))
    val nsRes = HnswIndex.searchBatchNamespaced(spark, path, nsQ,
      "qid", "qvec", "qns", "label", beam = 8, hops = 3, k = 5)
      .collect()
    assert(nsRes.nonEmpty)
    nsRes.foreach { r =>
      assert(labelOf(r.getLong(2)) == labelOf(r.getLong(0)),
        s"qid ${r.getLong(0)} got a foreign-namespace hit ${r.getLong(2)}")
    }
    assert(!nsRes.exists(_.getLong(2) == top),
      "namespaced serve must honor pending soft deletes")
    // a non-passthrough namespace column refuses loudly
    val badNs = intercept[IllegalArgumentException] {
      HnswIndex.searchBatchNamespaced(spark, path, nsQ, "qid", "qvec",
        "qns", "nope", beam = 8, hops = 3, k = 5)
    }
    assert(badNs.getMessage.contains("passthrough"), badNs.getMessage)
  }

  test("advisor + retrain escalation: hot-cell skew is named, one autoMaintain pass heals it exactly-once, deletes fold") {
    import spark.implicits._
    val path = freshDir("graft_hidx_adv_")
    // a 1-D continuum (angle sweep) indexed under CLUMPED centroids:
    // nearly every row files into the last clump cell — the skew the
    // advisor exists to name, and the shape Lloyd provably spreads
    val vs = (0L until 1000L).map { i =>
      (i, Seq(1f, i.toFloat / 1000f, 0f, 0f, 0f, 0f, 0f, 0f))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .localCheckpoint(true)
    val badCents = vs.filter($"vec_id" < 4)
      .select($"vec_id".as("cent_id"), $"embedding".as("cvec"))
    HnswIndex.build(spark, path, vs, badCents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    def adviceMap() = HnswIndex.adviseHnsw(spark, path).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val before = adviceMap()
    assert(before.contains("retrain") && before("retrain") > 4.0,
      s"advisor must name the hot-cell skew: $before")
    // a pending soft-delete backlog folds at the retrain
    val tomb = vs.filter($"vec_id" % 9 === 1).select($"vec_id".as("id"))
    HnswIndex.softDelete(spark, path, tomb, "id")
    val ran = HnswIndex.autoMaintainHnsw(spark, path,
      retrainC = Some(4), retrainIters = 10)
    assert(ran.contains("retrain"), s"autoMaintain must escalate: $ran")
    val after = adviceMap()
    assert(!after.contains("retrain"),
      s"one pass must heal the skew: before=${before.get("retrain")} " +
        s"after=$after")
    // exactly-once: a second pass has nothing to do
    assert(HnswIndex.autoMaintainHnsw(spark, path, retrainC = Some(4),
      retrainIters = 10).isEmpty, "second autoMaintain must no-op")
    // deletes folded physically and the sidecar retired
    assert(HnswIndex.readDeletes(spark, path).isEmpty)
    val survivors = vs.join(tomb, vs("vec_id") === tomb("id"),
      "left_anti").localCheckpoint(true)
    val ids = HnswIndex.readVectors(spark, path)
      .select($"vec_id".cast("long")).collect().map(_.getLong(0)).toSet
    assert(ids == survivors.select($"vec_id".cast("long")).collect()
      .map(_.getLong(0)).toSet,
      "retrain must rebuild on the tombstone-folded membership")
    // retrain ≡ build-on-survivors under the NEW committed centroids
    val newCents = HnswIndex.readCentroids(spark, path)
    val want = Ann.hnswBuild(survivors, newCents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(want.map(edgeSet)).zipWithIndex.foreach {
      case ((got, w), l) =>
        assert(got == w, s"layer $l: retrained != build on survivors")
    }
    // structural invariants hold against the new generation (misfiled
    // check reads the NEW centroids, membership bitmap rebuilt)
    val checks = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.values.forall(_ == 0L),
      s"retrained index must fsck clean: ${checks.filter(_._2 != 0L)}")
    // and it serves
    val q = vs.filter($"vec_id" === 500).select($"embedding")
      .head.getSeq[Float](0)
    assert(HnswIndex.search(spark, path, q, beam = 8, hops = 3)
      .count() > 0)
    // a collision after the retrain is still caught (bitmap rebuilt)
    val clash = intercept[IllegalArgumentException] {
      HnswIndex.ingest(spark, path, vs.filter($"vec_id" === 500L))
    }
    assert(clash.getMessage.contains("already exists"))
  }

  test("epoch allocation is atomic: claimed intents and committed epochs bump the allocator, never get overwritten") {
    val path = freshDir("graft_hidx_alloc_")
    buildAt(path) // commits epoch 0
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a foreign (cross-JVM) writer has claimed epoch 1: its intent is
    // on disk, its op mid-flight
    val foreign = new org.apache.hadoop.fs.Path(root, "_refresh/e_1.intent")
    val out = fs.create(foreign, false)
    out.write("layer_0/__c=0\n".getBytes("UTF-8")); out.close()
    val got = HnswIndex.allocateIntent(fs, root, 1L, "_deletes\n")
    assert(got == 2L, s"allocator must bump past the claimed epoch: $got")
    // the foreign claim is untouched — no overwrite-create anywhere
    val in = fs.open(foreign)
    val fBody = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    assert(fBody == "layer_0/__c=0\n",
      "a racing allocator must never overwrite a foreign intent")
    assert(new java.io.File(path, "_refresh/e_2.intent").exists())
    // committed epochs are skipped too (epoch 0 carries a commit marker)
    assert(HnswIndex.allocateIntent(fs, root, 0L, "x\n") == 3L,
      "allocator must skip committed epochs and live claims alike")
  }

  test("same-driver concurrency: ingest and softDelete racing on two threads serialize — distinct epochs, no phantom or mislabeled commit") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshDir("graft_hidx_conc_")
    buildAt(path)
    val dels = existing.filter(pmod(col("vec_id"), lit(23)) === 5)
      .select(col("vec_id").as("id")).localCheckpoint(true)
    val delIds = dels.collect().map(_.getLong(0)).toSet
    // the round-12 verdict's race: both ops resolve epoch = max
    // committed + 1 on separate threads of one driver (re-entrant
    // lease) — the per-root monitor must serialize them whole
    val fi = Future(HnswIndex.ingest(spark, path, batch))
    val fd = Future(HnswIndex.softDelete(spark, path, dels, "id"))
    val ei = Await.result(fi, 5.minutes)
    val ed = Await.result(fd, 5.minutes)
    assert(Set(ei, ed) == Set(1L, 2L),
      s"ops must take distinct consecutive epochs, got $ei and $ed")
    // both write sets landed whole (disjoint domains, order-free)
    val ids = HnswIndex.readVectors(spark, path)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(ids == e.select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet, "the racing ingest must land whole")
    assert(HnswIndex.readDeletes(spark, path).collect()
      .map(_.getLong(0)).toSet == delIds,
      "the racing softDelete must land whole")
    // marker hygiene: each epoch's marker lists exactly its OWN op's
    // dirs — a shared-epoch interleave would cross-contaminate them
    def markerDirs(ep: Long): Seq[String] =
      scala.io.Source.fromFile(s"$path/_refresh/e_$ep.commit")
        .getLines().filterNot(_.startsWith("txn=")).filter(_.nonEmpty).toSeq
    assert(markerDirs(ed) == Seq("_deletes"),
      s"delete marker must list only _deletes: ${markerDirs(ed)}")
    assert(!markerDirs(ei).contains("_deletes") &&
      markerDirs(ei).exists(_.startsWith("layer_")),
      s"ingest marker must list only hierarchy dirs: ${markerDirs(ei)}")
    val checks = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.values.forall(_ == 0L),
      s"post-race index must fsck clean: ${checks.filter(_._2 != 0L)}")
  }

  test("endorsed co-deployment: concurrent insert + delete streams land exactly-once; writer-scoped markers stay uncrossed") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = Files.createTempDirectory("graft_hidx_cod_").toString
    val path = base + "/idx"
    buildAt(path)
    val b1 = batch.filter(pmod(col("vec_id"), lit(20)) === 7)
    val b2 = batch.filter(pmod(col("vec_id"), lit(20)) === 17)
    val d1 = existing.filter(pmod(col("vec_id"), lit(34)) === 3)
      .select(col("vec_id").as("id"))
    val d2 = existing.filter(pmod(col("vec_id"), lit(34)) === 20)
      .select(col("vec_id").as("id"))
    def startIns() = HnswIndex.streamInsertHnswMaintained(
      spark.readStream.schema(batch.schema).parquet(base + "/in_i"),
      path, base + "/ck_i")
    def startDel() = HnswIndex.streamDeleteHnswMaintained(
      spark.readStream.schema(d1.schema).parquet(base + "/in_d"), "id",
      path, base + "/ck_d")
    // round 1: both streams have work queued, both drain CONCURRENTLY
    b1.coalesce(1).write.mode("overwrite").parquet(base + "/in_i")
    d1.coalesce(1).write.mode("overwrite").parquet(base + "/in_d")
    val qi = startIns(); val qd = startDel()
    def drainBoth(): Unit = Await.result(Future.sequence(Seq(
      Future(qi.processAllAvailable()),
      Future(qd.processAllAvailable()))), 10.minutes): Unit
    drainBoth()
    // round 2: more work for both, drained concurrently again
    b2.coalesce(1).write.mode("append").parquet(base + "/in_i")
    d2.coalesce(1).write.mode("append").parquet(base + "/in_d")
    drainBoth()
    qi.stop(); qd.stop()
    // no lost commit: all inserts present, all deletes pending
    val ids = HnswIndex.readVectors(spark, path)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(ids == e.select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet, "both insert batches must land")
    val wantDels = d1.unionByName(d2).collect().map(_.getLong(0)).toSet
    assert(HnswIndex.readDeletes(spark, path).collect()
      .map(_.getLong(0)).toSet == wantDels,
      "both delete batches must land")
    // no mislabeled commit: every marker carries exactly one writer's
    // txn and exactly that op family's dirs; each writer committed
    // batches {0, 1} once each
    val wIns = HnswIndex.writerId(base + "/ck_i")
    val wDel = HnswIndex.writerId(base + "/ck_d")
    val markers = new java.io.File(path, "_refresh").listFiles()
      .filter(_.getName.endsWith(".commit"))
      .map(f => scala.io.Source.fromFile(f).getLines().toSeq).toSeq
    val byWriter = markers.flatMap { lines =>
      val txn = lines.head.stripPrefix("txn=")
      val i = txn.lastIndexOf(':')
      if (i > 0) Some((txn.substring(0, i), txn.substring(i + 1).toLong,
        lines.tail.filter(_.nonEmpty)))
      else None
    }
    assert(byWriter.filter(_._1 == wIns).map(_._2).sorted == Seq(0L, 1L),
      "insert writer must have committed exactly batches 0 and 1")
    assert(byWriter.filter(_._1 == wDel).map(_._2).sorted == Seq(0L, 1L),
      "delete writer must have committed exactly batches 0 and 1")
    byWriter.foreach { case (w, b, dirs) =>
      if (w == wDel) assert(dirs.forall(_ == "_deletes"),
        s"delete marker $b lists foreign dirs: $dirs")
      if (w == wIns) assert(!dirs.contains("_deletes"),
        s"insert marker $b lists the delete sidecar: $dirs")
    }
    val checks = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks.values.forall(_ == 0L),
      s"co-deployed index must fsck clean: ${checks.filter(_._2 != 0L)}")
    // serving filters the streamed tombstones immediately
    val qv = e.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val hits = HnswIndex.search(spark, path, qv, beam = 8, hops = 3)
      .collect().map(_.getLong(1)).toSet
    assert(hits.intersect(wantDels).isEmpty)
    // replay: both streams restart on their checkpoints, nothing changes
    val snap = allFiles(path)
    val qi2 = startIns(); val qd2 = startDel()
    Await.result(Future.sequence(Seq(
      Future(qi2.processAllAvailable()),
      Future(qd2.processAllAvailable()))), 10.minutes): Unit
    qi2.stop(); qd2.stop()
    assert(allFiles(path) == snap,
      "concurrent-stream replay must be exactly-once for both writers")
  }

  test("gcRetain default: a concurrent reader's resolved snapshot survives a refresh with no conf set") {
    val path = freshDir("graft_hidx_defret_")
    buildAt(path)
    val before = allFiles(path)
    val pinned = HnswIndex.readLayers(spark, path) // resolved at epoch 0
    val want = pinned.map(edgeSet)
    HnswIndex.ingest(spark, path, batch) // a refresh commits + GCs
    // at the DEFAULT retention every pre-refresh file must still be on
    // disk — the reader's snapshot collects byte-identical, no
    // FileNotFoundException (the round-12 What's-wrong #2)
    val after = allFiles(path)
    assert(before.keySet.subsetOf(after.keySet),
      "default gcRetain must keep the superseded generation for " +
        "in-flight readers: " +
        before.keySet.diff(after.keySet).take(3).mkString(", "))
    assert(pinned.map(edgeSet) == want,
      "a pre-refresh snapshot must still serve after the refresh at " +
        "the default conf")
  }

  test("pinned serves honor right-to-erasure: purged and retrained-away ids never resurface at an asOf pin") {
    val path = freshDir("graft_hidx_erase_")
    spark.conf.set("graft.hnsw.gcRetain", "4")
    try {
      HnswIndex.build(spark, path, e, cents, "vec_id", "embedding",
        "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1) // epoch 0
      val q = e.filter(col("vec_id") === 42)
        .select(col("embedding")).head.getSeq[Float](0)
      def pin0(k: Int) = HnswIndex.search(spark, path, q, beam = 8,
        hops = 3, k = k, asOf = Some(0L)).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val pre = pin0(5)
      val pre8 = pin0(8) // the full beam page, for the control below
      val top = pre.head._2
      // the ADVICE scenario: softDelete → purgeDeletes retires the
      // tombstone sidecar; current deletes are then EMPTY, so a pinned
      // read of the pre-purge vector generation would resurface the
      // erased row without the erasure probe
      HnswIndex.softDelete(spark, path,
        e.filter(col("vec_id") === top).select(col("vec_id").as("id")),
        "id") // epoch 1
      HnswIndex.purgeDeletes(spark, path) // epoch 2 — sidecar retired
      assert(HnswIndex.readDeletes(spark, path).isEmpty)
      val afterPurge = pin0(5)
      assert(!afterPurge.exists(_._2 == top),
        s"physically purged id $top resurfaced at the pin: $afterPurge")
      assert(afterPurge.nonEmpty,
        "the pinned page must still serve the surviving corpus")
      // a DIRECT purge (never soft-deleted — no tombstone trace at
      // all) is erased at the pin too
      val second = afterPurge.head._2
      HnswIndex.purge(spark, path,
        e.filter(col("vec_id") === second).select(col("vec_id").as("id")),
        "id") // epoch 3
      val afterDirect = pin0(5)
      assert(!afterDirect.exists(_._2 == second) &&
        !afterDirect.exists(_._2 == top),
        s"directly purged id $second resurfaced at the pin: $afterDirect")
      // control: the page re-fills from the BEAM's survivors only —
      // erased ids gone, everything served was a pinned beam candidate
      assert(afterDirect.map(_._2).toSet
        .subsetOf(pre8.map(_._2).toSet -- Set(top, second)) &&
        afterDirect.nonEmpty)
      // the batch face applies the same law
      val queries = e.filter(col("vec_id") === 42)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val gotB = HnswIndex.searchBatch(spark, path, queries, "qid",
        "qvec", beam = 8, hops = 3, k = 5, asOf = Some(0L)).collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
        .sortBy(_._1)
      assert(gotB == afterDirect,
        s"pinned batch face must equal the single face: $gotB " +
          s"vs $afterDirect")
    } finally spark.conf.unset("graft.hnsw.gcRetain")
  }

  test("rollbackBuild wipes only index-owned names: foreign files in the target dir survive a crashed build's recovery") {
    val path = freshDir("graft_hidx_foreign_")
    val fdir = new java.io.File(path)
    assert(fdir.mkdirs())
    val keep = new java.io.File(fdir, "NOTES.txt")
    val w = new java.io.PrintWriter(keep); w.write("operator notes"); w.close()
    class Boom extends RuntimeException("injected")
    intercept[Boom] {
      HnswIndex.build(spark, path, existing, cents, "vec_id",
        "embedding", "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
        hook = s => if (s == "appended") throw new Boom)
    }
    HnswIndex.recover(spark, path)
    assert(keep.exists() &&
      scala.io.Source.fromFile(keep).mkString == "operator notes",
      "recover after a crashed build must not delete foreign content")
    // the index itself is wiped and rebuildable
    val left = Option(fdir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .map(_.getName)
      .filterNot(n => n == "_LOCK" || n == "_refresh" || n == "NOTES.txt")
    assert(left.isEmpty, s"index-owned debris must be wiped: $left")
    buildAt(path)
    assert(HnswIndex.readVectors(spark, path).count() == existing.count())
  }

  test("searchGrouped: RAG-page shape ≡ manual beam + grouped ranking; tombstones honored; non-passthrough group refuses") {
    val path = freshDir("graft_hidx_grp_")
    val e2 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    HnswIndex.build(spark, path, e2, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
      passthrough = Seq("label"))
    val labelOf = e2.select(col("vec_id").cast("long"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val q = e2.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val got = HnswIndex.searchGrouped(spark, path, q, "label", beam = 8,
        hops = 3, nGroups = 3, perGroup = 2).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toSeq.sortBy(t => (t._1, t._2))
    // manual replay over the raw beam page
    val raw = HnswIndex.search(spark, path, q, beam = 8, hops = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val byGroup = raw.groupBy { case (id, _) => labelOf(id) }
      .view.mapValues(_.sortBy { case (id, sc) => (-sc, id) }.take(2))
      .toMap
    val topGroups = byGroup.toSeq
      .map { case (g, hits) => (g, hits.head._2) }
      .sortBy { case (g, best) => (-best, g) }.take(3)
      .zipWithIndex.map { case ((g, _), i) => (g, i + 1) }
    val want = topGroups.flatMap { case (g, gr) =>
      byGroup(g).zipWithIndex.map { case ((id, sc), i) =>
        (gr, i + 1, id, sc)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == want, s"grouped page mismatch:\n$got\nvs\n$want")
    // tombstones drop from the grouped page too
    val victim = got.head._3
    HnswIndex.softDelete(spark, path,
      e2.filter(col("vec_id") === victim).select(col("vec_id").as("id")),
      "id")
    val after = HnswIndex.searchGrouped(spark, path, q, "label",
      beam = 8, hops = 3, nGroups = 3, perGroup = 2)
      .collect().map(_.getLong(3)).toSet
    assert(!after.contains(victim),
      "grouped serve must honor pending soft deletes")
    // a non-passthrough group column refuses loudly
    val bad = intercept[IllegalArgumentException] {
      HnswIndex.searchGrouped(spark, path, q, "nope", beam = 8,
        hops = 3, nGroups = 3, perGroup = 2)
    }
    assert(bad.getMessage.contains("passthrough"), bad.getMessage)
  }

  test("softDeleteWhere: predicate resolves ids from passthrough metadata; serve hides them; vacuum makes them physical") {
    val path = freshDir("graft_hidx_sdw_")
    val e2 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
    HnswIndex.build(spark, path, e2, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
      passthrough = Seq("label"))
    val odd = e2.filter(pmod(col("label"), lit(2)) === 1)
      .select(col("vec_id").cast("long")).collect()
      .map(_.getLong(0)).toSet
    val ep = HnswIndex.softDeleteWhere(spark, path,
      pmod(col("label"), lit(2)) === 1)
    assert(ep == 1L)
    assert(HnswIndex.readDeletes(spark, path).collect()
      .map(_.getLong(0)).toSet == odd,
      "the predicate must resolve exactly the matching ids")
    // the tombstone-honoring serve hides them
    val q = e2.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val hits = HnswIndex.search(spark, path, q, beam = 8, hops = 3, k = 5)
      .collect().map(_.getLong(1)).toSet
    assert(hits.nonEmpty && hits.intersect(odd).isEmpty)
    // vacuum folds them physically
    HnswIndex.purgeDeletes(spark, path)
    val ids = HnswIndex.readVectors(spark, path)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    assert(ids.intersect(odd).isEmpty && ids.nonEmpty)
    // a no-match predicate is a no-op: no epoch, no file changes
    val snap = allFiles(path)
    val ep2 = HnswIndex.softDeleteWhere(spark, path, col("label") === -999)
    assert(allFiles(path) == snap && ep2 == 2L,
      "a no-match predicate delete must write nothing")
  }

  test("searchMaxSim: beam candidates re-ranked by exact slice MaxSim ≡ manual computation") {
    val path = freshDir("graft_hidx_ms_")
    HnswIndex.build(spark, path, e, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    val q = e.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val got = HnswIndex.searchMaxSim(spark, path, q, nSlices = 4,
        beam = 8, hops = 3, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    // manual: the raw beam page re-scored by the slice grid
    val cand = HnswIndex.search(spark, path, q, beam = 8, hops = 3)
      .collect().map(_.getLong(1)).toSeq
    val vecOf = e.filter(col("vec_id").isin(cand: _*))
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = q.length / 4
    def sliceCos(a: Seq[Float], ai: Int, b: Seq[Float], bi: Int): Double = {
      val as = a.slice(ai * d, ai * d + d).map(_.toDouble)
      val bs = b.slice(bi * d, bi * d + d).map(_.toDouble)
      val dp = as.zip(bs).map { case (x, y) => x * y }.sum
      val na = math.max(math.sqrt(as.map(x => x * x).sum), 1e-12)
      val nb = math.max(math.sqrt(bs.map(x => x * x).sum), 1e-12)
      round6(dp / (na * nb))
    }
    val want = cand.map { id =>
      val v = vecOf(id)
      val micro = (0 until 4).map { qi =>
        math.round((0 until 4).map(dj => sliceCos(v, dj, q, qi)).max
          * 1000000.0)
      }.sum
      (id, round6(micro.toDouble / 1000000.0) + 0.0)
    }.sortBy { case (id, sc) => (-sc, id) }.take(5)
      .zipWithIndex.map { case ((id, sc), r) => (r + 1, id, sc) }
    assert(got == want, s"MaxSim mismatch:\n$got\nvs\n$want")
  }

  test("searchBatchCollapsed ≡ searchBatch row-for-row on a duplicated query batch") {
    import spark.implicits._
    val path = freshDir("graft_hidx_col_")
    HnswIndex.build(spark, path, e, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    // 6 queries over 2 unique vectors — the hot-query shape
    val base = e.filter(col("vec_id").isin(42L, 137L))
      .select(col("vec_id"), col("embedding"))
    val queries = base.as[(Long, Seq[Float])].collect().toSeq
      .flatMap { case (id, v) => Seq((id, v), (id + 1000, v), (id + 2000, v)) }
      .toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val plain = rows(HnswIndex.searchBatch(spark, path, queries, "qid",
      "qvec", beam = 8, hops = 3, k = 5))
    val collapsed = rows(HnswIndex.searchBatchCollapsed(spark, path,
      queries, "qid", "qvec", beam = 8, hops = 3, k = 5))
    assert(collapsed == plain,
      "collapse must be row-for-row identical to the uncollapsed serve")
    assert(collapsed.map(_._1).distinct.size == 6,
      "every original qid must get its page back")
  }

  test("askHnsw: grouped RAG context over the durable graph assembles in page order with passthrough text") {
    import spark.implicits._
    val path = freshDir("graft_hidx_rag_")
    val e2 = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"),
        concat(lit("chunk-"), col("vec_id")).as("chunk"))
    HnswIndex.build(spark, path, e2, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1,
      passthrough = Seq("label", "chunk"))
    val q = e2.filter(col("vec_id") === 42)
      .select(col("embedding")).head.getSeq[Float](0)
    val row = graft.rag.Rag.askHnsw(spark, path, q, "what is here",
      "chunk", "label", beam = 8, hops = 3, nGroups = 3, perGroup = 2)
      .head
    val hits = HnswIndex.searchGrouped(spark, path, q, "label", beam = 8,
        hops = 3, nGroups = 3, perGroup = 2)
      .orderBy($"grp_rank", $"rnk")
      .collect().map(_.getLong(3)).toSeq
    val wantCtx = hits.map(id => s"- chunk-$id").mkString("\n\n")
    assert(row.getString(0) == "what is here")
    assert(row.getString(1) == wantCtx,
      s"context must assemble in grouped page order:\n${row.getString(1)}" +
        s"\nvs\n$wantCtx")
    assert(row.getString(2).contains(wantCtx) &&
      row.getString(2).startsWith("Answer strictly from the context.") &&
      row.getString(2).endsWith("Question: what is here\nAnswer:"))
  }

  test("cell-hint sidecar: coverage holds through ingest/purge/retrain; legacy fallback stays correct and upgrades") {
    val path = freshDir("graft_hidx_hint_")
    buildAt(path)
    def fsckMap() = HnswIndex.fsck(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def descMap() = HnswIndex.describe(spark, path).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(descMap()(("cellhint_groups", -1)) > 0L,
      "build must write the cell-hint sidecar")
    assert(fsckMap()("cellhint_missing") == 0L)
    // ingest folds the batch's (grp, cell) pairs in the same commit
    HnswIndex.ingest(spark, path, batch)
    assert(fsckMap()("cellhint_missing") == 0L,
      "hints must cover existing ∪ batch after the ingest commit")
    // purge leaves hints superset-wide but never narrow — discovery is
    // hint-bounded and the compacted index still equals a fresh build
    val tomb = e.filter(pmod(col("vec_id"), lit(17)) === 3)
      .select(col("vec_id").as("id"))
    HnswIndex.purge(spark, path, tomb, "id")
    assert(fsckMap()("cellhint_missing") == 0L)
    val survivors = e.join(tomb, e("vec_id") === tomb("id"), "left_anti")
    val want = Ann.hnswBuild(survivors, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path).zip(want.map(edgeSet)).zipWithIndex.foreach {
      case ((got, w), l) =>
        assert(got == w, s"layer $l: hinted purge != build on survivors")
    }
    // LEGACY index (pre-hint layout): strip the sidecar + flag — purge
    // falls back to the full scan and stays correct
    val path2 = freshDir("graft_hidx_hint2_")
    buildAt(path2)
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(): Unit
    }
    rmrf(new java.io.File(path2, "_cellhint"))
    val metaF = new java.io.File(path2, "_META")
    val stripped = scala.io.Source.fromFile(metaF).getLines()
      .filterNot(_.startsWith("cellHints=")).mkString("", "\n", "\n")
    val w = new java.io.PrintWriter(metaF); w.write(stripped); w.close()
    new java.io.File(path2, "._META.crc").delete(): Unit
    assert(!HnswIndex.readMeta(spark, path2).cellHints)
    // the advisor NAMES the missing hint sidecar (one buildMembership
    // run is the documented fix for bitmap and hints alike)
    val legacyAdvice = HnswIndex.adviseHnsw(spark, path2).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(legacyAdvice.get("build-membership")
      .exists(_.contains("cell-hint")),
      s"advisor must name the missing hints: $legacyAdvice")
    val tomb2 = existing.filter(pmod(col("vec_id"), lit(17)) === 3)
      .select(col("vec_id").as("id"))
    HnswIndex.purge(spark, path2, tomb2, "id")
    val surv2 = existing.join(tomb2,
      existing("vec_id") === tomb2("id"), "left_anti")
    val want2 = Ann.hnswBuild(surv2, cents, "vec_id", "embedding",
      "cent_id", "cvec", k = 4, fanout = 4, maxLevel = 1)
    layersOf(path2).zip(want2.map(edgeSet)).zipWithIndex.foreach {
      case ((got, w2), l) =>
        assert(got == w2, s"layer $l: legacy full-scan purge broken")
    }
    // the one-call upgrade turns hints on; a second call no-ops
    HnswIndex.buildMembership(spark, path2)
    assert(HnswIndex.readMeta(spark, path2).cellHints)
    val up = HnswIndex.fsck(spark, path2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(up("cellhint_missing") == 0L,
      "upgrade must rebuild full hint coverage")
    val snap = allFiles(path2)
    HnswIndex.buildMembership(spark, path2)
    assert(allFiles(path2) == snap, "a second upgrade must no-op")
    // and the advice it acted on no longer fires
    assert(!HnswIndex.adviseHnsw(spark, path2).collect()
      .map(_.getString(0)).contains("build-membership"),
      "the upgrade must clear the advisor signal")
  }

  test("fence census: every commit rename in HnswIndex.scala sits behind a MaintainedLock.check") {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/HnswIndex.scala"))
    import scala.jdk.CollectionConverters._
    val renames = lines.asScala.zipWithIndex.filter { case (l, _) =>
      l.contains("fs.rename(") &&
        !l.trim.startsWith("*") && !l.trim.startsWith("//")
    }
    assert(renames.size >= 2,
      s"census is vacuous: expected >= 2 rename sites, found ${renames.size}")
    renames.foreach { case (l, i) =>
      assert(l.contains("commit"),
        s"HnswIndex.scala:${i + 1} renames a non-commit path — extend " +
          s"this census consciously if that is intended: $l")
      val before = lines.asScala.slice(math.max(0, i - 4), i)
      assert(before.exists(_.contains("MaintainedLock.check(")),
        s"commit rename at HnswIndex.scala:${i + 1} has no " +
          "MaintainedLock.check in the 4 preceding lines — unfenced " +
          "commit point")
    }
  }
}
