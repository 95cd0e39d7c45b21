package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decodePartitioned (mapPartitions decoder) agrees with the Column-level stub") {
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "another payload"), (3L, ""))
      .toDF("id", "text")
      .withColumn("bin", Multimodal.payload($"text"))
    val viaPartitions = Multimodal.decodePartitioned(df, "bin", Multimodal.StubDecoder(4))
      .select($"id", $"decoded.n_bytes", $"decoded.width", $"decoded.height",
        $"decoded.format",
        element_at($"decoded.features", 1).cast("double").as("f0"))
    val viaColumns = df
      .withColumn("meta", Multimodal.fakeDecodeMeta($"bin"))
      .withColumn("f", Multimodal.fakeFeatures($"bin", 4))
      .select($"id", $"meta.n_bytes", $"meta.width", $"meta.height", $"meta.format",
        element_at($"f", 1).cast("float").cast("double").as("f0"))
    val a = viaPartitions.orderBy("id").collect().map(_.toSeq)
    val b = viaColumns.orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("decoder schema and batch shape survive partitioning") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"payload $i")).toDF("id", "text")
      .withColumn("bin", Multimodal.payload($"text"))
      .repartition(7)
    val out = Multimodal.decodePartitioned(df, "bin", Multimodal.StubDecoder(8))
    assert(out.schema.fieldNames.toSeq == Seq("id", "text", "bin", "decoded"))
    assert(out.count() == 100)
    val dims = out.select(size($"decoded.features")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(8))
  }

  test("PPM: encode/parse round-trip, comments, and malformed inputs") {
    import Multimodal.Ppm
    val img = Ppm.Image(3, 2, 255,
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90,
        100, 110, 120, -126, -116, -106, -96, -86, -76)) // 130..180 unsigned
    val back = Ppm.parse(Ppm.encode(img)).get
    assert(back.width == 3 && back.height == 2 && back.maxval == 255)
    assert(back.pixels.sameElements(img.pixels))
    // header comments are legal PPM
    val commented = "P6\n# a comment\n3 2\n# more\n255\n".getBytes("US-ASCII") ++
      img.pixels
    assert(Ppm.parse(commented).exists(_.pixels.sameElements(img.pixels)))
    // malformed: wrong magic, truncated raster, zero dims → None, no throw
    assert(Ppm.parse("P5\n1 1\n255\nx".getBytes).isEmpty)
    assert(Ppm.parse(Ppm.encode(img).dropRight(1)).isEmpty)
    assert(Ppm.parse("P6\n0 2\n255\n".getBytes).isEmpty)
    assert(Ppm.parse(Array.empty[Byte]).isEmpty)
  }

  test("PPM: nearest-neighbor resize picks exact source pixels") {
    import Multimodal.Ppm
    // 2x2 image with distinct corner colors
    val img = Ppm.Image(2, 2, 255,
      Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
    val up = Ppm.resizeNearest(img, 4, 4)
    // each source pixel becomes a 2x2 block, seams at the halfway point
    def px(i: Ppm.Image, x: Int, y: Int) = i.pixels((y * i.width + x) * 3)
    assert(px(up, 0, 0) == 1 && px(up, 3, 0) == 2)
    assert(px(up, 0, 3) == 3 && px(up, 3, 3) == 4)
    assert(px(up, 1, 1) == 1 && px(up, 2, 2) == 4)
    val down = Ppm.resizeNearest(up, 2, 2)
    assert(down.pixels.sameElements(img.pixels), "down(up(x)) == x for 2x blocks")
  }

  test("PpmDecoder: real decode through the partitioned boundary, garbage absorbed") {
    import spark.implicits._
    import Multimodal.Ppm
    // solid-color images: mean channel features are exactly the color
    def solid(id: Long, w: Int, h: Int, r: Int, g: Int, b: Int) = {
      val px = Array.tabulate(w * h * 3)(i => (Seq(r, g, b)(i % 3)).toByte)
      (id, Ppm.encode(Ppm.Image(w, h, 255, px)))
    }
    val rows = Seq(solid(1L, 4, 3, 255, 0, 0), solid(2L, 5, 5, 0, 255, 0),
      (3L, "not an image at all".getBytes("UTF-8")))
    val df = rows.toDF("id", "bin").repartition(2)
    val out = Multimodal.decodePartitioned(df, "bin", Multimodal.PpmDecoder(5))
      .select($"id", $"decoded.*").collect()
      .map(r => r.getLong(0) -> r).toMap
    val red = out(1L)
    assert(red.getAs[Int]("width") == 4 && red.getAs[Int]("height") == 3)
    assert(red.getAs[String]("format") == "ppm")
    val redF = red.getAs[scala.collection.Seq[Float]]("features")
    assert(redF(0) == 1.0f && redF(1) == 0.0f && redF(2) == 0.0f)
    // luma strip of solid red = 0.299 everywhere
    assert(math.abs(redF(3) - 0.299f) < 1e-3 && math.abs(redF(4) - 0.299f) < 1e-3)
    val green = out(2L)
    assert(green.getAs[scala.collection.Seq[Float]]("features")(1) == 1.0f)
    val junk = out(3L)
    assert(junk.getAs[String]("format") == "unknown" &&
      junk.getAs[Int]("width") == 0)
    assert(junk.getAs[scala.collection.Seq[Float]]("features").forall(_ == 0.0f))
    assert(junk.getAs[Long]("n_bytes") == "not an image at all".length)
  }

  test("WavDecoder: round-trip, hand-computed signal features, garbage absorbed") {
    import spark.implicits._
    import Multimodal.Wav
    // square wave ±1000, 8 samples: rms = 1000, zcross = 7, peak = 1000
    val sq = Array.tabulate(8)(i =>
      (if (i % 2 == 0) 1000 else -1000).toShort)
    val silent = Array.fill(4)(0.toShort)
    val rows = Seq(
      (1L, Wav.encode(Wav.Audio(8000, 1, sq))),
      (2L, Wav.encode(Wav.Audio(16000, 1, silent))),
      (3L, "definitely not audio".getBytes("UTF-8")))
    val out = Multimodal.decodePartitioned(
        rows.toDF("id", "bin").repartition(2), "bin",
        Multimodal.WavDecoder(4))
      .select($"id", $"decoded.*").collect()
      .map(r => r.getLong(0) -> r).toMap
    // parse round-trips the header fields
    val w1 = out(1L)
    assert(w1.getAs[String]("format") == "wav")
    assert(w1.getAs[Int]("width") == 8000)      // sample rate slot
    assert(w1.getAs[Int]("height") == 8)        // sample count slot
    assert(w1.getAs[Long]("n_bytes") == 44 + 16)
    val f1 = w1.getAs[scala.collection.Seq[Float]]("features")
    assert(f1(0) == (1000.0 / 32768.0).toFloat)           // rms
    assert(f1(1) == (7.0 / 8.0).toFloat)                  // zero crossings
    assert(f1(2) == (1000.0 / 32768.0).toFloat)           // peak
    assert(f1(3) == (8.0 / 8000.0).toFloat)               // duration
    // silence: zero rms/zcr/peak, duration still real
    val f2 = out(2L).getAs[scala.collection.Seq[Float]]("features")
    assert(f2(0) == 0.0f && f2(1) == 0.0f && f2(2) == 0.0f)
    assert(f2(3) == (4.0 / 16000.0).toFloat)
    // garbage absorbs to unknown, never throws
    assert(out(3L).getAs[String]("format") == "unknown")
    // parse rejects a truncated data chunk
    val full = Wav.encode(Wav.Audio(8000, 1, sq))
    assert(Wav.parse(full.dropRight(2)).isEmpty)
  }

  test("Video: frame-concat round-trip, truncation absorbed, sampling every k-th") {
    import spark.implicits._
    import Multimodal.{Ppm, Video}
    def frame(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    val five = (0 until 5).map(frame)
    // round-trip all frames in order
    val back = Video.parseFrames(Video.encode(five))
    assert(back.length == 5 &&
      back.zip(five).forall { case (a, b) => a.pixels.sameElements(b.pixels) })
    // truncated tail: the complete leading frames still decode
    val cut = Video.encode(five).dropRight(5)
    assert(Video.parseFrames(cut).length == 4)
    // garbage and empty absorb to zero frames
    assert(Video.parseFrames("not a video".getBytes).isEmpty)
    assert(Video.parseFrames(Array.emptyByteArray).isEmpty)

    val df = Seq((1L, Video.encode(five)), (2L, Array.emptyByteArray))
      .toDF("id", "bin")
    val rows = Multimodal.frameSampled(df, "bin", every = 2)
      .select(col("id"), col("frame.frame_idx"), col("frame.n_frames"),
        element_at(col("frame.features"), 1))
      .collect()
    // ids 0, 2, 4 of the 5-frame video; the empty payload contributes none
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 2), (1L, 4)))
    assert(rows.forall(_.getInt(2) == 5))
    // channel mean of the constant-value frame: v / 255
    assert(rows.map(_.getFloat(3)).toSeq ==
      Seq(0f, (2.0 / 255).toFloat, (4.0 / 255).toFloat))
  }

  test("frameSampled: maxFrames budget flows through and flags truncation") {
    import spark.implicits._
    import Multimodal.{Ppm, Video}
    def frame(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    val five = Video.encode((0 until 5).map(frame))
    // parseFramesEx: budget hit with bytes remaining -> truncated
    assert(Multimodal.Video.parseFramesEx(five, maxFrames = 3) match {
      case (fs, tr) => fs.length == 3 && tr
    })
    // exact-length and malformed-tail walks do NOT flag
    assert(Multimodal.Video.parseFramesEx(five, maxFrames = 5) match {
      case (fs, tr) => fs.length == 5 && !tr
    })
    assert(!Multimodal.Video.parseFramesEx(five.dropRight(5), 1024)._2)
    val df = Seq((1L, five), (2L, Video.encode(Seq(frame(9))))).toDF("id", "bin")
    val rows = Multimodal.frameSampled(df, "bin", every = 2, featureDim = 3,
        maxFrames = 3)
      .select(col("id"), col("frame.frame_idx"), col("frame.n_frames"),
        col("frame.truncated"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    // video 1 decodes 3 of 5 frames (samples 0, 2), every row flagged;
    // video 2 fits the budget, unflagged — downstream can tell a
    // 3-frame video from a longer one that hit the budget
    assert(rows.toSet == Set((1L, 0, 3, true), (1L, 2, 3, true),
      (2L, 0, 1, false)))
  }

  test("frameSignatures: exact integer channel sums, sampled frames only") {
    import spark.implicits._
    import Multimodal.{Ppm, Video}
    // 2x2 frame with hand-set channel values: sums are exact integers
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val f0 = Ppm.Image(2, 2, 255, px)
    val f1 = Ppm.Image(2, 2, 255, Array.fill(12)(5.toByte))
    val df = Seq((7L, Video.encode(Seq(f0, f1, f0)))).toDF("id", "bin")
    val rows = Multimodal.frameSignatures(df, "bin", every = 2)
      .select(col("id"), col("sig.frame_idx"), col("sig.s0"), col("sig.s1"),
        col("sig.s2"), col("sig.n_frames"), col("sig.truncated"))
      .collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // channels of f0: r = 10+40+70+100, g = 20+50+80+110, b = 30+60+90+120
    assert(rows.toSeq == Seq((0, 220L, 260L, 300L), (2, 220L, 260L, 300L)))
  }

  test("frameSigPairs: capped == uncapped decisions on a 1000x-shared-frame fixture") {
    import spark.implicits._
    import Multimodal.{Ppm, Video}
    def frame(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    // 1000 replicas of one clip (all sampled frames identical — the
    // corpus-wide intro bumper gone pathological), plus an organic
    // near-dup pair (50/51 share sampled frames 0 and 2) and a fresh clip
    val replicas = (100L until 1100L).map(i =>
      (i, Video.encode(Seq(frame(1), frame(2), frame(3)))))
    val organic = Seq(
      (50L, Video.encode(Seq(frame(10), frame(11), frame(12)))),
      (51L, Video.encode(Seq(frame(10), frame(99), frame(12)))),
      (60L, Video.encode(Seq(frame(20), frame(21), frame(22)))))
    val df = (organic ++ replicas).toDF("id", "bin")
    val uncapped = Multimodal.frameSigPairs(df, "id", "bin", every = 2,
      minShared = 2, maxBucket = 0)
    val capped = Multimodal.frameSigPairs(df, "id", "bin", every = 2,
      minShared = 2, maxBucket = 8)
    // organic pair in both; fresh clip in neither
    def pairs(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs(uncapped).contains((50L, 51L, 2L)))
    assert(pairs(capped).contains((50L, 51L, 2L)))
    assert(!pairs(capped).exists(p => p._1 == 60L || p._2 == 60L))
    // hot group: uncapped quadratic, capped linear star pairs at the
    // TRUE shared count (both sampled frames)
    assert(uncapped.count() == 1 + 1000L * 999 / 2)
    val star = pairs(capped).filter(_._1 >= 100L)
    assert(star.size == 999 && star.forall(p => p._1 == 100L && p._3 == 2L))
    // identical drop decisions (keep-min-drop-rest)
    def dropped(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
    assert(dropped(capped) == dropped(uncapped))
  }

  test("imageTileSignatures: exact quadrant sums on a hand-built raster, garbage absorbed") {
    import spark.implicits._
    import Multimodal.Ppm
    // 4x4 raster where every pixel's channel value encodes its position:
    // v = y*16 + x (channels identical) -> quadrant sums are exact
    // closed-form integers
    val px = new Array[Byte](48)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      px((y * 4 + x) * 3 + c) = (y * 16 + x).toByte
    val df = Seq((1L, Ppm.encode(Ppm.Image(4, 4, 255, px))),
      (2L, "junk".getBytes)).toDF("id", "bin")
    val got = Multimodal.imageTileSignatures(df, "bin", grid = 2)
      .select(col("id"), col("sig.tile_idx"), col("sig.tile_w"),
        col("sig.tile_h"), col("sig.s0"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSet
    // quadrant sum of v = y*16+x over its 2x2 block:
    //   t0 (y0..1, x0..1): 0+1+16+17 = 34;  t1 (x2..3): 2+3+18+19 = 42
    //   t2 (y2..3, x0..1): 32+33+48+49=162; t3: 34+35+50+51 = 170
    assert(got == Set((1L, 0, 2, 2, 34L), (1L, 1, 2, 2, 42L),
      (1L, 2, 2, 2, 162L), (1L, 3, 2, 2, 170L)), s"got $got")
  }

  test("imageSigPairs: shared-tile near-dups found; a corpus-wide letterbox tile stays below minShared under the cap") {
    import spark.implicits._
    import Multimodal.Ppm
    def img(t0: Int, t1: Int, t2: Int, t3: Int) = {
      val px = new Array[Byte](48)
      for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
        val q = (y / 2) * 2 + (x / 2)
        px((y * 4 + x) * 3 + c) = Seq(t0, t1, t2, t3)(q).toByte
      }
      Ppm.encode(Ppm.Image(4, 4, 255, px))
    }
    // 1 and 2 share tiles 0 and 1 (same art, bottom edited); 3 shares
    // only tile 0 with them — below threshold; 200 images (100..299)
    // all share ONE letterbox tile 0 = 0 (black bar) but nothing else
    // (200 consecutive values stay distinct mod 256, so no accidental
    // byte-wrap tile collisions)
    val organic = Seq(
      (1L, img(5, 6, 7, 8)), (2L, img(5, 6, 77, 88)), (3L, img(5, 1, 2, 3)))
    val letterbox = (100L until 300L).map(i =>
      (i, img(0, i.toInt, 1000 - i.toInt, i.toInt + 7)))
    val df = (organic ++ letterbox).toDF("id", "bin")
    val got = Multimodal.imageSigPairs(df, "id", "bin", grid = 2,
        minShared = 2, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L)), s"got $got")
  }

  test("dhash64: hand-computed bits, brightness invariance, local-edit locality") {
    import Multimodal.Ppm
    // 9x8 grayscale ramp: luma strictly increases along x -> every
    // comparison bit is 1 -> hash = all ones = -1L
    def ramp(base: Int) = {
      val px = new Array[Byte](9 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 9; c <- 0 until 3)
        px((y * 9 + x) * 3 + c) = (base + x * 10).toByte
      Ppm.Image(9, 8, 255, px)
    }
    assert(Multimodal.dhash64(ramp(0)) == -1L)
    // uniform brightness shift leaves every comparison unchanged
    assert(Multimodal.dhash64(ramp(40)) == Multimodal.dhash64(ramp(0)))
    // flat image: no strict inequality anywhere -> 0
    val flat = Ppm.Image(9, 8, 255, Array.fill(9 * 8 * 3)(77.toByte))
    assert(Multimodal.dhash64(flat) == 0L)
    // editing ONE pixel flips at most 2 bits
    val edited = ramp(0)
    val p = (3 * 9 + 4) * 3
    edited.pixels(p) = 0; edited.pixels(p + 1) = 0; edited.pixels(p + 2) = 0
    val d = java.lang.Long.bitCount(
      Multimodal.dhash64(ramp(0)) ^ Multimodal.dhash64(edited))
    assert(d >= 1 && d <= 2, s"one-pixel edit flipped $d bits")
  }

  test("dhashNearDups: exact dups at 0, one-pixel edits within threshold, distinct images absent; hot band stays linear") {
    import spark.implicits._
    import Multimodal.Ppm
    def img(vals: (Int, Int) => Int) = {
      val px = new Array[Byte](9 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 9; c <- 0 until 3)
        px((y * 9 + x) * 3 + c) = vals(y, x).toByte
      Ppm.encode(Ppm.Image(9, 8, 255, px))
    }
    val base = img((y, x) => x * 10 + (y % 3) * 5)
    val edit = img((y, x) => if (y == 2 && x == 3) 0 else x * 10 + (y % 3) * 5)
    val noise = img((y, x) => ((y * 37 + x * 91) % 200))
    // 300 flat images: all dhash 0 — one hot bucket in EVERY band; the
    // cap must route them as stars and verify hamming 0 for all
    val flats = (100L until 400L).map(i => (i, img((_, _) => 60)))
    val df = (Seq((1L, base), (2L, edit), (3L, noise)) ++ flats)
      .toDF("id", "bin")
    val got = Multimodal.dhashNearDups(df, "id", "bin", maxHamming = 3,
        maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "one-pixel edit must pair with its base")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "noise image alone")
    // every flat connects to the star min (100) at hamming 0 — the
    // keep-one decision set is intact without quadratic enumeration
    val flatPairs = got.filter(p => p._1 >= 100L)
    assert(flatPairs == (101L until 400L).map((100L, _)).toSet,
      s"expected 299 star pairs, got ${flatPairs.size}")
  }

  test("audioWindowSignatures: exact per-window sums, partial tail window dropped, garbage absorbed") {
    import spark.implicits._
    import Multimodal.Wav
    // 10 samples, window 4 -> 2 windows, 2-sample tail dropped
    val a = Wav.Audio(8000, 1,
      Array[Short](1, -2, 3, -4, 100, 200, -300, 50, 9, 9))
    val df = Seq((1L, Wav.encode(a)), (2L, "junk".getBytes)).toDF("id", "bin")
    val rows = Multimodal.audioWindowSignatures(df, "bin", winSize = 4)
      .select(col("id"), col("sig.n_windows"), col("sig.win_idx"),
        col("sig.sample_rate"), col("sig.wsum"), col("sig.wabs"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.toSet == Set(
      (1L, 2, 0, 8000, -2L, 10L),   // 1-2+3-4, |1|+|2|+|3|+|4|
      (1L, 2, 1, 8000, 50L, 650L))) // 100+200-300+50
  }

  test("audioEnergySegments: runs split on silence, threshold exact, per-clip isolation") {
    import spark.implicits._
    import Multimodal.Wav
    def w(v: Int) = Seq.fill(4)(v.toShort)
    // clip 1 windows |sums|: 40, 4, 40, 40, 4, 40 with threshold 40 ->
    // runs [0,0], [2,3], [5,5]; clip 2 all active -> one run
    val c1 = Wav.encode(Wav.Audio(8000, 1,
      (w(10) ++ w(1) ++ w(10) ++ w(-10) ++ w(1) ++ w(10)).toArray))
    val c2 = Wav.encode(Wav.Audio(8000, 1, (w(50) ++ w(-50)).toArray))
    val got = Multimodal.audioEnergySegments(
        Seq((1L, c1), (2L, c2)).toDF("id", "bin"), "id", "bin",
        winSize = 4, minAbsSum = 40L)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == Set(
      (1L, 0, 0, 1L, 40L), (1L, 2, 3, 2L, 80L), (1L, 5, 5, 1L, 40L),
      (2L, 0, 1, 2L, 400L)), s"got $got")
  }

  test("videoShots: identical runs share a shot, cuts open new ones, first frame always cuts") {
    import spark.implicits._
    import Multimodal.{Ppm, Video}
    def fr(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    // frames AABBC with threshold below the A->B distance:
    // shots [0,1], [2,3], [4,4]
    val vidBin = Video.encode(Seq(fr(10), fr(10), fr(60), fr(60), fr(120)))
    val got = Multimodal.videoShots(
        Seq((7L, vidBin)).toDF("id", "bin"), "id", "bin", threshold = 100L)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    // per-frame channel sums: 4 px * v per channel; A->B L1 = 3*4*50=600
    assert(got == Set((0L, 0, 1, 2L), (1L, 2, 3, 2L), (2L, 4, 4, 1L)),
      s"got $got")
  }

  test("audioSigPairs: shared-window near-dups found, bumper window below minShared, cap linear") {
    import spark.implicits._
    import Multimodal.Wav
    def clip(ws: Seq[Short]*) = Wav.encode(Wav.Audio(8000, 1,
      ws.flatMap(w => { require(w.length == 4); w }).toArray))
    val w = (v: Int) => Seq[Short](v.toShort, v.toShort, v.toShort, v.toShort)
    // 1 and 2 share windows 0 and 2; 3 shares only window 0 with them;
    // 300 clips (100..399) all share the same jingle in window 1 only
    val organic = Seq(
      (1L, clip(w(5), w(6), w(7))),
      (2L, clip(w(5), w(66), w(7))),
      (3L, clip(w(5), w(1), w(2))))
    val jingle = (100L until 400L).map(i =>
      (i, clip(w(i.toInt), w(42), w(1000 + i.toInt))))
    val df = (organic ++ jingle).toDF("id", "bin")
    val got = Multimodal.audioSigPairs(df, "id", "bin", winSize = 4,
        minShared = 2, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 2L)), s"got $got")
  }

  test("shotSigPairs: a re-cut video pairs by shot CONTENT where index-aligned frame matching finds nothing") {
    import spark.implicits._
    import Multimodal.{Ppm, Video}
    def fr(v: Int) = Ppm.Image(2, 2, 255, Array.fill(12)(v.toByte))
    def shot(v: Int) = Seq(fr(v), fr(v), fr(v))
    // A = [X X X | Y Y Y]; B = [Z Z Z | X X X | Y Y Y] — B is A with an
    // inserted opening shot, so every shared frame sits at a SHIFTED
    // index (adjacent-shot L1 distances all far above the 100 threshold)
    val a = Video.encode(shot(10) ++ shot(60))
    val b = Video.encode(shot(120) ++ shot(10) ++ shot(60))
    val df = Seq((1L, a), (2L, b)).toDF("id", "bin")
    // index-aligned frame matching loses every pair...
    val framePairs = Multimodal.frameSigPairs(df, "id", "bin",
        every = 1, minShared = 2)
      .collect()
    assert(framePairs.isEmpty,
      s"frame_idx-keyed matching must miss the re-cut, got ${framePairs.toSeq}")
    // ...shot-content matching recovers it (2 distinct shared shots)
    val shotPairs = Multimodal.shotSigPairs(df, "id", "bin",
        threshold = 100L, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shotPairs == Set((1L, 2L, 2L)), s"got $shotPairs")
  }

  test("activeAudioSigPairs: silence and isolated blips never generate candidates; the ungated twin pairs on them") {
    import spark.implicits._
    import Multimodal.Wav
    def clip(ws: Seq[Short]*) = Wav.encode(Wav.Audio(8000, 1,
      ws.flatMap(w => { require(w.length == 4); w }).toArray))
    val w = (v: Int) => Seq[Short](v.toShort, v.toShort, v.toShort, v.toShort)
    val df = Seq(
      // 1,2 share ONLY their two leading SILENT windows
      (1L, clip(w(0), w(0), w(5))),
      (2L, clip(w(0), w(0), w(9))),
      // 3,4 share an ACTIVE run of length 2 — the genuine near-dup
      (3L, clip(w(7), w(8), w(3))),
      (4L, clip(w(7), w(8), w(4))),
      // 5,6 share two ISOLATED one-window blips around silence
      (5L, clip(w(3), w(0), w(4))),
      (6L, clip(w(3), w(0), w(4) /* + tail differs */, w(99))),
      (7L, clip(w(3), w(0), w(4), w(77)))).toDF("id", "bin")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ungated = pairs(Multimodal.audioSigPairs(df, "id", "bin",
      winSize = 4, minShared = 2))
    // silence-driven (1,2) and blip-driven (5,6),(5,7),(6,7) pairs exist ungated
    assert(ungated.contains((1L, 2L, 2L)) && ungated.contains((3L, 4L, 2L)) &&
      ungated.contains((5L, 6L, 3L)), s"got $ungated")
    val gated = pairs(Multimodal.activeAudioSigPairs(df, "id", "bin",
      winSize = 4, minAbsSum = 1L, minSegWindows = 2, minShared = 2))
    assert(gated == Set((3L, 4L, 2L)),
      s"gating must keep only the active-run pair, got $gated")
  }
}
