package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed, deterministic metadata extraction.
  *
  * Two decoders ship behind the per-partition [[MediaDecoder]] boundary:
  * [[PpmDecoder]] is a REAL end-to-end decode path (P6 PPM parse →
  * nearest-neighbor resize → channel/luma features — the one raster
  * format decodable without native codecs, which this container has
  * none of), and [[StubDecoder]] is the deterministic md5 stand-in for
  * codec-less formats (jpeg/png/webp), kept as the oracle twin of the
  * Column-level `fakeDecodeMeta`/`fakeFeatures`. Everything around the
  * decoders is real and tested: the binary schema, per-partition
  * streaming compute (no shuffle), and the feature projection shape. A
  * real deployment swaps in a JNI codec without touching the plumbing.
  */
object Multimodal {

  /** Stand-in payload: the utf-8 bytes of a text column as BINARY. */
  def payload(text: Column): Column = text.cast("binary")

  /** STUB decode: pseudo width/height/format from the payload hash;
    * byte length is real.
    */
  def fakeDecodeMeta(bin: Column): Column = {
    val hx = md5(bin)
    struct(
      length(bin).cast("long").as("n_bytes"),
      pmod(conv(substring(hx, 1, 4), 16, 10).cast("int"), lit(640)).as("width"),
      pmod(conv(substring(hx, 5, 4), 16, 10).cast("int"), lit(480)).as("height"),
      element_at(typedLit(Seq("jpeg", "png", "webp")),
        (pmod(conv(substring(hx, 9, 2), 16, 10).cast("int"), lit(3)) + 1)).as("format"))
  }

  /** STUB feature extraction: `dim` deterministic pseudo-features in
    * [0, 1) derived from md5(i + ":" + md5(payload)).
    */
  def fakeFeatures(bin: Column, dim: Int): Column = {
    val hx = md5(bin)
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(Dedup.hash60(concat(i.cast("string"), lit(":"), hx)), lit(1000L))
        .cast("double") / 1000.0)
  }

  /** Decoded media record produced by a [[MediaDecoder]]. */
  case class DecodedMedia(nBytes: Long, width: Int, height: Int,
                          format: String, features: Array[Float])

  /** Per-partition media decoder — the JNI/codec boundary, shaped like
    * `graft.embed.Embedder`: `open()` loads the native codec once per
    * partition; `decode` is called per payload. The container ships no
    * image/audio codecs, so [[StubDecoder]] is the deterministic stand-in;
    * a real deployment swaps it without touching the plumbing.
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def open(): Unit = ()
    def decode(payload: Array[Byte]): DecodedMedia
  }

  /** Deterministic stub: md5-derived metadata (same definitions as the
    * Column-level `fakeDecodeMeta`/`fakeFeatures`, so both paths agree).
    */
  final case class StubDecoder(featureDim: Int = 4) extends MediaDecoder {
    override def decode(payload: Array[Byte]): DecodedMedia = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      def hx(from: Int, len: Int) =
        java.lang.Long.parseLong(hex.substring(from, from + len), 16)
      val feats = Array.tabulate(featureDim) { i =>
        ((graft.expressions.Md5Kernel.hash60(
          (i.toString + ":" + hex).getBytes("UTF-8")) % 1000L).toDouble / 1000.0).toFloat
      }
      DecodedMedia(payload.length.toLong, (hx(0, 4) % 640).toInt,
        (hx(4, 4) % 480).toInt,
        Seq("jpeg", "png", "webp")((hx(8, 2) % 3).toInt), feats)
    }
  }

  /** Minimal binary PPM (P6) codec — pure JVM, no native libs: the one
    * raster format simple enough to decode for real in this container,
    * which turns the decoder boundary from "stub only" into "real
    * format end to end" (parse → resize → features) while keeping
    * [[StubDecoder]] as the stand-in for codec-less formats.
    */
  object Ppm {
    /** Interleaved 8-bit RGB. */
    final case class Image(width: Int, height: Int, maxval: Int,
                           pixels: Array[Byte])

    /** Strict-enough P6 parser: `P6`, whitespace/comments, width height
      * maxval (≤ 255), single whitespace, then w·h·3 raw bytes. Returns
      * None on any malformed input — a decode boundary must never throw
      * on crawl garbage.
      */
    def parse(bytes: Array[Byte]): Option[Image] =
      parseAt(bytes, 0).map(_._1)

    /** [[parse]] starting at `from`, also returning the offset one past
      * the raster — the walker primitive the frame-concat VIDEO
      * container ([[Video.parseFrames]]) iterates.
      */
    def parseAt(bytes: Array[Byte], from: Int): Option[(Image, Int)] = {
      var i = from
      def skipWs(): Unit = {
        var go = true
        while (go && i < bytes.length) {
          val c = bytes(i)
          if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
          else go = false
        }
      }
      def int(): Option[Int] = {
        skipWs()
        val start = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
        if (i == start) None
        else Some(new String(bytes, start, i - start).toInt)
      }
      if (bytes.length < from + 2 || bytes(from) != 'P' || bytes(from + 1) != '6')
        return None
      i = from + 2
      for {
        w <- int() if w > 0 && w <= (1 << 14)
        h <- int() if h > 0 && h <= (1 << 14)
        m <- int() if m > 0 && m <= 255
        // exactly one whitespace byte separates maxval from raster data
        _ <- if (i < bytes.length &&
              (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\r' ||
                bytes(i) == '\t')) Some(()) else None
        img <- if (bytes.length - (i + 1) >= w * h * 3)
            Some(Image(w, h, m,
              java.util.Arrays.copyOfRange(bytes, i + 1, i + 1 + w * h * 3)))
          else None
      } yield (img, i + 1 + img.width * img.height * 3)
    }

    /** Per-channel means + luma-strip features of one frame — the
      * feature path [[PpmDecoder]] and the video frame sampler share.
      */
    def features(img: Image, featureDim: Int): Array[Float] = {
      val n = img.width * img.height
      val sums = new Array[Long](3)
      var i = 0
      while (i < n * 3) { sums(i % 3) += img.pixels(i) & 0xff; i += 1 }
      val feats = new Array[Float](featureDim)
      var c = 0
      while (c < 3 && c < featureDim) {
        feats(c) = (sums(c).toDouble / n / img.maxval).toFloat
        c += 1
      }
      if (featureDim > 3) {
        val strip = resizeNearest(img, featureDim - 3, 1)
        var x = 0
        while (x < featureDim - 3) {
          val p = x * 3
          val luma = 0.299 * (strip.pixels(p) & 0xff) +
            0.587 * (strip.pixels(p + 1) & 0xff) +
            0.114 * (strip.pixels(p + 2) & 0xff)
          feats(3 + x) = (luma / img.maxval).toFloat
          x += 1
        }
      }
      feats
    }

    /** Encode (test fixtures + round-trip checks). */
    def encode(img: Image): Array[Byte] = {
      val header = s"P6\n${img.width} ${img.height}\n${img.maxval}\n"
        .getBytes("US-ASCII")
      header ++ img.pixels
    }

    /** Nearest-neighbor resize — the deterministic, seam-exact resampler
      * (src index = floor(dst · src/dst), integer math only).
      */
    def resizeNearest(img: Image, tw: Int, th: Int): Image = {
      require(tw > 0 && th > 0, s"target dims must be positive: $tw x $th")
      val out = new Array[Byte](tw * th * 3)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * img.height / th).toInt
        var x = 0
        while (x < tw) {
          val sx = (x.toLong * img.width / tw).toInt
          val s = (sy * img.width + sx) * 3
          val d = (y * tw + x) * 3
          out(d) = img.pixels(s); out(d + 1) = img.pixels(s + 1)
          out(d + 2) = img.pixels(s + 2)
          x += 1
        }
        y += 1
      }
      Image(tw, th, img.maxval, out)
    }
  }

  /** REAL decoder for P6 PPM payloads: parse → per-channel means
    * (exact integer sums, normalized by maxval) as features 0–2, then
    * luma means of a nearest-neighbor (featureDim−3)×1 thumbnail as the
    * rest — the parse/resize/feature path a production image pipeline
    * runs, on the one format this container can decode without native
    * codecs. Non-PPM payloads decode to format "unknown" with zero
    * features (a decode boundary must absorb crawl garbage, not throw).
    */
  final case class PpmDecoder(featureDim: Int = 4) extends MediaDecoder {
    require(featureDim >= 3, s"featureDim must be >= 3, got $featureDim")
    override def decode(payload: Array[Byte]): DecodedMedia =
      Ppm.parse(payload) match {
        case None =>
          DecodedMedia(payload.length.toLong, 0, 0, "unknown",
            new Array[Float](featureDim))
        case Some(img) =>
          DecodedMedia(payload.length.toLong, img.width, img.height, "ppm",
            Ppm.features(img, featureDim))
      }
  }

  /** Frame-concat VIDEO container: back-to-back P6 frames (the y4m-style
    * raw concatenation) — turns the video modality real the way [[Ppm]]
    * did images and [[Wav]] audio, with no native codec.
    */
  object Video {
    /** Walk the stream frame by frame; stops at the first malformed
      * frame (a decode boundary absorbs truncated crawl garbage — the
      * frames before the corruption still decode) or at `maxFrames`.
      */
    def parseFrames(bytes: Array[Byte], maxFrames: Int = 1024): Seq[Ppm.Image] =
      parseFramesEx(bytes, maxFrames)._1

    /** [[parseFrames]] plus a TRUNCATED flag: true iff the walk stopped
      * at `maxFrames` with bytes still remaining — a longer video must
      * stay distinguishable from one that is exactly `maxFrames` frames
      * (its reported n_frames, frame signatures and dedup decisions
      * otherwise silently alias). Trailing garbage after exactly
      * `maxFrames` frames also flags (the walker does not parse ahead to
      * find out); a flagged row is a "re-decode with a larger budget"
      * signal, not a precise frame count.
      */
    def parseFramesEx(bytes: Array[Byte],
                      maxFrames: Int = 1024): (Seq[Ppm.Image], Boolean) = {
      val out = Seq.newBuilder[Ppm.Image]
      var off = 0
      var n = 0
      var go = true
      while (go && n < maxFrames && off < bytes.length) {
        Ppm.parseAt(bytes, off) match {
          case Some((img, end)) => out += img; off = end; n += 1
          case None => go = false
        }
      }
      (out.result(), go && off < bytes.length)
    }

    /** Concatenate frames into one payload (fixtures + round trips). */
    def encode(frames: Seq[Ppm.Image]): Array[Byte] =
      frames.toArray.flatMap(Ppm.encode)
  }

  /** Minimal canonical-PCM WAV codec — the audio sibling of [[Ppm]]:
    * RIFF/WAVE header, one `fmt ` chunk (PCM, 16-bit), one `data`
    * chunk of little-endian int16 samples. Pure JVM; turns the AUDIO
    * modality real the same way PPM did images.
    */
  object Wav {
    final case class Audio(sampleRate: Int, channels: Int,
                           samples: Array[Short])

    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], i: Int, s: String): Boolean =
      b.length >= i + 4 && (0 until 4).forall(k => b(i + k) == s.charAt(k).toByte)

    /** Strict canonical-layout parser: RIFF..WAVE, fmt(16, PCM=1,
      * 16-bit), data. None on anything else — decode boundaries absorb
      * crawl garbage, never throw.
      */
    def parse(bytes: Array[Byte]): Option[Audio] = {
      if (bytes.length < 44 || !tag(bytes, 0, "RIFF") ||
        !tag(bytes, 8, "WAVE") || !tag(bytes, 12, "fmt ")) return None
      if (le32(bytes, 16) != 16 || le16(bytes, 20) != 1) return None
      val channels = le16(bytes, 22)
      val rate = le32(bytes, 24)
      if (le16(bytes, 34) != 16 || !tag(bytes, 36, "data")) return None
      val nBytes = le32(bytes, 40)
      if (channels < 1 || rate <= 0 || nBytes < 0 ||
        bytes.length < 44 + nBytes || nBytes % 2 != 0) return None
      val samples = new Array[Short](nBytes / 2)
      var j = 0
      while (j < samples.length) {
        samples(j) = le16(bytes, 44 + 2 * j).toShort
        j += 1
      }
      Some(Audio(rate, channels, samples))
    }

    /** Encode (test fixtures + round-trip checks). */
    def encode(a: Audio): Array[Byte] = {
      val n = a.samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
        .putShort(a.channels.toShort).putInt(a.sampleRate)
        .putInt(a.sampleRate * a.channels * 2)
        .putShort((a.channels * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(n)
      a.samples.foreach(out.putShort)
      out.array()
    }
  }

  /** REAL decoder for canonical PCM WAV payloads: parse → signal
    * features — RMS (exact integer sum of squares, one final
    * sqrt/round), zero-crossing count (sign changes over (s ≥ 0)), and
    * peak |sample| normalized — the level/energy triage an audio
    * curation pipeline gates on before expensive transcription.
    * features = [rms/32768, zcross/n, peak/32768, duration·10⁻³]
    * truncated/padded to `featureDim`. Non-WAV payloads decode to
    * "unknown" with zero features. width/height carry sampleRate and
    * sample count (the meta slots; a media record is format-tagged).
    */
  final case class WavDecoder(featureDim: Int = 4) extends MediaDecoder {
    override def decode(payload: Array[Byte]): DecodedMedia =
      Wav.parse(payload) match {
        case None =>
          DecodedMedia(payload.length.toLong, 0, 0, "unknown",
            new Array[Float](featureDim))
        case Some(a) =>
          val n = a.samples.length
          var ss = 0L
          var zc = 0L
          var peak = 0L
          var j = 0
          while (j < n) {
            val s = a.samples(j).toLong
            ss += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            if (j > 0 && (a.samples(j) >= 0) != (a.samples(j - 1) >= 0)) zc += 1
            j += 1
          }
          val feats = new Array[Float](featureDim)
          if (n > 0) {
            if (featureDim > 0)
              feats(0) = (math.sqrt(ss.toDouble / n) / 32768.0).toFloat
            if (featureDim > 1) feats(1) = (zc.toDouble / n).toFloat
            if (featureDim > 2) feats(2) = (peak.toDouble / 32768.0).toFloat
            if (featureDim > 3)
              feats(3) = (n.toDouble / a.sampleRate / a.channels).toFloat
          }
          DecodedMedia(payload.length.toLong, a.sampleRate, n, "wav", feats)
      }
  }

  private val decodedSchema = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Append decoded columns via `mapPartitions` — decoder opened once per
    * partition, rows streamed through (no collect, no shuffle); the Scala
    * analogue of a pandas `mapInPandas` decode stage. Output adds a
    * `decoded` struct column with the [[DecodedMedia]] fields.
    */
  def decodePartitioned(df: DataFrame, binCol: String,
                        decoder: MediaDecoder): DataFrame = {
    val schema = df.schema.add("decoded", decodedSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      decoder.open()
      rows.map { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val d = decoder.decode(payload)
        Row.fromSeq(r.toSeq :+ Row(d.nBytes, d.width, d.height, d.format,
          d.features.toSeq))
      }
    }(Encoders.row(schema))
  }

  private val frameSchema = StructType(Seq(
    StructField("n_frames", IntegerType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("truncated", BooleanType)))

  /** Decode the frame-concat video column and keep every `every`-th
    * frame (indices 0, every, 2·every, …) — the frame-sampling stage a
    * video-curation pipeline runs before per-frame embedding/dedup. One
    * OUTPUT row per sampled frame (input row columns ride along, plus a
    * `frame` struct); `mapPartitions` + flatMap, rows streamed, no
    * shuffle — only the sampled frames' features materialize, never the
    * raster. Malformed/empty payloads contribute zero rows (the decode
    * boundary absorbs crawl garbage).
    *
    * Decoding stops at `maxFrames` frames; `frame.truncated` is true on
    * every row of a video that hit the budget with bytes remaining
    * (`Video.parseFramesEx`) — n_frames then reports the DECODED count,
    * and downstream consumers (signatures, dedup) must not treat the
    * video as exactly-n_frames long.
    */
  def frameSampled(df: DataFrame, binCol: String, every: Int,
                   featureDim: Int = 3, maxFrames: Int = 1024): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val schema = df.schema.add("frame", frameSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val (frames, truncated) = Video.parseFramesEx(payload, maxFrames)
        Iterator.range(0, frames.length, every).map { f =>
          val img = frames(f)
          Row.fromSeq(r.toSeq :+ Row(frames.length, f, img.width, img.height,
            Ppm.features(img, featureDim).toSeq, truncated))
        }
      }
    }(Encoders.row(schema))
  }

  private val frameSigSchema = StructType(Seq(
    StructField("n_frames", IntegerType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("s0", LongType),
    StructField("s1", LongType),
    StructField("s2", LongType),
    StructField("truncated", BooleanType)))

  /** Sampled-frame SIGNATURES: one row per every-`every`-th frame with
    * EXACT integer per-channel pixel sums (s0, s1, s2) — the discrete,
    * engine-exact join key frame-level dedup matches on (a float mean
    * would need a lossy quantization step; the integer sum needs none).
    * Same streaming mapPartitions boundary as [[frameSampled]]: rasters
    * are decoded and reduced in place, only (dims, 3 longs) per sampled
    * frame ever leaves the partition.
    */
  def frameSignatures(df: DataFrame, binCol: String, every: Int = 2,
                      maxFrames: Int = 1024): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    val schema = df.schema.add("sig", frameSigSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val (frames, truncated) = Video.parseFramesEx(payload, maxFrames)
        Iterator.range(0, frames.length, every).map { f =>
          val img = frames(f)
          val sums = new Array[Long](3)
          var i = 0
          val n3 = img.width * img.height * 3
          while (i < n3) { sums(i % 3) += img.pixels(i) & 0xff; i += 1 }
          Row.fromSeq(r.toSeq :+ Row(frames.length, f, img.width, img.height,
            sums(0), sums(1), sums(2), truncated))
        }
      }
    }(Encoders.row(schema))
  }

  /** Video near-dup pairs: (id_a, id_b, n_shared) for videos sharing
    * ≥ `minShared` sampled-frame signatures — [[frameSignatures]] into
    * `Dedup.sharedSigPairs`, so the pair generation carries the SAME
    * hot-bucket cap as text LSH (`Dedup.DefaultMaxBucket`): a
    * corpus-wide shared frame (platform intro bumper — the video
    * analogue of boilerplate text) routes as linear star pairs against
    * the bucket-min video instead of an m²/2 blow-up on one reducer,
    * and the verify join then scores every candidate by its TRUE shared
    * count. Signature key = (frame_idx, width, height, s0, s1, s2);
    * only those tuples shuffle, never a raster.
    */
  def frameSigPairs(df: DataFrame, idCol: String, binCol: String,
                    every: Int = 2, minShared: Int = 2,
                    maxBucket: Int = Dedup.DefaultMaxBucket,
                    maxFrames: Int = 1024): DataFrame = {
    val sigs = frameSignatures(df.select(col(idCol), col(binCol)), binCol,
        every, maxFrames)
      .select(col(idCol), col("sig.frame_idx").as("__f"),
        col("sig.width").as("__w"), col("sig.height").as("__h"),
        col("sig.s0").as("__s0"), col("sig.s1").as("__s1"),
        col("sig.s2").as("__s2"))
    Dedup.sharedSigPairs(sigs, idCol,
      Seq("__f", "__w", "__h", "__s0", "__s1", "__s2"), minShared, maxBucket)
  }

  private val imageTileSigSchema = StructType(Seq(
    StructField("tile_idx", IntegerType),
    StructField("tile_w", IntegerType),
    StructField("tile_h", IntegerType),
    StructField("s0", LongType),
    StructField("s1", LongType),
    StructField("s2", LongType)))

  /** Image TILE signatures: each decodable PPM payload split into a
    * `grid`×`grid` tile lattice (boundaries floor(i·dim/grid) — the
    * resizeNearest seam rule, so equal-size images tile identically),
    * each tile reduced to EXACT integer per-channel pixel sums — the
    * image member of the discrete-signature family beside
    * [[frameSignatures]] (video) and [[audioWindowSignatures]] (audio).
    * A near-dup image (same art, local edit: caption strip, watermark
    * corner) keeps most tile sums intact while a whole-payload hash
    * (`q_media_dedup`'s exact tier) loses them all. Same mapPartitions
    * decode boundary: rasters reduce in place; only (tile meta, 3 longs)
    * rows leave the partition; non-PPM payloads contribute zero rows.
    */
  def imageTileSignatures(df: DataFrame, binCol: String,
                          grid: Int = 2): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val schema = df.schema.add("sig", imageTileSigSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        Ppm.parse(payload).iterator.flatMap { img =>
          Iterator.range(0, grid * grid).map { t =>
            val gy = t / grid
            val gx = t % grid
            val y0 = (gy.toLong * img.height / grid).toInt
            val y1 = ((gy + 1).toLong * img.height / grid).toInt
            val x0 = (gx.toLong * img.width / grid).toInt
            val x1 = ((gx + 1).toLong * img.width / grid).toInt
            val sums = new Array[Long](3)
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = (y * img.width + x) * 3
                sums(0) += img.pixels(p) & 0xff
                sums(1) += img.pixels(p + 1) & 0xff
                sums(2) += img.pixels(p + 2) & 0xff
                x += 1
              }
              y += 1
            }
            Row.fromSeq(r.toSeq :+ Row(t, x1 - x0, y1 - y0,
              sums(0), sums(1), sums(2)))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Image near-dup pairs: images sharing ≥ `minShared` tile signatures
    * — [[imageTileSignatures]] into `Dedup.sharedSigPairs`, so a
    * corpus-wide shared tile (letterbox bar, logo corner — the image
    * boilerplate) routes under the same hot-bucket cap as text LSH and
    * every candidate is verified at its TRUE shared-tile count.
    */
  def imageSigPairs(df: DataFrame, idCol: String, binCol: String,
                    grid: Int = 2, minShared: Int = 2,
                    maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val sigs = imageTileSignatures(df.select(col(idCol), col(binCol)),
        binCol, grid)
      .select(col(idCol), col("sig.tile_idx").as("__t"),
        col("sig.tile_w").as("__tw"), col("sig.tile_h").as("__th"),
        col("sig.s0").as("__s0"), col("sig.s1").as("__s1"),
        col("sig.s2").as("__s2"))
    Dedup.sharedSigPairs(sigs, idCol,
      Seq("__t", "__tw", "__th", "__s0", "__s1", "__s2"), minShared,
      maxBucket)
  }

  /** 64-bit difference hash (dHash — the perceptual-hash workhorse of
    * image dedup pipelines): nearest-neighbor resize to 9×8
    * ([[Ppm.resizeNearest]], integer seam rule), INTEGER luma
    * 299·r + 587·g + 114·b per pixel (the BT.601 weights ×1000 — exact
    * integers, no float anywhere), bit (y, x) = luma(y, x) < luma(y, x+1)
    * (strict; ties → 0, deterministic), packed row-major MSB-first.
    * Robust to uniform brightness/contrast shifts and small local edits
    * (each changed pixel flips ≤ 2 bits) — the property the exact
    * tile-sum tier ([[imageTileSignatures]]) doesn't have.
    */
  def dhash64(img: Ppm.Image): Long = {
    val r = Ppm.resizeNearest(img, 9, 8)
    def luma(x: Int, y: Int): Long = {
      val p = (y * 9 + x) * 3
      299L * (r.pixels(p) & 0xff) + 587L * (r.pixels(p + 1) & 0xff) +
        114L * (r.pixels(p + 2) & 0xff)
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        h = (h << 1) | (if (luma(x, y) < luma(x + 1, y)) 1L else 0L)
        x += 1
      }
      y += 1
    }
    h
  }

  private val dhashSchema = StructType(Seq(
    StructField("dhash", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Append a `dh` struct (dhash, width, height) per decodable PPM
    * payload — mapPartitions decode boundary; non-PPM payloads
    * contribute zero rows (crawl garbage absorbs).
    */
  def dhashed(df: DataFrame, binCol: String): DataFrame = {
    val schema = df.schema.add("dh", dhashSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        Ppm.parse(payload).iterator.map { img =>
          Row.fromSeq(r.toSeq :+ Row(dhash64(img), img.width, img.height))
        }
      }
    }(Encoders.row(schema))
  }

  /** Perceptual near-dup pairs: images whose dHashes are within
    * `maxHamming` bits — the SimHash discipline applied to rasters.
    * Candidates come from exact 16-bit BAND matches (4 bands; by
    * pigeonhole any pair within hamming ≤ 3 shares at least one exact
    * band, so recall is GUARANTEED at the default threshold), routed
    * through `Dedup.cappedPairsByKey` — a corpus-wide hot band (solid
    * backgrounds collapse to few distinct hashes) routes as linear star
    * pairs; the verify join then scores every candidate with the exact
    * `bit_count(a XOR b)` hamming, so banding affects WHICH pairs are
    * examined, never what a reported pair means. Returns
    * (id_a, id_b, hamming).
    */
  def dhashNearDups(df: DataFrame, idCol: String, binCol: String,
                    maxHamming: Int = 3, bands: Int = 4,
                    maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val hashes = dhashed(df.select(col(idCol), col(binCol)), binCol)
      .select(col(idCol), col("dh.dhash").as("__h"))
      .localCheckpoint(false) // banding + both verify sides
    dhashPairsFromHashes(hashes, idCol, maxHamming, bands, maxBucket)
  }

  /** [[dhashNearDups]] from an already-hashed (id, __h) table — the
    * band-candidate + exact-hamming-verify stage alone, shared with the
    * streaming image ingest (which hashes once per micro-batch and
    * must not re-decode). Caller owns materialization of `hashes`
    * (three consumers: banding + both verify sides).
    */
  def dhashPairsFromHashes(hashes: DataFrame, idCol: String,
                           maxHamming: Int = 3, bands: Int = 4,
                           maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"$bands-band candidates guarantee recall only for maxHamming <= " +
        s"${bands - 1}, got $maxHamming (raise the band count to go looser)")
    val banded = bandedHashes(hashes, idCol, bands)
    val cands = Dedup.cappedPairsByKey(banded, idCol,
      Seq("band_idx", "bv"), maxBucket)
    cands
      .join(hashes.toDF("id_a", "__ha"), Seq("id_a"))
      .join(hashes.toDF("id_b", "__hb"), Seq("id_b"))
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Explode a 64-bit hash column `__h` into `bands` fixed-width band
    * values: (id, band_idx, bv) — the pigeonhole candidate key.
    */
  def bandedHashes(hashes: DataFrame, idCol: String, bands: Int): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    hashes.select(col(idCol),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("__h"), 64 - width * (b + 1)).bitwiseAND(lit(mask))): _*))
        .as(Seq("band_idx", "bv")))
  }

  /** dHash threshold-tuning sweep — the perceptual sibling of
    * `Dedup.nearDupThresholdSweep`: the hamming histogram of all pairs
    * within `maxHamming` (8×8-bit bands by default — pigeonhole-complete
    * to 7) with the running "pairs kept at threshold ≤ h" count; a
    * bimodal histogram separates true re-encodes from band-collision
    * noise, and the knee picks the production threshold from data. The
    * histogram is ≤ maxHamming+1 rows whatever the corpus size, so the
    * final running-sum window is driver-cheap.
    */
  def dhashSweep(df: DataFrame, idCol: String, binCol: String,
                 maxHamming: Int = 7, bands: Int = 8,
                 maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val pairs = dhashNearDups(df, idCol, binCol, maxHamming, bands, maxBucket)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("hamming"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    pairs.groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
      .withColumn("n_kept_at_h", sum(col("n_pairs")).over(w))
  }

  private val audioSigSchema = StructType(Seq(
    StructField("n_windows", IntegerType),
    StructField("win_idx", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("wsum", LongType),
    StructField("wabs", LongType)))

  /** Audio WINDOW signatures: the WAV payload split into fixed
    * `winSize`-sample windows, each reduced to EXACT integer sums —
    * (Σ samples, Σ |samples|) — the audio sibling of
    * [[frameSignatures]] (a trailing partial window is dropped: a
    * signature over fewer samples would collide across lengths). Same
    * mapPartitions decode boundary; only (win_idx, 2 longs) per window
    * leaves the partition, never PCM.
    */
  def audioWindowSignatures(df: DataFrame, binCol: String,
                            winSize: Int = 16): DataFrame = {
    require(winSize >= 1, s"winSize must be >= 1, got $winSize")
    val schema = df.schema.add("sig", audioSigSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        Wav.parse(payload).iterator.flatMap { a =>
          val nw = a.samples.length / winSize
          Iterator.range(0, nw).map { w =>
            var s = 0L
            var ab = 0L
            var j = w * winSize
            val end = j + winSize
            while (j < end) {
              val x = a.samples(j).toLong
              s += x
              ab += math.abs(x)
              j += 1
            }
            Row.fromSeq(r.toSeq :+ Row(nw, w, a.sampleRate, s, ab))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Audio ENERGY segmentation (voice-activity-detection shape): windows
    * whose Σ|samples| ≥ `minAbsSum` are ACTIVE; maximal runs of
    * consecutive active windows become segments — the pre-transcription
    * triage an audio curation pipeline runs (transcribe speech segments,
    * skip silence). Integer threshold on the exact window sums, so the
    * gate is engine-exact. Returns one row per segment:
    * (id cols…, seg_start, seg_end, n_windows, sum_abs).
    *
    * Scale shape: the islands trick (win_idx − per-clip rank of active
    * windows) needs one window partitioned BY CLIP — state bounded by
    * windows-per-clip, never corpus-wide — then a map-side-combinable
    * group; PCM never leaves the decode boundary.
    */
  def audioEnergySegments(df: DataFrame, idCol: String, binCol: String,
                          winSize: Int = 16,
                          minAbsSum: Long = 16L * 16384): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__w"))
    audioWindowSignatures(df.select(col(idCol), col(binCol)), binCol, winSize)
      .select(col(idCol), col("sig.win_idx").as("__w"),
        col("sig.wabs").as("__wa"))
      .filter(col("__wa") >= minAbsSum)
      .withColumn("__grp", col("__w") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__w")).as("seg_start"), max(col("__w")).as("seg_end"),
        count(lit(1)).as("n_windows"), sum(col("__wa")).as("sum_abs"))
      .drop("__grp")
  }

  /** Video SHOT detection: consecutive-frame signature distance (integer
    * L1 over the exact channel sums) above `threshold` opens a new shot;
    * frames between boundaries group into (shot_idx, start/end frame,
    * n_frames) — the scene-segmentation stage a video pipeline runs
    * before per-shot sampling/captioning. Decodes EVERY frame
    * (`every = 1`); the cut metric is integer-exact so both engines
    * place identical boundaries.
    *
    * Scale shape: two per-VIDEO windows (lag for the cut flag, running
    * sum for the shot index) — state bounded by frames-per-video — then
    * one map-side-combinable group; rasters reduce inside the decode
    * boundary.
    */
  def videoShots(df: DataFrame, idCol: String, binCol: String,
                 threshold: Long = 100L,
                 maxFrames: Int = 1024): DataFrame =
    shotIndexedFrames(df, idCol, binCol, threshold, maxFrames)
      .groupBy(col(idCol), col("shot_idx"))
      .agg(min(col("__f")).as("start_frame"), max(col("__f")).as("end_frame"),
        count(lit(1)).as("n_frames"))

  /** Per-frame rows with their shot index — the shared detection stage
    * behind [[videoShots]] (boundary rollup) and [[shotSignatures]]
    * (content rollup): integer L1 lag distance over the exact channel
    * sums opens a shot above `threshold`; running cut-sum numbers the
    * shots. Two bounded per-VIDEO windows, state = frames-per-video.
    */
  private def shotIndexedFrames(df: DataFrame, idCol: String, binCol: String,
                                threshold: Long, maxFrames: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__f"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    frameSignatures(df.select(col(idCol), col(binCol)), binCol,
        every = 1, maxFrames)
      .select(col(idCol), col("sig.frame_idx").as("__f"),
        col("sig.s0").as("__s0"), col("sig.s1").as("__s1"),
        col("sig.s2").as("__s2"))
      .withColumn("__cut",
        when(col("__f") === 0, lit(1L)).otherwise(
          when(abs(col("__s0") - lag(col("__s0"), 1).over(w)) +
            abs(col("__s1") - lag(col("__s1"), 1).over(w)) +
            abs(col("__s2") - lag(col("__s2"), 1).over(w)) > threshold,
            1L).otherwise(0L)))
      .withColumn("shot_idx", sum(col("__cut")).over(cum) - 1)
  }

  /** Shot-level CONTENT signatures: [[videoShots]] boundaries, each shot
    * reduced to (n_frames, exact channel sums over ALL its frames) —
    * deliberately NO positional component, so a re-cut video (shots
    * re-ordered, a trimmed or inserted prefix) still matches
    * shot-for-shot where index-aligned frame matching
    * ([[frameSigPairs]] keys on frame_idx) loses every pair. One row
    * per (video, shot): (id, shot_idx, n_frames, t0, t1, t2).
    */
  def shotSignatures(df: DataFrame, idCol: String, binCol: String,
                     threshold: Long = 100L,
                     maxFrames: Int = 1024): DataFrame =
    shotIndexedFrames(df, idCol, binCol, threshold, maxFrames)
      .groupBy(col(idCol), col("shot_idx"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("__s0")).as("t0"), sum(col("__s1")).as("t1"),
        sum(col("__s2")).as("t2"))

  /** Shot-level video near-dup pairs: videos sharing ≥ `minShared`
    * DISTINCT shot contents — [[shotSignatures]] into
    * `Dedup.sharedSigPairs` keyed on (n_frames, t0, t1, t2) with NO
    * shot index, the re-cut-robust twin of [[frameSigPairs]]: a video
    * whose shared shots sit at different positions (platform intro
    * inserted, opening trimmed) still pairs, because shots match by
    * content alone. Within-video repeats collapse to one signature row
    * first (sharedSigPairs needs (key, id) distinct; n_shared counts
    * distinct shared shot contents, not occurrences). Same hot-bucket
    * cap discipline: a corpus-wide shot (platform bumper) routes as
    * linear star pairs, then true distinct-shot counts verify each
    * candidate.
    */
  def shotSigPairs(df: DataFrame, idCol: String, binCol: String,
                   threshold: Long = 100L, minShared: Int = 2,
                   maxBucket: Int = Dedup.DefaultMaxBucket,
                   maxFrames: Int = 1024): DataFrame = {
    val sigs = shotSignatures(df, idCol, binCol, threshold, maxFrames)
      .select(col(idCol), col("n_frames").as("__nf"), col("t0").as("__t0"),
        col("t1").as("__t1"), col("t2").as("__t2"))
      .distinct()
    Dedup.sharedSigPairs(sigs, idCol, Seq("__nf", "__t0", "__t1", "__t2"),
      minShared, maxBucket)
  }

  /** Audio near-dup pairs: clips sharing ≥ `minShared` window signatures
    * — [[audioWindowSignatures]] into `Dedup.sharedSigPairs`, completing
    * image/video/audio parity in the capped pairwise family. A
    * corpus-wide shared window (station jingle, silence — the audio
    * boilerplate) routes as linear star pairs under the same
    * `Dedup.DefaultMaxBucket` cap, then every candidate is verified by
    * its true shared-window count.
    */
  def audioSigPairs(df: DataFrame, idCol: String, binCol: String,
                    winSize: Int = 16, minShared: Int = 2,
                    maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val sigs = audioWindowSignatures(df.select(col(idCol), col(binCol)),
        binCol, winSize)
      .select(col(idCol), col("sig.win_idx").as("__w"),
        col("sig.wsum").as("__ws"), col("sig.wabs").as("__wa"))
    Dedup.sharedSigPairs(sigs, idCol, Seq("__w", "__ws", "__wa"),
      minShared, maxBucket)
  }

  /** Segment-GATED audio near-dup pairs: [[audioSigPairs]] restricted to
    * windows inside qualifying energy segments — the
    * [[audioEnergySegments]] gate composed INTO candidate generation, so
    * corpus-wide silence windows (every clip's zero-PCM window w is an
    * identical signature — the worst boilerplate bucket audio has) never
    * enter the pair engine at all, and isolated sub-`minSegWindows`
    * blips (clicks, pops) are excluded with them. Gating is the same
    * islands computation audioEnergySegments runs, kept at WINDOW
    * granularity: active filter (Σ|samples| ≥ `minAbsSum`), run key
    * (win − per-clip rank), then a per-(clip, run) count window —
    * bounded by windows-per-clip — instead of a range join back against
    * materialized segments. Precision first, and strictly fewer
    * candidates: silence contributes neither pairs nor n_shared.
    */
  def activeAudioSigPairs(df: DataFrame, idCol: String, binCol: String,
                          winSize: Int = 16,
                          minAbsSum: Long = 16L * 16384,
                          minSegWindows: Int = 2, minShared: Int = 2,
                          maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    require(minSegWindows >= 1,
      s"minSegWindows must be >= 1, got $minSegWindows")
    val byClip = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__w"))
    val gated = audioWindowSignatures(df.select(col(idCol), col(binCol)),
        binCol, winSize)
      .select(col(idCol), col("sig.win_idx").as("__w"),
        col("sig.wsum").as("__ws"), col("sig.wabs").as("__wa"))
      .filter(col("__wa") >= minAbsSum)
      .withColumn("__grp", col("__w") - row_number().over(byClip))
      .withColumn("__segn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol), col("__grp"))))
      .filter(col("__segn") >= minSegWindows)
      .select(col(idCol), col("__w"), col("__ws"), col("__wa"))
    Dedup.sharedSigPairs(gated, idCol, Seq("__w", "__ws", "__wa"),
      minShared, maxBucket)
  }
}
