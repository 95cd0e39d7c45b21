package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed, deterministic metadata extraction.
  *
  * The decode step is STUBBED — this container has no image/audio codecs,
  * so "decoding" derives metadata and features from the bytes' md5
  * deterministically. Everything around the stub is real and tested: the
  * binary schema, per-row columnar compute (no shuffle), and the feature
  * projection shape. A real deployment swaps `fakeDecodeMeta` /
  * `fakeFeatures` for a per-partition native decoder (mapPartitions with
  * a lazily-initialized codec), keeping this exact schema.
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
}
