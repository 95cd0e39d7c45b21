package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
