package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-asset plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side plumbing (schema, batched per-partition processing,
  * deterministic partitioning, output shapes) is real and tested; the
  * actual codecs are NOT available in this container, so the decode step
  * is a clearly-marked deterministic stub ([[StubCodec]]) behind the
  * [[Codec]] interface — swap in a real JNI/FFmpeg-backed codec at
  * deployment without touching the pipeline.
  */
object MultiModal {

  final case class Asset(
      asset_id: Long,
      kind: String,              // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,                // typed metadata (0 when n/a)
      height: Int,
      duration_ms: Long)

  final case class Features(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])   // fixed-length feature vector

  final case class Frame(
      asset_id: Long,
      frame_idx: Int,
      offset: Long,
      frame_bytes: Array[Byte])

  /** Pluggable decode step. Real implementations would wrap an image /
    * audio / video library; not present in this container. */
  trait Codec extends Serializable {
    def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB codec — deterministic fake decode: a byte-histogram folded to
    * `dim` buckets and L1-normalized. Stands in for the real decoder
    * (``???`` at deployment boundaries); keeps every pipeline test and
    * batch-shape property real. */
  object StubCodec extends Codec {
    def decodeFeatures(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { acc((bytes(i) & 0xFF) % dim) += 1f; i += 1 }
      val total = math.max(1f, bytes.length.toFloat)
      acc.map(_ / total)
    }
  }

  /** Synthesize a deterministic asset table from any (id, text) frame —
    * bytes are the utf-8 payload (an opaque stand-in), kind cycles by a
    * PORTABLE hash (md5-derived h64, so the DuckDB oracle reproduces the
    * kind assignment and with it the whole decode pipeline), metadata
    * derived from length. */
  def syntheticAssets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def h(salt: String) =
      graft.text.TextOps.h64(concat_ws(":", col("doc_id"), lit(salt)))
    docs.select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(h("kind"), lit(3)) + 1).cast("int")).as("kind"),
        encode(col("text"), "utf-8").as("bytes"),
        (pmod(h("w"), lit(1920)) + 16).cast("int").as("width"),
        (pmod(h("h"), lit(1080)) + 16).cast("int").as("height"),
        (length(col("text")) * 40L).as("duration_ms"))
      .as[Asset]
  }

  /** Batched per-partition decode → fixed-length features. mapPartitions
    * so a real codec amortizes per-batch init (model load, decoder ctx) —
    * the same batch shape a Pandas-UDF/mapInPandas deployment would use. */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16,
      codec: Codec = StubCodec): Dataset[Features] = {
    implicit val enc = Encoders.product[Features]
    assets.mapPartitions { it =>
      it.map { a =>
        Features(a.asset_id, a.kind, a.bytes.length.toLong,
          codec.decodeFeatures(a.kind, a.bytes, dim))
      }
    }
  }

  /** Frame sampling for video-kind assets: every `stride` bytes emit a
    * `frameLen`-byte slice (the real pipeline would seek keyframes; the
    * offsets/batching/explode shape is identical). */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 64, frameLen: Int = 16): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    assets.filter(_.kind == "video").flatMap { a =>
      (0 until a.bytes.length by stride).zipWithIndex.map { case (off, idx) =>
        Frame(a.asset_id, idx, off.toLong,
          a.bytes.slice(off, math.min(off + frameLen, a.bytes.length)))
      }
    }
  }
}
