package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2 Group I, I4): image/audio/video as
  * opaque `BINARY` payloads + typed metadata structs — the direct
  * generalization of the reference's bytes/base64 artifact codec (C1).
  *
  * The actual media decode (JPEG/PNG/audio codecs) is STUBBED — no image or
  * audio libraries exist in this offline container. Every stub is
  * deterministic (derived from payload bytes) so the Spark-side plumbing —
  * schema, per-partition batch iteration, partitioning, feature shapes — is
  * real and testable; swap `StubCodecs` for a real codec binding in
  * production.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("duration_ms", LongType))))))

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real implementation decodes the container header here. The geometry
    * constants are shared with the i4 query + its oracle SQL (LlmOps) —
    * one definition, three consumers. */
  object StubCodecs {
    val SizeBase = 64
    val WidthMod = 577
    val HeightDiv = 7
    val HeightMod = 431

    def decodeMeta(payload: Array[Byte]): (Int, Int, Int, Long) = {
      val n = payload.length
      val w = SizeBase + (n % WidthMod)
      val h = SizeBase + ((n / HeightDiv) % HeightMod)
      (w, h, 3, n.toLong) // width, height, channels, fake duration
    }

    /** STUB feature extraction: 8 deterministic moments over byte windows —
      * stands in for a CNN/audio embedding. Real impl: model inference per
      * batch. */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      val norm = payload.length.toFloat / dim
      (0 until dim).foreach(j => out(j) /= norm)
      out
    }

    /** STUB resize: keeps a deterministic byte subsample standing in for a
      * pixel-domain downscale. */
    def resize(payload: Array[Byte], factor: Int): Array[Byte] =
      payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }

    /** STUB frame sampling: fixed-stride offsets standing in for video
      * keyframe extraction. */
    def sampleFrameOffsets(payloadLen: Long, everyMs: Long): Seq[Long] =
      (0L until payloadLen by Math.max(everyMs, 1L)).take(32)
  }

  /** Wrap a text/doc table as a media table (payload = UTF-8 bytes): the
    * fixture path used by tests and the oracle queries. */
  def docsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("application/octet-stream").as("mime"),
      encode(col("text"), "UTF-8").as("payload"))

  /** I4c — payload resize (downscale stand-in): same per-partition batch
    * shape as [[extractFeatures]]; output keeps the original columns with
    * the payload replaced and the resize factor recorded. */
  def resizePayloads(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1: $factor")
    val spark = media.sparkSession
    val payloadIdx = media.schema.fieldIndex("payload")
    val outSchema = StructType(
      media.schema.fields.patch(payloadIdx,
        Seq(StructField("payload", BinaryType, nullable = false)), 1) :+
        StructField("resize_factor", IntegerType, nullable = false))
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val resized = StubCodecs.resize(r.getAs[Array[Byte]](payloadIdx), factor)
        Row.fromSeq(r.toSeq.updated(payloadIdx, resized) :+ factor)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** I4d — frame sampling (video keyframe stand-in): one output row per
    * sampled offset, exploded from each payload. posexplode indexes each
    * payload's (already-ordered) offsets directly — a window would add a
    * shuffle and mis-number duplicate media ids. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    val offsets = udf((payload: Array[Byte]) =>
      StubCodecs.sampleFrameOffsets(payload.length.toLong, everyMs))
    media.select(col("*"),
      posexplode(offsets(col("payload"))).as(Seq("frame_idx", "frame_offset")))
  }

  /** Decode + feature-extract over per-partition batches (the
    * `mapInPandas`-equivalent shape in Scala: one iterator pass per
    * partition, vectorizable batch body). */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("duration_ms", LongType),
      StructField("features", ArrayType(FloatType))))
    val payloadIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (w, h, c, d) = StubCodecs.decodeMeta(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c, d, StubCodecs.features(payload, dim).toSeq))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
