package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus the operators a training-data pipeline runs over
  * them — decode, feature-extract, resize, frame-sample.
  *
  * The Spark-side plumbing is real and load-bearing: fixed schemas,
  * `Dataset[T]` with binary columns, partition-wise batched processing
  * (`mapPartitions` — the JVM analogue of `mapInPandas` batch shape),
  * explode for frame fan-out, and features that feed straight into
  * [[graft.vector.VectorSearch]]. The DECODERS are deterministic stubs:
  * this container has no image/audio codecs, so payloads carry a
  * synthetic `GRFT` header (`makePayload`) and `decode*` parses it. A
  * real deployment swaps `decodeImageStub` for a JPEG/PNG decoder with
  * the SAME signature — nothing else changes.
  *
  * Scale posture: payloads never leave their partition (map-only until an
  * explicit shuffle), feature vectors are the only thing that flows into
  * joins, and per-row memory is one payload — a 100 TB media corpus
  * streams through with executor memory bounded by batch size.
  */
object Multimodal {

  val Magic = "GRFT".getBytes("UTF-8")

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
      nFrames: Int, format: String)

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedRow(media_id: Long, kind: String,
      width: Int, height: Int, sample_rate: Int, n_frames: Int,
      format: String, body_bytes: Int)

  final case class MediaFeature(media_id: Long, kind: String,
      embedding: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  // ---- synthetic payload (test/fixture generator) -----------------------
  /** GRFT header: magic(4) | kind(1) | width(4) | height(4) | rate(4) |
    * frames(4) | body — big-endian ints, deterministic body from id.
    */
  def makePayload(id: Long, kind: String, width: Int, height: Int,
      sampleRate: Int, nFrames: Int, bodyLen: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(21 + bodyLen)
    buf.put(Magic).put(kindByte(kind))
      .putInt(width).putInt(height).putInt(sampleRate).putInt(nFrames)
    var i = 0
    var h = id * 2654435761L + 1013904223L
    while (i < bodyLen) {
      h = h * 6364136223846793005L + 1442695040888963407L
      buf.put((h >>> 56).toByte)
      i += 1
    }
    buf.array()
  }

  private def kindByte(kind: String): Byte = kind match {
    case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
  }

  private def kindName(b: Byte): String = b match {
    case 1 => "image"; case 2 => "audio"; case 3 => "video"; case _ => "unknown"
  }

  // ---- decode ------------------------------------------------------------
  /** STUB decoder: parses the GRFT header. A real image/audio decoder
    * (javax.imageio / ffmpeg bindings) drops in here with the same
    * signature — bytes in, typed meta out.
    */
  def decodeStub(payload: Array[Byte]): Option[(String, MediaMeta, Int)] = {
    if (payload.length < 21 || !payload.startsWith(Magic)) None
    else {
      val buf = java.nio.ByteBuffer.wrap(payload, 4, 17)
      val kind = kindName(buf.get())
      val meta = MediaMeta(buf.getInt, buf.getInt, buf.getInt, buf.getInt, "grft")
      Some((kind, meta, payload.length - 21))
    }
  }

  /** Batch decode: one partition pass, corrupt payloads dropped (the
    * permissive-nulls posture of the ingest edge).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeStub(r.payload).map { case (kind, m, body) =>
        DecodedRow(r.media_id, kind, m.width, m.height, m.sampleRate,
          m.nFrames, m.format, body)
      }
    })
  }

  // ---- feature extraction -------------------------------------------------
  /** STUB feature extractor: deterministic byte-histogram projection to a
    * `dim`-float embedding (unit-normalized). A real model (ONNX vision
    * encoder) replaces the body of `embed` — batch shape and output
    * schema stay identical, and the output feeds VectorSearch directly.
    */
  def embed(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var i = 21 // skip header
    while (i < payload.length) {
      val b = payload(i) & 0xff
      acc(b % dim) += 1.0
      acc((b * 31 + i) % dim) += 0.5
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += acc(j) * acc(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    acc.map(x => (x * inv).toFloat)
  }

  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r =>
      MediaFeature(r.media_id, r.kind, embed(r.payload, dim))))
  }

  // ---- image resize ---------------------------------------------------------
  /** STUB resize: rewrites the header dims and subsamples the body at the
    * area ratio — stands in for a real scaler, byte-shape realistic.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      decodeStub(r.payload) match {
        case Some((kind, m, body)) if kind == "image" =>
          val ratio = math.max(1, (m.width.toLong * m.height /
            math.max(1L, w.toLong * h)).toInt)
          val newBody = (21 until r.payload.length by ratio)
            .map(r.payload).toArray
          val out = makePayload(0, kind, w, h, m.sampleRate, m.nFrames, 0) ++ newBody
          MediaRow(r.media_id, r.kind, out)
        case _ => r
      }
    })
  }

  // ---- video frame sampling ---------------------------------------------------
  /** Split the body into n_frames equal chunks, keep every Nth — one row
    * per sampled frame (the explode fan-out a caption/embedding stage
    * consumes). Real plumbing; chunking stands in for codec keyframes.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      decodeStub(r.payload) match {
        case Some((kind, m, bodyLen)) if kind == "video" && m.nFrames > 0 =>
          val frameSize = math.max(1, bodyLen / m.nFrames)
          (0 until m.nFrames by everyN).iterator.map { f =>
            val from = 21 + f * frameSize
            val until = math.min(21 + (f + 1) * frameSize, r.payload.length)
            Frame(r.media_id, f,
              java.util.Arrays.copyOfRange(r.payload, from, math.max(from, until)))
          }
        case _ => Iterator.empty
      }
    })
  }

  /** Fixture table: deterministic mixed-kind media frame. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = kind match {
        case "image" => makePayload(id, kind, 64 + (id % 8).toInt * 16,
          48 + (id % 5).toInt * 16, 0, 1, 256 + (id % 128).toInt)
        case "audio" => makePayload(id, kind, 0, 0, 16000, 0,
          512 + (id % 256).toInt)
        case _ => makePayload(id, kind, 32, 24, 0, 8 + (id % 5).toInt,
          800 + (id % 100).toInt)
      }
      MediaRow(id, kind, payload)
    }
  }
}
