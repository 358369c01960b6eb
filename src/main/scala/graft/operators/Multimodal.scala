package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row for the batched decode path: payload rides as bytes. */
case class MediaRow(doc_id: Long, payload: Array[Byte])

/** Decoded-metadata record the stub "codec" emits. */
case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       n_frames: Int, codec: String)

/** Extracted features: byte-histogram + entropy + resize-stub dims. */
case class MediaFeatures(doc_id: Long, histogram: Array[Long],
                         entropy: Double, resized_w: Int, resized_h: Int)

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata structs alongside. Real codec work (jpeg
  * decode, audio resample) is NOT available in this environment, so the
  * decode step is a clearly-marked deterministic stub — but the Spark
  * side (schema, binary columns, per-frame explode, batch shape) is the
  * real thing a decode UDF would plug into.
  */
object Multimodal {

  /** Attach a binary payload + decoded-metadata stub to each document.
    * STUB: width/height/frame-count are derived arithmetically from the
    * payload size; a production build would replace `fakeDecode` with a
    * vectorized decode over `mapInPandas`-style batches. */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary") // stand-in media payload
    val nBytes = octet_length(col("text"))
    docs
      .withColumn("payload", payload)
      .withColumn("meta", struct(
        nBytes.as("n_bytes"),
        (pmod(nBytes, lit(640)) + 1).as("width"),     // fake decode
        (pmod(nBytes, lit(480)) + 1).as("height"),    // fake decode
        ceil(nBytes / lit(256.0)).cast("int").as("n_frames")))
      .select(
        col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        col("meta.n_frames").as("n_frames"),
        ascii(substring(col("text"), 1, 1)).as("first_cp"))
      .orderBy("doc_id")
  }

  /** REAL header parsing over a binary payload column — unlike
    * [[decodeMeta]]'s arithmetic stub, these dimensions come from the
    * actual bytes: PNG IHDR (big-endian u32 at 16/20), JPEG SOF via a
    * segment walk, GIF logical screen descriptor (little-endian u16) —
    * see [[graft.functions.ImageHeader]]. One codegen'd scan; rows
    * that are none of the three formats report null format/dims
    * (corrupt inputs stay visible). */
  def imageMeta(df: DataFrame, payloadCol: String = "payload",
                idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), octet_length(col(payloadCol)).as("n_bytes"),
        graft.functions.ImageFunctions.image_header(col(payloadCol)).as("hdr"))
      .select(col(idCol), col("n_bytes"),
        col("hdr.format").as("format"),
        col("hdr.width").as("width"),
        col("hdr.height").as("height"))
      .orderBy(idCol)

  /** REAL audio container parsing — WAV chunk walk + FLAC STREAMINFO
    * bit unpacking via [[graft.functions.AudioHeader]]; the audio
    * sibling of [[imageMeta]], same null-for-corrupt contract. */
  def audioMeta(df: DataFrame, payloadCol: String = "payload",
                idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), octet_length(col(payloadCol)).as("n_bytes"),
        graft.functions.AudioFunctions.audio_header(col(payloadCol)).as("hdr"))
      .select(col(idCol), col("n_bytes"),
        col("hdr.format").as("format"),
        col("hdr.sample_rate").as("sample_rate"),
        col("hdr.channels").as("channels"),
        col("hdr.bits").as("bits"))
      .orderBy(idCol)

  /** REAL video container parsing — MP4 box walk + AVI RIFF walk via
    * [[graft.functions.VideoHeader]]; completes the header trio with
    * [[imageMeta]]/[[audioMeta]], same null-for-corrupt contract. */
  def videoMeta(df: DataFrame, payloadCol: String = "payload",
                idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), octet_length(col(payloadCol)).as("n_bytes"),
        graft.functions.VideoFunctions.video_header(col(payloadCol)).as("hdr"))
      .select(col(idCol), col("n_bytes"),
        col("hdr.format").as("format"),
        col("hdr.width").as("width"),
        col("hdr.height").as("height"),
        col("hdr.duration_ms").as("duration_ms"))
      .orderBy(idCol)

  /** Batched decode over partitions — the Scala shape of a
    * `mapInPandas` media pipeline: one decoder instantiation per
    * partition (amortized like a per-batch codec init), rows streamed
    * through it, typed output Dataset. The decode itself is a STUB —
    * this container has no image/audio codecs — but the plumbing
    * (binary payload column, per-partition batching, typed schema out)
    * is exactly what a real `decode(bytes) → (w, h, frames)` plugs
    * into. */
  def decodeBatched(spark: SparkSession, docs: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    val media = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition "codec" init happens here (amortized, like a
      // pandas-batch UDF); STUB: deterministic arithmetic fake
      val codecName = "stub-codec-v0"
      rows.map { m =>
        val n = m.payload.length
        DecodedMeta(m.doc_id, n, n % 640 + 1, n % 480 + 1, (n + 255) / 256, codecName)
      }
    }
  }

  /** Aspect-preserving resize-to-fit arithmetic (the real part of any
    * image resize; the pixel resampling itself would live in the
    * decode stub). */
  def fitWithin(w: Int, h: Int, box: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= box) (w, h)
    else (math.max(1, w * box / m), math.max(1, h * box / m))
  }

  /** Feature extraction over payload batches — same mapPartitions
    * batch shape as [[decodeBatched]]: a 16-bucket byte histogram,
    * Shannon entropy of the byte distribution, and resize-stub target
    * dims. The histogram/entropy are REAL computations over the
    * payload bytes; only the image semantics are faked. */
  def featureExtract(spark: SparkSession, docs: DataFrame, box: Int = 224): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      rows.map { m =>
        val hist = new Array[Long](16)
        var i = 0
        while (i < m.payload.length) {
          hist((m.payload(i) & 0xff) >> 4) += 1
          i += 1
        }
        val n = m.payload.length.toDouble
        var entropy = 0.0
        hist.foreach { c =>
          if (c > 0) { val p = c / n; entropy -= p * math.log(p) / math.log(2) }
        }
        val (w, h) = fitWithin(m.payload.length % 640 + 1, m.payload.length % 480 + 1, box)
        MediaFeatures(m.doc_id, hist, entropy, w, h)
      }
    }
  }

  /** Frame sampling: split each payload into fixed-size 256-char frames
    * via explode — the shape a video frame-sampler or audio chunker
    * produces (one row per frame, keyed by (doc_id, frame_idx)). */
  def frameSample(docs: DataFrame, frameSize: Int = 256): DataFrame =
    docs
      // empty payloads chunk to nothing (and Spark's sequence(0, -1)
      // would otherwise count DOWN, emitting a phantom frame -1)
      .filter(length(col("text")) > 0)
      .withColumn("nf", ceil(length(col("text")) / lit(frameSize.toDouble)).cast("int"))
      .select(
        col("doc_id"), col("text"),
        explode(sequence(lit(0), col("nf") - 1)).as("fi"))
      .select(
        col("doc_id"),
        col("fi").cast("long").as("frame_idx"),
        least(lit(frameSize), length(col("text")) - col("fi") * frameSize).as("frame_len"),
        md5(expr(s"substring(text, fi*$frameSize + 1, $frameSize)")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
}
