package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.4): media as opaque `binary`
  * columns with typed metadata, processed by partition-batched kernels.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration,
  * output shape — is real and tested. The actual codecs are STUBBED: this
  * container ships no image/audio libraries, so `decodeStub` parses only
  * the deterministic 16-byte header layout below and emits a fake-but-
  * deterministic feature vector. Swapping in a real decoder means
  * replacing ONLY the body of [[MediaKernels.decode]]; every plan stays
  * identical.
  *
  * Header layout (bytes, big-endian): magic "GRFT" (4) | format u8
  * (0=img,1=audio,2=video) | width u16 | height u16 | nFrames u16 |
  * reserved (5).
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** Deterministic synthetic media column from any table (for tests and
    * the rows-only driver query): payload bytes derive from a seed column,
    * header from its hash. */
  def syntheticMedia(df: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val h = xxhash64(col(seedCol))
    val fmt = pmod(h, lit(3)).cast("int")
    val w = (pmod(h, lit(480)) + 32).cast("int")
    val ht = (pmod(h, lit(360)) + 32).cast("int")
    val nf = (pmod(h, lit(24)) + 1).cast("int")
    df.select(
      col(idCol).cast("long").as("media_id"),
      // header + payload, all expression-built: deterministic fake bytes
      concat(
        lit("GRFT").cast("binary"),
        substring(sha2(col(seedCol).cast("string"), 256).cast("binary"), 1, 12),
        sha2(concat_ws("|", col(idCol), col(seedCol)), 512).cast("binary")).as("media"),
      struct(
        element_at(array(lit("img"), lit("audio"), lit("video")), fmt + 1).as("format"),
        w.as("width"), ht.as("height"), nf.as("n_frames")).as("meta"))
  }

  case class MediaFeatures(
      media_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, payload_bytes: Int, features: Array[Double])

  object MediaKernels {
    /** STUB — replace with a real codec (e.g. JNI image lib / ffmpeg
      * bindings). Parses the deterministic header and derives a fake
      * 8-dim feature vector from payload bytes. The signature (bytes in,
      * fixed-width feature vector out) is the real contract. */
    def decode(mediaId: Long, media: Array[Byte], format: String,
        width: Int, height: Int, nFrames: Int): MediaFeatures = {
      val payload = if (media.length > 16) media.drop(16) else Array.empty[Byte]
      val feats = new Array[Double](8)
      var i = 0
      while (i < payload.length) { feats(i % 8) += (payload(i) & 0xFF) / 255.0; i += 1 }
      val n = math.max(payload.length / 8.0, 1.0)
      MediaFeatures(mediaId, format, width, height, nFrames,
        payload.length, feats.map(_ / n))
    }
  }

  /** Partition-batched decode + feature extraction: one kernel invocation
    * per row, batched per partition (the Scala analogue of mapInPandas
    * batches — no per-row JVM/py crossing to model here, but the iterator
    * shape is the same). Resize/frame-sample parameters travel with the
    * metadata so the kernel sees everything in one call. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val ss = media.sparkSession
    import ss.implicits._
    media
      .select(col("media_id"), col("media"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_frames").as("n_frames"))
      .as[(Long, Array[Byte], String, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt, w, h, nf) =>
          MediaKernels.decode(id, bytes, fmt, w, h, nf)
        }
      }
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th
    * frame index — pure expression, no decode needed to plan the work. */
  def frameSamplePlan(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("meta.format") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.n_frames") - 1, lit(stride)).as("frame_indices"))
}
