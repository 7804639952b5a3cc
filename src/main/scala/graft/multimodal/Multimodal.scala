package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * kernels over them.
  *
  * The Spark-side plumbing — schema, batch-shaped mapPartitions kernels,
  * partition sizing by bytes — is real and tested. The codec step itself is
  * STUBBED with a deterministic fake (this container has no image/audio
  * libraries): `fakeDecode` derives a stable byte-histogram "feature" from
  * the binary payload, standing in for a JPEG/PNG/opus decode. In a Python
  * deployment the same shape maps 1:1 onto `mapInPandas` with Arrow batches;
  * here the kernels are Scala `mapPartitions` (this is a Scala-only build),
  * which is the same execution contract: one JVM-side batch per partition,
  * columnar in, columnar out. */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sample_rate: Int,
      duration_ms: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      meta: MediaMeta)
  case class MediaFeature(media_id: Long, kind: String, n_bytes: Long,
      feature: Array[Float])
  case class FrameSample(media_id: Long, frame_idx: Int, offset_ms: Long,
      frame_bytes: Array[Byte])

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val Kinds = Array("image", "audio", "video")

  /** Deterministic synthetic media corpus (seed-42 byte streams). */
  def generate(spark: SparkSession, n: Long, partitions: Int = 16): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0L, n, 1L, partitions).mapPartitions(_.map { i =>
      val kind = Kinds((math.abs(mix(i * 13L)) % 3).toInt)
      val len = 256 + (math.abs(mix(i * 7L)) % 1024).toInt
      val bytes = Array.tabulate[Byte](len)(j => (mix(i * 1000003L + j) & 0xff).toByte)
      val meta = kind match {
        case "image" => MediaMeta(64 + (i % 64).toInt * 8, 48 + (i % 48).toInt * 8, 0, 0L)
        case "audio" => MediaMeta(0, 0, 16000, 1000L + (i % 30) * 1000L)
        case _ => MediaMeta(320, 240, 0, 2000L + (i % 60) * 1000L)
      }
      MediaRow(i, kind, bytes, meta)
    })
  }

  /** STUB decode: 16-bin byte histogram, L1-normalized — a deterministic
    * stand-in for `decode(bytes) → pixels → embedding`. Replace the body
    * with a real codec call in deployment; the signature, batching and
    * schema stay. */
  def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Batch feature extraction: binary → fixed-width feature vector. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      MediaFeature(r.media_id, r.kind, r.bytes.length.toLong,
        fakeDecode(r.bytes))
    })
  }

  /** "Resize": metadata-plane transform (real resize would re-encode bytes;
    * the stub scales dimensions and truncates the payload proportionally —
    * deterministic, shape-preserving). */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      if (r.kind != "image" || math.max(r.meta.width, r.meta.height) <= maxDim) r
      else {
        val scale = maxDim.toDouble / math.max(r.meta.width, r.meta.height)
        val nw = math.max(1, (r.meta.width * scale).toInt)
        val nh = math.max(1, (r.meta.height * scale).toInt)
        val nlen = math.max(16, (r.bytes.length * scale * scale).toInt)
        r.copy(bytes = java.util.Arrays.copyOf(r.bytes, math.min(nlen, r.bytes.length)),
          meta = r.meta.copy(width = nw, height = nh))
      }
    })
  }

  /** Frame sampling for video: one synthetic frame per `everyMs`, sliced
    * deterministically from the payload (stand-in for a real demuxer). */
  def frameSample(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val nFrames = math.max(1, (r.meta.duration_ms / everyMs).toInt)
      (0 until nFrames).map { f =>
        val off = (f.toLong * r.bytes.length / nFrames).toInt
        val end = math.min(r.bytes.length, off + 32)
        FrameSample(r.media_id, f, f * everyMs,
          java.util.Arrays.copyOfRange(r.bytes, off, end))
      }
    }
  }

  /** Embedding-ready projection: features exploded to (media_id, dim, v) —
    * the hand-off shape for the Ann module's cosine path. */
  def featureTable(features: Dataset[MediaFeature]): DataFrame =
    features.toDF().select(col("media_id"), col("kind"), col("n_bytes"),
      col("feature"))
}
