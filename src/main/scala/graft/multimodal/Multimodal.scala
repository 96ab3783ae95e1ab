package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata alongside. The
  * Spark-side contract (schema, batching, partitioning) is real and
  * tested; the codec itself is a pluggable `BinaryDecoder`, stubbed
  * deterministically here because no media libraries ship in this
  * environment.
  *
  * Scale posture: payload bytes never enter a shuffle — decode /
  * feature-extract are mapPartitions-shaped (the Scala analog of
  * `mapInPandas` batches), metadata-only results are the things that
  * aggregate. Frame sampling multiplies rows map-side only.
  */
object Multimodal {

  /** A decoded frame: dimensions + a small feature payload. */
  final case class Frame(width: Int, height: Int, format: String,
      features: Array[Float])

  /** The codec seam. A production build plugs an image/audio codec
    * in here; everything around it is engine code that does not
    * change. */
  trait BinaryDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Frame
  }

  /** Deterministic fake codec: derives dimensions and features from
    * the bytes themselves so tests are reproducible. A real decoder
    * would be the only line that changes. */
  object StubDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): Frame = {
      val n = bytes.length
      val w = 64 + (math.abs(if (n == 0) 0 else bytes(0).toInt) % 192)
      val h = 64 + (math.abs(if (n < 2) 0 else bytes(1).toInt) % 192)
      val feats = Array.tabulate(8)(i =>
        (if (n == 0) 0f else bytes(i % n).toFloat) / 128f)
      Frame(w, h, "stub", feats)
    }
  }

  final case class BinaryRecord(id: Long, payload: Array[Byte], kind: String)
  final case class DecodedRecord(id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, format: String, features: Array[Float])

  /** Decode a binary-column Dataset in partition-sized batches —
    * the payload stays executor-local; only the (small) decoded
    * metadata continues down the pipeline. */
  def decodeBatch(ds: Dataset[BinaryRecord], decoder: BinaryDecoder): Dataset[DecodedRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val f = decoder.decode(r.payload)
        DecodedRecord(r.id, r.kind, r.payload.length, f.width, f.height,
          f.format, f.features)
      }
    }
  }

  /** Frame sampling: every `stride`-th frame index up to `maxFrames`
    * per record — row multiplication happens map-side (explode), no
    * shuffle, so a video table fans out without moving payloads. */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int,
      maxFrames: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0),
        least(col(nFramesCol) - 1, lit((maxFrames - 1) * stride)), lit(stride))))

  /** Binary metadata extraction (the oracled m1 surface): size,
    * magic prefix, content hash — pure expressions over the payload. */
  def binaryMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      substring(col(payloadCol).cast("string"), 1, 4).as("magic"),
      md5(col(payloadCol)).as("content_md5"))
}
