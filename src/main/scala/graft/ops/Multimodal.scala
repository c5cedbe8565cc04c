package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal column handling: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in per-partition batches.
  *
  * The Spark-side plumbing (schema, partitioning, batch iteration,
  * output shape) is real and tested; the actual media DECODE IS A
  * STUB — this container ships no image/audio codecs, so
  * [[decodeStub]] derives deterministic fake features from the raw
  * bytes. Swapping in a real codec changes only the function body,
  * not the distributed execution shape (mapPartitions = one codec
  * init per partition, batch amortized, no per-row JNI churn — the
  * Scala analog of Python's `mapInPandas` batches).
  */
object Multimodal {

  /** (asset_id, payload, mime_type, width, height, n_bytes). */
  final case class Asset(
      asset_id: Long, payload: Array[Byte], mime_type: String,
      width: Int, height: Int, n_bytes: Long)

  final case class AssetFeatures(
      asset_id: Long, features: Array[Double], width: Int, height: Int)

  final case class FrameSample(asset_id: Long, frame_idx: Int, frame_signature: Long)

  /** Wrap a text corpus as fake binary assets — the typed-metadata
    * schema a real ingest would carry. */
  def packAsAssets(docs: DataFrame, idCol: String = "doc_id",
      payloadCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      col(payloadCol).cast(BinaryType).as("payload"),
      lit("image/stub").as("mime_type"),
      (length(col(payloadCol)) % 640 + 32).cast("int").as("width"),
      (length(col(payloadCol)) % 480 + 32).cast("int").as("height"),
      length(col(payloadCol)).cast("long").as("n_bytes"))

  /** STUB decode: deterministic 16-bin byte histogram, L1-normalized.
    * A real implementation decodes the payload with an image codec and
    * emits an embedding; everything around this function stays. */
  private[ops] def decodeStub(payload: Array[Byte], dim: Int): Array[Double] = {
    val hist = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % dim) += 1.0
      i += 1
    }
    val total = math.max(1.0, payload.length.toDouble)
    hist.map(_ / total)
  }

  /** Batch feature extraction over binary payloads: one partition =
    * one batch = one (stub) codec session. */
  def extractFeatures(spark: SparkSession, assets: DataFrame,
      dim: Int = 16): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select("asset_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { batch =>
        // real codec would be initialized once here, per partition
        batch.map { case (id, payload, w, h) =>
          AssetFeatures(id, decodeStub(payload, dim), w, h)
        }
      }
  }

  /** STUB video frame sampling: split the payload into `n` equal
    * chunks ("frames") and emit one signature per frame — the
    * generator (1 row in → n rows out) shape of real frame sampling. */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
      n: Int = 4): Dataset[FrameSample] = {
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val chunk = math.max(1, payload.length / n)
        (0 until n).iterator.map { f =>
          val from = f * chunk
          val until = math.min(payload.length, from + chunk)
          var sig = 1469598103934665603L
          var i = from
          while (i < until) { sig ^= payload(i); sig *= 1099511628211L; i += 1 }
          FrameSample(id, f, sig)
        }
      }
  }

  final case class AssetHash(asset_id: Long, phash: Long)

  /** Perceptual hash over binary payloads — the image-near-dup bridge
    * of a multimodal pipeline (real systems: pHash/dHash over decoded
    * pixels; here the same DIFFERENCE-HASH construction over the stub
    * byte histogram, so the distributed shape and the dedup semantics
    * are real while the decode stays a stub). Bit i of the `dim`-bit
    * signature is 1 iff bin i's count exceeds its cyclic neighbor's —
    * pure integer comparisons, invariant to payload length
    * normalization, deterministic at any partitioning. Assets sharing
    * a signature are dedup candidates (grouping on the hash is the
    * 64-bit-key analog of the text funnel's fingerprint layer). */
  def perceptualHash(spark: SparkSession, assets: DataFrame,
      dim: Int = 16): Dataset[AssetHash] = {
    require(dim >= 2 && dim <= 64, s"dim must be in [2, 64], got $dim")
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val hist = new Array[Long](dim)
          var i = 0
          while (i < payload.length) {
            hist((payload(i) & 0xff) % dim) += 1; i += 1
          }
          var ph = 0L; var b = 0
          while (b < dim) {
            if (hist(b) > hist((b + 1) % dim)) ph |= 1L << b
            b += 1
          }
          AssetHash(id, ph)
        }
      }
  }

  /** STUB resize: truncate payload to the target byte budget and
    * update metadata — the map shape of a real thumbnailer. */
  def resizeStub(assets: DataFrame, maxBytes: Int): DataFrame =
    assets
      .withColumn("payload", expr(s"substring(payload, 1, $maxBytes)"))
      .withColumn("n_bytes", least(col("n_bytes"), lit(maxBytes.toLong)))
      .withColumn("width", least(col("width"), lit(maxBytes)))
      .withColumn("height", least(col("height"), lit(maxBytes)))
}
