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

  /** Perceptual-hash NEAR-dup pairs: [[perceptualHash]] signatures
    * split into `maxHamming + 1` pigeonhole bands; pairs colliding in
    * at least one band are Hamming-verified ≤ `maxHamming` — the
    * image near-dup step exact grouping (q93) cannot express
    * (re-encoded/resized copies flip a few histogram bits but stay
    * within a small Hamming radius). Recall is EXACTLY 1: ≤ h
    * differing bits cannot touch all h+1 bands (pigeonhole), so
    * banding is pure candidate pruning and the exact all-pairs
    * Hamming SQL is a true oracle — the q32 SimHash contract applied
    * to the multimodal column. Using exactly h+1 bands (not a fixed
    * 4) keeps each band key as WIDE as the radius allows: radius 1
    * over 64 bits joins on 32-bit keys, radius 3 on 16-bit keys —
    * band selectivity degrades no further than the requested
    * tolerance forces.
    *
    * Scale shape: signatures are one map pass over payload bytes;
    * the only shuffle is the (band, key) equi-join on 3-long rows,
    * whose fan-out tracks true signature collisions at the band
    * width, not corpus size (the 100 TB regime); a degenerate payload
    * distribution that floods one bucket is bounded the same way
    * [[graft.ops.Dedup.minhashPairs]] bounds hot bands — here by the
    * verify's ≤ `maxHamming` cut. */
  def phashNearDupPairs(spark: SparkSession, assets: DataFrame,
      dim: Int = 64, maxHamming: Int = 3): DataFrame = {
    require(dim >= 8 && dim <= 64, s"dim must be in [8, 64], got $dim")
    require(maxHamming >= 0 && maxHamming < dim,
      s"maxHamming must be in [0, dim), got $maxHamming")
    val numBands = maxHamming + 1
    // uneven split is fine: band b covers [b·dim/nb, (b+1)·dim/nb) —
    // pigeonhole needs only that the bands partition the bits
    val bounds = (0 to numBands).map(b => b * dim / numBands)
    val sigs = perceptualHash(spark, assets, dim).toDF()
    val banded = sigs.select(col("asset_id"), col("phash"),
      explode(array((0 until numBands).map { b =>
        val width = bounds(b + 1) - bounds(b)
        val mask = if (width == 64) -1L else (1L << width) - 1L
        struct(lit(b).as("band"),
          shiftrightunsigned(col("phash"), bounds(b)).bitwiseAND(lit(mask))
            .as("key"))
      }: _*)).as("bk"))
      .select(col("asset_id"), col("phash"), col("bk.band"), col("bk.key"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.asset_id") < col("b.asset_id"))
      .select(col("a.asset_id").as("asset_a"), col("b.asset_id").as("asset_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** STUB resize: truncate payload to the target byte budget and
    * update metadata — the map shape of a real thumbnailer. */
  def resizeStub(assets: DataFrame, maxBytes: Int): DataFrame =
    assets
      .withColumn("payload", expr(s"substring(payload, 1, $maxBytes)"))
      .withColumn("n_bytes", least(col("n_bytes"), lit(maxBytes.toLong)))
      .withColumn("width", least(col("width"), lit(maxBytes)))
      .withColumn("height", least(col("height"), lit(maxBytes)))

  /** CROSS-SIGNAL dedup: near-dup edges from the TEXT funnel (banded
    * MinHash) unioned with edges from the PERCEPTUAL-HASH banding,
    * one connected-components pass over the merged graph, min-id
    * survivors — the multimodal production rule "two pages are
    * duplicates if their text OR their imagery matches", which
    * single-signal dedup misses whenever one modality was re-encoded
    * (paraphrased caption over the same image, same article with
    * re-compressed figures).
    *
    * Scale shape: both edge generators are banded (never all-pairs —
    * [[graft.ops.Dedup.minhashPairs]]'s skew-guarded bands;
    * [[phashNearDupPairs]]'s pigeonhole bands), the union is
    * edge-count-sized, and CC is the shared pointer-halving pass. The
    * exact layer runs once, up front, exactly as in
    * [[graft.ops.Dedup.deduplicate]]. */
  def deduplicateCrossModal(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleSize: Int = 3, maxJaccardDist: Double = 0.4,
      maxHamming: Int = 1): DataFrame = {
    Dedup.ensureCheckpointDir(docs.sparkSession.sparkContext)
    val exact = Dedup.dropExact(docs, textCol, idCol).cache()
    val textPairs = Dedup.minhashPairs(exact, idCol, textCol,
        shingleSize = shingleSize, maxJaccardDist = maxJaccardDist)
      .select(col("doc_a"), col("doc_b"))
    val imagePairs = phashNearDupPairs(spark,
        packAsAssets(exact, idCol, textCol), maxHamming = maxHamming)
      .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
    val edges = textPairs.unionByName(imagePairs).distinct()
    val losers = Dedup.connectedComponents(edges)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("__loser"))
    exact.join(losers, exact(idCol) === col("__loser"), "left_anti")
  }

  /** THREE-detector cross-signal dedup: [[deduplicateCrossModal]]'s
    * MinHash-text ∪ phash-imagery edge union, plus the WINNOWING
    * overlap edges ([[Winnowing.overlapPairs]]) — the detector with
    * the strongest exact guarantee (every shared k-gram run ≥ w+k−1
    * tokens is provably caught), which whole-document Jaccard misses
    * on partial containment (a long page quoting a short one dilutes
    * Jaccard below the MinHash threshold while sharing dozens of
    * fingerprints). q195 measured MinHash-vs-SimHash agreement
    * precisely to license this kind of OR-composition: detectors are
    * OR-ed when each catches pairs the others miss, and the κ audit
    * says how much marginal signal each adds.
    *
    * Scale shape: all THREE edge generators stay banded/bucketed
    * (MinHash band buckets, phash pigeonhole bands, winnowing
    * fingerprint buckets with the df ≤ maxDf cap), the union is
    * edge-count-sized, and the single shared CC pass is the same
    * pointer-halving loop — adding a detector adds one edge stream,
    * never a new quadratic stage. */
  def deduplicateCrossSignal(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      shingleSize: Int = 3, maxJaccardDist: Double = 0.4,
      maxHamming: Int = 1, winnowK: Int = 3, winnowW: Int = 4,
      minShared: Long = 2L, maxDf: Long = 64L): DataFrame = {
    Dedup.ensureCheckpointDir(docs.sparkSession.sparkContext)
    val exact = Dedup.dropExact(docs, textCol, idCol).cache()
    val textPairs = Dedup.minhashPairs(exact, idCol, textCol,
        shingleSize = shingleSize, maxJaccardDist = maxJaccardDist)
      .select(col("doc_a"), col("doc_b"))
    val imagePairs = phashNearDupPairs(spark,
        packAsAssets(exact, idCol, textCol), maxHamming = maxHamming)
      .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
    val winnowPairs = Winnowing.overlapPairs(exact, winnowK, winnowW,
        minShared, maxDf, idCol, textCol)
      .select(col("doc_a"), col("doc_b"))
    val edges = textPairs.unionByName(imagePairs).unionByName(winnowPairs)
      .distinct()
    val losers = Dedup.connectedComponents(edges)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("__loser"))
    exact.join(losers, exact(idCol) === col("__loser"), "left_anti")
  }
}
