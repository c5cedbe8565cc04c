package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Bounded-round Lloyd k-means over an embedding column in EXACT
  * fixed-point integer arithmetic — the clustering pass that TRAINS
  * the cell structure the similarity stack consumes (IVF coarse
  * quantizers for [[Similarity]]'s partition-pruned ANN, SemDeDup
  * cells, curation buckets). `labelCentroidSimilarity` aggregates
  * centroids for labels that already exist; this op derives the
  * labels themselves.
  *
  * Why fixed-point: float Lloyd's is partitioning-dependent (summation
  * order changes centroid low bits, which can flip argmin ties and
  * cascade into different clusterings per run). Here every vector
  * component is quantized once to `floor(x · quantScale)` (a Long),
  * distances are exact integer sums of squares, centroid means are
  * exact floor divisions on DECIMAL(38,0) sums, and argmin ties break
  * on the lower centroid id — so the full clustering is a pure
  * function of (input, k, iterations), bit-replayable on any cluster
  * layout and hash-checkable by a SQL oracle that replays every round.
  *
  * Initialization is deterministic too: the quantized vectors of the
  * `k` smallest ids (k-means++ would need a seeded RNG and give the
  * oracle a replay obligation over weighted sampling; for curation
  * cells, fixed seeds rerun identically and that determinism is worth
  * more than a better-spread init, which extra rounds recover anyway).
  * A cluster that loses all members keeps its previous centroid (same
  * rule replayed in the oracle).
  *
  * Scale shape (the mllib template): centroids live on the DRIVER
  * (k·dim longs — bounded, broadcast into the closure as literal
  * arrays), so each round is (1) one MAP-ONLY pass over the cached
  * quantized corpus computing k codegen'd zip_with distance folds per
  * row — no join, no shuffle — and (2) one (cluster, dim)-keyed
  * partial aggregation whose exchange carries at most k·dim rows per
  * partition (map-side combine), collected to the driver. Per-round
  * cost is one corpus scan regardless of k·rounds history; nothing
  * quadratic, nothing iteration-deep in the lineage (each round's
  * frame is built fresh from the cached base).
  *
  * Exactness bounds (documented, not silently assumed): per-dim
  * squared deltas need `dims · (2·max|x|·quantScale)² < 2⁶³` (at the
  * default 1e6 scale and unit-normalized embeddings: 64 · (2e6)² ≈
  * 2.6e14 — five orders of headroom); centroid sums are DECIMAL(38,0)
  * so the mean is exact at ANY cluster size, and the floor division
  * happens on the driver in BigInt ([[java.math.BigInteger]] — no
  * 2⁵³ Double cliff, the `quantizedCentroids` lesson).
  */
object Clustering {

  /** Run `iterations` Lloyd rounds; returns the FINAL assignment
    * `(idCol, cluster int, dist2 long)` — each vector's cluster under
    * the post-update centroids and its exact integer squared distance.
    *
    * The quantized corpus is cached for the duration of the loop and
    * unpersisted before returning; the returned frame recomputes its
    * single map-only assignment pass from the source (one extra scan
    * at action time — cheaper than holding corpus-sized blocks
    * hostage, the Bench storage contract).
    */
  def kmeans(emb: DataFrame, k: Int, iterations: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      quantScale: Double = 1e6): DataFrame = {
    require(k >= 1 && iterations >= 1)
    val quantize = transform(col(vecCol),
      x => floor(x.cast("double") * lit(quantScale)).cast(LongType))
    val q = emb.select(col(idCol).as("__id"), quantize.as("__q")).cache()

    // deterministic init: quantized vectors of the k smallest ids,
    // cid = rank in id order (a k-row driver collect)
    var cents: Seq[Array[Long]] = q.orderBy("__id").limit(k).collect()
      .map(r => r.getSeq[Long](1).toArray).toSeq
    require(cents.length == k, s"kmeans: corpus has fewer than k=$k rows")

    // enforce the documented exactness bound instead of silently
    // overflowing the Long distance fold: dims·(2·max|q|)² must stay
    // < 2⁶³. One cheap aggregate over the just-cached frame (BigInt —
    // the check itself must not overflow).
    val dims = cents.head.length
    val maxRow = q.select(max(greatest(array_max(col("__q")),
      -array_min(col("__q")))).cast(LongType)).head()
    val maxAbs = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val worst = BigInt(dims) * (BigInt(maxAbs) * 2).pow(2)
    require(worst < BigInt(2).pow(63),
      s"kmeans: dims=$dims x (2*max|quantized|=${2 * maxAbs})^2 = $worst " +
        s">= 2^63 would overflow the exact Long distance fold; lower " +
        s"quantScale (=$quantScale) or normalize the embeddings")

    var round = 0
    while (round < iterations) {
      // assignment is PROJECTED BEFORE the posexplode: a projection
      // above a Generate is evaluated per EXPLODED row, which would
      // recompute the k distance folds dim× per vector (measured 10×
      // wall on the battery); below it, once per vector
      val assigned = q
        .select(col("__q"), distArray(cents).as("__d2"))
        .select(col("__q"), clusterOf(col("__d2")).as("__c"))
      // one aggregation job: per-(cluster, dim) DECIMAL-exact sums +
      // member counts, k·dim rows collected to the driver
      val upd = assigned.select(col("__c"),
          posexplode(col("__q")).as(Seq("__pos", "__v")))
        .groupBy("__c", "__pos")
        .agg(sum(col("__v").cast(DecimalType(38, 0))).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val byCluster = upd.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (prev, cid) =>
        byCluster.get(cid) match {
          case None => prev // empty cluster keeps its centroid
          case Some(rows) =>
            val c = prev.clone()
            rows.foreach { r =>
              val s = r.getDecimal(2).toBigInteger
              val n = java.math.BigInteger.valueOf(r.getLong(3))
              // BigInteger divide truncates toward zero; subtracting
              // the true non-negative remainder first makes it an
              // exact multiple, i.e. floorDiv at any magnitude
              c(r.getInt(1)) = s.subtract(s.mod(n)).divide(n).longValueExact()
            }
            c
        }
      }
      round += 1
    }

    val out = q
      .select(col("__id"), distArray(cents).as("__d2"))
      .select(col("__id").as(idCol), clusterOf(col("__d2")).as("cluster"),
        array_min(col("__d2")).as("dist2"))
    q.unpersist()
    out
  }

  /** The k exact integer squared distances of the row's `__q` to each
    * centroid, as one array column: k literal-array zip_with folds
    * inside one codegen'd projection. */
  private def distArray(cents: Seq[Array[Long]]): Column =
    array(cents.map { c =>
      aggregate(zip_with(col("__q"), typedLit(c.toSeq),
          (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v)
    }: _*)

  /** argmin centroid id: array_position finds the FIRST slot holding
    * the min, so exact distance ties break toward the lower cid. */
  private def clusterOf(d2: Column): Column =
    (array_position(d2, array_min(d2)) - 1).cast("int")
}
