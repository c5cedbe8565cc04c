package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset splitting for training pipelines.
  *
  * [[assignSplit]] is the production path: a pure arithmetic hash of
  * the record id maps every row to a stable bucket, so the same row
  * lands in the same split on any cluster, any partitioning, any day —
  * re-runs and incremental appends stay consistent (unlike
  * `randomSplit`, whose assignment depends on partitioning).
  */
object Splits {

  /** Knuth multiplicative hash → bucket in [0, 100). */
  def hashBucket(id: Column): Column =
    pmod((id.cast("long") * lit(2654435761L)) % lit(4294967296L), lit(100L))

  /** Stable named split from cumulative percentage cuts, e.g.
    * train/val/test at 80/10/10 → cuts (80, 90). */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct < 100)
    val b = hashBucket(id)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Stratified sample with per-stratum fractions (seeded MLlib path;
    * partitioning-dependent — use for exploration, not lineage). */
  def stratifiedSample(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)
}
