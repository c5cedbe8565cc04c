package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Snapshot-to-snapshot MIXTURE DRIFT audit: compare the weighted
  * composition of two corpus snapshots per key (source, language,
  * domain …) in exact integer parts-per-million — the check a
  * continuously-ingested training corpus runs before every retrain,
  * because a crawler change that silently doubles one source's token
  * share is a data bug no per-document filter catches. Half the
  * per-key drifts summed is the total-variation distance between the
  * two mixtures — the standard "how different is today's corpus"
  * scalar — and it is exactly recoverable from this frame.
  *
  * Exactness: per-key shares are `w · 1e6 ∕∕ total` floor divisions
  * on DECIMAL(38,0) sums (weights are caller-supplied token counts —
  * a 100 TB corpus overflows BIGINT at ~9.2e18 tokens, within one
  * decade of real corpora), so shares, drifts and verdicts are pure
  * integer arithmetic an oracle replays bit-for-bit. A KL-divergence
  * spelling would need ln() and break replayability for ulp noise —
  * TVD on ppm integers ranks drifted keys identically for the "page
  * someone at 2am?" decision this feeds.
  *
  * Scale shape: one map-side-combined aggregation per snapshot
  * (|keys| rows out), a full-outer join of two |keys|-row frames, and
  * a broadcast of the two scalar totals — corpus-sized data is
  * touched exactly twice, map-only. Keys present in only one
  * snapshot get share 0 on the other side (appearing/vanishing
  * sources are precisely the rows the audit exists to surface).
  */
object Drift {

  /** Per-key comparison of snapshots `a` and `b`: weighted share of
    * each snapshot in ppm and the absolute drift between them.
    * Returns (key, w_a, w_b, ppm_a, ppm_b, drift_ppm). Requires
    * non-negative weights and at least one positive total per
    * snapshot (an empty snapshot has no mixture to compare). */
  def mixtureDrift(a: DataFrame, b: DataFrame, keyCol: String,
      weight: Column): DataFrame = {
    def rollup(df: DataFrame, wCol: String): DataFrame = df
      .select(col(keyCol).as("__k"), weight.cast(DecimalType(38, 0)).as("__w"))
      .groupBy("__k").agg(sum(col("__w")).as(wCol))
    val wa = rollup(a, "__wa")
    val wb = rollup(b, "__wb")
    val joined = wa.join(wb, Seq("__k"), "full_outer")
      .select(col("__k"),
        coalesce(col("__wa"), lit(0)).cast(DecimalType(38, 0)).as("w_a"),
        coalesce(col("__wb"), lit(0)).cast(DecimalType(38, 0)).as("w_b"))
    val totals = joined.agg(sum(col("w_a")).as("__ta"), sum(col("w_b")).as("__tb"))
    def ppm(w: Column, t: Column): Column =
      ((w * 1000000) - pmod(w * 1000000, t)) / t // exact multiple ⇒ exact division
    joined.crossJoin(broadcast(totals))
      .select(col("__k").as(keyCol),
        col("w_a").cast("long").as("w_a"),
        col("w_b").cast("long").as("w_b"),
        ppm(col("w_a"), col("__ta")).cast("long").as("ppm_a"),
        ppm(col("w_b"), col("__tb")).cast("long").as("ppm_b"))
      .withColumn("drift_ppm", abs(col("ppm_a") - col("ppm_b")))
  }
}
