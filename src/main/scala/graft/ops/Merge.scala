package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lakehouse-style MERGE: apply a change-data-capture feed onto a base
  * snapshot, latest change wins per key, with delete tombstones —
  * `MERGE INTO base USING changes WHEN MATCHED [AND op='D'] THEN
  * DELETE / UPDATE SET * WHEN NOT MATCHED THEN INSERT *`, as a pure
  * DataFrame transform (no table format required).
  *
  * Scale shape (the reason this is not a window query): the winner per
  * key is `max(struct(version..., row))`, which Spark executes as a
  * hash aggregate WITH map-side partial aggregation — each task
  * reduces its slice of the feed to one candidate row per key before
  * the exchange, so shuffle volume is (distinct keys), not (feed
  * rows). The `row_number() over (partition by key order by version
  * desc)` spelling would shuffle and sort the entire feed. The final
  * apply is one equi-join on the key; when the day's winner set is
  * small relative to the base it broadcasts (AQE decides), otherwise
  * it co-partitions — either way a single exchange of the smaller
  * side.
  */
object Merge {

  /** Apply `changes` onto `base`.
    *
    * `changes` must carry every `base` column (the full new row image,
    * CDC-snapshot style), plus `versionCols` (ordering of changes —
    * compared field by field, so supply a unique tie-break as the last
    * one) and `opCol` ('D' = delete the key; anything else upserts).
    *
    * Matched keys take the change row WHOLESALE (a legitimate NULL in
    * the change row must not resurrect the base value, so no
    * per-column coalesce); unmatched change keys insert; base keys
    * without changes pass through; 'D' on an absent key is a no-op.
    */
  def applyCdc(
      base: DataFrame,
      changes: DataFrame,
      key: String,
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.toSeq
    require(payload.contains(key), s"key $key missing from base")
    require(versionCols.nonEmpty, "versionCols must order the feed")

    // winner per key: max over (version..., full row) — payload rides
    // along and never influences the ordering because the last version
    // column is required to be a tie-break
    val verStruct = struct(
      versionCols.map(col) :+
        struct((payload.map(col) :+ col(opCol).as("__op")): _*).as("__row"): _*)
    val winners = changes
      .groupBy(col(key).as("__k"))
      .agg(max(verStruct).as("__w"))
      .select(col("__k"), col("__w.__row.__op").as("__op"),
        struct(payload.map(c => col(s"__w.__row.$c")): _*).as("__row"))

    val b = base.select(struct(payload.map(col): _*).as("__brow"),
      col(key).as("__bk"))
    b.join(winners, b("__bk") === winners("__k"), "full_outer")
      .where(col("__op").isNull || col("__op") =!= "D")
      .select(payload.map(c =>
        when(col("__k").isNotNull, col(s"__row.$c"))
          .otherwise(col(s"__brow.$c")).as(c)): _*)
  }
}
