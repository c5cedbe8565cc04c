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

  /** SCD type-2 history from a change feed: every upsert becomes a
    * versioned row whose validity closes when the key's NEXT change
    * (of any kind — a later update or a delete tombstone both end the
    * interval) takes effect. Appends `valid_to` = the next change's
    * leading version value, NULL for the key's current row, then drops
    * the tombstones themselves (a delete closes history, it isn't a
    * version).
    *
    * This is a per-key `lead()` window — the one merge-family operator
    * that legitimately sorts the feed within each key, because
    * interval construction is inherently order-dependent. The shuffle
    * carries the feed once, partitioned by key.
    */
  def scd2History(
      changes: DataFrame,
      key: String,
      versionCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(versionCols.nonEmpty, "versionCols must order the feed")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(versionCols.map(col): _*)
    changes
      .withColumn("valid_to", lead(col(versionCols.head), 1).over(w))
      .filter(col(opCol) =!= "D")
      .drop(opCol)
  }

  /** The inverse of [[applyCdc]]: diff two snapshots of the same
    * schema into a change feed — 'I' rows exist only in `after`, 'D'
    * rows only in `before`, 'U' rows exist in both with any column
    * differing (per-column null-safe comparison, so NULL → value and
    * value → NULL both count as changes). Unchanged keys are absent
    * from the output, which is what makes this the scalable way to
    * publish incremental downstream updates of a recomputed table:
    * one co-partitioned full-outer join, output proportional to the
    * churn, not the table. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    val payload = before.columns.toSeq
    require(payload.contains(key), s"key $key missing from before")
    val b = before.select(col(key).as("__bk"),
      struct(payload.map(col): _*).as("__b"))
    val a = after.select(col(key).as("__ak"),
      struct(payload.map(col): _*).as("__a"))
    val differs = payload.filterNot(_ == key)
      .map(c => !(col(s"__a.$c") <=> col(s"__b.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, col("__bk") === col("__ak"), "full_outer")
      .where(col("__bk").isNull || col("__ak").isNull || differs)
      .select(
        when(col("__bk").isNull, lit("I"))
          .when(col("__ak").isNull, lit("D"))
          .otherwise(lit("U")).as("op") +:
          payload.map(c =>
            when(col("__ak").isNotNull, col(s"__a.$c"))
              .otherwise(col(s"__b.$c")).as(c)): _*)
  }
}
