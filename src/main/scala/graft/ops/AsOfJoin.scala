package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward as-of join: for every left row, attach the
  * latest right row whose timestamp is ≤ the left timestamp, within a
  * join key.
  *
  * Spark has no built-in as-of join; the preference order (compose
  * built-ins before custom plans) is satisfied here with the
  * union + last_value trick:
  *
  *   1. tag both inputs and union them on (key, time);
  *   2. one hash shuffle on the key, one sort per partition;
  *   3. `last(value, ignoreNulls)` over an unbounded-preceding window
  *      carries the most recent right-side values forward;
  *   4. keep only left rows.
  *
  * Cost at any scale: ONE exchange of |L|+|R| narrow rows and a linear
  * window scan — no range-condition join explosion (a naive
  * `l.ts >= r.ts` join is quadratic per key). Ties at equal timestamps
  * sort the right row first, so a right row stamped exactly at the
  * left timestamp IS visible (asof `>=` semantics, matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`).
  *
  * The right side must be unique per (key, ts) — pre-aggregate it
  * otherwise, or the carried values are nondeterministic.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one right value column")
    val collisions = valueCols.intersect(left.columns.toSeq)
    require(collisions.isEmpty,
      s"right value column(s) ${collisions.mkString(", ")} already exist on the " +
        "left side — rename them before joining (the left copy would be " +
        "silently nulled otherwise)")
    val leftCols = left.columns.toSeq

    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTs).cast("timestamp"))
      .withColumn("__src", lit(1))
    val lPadded = valueCols.foldLeft(l)((df, v) =>
      df.withColumn(v, lit(null).cast(right.schema(v).dataType)))

    val r = right
      .withColumn("__k", col(rightKey))
      .withColumn("__t", col(rightTs).cast("timestamp"))
      .withColumn("__src", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__src")) ++ valueCols.map(col): _*)
    val rPadded = leftCols.foldLeft(r)((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lPadded.select((Seq("__k", "__t", "__src") ++ leftCols ++ valueCols)
        .distinct.map(col): _*)
      .unionByName(rPadded.select((Seq("__k", "__t", "__src") ++ leftCols ++ valueCols)
        .distinct.map(col): _*))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    valueCols.foldLeft(unioned)((df, v) =>
        df.withColumn(v, last(col(v), ignoreNulls = true).over(w)))
      .filter(col("__src") === 1)
      .drop("__k", "__t", "__src")
  }
}
