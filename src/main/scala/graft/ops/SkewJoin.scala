package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows, the
  * shuffle sends that whole key to one task. Salting splits each hot
  * key into `numSalts` sub-keys: the large (skewed) side gets a
  * deterministic salt from hashing its row identity; the small side is
  * replicated `numSalts` times, once per salt value. The join output
  * is row-identical to the unsalted join — only the partitioning
  * changes. AQE's skew-join handles moderate skew automatically;
  * explicit salting is for the pathological keys AQE cannot split
  * (e.g. one key > a single executor's memory).
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small`, salted.
    *
    * @param saltSource columns of `big` whose hash spreads a hot key's
    *                   rows across salts (any roughly-unique column).
    */
  /** The salt assignment `saltedInnerJoin` applies to the big side —
    * exposed so specs can assert the spread property (max rows per
    * (key, salt) ≪ max rows per key) against the operator's own
    * expression rather than a re-derivation that could drift. */
  private[graft] def saltCol(saltSource: Seq[String], numSalts: Int): Column =
    pmod(hash(saltSource.map(col): _*), lit(numSalts))

  def saltedInnerJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      numSalts: Int, saltSource: Seq[String]): DataFrame = {
    require(numSalts > 0)
    val salted = big.withColumn("__salt", saltCol(saltSource, numSalts))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(bigKey) === replicated(smallKey))
      .drop("__salt")
  }
}
