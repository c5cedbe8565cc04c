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

  /** SKEW AUDIT for a join/groupBy key: which keys carry more than
    * `factorNum∕factorDen` × the mean per-key row count, how big a
    * share of the table each holds, and how many salts would level it
    * — the measurement pass that decides whether [[saltedInnerJoin]]
    * (or AQE skew handling) is needed at all, run BEFORE the 100 TB
    * shuffle rather than diagnosed from its straggler tasks.
    *
    * All verdicts are integer arithmetic: a key is skewed iff
    * `cnt·nKeys·factorDen > factorNum·total` (cross-multiplied — no
    * float mean to round), its share is reported in exact ppm
    * (`cnt·1e6 div total`), and the recommended salt count is
    * `⌈cnt·nKeys ∕ total⌉` (how many mean-sized slices the key spans).
    * Products go through DECIMAL(38,0): `cnt·nKeys` reaches ~1e25 at
    * 100 TB (1e13-row key × 1e12 keys) — far past BIGINT.
    *
    * Scale shape: one map-side-combinable count per key, a 1-row
    * global rollup broadcast back, then a filter on the (already
    * small) per-key frame. Nothing corpus-sized crosses the wire
    * twice. */
  def skewKeyAudit(df: DataFrame, keyCol: String,
      factorNum: Long = 12L, factorDen: Long = 10L): DataFrame = {
    require(factorNum > 0 && factorDen > 0)
    // localCheckpoint: the keys-sized count frame feeds BOTH the
    // global rollup and the verdict pass, and Spark plans no exchange
    // reuse across the two subtrees — uncheckpointed, the corpus
    // aggregation would scan and shuffle the table twice (verified in
    // the physical plan). Same materialization stance as
    // spanContaminationScores' refGrams.
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .localCheckpoint(true)
    val totals = counts.agg(sum(col("n_rows")).as("__total"),
      count(lit(1)).as("__nkeys"))
    val dec = "decimal(38,0)"
    counts.crossJoin(broadcast(totals))
      .withColumn("__lhs",
        col("n_rows").cast(dec) * col("__nkeys").cast(dec) * lit(factorDen))
      .withColumn("__rhs", lit(factorNum).cast(dec) * col("__total").cast(dec))
      .filter(col("__lhs") > col("__rhs"))
      .withColumn("share_ppm",
        expr("(CAST(n_rows AS decimal(38,0)) * 1000000) div __total"))
      .withColumn("salts",
        expr("(CAST(n_rows AS decimal(38,0)) * __nkeys + __total - 1) div __total"))
      .select(col(keyCol), col("n_rows"), col("share_ppm"), col("salts"))
  }
}
