package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replayable HyperLogLog cardinality audit — the mergeable
  * "how many DISTINCT keys" sketch (Flajolet et al. '07) graded
  * against the exact answer it approximates, the distinct-count
  * sibling of [[CountMinSketch]]'s point-frequency audit and
  * [[Ranks.histogramMedianAudit]]'s order-statistic audit. Spark's
  * own `approx_count_distinct` is HLL++ too, but its xxhash64
  * register contents are not reproducible by a SQL oracle; this
  * operator commits to a DOCUMENTED hash so the full register table,
  * the harmonic sum, and the estimate replay bit-for-bit in another
  * engine — which is what turns a sketch from "trust me" into an
  * auditable artifact.
  *
  * Spec (all integer arithmetic):
  *  - 40-bit hash `h = (H·A) mod 2⁴⁰` of the codepoint fold
  *    `H = ` [[Classifier.tokenHash]], multiplier A = 777767777767
  *    (odd), product kept exact in DECIMAL(38,0)/HUGEINT;
  *  - p = 8 → m = 256 registers: bucket = top 8 bits, the remaining
  *    32 bits drive `rho = 33 − bitlength(low)` (rho = 33 when
  *    low = 0) — the `length(bin(·))` trick, no loops;
  *  - register r_b = max rho in bucket; harmonic denominator
  *    `num = Σ_b 2^(33−r_b)` with ABSENT buckets contributing 2³³
  *    (register 0), so the sum is always over all m registers;
  *  - estimate `n_est = (α_ppm·m²·2³³) div (1e6·num)` with
  *    α_ppm = 718272 (= ⌊1e6·0.7213/(1 + 1.079/256)⌋). No
  *    small-range linear-counting branch: its `m·ln(m/V)` needs a
  *    float log, and the audit column (`err_ppm`) is precisely the
  *    place where the uncorrected small-range bias becomes VISIBLE
  *    instead of hidden.
  *
  * Shape at scale: one tokenize+explode pass collapses to
  * (group, bucket, r) with map-side max — the shuffle is bounded by
  * groups·m cells regardless of corpus size, and register tables
  * from different shards merge by cell-wise MAX (how distributed
  * sketching composes). The exact count shares the same
  * (group, token) collapse, so the audit costs one corpus scan.
  */
object Hll {

  private val A = 777767777767L
  private val M40 = 1L << 40
  private val M32 = 1L << 32

  /** The per-group register table (group `__g`, bucket `__b`,
    * register `__r`) from a (group, token) frame — exposed because
    * MERGEABILITY is the point of the sketch: register tables built
    * from corpus shards combine by cell-wise MAX into exactly the
    * whole-corpus table (spec-covered). */
  def registerTable(perGroupTokens: DataFrame, groupCol: String = "__g",
      tokCol: String = "__tok"): DataFrame =
    perGroupTokens
      .select(col(groupCol).as("__g"),
        Classifier.tokenHash(col(tokCol)).as("__H"))
      .select(col("__g"),
        expr(s"CAST((CAST(__H AS DECIMAL(38,0)) * $A) % $M40 AS BIGINT)")
          .as("__h40"))
      .select(col("__g"),
        expr(s"__h40 div $M32").as("__b"),
        expr(s"__h40 % $M32").as("__low"))
      .select(col("__g"), col("__b"),
        when(col("__low") === 0, lit(33))
          .otherwise(lit(33) - length(bin(col("__low")))).cast("int")
          .as("__rho"))
      .groupBy("__g", "__b").agg(max(col("__rho")).as("__r"))

  /** Generic per-group distinct-KEY audit over a (group, key) frame:
    * (group, n_exact, n_est, err_ppm, n_buckets_hit), ordered by
    * group. Raw HLL is in its calibrated range for
    * n_exact ≳ 2.5·m = 640; below that the UNCORRECTED small-range
    * bias shows up honestly in err_ppm (see the object scaladoc). */
  def cardinalityAudit(keys: DataFrame, groupCol: String,
      keyCol: String): DataFrame = {
    val toks = keys
      .select(col(groupCol).as("__g"), col(keyCol).as("__tok"))
      .distinct()
      .cache()
    toks.count() // sketch and exact both read the one collapse
    val exact = toks.groupBy(col("__g").as("__ge"))
      .agg(count(lit(1)).as("n_exact"))
    val regTable = registerTable(toks)
    val sketch = regTable
      .select(col("__g"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - __r AS INT))").as("__w"))
      .groupBy("__g")
      .agg(sum(col("__w")).as("__wsum"), count(lit(1)).as("n_buckets_hit"))
      .withColumn("__num",
        col("__wsum") + (lit(256L) - col("n_buckets_hit")) * lit(1L << 33))
      .withColumn("n_est",
        expr("""CAST((CAST(718272 AS DECIMAL(38,0)) * 65536 * 8589934592)
                 div (CAST(1000000 AS DECIMAL(38,0)) * __num) AS BIGINT)"""))
    val out = sketch.join(exact, col("__g") === col("__ge"))
      .select(col("__g").as(groupCol), col("n_exact"), col("n_est"),
        expr("(abs(n_est - n_exact) * 1000000L) div n_exact").as("err_ppm"),
        col("n_buckets_hit"))
      .orderBy(groupCol)
    val materialized = out.cache()
    materialized.count()
    toks.unpersist(blocking = false)
    materialized
  }

  /** Distinct-BIGRAM cardinality audit per group — the transition-
    * table sizing read for the q164/q168 bigram-model family: how
    * many distinct (w1, w2) transitions each source contributes,
    * estimated by the sketch and graded exactly. Bigram keys
    * (`w1 ⌴ w2`) push per-group cardinality into raw HLL's calibrated
    * range where the unigram vocabulary of a feed often is not. */
  def bigramCardinalityAudit(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > lit(0))
    val bigrams = docs
      .select(col(groupCol).as("__g"), toks.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("__g"),
        explode_outer(transform(sequence(lit(0), size(col("__t")) - 2),
          i => concat_ws(" ", element_at(col("__t"), i + 1),
            element_at(col("__t"), i + 2)))).as("__bg"))
    cardinalityAudit(bigrams, "__g", "__bg")
      .withColumnRenamed("__g", groupCol)
  }
}
