package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Columns

/** Bloom-filter FALSE-POSITIVE-RATE audit: build the production
  * [[BloomFns]] filter over a reference gram set, probe it with
  * grams that are EXACTLY known not to be members (anti-joined), and
  * report measured FPR next to the fill-ratio prediction — the
  * operational check run before trusting a bloom prefilter's
  * pass-rate budget at 100 TB (q72 uses the filter; nothing measured
  * it). A saturated filter (fill → 1) silently degrades a
  * decontamination prefilter into a full scan; this is the gauge.
  *
  * Replayability: the filter input is the REPLAYABLE k-gram
  * polynomial hash (the [[Winnowing]]/[[LshAudit]] family) avalanched
  * through [[Fnv64Expr]] so the Kirsch–Mitzenmacher double hashing
  * inside [[BloomFns.positions]] sees a full-width 64-bit key. Two
  * cheaper feeds were MEASURED by this audit and rejected — `gh·2³³`
  * (position 0 collapses to `0 mod m` for every key) and
  * `gh·(2³³+1)` (every position mod the power-of-two m is a function
  * of gh's low 16 bits alone, so keys sharing low bits collide on
  * ALL probes: measured FPR 33 899 ppm vs the model's 887, exactly
  * the member-class fraction 2233∕65536) — catching precisely such
  * schedule breaks is this operator's job, and it caught its own
  * first two feeds. A DuckDB oracle re-derives everything in HUGEINT
  * modular arithmetic (the q32 precedent): u = FNV-1a over gh's 8
  * little-endian bytes mod 2⁶⁴, h2 = oddify((u div 2³³) ·
  * 0xff51afd7ed558ccd mod 2⁶⁴), posᵢ = ((u + i·h2) mod 2⁶⁴) mod 2⁶³
  * mod m — bit-identical to the JVM's signed wraparound, `|1`,
  * `& Long.MaxValue`, `% numBits` sequence.
  * The engine ALSO re-derives the positions as DECIMAL(38,0)
  * columns for the ones-count, so the committed bitset math is
  * cross-checked against the aggregate's JVM path inside one query.
  *
  * Exact integer outputs: `fill_ppm = ones·10⁶ div m`,
  * `fpr_measured_ppm = fp·10⁶ div probes`, and the iid-bits model
  * `fpr_predicted_ppm = ones^k·10⁶ div m^k` (DECIMAL(38,0) powers —
  * k ≤ 4 at m ≤ 2¹⁸ stays < 10³⁸). Measured ≈ predicted is the
  * healthy signature; measured ≫ predicted exposes correlated
  * probe positions (a broken hash schedule).
  *
  * Returns ONE row: (n_members, n_probes, n_bits, n_hashes, n_ones,
  * fill_ppm, n_false_pos, fpr_measured_ppm, fpr_predicted_ppm).
  */
object BloomAudit {

  private val P = Classifier.HashPrime
  /** 0xff51afd7ed558ccd as unsigned — the murmur3 finalizer constant
    * [[BloomFns.positions]] multiplies by. */
  private val MixC = BigInt("18397679294719823053")

  def fprAudit(docs: DataFrame, numBits: Int = 1 << 16, numHashes: Int = 3,
      shingleSize: Int = 3, memberMod: Long = 10L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes >= 1 && numHashes <= 4 && numBits >= 64)
    // BloomAgg/BloomFns.positions probe mod mBits = numBits rounded UP to
    // a 64-bit word; this audit re-derives positions mod the raw numBits.
    // Insist the two moduli coincide, or the ones-count / prediction would
    // silently grade a different filter than the one probed.
    require(numBits % 64 == 0,
      s"numBits must be a multiple of 64 (the filter word-rounds to " +
        s"${(numBits + 63) / 64 * 64} bits; the audit would use $numBits)")
    val spark = docs.sparkSession

    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > lit(0))
    def gramHash(ts: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      aggregate(
        transform(sequence(lit(0), lit(shingleSize - 1)),
          j => Classifier.tokenHash(element_at(ts, i + j + 1))),
        lit(0L), (acc, h) => (acc * 10007L + h) % lit(P))
    def grams(d: DataFrame) = d
      .select(col(idCol).as("__id"), toks.as("__t"))
      .filter(size(col("__t")) >= shingleSize)
      .select(explode(array_distinct(
        transform(sequence(lit(0), size(col("__t")) - shingleSize),
          i => gramHash(col("__t"), i)))).as("__gh"))
      .distinct()

    val isMember = Splits.hashBucketN(col(idCol), memberMod) === 0
    val members = grams(docs.filter(isMember)).cache()
    members.count() // eager: bloom build + ones count + anti-join read it
    // probes exactly known non-member: distinct non-member-doc grams
    // minus the member gram set (the anti-join IS the ground truth)
    val probes = grams(docs.filter(!isMember))
      .join(members, Seq("__gh"), "left_anti")

    // FNV-1a avalanche of the prime-field gram hash (see [[Fnv64Expr]]
    // — without it every position mod the power-of-two m is a
    // function of gh's low bits and the measured FPR ran 38× the
    // model; the audit caught its own first feed)
    val feed = Columns.ofExpr(Fnv64Expr(Columns.exprOf(col("__gh"))))

    // production filter + production probe
    val blob = members.agg(
      BloomFns.bloomAgg(feed, numBits, numHashes).as("__bloom"))
    val probed = probes.crossJoin(broadcast(blob))
      .agg(count(lit(1)).as("n_probes"),
        sum(when(BloomFns.bloomContains(col("__bloom"), feed), 1L)
          .otherwise(0L)).as("n_false_pos"))

    // ones count: re-derive every member position in DECIMAL(38,0)
    // over the UNSIGNED image of the signed feed — the same u/h2/pos
    // sequence positions() runs with long wraparound. The 2³³ divide
    // subtracts the remainder first: a rounded decimal division could
    // cross the integer boundary, an exactly-divisible one cannot.
    val ones = members
      .select(feed.as("__f"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("__i"))
      .withColumn("__u",
        expr("pmod(cast(__f as decimal(38,0)), 18446744073709551616)"))
      .withColumn("__hi",
        expr("cast((__u - pmod(__u, 8589934592)) / 8589934592 as decimal(38,0))"))
      .withColumn("__h2",
        expr(s"pmod(__hi * ${MixC}, 18446744073709551616)"))
      .withColumn("__h2o", expr("__h2 - pmod(__h2, 2) + 1"))
      .select(expr(s"""cast(pmod(pmod(pmod(__u + __i * __h2o,
        18446744073709551616), 9223372036854775808), $numBits) as bigint)""")
        .as("__pos"))
      .agg(countDistinct(col("__pos")).as("n_ones"))

    val nm = members.agg(count(lit(1)).as("n_members"))
    val m = lit(numBits.toLong)
    nm.crossJoin(probed).crossJoin(ones)
      .select(col("n_members"), col("n_probes"),
        m.as("n_bits"), lit(numHashes.toLong).as("n_hashes"),
        col("n_ones"),
        expr(s"(n_ones * 1000000) div ${numBits.toLong}").as("fill_ppm"),
        col("n_false_pos"),
        when(col("n_probes") > 0,
          expr("(n_false_pos * 1000000) div n_probes")).as("fpr_measured_ppm"),
        // ones^k·10⁶ div m^k in DECIMAL(38,0) — exact (pow() is a
        // double function and ones^k can pass 2⁵³)
        expr(s"""cast((cast(n_ones as decimal(38,0))${
          " * n_ones" * (numHashes - 1)} * 1000000)
            div cast(${BigInt(numBits).pow(numHashes)} as decimal(38,0))
            as bigint)""").as("fpr_predicted_ppm"))
  }
}
