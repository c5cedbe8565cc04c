package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** DATASET CARD: the one-call corpus datasheet ("Datasheets for
  * Datasets", Gebru'18, reduced to its quantitative skeleton) — a
  * single (stat, value) table a release ships next to the shards:
  * volume (docs / tokens / chars / distinct types), exact-duplicate
  * mass, per-language and per-source composition in exact ppm, exact
  * token-length percentiles, stopword mass, and the composite
  * quality-gate pass rate. Every number is an exact integer the
  * corpus's OTHER operators already agree on (same token rule, same
  * xxhash-free replayable arithmetic), so two engines produce the
  * identical card — the property a compliance artifact needs.
  *
  * Shape at scale: one token-collapse pass feeds type/token counts;
  * duplicates are one hash-groupBy; composition rows are
  * group-bounded aggregates; percentiles use the VALUE-DOMAIN
  * cumulative (one row per distinct length — bounded by the longest
  * document, not the corpus), never a global sort. Output is ~20
  * rows however large the corpus is.
  *
  * Percentile convention: pK = the smallest length L with
  * cum_docs(≤ L) · 100 ≥ K · n_docs (the lower-percentile / type-1
  * rule — integer-exact, no interpolation).
  *
  * Returns (stat, value) ordered by stat. Composition rows are named
  * `lang_<lang>_ppm` / `source_<source>_ppm`; shares are of n_docs.
  */
object DatasetCard {

  def card(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col(textCol)

    val base = docs.select(
      col(idCol),
      col("lang"), col("source"),
      TextStats.tokenCount(t).as("__ntok"),
      TextStats.charCount(t).as("__nchr"),
      TextStats.stopwordCount(t).as("__nstop"),
      when(TextStats.qualityScore(t) >= 0.5, 1L).otherwise(0L).as("__pass"),
      xxhash64(t).as("__th"), t.as("__tx"))
      .cache()
    base.count() // every arm below reads the one projection

    def one(name: String, v: org.apache.spark.sql.Column): DataFrame =
      base.agg(v.cast(LongType).as("value")).select(lit(name).as("stat"),
        col("value"))

    val nDocs = one("n_docs", count(lit(1)))
    val nTokens = one("n_tokens", sum(col("__ntok")))
    val nChars = one("n_chars", sum(col("__nchr")))
    val nStop = one("n_stopwords", sum(col("__nstop")))
    val passPpm = one("quality_pass_ppm",
      expr("(sum(__pass) * 1000000) div count(1)"))

    // distinct types over the corpus (one collapse)
    val types = base
      .select(explode(filter(TextStats.tokens(col("__tx")),
        x => length(x) > lit(0))).as("__tok"))
      .agg(countDistinct(col("__tok")).cast(LongType).as("value"))
      .select(lit("n_types").as("stat"), col("value"))

    // exact-duplicate mass: docs beyond the first of each text class
    // (hash leads the key so compares are 8-byte first)
    val dups = base.groupBy(col("__th"), col("__tx"))
      .agg(count(lit(1)).as("__c"))
      .agg((sum(col("__c")) - count(lit(1))).cast(LongType).as("value"))
      .select(lit("n_exact_dup_docs").as("stat"), col("value"))

    // composition ppm (of docs), one row per observed group value
    def shares(prefix: String, g: String): DataFrame = {
      val tot = base.agg(count(lit(1)).as("__n"))
      base.groupBy(col(g)).agg(count(lit(1)).as("__c"))
        .crossJoin(broadcast(tot))
        .select(concat(lit(prefix), col(g), lit("_ppm")).as("stat"),
          expr("(__c * 1000000) div __n").as("value"))
    }

    // exact token-length percentiles via the value-domain cumulative:
    // one row per DISTINCT length, never a corpus-sized window
    val perLen = base.groupBy(col("__ntok").as("__len"))
      .agg(count(lit(1)).as("__c"))
    val overLen = Window.orderBy(col("__len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perLen
      .withColumn("__cum", sum(col("__c")).over(overLen))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("__n"))))
    def pct(k: Int): DataFrame = cum
      .filter(col("__cum") * 100 >= lit(k.toLong) * col("__n"))
      .agg(min(col("__len")).cast(LongType).as("value"))
      .select(lit(f"len_p$k%02d").as("stat"), col("value"))

    nDocs.unionAll(nTokens).unionAll(nChars).unionAll(nStop)
      .unionAll(passPpm).unionAll(types).unionAll(dups)
      .unionAll(shares("lang_", "lang"))
      .unionAll(shares("source_", "source"))
      .unionAll(pct(50)).unionAll(pct(90)).unionAll(pct(99))
      .orderBy("stat")
  }

  /** CARD DIFF — the release-over-release drift gate: one [[card]]
    * per snapshot, full-outer joined on stat, per-stat delta. This is
    * the artifact a weekly 100 TB refresh actually reviews ("did the
    * p99 length move? did lang_de's share shift 3000 ppm? did dup
    * mass double?") — q197 produces the datasheet, q152 measures one
    * mixture's drift; this composes the whole card into one
    * before/after table. A composition row absent from one side (a
    * language or source that appeared or vanished) reads as a 0 ppm
    * share on that side, so appearing/vanishing groups surface as
    * their full share in `delta` instead of silently dropping out of
    * the join. Core stats exist on both sides by construction.
    *
    * Shape at scale: two card passes (each the ~20-row bounded
    * aggregate) + one ~20-row join — the diff itself costs nothing.
    *
    * Returns (stat, value_old, value_new, delta = new − old) ordered
    * by stat. */
  def cardDiff(oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val a = card(oldDocs, idCol, textCol)
      .withColumnRenamed("value", "value_old")
    val b = card(newDocs, idCol, textCol)
      .withColumnRenamed("value", "value_new")
    a.join(b, Seq("stat"), "full_outer")
      .select(col("stat"),
        coalesce(col("value_old"), lit(0L)).as("value_old"),
        coalesce(col("value_new"), lit(0L)).as("value_new"))
      .withColumn("delta", col("value_new") - col("value_old"))
      .orderBy("stat")
  }
}
