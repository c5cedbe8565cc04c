package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distance-sanity checks for the rows-only battery queries (the ones
  * the DuckDB gate cannot hash-verify because their candidate sets are
  * seed-dependent): run the LITERAL `SparkEntry.queries` entry against
  * the real testdata, then re-derive every emitted distance/cosine
  * with an independent driver-side implementation — the in-battery
  * analog of the reference notebook's manual neighbor validation
  * (transform/execute.ipynb cells 76-86). A wrong distance formula,
  * broken normalization, or corrupted candidate join fails here even
  * though the pair SET itself is legitimately seed-dependent. */
class RowsOnlySanitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** id → raw embedding, collected once (500 rows, bounded). */
  private lazy val raw: Map[Long, Array[Double]] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q43 battery output: every emitted pair's cosine re-derives exactly") {
    val rows = SparkEntry.queries("q43_lsh_neardup")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cosine")))
    assert(rows.nonEmpty, "the RP config must produce candidates at this sf")
    val seen = collection.mutable.Set.empty[(Long, Long)]
    rows.foreach { case (a, b, cos) =>
      assert(a < b, s"pair ($a,$b) must be emitted in canonical order")
      assert(seen.add((a, b)), s"pair ($a,$b) emitted twice")
      val expected = cosine(raw(a), raw(b))
      assert(math.abs(cos - expected) < 1e-9,
        s"pair ($a,$b): emitted cosine $cos vs re-derived $expected")
      assert(cos >= 0.395, s"pair ($a,$b) below the declared threshold")
    }
  }

  test("q33 battery output: every emitted LSH distance re-derives exactly") {
    val rows = SparkEntry.queries("q33_ann_lsh")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("distance")))
    assert(rows.length === 10)
    val q = raw(0L)
    rows.foreach { case (id, dist) =>
      assert(id !== 0L, "query vector must be self-excluded")
      val v = raw(id)
      val expected = math.sqrt(q.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum)
      assert(math.abs(dist - expected) < 1e-9,
        s"neighbor $id: emitted distance $dist vs re-derived $expected")
    }
    // emitted in ascending-distance order (ties by id)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
  }

  test("q30 battery output: recommendations are distance-consistent") {
    // q30 recommends doc neighbors via seeded MLlib LSH over TF-IDF
    // vectors — the vectors themselves are fit-dependent, so only
    // structural properties are checkable: k rows, no self, no dups
    val rows = SparkEntry.queries("q30_doc_recommend")(spark, dir).collect()
    assert(rows.length === 10)
    val ids = rows.map(_.getAs[Long](0))
    assert(ids.distinct.length === ids.length, "no duplicate recommendations")
  }
}
