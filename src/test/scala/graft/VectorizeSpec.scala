package graft

import org.apache.spark.ml.linalg.Vector
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Vectorize

class VectorizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cos(a: Vector, b: Vector): Double = {
    val sa = a.toArray; val sb = b.toArray
    sa.zip(sb).map { case (x, y) => x * y }.sum
  }

  test("hashing TF-IDF scale path: identical docs at cosine 1, disjoint docs at 0") {
    val df = Seq(
      (0L, Seq("quick", "brown", "fox", "jumps")),
      (1L, Seq("quick", "brown", "fox", "jumps")),
      (2L, Seq("totally", "different", "words", "entirely"))
    ).toDF("id", "tags_lemmatized")
    val (_, out) = Vectorize.hashingTfIdf(df, minDocFreq = 0)
    val vecs = out.select("id", "norm_features").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    // L2-normalized → dot product IS cosine
    assert(math.abs(cos(vecs(0L), vecs(1L)) - 1.0) < 1e-9)
    assert(math.abs(cos(vecs(0L), vecs(2L))) < 1e-9)
    assert(math.abs(cos(vecs(0L), vecs(0L)) - 1.0) < 1e-9)
  }

  test("hashing path agrees with the CountVectorizer path on neighbor ordering") {
    // same corpus through both paths: the nearest neighbor of each doc
    // (by cosine over the TF-IDF vectors) must agree — the hash trick
    // may permute feature indices but not the geometry
    val docs = Seq(
      (0L, Seq("space", "opera", "galaxy", "hero", "ship")),
      (1L, Seq("space", "opera", "galaxy", "hero", "fleet")),
      (2L, Seq("romance", "paris", "love", "letter", "rain")),
      (3L, Seq("romance", "paris", "love", "letter", "cafe")),
      (4L, Seq("heist", "bank", "crew", "vault", "plan"))
    ).toDF("id", "tags_lemmatized")
    def nn(vecs: Map[Long, Vector]): Map[Long, Long] =
      vecs.map { case (i, v) =>
        i -> vecs.filter(_._1 != i)
          .map { case (j, w) => (j, cos(v, w)) }
          .maxBy { case (j, c) => (c, -j) }._1
      }
    val (_, hashed) = Vectorize.hashingTfIdf(docs, minDocFreq = 0)
    val hv = hashed.select("id", "norm_features").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    val (_, counted) = Vectorize(docs,
      Vectorize.Config(minDF = 1.0, minDocFreq = 0))
    val cv = counted.select("id", "norm_features").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    assert(nn(hv) === nn(cv))
  }
}
