package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Lemmatizer, TextFunctions}

class LemmatizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("suffix rules") {
    assert(Lemmatizer.lemma("cats") === "cat")
    assert(Lemmatizer.lemma("flies") === "fly")
    assert(Lemmatizer.lemma("boxes") === "box")
    assert(Lemmatizer.lemma("classes") === "class")
    assert(Lemmatizer.lemma("running") === "run")
    assert(Lemmatizer.lemma("walked") === "walk")
    assert(Lemmatizer.lemma("tried") === "try")
    assert(Lemmatizer.lemma("bigger") === "big")
    assert(Lemmatizer.lemma("discovers") === "discover")
    assert(Lemmatizer.lemma("quickly") === "quick")
  }

  test("irregulars") {
    assert(Lemmatizer.lemma("was") === "be")
    assert(Lemmatizer.lemma("children") === "child")
    assert(Lemmatizer.lemma("said") === "say")
    assert(Lemmatizer.lemma("wrote") === "write")
  }

  test("short tokens and nulls pass through") {
    assert(Lemmatizer.lemma("ab") === "ab")
    assert(Lemmatizer.lemma("") === "")
    assert(Lemmatizer.lemma(null) === null)
  }

  test("deterministic and total on arbitrary alphanumeric tokens") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(12)).mkString.toLowerCase
      assert(Lemmatizer.lemma(s) === Lemmatizer.lemma(s))
      assert(Lemmatizer.lemma(s) != null)
    }
  }

  test("catalyst expression matches the pure function (codegen path)") {
    import spark.implicits._
    TextFunctions.register(spark)
    val words = Seq("cats", "running", "was", "movies", "x", "spell")
    val got = words.toDF("w")
      .select(TextFunctions.lemmatize(col("w")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got === words.map(Lemmatizer.lemma))
  }

  test("expression usable from SQL after registration") {
    TextFunctions.register(spark)
    val r = spark.sql("SELECT graft_lemmatize('testing') AS l").collect().head
    assert(r.getString(0) === "test")
  }
}
