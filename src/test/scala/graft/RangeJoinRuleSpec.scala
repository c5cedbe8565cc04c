package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule that turns naive inequality range joins
  * into bucketized equi-joins. Sessions built with GraftExtensions +
  * the width conf must produce identical results WITHOUT a
  * BroadcastNestedLoopJoin in the physical plan. */
class RangeJoinRuleSpec extends AnyFunSuite {

  // getOrCreate would reuse the shared test session (ignoring
  // withExtensions); clear the active/default handles so a fresh
  // session on the same SparkContext is built WITH the extensions
  // (same pattern as EngineSpec's extensions test).
  private lazy val spark: SparkSession = {
    val prior = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rangejoin-rule")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.engine.GraftExtensions())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.setActiveSession(prior)
    SparkSession.setDefaultSession(prior)
    s
  }

  private def fixtures(): Unit = {
    import spark.implicits._
    Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L).toDF("p")
      .createOrReplaceTempView("pts")
    Seq((1L, 0L, 10L), (2L, 10L, 101L), (3L, 100L, 100L),
      (4L, 240L, 260L), (5L, 50L, 40L))  // 5 = inverted interval
      .toDF("iid", "s", "e").createOrReplaceTempView("iv")
  }

  private val q =
    "SELECT iid, p FROM pts JOIN iv ON pts.p >= iv.s AND pts.p < iv.e"

  test("inequality join rewrites to a bucket equi-join with identical results") {
    fixtures()
    spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
    val naive = spark.sql(q)
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "without the conf the naive plan must remain (and be a BNLJ)")
    val expected = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "7")
    try {
      val rewritten = spark.sql(q)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewritten plan still nested-loop:\n$plan")
      assert(plan.contains("Generate"), "interval side must explode buckets")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)
      assert(got.nonEmpty)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("mirrored orientation (intervals on the left) also rewrites") {
    fixtures()
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "16")
    try {
      val df = spark.sql(
        "SELECT iid, p FROM iv JOIN pts ON pts.p >= iv.s AND pts.p < iv.e")
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 0L)) && got.contains((4L, 250L)))
      assert(!got.exists(_._1 == 5L), "inverted interval matches nothing")
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("joins that are not pure range conditions are left untouched") {
    fixtures()
    spark.conf.set("spark.graft.rangeJoin.bucketWidth", "7")
    try {
      // extra equality conjunct -> out of the rule's narrow scope: the
      // equi-key already gives Spark a hash join, so no rewrite should
      // fire (no bucket Generate in the plan)
      val df = spark.sql(
        "SELECT iid, p FROM pts JOIN iv ON pts.p >= iv.s AND pts.p < iv.e AND pts.p = iv.iid")
      assert(!df.queryExecution.executedPlan.toString.contains("Generate"))
      // no point id coincides with an interval id inside its range
      assert(df.collect().isEmpty)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }
}
