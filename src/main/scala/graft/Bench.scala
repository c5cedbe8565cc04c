package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT + FS metadata so the first timed query
    // doesn't absorb session fixed costs
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    // optional args = query-name subset, for single-query iteration
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failed query's "time" is meaningless — surface it loudly
          // instead of letting a fast failure masquerade as a speedup
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failures += name
      }
      // queries may cache internally; drop those entries so successive
      // timings are independent and the session's memory stays flat
      spark.catalog.clearCache()
      name -> (System.nanoTime() - t0) / 1e9
    }
    // failed queries' times are time-to-exception, not measurements —
    // keep them out of both the map and the total so a fast failure
    // can never read as a speedup
    val ok = results.filterNot { case (k, _) => failures.contains(k) }
    // slowest first: regressions visible at a glance
    val qs = ok.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
