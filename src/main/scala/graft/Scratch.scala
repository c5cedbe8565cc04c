package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the engine surface):
  * times sub-stages of whatever is currently being optimized.
  * Driven manually via `sbt "runMain graft.Scratch"`. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    import org.apache.spark.ml.functions.array_to_vector
    import graft.ops.Similarity
    val emb = graft.engine.Tables.embeddings(spark, sfDir)

    time("block-join nearestSameLabel") {
      graft.ops.Dedup.nearestSameLabel(emb).count()
    }
    spark.catalog.clearCache()

    val unit = emb.select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => x.cast("double") / Similarity.l2Norm(col("embedding"))).as("unit"))
    val withVec = unit.withColumn("v", array_to_vector(col("unit"))).cache()
    time("unit+cache") { withVec.count() }
    val km = time("kmeans fit") {
      new org.apache.spark.ml.clustering.KMeans()
        .setK(16).setSeed(42L).setInitMode("random").setMaxIter(8)
        .setFeaturesCol("v").setPredictionCol("list").fit(withVec)
    }
    time("transform+count") { km.transform(withVec).count() }
    spark.catalog.clearCache()

    time("full nearestSameLabelIvf") {
      Similarity.nearestSameLabelIvf(emb).count()
    }
    spark.catalog.clearCache()

    // stage-by-stage replay of the IVF internals
    {
      val km2 = time("fit2") {
        new org.apache.spark.ml.clustering.KMeans()
          .setK(16).setSeed(42L).setInitMode("random").setMaxIter(8)
          .setFeaturesCol("v").setPredictionCol("list").fit(withVec)
      }
      val assigned = km2.transform(withVec)
        .select(col("vec_id"), col("label"), col("unit"), col("list")).cache()
      time("assigned cache") { assigned.count() }
      val centroids = spark.createDataFrame(
        km2.clusterCenters.toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i, c.toArray.toSeq) })
        .toDF("c_list", "centroid")
      def eucl(a: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column) =
        sqrt(aggregate(zip_with(a, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      val listStats = assigned
        .join(broadcast(centroids), col("list") === col("c_list"))
        .groupBy(col("label").as("s_block"), col("list").as("s_list"))
        .agg(max(eucl(col("unit"), col("centroid"))).as("radius")).cache()
      time("listStats") { listStats.count() }
      val a = assigned.alias("a"); val b = assigned.alias("b")
      val pairs1 = a.join(b,
          col("a.label") === col("b.label") && col("a.list") === col("b.list") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("qid"), col("b.vec_id").as("cand"),
          Similarity.dot(col("a.unit"), col("b.unit")).as("cos")).cache()
      time("pairs1") { pairs1.count() }
      val best1 = pairs1.groupBy("qid").agg(max(col("cos")).as("best_cos")).cache()
      time("best1") { best1.count() }
      val probes = assigned
        .join(best1, col("vec_id") === col("qid"), "left")
        .withColumn("d1",
          when(col("best_cos").isNull, lit(Double.MaxValue)).otherwise(
            sqrt(greatest(lit(0.0), lit(2.0) - lit(2.0) * col("best_cos")))))
        .join(broadcast(centroids), col("c_list") =!= col("list"))
        .join(listStats,
          col("label") === col("s_block") && col("c_list") === col("s_list"))
        .filter(eucl(col("unit"), col("centroid")) - col("radius") <
          col("d1") + lit(1e-9))
        .select(col("vec_id").as("pid"), col("label").as("p_block"),
          col("unit").as("p_unit"), col("c_list").as("p_list")).cache()
      println(s"[scratch] probe rows: " + time("probes") { probes.count() })
      val m = assigned.alias("m")
      val pairs2 = probes.join(m,
          col("p_block") === col("m.label") && col("p_list") === col("m.list"))
        .select(col("pid").as("qid"), col("m.vec_id").as("cand"),
          Similarity.dot(col("p_unit"), col("m.unit")).as("cos")).cache()
      println(s"[scratch] pairs2 rows: " + time("pairs2") { pairs2.count() })
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("cand"))
      time("final window") {
        pairs1.union(pairs2).withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).count()
      }
    }
    spark.stop()
  }
}
