package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the graph-density
  * primitive beside [[PageRank]] (influence), the dedup funnel's
  * connected components (reachability) and [[Triangles]] (local
  * closure). The k-core is the maximal subgraph where every node
  * keeps degree ≥ k after all lower-degree nodes are removed; on a
  * near-dup candidate graph it isolates the dense template families
  * that survive any single-document removal (where a star collapses),
  * and on a co-occurrence graph it extracts the stable phrase
  * vocabulary from incidental adjacency.
  *
  * Peeling runs AT MOST a fixed number of rounds, not to an unbounded
  * data-dependent fixpoint — the [[Clustering.kmeans]] bounded-round
  * contract that keeps the computation a pure function of
  * (graph, k, rounds) and lets a SQL oracle replay every round as a
  * generated CTE. A converged graph exits early (unchanged edge count
  * ⇒ unchanged edge set ⇒ every remaining round is the identity), so
  * early exit is output-identical to the full-round run and the
  * fixed-round oracle contract survives untouched. Each
  * round is two map-side-combined degree aggregations and two
  * LEFT SEMI joins (edge endpoints against surviving nodes) — all
  * shuffle-keyed equi-joins, no driver-side state, and the frames
  * SHRINK monotonically so later rounds are cheaper than earlier
  * ones. Rounds converge when two consecutive edge sets are equal;
  * for production fixpoint use, callers size `rounds` at the graph's
  * degeneracy ordering depth (≤ max degree; peeling removes at least
  * one node per non-converged round, and real graphs converge in a
  * handful). Lineage is cut EVERY round with an eager
  * localCheckpoint — unlike [[PageRank]] (whose loop state enters
  * each round's plan about twice, linear growth), the surviving edge
  * set appears FIVE times in the next round's tree (main branch +
  * twice in each semi-join's degree subquery), so an unchecked peel
  * is 5^R plan nodes: rounds = 6 measured MINUTES of Catalyst
  * analysis on a 5-edge graph. One blocking materialization of a
  * shrinking frame per round is the price of a constant-size plan.
  */
object KCore {

  /** Nodes of the k-core approximation after `rounds` peels, with
    * their degree in the surviving subgraph. Input edges may be in
    * any orientation with duplicates/self-loops (canonicalized
    * first). Returns (node, degree) — empty when the whole graph
    * peels away. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 8,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var e = edges
      .select(least(col(aCol), col(bCol)).as("__lo"),
        greatest(col(aCol), col(bCol)).as("__hi"))
      .filter(col("__lo") < col("__hi"))
      .distinct()
    var lastCkpt: DataFrame = null
    // Convergence early-exit is EXACT, not an approximation of the
    // fixed-round contract: peeling only ever REMOVES edges, so an
    // unchanged edge COUNT means an unchanged edge SET, and every
    // remaining round would be the identity — the early-exit output is
    // bit-identical to the full-rounds output (KCoreSpec proves it on
    // a cascade graph). The count() is free in practice: the frame was
    // just eagerly localCheckpointed, so it reads cached partitions.
    var prevEdges = -1L
    var i = 0
    while (i < rounds && prevEdges != 0L) {
      val deg = e.select(col("__lo").as("__n"))
        .unionAll(e.select(col("__hi").as("__n")))
        .groupBy("__n").agg(count(lit(1)).as("__d"))
      val alive = deg.filter(col("__d") >= k).select(col("__n"))
      e = e
        .join(alive.withColumnRenamed("__n", "__lo"), Seq("__lo"), "left_semi")
        .join(alive.withColumnRenamed("__n", "__hi"), Seq("__hi"), "left_semi")
        .localCheckpoint(true)
      if (lastCkpt != null) lastCkpt.unpersist()
      lastCkpt = e
      val n = e.count()
      if (n == prevEdges) i = rounds else { prevEdges = n; i += 1 }
    }
    // degrees of the round-R surviving subgraph, UNFILTERED — if the
    // peel converged these are all ≥ k (the spec's convergence
    // assertion); filtering here would diverge from the round-exact
    // oracle replay on a non-converged graph
    e.select(col("__lo").as("__n")).unionAll(e.select(col("__hi").as("__n")))
      .groupBy(col("__n").as("node")).agg(count(lit(1)).as("degree"))
  }
}
