package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list in exact integer arithmetic.
  *
  * Ranks are maintained as longs scaled by 1e12 with floor division
  * everywhere, so the result is a pure function of the graph —
  * independent of partitioning, join order and summation order (double
  * arithmetic would make every run differ in the low bits; integer
  * PageRank is bit-reproducible on any cluster and oracle-checkable).
  *
  * Iteration shape, per round: one equi-join of ranks onto edges by
  * source (co-partitioned on the key both sides after the first
  * round), one map-side-combined sum by destination, one left join
  * back onto the vertex set for teleport-only vertices.
  *
  * Checkpoint cadence: with a SINGLE terminal action the whole
  * n-round DAG executes once, so mid-loop checkpoints are pure
  * blocking overhead at small n — an interleaved A/B at 5 rounds
  * measured the no-mid-checkpoint spelling faster in 3 of 4 cells
  * (aggregate ~18%, e.g. 8.4 s vs 14.4 s cold at 1.17M edges,
  * bit-identical output). Past `midCheckpointAbove` rounds the
  * analysis/codegen cost of the deepening plan takes over, so longer
  * runs cut lineage every other round (the connectedComponents
  * lesson). The returned frame is always backed by a final
  * localCheckpoint — the storage contract callers sweep.
  *
  * Dangling vertices (no out-edges) contribute nothing — their mass
  * exits the system rather than being redistributed (the original
  * MapReduce formulation); with damping 85% the iteration still
  * converges, and both the engine and the oracle compute the same
  * variant. Floor division also leaks ≤ 1e-12 of mass per division —
  * identically on both sides.
  */
object PageRank {

  val Scale: Long = 1000000000000L

  /** `iterations` rounds over `edges` (`src`, `dst` long columns;
    * duplicate edges are collapsed). Returns (id, rank_scaled).
    *
    * Storage contract: the returned frame is backed by the final
    * round's localCheckpoint (every intermediate one is unpersisted
    * here), so its blocks stay registered until the CALLER releases
    * them — `catalog.clearCache` does not touch RDD-level persists.
    * Long-lived callers should sweep `sc.getPersistentRDDs` once done
    * with the result (what `Bench` does after every query); one-shot
    * drivers like Verify can rely on session teardown. */
  def ranks(edges: DataFrame, iterations: Int, dampingPct: Int = 85,
      midCheckpointAbove: Int = 8): DataFrame = {
    require(iterations >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    // cache(), not localCheckpoint, for the two frames every round
    // joins: unlike connectedComponents (whose per-round join
    // re-aliases the edge side and silently missed its cache), these
    // joins reference the SAME Dataset objects each round, so the
    // columnar cache hits — and an A/B at x10 edges (11.7M) measured
    // the eager-checkpoint spelling ~45% SLOWER (22.2 s vs 15.3 s,
    // isolated JVMs): a checkpoint materializes row-format blocks up
    // front and every round scans them, where the cache serves the
    // five rounds from compressed columnar batches
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    // out-degree is static across rounds, so it is joined onto the
    // edge set ONCE here instead of once per round — each iteration
    // then does a single equi-join (ranks ⋈ weighted edges) rather
    // than two
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val we = e.join(outdeg, "src").cache()
    // two driver scalars (vertex count for the teleport share), not data
    val n = verts.count()
    val tele = (Scale * (100 - dampingPct) / 100) / n

    val midCkpt = iterations > midCheckpointAbove
    var ranks = verts.select(col("id"), lit(Scale / n).as("r"))
    if (midCkpt) ranks = ranks.localCheckpoint(true)
    var lastCkpt: DataFrame = if (midCkpt) ranks else null
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      val recv = ranks.join(we, ranks("id") === we("src"))
        .select(col("dst"), expr("r div od").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      // the left side is the rank frame itself (same id set as verts
      // every round), carrying the previous rank so the convergence
      // probe below is a filter over the just-checkpointed partitions
      val next = ranks.select(col("id"), col("r").as("__prev"))
        .join(recv, col("id") === recv("dst"), "left_outer")
        .select(col("id"),
          (lit(tele) + expr(s"($dampingPct * coalesce(s, 0L)) div 100")).as("r"),
          col("__prev"))
      // long runs checkpoint every OTHER round (a 2-round lineage caps
      // plan growth at half the blocking materializations); short runs
      // only checkpoint the LAST round — the returned-frame contract
      if ((midCkpt && i % 2 == 1) || i == iterations - 1) {
        val ck = next.localCheckpoint(true)
        // Convergence early-exit is EXACT (the KCore/LabelProp
        // argument, integer-rank form): round t+1 is a pure function
        // of round t's rank map, so a round that changed NO rank makes
        // every remaining round the identity — the early-exit output
        // is bit-identical to the fixed-rounds contract. Probed only
        // on checkpoint rounds (cached-partition read, no recompute)
        // and never on the final round (nothing left to skip), so
        // short fixed-round runs pay exactly nothing.
        converged = i < iterations - 1 &&
          ck.filter(col("r") =!= col("__prev")).limit(1).count() == 0L
        if (lastCkpt != null) lastCkpt.unpersist()
        lastCkpt = ck
        ranks = ck.select(col("id"), col("r"))
      } else ranks = next.select(col("id"), col("r"))
      i += 1
    }
    we.unpersist(); verts.unpersist()
    ranks.select(col("id"), col("r").as("rank_scaled"))
  }

  /** PERSONALIZED PageRank: teleport mass lands only on `seeds`
    * instead of uniformly — rank becomes proximity to the seed set,
    * the primitive behind "related items for THIS catalog section",
    * retrieval expansion from a trusted page set, and
    * contamination-neighborhood scoring from known-bad documents.
    * Same exact integer arithmetic as [[ranks]] (longs scaled 1e12,
    * floor division everywhere — bit-reproducible, oracle-checkable);
    * initial mass `Scale div |S|` on seeds and 0 elsewhere, per-round
    * teleport `(Scale·(100−d)/100) div |S|` on seeds and 0 elsewhere.
    * Seeds not present in the graph are ignored (mass is normalized
    * over the intersection).
    *
    * Iteration shape is [[ranks]]' (one equi-join + map-side-combined
    * sum + left join per round) with one difference: the vertex set
    * carries its per-vertex teleport as a column (built once with a
    * broadcast semi-probe of the seed set — seeds are small), so the
    * loop stays a single expression over the same cached frames. */
  def personalizedRanks(edges: DataFrame, seeds: DataFrame,
      iterations: Int, dampingPct: Int = 85,
      midCheckpointAbove: Int = 8): DataFrame = {
    require(iterations >= 1 && dampingPct > 0 && dampingPct < 100)
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    val sd = seeds.select(col("id").cast("long").as("id")).distinct()
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val seedVerts = verts.join(broadcast(sd), Seq("id"), "left_semi")
    val nS = seedVerts.count()
    require(nS > 0, "no seed is a vertex of the graph")
    val tele = (Scale * (100 - dampingPct) / 100) / nS
    require(tele > 0,
      s"personalizedRanks: teleport quantum floors to 0 at nS=$nS seeds " +
        s"(Scale=$Scale, dampingPct=$dampingPct) -- ranks would silently " +
        s"degenerate; raise Scale or shrink the seed set")
    // vertex frame with its teleport column AND an explicit seed flag —
    // seed membership must never be inferred from __tele > 0 (a floored
    // quantum would zero the seeds' initial mass instead of failing)
    val vt = verts
      .join(broadcast(sd.withColumn("__s", lit(1))), Seq("id"), "left_outer")
      .select(col("id"), col("__s").isNotNull.as("__seed"),
        when(col("__s").isNotNull, lit(tele)).otherwise(lit(0L)).as("__tele"))
      .cache()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val we = e.join(outdeg, "src").cache()

    val midCkpt = iterations > midCheckpointAbove
    // the per-vertex teleport rides INSIDE the rank frame so each
    // round stays one equi-join and the convergence probe can carry
    // the previous rank without re-joining vt
    var ranks = vt.select(col("id"), col("__tele"),
      when(col("__seed"), lit(Scale / nS)).otherwise(lit(0L)).as("r"))
    if (midCkpt) ranks = ranks.localCheckpoint(true)
    var lastCkpt: DataFrame = if (midCkpt) ranks else null
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      val recv = ranks.join(we, ranks("id") === we("src"))
        .select(col("dst"), expr("r div od").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      val next = ranks.select(col("id"), col("__tele"), col("r").as("__prev"))
        .join(recv, col("id") === recv("dst"), "left_outer")
        .select(col("id"), col("__tele"),
          (col("__tele") + expr(s"($dampingPct * coalesce(s, 0L)) div 100")).as("r"),
          col("__prev"))
      if ((midCkpt && i % 2 == 1) || i == iterations - 1) {
        val ck = next.localCheckpoint(true)
        // exact convergence early-exit — see [[ranks]]
        converged = i < iterations - 1 &&
          ck.filter(col("r") =!= col("__prev")).limit(1).count() == 0L
        if (lastCkpt != null) lastCkpt.unpersist()
        lastCkpt = ck
        ranks = ck.select(col("id"), col("__tele"), col("r"))
      } else ranks = next.select(col("id"), col("__tele"), col("r"))
      i += 1
    }
    we.unpersist(); vt.unpersist()
    ranks.select(col("id"), col("r").as("rank_scaled"))
  }
}
