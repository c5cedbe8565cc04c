package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous LABEL-PROPAGATION communities (Raghavan–Albert–Kumara
  * '07) — the community primitive beside [[PageRank]] (influence),
  * [[Triangles]] (local closure) and [[KCore]] (density): on the
  * near-dup / fingerprint-overlap graph it names the template
  * families the pairwise edges only imply, the rollup a curation
  * dashboard actually groups by.
  *
  * Classic LPA is nondeterministic twice over — random update order
  * and random tie-breaks — which would make an oracle impossible.
  * Both are pinned here: full-synchronous rounds (every node updates
  * simultaneously from the PREVIOUS round's labels) and the
  * (count desc, label asc) argmax, so the result is a pure function
  * of (graph, rounds) and a SQL oracle replays every round as a
  * generated CTE — the [[KCore]] / q163 pattern. Rounds are bounded
  * like KCore's peels; synchronous LPA can oscillate (2-cycles on
  * bipartite-ish regions), which fixed rounds make harmless for
  * determinism — size `rounds` near the expected community diameter
  * (near-dup families are shallow; a handful suffices). A round that
  * changes no label short-circuits the remaining rounds exactly
  * (fixed point ⇒ identity from there on — KCore's convergence
  * argument in assignment form), so over-sizing `rounds` costs one
  * cheap node-bounded probe per converged round, not a full loop.
  *
  * Shape at scale: per round one edge⋈labels equi-join (shuffle on
  * node id), one map-side-combined (node, neighbor-label) count, one
  * max-count reduction and one tie-breaking min — all aggregates over
  * edge-bounded frames, no windows, no driver state. The argmax is
  * deliberately spelled max-then-filter-then-min instead of `max_by`
  * (whose ties are execution-order-dependent). The static directed
  * frame is localCheckpointed once; the label state every round — it
  * enters the next round's plan twice (join probe + the implicit
  * node set), the [[PageRank]] linear-growth case.
  */
object LabelProp {

  /** Community label per node after `rounds` synchronous updates.
    * Input edges may be in any orientation with duplicates/self-loops
    * (canonicalized first); initial label = own id. Returns
    * (node, community). */
  def propagate(edges: DataFrame, rounds: Int,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(rounds >= 1)
    val und = edges.select(least(col(aCol), col(bCol)).as("__lo"),
        greatest(col(aCol), col(bCol)).as("__hi"))
      .filter(col("__lo") < col("__hi")).distinct()
    val dir = und.select(col("__lo").as("__src"), col("__hi").as("__dst"))
      .unionAll(und.select(col("__hi").as("__src"), col("__lo").as("__dst")))
      .localCheckpoint(true)
    var labels = dir.select(col("__src").as("__n")).distinct()
      .select(col("__n"), col("__n").as("__lbl"))
    var lastCkpt: DataFrame = null
    var i = 0
    while (i < rounds) {
      val neigh = dir
        .join(labels.select(col("__n").as("__dst"), col("__lbl")), Seq("__dst"))
        .groupBy("__src", "__lbl").agg(count(lit(1)).as("__c"))
      val top = neigh.groupBy("__src").agg(max(col("__c")).as("__mc"))
      val next = neigh.join(top, Seq("__src"))
        .filter(col("__c") === col("__mc"))
        .groupBy(col("__src").as("__n")).agg(min(col("__lbl")).as("__lbl"))
        .localCheckpoint(true)
      // Convergence early-exit is EXACT (the [[KCore]] argument,
      // assignment form): full-sync LPA makes round t+1 a pure
      // function of round t's label map, so if this round changed NO
      // label, every remaining round is the identity and the output
      // is bit-identical to the full-rounds contract (LabelPropSpec
      // proves it). The check is one node-bounded equi-join between
      // two frames that are BOTH already eagerly checkpointed —
      // cached-partition reads, no recompute; changed counts the
      // symmetric difference via a full outer join so a node that
      // appeared/vanished (impossible here, but cheap to be exact
      // about) would also count as a change.
      val changed =
        if (lastCkpt == null) -1L // round 1: prior frame is the lazy
                                  // init projection, skip the probe
        else next.select(col("__n"), col("__lbl").as("__new"))
          .join(lastCkpt.select(col("__n"), col("__lbl").as("__old")),
            Seq("__n"), "full_outer")
          .filter(col("__new").isNull || col("__old").isNull ||
            col("__new") =!= col("__old"))
          .count()
      if (lastCkpt != null) lastCkpt.unpersist()
      lastCkpt = next
      labels = next
      if (changed == 0L) i = rounds else i += 1
    }
    labels.select(col("__n").as("node"), col("__lbl").as("community"))
  }
}
