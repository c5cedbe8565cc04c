package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive point-in-interval inequality join
  * into the bucketized equi-join of [[graft.ops.RangeJoin]].
  *
  * A plain `SELECT ... FROM p JOIN i ON p.ts >= i.s AND p.ts < i.e`
  * plans as BroadcastNestedLoopJoin — quadratic row traffic that
  * silently falls over at scale. When this rule is active it becomes:
  * point side projects `bucket = floordiv(ts, w)`, interval side
  * explodes `sequence(floordiv(s, w), floordiv(e, w))`, and the join
  * runs as a hash equi-join on the bucket with the original range
  * predicate kept as the exact post-filter. The interval side explodes
  * through the END bucket inclusively — one possibly-spurious bucket
  * per interval, eliminated by the exact filter, which keeps the
  * rewrite correct for any operand values without reasoning about the
  * exclusive bound's cell.
  *
  * The condition may carry EXTRA conjuncts beyond the range pair — the
  * q61 SQL shape `ON a.cust = b.cust AND p >= s AND p < e` rewrites
  * too. The whole original condition is kept as the post-filter, so
  * any extra conjunct stays exactly as written; extra EQUALITY
  * conjuncts are additionally folded into the physical hash-join keys
  * for free, because ExtractEquiJoinKeys collects every equality in
  * the rewritten condition alongside the injected bucket equality
  * (mirroring `RangeJoin.intervalOverlap`'s `extraKeys`). The range
  * operands may be arbitrary deterministic integral expressions, not
  * just bare columns — `CAST(ts AS BIGINT) >= s` buckets on the cast
  * value.
  *
  * Gated by `spark.graft.rangeJoin.bucketWidth` (positive long,
  * unset = rule is a no-op): bucket width is a data-dependent choice —
  * pick ≈ the typical interval width — so the engine never guesses.
  * Scope: INNER joins whose condition contains a `p >= s AND p < e`
  * conjunct pair with the point expression computed from one side and
  * both bounds from the other. Anything else is left untouched. Null
  * buckets never equi-match, which is exactly the original semantics
  * (a null comparison filters the row).
  */
case class RangeJoinRule() extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.bucketWidth"

  private def floorDiv(x: Expression, w: Long): Expression = {
    val cast = Cast(x, LongType)
    val wl = Literal(w)
    // (x - pmod(x, w)) div w == floor(x / w) for any sign, and the
    // subtraction makes the division exact
    IntegralDivide(Subtract(cast, Pmod(cast, wl)), wl)
  }

  /** Candidate (point, start, end) triples: one `>=` and one `<`
    * conjunct over a semantically equal point expression, any other
    * conjuncts permitted (they stay in the post-filter). Operands may
    * be any deterministic integral expression (covers Cast-wrapped
    * columns). */
  private def decompose(cond: Expression): Seq[(Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def usable(e: Expression): Boolean = e.deterministic && isIntegral(e.dataType)
    def asGe(c: Expression): Option[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(p, s) => Some((p, s))
      case LessThanOrEqual(s, p)    => Some((p, s))
      case _                        => None
    }
    def asLt(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThan(p, en)    => Some((p, en))
      case GreaterThan(en, p) => Some((p, en))
      case _                  => None
    }
    val ges = conjuncts.zipWithIndex.flatMap { case (c, i) => asGe(c).map((_, i)) }
    val lts = conjuncts.zipWithIndex.flatMap { case (c, i) => asLt(c).map((_, i)) }
    for {
      ((p1, s), i) <- ges
      ((p2, e), j) <- lts
      if i != j && p1.semanticEquals(p2) &&
        usable(p1) && usable(s) && usable(e) && p1.references.nonEmpty
    } yield (p1, s, e)
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Candidate (sL, eL, sR, eR) interval-OVERLAP quadruples: two ≤/<
    * conjuncts `sideA.start ≤ sideB.end AND sideB.start ≤ sideA.end`
    * (strict or not — the original condition stays as the exact
    * post-filter either way). Returned oriented against (left, right)
    * output sets; extra conjuncts are permitted exactly as in the
    * point-in-interval shape. */
  private def decomposeOverlap(cond: Expression,
      leftOut: AttributeSet, rightOut: AttributeSet)
      : Option[(Expression, Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def usable(e: Expression): Boolean = e.deterministic && isIntegral(e.dataType)
    // normalize any ≤/< conjunct to (lo, hi): lo ≤ hi or lo < hi
    def asLe(c: Expression): Option[(Expression, Expression)] = c match {
      case LessThanOrEqual(lo, hi)    => Some((lo, hi))
      case LessThan(lo, hi)           => Some((lo, hi))
      case GreaterThanOrEqual(hi, lo) => Some((lo, hi))
      case GreaterThan(hi, lo)        => Some((lo, hi))
      case _                          => None
    }
    val les = conjuncts.zipWithIndex.flatMap { case (c, i) => asLe(c).map((_, i)) }
    val pairs = for {
      ((l1, h1), i) <- les
      ((l2, h2), j) <- les
      if i != j && Seq(l1, h1, l2, h2).forall(usable)
      // c_i: sL ≤ eR, c_j: sR ≤ eL — the left interval is [l1, h2],
      // the right interval is [l2, h1]
      if l1.references.nonEmpty && l1.references.subsetOf(leftOut) &&
        h2.references.nonEmpty && h2.references.subsetOf(leftOut) &&
        l2.references.nonEmpty && l2.references.subsetOf(rightOut) &&
        h1.references.nonEmpty && h1.references.subsetOf(rightOut)
    } yield (l1, h2, l2, h1)
    pairs.headOption
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(confKey, "").trim
    if (width.isEmpty) return plan
    // a malformed width must not take down every query on the session —
    // degrade to a no-op with a log line instead of throwing mid-optimize
    val w = scala.util.Try(width.toLong).toOption.filter(_ > 0).getOrElse {
      logWarning(s"$confKey='$width' is not a positive long; range-join rewrite disabled")
      return plan
    }
    plan.transformUp {
      // the sentinel __rjb_ attributes mark a join this rule already
      // rewrote: the original range conjuncts are intentionally still
      // present as the post-filter, so without this guard the rule
      // would re-match its own output every fixed-point iteration and
      // explode the plan until the optimizer's max-iteration limit
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.references.exists(_.name.startsWith("__rjb_")) =>
        val candidates = decompose(cond)
        // the point expression must be computable from one side alone
        // and both bounds from the other; first candidate that
        // orients wins
        val oriented = candidates.collectFirst {
          case (p, s, e) if p.references.subsetOf(left.outputSet) &&
              (s.references ++ e.references).subsetOf(right.outputSet) =>
            (left, right, p, s, e, true)
          case (p, s, e) if p.references.subsetOf(right.outputSet) &&
              (s.references ++ e.references).subsetOf(left.outputSet) =>
            (right, left, p, s, e, false)
        }
        oriented match {
          case Some((points, intervals, p, s, e, pointIsLeft)) =>
            rewrite(points, intervals, p, s, e, cond, hint, w, pointIsLeft)
          case None =>
            // fall back to the interval-overlap shape (sL ≤ eR AND
            // sR ≤ eL) — tried second because the point shape's plan
            // is cheaper (one-sided explode, no dedup conjunct) and
            // point-in-interval also parses as a degenerate overlap.
            // Gated by its OWN opt-in: syntactically, ANY two
            // cross-side inequalities parse as an "overlap" (e.g.
            // `a.price <= b.budget AND b.min_qty <= a.qty` — two
            // unrelated constraints), and whether the synthesized
            // (start, end) pairs are genuine intervals with
            // start <= end is a semantic fact only the user knows.
            // The point shape needs no such assertion (an inverted
            // interval provably matches nothing there).
            val overlapOn = conf
              .getConfString("spark.graft.rangeJoin.overlap.enabled", "false")
              .trim.equalsIgnoreCase("true")
            if (!overlapOn) j
            else decomposeOverlap(cond, left.outputSet, right.outputSet) match {
              case Some((sL, eL, sR, eR)) =>
                rewriteOverlap(left, right, sL, eL, sR, eR, cond, hint, w)
              case None => j
            }
        }
    }
  }

  /** Both sides explode their covered buckets; the join runs on bucket
    * equality (plus any extra equality conjuncts, via
    * ExtractEquiJoinKeys) with the original condition as the exact
    * post-filter. A pair can collide in many buckets, but its overlap
    * region begins at greatest(sL, sR) — keeping only THAT bucket's
    * collision emits each pair exactly once without a distinct pass
    * (same trick as [[graft.ops.RangeJoin.intervalOverlap]]).
    *
    * INVERTED rows (start > end) raise a descriptive runtime error
    * instead of bucketizing: unlike the point shape — where an
    * inverted interval provably matches nothing and an empty explode
    * is exact — an inverted row CAN satisfy the raw overlap condition
    * (e.g. [50,40] vs [0,1000]), but its match region is unbounded and
    * cannot be bucketized. Failing loudly keeps the rewrite sound on
    * every input: valid data pays nothing, invalid data gets an error
    * naming the fix instead of silently missing rows. */
  private def rewriteOverlap(left: LogicalPlan, right: LogicalPlan,
      sL: Expression, eL: Expression, sR: Expression, eR: Expression,
      cond: Expression, hint: JoinHint, w: Long): LogicalPlan = {
    def explodeBuckets(side: LogicalPlan, s: Expression, e: Expression,
        outName: String): (LogicalPlan, AttributeReference) = {
      val sB = floorDiv(s, w)
      val eB = floorDiv(e, w)
      val err = Cast(new RaiseError(Literal(
        "graft range-join: the interval-overlap rewrite requires start <= end " +
          "on every row (an inverted interval's raw-SQL matches cannot be " +
          "bucketized). Fix the data or unset " +
          "spark.graft.rangeJoin.bucketWidth to run the naive plan.")),
        org.apache.spark.sql.types.ArrayType(LongType))
      val empty = Literal.create(Seq.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType))
      // a NULL bound matches nothing under the raw condition (null
      // comparison filters the row), so it must DROP silently — only a
      // definitely-inverted row raises. Without the null guard the
      // If predicate evaluates null and falls into the error branch.
      val seq = If(Or(IsNull(sB), IsNull(eB)), empty,
        If(LessThanOrEqual(sB, eB),
          new Sequence(sB, eB, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
          err))
      val out = AttributeReference(outName, LongType, nullable = true)()
      (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(out), side), out)
    }
    val (lG, lB) = explodeBuckets(left, sL, eL, "__rjb_l")
    val (rG, rB) = explodeBuckets(right, sR, eR, "__rjb_r")
    // emit-once guard: only the collision in the bucket that contains
    // the overlap's start survives. greatest(sL, sR) lies inside both
    // intervals whenever the original condition holds, so exactly one
    // bucket passes — and the exact post-filter already removed
    // non-overlapping pairs before this can matter.
    val dedup = EqualTo(lB,
      floorDiv(Greatest(Seq(Cast(sL, LongType), Cast(sR, LongType))), w))
    val newCond = And(EqualTo(lB, rB), And(cond, dedup))
    val joined = Join(lG, rG, Inner, Some(newCond), hint)
    Project(left.output ++ right.output, joined)
  }

  private def rewrite(points: LogicalPlan, intervals: LogicalPlan,
      p: Expression, s: Expression, e: Expression, cond: Expression,
      hint: JoinHint, w: Long, pointIsLeft: Boolean): LogicalPlan = {
    val pBucket = Alias(floorDiv(p, w), "__rjb_p")()
    val pointsP = Project(points.output :+ pBucket, points)

    // inverted (end < start) intervals must yield no rows, not a
    // sequence() boundary error like the raw expression would throw
    val sB = floorDiv(s, w)
    val eB = floorDiv(e, w)
    // Sequence is TimeZoneAware: without an explicit zone the new node
    // is unresolved and the optimizer rejects the rewritten plan
    val seq = If(LessThanOrEqual(sB, eB),
      new Sequence(sB, eB, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
      Literal.create(Seq.empty[Long], org.apache.spark.sql.types.ArrayType(LongType)))
    val genOut = AttributeReference("__rjb_i", LongType, nullable = true)()
    val intervalsG = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(genOut), intervals)

    // keep the FULL original condition as the exact post-filter: extra
    // conjuncts (equalities, further inequalities) apply unchanged, and
    // equality conjuncts among them join the bucket key in
    // ExtractEquiJoinKeys' key set
    val newCond = And(EqualTo(pBucket.toAttribute, genOut), cond)
    val joined =
      if (pointIsLeft) Join(pointsP, intervalsG, Inner, Some(newCond), hint)
      else Join(intervalsG, pointsP, Inner, Some(newCond), hint)
    // restore the original output (drop the bucket columns)
    val original =
      if (pointIsLeft) points.output ++ intervals.output
      else intervals.output ++ points.output
    Project(original, joined)
  }
}
