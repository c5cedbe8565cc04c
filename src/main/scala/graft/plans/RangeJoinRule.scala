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
  * Gated by `spark.graft.rangeJoin.bucketWidth` (positive long,
  * unset = rule is a no-op): bucket width is a data-dependent choice —
  * pick ≈ the typical interval width — so the engine never guesses.
  * Scope is deliberately narrow and safe: INNER joins whose condition
  * is EXACTLY the two range conjuncts over integral attributes, point
  * attribute from one side and both bounds from the other. Anything
  * else is left untouched. Null buckets never equi-match, which is
  * exactly the original semantics (a null comparison filters the row).
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

  /** (point, start, end) when the condition is exactly
    * `p >= s AND p < e` (in any written orientation). */
  private def decompose(cond: Expression): Option[(Attribute, Attribute, Attribute)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.size != 2) return None
    def asGe(e: Expression): Option[(Attribute, Attribute)] = e match {
      case GreaterThanOrEqual(p: Attribute, s: Attribute) => Some((p, s))
      case LessThanOrEqual(s: Attribute, p: Attribute)    => Some((p, s))
      case _                                              => None
    }
    def asLt(e: Expression): Option[(Attribute, Attribute)] = e match {
      case LessThan(p: Attribute, en: Attribute)    => Some((p, en))
      case GreaterThan(en: Attribute, p: Attribute) => Some((p, en))
      case _                                        => None
    }
    val pairs = Seq(
      (asGe(conjuncts.head), asLt(conjuncts(1))),
      (asGe(conjuncts(1)), asLt(conjuncts.head)))
    pairs.collectFirst {
      case (Some((p1, s)), Some((p2, e))) if p1.semanticEquals(p2) &&
        isIntegral(p1.dataType) && isIntegral(s.dataType) &&
        isIntegral(e.dataType) => (p1, s, e)
    }
  }

  private def isIntegral(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
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
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        decompose(cond) match {
          // point from the left, interval bounds from the right
          case Some((p, s, e)) if left.outputSet.contains(p) &&
              right.outputSet.contains(s) && right.outputSet.contains(e) =>
            rewrite(left, right, p, s, e, cond, hint, w, pointIsLeft = true)
          // mirrored orientation
          case Some((p, s, e)) if right.outputSet.contains(p) &&
              left.outputSet.contains(s) && left.outputSet.contains(e) =>
            rewrite(right, left, p, s, e, cond, hint, w, pointIsLeft = false)
          case _ => j
        }
    }
  }

  private def rewrite(points: LogicalPlan, intervals: LogicalPlan,
      p: Attribute, s: Attribute, e: Attribute, cond: Expression,
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
