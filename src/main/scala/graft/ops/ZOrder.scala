package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

import graft.engine.Columns

/** Morton / Z-order interleave of the low 32 bits of two integral
  * columns: bit i of `left` lands at result bit 2i, bit i of `right`
  * at 2i+1.
  *
  * Why it exists: sorting (or range-partitioning) a table by the
  * Z-value clusters rows that are close in BOTH dimensions into the
  * same files, so per-file min/max statistics prune scans for
  * predicates on EITHER column — the classic lakehouse multi-column
  * layout optimization, where a plain sort only ever serves its
  * leading column. Combine with `repartitionByRange(zorder(a, b))`
  * before a parquet write.
  *
  * The interleave is the standard mask-spread bit twiddle (5 shifts
  * and masks per operand), pure integer ops inside whole-stage
  * codegen. Keys are taken modulo 2³² (documented: layout keys are
  * non-negative ids/timestamps); a null operand yields null.
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"
  override def nullable: Boolean = left.nullable || right.nullable

  // deferred to analysis (constructor-time children may be unresolved)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def integral(dt: DataType): Boolean = dt match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (integral(left.dataType) && integral(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_zorder needs integral inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short   => s.longValue()
      case y: java.lang.Byte    => y.longValue()
    }
    val y = b match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short   => s.longValue()
      case yy: java.lang.Byte   => yy.longValue()
    }
    ZOrderExpr.interleave(x, y)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.ops.ZOrderExpr.interleave((long) $a, (long) $b);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {

  /** Spread the low 32 bits of x to the even bit positions of a long —
    * the standard mask sequence, public-domain bit twiddling. */
  def spread(xIn: Long): Long = {
    var x = xIn & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column form: `zorder(a, b)` — sort or range-partition by this
    * before writing for two-dimensional file locality. */
  def zorder(a: Column, b: Column): Column =
    Columns.ofExpr(ZOrderExpr(Columns.exprOf(a), Columns.exprOf(b)))
}
