package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-k minhash signature in one pass: array<long> (hashed shingles)
  * → array<long> of k values, `min over s of (aᵢ·s + bᵢ) mod p`.
  *
  * Replaces k separate `transform`+`array_min` column folds, which
  * allocate k intermediate arrays per row; this expression walks the
  * input once per coefficient with zero intermediate allocation.
  * Codegen calls the expression instance directly (addReferenceObj),
  * so the surrounding projection stays whole-stage compiled.
  */
case class MinHashSigExpr(child: Expression, coefA: Array[Long],
    coefB: Array[Long], prime: Long) extends UnaryExpression {
  require(coefA.length == coefB.length && coefA.nonEmpty)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  def compute(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val k = coefA.length
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = coefA(i)
      val b = coefB(i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hs.getLong(j) + b) % prime
        val vv = if (v < 0) v + prime else v
        if (vv < best) best = vv
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}
