package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Random-projection bucket ids for one vector, all tables in one
  * pass: bucket_t = floor((v · w_t) / bucketLength) for `planes.length`
  * seeded Gaussian hyperplanes. The Euclidean-LSH hash family of
  * MLlib's BucketedRandomProjectionLSH, evaluated natively — one
  * imperative walk, no boxed vectors, whole-stage codegen via
  * addReferenceObj (same pattern as [[MinHashSigExpr]]).
  */
case class RpBucketsExpr(child: Expression, planes: Array[Array[Double]],
    bucketLength: Double) extends UnaryExpression {
  require(planes.nonEmpty && bucketLength > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rp_buckets"

  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val w = planes(t)
      var dot = 0.0
      var i = 0
      val d = math.min(n, w.length)
      while (i < d) {
        dot += vec.getDouble(i) * w(i)
        i += 1
      }
      out(t) = math.floor(dot / bucketLength).toLong
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rpBuckets", this)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RpBucketsExpr =
    copy(child = newChild)
}

object RpBuckets {
  /** Seeded Gaussian hyperplanes (driver-side, broadcast with the
    * serialized expression — numTables × dim doubles). */
  def gaussianPlanes(numTables: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numTables)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
