package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.engine.Columns

/** Custom aggregate: merge MinHash signatures by elementwise min.
  *
  * Signatures form a monoid under elementwise min, so the signature of
  * a GROUP (cluster, shard, partition) equals the signature of the
  * union of its members' shingle sets — enabling group-level Jaccard
  * estimation without touching raw text. As a
  * `TypedImperativeAggregate` it gets map-side partial aggregation:
  * each partition collapses to one k-long buffer before the exchange,
  * which is what makes corpus-level sketches feasible at 100 TB.
  */
case class MinHashMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = math.min(k, a.numElements())
      var i = 0
      while (i < n) {
        val v = a.getLong(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_minhash_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashMerge =
    copy(child = newChildren.head)
}

object MinHashMerge {
  /** Column form: aggregate a signature column (array<long> of length
    * k) down to the group-level merged signature. */
  def minhashMerge(sig: Column, k: Int): Column =
    Columns.ofExpr(MinHashMerge(Columns.exprOf(sig), k).toAggregateExpression())

  /** Estimated Jaccard between two merged signatures: fraction of
    * agreeing components. */
  def estimatedJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(a, b, (x, y) => x === y), m => m))
      .cast("double") / size(a).cast("double")
  }
}
