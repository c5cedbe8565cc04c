package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

import graft.engine.Columns

/** Distributed Bloom filter as an aggregate + membership probe pair.
  *
  * [[BloomAgg]] builds the filter the Spark way: every task ORs its
  * slice's bits into a local bitset (map-side partial aggregation), and
  * the exchange carries one fixed-size bitset per task — never the
  * elements. The eval'd value is a self-describing byte blob
  * (`[numHashes:int][bitset words]`), so the probe side can't be
  * configured inconsistently with the build side.
  *
  * [[BloomContainsExpr]] probes that blob per row. "Might contain" =
  * maybe; "does not contain" = certain — so a bloom PREfilter before an
  * exact join is sound: it only discards rows the join would discard
  * anyway, and the exact join kills the false positives. That is the
  * 100 TB shape used by [[Dedup.bloomDecontaminate]]: broadcast a few
  * MB of bits instead of shuffling every corpus n-gram into an
  * exchange with the (tiny) reference side.
  *
  * Hashing: double hashing over the input long — position_i =
  * (h1 + i·h2) mod m with h2 forced odd (Kirsch–Mitzenmacher
  * construction); callers feed `xxhash64(...)` so arbitrary keys
  * become the input long.
  */
object BloomFns {

  /** Aggregate column: build a bloom over `hash` (a long column, e.g.
    * `xxhash64(key)`) with `numBits` bits (rounded up to a word) and
    * `numHashes` probes. */
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int): Column =
    Columns.ofExpr(BloomAgg(Columns.exprOf(hash), numBits, numHashes)
      .toAggregateExpression())

  /** Membership probe: true when `hash` might be in `bloom`. */
  def bloomContains(bloom: Column, hash: Column): Column =
    Columns.ofExpr(BloomContainsExpr(
      Columns.exprOf(bloom), Columns.exprOf(hash)))

  private[ops] def positions(hash: Long, i: Int, numBits: Long): Int = {
    val h2 = (hash >>> 33) * 0xff51afd7ed558ccdL | 1L
    (((hash + i * h2) & Long.MaxValue) % numBits).toInt
  }
}

/** Bitset-building aggregate half of the bloom pair — see [[BloomFns]]. */
case class BloomAgg(
    hash: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64, "bloom needs at least one word of bits")
  require(numHashes > 0 && numHashes <= 16, "1..16 hash probes")

  private val numWords = (numBits + 63) / 64
  private val mBits: Long = numWords.toLong * 64L

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val pos = BloomFns.positions(hv, i, mBits)
        buf(pos >>> 6) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { b1(i) |= b2(i); i += 1 }
    b1
  }

  /** `[numHashes:int][words as big-endian longs]` — self-describing so
    * probes can never disagree with the build parameters. */
  override def eval(buf: Array[Long]): Any = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * numWords)
    bb.putInt(numHashes)
    var i = 0
    while (i < numWords) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numWords)
    var i = 0
    while (i < numWords) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](numWords)
    var i = 0
    while (i < numWords) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash)
  override def prettyName: String = "graft_bloom_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(hash = newChildren(0))
}

/** Codegen membership probe against a [[BloomAgg]] blob. The blob is
  * typically a broadcast scalar (cross-joined 1-row aggregate), so the
  * bytes reference is loop-invariant in practice; the probe itself is
  * `numHashes` word reads per row, no allocation. */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains needs (binary, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  def compute(blob: Array[Byte], hash: Long): Boolean = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    val k = bb.getInt()
    val numWords = (blob.length - 4) / 8
    val mBits = numWords.toLong * 64L
    var i = 0
    while (i < k) {
      val pos = BloomFns.positions(hash, i, mBits)
      val word = bb.getLong(4 + 8 * (pos >>> 6))
      if ((word & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(blob: Any, hash: Any): Any =
    compute(blob.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this)
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = $ref.compute($b, $h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}
