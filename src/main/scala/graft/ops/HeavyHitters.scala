package graft.ops

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.Columns

/** Exact distributed heavy hitters (frequent items) in two passes:
  *
  *   1. a [[MisraGriesAgg]] sketch pass — each task summarizes its
  *      slice into ≤ k counters, partials merge associatively
  *      (mergeable-summaries construction: sum counters, subtract the
  *      (k+1)-th largest, drop non-positive — Agarwal et al., PODS'12),
  *      so the exchange carries ≤ k rows per task no matter how many
  *      distinct tokens the corpus has;
  *   2. an exact recount of ONLY the ≤ k candidates (broadcast
  *      semi-join), then the true support threshold filter.
  *
  * With capacity k ≥ 2/s, every token of frequency ≥ s·n survives pass
  * 1 (MG undercounts by at most n/(k+1) < s·n/2 < threshold), so the
  * final answer is EXACT — unlike `freqItems`' one-pass answer, the
  * sketch only proposes, it never decides. The naive exact spelling
  * (`groupBy(token).count`) shuffles every distinct token; at corpus
  * scale the token dictionary is billions of rows of which only the ~k
  * frequent ones matter.
  */
object HeavyHitters {

  /** Tokens with exact count ≥ ceil(support × total), counted over
    * `tokens(tokenCol)`. One scan for (sketch, total), one for the
    * candidate recount. */
  def exact(tokens: DataFrame, tokenCol: String, support: Double): DataFrame = {
    require(support > 0 && support < 1, "support must be in (0,1)")
    val k = math.max(8, math.ceil(2.0 / support).toInt)
    // single scan: candidate set + exact stream length
    val sketch = tokens.agg(
      misraGries(col(tokenCol), k).as("cand"),
      count(lit(1)).as("n"))
    val cands = sketch.select(explode(col("cand")).as("__cand"))
    val total = sketch.select(col("n"))
    tokens
      .join(broadcast(cands), col(tokenCol) === col("__cand"), "left_semi")
      .groupBy(col(tokenCol))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") >= ceil(lit(support) * col("n")).cast("long"))
      .select(col(tokenCol), col("cnt"))
  }

  /** Column form: `misraGries(token, k)` aggregates to the ≤ k
    * candidate tokens (sorted, for deterministic output). */
  def misraGries(token: Column, k: Int): Column =
    Columns.ofExpr(MisraGriesAgg(Columns.exprOf(token), k)
      .toAggregateExpression())
}

/** Misra-Gries frequent-items summary as a typed aggregate. Buffer is
  * a counter map bounded at `k` entries; eval emits the candidate
  * tokens sorted lexicographically (counts are lower bounds only, so
  * they stay internal — callers recount exactly). Null tokens are
  * skipped (SQL aggregate convention).
  */
case class MisraGriesAgg(
    token: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, "capacity must be positive")

  type Buf = java.util.HashMap[String, Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val t = token.eval(input)
    if (t != null) {
      // copy out of the (possibly reused) UnsafeRow-backed bytes
      val s = t.asInstanceOf[UTF8String].toString
      val cur = buf.get(s)
      if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.put(e.getKey, b1.get(e.getKey) + e.getValue)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest counter, drop non-positive:
      // the mergeable-summaries shrink that preserves the n/(k+1) bound
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(b1.size - k - 1))
    }
    b1
  }

  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buf: Buf): Any = {
    val keys = buf.keySet().toArray(new Array[String](buf.size))
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(s => UTF8String.fromString(s): Any))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(token)
  override def prettyName: String = "graft_misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(token = newChildren(0))
}
