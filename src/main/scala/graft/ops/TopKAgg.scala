package graft.ops

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.engine.Columns

/** Bounded-heap per-group top-k: the k best (ord, id) pairs per group,
  * ranked by ord descending (or ascending), ties broken by ascending
  * id — fully deterministic.
  *
  * The idiomatic Spark spelling — `row_number() over (partition by g
  * order by ord desc)` + `filter(rn <= k)` — shuffles EVERY input row
  * to its group's partition and sorts whole groups, so the exchange
  * carries the corpus even though only k rows per group survive. As a
  * `TypedImperativeAggregate` this gets map-side partial aggregation:
  * each task reduces its slice of a group to a k-entry heap BEFORE the
  * exchange, so shuffle volume is (groups × k × 16 bytes) per task —
  * independent of row count, the difference between a per-group top-k
  * that works at 100 TB and one that re-shuffles the corpus.
  *
  * Buffer is a size-bounded binary heap ordered worst-first (so the
  * root is the entry the next better candidate evicts). Rows with a
  * null ord OR null id are skipped — ids are non-null keys by
  * contract (a window spelling ranks null ids NULLS FIRST; this
  * operator's contract is rank-over-non-null for both inputs). NaN
  * ords rank as the greatest double, exactly like Spark's ORDER BY.
  */
case class TopKAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    largest: Boolean = true,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  require(k > 0, "k must be positive")

  override def createAggregationBuffer(): TopKAgg.Heap =
    new TopKAgg.Heap(k, largest)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val o = ord.eval(input)
    if (o != null) {
      val i = id.eval(input)
      if (i != null) buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: TopKAgg.Heap, b2: TopKAgg.Heap): TopKAgg.Heap = {
    b2.foreach((o, i) => b1.offer(o, i))
    b1
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (o, i) =>
      new GenericInternalRow(Array[Any](o, i)): Any
    })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val n = buf.size
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    buf.foreach { (o, i) => bb.putDouble(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKAgg.Heap(k, largest)
    var i = 0
    while (i < n) { h.offer(bb.getDouble(), bb.getLong()); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(ord, id)
  override def prettyName: String = "graft_top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(ord = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Size-bounded binary heap of (ord, id) pairs stored in two flat
    * primitive arrays (no boxing in update/merge, the per-row hot
    * path). Ordered WORST-first: `better(a, b)` says a outranks b, and
    * the root is the worst kept entry, evicted when a better candidate
    * arrives on a full heap. */
  final class Heap(k: Int, largest: Boolean) {
    private val ords = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    // ranks: (ord desc|asc, id asc). Returns true when (o1,i1) BEATS
    // (o2,i2). MUST be a total order (the heap and sortWith both rely
    // on it), so ords compare via Double.compare — NaN ranks as the
    // GREATEST double, exactly Spark's SQL ordering, which keeps the
    // heap equal to the row_number() window spelling even on NaN
    // scores (a raw `>` would make NaN incomparable: a NaN that
    // entered a non-full heap could then never be evicted and would
    // block every later candidate).
    private def better(o1: Double, i1: Long, o2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(o1, o2)
      if (c != 0) { if (largest) c > 0 else c < 0 }
      else i1 < i2
    }

    def offer(oIn: Double, i: Long): Unit = {
      // normalize -0.0 to 0.0 like Spark's UnsafeRow/grouping layer,
      // so the Double.compare tie-break can't order ±0.0 apart
      val o = if (oIn == 0.0) 0.0 else oIn
      offerNormalized(o, i)
    }

    private def offerNormalized(o: Double, i: Long): Unit = {
      if (n < k) {
        ords(n) = o; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (better(o, i, ords(0), ids(0))) {
        ords(0) = o; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) / 2
        // heap property: parent is WORSE-or-equal than child
        if (better(ords(p), ids(p), ords(c), ids(c))) { swap(p, c); c = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      var continue = true
      while (continue) {
        val l = 2 * p + 1; val r = l + 1
        // pick the WORST among parent and children as the new parent
        var worst = p
        if (l < n && better(ords(worst), ids(worst), ords(l), ids(l))) worst = l
        if (r < n && better(ords(worst), ids(worst), ords(r), ids(r))) worst = r
        if (worst == p) continue = false
        else { swap(p, worst); p = worst }
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val to = ords(a); ords(a) = ords(b); ords(b) = to
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ords(i), ids(i)); i += 1 }
    }

    /** Entries best-first: rank order for the emitted array. */
    def sortedEntries: Array[(Double, Long)] = {
      val out = Array.tabulate(n)(i => (ords(i), ids(i)))
      out.sortWith { case ((o1, i1), (o2, i2)) => better(o1, i1, o2, i2) }
    }
  }

  /** Column form: `topK(score, doc_id, 5)` aggregates a group to its
    * 5 best (score, id) pairs, best first. `largest = false` ranks
    * ascending (k smallest). */
  def topK(ord: Column, id: Column, k: Int, largest: Boolean = true): Column =
    Columns.ofExpr(TopKAgg(
      Columns.exprOf(ord.cast("double")), Columns.exprOf(id.cast("long")),
      k, largest).toAggregateExpression())
}
