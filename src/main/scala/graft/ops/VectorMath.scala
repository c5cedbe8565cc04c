package graft.ops

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Analysis-time input validation shared by the binary array kernels:
  * reject non-`array<float|double>` children DURING ANALYSIS (the
  * Spark expression convention) instead of from the first compute /
  * codegen call on an executor — a mis-typed column now fails the
  * query at plan time with a type-check message, not mid-job. The
  * `floatElems` throw in each kernel stays as the runtime backstop
  * for hand-built never-analyzed plans. */
private[ops] trait ArrayPairInputCheck { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Σ aᵢ·bᵢ over two numeric arrays (float or double elements) in one
  * imperative pass, as double.
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) => x.cast(D) * y.cast(D)),
  * 0.0, _ + _)`, which materializes the zipped product array per
  * evaluation — in the pair-verification joins (q22's probe pass,
  * q43's candidate verify) that is one allocation per candidate PAIR.
  * This walks both arrays with zero intermediate allocation.
  *
  * Bit-compatible with the HOF form: each element is widened to double
  * exactly as `cast` does, then multiplied and accumulated left to
  * right from 0.0 — the identical IEEE operation sequence — and a
  * length mismatch or a null element returns NULL, matching zip_with's
  * null-padding/null-propagation semantics (a corrupt/truncated vector
  * must surface as null, not silently rank with a partial sum).
  */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ArrayPairInputCheck {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def nullable: Boolean = true

  private def floatElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"graft_dot needs array<float|double> input, got $other")
  }
  @transient private lazy val leftFloat = floatElems(left)
  @transient private lazy val rightFloat = floatElems(right)

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = leftFloat
    val rf = rightFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      // a null element (containsNull arrays are legal parquet input)
      // must poison the whole sum, exactly as the zip_with+aggregate
      // form would — never silently contribute 0.0
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDot", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two numeric arrays, as double — the companion of
  * [[DotExpr]] for Euclidean geometry (centroid assignment evaluates
  * this nLists times per row). Same bit-compatibility argument: widen,
  * subtract, square, accumulate left to right from 0.0; length
  * mismatch or null element → NULL, like zip_with would produce. */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ArrayPairInputCheck {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"
  override def nullable: Boolean = true

  private def floatElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"graft_sqdist needs array<float|double> input, got $other")
  }
  @transient private lazy val leftFloat = floatElems(left)
  @transient private lazy val rightFloat = floatElems(right)

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = leftFloat
    val rf = rightFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null element → null result, matching zip_with (see DotExpr)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSqDist", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ (⌊aᵢ·s⌋ − ⌊bᵢ·s⌋)² over two numeric arrays as BIGINT — the
  * integer-exact quantized distance kernel behind hard-negative
  * mining (q167). Replaces the HOF chain
  * `aggregate(zip_with(transform(a,…), transform(b,…), …), 0L, _+_)`,
  * which after Catalyst's projection collapse pushes the "pre-
  * computed" quantization into the pair-join projection and
  * allocates three boxed 64-element arrays per candidate PAIR — at
  * sf0.1's 3.6M cross-label pairs that was the q167 battery slot's
  * actual cost (43.3 s for ~230M multiplies, i.e. allocation/GC, not
  * arithmetic). One imperative pass, zero allocation; element math is
  * bit-identical to the HOF form: widen to double exactly as `cast`
  * does, multiply by the scale, `Math.floor`, truncate to long,
  * subtract, square, accumulate in Long from 0 — so the SQL oracle's
  * `floor(x·s)` replay still matches exactly. Length mismatch or a
  * null element → NULL (zip_with semantics). Overflow contract (same
  * as Clustering's guard): dims·(2·max|⌊x·s⌋|)² must stay < 2⁶³ —
  * callers quantize unit-normalized embeddings at s ≤ 1e4. */
case class QuantSqDistExpr(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression with ArrayPairInputCheck {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_quant_sqdist"
  override def nullable: Boolean = true

  private def floatElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"graft_quant_sqdist needs array<float|double> input, got $other")
  }
  @transient private lazy val leftFloat = floatElems(left)
  @transient private lazy val rightFloat = floatElems(right)

  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = leftFloat
    val rf = rightFloat
    val s = scale
    var acc = 0L
    var i = 0
    while (i < n) {
      // null element → null result, matching zip_with (see DotExpr)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = Math.floor(x * s).toLong - Math.floor(y * s).toLong
      acc += d * d
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftQuantSqDist", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantSqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** Σ |aᵢ − bᵢ| over two `array<int>` columns as BIGINT — the L1
  * (counting-filter) kernel for the q170 edit-distance histogram
  * reject (Jokinen–Ukkonen: lev ≥ ⌈L1/2⌉). Replaces the per-pair
  * `aggregate(zip_with(h, hb, abs(_ − _)), 0, _ + _)` HOF chain,
  * which allocates a boxed 37-element delta array per CANDIDATE PAIR
  * inside the band-join projection — the same projection-collapse
  * allocation trap [[QuantSqDistExpr]] killed for q167 (round-15
  * ADVICE flagged this site as the next occurrence). One imperative
  * pass, zero allocation, bit-identical arithmetic: int elements
  * widen to long before the subtract, so no overflow at any input
  * (|Δ| ≤ 2³² per element, Σ over n elements < n·2³²). Length
  * mismatch or a null element → NULL (zip_with semantics, the
  * [[DotExpr]] contract). */
case class IntL1Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_int_l1"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _                         => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      // null element → null result, matching zip_with (see DotExpr)
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getInt(i).toLong - b.getInt(i).toLong
      acc += (if (d < 0) -d else d)
      i += 1
    }
    acc
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIntL1", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntL1Expr =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| over two SORTED-ascending `array<long>` columns as BIGINT —
  * one zero-allocation merge pass. `array_intersect` builds a hash set
  * per evaluation; in q188's (query-sample × corpus) exact-Jaccard
  * join that is one set build + one array materialization per
  * CANDIDATE PAIR — measured as the 28.7 s top cost of the audit at
  * sf0.1. Sorting each gram set ONCE at build time (map-only
  * `sort_array`) turns every pair evaluation into an equal-advance
  * merge over primitive longs. Inputs are distinct-element sets by
  * caller contract (the audit builds them with `array_distinct`);
  * on general sorted multisets the count is of matched positions
  * (min-multiplicity), which equals set intersection on distinct
  * input. A null element or unsorted input violates the contract —
  * nulls return NULL (the [[DotExpr]] convention); sortedness is the
  * caller's (cheap, local) invariant and is asserted in the
  * interpreted path. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  def compute(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftSortedIsect", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = $ref.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Driver-built benchmark probe set for [[BenchMaxCosExpr]]: ids in
  * ascending order with their UNIT vectors (float inputs widened to
  * double, unitᵢ = xᵢ/√Σxᵢ² accumulated left to right — the q43
  * documented IEEE sequence). A plain Serializable holder rather than
  * expression fields so the codegen reference object is one flat
  * array pair. Bounded by contract: benchmark suites are
  * thousands-of-vectors small while the corpus is the big side. */
final class BenchSet(val ids: Array[Long], val units: Array[Array[Double]])
    extends Serializable {
  require(ids.length == units.length)
}

/** `array<float|double> → struct(max_cos double, bench_id bigint)`:
  * the maximum cosine of the input vector against every benchmark
  * unit vector, with the smallest qualifying bench id on exact ties
  * (ids are scanned ascending with a strict `>` update). One
  * imperative codegen pass, zero shuffles — the decontamination scan
  * stays map-only no matter the corpus size; nBench·dim multiplies
  * per row is the honest cost of an exact verdict against a small
  * probe set. Cosine sequence per bench vector: unitᵢ = xᵢ/√Σxᵢ²
  * computed inline, then Σ unitᵢ·bᵢ left to right — bit-identical to
  * the oracle's unit-then-dot replay. NULL for a zero-norm or
  * null-element input (no silent NaN ranking). */
case class BenchMaxCosExpr(child: Expression, bench: BenchSet)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("max_cos", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("bench_id",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_bench_max_cos"
  override def nullable: Boolean = true

  @transient private lazy val floatElems = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other =>
      throw new IllegalArgumentException(
        s"graft_bench_max_cos needs array<float|double> input, got $other")
  }

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    val lf = floatElems
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    if (norm == 0.0) return null
    var best = Double.NegativeInfinity
    var bestId = -1L
    var j = 0
    while (j < bench.ids.length) {
      val b = bench.units(j)
      if (b.length == n) {
        var acc = 0.0
        var k = 0
        while (k < n) {
          val x = if (lf) a.getFloat(k).toDouble else a.getDouble(k)
          acc += (x / norm) * b(k)
          k += 1
        }
        if (acc > best) { best = acc; bestId = bench.ids(j) }
      }
      j += 1
    }
    if (bestId < 0) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestId))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBenchMaxCos", this)
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.InternalRow ${ev.value}_r = $ref.compute($a);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BenchMaxCosExpr =
    copy(child = newChild)
}
