package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst AGGREGATE function: HyperLogLog register array over a
  * column of portable polynomial hashes (`graft_polyhash` outputs,
  * domain [0, P)) — the imperative one-pass twin of
  * [[graft.sketch.HyperLogLog.registers]]'s groupBy(bucket).max(rho)
  * formulation, exposed to SQL as `graft_hll_registers(h, m)`.
  *
  * Identical arithmetic to the DataFrame form and the DuckDB oracle
  * (large-multiplier affine maps, range-of-g0 bucket, trailing-zero rho —
  * see HyperLogLog's scaladoc for why the bucket must come from g0's
  * RANGE, not its low bits), so the exploded register rows hash-match the
  * proven `sketch_hll_registers` oracle.
  *
  * 100-TB shape: the aggregation buffer is m BYTES per group (rho ≤ 21
  * fits a byte), TypedImperativeAggregate gives map-side partial
  * aggregation for free (ObjectHashAggregate), so the shuffle carries one
  * m-byte sketch per (group, partition) — never a row per input — and
  * merge is byte-wise max, the HLL monoid. This is the form a SQL user
  * writes `GROUP BY lang` distinct-counts with; the groupBy(bucket)
  * DataFrame form stays as the cross-gate twin. */
case class HllRegisters(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(m >= 1 && m <= (1 << 16), s"graft_hll_registers: m out of range: $m")

  private val P = 1000003L

  override def prettyName: String = "graft_hll_registers"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_registers requires bigint (a graft_polyhash value), got $other")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // floorMod keeps out-of-domain hashes in [0, P); for the documented
      // domain [0, P) it is exactly the column form's % arithmetic
      val g0 = java.lang.Math.floorMod(h * 48271L + 3L, P)
      val g1 = java.lang.Math.floorMod(h * 16807L + 17L, P)
      val bucket = ((g0 * m) / P).toInt
      // rho = trailing zeros of g1 (capped at 20) + 1: count k in 1..20
      // with 2^k | g1 — the exact integer form both oracles replay
      var rho = 1
      var k = 1
      while (k <= 20 && (g1 & ((1L << k) - 1L)) == 0L) { rho += 1; k += 1 }
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toLong))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}

/** Scalar finalizer for [[HllRegisters]]: cardinality estimate from a
  * register array — bias-corrected harmonic mean with the small-range
  * linear-counting correction, the identical formula (and identical
  * exact-binary-fraction arithmetic: each 2^-rho term is exact and the
  * ≤ m-term sum fits a double mantissa, so summation order cannot matter)
  * as [[graft.sketch.HyperLogLog.estimate]] and the DuckDB replay.
  * Together they make per-group distinct counts pure SQL:
  * `SELECT g, graft_hll_estimate(graft_hll_registers(h, m), m) GROUP BY g`.
  *
  * CodegenFallback on purpose: the finalizer evaluates once per GROUP
  * (m-element loop), never per input row — codegen would buy nothing. */
case class HllEstimate(child: Expression, m: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "graft_hll_estimate"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll_estimate requires array<bigint> registers, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    // a register array whose length disagrees with m would make `zeros`
    // negative and silently return a wrong (possibly negative) estimate;
    // fail loudly on the mismatched call instead
    require(regs.numElements() == m,
      s"graft_hll_estimate: ${regs.numElements()} registers but m=$m")
    var s = 0.0
    var filled = 0L
    var i = 0
    while (i < regs.numElements()) {
      val rho = regs.getLong(i)
      if (rho > 0L) { s += 1.0 / (1L << rho); filled += 1 }
      i += 1
    }
    val zeros = (m - filled).toDouble
    val raw = graft.sketch.HyperLogLog.alpha(m) * m * m / (s + zeros)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
