package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** JVM kernel for [[HilbertKey]] — the standard Hilbert xy→d walk
  * (per-bit quadrant pick + frame rotation, the classic loop form of the
  * Butz/Lawder algorithm). Static forwarder, callable from generated code.
  */
object HilbertUtil {
  /** Hilbert-curve index of (`a` & mask, `b` & mask) on the 2^bits grid.
    * Inputs are masked to the low `bits` bits exactly like
    * [[graft.operators.Layout.zorderKey]] masks its coordinates, so an
    * out-of-range coordinate wraps rather than corrupting the state walk.
    */
  def xy2d(bits: Int, a: Long, b: Long): Long = {
    val n = 1L << bits
    val mask = n - 1L
    var x = a & mask
    var y = b & mask
    var d = 0L
    var s = n >> 1
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the frame so the sub-quadrant walk stays contiguous
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1L - x; y = n - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert-curve index of two long coordinates — the locality-preserving
  * sibling of [[graft.operators.Layout.zorderKey]]. Morton interleave is a
  * stateless bit shuffle (each output bit depends on one input bit), so it
  * unrolls into 2·bits independent OR terms; the Hilbert walk carries a
  * rotation STATE across bit positions, so the same trick would duplicate
  * the whole prefix expression at every reference and a higher-order-
  * function fold would drop the row off whole-stage codegen (the CdcBounds
  * lesson). A native expression keeps both properties: one tight
  * primitive loop per row, inside codegen, zero allocation.
  *
  * Why offer Hilbert at all when z-order works: on a 100 TB compaction
  * layout the clustering key decides how many files a 2-D range scan
  * touches, and the Hilbert curve never takes the cross-grid jumps Morton
  * takes at power-of-two seams — adjacent curve positions are ALWAYS
  * adjacent cells, so equal-size key ranges cover more compact rectangles
  * (fewer file touches for the same selectivity; the reason Databricks
  * added liquid clustering over plain z-order).
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ImplicitCastInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"hilbert key expects two bigint arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertUtil.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertUtil.xy2d($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hilbert {
  /** Column form of [[HilbertKey]] for the DataFrame API. */
  def hilbertKeyNative(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(HilbertKey(
      ColumnBridge.expression(a), ColumnBridge.expression(b), bits))
}
