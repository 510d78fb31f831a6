package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve index of two bucketed dimension values — the
  * standard xy2d walk (per-bit quadrant digit + rotate/reflect the
  * lower bits) in one tight loop per row.
  *
  * Why native instead of composed Columns: each Hilbert step reads the
  * previous step's (x, y) several times, so an unrolled
  * `when(...)`-chain multiplies the expression tree by ~5 per bit —
  * ~6¹⁰ nodes at 10 bits once `CollapseProject` inlines the steps,
  * which OOMs the driver before a single row is read. A loop is the
  * honest shape of this computation. Values are the classic Hilbert
  * distances (bit-for-bit what the chained-CTE DuckDB oracle in
  * [[graft.operators.Layout.hilbert2Sql]] computes — both are pure
  * positive-integer CASE/mask arithmetic, validated exhaustively at
  * bits=2 and against 2001 reference points at bits=10).
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 31, s"HilbertKey needs bits in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val mask = (1L << bits) - 1L
    var x = xAny.asInstanceOf[Long] & mask
    var y = yAny.asInstanceOf[Long] & mask
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      val s = 1L << k
      val rx = (x >> k) & 1L
      val ry = (y >> k) & 1L
      d += s * s * ((3L * rx) ^ ry)
      // rotate lower bits into the quadrant's frame: ry=1 → identity;
      // ry=0,rx=0 → swap(x,y); ry=0,rx=1 → swap(s-1-x, s-1-y).
      // Intermediates go negative above the reflection line — that's
      // the standard formulation; only bits below k are read after
      // this, and two's-complement >>/& agree across JVM and DuckDB.
      if (ry == 0L) {
        if (rx == 1L) {
          val nx = s - 1L - y
          y = s - 1L - x
          x = nx
        } else {
          val t = x; x = y; y = t
        }
      }
      k -= 1
    }
    d
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
