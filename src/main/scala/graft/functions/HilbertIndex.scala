package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: Hilbert-curve index of an (x, y) cell on the
  * 256×256 grid — the locality-clustering sibling of the Morton/Z-order
  * interleave in `EventOps.morton8`. Both map 2-D cells to a 1-D sort key
  * whose order keeps nearby cells nearby; Hilbert additionally never takes
  * the Z-curve's long diagonal jumps (consecutive indexes are always
  * 4-adjacent cells), which tightens each sorted file's bounding box and so
  * skips more files for box queries (measured A/B in EXPERIMENTS.md).
  *
  * The standard xy2d walk: per bit level s (128 … 1), accumulate the
  * quadrant's contribution and rotate the frame. A loop with two mutable
  * coordinates — exactly the shape that wants a custom codegen Expression
  * rather than 8 unrolled layers of `when()` columns (SURVEY.md §4.3).
  * Inputs are masked to [0, 256); callers bin with the same
  * `(v - min) * 256 DIV span` arithmetic as the z-order path.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hilbert_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Int] & 255
    var y = b.asInstanceOf[Int] & 255
    var d = 0
    var s = 128
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |int $x = $a & 255;
         |int $y = $b & 255;
         |int $d = 0;
         |for (int $s = 128; $s > 0; $s >>= 1) {
         |  final int $rx = (($x & $s) > 0) ? 1 : 0;
         |  final int $ry = (($y & $s) > 0) ? 1 : 0;
         |  $d += $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    final int $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[HilbertIndex].getName, null, "hilbert_d")
}
