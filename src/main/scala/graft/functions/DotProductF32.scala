package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double — semantically identical to the higher-order
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0D, +)` form in
  * [[VectorFunctions.dotD]], but ~10× cheaper: the generated code loops
  * directly over the two `ArrayData` buffers with no intermediate array
  * allocation and no lambda-variable boxing, and stays inside whole-stage
  * codegen (SURVEY.md §4.3's "custom Expression" upgrade path).
  *
  * Null behavior: null if either array is null (BinaryExpression default).
  * Length mismatch: folds over the common prefix (fixture arrays are all
  * 64 elements; the min() guard keeps the expression total).
  *
  * Input typing: callers must pass `array<float>` columns. `ExpectsInputTypes`
  * would declare this to the analyzer, but its `AbstractDataType` signature
  * is `private[sql]` — not extendable from outside Spark's own packages —
  * so mistyped inputs surface as a runtime cast error instead of an
  * analysis error. The engine's call sites are all internal and typed.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

object DotProductF32 {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[DotProductF32].getName, null, "dot_f32")
}
