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
  * Null behavior: null if either array is null (BinaryExpression default),
  * if the lengths differ (zip_with pads the shorter side with nulls), or
  * if any element is null — in the higher-order form any null product
  * poisons the running sum. This exact equivalence is what makes
  * [[graft.plans.DotProductRewrite]] a semantics-preserving optimizer rule
  * for arbitrary `array<float>` inputs.
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

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
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
