package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** RP-LSH plane kernels (r15).
  *
  * The pre-r15 `cosTopkRplsh` built its L×B per-plane signatures as 54
  * inlined `when(dot_f32(emb, <64-float literal>) > 0, 1<<j)` expressions.
  * Fused into one Generate/Project, the generated `doConsume` method
  * exceeded Janino's 64 KB method limit — every bench pass paid a DOOMED
  * multi-second compile (logged `InternalCompilerException: Code grows
  * beyond 64 KB`) and then ran the whole operator interpreted anyway.
  *
  * These two expressions compute the identical values from the plane
  * matrix held as one literal: per plane, the dot accumulates in DOUBLE
  * over elements in index order — `s += (double) emb.getFloat(i) *
  * (double) plane(i)` — exactly [[DotProductF32]]'s fold, so signatures,
  * margins and therefore probe sets are bit-identical to the inline form
  * (oracle- and spec-verified). `CodegenFallback` embeds a single eval
  * call in the surrounding codegen: the method stays tiny and whole-stage
  * codegen COMPILES again; the per-row work is the unavoidable L·B·d
  * multiply-adds either way.
  *
  * Null semantics replicated from the inline form: a null embedding, a
  * null element, or a length mismatch made `dot_f32` return null, and
  * `when(null > 0, ...).otherwise(0)` turned that into a 0 bit — here the
  * plane's contribution is likewise 0 (sigs) / the dot surfaces as null
  * (dots), matching `when` downstream.
  */
object RplshPlanes {
  /** planes literal → Array[plane][component], materialized once per
    * expression instance (the literal is foldable).
    */
  private[functions] def planesOf(e: Expression): Array[Array[Float]] = {
    val arr = e.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { p =>
      val inner = arr.getArray(p)
      Array.tabulate(inner.numElements())(inner.getFloat)
    }
  }

  /** dot_f32-identical fold; NaN when any element is null or lengths
    * mismatch (callers map NaN to the inline form's null-case behavior).
    * Note a legit NaN accumulation (NaN floats in a valid embedding) is
    * indistinguishable from the null case HERE — fine for [[RplshSigs]],
    * where both compare `> 0` as false (the inline `when` did the same),
    * but [[RplshDots]] must keep legit NaN as NaN and therefore uses
    * [[dotOrNull]] instead.
    */
  private[functions] def dotOrNaN(emb: ArrayData, plane: Array[Float]): Double = {
    if (emb.numElements() != plane.length) return Double.NaN
    var s = 0.0
    var i = 0
    while (i < plane.length) {
      if (emb.isNullAt(i)) return Double.NaN
      s += emb.getFloat(i).toDouble * plane(i).toDouble
      i += 1
    }
    s
  }

  /** dot_f32-identical fold with dot_f32's EXACT null semantics: boxed
    * null on a null element or length mismatch, the accumulated double
    * (NaN included — a legit NaN float stays NaN, it is a value, not a
    * null) otherwise. Used by [[RplshDots]], whose elements surface
    * directly and must not conflate null-dot with NaN-dot (r16, ADVICE).
    */
  private[functions] def dotOrNull(emb: ArrayData, plane: Array[Float]): java.lang.Double = {
    if (emb.numElements() != plane.length) return null
    var s = 0.0
    var i = 0
    while (i < plane.length) {
      if (emb.isNullAt(i)) return null
      s += emb.getFloat(i).toDouble * plane(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** `rplsh_sigs(embedding, planes, b)` → array<int> of L = |planes|/b
  * signatures: bit j of signature l is [dot(emb, planes[l*b+j]) > 0].
  */
case class RplshSigs(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rplsh_sigs"
  override def nullable: Boolean = false

  @transient private lazy val planes = RplshPlanes.planesOf(second)
  @transient private lazy val b = third.eval(InternalRow.empty).asInstanceOf[Int]
  @transient private lazy val l = planes.length / b

  override def eval(input: InternalRow): Any = {
    val embRaw = first.eval(input)
    val out = new Array[Int](l)
    if (embRaw != null) {
      val emb = embRaw.asInstanceOf[ArrayData]
      var t = 0
      while (t < l) {
        var sig = 0
        var j = 0
        while (j < b) {
          val d = RplshPlanes.dotOrNaN(emb, planes(t * b + j))
          if (d > 0) sig |= 1 << j // NaN > 0 is false — the null-dot 0 bit
          j += 1
        }
        out(t) = sig
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): RplshSigs =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RplshSigs {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[RplshSigs].getName, null, "rplsh_sigs")
}

/** `rplsh_dots(embedding, planes)` → array<double> of all |planes| dots in
  * plane order, with the inline form's EXACT null semantics (r16 fix): a
  * NULL EMBEDDING yields an array of all-null elements — each inline
  * `dot_f32(null, plane)` was null, and the pre-r15 probe path emitted its
  * sig-0 probes off those null margins rather than dropping the row — and
  * a null element / length mismatch yields a null element, while a LEGIT
  * NaN dot (NaN floats in a valid embedding) stays NaN (a value, ordered
  * by the margin sort like any double), never conflated with null.
  */
case class RplshDots(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "rplsh_dots"
  // Never null after the r16 null-embedding fix, but kept pessimistically
  // nullable so downstream plan/schema nullability is unchanged.
  override def nullable: Boolean = true

  @transient private lazy val planes = RplshPlanes.planesOf(right)

  override def eval(input: InternalRow): Any = {
    val embRaw = left.eval(input)
    if (embRaw == null) return new GenericArrayData(new Array[Any](planes.length))
    val emb = embRaw.asInstanceOf[ArrayData]
    val out = new Array[Any](planes.length)
    var p = 0
    while (p < planes.length) {
      out(p) = RplshPlanes.dotOrNull(emb, planes(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RplshDots =
    copy(left = newLeft, right = newRight)
}

object RplshDots {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[RplshDots].getName, null, "rplsh_dots")
}
