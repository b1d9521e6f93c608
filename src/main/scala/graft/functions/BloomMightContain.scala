package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a 64-bit key against a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] — the engine's
  * runtime-filter primitive (SURVEY.md §4.3 "custom Expression" path, same
  * shape as Spark's internal `BloomFilterMightContain` used by its
  * runtime-row-level-filter rewrite, but callable from user plans via
  * `call_function("bloom_might_contain", lit(bytes), keyCol)`).
  *
  * Contract: `left` must be a FOLDABLE binary column holding the output of
  * `BloomFilter.writeTo` (the engine builds it driver-side with
  * `df.stat.bloomFilter` over the SMALL side of a join, then embeds the
  * bytes as a literal — a few hundred KB for millions of keys); `right` is
  * the `bigint` key to probe (the engine probes `xxhash64` fingerprints).
  * The filter deserializes ONCE per plan instance — lazily on the eval
  * path, and into a codegen reference object on the generated path — never
  * per row.
  *
  * Semantics: `true` means MAYBE present (false-positive rate set at build
  * time), `false` means DEFINITELY absent — so it may only be used to
  * PRUNE work that an exact operator (anti-join, equi-join) re-checks, as
  * in [[graft.operators.TextOps.dedupBloomPrune]]. Null key → null
  * (BinaryExpression default), matching `IN`-list null semantics.
  */
case class BloomMightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override def nullable: Boolean = true

  /** Enforce the documented contract at ANALYSIS time (mirroring Spark's
    * internal `BloomFilterMightContain`): a non-foldable or mistyped
    * filter argument would otherwise surface as a ClassCastException from
    * `left.eval()` at execution time.
    */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain: the filter argument must be a FOLDABLE binary " +
            "(a literal or constant-foldable expression holding BloomFilter.writeTo bytes); " +
            s"got the non-foldable ${left.sql}")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain requires (BINARY filter bytes, BIGINT key); " +
            s"got (${l.simpleString(1)}, ${r.simpleString(1)})")
    }

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: filter bytes must be a non-null foldable binary")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(f: Any, v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The deserialized filter rides the plan's reference array (BloomFilter
    // impls are Serializable); the generated probe is two hash multiplies
    // and k bit-tests — no per-row deserialization or allocation.
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(left = newLeft, right = newRight)
}

object BloomMightContainLong {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[BloomMightContainLong].getName, null, "bloom_might_contain")
}
