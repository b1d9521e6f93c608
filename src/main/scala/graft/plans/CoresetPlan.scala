package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}

import graft.diversity.{MapReduceCoreset, Pt}

/** The whole-operator Catalyst extension path (SURVEY.md §2.2 preference
  * order (c)): the composable-coreset map task (reference operator R5) as
  * a first-class plan node — custom `LogicalPlan` → planner `Strategy` →
  * physical `SparkPlan` — instead of an opaque `mapPartitions` lambda.
  * Semantically identical to [[graft.operators.DiversityOps.coreset]]'s
  * map stage (same [[MapReduceCoreset.localCoreset]] kernel, asserted
  * equal in CoresetPlanSpec); what the plan-node form adds is planner
  * visibility: the operator prints in `explain` as `CoresetExec k'=…`,
  * Catalyst can prune/push below it (the child is an ordinary resolved
  * plan), and EXPLAIN-based tooling (graft.Plans, PlanAuditSpec) can
  * audit it like any built-in operator.
  *
  * Child contract: exactly two columns, `(id bigint, embedding
  * array<float>)`, in any distribution: the exec node OWNS its
  * partitioning. Catalyst's `Distribution` lattice cannot express "exact
  * residue partition = id % p" (HashClusteredDistribution hashes the
  * residue, lumping groups — the r8 defect), so the exec enforces R7's
  * deterministic contract itself with an RDD-level [[ModPartitioner]],
  * the SAME partitioner as the collect path — both paths now select
  * kernels from identical partition contents, which is what the
  * composable-coreset covering condition (and its p-invariance) rests
  * on. Output: `(id, center, weight)` — ≤ k′ kernel rows per residue
  * class, each carrying its delegate count.
  */
case class CoresetPlan(child: LogicalPlan, kPrime: Int, p: Int, output: Seq[Attribute])
    extends UnaryNode {
  // The kernel rows are NEW attributes, not passthroughs of the child's —
  // declaring them produced is what satisfies CheckAnalysis's
  // missing-input rule (the same contract Generate/Range declare).
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet
  // The kernel CONSUMES every child column even though none appears in an
  // expression — without this, ColumnPruning sees zero references and
  // prunes (id, embedding) out from under the fold (observed as a
  // zero-column child feeding getLong(0): memory-unsafe reads, JVM crash).
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): CoresetPlan =
    copy(child = newChild)
}

/** Exact mod partitioner: partition index IS `id % p` (ids are non-
  * negative by the source contract). A DataFrame `repartition(p,
  * pmod(id, p))` instead HASHES the residue, so groups land like balls
  * in bins; this is the honest implementation of R7's deterministic
  * partitioning, shared by the exec node and the collect path.
  */
private[graft] class ModPartitioner(val p: Int) extends org.apache.spark.Partitioner {
  override def numPartitions: Int = p
  override def getPartition(key: Any): Int = (key.asInstanceOf[Long] % p).toInt
  override def equals(o: Any): Boolean = o match {
    case m: ModPartitioner => m.p == p
    case _ => false
  }
  override def hashCode: Int = p
}

object CoresetPlan {
  def apply(child: LogicalPlan, kPrime: Int, p: Int): CoresetPlan =
    CoresetPlan(child, kPrime, p, Seq(
      AttributeReference("id", LongType, nullable = false)(),
      AttributeReference("center", ArrayType(FloatType, containsNull = false), nullable = false)(),
      AttributeReference("weight", LongType, nullable = false)()))
}

/** Planner rule: one logical coreset node → one physical exec node. */
object CoresetStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case CoresetPlan(child, kPrime, p, out) => CoresetExec(planLater(child), kPrime, p, out) :: Nil
    case _ => Nil
  }
}

/** Physical operator: ONE deterministic `id % p` exchange (the exec-owned
  * distribution — see [[CoresetPlan]]) followed by per-residue-class
  * GMM(k′) + delegate weighting. No driver involvement; the
  * composable-coreset theorem is exactly the license to fold each
  * residue class independently. Memory per task is O(partition) input
  * (the GMM kernel needs its partition resident, like any mapPartitions
  * fold) + O(k′) output.
  */
case class CoresetExec(child: SparkPlan, kPrime: Int, p: Int, output: Seq[Attribute])
    extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet

  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet

  override protected def doExecute(): RDD[InternalRow] = {
    // Belt-and-braces for the pruning class of bug: fail loudly if the
    // child ever stops delivering the two-column (id, embedding) contract
    // (a zero-column child here once meant memory-unsafe getLong reads).
    require(child.output.length == 2,
      s"CoresetExec child must deliver (id, embedding); got ${child.output}")
    val k = kPrime
    val schema = output
    // Exec-owned distribution: key by id, exact-mod partition (rows are
    // reused buffers — copy BEFORE they cross the shuffle serializer).
    child.execute()
      .mapPartitions(rows => rows.map(r => (r.getLong(0), r.copy())))
      .partitionBy(new ModPartitioner(p))
      .values
      .mapPartitions { rows =>
      // Materialize the residue class as Pts, fold with the shared
      // kernel, then emit UNSAFE rows — the inter-operator row contract
      // (exchanges and several consumers cast to UnsafeRow).
      val pts = Vector.newBuilder[Pt]
      while (rows.hasNext) {
        val r = rows.next()
        pts += Pt(r.getLong(0), r.getArray(1).toFloatArray())
      }
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(schema, schema)
      MapReduceCoreset.localCoreset(pts.result().iterator, k).map { wp =>
        toUnsafe(new GenericInternalRow(Array[Any](
          wp.id, new GenericArrayData(wp.vec), wp.weight))).copy(): InternalRow
      }
    }
  }

  override def simpleString(maxFields: Int): String = s"CoresetExec k'=$kPrime p=$p"

  override protected def withNewChildInternal(newChild: SparkPlan): CoresetExec =
    copy(child = newChild)
}
