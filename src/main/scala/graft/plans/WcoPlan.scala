package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The worst-case-optimal triangle join as a FIRST-CLASS Catalyst
  * operator — the (c)-tier extension path: a custom LogicalPlan node, a
  * planner strategy, and a physical exec, registered per session. This is
  * the one operator class Spark's binary-join planner genuinely cannot
  * express: any join order for the triangle query materializes the open
  * wedge set (Θ(Σ deg²) rows — the reference's whole reason to exist,
  * /root/reference/src/motif.rs), while the WCO count-propose-intersect
  * pipeline is bounded by AGM's O(|E|^{3/2}).
  *
  * The node composes with Catalyst above and below: the child is an
  * arbitrary logical plan (filters/projections on the edge table optimize
  * and prune as usual — the exec only requires two LONG columns), EXPLAIN
  * shows `TriangleEnumerate`, and everything above the node (aggregates,
  * further joins) plans normally over its (x0, x1, x2, w) output. */
final case class TriangleEnumerate(child: LogicalPlan,
                                   output: Seq[Attribute]) extends UnaryNode {
  // the outputs are MINTED here (declare them produced so the analyzer's
  // missing-input check passes) and BOTH child columns are consumed
  // (declare them referenced so column pruning keeps src AND dst — the
  // child's own subtree still prunes/pushes as usual)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): TriangleEnumerate =
    copy(child = newChild)
}

object TriangleEnumerate {
  /** Attribute identities are minted ONCE here (not in `output` itself)
    * so optimizer copies keep stable expr ids. */
  def apply(child: LogicalPlan): TriangleEnumerate =
    new TriangleEnumerate(child, Seq(
      AttributeReference("x0", LongType, nullable = false)(),
      AttributeReference("x1", LongType, nullable = false)(),
      AttributeReference("x2", LongType, nullable = false)(),
      AttributeReference("w", LongType, nullable = false)()))
}

/** Plans [[TriangleEnumerate]] into [[TriangleEnumerateExec]]; everything
  * else falls through to the built-in strategies. */
class GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TriangleEnumerate(child, out) =>
      TriangleEnumerateExec(out, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Physical triangle enumeration: the child's (src, dst) rows feed the
  * library's GenericJoin WCO pipeline (count-propose-intersect over the
  * consolidated edge index); the result plan's InternalRow RDD IS this
  * node's output. Everything is composed lazily on the driver — no job
  * runs until the parent plan executes, and the inner pipeline's
  * exchanges/AQE behave exactly as in the library-call form. */
final case class TriangleEnumerateExec(output: Seq[Attribute],
                                       child: SparkPlan) extends UnaryExecNode {
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: SparkPlan): TriangleEnumerateExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val edgeRows = child.execute().mapPartitions(_.map { r =>
      new GenericInternalRow(Array[Any](r.getLong(0), r.getLong(1))): InternalRow
    })
    val schema = StructType(Seq(
      StructField("src", LongType, nullable = false),
      StructField("dst", LongType, nullable = false)))
    val edges = GraftSqlBridge.internalDf(spark, edgeRows, schema)
    graft.batch.GenericJoin.enumerate(edges, graft.plan.Planner.triangle)
      .queryExecution.toRdd
  }
}

/** Session-facing entry points. */
object Wco {

  /** Registers [[GraftStrategy]] on the live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val exp = GraftSqlBridge.experimental(spark)
    if (!exp.extraStrategies.exists(_.isInstanceOf[GraftStrategy]))
      exp.extraStrategies = exp.extraStrategies :+ new GraftStrategy
  }

  /** Triangle enumeration as a logical-plan citizen: builds the custom
    * node over the (src, dst) child — the plan-integrated twin of
    * `GenericJoin.enumerate(edges, Planner.triangle)`. */
  def triangles(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    register(spark)
    val analyzed = edges.queryExecution.analyzed
    require(analyzed.output.length == 2 &&
      analyzed.output.forall(_.dataType == LongType),
      s"triangles() child must be (src: long, dst: long), got ${analyzed.output}")
    GraftSqlBridge.ofRows(spark, TriangleEnumerate(analyzed))
  }
}
