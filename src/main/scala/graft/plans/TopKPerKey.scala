package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, NamedExpression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.IntegerType

/** Whole-operator top-k-per-key: a custom logical node, planner
  * strategy, and physical operator replacing the
  * `row_number() OVER (PARTITION BY … ORDER BY …) <= k` + filter idiom.
  *
  * Why a first-class operator: the window formulation shuffles EVERY
  * input row to its key's reducer and fully sorts each partition before
  * discarding all but k rows per key. This operator keeps a k-bounded
  * heap per key on the map side, so the exchange carries at most
  * `k · keys-per-partition` rows, and the reduce side never sorts more
  * than the survivors — the difference between shuffling 100 TB and
  * shuffling the answer. (Catalyst can't derive this rewrite because the
  * rank filter is applied *after* the window in the logical plan.)
  *
  * Semantics match `row_number` exactly when the ordering is total
  * (callers append a tie-break key, as all graft queries do); output
  * carries the child's columns plus an appended INT `rank` (1-based,
  * dense within each key).
  *
  * Physical shape: `TopKPerKeyExec(partial) → Exchange(keys) →
  * TopKPerKeyExec(final)` — EnsureRequirements inserts the exchange from
  * the final node's `ClusteredDistribution`, AQE coalesces it like any
  * aggregate exchange.
  */
object TopKPerKey {

  /** Logical node. `order` must be bound to `child` output attributes.
    * `rankAttr` is a constructor member (not a derived val) so plan
    * transforms via `copy` keep the exprId stable — parents referencing
    * `rank` stay resolved across optimizer rewrites.
    */
  case class Node(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: LogicalPlan,
      rankAttr: AttributeReference =
        AttributeReference("rank", IntegerType, nullable = false)())
    extends UnaryNode {
    override def output: Seq[Attribute] = child.output :+ rankAttr
    // rank originates here, not from the child — without this,
    // CheckAnalysis flags MISSING_ATTRIBUTES
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): Node =
      copy(child = newChild)
  }

  /** Planner strategy: partial (pre-shuffle) + final (post-shuffle). */
  object PlanStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case n: Node =>
        val pre: SparkPlan = Exec(n.keys, n.order, n.k, n.rankAttr,
          planLater(n.child), partial = true)
        Exec(n.keys, n.order, n.k, n.rankAttr, pre, partial = false) :: Nil
      case _ => Nil
    }
  }

  /** Physical operator. In partial mode emits surviving child rows
    * (≤ k per key per input partition, no rank); in final mode requires
    * key-clustered input and emits each key's rows in `order` with the
    * 1-based rank appended.
    */
  case class Exec(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      rankAttr: AttributeReference,
      child: SparkPlan,
      partial: Boolean) extends UnaryExecNode {

    override def nodeName: String =
      if (partial) "TopKPerKeyPartial" else "TopKPerKey"

    override def output: Seq[Attribute] =
      if (partial) child.output else child.output :+ rankAttr

    // rankAttr is an expression argument of this node in both modes
    // (partial doesn't output it but still "owns" it) — keeps
    // missingInput empty so the plan doesn't print the `!` marker
    override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    override def outputPartitioning: Partitioning = child.outputPartitioning

    override protected def doExecute(): RDD[InternalRow] = {
      val keyExprs = keys
      val sortOrder = order
      val limit = k
      val childOutput = child.output
      val isPartial = partial
      val outAttrs = output
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val ord = RowOrdering.create(sortOrder, childOutput)
        // reversed: heap head = the currently-worst survivor
        val heapOrd: java.util.Comparator[InternalRow] = ord.reverse
        val heaps =
          new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapOrd)
            heaps.put(key.copy(), heap)
          }
          if (heap.size() < limit) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
        val rankedProj =
          if (isPartial) null
          else UnsafeProjection.create(outAttrs, childOutput :+ rankAttr)
        val joined = new JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = new Array[InternalRow](heap.size())
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst→best
          if (isPartial) rows.iterator
          else rows.iterator.zipWithIndex.map { case (r, idx) =>
            rankRow.update(0, idx + 1)
            rankedProj(joined(r, rankRow))
          }
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): Exec =
      copy(child = newChild)
  }

  /** Make the strategy available on a session built without
    * `spark.sql.extensions` (idempotent, mirrors GraftFunctions.register).
    */
  def register(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(PlanStrategy))
      em.extraStrategies = PlanStrategy +: em.extraStrategies
  }

  /** Column-level API: top `k` rows per `keys` group under `order`
    * (callers must make `order` total with a tie-break column), with an
    * appended 1-based `rank`.
    */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val plan = df.queryExecution.analyzed
    val keyExprs = keys.map(c => resolve(PlanBridge.expression(spark, c), plan, spark))
    val sortOrder = order.map { c =>
      resolve(PlanBridge.expression(spark, c), plan, spark) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    PlanBridge.ofRows(spark, Node(keyExprs, sortOrder, k, plan))
  }

  private def resolve(e: Expression, plan: LogicalPlan, spark: SparkSession): Expression =
    e.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        plan.resolve(u.nameParts, spark.sessionState.analyzer.resolver)
          .getOrElse(throw new IllegalArgumentException(
            s"cannot resolve ${u.sql} against ${plan.output.map(_.name).mkString(", ")}"))
      case a: NamedExpression if !a.resolved =>
        throw new IllegalArgumentException(s"unresolved: ${a.sql}")
    }
}
