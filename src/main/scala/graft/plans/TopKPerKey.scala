package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSeq, BindReferences, Cast, Expression,
  GenericInternalRow, JoinedRow, Literal, SortOrder, UnsafeProjection,
  UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{
  GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, RowNumber}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Native per-key top-k: the whole-operator replacement for the
  * `row_number() OVER (PARTITION BY k ORDER BY o) <= n` idiom
  * (SURVEY §2.8 W1 — the reference's per-day chart rank at
  * snowflake-pipeline-query/spotify-analysis.sql:101-107 is exactly this
  * shape).
  *
  * Why a custom operator when Spark has window + InferWindowGroupLimit:
  * the stock plan still SORTS every post-limit partition and runs the
  * window machinery over it. This operator keeps a size-k bounded heap
  * per key — no sort of the k·|keys| survivors, and the partial pass
  * prunes BEFORE the exchange, so the shuffle carries at most k rows per
  * (mapper, key) regardless of input size. At 100 TB / 1000 executors
  * that is the difference between shuffling the events table and
  * shuffling k rows per user per mapper.
  *
  * Memory: O(|keys in partition| · k) rows per task — the hash-aggregate
  * memory class (the stock sort-based plan is O(rows in partition)).
  *
  * Surfaces demonstrated: logical `UnaryNode`, optimizer
  * `Rule[LogicalPlan]` (pattern rewrite), `SparkStrategy` (partial/final
  * physical split), two `UnaryExecNode`s with a distribution requirement
  * that EnsureRequirements satisfies with a hash exchange.
  */
case class TopKPerKeyNode(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(part.nonEmpty, "TopKPerKeyNode: empty partition keys (use a global top-k/limit)")
  require(k >= 1, s"TopKPerKeyNode: k=$k")
  // NOTE: no maxRowsPerPartition override — the node emits up to k rows
  // per KEY, so a physical partition holding many keys produces k·|keys|
  // rows; advertising Some(k) would hand Catalyst (EliminateLimits et al.)
  // a false invariant. The bound cannot be stated without key cardinality.
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKey {

  /** Bounded max-heap insert: keep the k smallest rows under `ord`. */
  private final class BoundedHeap(k: Int, ord: Ordering[InternalRow]) {
    // max-heap so peek() is the worst survivor
    val q = new java.util.PriorityQueue[UnsafeRow](k, ord.reverse)
    def offer(row: UnsafeRow): Unit =
      if (q.size < k) q.add(row.copy())
      else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
    /** Survivors in rank order (1 = first under `ord`). */
    def drainSorted(): Array[UnsafeRow] = {
      val a = new Array[UnsafeRow](q.size)
      var i = a.length - 1
      while (i >= 0) { a(i) = q.poll(); i -= 1 } // heap pops worst-first
      a
    }
  }

  /** Shared kernel: fold `iter` into per-key bounded heaps. */
  private def buildHeaps(
      iter: Iterator[InternalRow],
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute]): java.util.LinkedHashMap[UnsafeRow, BoundedHeap] = {
    val keyProj = UnsafeProjection.create(part, input)
    val rowProj = UnsafeProjection.create(input, input)
    val ord = GenerateOrdering.generate(
      BindReferences.bindReferences(order, AttributeSeq(input)))
    val heaps = new java.util.LinkedHashMap[UnsafeRow, BoundedHeap]()
    while (iter.hasNext) {
      val row = rowProj(iter.next()) // normalize to UnsafeRow for cheap copies
      val key = keyProj(row)
      var h = heaps.get(key)
      if (h == null) { h = new BoundedHeap(k, ord); heaps.put(key.copy(), h) }
      h.offer(row)
    }
    heaps
  }

  private[plans] def prune(
      iter: Iterator[InternalRow],
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute]): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    buildHeaps(iter, part, order, k, input).values().iterator().asScala
      .flatMap(_.drainSorted())
  }

  private[plans] def emitRanked(
      iter: Iterator[InternalRow],
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      input: Seq[Attribute],
      output: Seq[Attribute]): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    val outProj = UnsafeProjection.create(output, input :+ output.last)
    val joined = new JoinedRow
    val rankRow = new GenericInternalRow(1)
    val rankIsLong = output.last.dataType == LongType
    buildHeaps(iter, part, order, k, input).values().iterator().asScala.flatMap { h =>
      h.drainSorted().iterator.zipWithIndex.map { case (row, i) =>
        if (rankIsLong) rankRow.update(0, (i + 1).toLong)
        else rankRow.update(0, i + 1)
        outProj(joined(row, rankRow))
      }
    }
  }
}

/** Map-side prune: at most k rows per (partition, key) survive to the
  * exchange. Pure row-count reduction — emits child rows unchanged. */
case class TopKPerKeyPartialExec(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      it => TopKPerKey.prune(it, part, order, k, child.output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce side: exact per-key top-k over the clustered survivors, with
  * the 1-based rank appended as `rankAttr`. */
case class TopKPerKeyFinalExec(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(part) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      it => TopKPerKey.emitRanked(it, part, order, k, child.output, output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(part, order, k, rankAttr, child) =>
      TopKPerKeyFinalExec(part, order, k, rankAttr,
        TopKPerKeyPartialExec(part, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(rank_attr <= k, [Project(...,)] Window(row_number()))`
  * into [[TopKPerKeyNode]]. Conservative by construction: fires only when
  * the window computes EXACTLY one expression, that expression is
  * row_number() with nonempty PARTITION BY, and the filter bounds (a
  * possibly Cast-renamed alias of) that attribute by an integer literal.
  * The original Filter/Project stay in place (the filter is a no-op on
  * the ≤k survivors), so every downstream attribute keeps its exprId. */
object TopKRewrite extends Rule[LogicalPlan] {

  /** (rankAttrExprId, k) when `cond` is a literal upper bound on `rn`. */
  private def bound(cond: Expression): Option[(Expression, Long)] = cond match {
    case LessThanOrEqual(a, IntegralLit(n)) => Some((a, n))
    case LessThan(a, IntegralLit(n))        => Some((a, n - 1))
    case GreaterThanOrEqual(IntegralLit(n), a) => Some((a, n))
    case GreaterThan(IntegralLit(n), a)        => Some((a, n - 1))
    case _ => None
  }

  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType)   => Some(v)
      case _ => None
    }
  }

  /** Strip a WindowGroupLimit Spark's own InferWindowGroupLimit may have
    * inserted below the window — our operator subsumes it. */
  private def unlimited(p: LogicalPlan): LogicalPlan = p match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  private def rowNumberWindow(w: Window): Option[Attribute] = w match {
    case Window(Seq(a @ Alias(WindowExpression(RowNumber(), _), _)), part, _, _, _)
        if part.nonEmpty => Some(a.toAttribute)
    case _ => None
  }

  /** Does `e` evaluate to the rank attribute (directly or via an
    * integral up-cast)? */
  private def isRank(e: Expression, rank: Attribute): Boolean = e match {
    case a: Attribute => a.exprId == rank.exprId
    case Cast(inner, LongType | IntegerType, _, _) => isRank(inner, rank)
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // filter directly over the window
    case f @ Filter(cond, w: Window) =>
      (bound(cond), rowNumberWindow(w)) match {
        case (Some((a: Attribute, n)), Some(rank))
            if a.exprId == rank.exprId && n >= 1 && n <= Int.MaxValue =>
          f.copy(child = TopKPerKeyNode(
            w.partitionSpec, w.orderSpec, n.toInt, rank, unlimited(w.child)))
        case _ => f
      }
    // filter over a Project that aliases (a cast of) the rank attribute
    case f @ Filter(cond, p @ Project(projList, w: Window)) =>
      (bound(cond), rowNumberWindow(w)) match {
        case (Some((a: Attribute, n)), Some(rank)) if n >= 1 && n <= Int.MaxValue =>
          val boundsRank = projList.exists {
            case al: Alias => al.exprId == a.exprId && isRank(al.child, rank)
            case attr: Attribute => attr.exprId == a.exprId && attr.exprId == rank.exprId
            case _ => false
          }
          if (boundsRank)
            f.copy(child = p.copy(child = TopKPerKeyNode(
              w.partitionSpec, w.orderSpec, n.toInt, rank, unlimited(w.child))))
          else f
        case _ => f
      }
  }
}
