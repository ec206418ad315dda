package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeSeq, BindReferences, Cast, Expression,
  GenericInternalRow, JoinedRow, Literal, SortOrder, UnsafeProjection,
  UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{
  DenseRank, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Rank, RowNumber}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Native per-key top-k: the whole-operator replacement for the
  * `row_number()/rank()/dense_rank() OVER (PARTITION BY k ORDER BY o)
  * <= n` idiom (SURVEY §2.8 W1 — the reference's per-day chart rank at
  * snowflake-pipeline-query/spotify-analysis.sql:101-107 is exactly this
  * shape).
  *
  * Why a custom operator when Spark has window + InferWindowGroupLimit:
  * the stock plan still SORTS every post-limit partition and runs the
  * window machinery over it. This operator keeps a size-k bounded heap
  * per key — no sort of the k·|keys| survivors, and the partial pass
  * prunes BEFORE the exchange, so the shuffle carries at most k rows per
  * (mapper, key) regardless of input size (for the ties-aware rank modes:
  * k order-groups, so ties widen the bound by the tie width only). At
  * 100 TB / 1000 executors that is the difference between shuffling the
  * events table and shuffling k rows per user per mapper.
  *
  * Memory: O(|keys in partition| · k) rows per task — the hash-aggregate
  * memory class (the stock sort-based plan is O(rows in partition)).
  *
  * Surfaces demonstrated: logical `UnaryNode`, optimizer
  * `Rule[LogicalPlan]` (pattern rewrite), `SparkStrategy` (partial/final
  * physical split), two `UnaryExecNode`s with a distribution requirement
  * that EnsureRequirements satisfies with a hash exchange.
  */
sealed trait RankMode
object RankMode {
  /** row_number(): exactly k rows per key, rank = position. */
  case object RowNum extends RankMode
  /** rank(): competition ranking — ties share a rank and may push the
    * kept-row count per key above k (all rows with rank ≤ k are kept). */
  case object Rank extends RankMode
  /** dense_rank(): k distinct order-values per key, no rank gaps. */
  case object Dense extends RankMode
}

case class TopKPerKeyNode(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    mode: RankMode,
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

  /** Per-key retention buffer: keep exactly the rows whose rank under
    * `mode` is ≤ k, and replay them in order with their rank. */
  private sealed trait KeyBuffer {
    def offer(row: UnsafeRow): Unit
    /** Survivors in rank order. */
    def drainSorted(): Iterator[UnsafeRow]
    /** Survivors with their 1-based rank under the mode. */
    def drainRanked(): Iterator[(UnsafeRow, Long)]
  }

  /** row_number mode: bounded max-heap, k rows, rank = position. */
  private final class BoundedHeap(k: Int, ord: Ordering[InternalRow]) extends KeyBuffer {
    // max-heap so peek() is the worst survivor
    val q = new java.util.PriorityQueue[UnsafeRow](k, ord.reverse)
    def offer(row: UnsafeRow): Unit =
      if (q.size < k) q.add(row.copy())
      else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
    private def drainArray(): Array[UnsafeRow] = {
      val a = new Array[UnsafeRow](q.size)
      var i = a.length - 1
      while (i >= 0) { a(i) = q.poll(); i -= 1 } // heap pops worst-first
      a
    }
    def drainSorted(): Iterator[UnsafeRow] = drainArray().iterator
    def drainRanked(): Iterator[(UnsafeRow, Long)] =
      drainArray().iterator.zipWithIndex.map { case (r, i) => (r, (i + 1).toLong) }
  }

  /** rank()/dense_rank() mode: ties share a rank, so retention is by
    * ORDER-VALUE GROUP — a TreeMap of tie-groups ordered by the sort key.
    * rank(): keep groups g1..gp for the smallest p with Σ|g_i| ≥ k (every
    * retained row has competition rank ≤ k; the tie overflow at the
    * boundary is kept, matching window semantics). dense_rank(): keep the
    * k smallest distinct order-values. */
  private final class RankedBuffer(k: Int, ord: Ordering[InternalRow], dense: Boolean)
      extends KeyBuffer {
    private val m = new java.util.TreeMap[UnsafeRow, java.util.ArrayList[UnsafeRow]](ord)
    private var total = 0
    def offer(row: UnsafeRow): Unit = {
      if (!m.isEmpty && ord.compare(row, m.lastKey()) > 0 &&
          (if (dense) m.size >= k else total >= k)) return // would trim instantly
      var lst = m.get(row)
      if (lst == null) {
        lst = new java.util.ArrayList[UnsafeRow](1)
        m.put(row.copy(), lst)
      }
      lst.add(row.copy())
      total += 1
      if (dense) {
        while (m.size > k) total -= m.pollLastEntry().getValue.size
      } else {
        var last = m.lastEntry()
        while (last != null && total - last.getValue.size >= k) {
          m.pollLastEntry(); total -= last.getValue.size; last = m.lastEntry()
        }
      }
    }
    def drainSorted(): Iterator[UnsafeRow] = {
      import scala.jdk.CollectionConverters._
      m.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
    def drainRanked(): Iterator[(UnsafeRow, Long)] = {
      import scala.jdk.CollectionConverters._
      var prefix = 0L
      var denseRank = 0L
      m.values().iterator().asScala.flatMap { lst =>
        denseRank += 1
        val rank = if (dense) denseRank else prefix + 1
        prefix += lst.size
        lst.iterator().asScala.map(r => (r, rank))
      }
    }
  }

  private def newBuffer(k: Int, ord: Ordering[InternalRow], mode: RankMode): KeyBuffer =
    mode match {
      case RankMode.RowNum => new BoundedHeap(k, ord)
      case RankMode.Rank   => new RankedBuffer(k, ord, dense = false)
      case RankMode.Dense  => new RankedBuffer(k, ord, dense = true)
    }

  /** Shared kernel: fold `iter` into per-key retention buffers. */
  private def buildBuffers(
      iter: Iterator[InternalRow],
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      mode: RankMode,
      input: Seq[Attribute]): java.util.LinkedHashMap[UnsafeRow, KeyBuffer] = {
    val keyProj = UnsafeProjection.create(part, input)
    val rowProj = UnsafeProjection.create(input, input)
    val ord = GenerateOrdering.generate(
      BindReferences.bindReferences(order, AttributeSeq(input)))
    val heaps = new java.util.LinkedHashMap[UnsafeRow, KeyBuffer]()
    while (iter.hasNext) {
      val row = rowProj(iter.next()) // normalize to UnsafeRow for cheap copies
      val key = keyProj(row)
      var h = heaps.get(key)
      if (h == null) { h = newBuffer(k, ord, mode); heaps.put(key.copy(), h) }
      h.offer(row)
    }
    heaps
  }

  private[plans] def prune(
      iter: Iterator[InternalRow],
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      mode: RankMode,
      input: Seq[Attribute]): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    buildBuffers(iter, part, order, k, mode, input).values().iterator().asScala
      .flatMap(_.drainSorted())
  }

  private[plans] def emitRanked(
      iter: Iterator[InternalRow],
      part: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      mode: RankMode,
      input: Seq[Attribute],
      output: Seq[Attribute]): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    val outProj = UnsafeProjection.create(output, input :+ output.last)
    val joined = new JoinedRow
    val rankRow = new GenericInternalRow(1)
    val rankIsLong = output.last.dataType == LongType
    buildBuffers(iter, part, order, k, mode, input).values().iterator().asScala
      .flatMap { h =>
        h.drainRanked().map { case (row, rank) =>
          if (rankIsLong) rankRow.update(0, rank)
          else rankRow.update(0, rank.toInt)
          outProj(joined(row, rankRow))
        }
      }
  }
}

/** Map-side prune: at most k rows (k tie-groups for the rank modes) per
  * (partition, key) survive to the exchange. Pure row-count reduction —
  * emits child rows unchanged. Safe for rank modes because a row's LOCAL
  * rank never exceeds its global rank (merging partitions only adds
  * predecessors), so local rank ≤ k retains a superset of the answer. */
case class TopKPerKeyPartialExec(
    part: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    mode: RankMode,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      it => TopKPerKey.prune(it, part, order, k, mode, child.output),
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
    mode: RankMode,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(part) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(
      it => TopKPerKey.emitRanked(it, part, order, k, mode, child.output, output),
      preservesPartitioning = true)
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial → (exchange) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(part, order, k, rankAttr, mode, child) =>
      TopKPerKeyFinalExec(part, order, k, rankAttr, mode,
        TopKPerKeyPartialExec(part, order, k, mode, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Rewrites `Filter(…rank_attr ≤ k…, [Project(...,)] Window(rankLike))`
  * into [[TopKPerKeyNode]] for row_number(), rank(), and dense_rank().
  * Conservative by construction: fires only when the window computes
  * EXACTLY one expression, that expression is a supported rank function
  * with nonempty PARTITION BY, and some conjunct of the filter bounds (a
  * possibly Cast-renamed alias of) that attribute above by an integer
  * literal (`<= k`, `< k`, `= k`; a conjunction may carry unrelated
  * predicates — e.g. a join's pushed-down null filters — which simply
  * remain in the Filter). The original Filter/Project stay in place (the
  * rank bound is a no-op on the survivors, the other conjuncts apply as
  * before), so every downstream attribute keeps its exprId. */
object TopKRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** (rankExpr, k) when `cond` is a literal upper bound on it. `= n` is
    * a bound too: prune to n, the retained Filter applies the equality. */
  private def bound(cond: Expression): Option[(Expression, Long)] = cond match {
    case LessThanOrEqual(a, IntegralLit(n)) => Some((a, n))
    case LessThan(a, IntegralLit(n))        => Some((a, n - 1))
    case GreaterThanOrEqual(IntegralLit(n), a) => Some((a, n))
    case GreaterThan(IntegralLit(n), a)        => Some((a, n - 1))
    case EqualTo(a, IntegralLit(n)) => Some((a, n))
    case EqualTo(IntegralLit(n), a) => Some((a, n))
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

  private def rankWindow(w: Window): Option[(Attribute, RankMode)] = w match {
    case Window(Seq(a @ Alias(WindowExpression(fn, _), _)), part, _, _, _)
        if part.nonEmpty =>
      fn match {
        case RowNumber()   => Some((a.toAttribute, RankMode.RowNum))
        case Rank(_)       => Some((a.toAttribute, RankMode.Rank))
        case DenseRank(_)  => Some((a.toAttribute, RankMode.Dense))
        case _ => None
      }
    case _ => None
  }

  /** Does `e` evaluate to the rank attribute (directly or via an
    * integral up-cast)? */
  private def isRank(e: Expression, rank: Attribute): Boolean = e match {
    case a: Attribute => a.exprId == rank.exprId
    case Cast(inner, LongType | IntegerType, _, _) => isRank(inner, rank)
    case _ => false
  }

  /** Smallest literal upper bound any conjunct of `cond` puts on `sat`,
    * where `sat` decides whether a bound expression denotes the rank. */
  private def minBound(cond: Expression, sat: Expression => Boolean): Option[Long] = {
    val ks = splitConjunctivePredicates(cond)
      .flatMap(bound(_).collect { case (e, n) if sat(e) => n })
    if (ks.isEmpty) None else Some(ks.min)
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // filter directly over the window
    case f @ Filter(cond, w: Window) =>
      rankWindow(w) match {
        case Some((rank, mode)) =>
          minBound(cond, {
            case a: Attribute => a.exprId == rank.exprId
            case _ => false
          }) match {
            case Some(n) if n >= 1 && n <= Int.MaxValue =>
              f.copy(child = TopKPerKeyNode(
                w.partitionSpec, w.orderSpec, n.toInt, rank, mode, unlimited(w.child)))
            case _ => f
          }
        case _ => f
      }
    // filter over a Project that aliases (a cast of) the rank attribute
    case f @ Filter(cond, p @ Project(projList, w: Window)) =>
      rankWindow(w) match {
        case Some((rank, mode)) =>
          val rankAliases = projList.collect {
            case al: Alias if isRank(al.child, rank) => al.exprId
            case attr: Attribute if attr.exprId == rank.exprId => attr.exprId
          }.toSet
          minBound(cond, {
            case a: Attribute => rankAliases.contains(a.exprId)
            case _ => false
          }) match {
            case Some(n) if n >= 1 && n <= Int.MaxValue =>
              f.copy(child = p.copy(child = TopKPerKeyNode(
                w.partitionSpec, w.orderSpec, n.toInt, rank, mode, unlimited(w.child))))
            case _ => f
          }
        case _ => f
      }
  }
}
