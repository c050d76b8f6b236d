package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (the `injectOptimizerRule` tier of SURVEY §2.8 — the
  * one extension point the expression / typed-aggregator / plan-node
  * trio didn't yet exercise): rewrites the canonical rank-limit idiom
  *
  *   SELECT … , row_number() OVER (PARTITION BY p ORDER BY o) AS rn …
  *   WHERE rn <= k
  *
  * to run the [[TopKPerKey]] bounded-heap operator UNDER the window, so
  * the full-input shuffle+sort feeds on ≤ k rows per (key, partition)
  * instead of the whole table. The Window + Filter stay in place over
  * the k-bounded survivors (recomputing row_number over ≤ k rows per
  * key is noise), which keeps the rewrite OUTPUT-IDENTICAL — same
  * columns, same rows, same rn values whenever the order is total, the
  * repo-wide rank discipline (with ties, vanilla Spark's own rn
  * assignment is already nondeterministic, and the rewrite is exactly
  * as (non)deterministic as the plan it replaces).
  *
  * Positioning vs Spark's built-in `InferWindowGroupLimit` (3.5+):
  * group-limit inserts a per-partition rank FILTER around the exchange,
  * but the surviving rows still go through the window's full
  * sort-based execution, and the pre-shuffle prune only engages in the
  * same simple-frame cases matched here. TopKPerKey replaces the
  * per-key SORT with bounded heaps on both sides of one exchange — the
  * hash-aggregate memory model (state = keys·k rows, not a sort
  * buffer), which is the shape that survives a skewed hot key at
  * 100 TB. The rule fires only on the simple, provably-safe pattern:
  * a Window whose ONLY expression is that row_number (extra window
  * columns would need the full input), a non-empty partition spec, and
  * a literal integer bound.
  *
  * Idempotence (the optimizer runs batches to fixpoint): a Window whose
  * child is already the matching [[TopKPerKey]] is left alone. */
object TopKPerKeyRewrite extends Rule[LogicalPlan] {

  /** Live-session route (tests / ad-hoc): the rule via
    * `experimental.extraOptimizations`, the strategy via
    * [[TopKPerKey.register]] — the same pair `GraftExtensions` wires at
    * session build. Keep register/unregister balanced: the rewrite
    * changes plan SHAPES, so a shared test session must not leak it. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    TopKPerKey.register(spark)
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        this +: spark.experimental.extraOptimizations
  }

  def unregister(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq this)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) if eligible(w) =>
      rankBound(cond, w.windowExpressions.head.toAttribute) match {
        case Some(k) if k > 0 && !alreadyRewritten(w, k) =>
          f.copy(child = w.copy(child =
            TopKPerKey(w.partitionSpec, w.orderSpec, k, w.child)))
        case _ => f
      }
  }

  /** The window computes EXACTLY one expression: a row_number over the
    * running row frame on its own (partitionSpec, orderSpec), with a
    * real partition key. */
  private def eligible(w: Window): Boolean = w.windowExpressions match {
    case Seq(Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(ps, os,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
      ps == w.partitionSpec && os == w.orderSpec && w.partitionSpec.nonEmpty
    case _ => false
  }

  private def alreadyRewritten(w: Window, k: Int): Boolean = w.child match {
    case t: TopKPerKey =>
      t.k == k && t.keys == w.partitionSpec && t.order == w.orderSpec
    case _ => false
  }

  /** `rn <= k` in its four literal-integer spellings. */
  private def rankBound(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.semanticEquals(rn) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k)
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
        if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1) // DISTINCT ON / argmax idiom
      case _ => None
    }
}
