package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{ColumnStat, LogicalPlan, Statistics, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Learned-cardinality statistics injection — the second half of the
  * optimizer-integration north star (the first is the COUNT(*) rewrite
  * in `graft.plans.ApproxCountRule`). The reference's estimators never
  * reach a real optimizer; here a registered model's estimate becomes
  * the `Statistics` Catalyst's OWN join planning reads, so the
  * broadcast-vs-shuffle decision flips on the model, with no forced
  * hints and no bypassed planner.
  *
  * [[StatsAnnotated]] is a stats-bearing pass-through: a `UnaryNode`
  * whose overridden `stats` replaces the size-only estimate (for a
  * `Filter`, Spark's `SizeInBytesOnlyStatsPlanVisitor` just propagates
  * the child relation's file size — a selective predicate over a big
  * table still "looks big" and gets a shuffle join; conversely a small
  * compressed file under-reports its in-memory width and gets a
  * broadcast that can OOM the build side). `graft.plans
  * .EstimatedStatsRule` wraps qualifying filters after the main
  * optimization batches (so pushdown/pruning see the plain `Filter`);
  * [[StatsAnnotatedStrategy]] erases the wrapper at physical planning
  * by planning its child — by then `JoinSelection` has already read
  * the injected numbers.
  *
  * At 100 TB the payoff is the reference's own motivating case
  * (BASELINE: "integration into query optimizer"): a learned estimate
  * that is orders of magnitude closer than file-size heuristics
  * decides whether a dimension-side subquery ships to every executor
  * or pays a full shuffle — the single most expensive binary choice in
  * a distributed join.
  *
  * Shim package: `SparkStrategy` is `private[sql]`, same pattern as
  * [[AsofJoinStrategy]].
  */
case class StatsAnnotated(
    child: LogicalPlan,
    estRows: BigInt,
    estSizeInBytes: BigInt,
    attrStats: Seq[(Attribute, ColumnStat)] = Nil) extends UnaryNode {

  override def output: Seq[Attribute] = child.output

  // Replaces (not merges) the visitor-computed statistics: sizeInBytes
  // drives broadcast selection in every stats mode; rowCount feeds the
  // CBO visitors when spark.sql.cbo.enabled is on. `attrStats` (r15)
  // carries learned per-column distinct counts for join keys: Catalyst's
  // `JoinEstimation` computes an equi-join's cardinality as
  // rows_l x rows_r / max(ndv_l, ndv_r) ONLY when both key columns have
  // count stats — without them every candidate join in
  // CostBasedJoinReorder's DP search is costed at the cartesian product,
  // so reorder decisions degrade to row counts alone (the failure the
  // q_join_reorder_ndv entry pins).
  //
  // The AttributeMap keys are rebuilt from child.output BY NAME at read
  // time: `attrStats` lives in a Seq[(Attribute, ColumnStat)] field that
  // QueryPlan's expression traversal does not rewrite, so a transform
  // that remaps exprIds (dedup-alias, subquery reuse) would silently
  // orphan exprId-keyed stats and drop JoinEstimation back to cartesian
  // costing with no signal. Names survive every remap; output names are
  // unique below a Filter over a relation (the only shape the rule
  // wraps).
  override def stats: Statistics = {
    val byName = child.output.map(a => a.name -> a).toMap
    val rebuilt = attrStats.flatMap { case (a, cs) =>
      byName.get(a.name).map(_ -> cs)
    }
    Statistics(sizeInBytes = estSizeInBytes.max(1), rowCount = Some(estRows),
      attributeStats = org.apache.spark.sql.catalyst.expressions
        .AttributeMap(rebuilt))
  }

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(
      newChild: LogicalPlan): StatsAnnotated = copy(child = newChild)
}

object StatsAnnotatedStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case sa: StatsAnnotated => planLater(sa.child) :: Nil
    case _ => Nil
  }
}

object StatsAnnotated {
  /** Idempotently make the erasing strategy available to `spark` (for
    * sessions not built `.withExtensions(new GraftExtensions)`). */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(StatsAnnotatedStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ StatsAnnotatedStrategy
  }
}
