package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

/** Point-in-time (as-of) join as a first-class Catalyst operator — the
  * whole-operator extension rung: a custom `LogicalPlan` node, a
  * `SparkStrategy`, and a `SparkPlan` with declared distribution /
  * ordering requirements, registered via `SparkSessionExtensions`
  * (`injectPlannerStrategy`) or `experimental.extraStrategies`.
  *
  * Semantics (pandas `merge_asof` backward / DuckDB `ASOF LEFT JOIN`):
  * every left row pairs with the right row sharing its key that has the
  * LARGEST right timestamp ≤ the left timestamp, or nulls if none.
  *
  * Why an operator and not a formulation: the declarative routes are a
  * range join (quadratic blowup without interval bucketing) or a
  * union + conditional running-max window (what `q_asof_join` ships for
  * the single-table case — it works, but materializes both inputs
  * through one window and cannot preserve either side's column set
  * cleanly for two distinct tables). This node instead REQUIRES
  * hash-clustering on the key and (key, ts) ordering from each child —
  * Catalyst's EnsureRequirements then plans one exchange + sort per
  * side, exactly a sort-merge join's cost — and streams both sorted
  * iterators per partition with O(1) state (current right row + last
  * match). At 100 TB: no state blowup, no skew amplification beyond the
  * key's own distribution, and the output preserves the left ordering
  * so downstream per-key windows reuse the sort.
  *
  * Lives under `org.apache.spark.sql.graft` because `Dataset.ofRows` —
  * the only way to wrap a custom logical node as a DataFrame — is
  * `private[sql]`; the same shim-package pattern Spark extension
  * libraries use. Callers use [[graft.ops.Relational.asofJoinTables]].
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    direction: String = "backward",
    tolerance: Long = -1L,
    broadcastHint: Option[Boolean] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical selection mirrors Spark's own `JoinSelection`: if the
  * right side's logical-plan statistics fit under
  * `spark.sql.autoBroadcastJoinThreshold` (or the caller forced it),
  * plan the broadcast exec — the big side then needs NO exchange and
  * NO sort. Otherwise the sort-merge-shaped exec. Because the decision
  * reads `right.stats`, an injected learned-estimator cardinality
  * (`EstimatedStatsRule`) flips this choice exactly as it flips
  * Catalyst's own equi-join strategy.
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lts, rts, dir, tol, hint) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val auto = threshold > 0 && r.stats.sizeInBytes <= threshold
      if (hint.getOrElse(auto))
        BroadcastAsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts,
          dir, tol) :: Nil
      else
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts,
          dir, tol) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge. `direction`:
  *  - "backward" (default): largest right ts ≤ left ts — any ordered
  *    ts type (the original operator).
  *  - "forward": smallest right ts ≥ left ts. As both sides arrive
  *    (key, ts)-sorted, the first not-yet-consumed right row IS the
  *    forward candidate — matches are monotone in left ts, so the
  *    single forward scan still suffices and the candidate is never
  *    copied (O(1) state, zero allocation).
  *  - "nearest": whichever of the backward/forward candidates is
  *    closer (tie → backward), pandas merge_asof semantics.
  * `tolerance` (ts units, −1 = none) bounds the match distance; for
  * "nearest" it filters BEFORE choosing, so a backward match inside
  * the window beats a nearer forward match outside it. forward /
  * nearest / tolerance need ts arithmetic and so an integral or
  * timestamp ts column; plain backward stays type-generic.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    direction: String = "backward",
    tolerance: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // One hash exchange per side on the join key — the SMJ cost shape.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // (key, ts) ascending per side: the merge is then a single forward
  // scan of both iterators with O(1) state.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // Left rows pass through in order; downstream reuses both.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val fullOutput = output
    val (lk, lt) = (leftKey, leftTs)
    val (rk, rt) = (rightKey, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKey = BindReferences.bindReference(lk, leftOutput)
      val lTs = BindReferences.bindReference(lt, leftOutput)
      val rKey = BindReferences.bindReference(rk, rightOutput)
      val rTs = BindReferences.bindReference(rt, rightOutput)
      val keyOrd = TypeUtils.getInterpretedOrdering(lk.dataType)
      val tsOrd = TypeUtils.getInterpretedOrdering(lt.dataType)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.length)
      val outProj = UnsafeProjection.create(fullOutput, fullOutput)

      val dir = direction
      val tol = tolerance
      // forward/nearest/tolerance need ts differences; ts evals to a
      // Long for TimestampType (micros) and integral types.
      def tsNum(v: Any): Long = v match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case s: java.lang.Short => s.toLong
        case b: java.lang.Byte => b.toLong
        case other => throw new UnsupportedOperationException(
          "forward/nearest/tolerance as-of needs an integral or " +
            s"timestamp ts column, got ${other.getClass.getSimpleName}")
      }

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: Any = _
        private var rHeadTs: Any = _
        private var lastMatch: InternalRow = _ // copied; survives rHead
        private var lastMatchKey: Any = _
        private var lastMatchTs: Any = _
        private var primed = false

        private def advanceRight(): Unit = {
          rHead = null
          // Skip right rows with null key or null ts — they can never
          // be an as-of match.
          while (rHead == null && rIt.hasNext) {
            val r = rIt.next()
            val k = rKey.eval(r)
            val t = rTs.eval(r)
            if (k != null && t != null) {
              rHead = r; rHeadKey = k; rHeadTs = t
            }
          }
        }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          if (!primed) { advanceRight(); primed = true }
          val l = lIt.next()
          val k = lKey.eval(l)
          val t = lTs.eval(l)
          if (k == null || t == null) return outProj(joiner(l, nullRight))
          // Consume right rows before the boundary: backward takes
          // rt ≤ t inclusively into the backward candidate; forward/
          // nearest stop at rt == t so the head stays the (inclusive ≥)
          // forward candidate. Matches are monotone in left ts either
          // way, so one forward scan serves every direction.
          val inclusive = dir == "backward"
          while (rHead != null && {
            val c = keyOrd.compare(rHeadKey.asInstanceOf[AnyRef],
              k.asInstanceOf[AnyRef])
            c < 0 || (c == 0 && {
              val ct = tsOrd.compare(rHeadTs.asInstanceOf[AnyRef],
                t.asInstanceOf[AnyRef])
              if (inclusive) ct <= 0 else ct < 0
            })
          }) {
            // forward never looks back — skip the copy entirely.
            if (dir != "forward" && keyOrd.compare(
                rHeadKey.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef]) == 0) {
              lastMatch = rHead.copy()
              lastMatchKey = rKey.eval(lastMatch)
              lastMatchTs = rTs.eval(lastMatch)
            }
            advanceRight()
          }
          val backOk = dir != "forward" && lastMatch != null &&
            keyOrd.compare(lastMatchKey.asInstanceOf[AnyRef],
              k.asInstanceOf[AnyRef]) == 0 &&
            (tol < 0 || tsNum(t) - tsNum(lastMatchTs) <= tol)
          val fwdOk = dir != "backward" && rHead != null &&
            keyOrd.compare(rHeadKey.asInstanceOf[AnyRef],
              k.asInstanceOf[AnyRef]) == 0 &&
            (tol < 0 || tsNum(rHeadTs) - tsNum(t) <= tol)
          val m =
            if (backOk && fwdOk) {
              // nearest: tie goes backward (pandas merge_asof).
              if (tsNum(t) - tsNum(lastMatchTs) <= tsNum(rHeadTs) - tsNum(t))
                lastMatch
              else rHead
            } else if (backOk) lastMatch
            else if (fwdOk) rHead
            else nullRight
          outProj(joiner(l, m))
        }
      }
    }
  }
}

/** Broadcast as-of join: the small right side is broadcast whole
  * (`IdentityBroadcastMode` — EnsureRequirements/AQE insert the
  * standard `BroadcastExchangeExec`), grouped per key and ts-sorted
  * once per partition, and every left row resolves its match with a
  * binary search. The left child has NO distribution or ordering
  * requirement: at 100 TB the fact side streams straight from the
  * scan through this map-side operator — zero shuffle, zero sort —
  * which is the same asymptotic win broadcast-hash has over
  * sort-merge for equi-joins. Matches the merge exec bit-for-bit on
  * every direction/tolerance combination (asserted in AsofJoinSpec).
  */
case class BroadcastAsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    direction: String = "backward",
    tolerance: Long = -1L) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // Pure map-side: whatever layout the left arrives in survives.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOutput = left.output
    val rightOutput = right.output
    val fullOutput = output
    val (lk, lt) = (leftKey, leftTs)
    val (rk, rt) = (rightKey, rightTs)
    val dir = direction
    val tol = tolerance
    val bcast = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIt =>
      val lKey = BindReferences.bindReference(lk, leftOutput)
      val lTs = BindReferences.bindReference(lt, leftOutput)
      val rKey = BindReferences.bindReference(rk, rightOutput)
      val rTs = BindReferences.bindReference(rt, rightOutput)
      val tsOrd = TypeUtils.getInterpretedOrdering(lt.dataType)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.length)
      val outProj = UnsafeProjection.create(fullOutput, fullOutput)

      def tsNum(v: Any): Long = v match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case s: java.lang.Short => s.toLong
        case b: java.lang.Byte => b.toLong
        case other => throw new UnsupportedOperationException(
          "forward/nearest/tolerance as-of needs an integral or " +
            s"timestamp ts column, got ${other.getClass.getSimpleName}")
      }

      // Index the broadcast side once per partition: key → ts-sorted
      // parallel arrays. Small by the strategy's size gate, and the
      // evaluated key/ts values (UTF8String, Long, …) hash and compare
      // correctly as JVM objects. Equal-ts runs keep input order via
      // stable sort, mirroring the merge exec's scan.
      val index = new java.util.HashMap[Any, (Array[Any], Array[InternalRow])]
      locally {
        val buf = new java.util.HashMap[
          Any, scala.collection.mutable.ArrayBuffer[(Any, InternalRow)]]
        bcast.value.foreach { r =>
          val k = rKey.eval(r)
          val t = rTs.eval(r)
          if (k != null && t != null)
            buf.computeIfAbsent(k,
              _ => scala.collection.mutable.ArrayBuffer.empty).append((t, r))
        }
        buf.forEach { (k, entries) =>
          val sorted = entries.sortBy(_._1.asInstanceOf[AnyRef])(
            tsOrd.asInstanceOf[Ordering[AnyRef]])
          index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
      }

      lIt.map { l =>
        val k = lKey.eval(l)
        val t = lTs.eval(l)
        val hit = if (k == null || t == null) null else index.get(k)
        if (hit == null) outProj(joiner(l, nullRight))
        else {
          val (ts, rows) = hit
          // upper bound: first idx with ts > t → back candidate before it;
          // lower bound: first idx with ts ≥ t → forward candidate.
          var lo = 0; var hi = ts.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (tsOrd.compare(ts(mid).asInstanceOf[AnyRef],
                t.asInstanceOf[AnyRef]) <= 0) lo = mid + 1 else hi = mid
          }
          val ub = lo
          lo = 0; hi = ts.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (tsOrd.compare(ts(mid).asInstanceOf[AnyRef],
                t.asInstanceOf[AnyRef]) < 0) lo = mid + 1 else hi = mid
          }
          val lb = lo
          val backOk = dir != "forward" && ub > 0 &&
            (tol < 0 || tsNum(t) - tsNum(ts(ub - 1)) <= tol)
          val fwdOk = dir != "backward" && lb < ts.length &&
            (tol < 0 || tsNum(ts(lb)) - tsNum(t) <= tol)
          val m =
            if (backOk && fwdOk) {
              if (tsNum(t) - tsNum(ts(ub - 1)) <= tsNum(ts(lb)) - tsNum(t))
                rows(ub - 1)
              else rows(lb)
            } else if (backOk) rows(ub - 1)
            else if (fwdOk) rows(lb)
            else nullRight
          outProj(joiner(l, m))
        }
      }
    }
  }
}

object AsofJoin {
  /** Idempotently make the strategy available to `spark` (for sessions
    * not built `.withExtensions(new GraftExtensions)`). */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }

  /** Build the DataFrame. Column names must be disjoint across sides
    * (alias the right side first); the right side's attributes are
    * re-aliased defensively so a self-join of one source cannot carry
    * duplicate expression IDs into the node's output.
    * `direction` ∈ backward | forward | nearest; `toleranceUs` bounds
    * the match distance in the ts column's own units (µs for
    * timestamps), −1 = unbounded. `broadcast`: Some(true)/Some(false)
    * force the broadcast/merge exec; None (default) lets the strategy
    * decide from the right side's stats vs autoBroadcastJoinThreshold.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTsCol: String, rightTsCol: String,
      direction: String = "backward",
      toleranceUs: Long = -1L,
      broadcast: Option[Boolean] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"unknown as-of direction '$direction'")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, shared: $dup")
    if (direction != "backward" || toleranceUs >= 0) {
      val tsType = left.schema.find(_.name == leftTsCol).map(_.dataType)
      val ok = tsType.exists {
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType |
            org.apache.spark.sql.types.LongType |
            org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      require(ok, "forward/nearest/tolerance as-of needs an integral " +
        s"or timestamp ts column, got $tsType")
    }
    // Fail fast on type mismatches: the exec's interpreted orderings
    // come from the LEFT side's types and the two sides must hash-
    // partition identically — a Long-vs-Int key would otherwise
    // mis-cluster or ClassCastException mid-merge.
    def dt(df: DataFrame, n: String) = df.schema.find(_.name == n).map(_.dataType)
    require(dt(left, leftKeyCol) == dt(right, rightKeyCol),
      s"key types differ: ${dt(left, leftKeyCol)} vs ${dt(right, rightKeyCol)}")
    require(dt(left, leftTsCol) == dt(right, rightTsCol),
      s"ts types differ: ${dt(left, leftTsCol)} vs ${dt(right, rightTsCol)}")
    val spark = left.sparkSession
    ensureStrategy(spark)
    // Fresh exprIds on the right via aliases (Alias always re-mints).
    val rightFresh = right.select(right.columns.map(c =>
      org.apache.spark.sql.functions.col(c).as(c)): _*)
    val lp = left.queryExecution.analyzed
    val rp = rightFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' on $side side"))
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession],
      AsofJoin(lp, rp,
        attr(lp, leftKeyCol, "left"), attr(rp, rightKeyCol, "right"),
        attr(lp, leftTsCol, "left"), attr(rp, rightTsCol, "right"),
        direction, toleranceUs, broadcast))
  }
}
