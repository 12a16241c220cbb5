package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared lineage-truncating loop driver for iterative DataFrame
  * algorithms (k-core peeling, BFS frontiers, label propagation,
  * fixed-point refinement).
  *
  * Why this exists: a loop that rebinds `df = step(df)` where `step`
  * references its input more than once multiplies the LOGICAL plan per
  * round — four rounds of a step with 5 self-references carries O(5^4)
  * copies of the base plan into the final query. Exchange reuse
  * deduplicates some of the physical work but not the analysis /
  * optimization cost or the AQE re-planned branches: the repo's own
  * k-core entry cost 78.5 s at sf0.1 (20% of the whole driver bench)
  * while its structurally identical non-iterative siblings ran in
  * single-digit seconds (VERDICT r11 "What's wrong" #1). This is the
  * canonical iterative-Spark scale-killer, and it is plan-explosion-
  * proportional, not data-proportional — 100x data makes it strictly
  * worse than 100x.
  *
  * The fix is per-round lineage truncation: `localCheckpoint(eager =
  * false)` replaces each round's logical plan with a `LogicalRDD` leaf
  * over the round's internal RDD. Plans stay round-local (analysis cost
  * constant per round), while the RDDs still form a shared DAG — each
  * round's partitions compute once and are persisted by the local
  * checkpoint, and the `ContextCleaner` releases a dropped round's
  * blocks once its Dataset is unreachable (the same contract
  * [[Dedup.connectedComponents]] has relied on since r9). Lazy
  * checkpointing (the default) truncates the plan without inserting an
  * extra action per round; pass `eager = true` when the caller wants
  * per-round materialization barriers (e.g. to fail fast inside the
  * loop).
  *
  * At cluster scale, local checkpoints trade fault-tolerance for speed:
  * a lost executor loses its blocks and the lineage to rebuild them is
  * gone. `reliableEvery = N` swaps in a RELIABLE `checkpoint()` to the
  * session's configured checkpoint dir every N rounds (local
  * truncation in between): a lost executor then costs at most N rounds
  * of recompute from the last durable snapshot instead of the whole
  * loop — the multi-hour 1000-executor posture. The loop SHAPE —
  * bounded rounds, one truncation per round — is identical either way
  * (property-tested: same results, same constant plan size).
  */
object Iterate {

  /** Steady-state retained-round window: the ContextCleaner frees a
    * dropped round's blocks only after its Dataset becomes unreachable
    * AND a GC cycle runs, so ~this many rounds of state coexist in the
    * storage pool mid-loop (the r14 100× audit measured k-core
    * retaining ~4.9 GB ≈ 3 × its per-round deserialized state). */
  private val RetainedRounds = 3

  /** Fraction of the storage pool the retained window may claim before
    * the auto-posture switches local rounds to serialized blocks.
    * Conservative on purpose: the deserialized default is FASTER while
    * it fits and BIMODAL once eviction starts (PLANS r14: k-core
    * 29.7–57.2 s deser vs 23.3–23.5 s SER at 100×) — switching early
    * costs a little serde CPU, switching late costs 1.5–2.7×. */
  private val PoolSafetyFraction = 0.5

  /** Storage-usable bytes across the cluster (per-executor block
    * manager maxMemory — the unified-memory storage ceiling). */
  private def storagePoolBytes(
      sc: org.apache.spark.SparkContext): Long =
    sc.getExecutorMemoryStatus.values.map(_._1).sum

  private def autoEnabled: Boolean =
    !sys.env.get("GRAFT_ITERATE_AUTO").exists(_.trim == "0")

  /** Auto-select the local rounds' storage posture when the caller
    * didn't (r15; VERDICT r14 ask #4 — pick the measured-flat posture
    * with NO env knobs): estimate the per-round state from the INITIAL
    * state's optimized-plan statistics (exact for persisted inputs —
    * the common case here: cached edge lists and pair frames — and
    * directional otherwise), scale by the retained-round window, and
    * compare against the storage pool. Past the threshold, local
    * rounds use MEMORY_AND_DISK_SER: row-frame blocks shrink
    * several-fold serialized, trading per-round serde CPU for staying
    * out of the eviction/GC collapse the 100× sweep measured. The
    * init-plan estimate is faithful for shrink-or-stable loops (peel,
    * rank, label propagation); growth-shaped loops are caught by the
    * measured-size check inside [[iterateUntil]]. Decisions are logged
    * so an audit run attributes the posture from output alone.
    * GRAFT_ITERATE_AUTO=0 disables both checks (the A/B lever);
    * GRAFT_ITERATE_SER=1 (or any explicit storageLevel) still takes
    * precedence by arriving as Some(level). */
  def autoStorageLevel(df: DataFrame): Option[StorageLevel] =
    if (!autoEnabled) None
    else {
      val sc = df.sparkSession.sparkContext
      val pool = storagePoolBytes(sc)
      val stats = df.queryExecution.optimizedPlan.stats
      // What the loop actually persists is ROW-format deserialized
      // blocks (UnsafeRow objects), NOT whatever format the init plan's
      // own estimate reflects — a persisted DataFrame init reports its
      // COLUMNAR-COMPRESSED cache size, several-fold below the row
      // blocks the rounds will retain (measured r14: k-core's edge
      // rounds held ~1.6 GB each while the same edges compressed to a
      // fraction columnar). When the row count is known (cached inputs
      // record it), floor the estimate with an UnsafeRow-block model:
      // ~16 B object header + 8 B row header + 8 B per field, doubled
      // for deser JVM object overhead — which reproduces the measured
      // 1.6 GB within ~20% for the 2-long edge schema.
      val nFields = df.schema.size
      val rowModel = stats.rowCount
        .map(rc => rc * (2L * (24 + 8 * nFields)))
        .getOrElse(BigInt(0))
      val perRound = stats.sizeInBytes.max(rowModel)
      if (sys.env.get("GRAFT_ITERATE_DEBUG").exists(_.trim == "1"))
        System.err.println(
          s"[iterate] auto-posture debug: sizeInBytes=${stats.sizeInBytes} " +
            s"rowCount=${stats.rowCount} rowModel=$rowModel " +
            s"perRound=$perRound pool=$pool " +
            s"threshold=${(pool * PoolSafetyFraction).toLong}")
      if (pool > 0 &&
          perRound * RetainedRounds >
            BigInt((pool * PoolSafetyFraction).toLong)) {
        System.err.println(
          s"[iterate] auto-posture: est per-round state $perRound B x " +
            s"$RetainedRounds rounds exceeds ${(PoolSafetyFraction * 100).toInt}% " +
            s"of the $pool B storage pool -> MEMORY_AND_DISK_SER local " +
            "rounds (consider reliableEvery=2 on a cluster: measured " +
            "2.4-2.7x faster than local truncation at this state size)")
        Some(StorageLevel.MEMORY_AND_DISK_SER)
      } else None
    }

  /** RDD ids persisted right now — the baseline snapshot that scopes
    * the measured escalation to THIS loop's rounds. Deprecation:
    * getRDDStorageInfo is the only public per-block-size view; the
    * bench uses it for the same reason. */
  @scala.annotation.nowarn("cat=deprecation")
  private def persistedIdsNow(sc: org.apache.spark.SparkContext): Set[Int] =
    sc.getRDDStorageInfo.map(_.id).toSet

  /** Measured mid-loop escalation: MEMORY bytes of the RDDs persisted
    * SINCE the loop started (the init + round checkpoints), vs the
    * pool. Scoped two ways (ADVICE r15): pre-loop caches are excluded
    * via the baseline id snapshot — an unrelated cached table must not
    * flip this loop's posture — and diskSize is excluded because only
    * memory-resident bytes contend for the storage pool the threshold
    * is defined against (already-spilled bytes are the SYMPTOM the
    * switch prevents, not pressure to count twice). */
  @scala.annotation.nowarn("cat=deprecation")
  private def retainedBytesNow(sc: org.apache.spark.SparkContext,
      baseline: Set[Int]): Long =
    sc.getRDDStorageInfo.filterNot(i => baseline.contains(i.id))
      .map(_.memSize).sum

  /** One round's lineage truncation: reliable `checkpoint()` on rounds
    * divisible by `reliableEvery` (when enabled), `localCheckpoint`
    * otherwise. Reliable rounds are always EAGER — a lazy reliable
    * checkpoint only writes on first action, so a failure before that
    * action would still lose everything the snapshot was meant to
    * protect.
    *
    * `storageLevel` overrides the local rounds' block format (default:
    * Spark's MEMORY_AND_DISK_DESER). The 100x family sweep (PLANS r14)
    * measured big-state loops BIMODAL under deserialized local blocks
    * — a ~4.9 GB retained working set colliding with the storage pool
    * cost k-core 1.5-2.7x in the bad mode — and row-frame block sizes
    * shrink several-fold serialized, so `MEMORY_AND_DISK_SER` trades
    * per-round serde CPU for staying out of eviction/GC collapse. */
  private def trunc(df: DataFrame, round: Int, eager: Boolean,
      reliableEvery: Int, storageLevel: Option[StorageLevel]): DataFrame =
    if (reliableEvery > 0 && round > 0 && round % reliableEvery == 0) {
      require(
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "Iterate(reliableEvery > 0) needs a checkpoint dir: call " +
          "spark.sparkContext.setCheckpointDir(<durable path>) first")
      df.checkpoint(eager = true)
    } else storageLevel match {
      case Some(l) => df.localCheckpoint(eager, l)
      case None => df.localCheckpoint(eager)
    }

  private def truncInit(df: DataFrame, eager: Boolean,
      storageLevel: Option[StorageLevel]): DataFrame =
    storageLevel match {
      case Some(l) => df.localCheckpoint(eager, l)
      case None => df.localCheckpoint(eager)
    }

  /** Run `step` for exactly `rounds` rounds over `df`, truncating
    * lineage before the loop and after every round. The returned
    * DataFrame's plan references only the final round's `LogicalRDD`
    * (plus whatever the caller composes on top). */
  def iterate(df: DataFrame, rounds: Int, eager: Boolean = false,
      reliableEvery: Int = 0,
      storageLevel: Option[StorageLevel] = None)(
      step: DataFrame => DataFrame): DataFrame =
    iterateIndexed(df, rounds, eager, reliableEvery, storageLevel)(
      (cur, _) => step(cur))

  /** [[iterate]] with the 1-based round index passed to `step` (BFS
    * needs it for the hop distance). */
  def iterateIndexed(df: DataFrame, rounds: Int, eager: Boolean = false,
      reliableEvery: Int = 0,
      storageLevel: Option[StorageLevel] = None)(
      step: (DataFrame, Int) => DataFrame): DataFrame = {
    val level = storageLevel.orElse(autoStorageLevel(df))
    var cur = truncInit(df, eager, level)
    for (i <- 1 to rounds)
      cur = trunc(step(cur, i), i, eager, reliableEvery, level)
    cur
  }

  /** Convergence-driven variant: run `step` until `fingerprint` of the
    * state stops changing or `maxRounds` is hit. One fingerprint action
    * per round (the convergence check IS a materialization, so rounds
    * are eager by construction). Returns (state, roundsRun, converged).
    * `trace` observes (round, fingerprint, converged) for debug hooks.
    */
  def iterateUntil(df: DataFrame, maxRounds: Int,
      trace: (Int, Long, Boolean) => Unit = (_, _, _) => (),
      reliableEvery: Int = 0,
      storageLevel: Option[StorageLevel] = None)(
      step: DataFrame => DataFrame)(
      fingerprint: DataFrame => Long): (DataFrame, Int, Boolean) = {
    var level = storageLevel.orElse(autoStorageLevel(df))
    val sc = df.sparkSession.sparkContext
    val pool = storagePoolBytes(sc)
    // Snapshot BEFORE the init truncation: the init's blocks are part of
    // this loop's retained state; anything persisted earlier is not.
    val baseline = persistedIdsNow(sc)
    var cur = truncInit(df, eager = false, level)
    var prev = fingerprint(cur)
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = trunc(step(cur), round + 1, eager = false, reliableEvery,
        level)
      val fp = fingerprint(next)
      converged = fp == prev
      prev = fp
      cur = next
      round += 1
      trace(round, fp, converged)
      // Convergence loops materialize every round (the fingerprint IS
      // an action), so the MEASURED retained footprint is available —
      // the precision check the lazy variant cannot have. Catches
      // growth-shaped state (BFS-like frontiers) the init-plan
      // estimate under-reads; switches remaining rounds only (already-
      // persisted deser rounds age out through the cleaner as usual).
      if (level.isEmpty && autoEnabled && pool > 0) {
        val retained = retainedBytesNow(sc, baseline)
        if (retained > (pool * PoolSafetyFraction).toLong) {
          System.err.println(
            s"[iterate] auto-posture (measured, round $round): this " +
              s"loop's retained $retained B exceeds " +
              s"${(PoolSafetyFraction * 100).toInt}% of the $pool B pool " +
              "-> MEMORY_AND_DISK_SER for remaining rounds")
          level = Some(StorageLevel.MEMORY_AND_DISK_SER)
        }
      }
    }
    (cur, round, converged)
  }
}
