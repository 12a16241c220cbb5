package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Static plan-size telemetry: (logical nodes, leaves, REAL exchanges,
    * reused exchanges) for the initial physical plan. A healthy entry
    * has tens of nodes and single-digit leaves; an unmaterialized
    * iterative loop carries O(refs^rounds) copies of its base plan
    * (q_kcore_peel's defect class burned 78.5 s = 20% of the r11 driver
    * bench) and is visible here for SECONDS of analysis cost instead of
    * a driver-bench blowup — bench_summary.json carries these per entry
    * so a plan regression is diagnosable from the artifact alone.
    * Real vs reused are counted SEPARATELY (VERDICT r12 ask #3): a
    * ReusedExchange line is a pointer at an already-shuffled result,
    * not another shuffle — folding them together read q_triangle_count
    * as "43 exchanges" when most were reuse pointers. Planning-only:
    * never executes the query (AQE may later reduce actual exchanges;
    * the static count is an upper bound and a stable regression
    * signal). */
  def planMetrics(df: org.apache.spark.sql.DataFrame): (Int, Int, Int, Int) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val opt = df.queryExecution.optimizedPlan
    val nodes = opt.collect { case p => p }.size
    val leaves = opt.collectLeaves().size
    // Exchanges counted by WALKING the physical plan tree, not by
    // parsing its toString (r13 did; ADVICE r13 #4 — the hand-rolled
    // indentation parser was coupled to Spark's plan-string format and
    // still over-read iterative consumers). Three structural rules:
    //  * identity-dedup (the `seen` set): a plan is a DAG printed as a
    //    tree — the SAME exchange object referenced from N subtrees is
    //    one shuffle, which is what collapsed q_modularity's r13 "256
    //    static exchanges" illusion vs its 19 executed stages
    //    (VERDICT r13 ask #5);
    //  * ReusedExchangeExec counts as reuse and is not descended (its
    //    child IS the original exchange, counted at its own site);
    //  * InMemoryTableScanExec is a boundary — the cached build plan
    //    executes at most once at cache build, not per consumer, and
    //    its cost is attributed by the runtime `stages` counter and
    //    (r14) the `_build_<resource>` roster lines.
    // AQE wrappers (AdaptiveSparkPlanExec is a leaf node; query stages
    // hold their plan as a field) and expression subqueries are walked
    // explicitly, both invisible to a naive children-traversal.
    // BroadcastExchange is deliberately NOT counted (every prior
    // round's artifact tracked SHUFFLE exchanges only).
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean])
    var real = 0
    var reused = 0
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        // Count a reuse only when the original WOULD have been counted:
        // `real` tracks ShuffleExchangeLike only, so a reused broadcast
        // must not inflate `reused` (ADVICE r14 #2 — the two columns now
        // share one scope).
        case r: ReusedExchangeExec =>
          if (r.child.isInstanceOf[ShuffleExchangeLike]) reused += 1
        case _: InMemoryTableScanExec => ()
        case e: ShuffleExchangeLike =>
          real += 1
          e.children.foreach(walk)
        case _ => p.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (nodes, leaves, real, reused)
  }

  /** Per-entry runtime telemetry snapshot (VERDICT r12 ask #1: make
    * the artifact contention-evident). `t_start` is the wall-clock
    * epoch second the entry began — a contiguous block of inflated
    * entries with a matching wall-clock window is weather, attributable
    * from the artifact alone. `load1` is the OS 1-minute load average
    * at entry start: external contention on a shared box shows as load
    * far above the executor thread count on unchanged code. Shuffle /
    * spill MBs are task-metric deltas; `storage_mb` is the persisted
    * block-manager footprint AFTER the entry (and after any shared-
    * resource release), which the lifecycle work (ask #2) requires to
    * return toward zero between resource groups rather than ratchet. */
  final case class Telemetry(tStart: Double, load1: Double,
    shReadMb: Double, shWriteMb: Double, spillMb: Double,
    stages: Long, storageMb: Double)

  def main(args: Array[String]): Unit = {
    // Ambient load FIRST (ADVICE r20 #5): sampled before the JVM spins
    // up Spark/sbt work so startup cannot false-flag a quiet box.
    // getSystemLoadAverage returns -1 where unsupported — recorded as
    // -1 with load_warning null so consumers can tell "unavailable"
    // from "quiet".
    val loadAtSessionStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Parquet is splittable, but the single-file-per-table local
      // layout under the 128 MB default packs a whole derived 10x
      // table into ONE scan task (a 109 MB lineitem = one core doing
      // all the decode). 4 MB splits restore scan parallelism locally;
      // a real deployment reads thousands of files and never hits this.
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      // UTC like Verify: entries that materialize date-derived layouts
      // (q_partition_prune) must not bake a local zone into to_date()
      // partitions that a later UTC Verify run would then reuse.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Cumulative task-metric counters (listener events arrive async on
    // the bus; per-entry deltas are read after a settle poll below).
    val mShRead = new java.util.concurrent.atomic.AtomicLong
    val mShWrite = new java.util.concurrent.atomic.AtomicLong
    val mSpill = new java.util.concurrent.atomic.AtomicLong
    // Stages actually SCHEDULED: the static plan telemetry counts an
    // exchange once per subtree reference, but at runtime exchange
    // reuse and InMemory caching collapse those — the stage delta is
    // the executed truth (a stage boundary is a shuffle or a result),
    // so `stages` small + `exchanges` large reads as reuse working,
    // while both large reads as real shuffle volume.
    val mStages = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            mShRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            mShWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            mSpill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = { mStages.incrementAndGet(); () }
      })
    // Listener-bus drain is not observable through the public API, so
    // deltas settle by polling: unchanged counters across a 30 ms gap
    // (bounded at 300 ms) means the entry's task-end events are in.
    // The residual skew a slow bus could leak is a few task records —
    // magnitude-level telemetry, not an accounting ledger.
    def settle(): Unit = {
      var prev = (mShRead.get, mShWrite.get, mSpill.get)
      var i = 0
      var stable = false
      while (i < 10 && !stable) {
        Thread.sleep(30)
        val cur = (mShRead.get, mShWrite.get, mSpill.get)
        stable = cur == prev
        prev = cur
        i += 1
      }
    }
    @scala.annotation.nowarn("cat=deprecation")
    def storageBytes(): Long =
      spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
    def load1(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // Warm up the session (codegen, parquet footer reads, shuffle infra)
    // so the alphabetically-first query over each table isn't charged
    // for JVM/IO startup. Best-effort: a missing table must surface as
    // that table's per-query failures below, not abort the whole bench.
    def warm(f: => Unit): Unit =
      try f catch { case e: Throwable =>
        System.err.println(s"[bench] warmup skipped: ${e.getMessage}") }
    warm(graft.core.Tables.read(spark, sfDir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_orderkey") > 0)
      .groupBy("l_returnflag").count().collect())
    warm(graft.core.Tables.read(spark, sfDir, "documents")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")))).collect())
    warm(graft.core.Tables.read(spark, sfDir, "embeddings")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("embedding")))).collect())
    // Shingle-explode codegen warmup on a 32-doc slice, so the
    // alphabetically-first documents entry (q_decontaminate) is not
    // charged the one-time pipeline compilation (~2-5 s of measured
    // run-to-run variance at sf0.1).
    warm(graft.core.Tables.read(spark, sfDir, "documents").limit(32)
      .select(org.apache.spark.sql.functions.explode(
        graft.ops.Dedup.shingles(
          org.apache.spark.sql.functions.col("text"), 3)).as("s"))
      .groupBy("s").count().count())
    // A failing query must be reported as failed, not counted as ~0 s.
    var failed = List.empty[String]
    // Dev-only subset filter (comma-separated names); unset for the
    // driver's full run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    only.foreach { o =>
      val unknown = o -- selected.map(_._1).toSet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] SPARK_GRAFT_ONLY names match no query: " +
          unknown.mkString(", "))
      if (selected.isEmpty)
        System.err.println("[bench] SPARK_GRAFT_ONLY selected ZERO queries")
    }
    // Last-consumer release schedule (VERDICT r12 ask #2): the run
    // order is alphabetical, so each shared resource is released right
    // after its last SELECTED consumer finishes — executor storage
    // returns to baseline between resource groups instead of
    // ratcheting across 251 entries.
    val releaseAfter: Map[String, Seq[String]] =
      Queries.sharedConsumers.toSeq.flatMap { case (res, consumers) =>
        selected.map(_._1).filter(consumers).lastOption.map(_ -> res)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    // min-of-N mode (SPARK_GRAFT_BENCH_REPEATS=N). Default 2 since r17
    // (VERDICT r15 #7 / r16 #6: the full-roster repeat, carried two
    // rounds): a single-run bench makes round-over-round grading
    // hostage to machine weather — r6's driver artifact was ~2-3×
    // uniformly inflated by contention while two independent
    // same-config runs agreed. min-of-N reports the least-contended
    // run per entry, uniformly. Caveat (deliberate, documented in the
    // artifact via "repeats"): entries that train session-cached
    // models are charged the training on the FIRST repeat only, so
    // their min reflects the cached path; set
    // SPARK_GRAFT_BENCH_REPEATS=1 for the attribution-faithful
    // single-shot mode.
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .map(_.trim.toInt).getOrElse(2).max(1)
    var plans = Map.empty[String, (Int, Int, Int, Int)]
    var telemetry = Map.empty[String, Telemetry]
    // Shared-build attribution (VERDICT r13 ask #8): when an entry is
    // the FIRST consumer of a shared resource, the build is run — and
    // timed — as its own `_build_<resource>` roster line before the
    // entry's clock starts, so per-entry times are attribution-clean
    // (r13 charged q_cc_star the ~20 s pair-chain build its siblings
    // then read warm). Build lines carry their own telemetry row; a
    // build failure falls through to the consumer, which rebuilds
    // inline and reports the failure as its own.
    var buildTimes = Seq.empty[(String, Double)]
    // Transitive closure over the declared build prerequisites, so a
    // triggered resource's upstream rebuilds get their OWN `_build_`
    // lines instead of being absorbed into the downstream line
    // (ADVICE r14 #5: under a subset run, ensureShared("dedup_cc")
    // after doc_shingles' release point silently re-paid the shingle
    // build inside `_build_dedup_cc`). In the full alphabetical roster
    // the transitive consumer sets make this a no-op; it matters for
    // SPARK_GRAFT_ONLY subsets and any future non-transitive resource.
    def prereqClosure(r: String): Set[String] = {
      val direct = Queries.sharedPrereqs.getOrElse(r, Nil).toSet
      direct ++ direct.flatMap(prereqClosure)
    }
    def ensureBuildsFor(name: String): Unit = {
      val triggered = Queries.sharedBuildOrder
        .filter(r => Queries.sharedConsumers(r)(name) &&
          !Queries.isSharedBuilt(r, spark, sfDir)).toSet
      Queries.sharedBuildOrder
        .filter(r => (triggered(r) ||
            triggered.exists(t => prereqClosure(t)(r))) &&
          !Queries.isSharedBuilt(r, spark, sfDir))
        .foreach { r =>
          val bStart = System.currentTimeMillis() / 1000.0
          val bLoad = load1()
          val bSh = (mShRead.get, mShWrite.get, mSpill.get)
          val bSt = mStages.get
          val t0 = System.nanoTime()
          try {
            Queries.ensureShared(r, spark, sfDir)
            val t = (System.nanoTime() - t0) / 1e9
            settle()
            buildTimes :+= (s"_build_$r" -> t)
            telemetry += s"_build_$r" -> Telemetry(bStart, bLoad,
              (mShRead.get - bSh._1) / 1048576.0,
              (mShWrite.get - bSh._2) / 1048576.0,
              (mSpill.get - bSh._3) / 1048576.0,
              mStages.get - bSt,
              storageBytes() / 1048576.0)
          } catch {
            // NonFatal only (ADVICE r14 #4): an OutOfMemoryError here
            // means a possibly-corrupted JVM — let it propagate and
            // fail the bench loudly rather than re-surface later as a
            // confusing consumer-side rebuild failure.
            case scala.util.control.NonFatal(e) => System.err.println(
              s"[bench] _build_$r failed (consumer $name rebuilds " +
                s"inline): ${e.getMessage}")
          }
        }
    }
    // Per-entry repeat-time vectors (VERDICT r18 #7): min-of-N stays
    // the contract "value"/"queries" series, but single totals proved
    // noise-hostage on this box (six identical r18 runs spanned
    // 194.6–312.5 s under ambient load) — the artifact now ALSO
    // carries the per-entry MEDIAN of repeats ("queries_median" /
    // "total_median"), the noise-robust series certifications and
    // round-over-round comparisons should quote. Caveat shared with
    // min-of-N: session-cached model training is charged to the first
    // repeat only, so its median still includes one training share.
    var repeatTimes = Map.empty[String, List[Double]]
    // First-build ledger drain (VERDICT r20 ask #2): entry bodies may
    // run first-time setup builds (keyed LocalExact oracles, deriveOnce
    // gate tables) INSIDE their timed repeat; min-of-N then discards
    // repeat 1 and with it the build cost — r20's totals silently
    // excluded those builds. Now each drained build is subtracted from
    // the repeat it ran in and charged to its own `_build_*` roster
    // line (no telemetry row — the build's stages/shuffle stay merged
    // into the consumer entry's telemetry, a documented limitation),
    // so every build appears exactly once in the charged total.
    def drainSetupBuilds(): Seq[(String, Double)] = {
      var out = List.empty[(String, Double)]
      var e = Queries.setupBuildLog.poll()
      while (e != null) { out ::= e; e = Queries.setupBuildLog.poll() }
      out.reverse
    }
    drainSetupBuilds() // discard anything from warmup
    val results = selected.map { case (name, fn) =>
      var best = Double.MaxValue
      var rep = 0
      ensureBuildsFor(name)
      val entryStart = System.currentTimeMillis() / 1000.0
      val loadAtStart = load1()
      val sh0 = (mShRead.get, mShWrite.get, mSpill.get)
      val st0 = mStages.get
      while (rep < repeats && !failed.contains(name)) {
        val t0 = System.nanoTime()
        var builtSecs = 0.0
        // noop sink, not count(): count() lets Catalyst prune computed
        // columns on map-only entries, under-charging their real work.
        try {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val built = drainSetupBuilds()
          builtSecs = built.map(_._2).sum
          buildTimes ++= built
          // Plan telemetry AFTER the timed write (planning results are
          // cached on df.queryExecution, so this re-walks, not re-runs)
          // and only on the first repeat; failures must not fail the
          // entry — the timing above is the contract, this is metadata.
          if (rep == 0) {
            best = math.min(best,
              math.max(0.0, (System.nanoTime() - t0) / 1e9 - builtSecs))
            try plans += name -> planMetrics(df)
            catch { case e: Throwable => System.err.println(
              s"[bench] $name plan telemetry failed: ${e.getMessage}") }
          }
        } catch {
          case e: Throwable =>
            // Full cause chain, not getMessage: Spark wraps execution
            // failures ("Boxed Exception" ExecutionExceptions from
            // broadcast/codegen futures) and the root cause is what a
            // reader of the driver's log needs to act on.
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            e.printStackTrace(System.err)
            failed ::= name
            drainSetupBuilds() // partial builds stay uncharged
        }
        val elapsed =
          math.max(0.0, (System.nanoTime() - t0) / 1e9 - builtSecs)
        best = math.min(best, elapsed)
        if (!failed.contains(name))
          repeatTimes += name -> (repeatTimes.getOrElse(name, Nil) :+ elapsed)
        rep += 1
      }
      // Release every shared resource whose last selected consumer is
      // this entry — AFTER all repeats, so a repeat never rebuilds.
      releaseAfter.getOrElse(name, Nil)
        .foreach(Queries.releaseShared(_, spark, sfDir))
      settle()
      telemetry += name -> Telemetry(entryStart, loadAtStart,
        (mShRead.get - sh0._1) / 1048576.0,
        (mShWrite.get - sh0._2) / 1048576.0,
        (mSpill.get - sh0._3) / 1048576.0,
        mStages.get - st0,
        storageBytes() / 1048576.0)
      name -> best
    }
    val ok = results.filterNot { case (k, _) => failed.contains(k) }

    // Outlier re-run pass (VERDICT r12 ask #1): three of the last four
    // rounds the driver's single-shot artifact carried a transient
    // contention window (r12: a contiguous alphabetical block inflated
    // 4-34x on unchanged code, ~140 s of excess = a 25% error bar on
    // the grading instrument). Any entry whose first-shot time exceeds
    // max(3 s, 5x the roster median) is re-run ONCE at the end, warm,
    // and BOTH numbers are recorded — first-shot stays the contract
    // total (attribution-faithful), the re-run lets the artifact
    // defend itself. READ THE RE-RUN AS A FLOOR, not a verdict: for
    // pure-compute entries (the r12 window was all pure-compute),
    // re-run << first-shot labels the window as weather; for entries
    // whose first shot ran a streaming replay, trained a session-
    // cached model, or built a since-released shared materialization,
    // the re-run reads a cache (or re-pays a rebuild) and bounds the
    // honest cost from below (or above) without settling it — the
    // per-entry t_start/load1 telemetry carries the weather signal
    // for those. Capped at 30 entries by descending time; disable
    // with SPARK_GRAFT_RERUN=0.
    val rerunEnabled = sys.env.get("SPARK_GRAFT_RERUN").forall(_ != "0")
    var reruns = Map.empty[String, Double]
    var rerunStages = Map.empty[String, Long]
    if (rerunEnabled && ok.nonEmpty) {
      val times = ok.map(_._2).sorted
      val median = times(times.size / 2)
      val threshold = math.max(3.0, 5.0 * median)
      val outliers = ok.filter(_._2 > threshold)
        .sortBy(-_._2).take(30).map(_._1).toSet
      val byName = selected.toMap
      ok.filter { case (n, _) => outliers(n) }.foreach { case (name, first) =>
        // Rebuild any since-released shared inputs OUTSIDE the rerun
        // timer (and without a second `_build_` roster line): the
        // rerun number's only job is the warm cost of the ENTRY, and
        // r13's q_jaccard_prefix rerun (9.2 s > its 7.6 s first shot)
        // showed an inline shingle rebuild muddying exactly the
        // signal the pass exists to produce.
        try Queries.sharedBuildOrder
          .filter(r => Queries.sharedConsumers(r)(name) &&
            !Queries.isSharedBuilt(r, spark, sfDir))
          .foreach(Queries.ensureShared(_, spark, sfDir))
        catch { case scala.util.control.NonFatal(e) => System.err.println(
          s"[bench] rerun prebuild for $name failed (rerun rebuilds " +
            s"inline): ${e.getMessage}") }
        // Stage count around the rerun: a rerun whose stage count is
        // comparable to the entry's first-shot `stages` telemetry
        // re-did the full pipeline (an ENTRY-LOCAL intermediate — e.g.
        // a one-shot localCheckpoint the prebuild pass cannot own —
        // was re-paid inside the rerun timer; 4 of 12 r14 reruns read
        // SLOWER than first-shot for exactly this reason), while
        // stages << first-shot means a warm read. Recorded per rerun
        // so the artifact carries the cause, not just the anomaly
        // (VERDICT r14 "what's wrong" #2).
        val rrSt0 = mStages.get
        drainSetupBuilds() // prebuild-pass setups stay uncharged, as before
        val t0 = System.nanoTime()
        try {
          byName(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          // A rerun normally reads warm setup caches; if one somehow
          // rebuilds (subset-run cache clears), keep the rerun number
          // an entry-only cost and drop the build (its first run was
          // already charged).
          val t = math.max(0.0, (System.nanoTime() - t0) / 1e9 -
            drainSetupBuilds().map(_._2).sum)
          settle()
          reruns += name -> t
          rerunStages += name -> (mStages.get - rrSt0)
          System.err.println(
            f"[bench] rerun $name: first=$first%.2f s rerun=$t%.2f s " +
              s"stages=${mStages.get - rrSt0}")
        } catch { case scala.util.control.NonFatal(e) => System.err.println(
          s"[bench] $name rerun failed (first-shot stands): ${e.getMessage}") }
        releaseAfter.getOrElse(name, Nil)
          .foreach(Queries.releaseShared(_, spark, sfDir))
      }
    }
    Queries.releaseAllShared(spark, sfDir)
    // End-of-roster storage proof: Iterate/Replay localCheckpoint
    // blocks free when their Datasets become unreachable, which needs
    // a GC cycle before the ContextCleaner (an async thread) acts —
    // storage_end_mb near zero is the lifecycle contract (r12 ask #2)
    // made checkable from the artifact alone. r13 read 12.21 MB off a
    // SINGLE gc+500ms race with that thread, through no real
    // regression (VERDICT r13 ask #1) — so the proof now retries
    // (bounded ~6 s) and, if anything still survives, NAMES it in the
    // artifact: an intermittent cleaner race converges to zero within
    // a retry or two, while a genuinely leaked owner shows up as a
    // stable named residual instead of an anonymous number.
    var storageEndMb = storageBytes() / 1048576.0
    var gcTries = 0
    while (storageEndMb > 0.5 && gcTries < 12) {
      System.gc()
      Thread.sleep(500)
      settle()
      storageEndMb = storageBytes() / 1048576.0
      gcTries += 1
    }
    @scala.annotation.nowarn("cat=deprecation")
    def storageSurvivors(): Seq[String] =
      spark.sparkContext.getRDDStorageInfo.toSeq
        .sortBy(i => -(i.memSize + i.diskSize)).take(8)
        .map { i =>
          val nm = Option(i.name).getOrElse("?")
            .replaceAll("[^A-Za-z0-9 _.,:#\\[\\]()=\\-]", "_").take(120)
          s"""{"id":${i.id},"name":"$nm","mb":${
            "%.2f".formatLocal(java.util.Locale.ROOT,
              (i.memSize + i.diskSize) / 1048576.0)}}"""
        }
    val storageDetailJson =
      (if (storageEndMb > 0.5) storageSurvivors() else Nil)
        .mkString("[", ",", "]")

    // `_build_<resource>` lines join the per-query map and the total:
    // the roster's wall-clock is unchanged, only its attribution moves
    // off the first consumers. Ledger-drained inline builds could in
    // principle recur under one label (a rebuild after a cache clear);
    // summed per label so the JSON map stays single-keyed.
    val buildAgg = buildTimes.groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sum }.toSeq.sortBy(_._1)
    val qs = (ok ++ buildAgg).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum + buildAgg.map(_._2).sum
    // Median-of-repeats series (VERDICT r18 #7): even-length medians
    // average the middle pair (= the mean for repeats=2). Build lines
    // run once; their single time joins the median total so the two
    // totals stay directly comparable.
    def medianOf(ts: List[Double]): Double = {
      val s2 = ts.sorted
      if (s2.size % 2 == 1) s2(s2.size / 2)
      else (s2(s2.size / 2 - 1) + s2(s2.size / 2)) / 2.0
    }
    val medians = ok.flatMap { case (k, _) =>
      repeatTimes.get(k).map(k -> medianOf(_)) }
    val qsMedian = (medians ++ buildAgg)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val totalMedian = medians.map(_._2).sum + buildAgg.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val plansJson = plans.toSeq.sortBy(_._1).map { case (k, (n, l, x, ru)) =>
      s"\"$k\":{\"nodes\":$n,\"leaves\":$l,\"exchanges\":$x,\"reused\":$ru}"
    }.mkString("{", ",", "}")
    def f2(d: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    val telJson = telemetry.toSeq.sortBy(_._1).map { case (k, t) =>
      s"\"$k\":{\"t_start\":${f2(t.tStart)},\"load1\":${f2(t.load1)}," +
        s"\"sh_read_mb\":${f2(t.shReadMb)},\"sh_write_mb\":${f2(t.shWriteMb)}," +
        s"\"spill_mb\":${f2(t.spillMb)},\"stages\":${t.stages}," +
        s"\"storage_mb\":${f2(t.storageMb)}}"
    }.mkString("{", ",", "}")
    val rerunJson = reruns.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":${f2(v)}" }.mkString("{", ",", "}")
    // Companion map to "rerun": stages the rerun actually scheduled.
    // Read against telemetry[name].stages — comparable means the rerun
    // re-paid an entry-local build (its number bounds from ABOVE),
    // far smaller means a warm read (bounds from below).
    val rerunStagesJson = rerunStages.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // Load-awareness (r20, VERDICT r19 ask #1): the r19 artifact of
    // record was captured under ambient load1 8–13 and read as a
    // phantom 38% regression. The artifact now self-reports: load1 at
    // session start plus a "load_warning" flag when the AMBIENT load
    // (start load1, before this bench's own executors spin up) exceeds
    // 2.0 — a consumer comparing totals across rounds must prefer
    // runs without the flag (per-entry load1 telemetry carries the
    // within-run series as before).
    // load_warning: true/false from the ambient sample, JSON null when
    // the platform reports no load average (-1) — "unavailable" must
    // not read as "quiet" (ADVICE r20 #5).
    val loadWarning =
      if (loadAtSessionStart < 0) "null"
      else (loadAtSessionStart > 2.0).toString
    if (loadWarning == "true") System.err.println(
      f"[bench] WARNING: ambient load1 $loadAtSessionStart%.2f > 2.0 at " +
        "session start — totals in this artifact are contention-suspect")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","repeats":$repeats,"total_median":$totalMedian,"load1_start":${f2(loadAtSessionStart)},"load_warning":$loadWarning,"queries":$qs,"queries_median":$qsMedian,"plans":$plansJson,"telemetry":$telJson,"rerun":$rerunJson,"rerun_stages":$rerunStagesJson,"storage_end_mb":${f2(storageEndMb)},"storage_end_detail":$storageDetailJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(full)
    // The full line above is the contract, but at 251 entries it runs
    // several KB — longer than a log tail-capture window, so a parser
    // reading the END of the process output sees a truncated (headless)
    // line. Two machine-first artifacts fix that: the full JSON is
    // written to bench_summary.json in the process cwd, and a SHORT
    // self-contained summary (no per-query map) is printed as the LAST
    // stdout line, small enough to survive any tail window.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_summary.json"), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_summary.json write failed: ${e.getMessage}") }
    // Per-entry seconds in tail-capturable CHUNKS (VERDICT r20 ask #1:
    // PERF's per_query table has been empty for two rounds because the
    // per-entry map rides only the multi-KB full line above, which a
    // tail-window capture truncates). Each line is a self-contained
    // small JSON object: {"metric":"queries_part","i":<1-based chunk>,
    // "n":<chunk count>,"queries":{<=40 entries, 3-decimal seconds>}}.
    // Printed immediately before total_short so the LAST lines of
    // stdout carry the whole per-entry series; additions only — the
    // full line and bench_summary.json are unchanged.
    def f3(d: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val partEntries = (ok ++ buildAgg).sortBy(_._1)
    val parts = partEntries.grouped(40).toSeq
    parts.zipWithIndex.foreach { case (chunk, i) =>
      val body = chunk.map { case (k, v) => s"\"$k\":${f3(v)}" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"queries_part","i":${i + 1},"n":${parts.size},"queries":$body}""")
    }
    // Distinct metric name: a consumer selecting lines by
    // "metric":"total" must match ONLY the full contract line above,
    // not this short tail-window-safe duplicate.
    println(s"""{"metric":"total_short","value":$total,"unit":"sec","repeats":$repeats,"n_queries":${ok.size},"n_rerun":${reruns.size},"load1_start":${f2(loadAtSessionStart)},"load_warning":$loadWarning,"failed":$failedJson,"sf":"$sfDir","detail":"bench_summary.json"}""")
    if (failed.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
