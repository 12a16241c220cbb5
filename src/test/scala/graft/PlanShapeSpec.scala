package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the round-10 analytics entries: column
  * pruning must reach the parquet scan (a scan that decodes unused
  * columns is wrong at any scale), and the sliding-window plan must be
  * a single Expand + partial aggregate, not a self-union of scans.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  private def scanSchemas(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan.toString
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
      .map(_.group(1)).toSeq
  }

  test("gap fill prunes the events scan to (user_id, ts)") {
    val df = SparkEntry.queries("q_gap_fill")(spark, dir)
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty)
    schemas.foreach { s =>
      assert(!s.contains("props") && !s.contains("value") &&
        !s.contains("event_type"),
        s"events scan decodes unused columns: $s")
    }
  }

  test("cohort retention prunes the events scan to (user_id, ts)") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_cohort_retention")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("props") && !s.contains("value"),
      s"unpruned scan: $s"))
  }

  test("sliding window plans one Expand over one scan, no self-union") {
    val df = SparkEntry.queries("q_sliding_window")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand generator:\n$plan")
    assert(!plan.contains("Union"), "sliding window must not self-union")
    assert(scanSchemas(df).size == 1, "exactly one scan expected")
  }

  test("target encode prunes orders to (o_orderpriority, o_totalprice)") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_target_encode")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("o_comment") &&
      !s.contains("o_clerk"), s"unpruned scan: $s"))
  }

  test("fuzzy join is one lazy plan (no driver census) with pruned scans") {
    // The r10 form ran three .count() actions; the single-pass rewrite
    // must return ONE inspectable plan whose customer scans decode only
    // the key and name.
    val df = SparkEntry.queries("q_fuzzy_join")(spark, dir)
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty, "plan should expose its scans (not a " +
      "driver-side LocalRelation)")
    schemas.foreach(s => assert(!s.contains("c_acctbal") &&
      !s.contains("c_nationkey"), s"unpruned customer scan: $s"))
  }

  test("batch funnel is one lazy plan; events scans prune props/value") {
    val df = SparkEntry.queries("q_funnel_batch")(spark, dir)
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("props") && !s.contains("value"),
      s"unpruned events scan: $s"))
  }

  test("attribution runs one window over one pruned events scan") {
    val df = SparkEntry.queries("q_attribution")(spark, dir)
    val schemas = scanSchemas(df)
    assert(schemas.size == 1, s"exactly one events scan expected: $schemas")
    assert(!schemas.head.contains("props"),
      s"unpruned events scan: ${schemas.head}")
    val plan = df.queryExecution.executedPlan.toString
    assert("Window".r.findAllMatchIn(plan).size >= 1)
  }

  test("dsir stats prunes documents to (doc_id, text, lang)") {
    val schemas = scanSchemas(SparkEntry.queries("q_dsir_stats")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("n_chars") &&
      !s.contains("source"), s"unpruned documents scan: $s"))
  }

  test("PIT feature chain: the label stream flows SHUFFLE-FREE through " +
      "both broadcast as-of joins") {
    // The as-of strategy reads right-side stats, and both deduped
    // feature tables are dimension-sized here, so BOTH joins must
    // plant the broadcast exec — the purchases stream then reaches the
    // final projection with ZERO exchanges (the two hash exchanges in
    // the plan are the feature tables' own dedup aggregations; the
    // only label-stream exchange is the closing orderBy's range
    // partition). At 100 TB this is the difference between one pass
    // over the label log and one pass PER FEATURE TABLE.
    val df = SparkEntry.queries("q_pit_features")(spark, dir)
    df.collect()
    // AQE's string form appends the pre-execution "Initial Plan";
    // assert on the final plan section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastAsofJoin".r.findAllMatchIn(plan).size == 2,
      s"both feature joins should broadcast:\n${plan.take(3000)}")
    val exchanges = "Exchange hashpartitioning".r.findAllMatchIn(plan).size
    assert(exchanges == 2,
      s"label stream re-shuffled: $exchanges hash exchanges (want 2 — " +
        s"the feature dedups only):\n${plan.take(3000)}")
  }

  test("path centrality prunes both fact scans to join keys") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_path_centrality")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("o_totalprice") &&
      !s.contains("l_quantity") && !s.contains("l_extendedprice"),
      s"unpruned scan: $s"))
  }

  test("triangle count pushes the returnflag filter to the scan and " +
      "prunes to (orderkey, partkey, returnflag)") {
    val df = SparkEntry.queries("q_triangle_count")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), " +
      "EqualTo(l_returnflag,R)]"), s"returnflag not pushed:\n$plan")
    scanSchemas(df).foreach(s => assert(!s.contains("l_quantity") &&
      !s.contains("l_extendedprice") && !s.contains("l_suppkey"),
      s"unpruned scan: $s"))
  }

  test("k-anonymity prunes customer to the three quasi-identifiers") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_k_anonymity")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("c_name") &&
      !s.contains("c_custkey"), s"unpruned scan: $s"))
  }

  test("skyline reduces BEFORE the window: exactly one lineitem scan, " +
      "pruned to (returnflag, quantity, extendedprice), and the window " +
      "input is the aggregate, not the corpus") {
    val df = SparkEntry.queries("q_skyline")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val schemas = scanSchemas(df)
    assert(schemas.size == 1, s"expected one scan: $schemas")
    assert(!schemas.head.contains("l_orderkey") &&
      !schemas.head.contains("l_shipdate"), s"unpruned: ${schemas.head}")
    // Window must sit ABOVE the aggregate (reduction first): in the
    // bottom-up plan string the aggregate appears after Window's input.
    val wIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(wIdx >= 0 && aggIdx > wIdx,
      s"window does not consume the reduced aggregate:\n$plan")
  }

  test("bm25 computes dl once and scores only posting lists: the " +
      "documents scan prunes to (doc_id, text)") {
    val schemas = scanSchemas(
      SparkEntry.queries("q_bm25_topk")(spark, dir))
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("lang") &&
      !s.contains("source") && !s.contains("n_chars"),
      s"unpruned scan: $s"))
  }

  test("band join blocks to an equi-join on the bucket key: no " +
      "cartesian or nested-loop join anywhere in the plan") {
    val df = SparkEntry.queries("q_band_join")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band join fell back to an O(N^2) physical join:\n$plan")
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("c_name") &&
      !s.contains("c_address") && !s.contains("c_mktsegment"),
      s"unpruned scan: $s"))
  }

  test("table diff is one full-outer equi-join and prunes both order " +
      "scans to the key + compared columns") {
    val df = SparkEntry.queries("q_table_diff")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"no full-outer join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"bad join:\n$plan")
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("o_clerk") &&
      !s.contains("o_comment") && !s.contains("o_orderdate"),
      s"unpruned scan: $s"))
  }

  test("ewma anomaly runs the 8-lag window over ONE pruned events scan") {
    val df = SparkEntry.queries("q_ewma_anomaly")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.sliding("Scan parquet".length).count(
      _ == "Scan parquet") == 1, s"expected exactly one scan:\n$plan")
    val schemas = scanSchemas(df)
    schemas.foreach(s => assert(!s.contains("props"),
      s"unpruned scan: $s"))
  }

  test("itemsets: Apriori semi-joins (L1 filter, L3 closure) appear as " +
      "LeftSemi joins, never as row-multiplying inner joins") {
    val df = SparkEntry.queries("q_itemsets")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi-join prune:\n$plan")
    val schemas = scanSchemas(df)
    assert(schemas.nonEmpty)
    schemas.foreach(s => assert(!s.contains("l_comment") &&
      !s.contains("l_extendedprice") && !s.contains("l_shipdate"),
      s"unpruned scan: $s"))
  }

  private def analyzedLeaves(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed.collectLeaves()

  test("kcore peel's iterated plan is lineage-truncated: the final " +
      "census references exactly the checkpointed round-4 edge list " +
      "(2 LogicalRDD leaves, zero base-scan copies)") {
    val df = SparkEntry.queries("q_kcore_peel")(spark, dir)
    val leaves = analyzedLeaves(df)
    assert(leaves.size == 2, s"expected 2 leaves, got ${leaves.size}:\n" +
      df.queryExecution.analyzed.toString)
    leaves.foreach(l => assert(
      l.getClass.getSimpleName == "LogicalRDD",
      s"leaf is not a truncated checkpoint: ${l.getClass.getName}"))
  }

  test("bfs census plan is lineage-truncated: one visited checkpoint " +
      "leaf plus the node-set scan, never 3^rounds plan copies") {
    val df = SparkEntry.queries("q_bfs_hops")(spark, dir)
    val leaves = analyzedLeaves(df)
    // nodes scan (parquet) + final visited LogicalRDD
    assert(leaves.size <= 3, s"plan not truncated: ${leaves.size} leaves")
    assert(leaves.exists(_.getClass.getSimpleName == "LogicalRDD"),
      "no checkpoint leaf — visited state carries full lineage")
  }

  test("Iterate.iterate keeps plan size constant per round where a " +
      "naive rebind loop explodes multiplicatively (the q_kcore_peel " +
      "78.5s defect class, caught structurally)") {
    import org.apache.spark.sql.functions._
    val base = spark.range(100).select(col("id").as("u"),
      (col("id") + 1).as("v"))
    def step(cur: org.apache.spark.sql.DataFrame) = {
      val keep = cur.select(col("u").as("n"))
        .unionByName(cur.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 1).select("n")
      cur.join(keep.select(col("n").as("ku")), col("u") === col("ku"),
          "left_semi")
        .join(keep.select(col("n").as("kv")), col("v") === col("kv"),
          "left_semi")
    }
    // The deliberately unmaterialized loop: leaves multiply ~5x/round.
    var naive = base
    for (_ <- 1 to 3) naive = step(naive)
    val naiveLeaves = analyzedLeaves(naive).size
    assert(naiveLeaves > 50,
      s"the defect reproducer stopped reproducing ($naiveLeaves leaves)" +
        " — update this spec's model of the blowup")
    // The bench's plan telemetry must SEE the blowup (the
    // bench_summary.json "plans" line exists to catch exactly this
    // before it costs 78 s in a driver bench)...
    val (naiveNodes, naiveLeavesM, _, _) = Bench.planMetrics(naive)
    assert(naiveLeavesM > 50 && naiveNodes > 100,
      s"planMetrics missed the blowup: nodes=$naiveNodes leaves=$naiveLeavesM")
    // The truncated loop: exactly one leaf (the round-3 checkpoint).
    val fixed = graft.ops.Iterate.iterate(base, 3)(step)
    assert(analyzedLeaves(fixed).size == 1,
      "iterate() failed to truncate lineage")
    val (fixedNodes, fixedLeaves, _, _) = Bench.planMetrics(fixed)
    assert(fixedLeaves == 1 && fixedNodes < 20,
      s"telemetry on the truncated loop: nodes=$fixedNodes leaves=$fixedLeaves")
    // And the two compute the same edge set.
    assert(fixed.orderBy("u", "v").collect().toSeq ==
      naive.orderBy("u", "v").collect().toSeq)
  }
}
