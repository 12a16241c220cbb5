package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Estimator-driven join planning: a registered model's cardinality,
  * injected as `Statistics` by EstimatedStatsRule, must flip Catalyst's
  * own broadcast-vs-shuffle decision in BOTH directions — and never
  * change results.
  */
class JoinPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var factsPath: String = _
  private var dimsPath: String = _
  private var asofTradesPath: String = _
  private var asofQuotesPath: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      // assert on the statically planned join — AQE would wrap it in an
      // adaptive placeholder and re-decide from runtime sizes
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = java.nio.file.Files
      .createTempDirectory("graft_statsinj").toString
    factsPath = s"$base/statsinj_facts"
    dimsPath = s"$base/statsinj_dims"
    // incompressible-ish payloads so the parquet files have real size
    spark.range(20000)
      .select(col("id"), (col("id") % 50).as("k"), (col("id") % 1000).as("a"),
        md5(col("id").cast("string")).as("payload"))
      .write.mode("overwrite").parquet(factsPath)
    spark.range(100000)
      .select((col("id") % 50).as("dk"),
        md5((col("id") + 7).cast("string")).as("dim_payload"))
      .write.mode("overwrite").parquet(dimsPath)
    // as-of inputs: trades (left, big) and quotes (right, filterable)
    asofTradesPath = s"$base/asof_trades"
    asofQuotesPath = s"$base/asof_quotes"
    spark.range(20000)
      .select((col("id") % 50).as("k"), col("id").cast("timestamp").as("t"),
        col("id").as("lid"), md5(col("id").cast("string")).as("tpayload"))
      .write.mode("overwrite").parquet(asofTradesPath)
    spark.range(20000)
      .select((col("id") % 50).as("q"),
        (col("id") - 1).cast("timestamp").as("qt"), col("id").as("rid"),
        (col("id") % 1000).as("b"),
        md5((col("id") + 3).cast("string")).as("qpayload"))
      .write.mode("overwrite").parquet(asofQuotesPath)
    EstimatedStatsRule.attachIfMissing(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def joinPlan(): org.apache.spark.sql.DataFrame = {
    val facts = spark.read.parquet(factsPath).filter(col("a") <= 1)
    val dims = spark.read.parquet(dimsPath)
    facts.join(dims, facts("k") === dims("dk"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
  }

  private def joinNodes(p: SparkPlan): (Boolean, Boolean) = {
    var bhj = false; var smj = false
    p.foreach {
      case _: BroadcastHashJoinExec => bhj = true
      case _: SortMergeJoinExec => smj = true
      case _ => ()
    }
    (bhj, smj)
  }

  private def withEstimate[T](rows: Long, path: String = "statsinj_facts",
      cols: Set[String] = Set("a"))(body: => T): T = {
    val saved = GraftRuntime.snapshot()
    GraftRuntime.register(path, cols, _ => rows)
    spark.conf.set(EstimatedStatsRule.EnabledKey, "true")
    try body
    finally {
      spark.conf.set(EstimatedStatsRule.EnabledKey, "false")
      GraftRuntime.restore(saved)
    }
  }

  test("low model estimate flips a shuffle join to broadcast") {
    // file-size stats: the filtered side "is" the whole 20k-row file,
    // above a 10 KB threshold -> sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    val (bhj0, smj0) = joinNodes(joinPlan().queryExecution.executedPlan)
    assert(smj0 && !bhj0, "baseline should shuffle (file-size stats)")
    val baseline = joinPlan().collect().map(_.toSeq).toSet

    // model knows a<=1 keeps ~40 rows -> build side fits -> broadcast
    withEstimate(40L) {
      val df = joinPlan()
      val (bhj1, smj1) = joinNodes(df.queryExecution.executedPlan)
      assert(bhj1 && !smj1, "model estimate should broadcast the filter")
      assert(df.collect().map(_.toSeq).toSet == baseline,
        "stats injection changed query results")
    }
  }

  test("high model estimate flips a broadcast join to shuffle") {
    // raw file ~hundreds of KB, under a al 512 KB threshold -> Catalyst
    // would broadcast the filtered side from file size alone
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (512 * 1024).toString)
    val (bhj0, smj0) = joinNodes(joinPlan().queryExecution.executedPlan)
    assert(bhj0 && !smj0, "baseline should broadcast (small file)")

    // model says the predicate keeps ~19M rows (wide in memory) ->
    // broadcasting would OOM the build side -> demote to shuffle
    withEstimate(19000000L) {
      val (bhj1, smj1) = joinNodes(joinPlan().queryExecution.executedPlan)
      assert(smj1 && !bhj1, "model estimate should demote to shuffle")
    }
  }

  private def asofDf(): org.apache.spark.sql.DataFrame = {
    val trades = spark.read.parquet(asofTradesPath)
    val quotes = spark.read.parquet(asofQuotesPath)
      .filter(col("b") <= 1).select(col("q"), col("qt"), col("rid"))
    graft.ops.Relational.asofJoinTables(trades, quotes, "k", "q", "t", "qt")
  }

  private def asofNodes(p: SparkPlan): (Boolean, Boolean) = {
    var bcast = false; var merge = false
    p.foreach {
      case _: org.apache.spark.sql.graft.BroadcastAsofJoinExec => bcast = true
      case _: org.apache.spark.sql.graft.AsofJoinExec => merge = true
      case _ => ()
    }
    (bcast, merge)
  }

  test("model estimate flips the custom as-of join in both directions") {
    // AsofJoinStrategy reads the right side's logical stats, so the
    // injected learned cardinality steers the custom operator exactly
    // as it steers Catalyst's own JoinSelection.
    // Direction 1: file-size stats (whole quotes file) exceed a 10 KB
    // threshold -> merge; the model knows b<=1 keeps ~40 rows -> bcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    val (b0, m0) = asofNodes(asofDf().queryExecution.executedPlan)
    assert(m0 && !b0, "baseline should sort-merge (file-size stats)")
    val baseline = asofDf().collect().map(_.toSeq).toSet
    withEstimate(40L, "asof_quotes", Set("b")) {
      val df = asofDf()
      val (b1, m1) = asofNodes(df.queryExecution.executedPlan)
      assert(b1 && !m1, "low model estimate should broadcast the quotes")
      assert(df.collect().map(_.toSeq).toSet == baseline,
        "as-of stats injection changed results")
    }
    // Direction 2: under a generous threshold the raw file broadcasts;
    // a huge model estimate demotes the as-of back to the merge exec.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      (8 * 1024 * 1024).toString)
    val (b2, m2) = asofNodes(asofDf().queryExecution.executedPlan)
    assert(b2 && !m2, "baseline should broadcast (small file)")
    withEstimate(19000000L, "asof_quotes", Set("b")) {
      val (b3, m3) = asofNodes(asofDf().queryExecution.executedPlan)
      assert(m3 && !b3, "high model estimate should demote to merge")
    }
  }

  test("injection leaves non-registered filters and disabled mode alone") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    // enabled but nothing registered for this path -> baseline plan
    spark.conf.set(EstimatedStatsRule.EnabledKey, "true")
    try {
      val (bhj, smj) = joinNodes(joinPlan().queryExecution.executedPlan)
      assert(smj && !bhj)
    } finally spark.conf.set(EstimatedStatsRule.EnabledKey, "false")
  }

  test("OR filter: the I-E estimate steers the broadcast decision (r17)") {
    import graft.query.Pred
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10240")
    def orJoin() = {
      val facts = spark.read.parquet(factsPath)
        .filter(col("a") <= 1 || col("a") >= 999)
      val dims = spark.read.parquet(dimsPath)
      facts.join(dims, facts("k") === dims("dk"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }
    val (bhj0, smj0) = joinNodes(orJoin().queryExecution.executedPlan)
    assert(smj0 && !bhj0, "baseline should shuffle (file-size stats)")
    val baseline = orJoin().collect().map(_.toSeq).toSet
    // record the I-E probes: a 2-way OR must cost A, B, and A AND B
    val probes = scala.collection.mutable.ArrayBuffer.empty[Seq[Pred]]
    val saved = GraftRuntime.snapshot()
    GraftRuntime.register("statsinj_facts", Set("a"),
      preds => { probes += preds; if (preds.size <= 1) 30L else 10L })
    spark.conf.set(EstimatedStatsRule.EnabledKey, "true")
    try {
      val df = orJoin()
      val (bhj1, smj1) = joinNodes(df.queryExecution.executedPlan)
      assert(bhj1 && !smj1,
        "the 30+30-10=50-row I-E estimate should broadcast the filter")
      assert(probes.exists(_.size == 2),
        s"the A AND B correction term was never probed: $probes")
      assert(df.collect().map(_.toSeq).toSet == baseline,
        "stats injection changed query results")
    } finally {
      spark.conf.set(EstimatedStatsRule.EnabledKey, "false")
      GraftRuntime.restore(saved)
    }
  }
}
