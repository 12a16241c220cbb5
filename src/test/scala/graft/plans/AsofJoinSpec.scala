package graft.plans

import graft.ops.Relational
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of join operator: semantics on known inputs (boundary
  * inclusivity, no-match nulls, null keys, multi-partition merge) and
  * the physical plan shape (AsofJoinExec fed by one exchange + sort per
  * side, inserted by EnsureRequirements from the declared requirements).
  */
class AsofJoinSpec extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "5")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(min: Int) =
    new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + min * 60000L)

  private def leftDf(parts: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, ts(10), 100L),  // quote at 5 -> matched
      Row(1L, ts(20), 101L),  // quote at 20 -> INCLUSIVE boundary match
      Row(2L, ts(10), 102L),  // only later quotes -> null
      Row(3L, ts(10), 103L),  // no quotes at all -> null
      Row(null, ts(10), 104L) // null key -> null
    ), parts),
    StructType(Seq(StructField("k", LongType), StructField("t", TimestampType),
      StructField("lid", LongType))))

  private def rightDf(parts: Int) = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, ts(5), 200L),
      Row(1L, ts(20), 201L),  // equal-ts: inclusive
      Row(1L, ts(30), 202L),  // future: never matches these lefts
      Row(2L, ts(15), 203L),  // after left's ts -> no match
      Row(null, ts(1), 204L)  // null key on right: skipped
    ), parts),
    StructType(Seq(StructField("q", LongType), StructField("qt", TimestampType),
      StructField("rid", LongType))))

  private def run(lp: Int, rp: Int): Map[Long, Option[Long]] =
    Relational.asofJoinTables(leftDf(lp), rightDf(rp), "k", "q", "t", "qt")
      .select(col("lid"), col("rid"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("as-of semantics: inclusive boundary, no-match nulls, null keys") {
    val expected = Map(
      100L -> Some(200L), 101L -> Some(201L),
      102L -> None, 103L -> None, 104L -> None)
    assert(run(1, 1) == expected)
    // merge logic is partition-layout-invariant (exchange re-clusters)
    assert(run(3, 2) == expected)
    assert(run(2, 4) == expected)
  }

  test("as-of join works with string keys (interpreted UTF8String ordering)") {
    import org.apache.spark.sql.Row
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("alice", ts(10), 1L), Row("bob", ts(10), 2L)), 2),
      StructType(Seq(StructField("k", StringType),
        StructField("t", TimestampType), StructField("lid", LongType))))
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("alice", ts(5), 10L), Row("alice", ts(9), 11L),
        Row("carol", ts(1), 12L)), 2),
      StructType(Seq(StructField("q", StringType),
        StructField("qt", TimestampType), StructField("rid", LongType))))
    val got = Relational.asofJoinTables(l, r, "k", "q", "t", "qt")
      .select(col("lid"), col("rid")).collect()
      .map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map(1L -> Some(11L), 2L -> None))
  }

  private def runDir(lp: Int, rp: Int, dir: String, tolUs: Long,
      bcast: Option[Boolean] = None): Map[Long, Option[Long]] =
    Relational.asofJoinTables(leftDf(lp), rightDf(rp), "k", "q", "t", "qt",
        direction = dir, toleranceUs = tolUs, broadcast = bcast)
      .select(col("lid"), col("rid"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("forward as-of: smallest right ts >= left ts, inclusive") {
    val expected = Map(
      100L -> Some(201L), // quotes at 20, 30 after t=10 -> 20 wins
      101L -> Some(201L), // equal ts is an inclusive forward match
      102L -> Some(203L), // quote at 15 >= 10
      103L -> None, 104L -> None)
    assert(runDir(1, 1, "forward", -1L) == expected)
    assert(runDir(3, 2, "forward", -1L) == expected)
  }

  test("nearest as-of: closer of the two candidates, tie backward") {
    val expected = Map(
      100L -> Some(200L), // back diff 5 min < fwd diff 10 min
      101L -> Some(201L), // exact-ts match, diff 0
      102L -> Some(203L), // only a forward candidate exists
      103L -> None, 104L -> None)
    assert(runDir(1, 1, "nearest", -1L) == expected)
    assert(runDir(2, 3, "nearest", -1L) == expected)
  }

  test("tolerance bounds the match distance in every direction") {
    val min6 = 6L * 60 * 1000000
    // backward within 6 min: 100's quote at t-5min stays, 102 has no
    // backward candidate at all
    assert(runDir(1, 1, "backward", min6) == Map(
      100L -> Some(200L), 101L -> Some(201L),
      102L -> None, 103L -> None, 104L -> None))
    // backward within 3 min: 100's 5-min-old quote now out of range
    assert(runDir(1, 1, "backward", 3L * 60 * 1000000) == Map(
      100L -> None, 101L -> Some(201L),
      102L -> None, 103L -> None, 104L -> None))
    // forward within 5 min: 100's fwd candidate is 10 min away -> null;
    // 102's is exactly 5 min -> inclusive match
    assert(runDir(1, 1, "forward", 5L * 60 * 1000000) == Map(
      100L -> None, 101L -> Some(201L),
      102L -> Some(203L), 103L -> None, 104L -> None))
    // nearest within 6 min: out-of-window candidates (100's forward
    // quote, 10 min away) are filtered before the choice
    assert(runDir(1, 1, "nearest", min6) == Map(
      100L -> Some(200L), 101L -> Some(201L),
      102L -> Some(203L), 103L -> None, 104L -> None))
  }

  test("as-of join rejects mismatched key types up front") {
    val bad = rightDf(1).withColumn("q", col("q").cast("int"))
    val e = intercept[IllegalArgumentException] {
      Relational.asofJoinTables(leftDf(1), bad, "k", "q", "t", "qt")
    }
    assert(e.getMessage.contains("key types differ"))
  }

  test("broadcast exec matches merge on every direction and tolerance") {
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(-1L, 3L * 60 * 1000000, 6L * 60 * 1000000)) {
      val m = runDir(3, 2, dir, tol, Some(false))
      val b = runDir(3, 2, dir, tol, Some(true))
      assert(b == m, s"broadcast != merge for dir=$dir tol=$tol")
    }
  }

  test("plan: broadcast as-of — no shuffle, no sort on the big side") {
    val df = Relational.asofJoinTables(leftDf(2), rightDf(2),
      "k", "q", "t", "qt", broadcast = Some(true))
    df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collect(plan) {
      case e: org.apache.spark.sql.graft.BroadcastAsofJoinExec => e
    }.length == 1, s"BroadcastAsofJoinExec missing in:\n$plan")
    assert(collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"expected zero shuffles in:\n$plan")
    assert(collect(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, s"expected zero sorts in:\n$plan")
    assert(collect(plan) {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
    }.length == 1, s"expected one broadcast exchange in:\n$plan")
  }

  test("strategy auto-selects from right-side stats like JoinSelection") {
    // LocalRelation inputs carry accurate (tiny) sizeInBytes -> the
    // size gate fires with no hint; disabling the threshold falls back
    // to the merge exec, mirroring Spark's own broadcast-join conf.
    val s = spark
    import s.implicits._
    val l = Seq((1L, ts(10), 100L), (2L, ts(10), 102L)).toDF("k", "t", "lid")
    val r = Seq((1L, ts(5), 200L)).toDF("q", "qt", "rid")
    val auto = Relational.asofJoinTables(l, r, "k", "q", "t", "qt")
    auto.collect()
    assert(collect(auto.queryExecution.executedPlan) {
      case e: org.apache.spark.sql.graft.BroadcastAsofJoinExec => e }.nonEmpty,
      "small right side with known stats should auto-broadcast")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merge = Relational.asofJoinTables(l, r, "k", "q", "t", "qt")
      merge.collect()
      assert(collect(merge.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.graft.AsofJoinExec => e }.nonEmpty,
        "threshold=-1 must fall back to the merge exec")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("plan: AsofJoinExec with one exchange + sort per side") {
    // broadcast = Some(false): without the pin, AQE's re-optimization
    // sees the right stage's tiny RUNTIME stats and flips the strategy
    // to the broadcast exec mid-query — Spark's dynamic broadcast-join
    // conversion working unmodified for the custom operator (covered
    // by the auto-selection test above).
    val df = Relational.asofJoinTables(leftDf(2), rightDf(2),
      "k", "q", "t", "qt", broadcast = Some(false))
    df.collect() // finalize the adaptive plan before asserting on it
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) {
      case e: org.apache.spark.sql.graft.AsofJoinExec => e }
    assert(execs.length == 1, s"AsofJoinExec missing in:\n$plan")
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.length == 2, s"expected 2 exchanges in:\n$plan")
    val sorts = collect(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.length == 2, s"expected 2 sorts in:\n$plan")
  }
}
