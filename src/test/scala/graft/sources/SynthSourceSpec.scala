package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SynthSourceSpec extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def read(rows: Long, parts: Int) =
    spark.read.format("graft-synth")
      .option("rows", rows).option("partitions", parts).load()

  test("generator is deterministic and partition-count-invariant") {
    val a = read(1000, 1).collect().map(_.toSeq).toSet
    val b = read(1000, 7).collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 1000)
    // spot-check the Lehmer fields against the shared step
    val row = read(1000, 3).filter(col("doc_id") === 17).head()
    val x = SynthSource.mix(17)
    assert(row.getString(1) == SynthSource.langs((x % 4).toInt))
    assert(row.getString(2) == "src" + (x % 5))
    assert(row.getInt(3) == (x % 501).toInt)
  }

  test("read parallelism matches the partitions option") {
    assert(read(1000, 7).rdd.getNumPartitions == 7)
  }

  test("micro-batch stream replays the exact batch rows across triggers") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", 1000).option("partitions", 3)
      .option("rowsPerBatch", 299).load()
      .writeStream.format("memory").queryName("synth_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_synth").toString)
      .start()
    q.processAllAvailable()
    val streamed = spark.table("synth_stream")
      .collect().map(_.toSeq).toSet
    val batch = read(1000, 3).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.size == 1000)
    q.stop()
  }

  test("micro-batch stream restart from checkpoint does not re-emit rows") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt_synth_r").toString
    val emitted = new java.util.concurrent.atomic.AtomicLong
    def start() = spark.readStream.format("graft-synth")
      .option("rows", 900).option("partitions", 2)
      .option("rowsPerBatch", 400).load()
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => {
        emitted.addAndGet(df.count()); ()
      })
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(emitted.get == 900)
    // Restart against the SAME checkpoint: the fresh stream instance
    // must resume at the committed offset 900 and emit NOTHING — with
    // the rewind bug, latestOffset() restarts below the checkpoint and
    // committed rows are re-emitted here.
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(emitted.get == 900,
      s"restarted stream re-emitted ${emitted.get - 900} committed rows")
  }

  test("options are case-insensitive per the DSv2 contract") {
    val df = spark.read.format("graft-synth")
      .option("ROWS", 123).option("Partitions", 3)
      .option("rowsperbatch", 50).load()
    assert(df.count() == 123)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("Trigger.AvailableNow drains the source in one run and stops") {
    val q = spark.readStream.format("graft-synth")
      .option("rows", 700).option("partitions", 2)
      .option("rowsPerBatch", 300).load()
      .writeStream.format("memory").queryName("synth_avail_now")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckpt_synth_an").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // AvailableNow terminates on its own once reportLatestOffset() is
    // reached; a null reportLatestOffset would end the run with ZERO
    // rows emitted.
    assert(q.awaitTermination(60000), "AvailableNow run did not terminate")
    assert(spark.table("synth_avail_now").count() == 700)
  }

  test("audit sink: committed totals are partition- and order-invariant") {
    val df = read(5000, 4)
    df.write.format("graft-audit").option("id", "a1").mode("append").save()
    val Some((rows1, sum1)) = AuditSink.result("a1")
    assert(rows1 == 5000)
    // same data through a different plan -> identical audit result
    read(5000, 9).orderBy(col("n_tokens"))
      .write.format("graft-audit").option("id", "a2").mode("append").save()
    assert(AuditSink.result("a2").contains((rows1, sum1)))
    // different data -> different checksum
    read(4999, 4)
      .write.format("graft-audit").option("id", "a3").mode("append").save()
    assert(AuditSink.result("a3").exists(_ != ((rows1, sum1))))
    // multiplicity-sensitive: every row duplicated (even count) must NOT
    // collide with the original — the XOR-fold failure mode.
    val doubled = read(5000, 4).union(read(5000, 4))
    doubled.write.format("graft-audit").option("id", "a4")
      .mode("append").save()
    val Some((rows4, sum4)) = AuditSink.result("a4")
    assert(rows4 == 10000)
    assert(sum4 != sum1, "doubled dataset collided with original checksum")
    Seq("a1", "a2", "a3", "a4").foreach(AuditSink.clear)
  }

  test("scan is columnar and the vectorized batches match the row reader") {
    val df = read(10000, 3)
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.head.supportsColumnar, "scan did not go columnar")
    // vectorized output == the row-based reader's rows (same factory,
    // forced through createReader)
    val factory = new SynthReaderFactory(SynthSource.fullSchema)
    val rowReader = factory.createReader(SynthPartition(100, 140))
    val viaRows = Iterator.continually(rowReader)
      .takeWhile(_.next()).map(_.get().copy()).toList
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(SynthSource.fullSchema)
    val toRow = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(enc)
      .resolveAndBind().createDeserializer()
    val viaBatch = {
      val r = factory.createColumnarReader(SynthPartition(100, 140))
      assert(r.next())
      val b = r.get()
      (0 until b.numRows()).map(i => toRow(b.getRow(i).copy())).toList
    }
    assert(viaRows.map(toRow(_)) == viaBatch)
    assert(viaBatch.size == 40)
  }

  test("doc_id range filters push into the generator and shrink the scan") {
    val df = read(100000, 4)
      .filter(col("doc_id") >= 60000L && col("doc_id") < 60500L)
    val rows = df.collect()
    assert(rows.length == 500)
    assert(rows.map(_.getLong(0)).min == 60000L)
    val scans = collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    // the scan's input partitions cover ONLY the filtered range: work
    // was eliminated at planning, not filtered after generation
    val parts = scans.head.partitions.flatten.map(_.asInstanceOf[SynthPartition])
    assert(parts.map(p => p.end - p.start).sum == 500,
      s"generator did not narrow: $parts")
  }

  test("count/min/max push into the source as a closed-form one-row scan") {
    val df = read(100000, 4)
      .filter(col("doc_id") >= 60000L && col("doc_id") < 60500L)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
    val row = df.head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((500L, 60000L, 60499L)))
    val scans = collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.head.scan.isInstanceOf[SynthAggScan],
      s"aggregate did not push: ${scans.head.scan}")
    // the entire job is ONE task reading ONE synthetic row — no
    // generator work ran at all
    assert(scans.head.partitions.flatten.size == 1)
    // empty range: count 0, SQL-null min/max
    val empty = read(1000, 2).filter(col("doc_id") < 0L)
      .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("non-closed-form aggregates decline pushdown and stay correct") {
    val df = read(10000, 3)
      .agg(sum(col("n_tokens")).as("s"), count(lit(1)).as("n"))
    val scans = collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(!scans.head.scan.isInstanceOf[SynthAggScan],
      "sum(n_tokens) has no closed form and must not claim pushdown")
    val viaScan = df.head().getLong(0)
    val expected = read(10000, 3).collect().map(_.getInt(3).toLong).sum
    assert(viaScan == expected)
    // grouped aggregates likewise decline (group-by columns not handled)
    val grouped = read(10000, 3).groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
    val gScans = collect(grouped.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(!gScans.head.scan.isInstanceOf[SynthAggScan])
    assert(grouped.collect().map(_.getLong(1)).sum == 10000L)
  }

  test("reported statistics drive the broadcast decision both ways") {
    // Small (filter-narrowed) synth scan joined to a big range: the
    // scan's honest post-pushdown stats put it under the broadcast
    // threshold, so the planner broadcasts it. Without
    // SupportsReportStatistics a DSv2 scan reports defaultSizeInBytes
    // (Long.MaxValue) and can never be the build side.
    val big = spark.range(0, 5000000L).toDF("id") // ~40 MB by range stats
    val small = read(100000, 4)
      .filter(col("doc_id") >= 60000L && col("doc_id") < 61000L)
    val joined = big.join(small, col("id") === col("doc_id"))
    joined.collect()
    val bhj = collect(joined.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, "small synth side was not broadcast:\n" +
      joined.queryExecution.executedPlan)
    // the reported size is the narrowed range × row width
    val rel = joined.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation if r.scan.isInstanceOf[SynthScan] => r }
    assert(rel.head.stats.sizeInBytes ==
      BigInt(1000 * SynthScan.rowBytes(SynthSource.fullSchema)))
    // Huge synth scan: stats put it far over the threshold — no
    // broadcast of the synth side (sort-merge or shuffled-hash).
    val huge = read(50000000L, 8)
    val j2 = big.join(huge, col("id") === col("doc_id"))
    val bhj2 = collect(j2.queryExecution.executedPlan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
    assert(bhj2.isEmpty, "2.4 GB synth side must not broadcast:\n" +
      j2.queryExecution.executedPlan)
  }

  test("runtime join-key filtering narrows the generated range at execution") {
    // DSv2 dynamic filtering: the selective dim side is evaluated
    // first, its observed join keys arrive as an IN predicate via
    // SupportsRuntimeV2Filtering.filter, and input partitions are
    // planned over the keys' envelope — 10 rows of generator work
    // instead of 1,000,000.
    val dim = spark.range(0, 1000000L).toDF("id")
      .filter(col("id") >= 777000L && col("id") < 777010L)
    val fact = read(1000000L, 8)
    val joined = fact.join(dim, col("doc_id") === col("id"))
    assert(joined.count() == 10)
    val scans = collect(joined.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[SynthScan] => b }
    assert(scans.head.runtimeFilters.nonEmpty,
      "no runtime filter was planted on the synth scan:\n" +
        joined.queryExecution.executedPlan)
    val (lo, hi) = scans.head.scan.asInstanceOf[SynthScan].currentRange
    assert((lo, hi) == ((777000L, 777010L)),
      s"runtime filter did not narrow the range: [$lo, $hi)")
    assert(scans.head.scan.asInstanceOf[SynthScan].currentCoverage == 10)
  }

  test("runtime filtering with scattered keys plans exact id runs") {
    // keys 100, 333433, 666766 span nearly the whole range — a
    // [min, max] envelope would still generate ~667k rows; exact-run
    // planning generates 3.
    val dim = spark.range(0, 1000000L).toDF("id")
      .filter(col("id") % 333333 === 100)
    val fact = read(1000000L, 8)
    val joined = fact.join(dim, col("doc_id") === col("id"))
    assert(joined.collect().length == 3)
    val scans = collect(joined.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[SynthScan] => b }
    assert(scans.head.runtimeFilters.nonEmpty)
    val scan = scans.head.scan.asInstanceOf[SynthScan]
    assert(scan.currentCoverage == 3,
      s"expected 3 generated rows, planned ${scan.currentCoverage}")
    // re-planning after filter() emits one run per scattered key
    // (BatchScanExec.partitions is the cached PRE-filter layout; the
    // engine uses the post-filter planning at execution)
    val parts = scan.planInputPartitions().map(_.asInstanceOf[SynthPartition])
    assert(parts.toSeq == Seq(SynthPartition(100, 101),
      SynthPartition(333433, 333434), SynthPartition(666766, 666767)),
      s"planned: ${parts.toSeq}")
  }

  test("key-grouped read: same rows, and groupBy(lang) plans no shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def partitioned = spark.read.format("graft-synth")
        .option("rows", 20000).option("partitionBy", "lang").load()
      // content identical to the range-partitioned read
      assert(partitioned.collect().map(_.toSeq).toSet ==
        read(20000, 4).collect().map(_.toSeq).toSet)
      // the reported KeyGroupedPartitioning satisfies the aggregation's
      // required distribution: zero exchanges in the whole plan
      val agg = partitioned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("toks"))
      agg.collect()
      val exchanges = collect(agg.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchanges.isEmpty, "key-grouped aggregation must not " +
        s"shuffle:\n${agg.queryExecution.executedPlan}")
      // control: the same aggregation over the range-partitioned read
      // must shuffle
      val ctrl = read(20000, 4).groupBy(col("lang"))
        .agg(count(lit(1)).as("n"))
      ctrl.collect()
      assert(collect(ctrl.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
        .nonEmpty, "control aggregation should shuffle")
      // storage-partitioned join: two key-grouped scans join on lang
      // with no exchange on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = partitioned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_a"))
      val b = partitioned.groupBy(col("lang"))
        .agg(sum(col("n_tokens")).as("toks_b"))
      val j = a.join(b, "lang")
      assert(j.collect().length == 4)
      assert(collect(j.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
        .isEmpty, "storage-partitioned join must not shuffle:\n" +
        j.queryExecution.executedPlan)
    } finally {
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("closed-form column stats reach Catalyst's attribute statistics") {
    val df = read(100000, 4)
      .filter(col("doc_id") >= 60000L && col("doc_id") < 60500L)
    val stats = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r.stats }.head
    assert(stats.rowCount.contains(BigInt(500)))
    val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
    val id = byName("doc_id")
    assert(id.distinctCount.contains(BigInt(500)))
    assert(id.min.contains(60000L) && id.max.contains(60499L))
    assert(id.nullCount.contains(BigInt(0)))
    assert(byName("lang").distinctCount.contains(BigInt(4)))
    assert(byName("n_tokens").distinctCount.contains(BigInt(500)))
  }

  test("reported doc_id ordering elides already-satisfied sorts") {
    val df = read(10000, 4).sortWithinPartitions("doc_id")
    df.collect()
    val sorts = collect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty, "sort on the reported ordering must be " +
      s"elided:\n${df.queryExecution.executedPlan}")
    // control: a sort the scan does NOT provide stays in the plan
    val ctrl = read(10000, 4).sortWithinPartitions("n_tokens")
    ctrl.collect()
    assert(collect(ctrl.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.SortExec => s }.nonEmpty)
  }

  test("column pruning reaches the reader (ReadSchema is the pruned set)") {
    val df = read(1000, 2).select(col("lang"))
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.length == 1)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("lang"),
      s"pruned schema: ${scans.head.scan.readSchema()}")
  }
}
