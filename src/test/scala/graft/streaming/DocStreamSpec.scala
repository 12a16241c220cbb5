package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level checks of the online LSH index (the replay harness covers
  * the end-to-end oracle; these pin the state semantics directly).
  */
class DocStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  // Shared 40-token base so every variant lands in the same buckets.
  private val base = (1 to 40).map(i => s"tok$i").mkString(" ")

  test("online LSH survives a checkpoint restart: no lost, no duplicate pairs") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("lshout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lshckpt").toString
    def start() = DocStream.lshCandidates(
        DocStream.bandRows(mem.toDF().toDF("doc_id", "text"),
          "doc_id", "text").as[DocStream.BandRow], cap = 50)
      .toDF()
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); ()
      }
      .option("checkpointLocation", ckpt)
      .start()

    val docs = Seq(
      1L -> base,
      2L -> (base + " extra"),
      3L -> (base + " other tail"),
      4L -> (1 to 40).map(i => s"zzz$i").mkString(" "))
    val q1 = start()
    mem.addData(docs(0), docs(1))
    q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint: bucket state must be restored, so
    // doc 3 pairs with BOTH 1 and 2 (no loss) and the (1,2) pair is
    // not re-emitted (no duplicates).
    val q2 = start()
    mem.addData(docs(2), docs(3))
    q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.size == streamed.distinct.size,
      s"duplicate pair emissions after restart: $streamed")
    // expected: rank-capped batch banding over the full corpus
    val banded = DocStream.bandRows(
      docs.toDF("doc_id", "text"), "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bk").orderBy("id")
    val bounded = banded.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50).drop("rn")
    val batch = bounded.as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .select(col("a.band"), col("a.id"), col("b.id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.toSet == batch,
      s"streamed=${streamed.toSet.size} batch=${batch.size}")
    // the near-dup trio must actually collide somewhere
    assert(batch.exists(p => p._2 == 1L && p._3 == 3L),
      "doc 3 must pair with doc 1 through restored state")
  }

  test("out-of-order arrival: below the cap the pair set still matches " +
      "the batch oracle; crossing the cap diverges to first-K-by-arrival") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (a) cap NOT binding: arrival order is irrelevant — every bucket
    // member pairs with every other regardless of which arrived first,
    // so a shuffled crawl still reproduces the id-ranked batch oracle.
    val mem1 = MemoryStream[(Long, String)]
    val q1 = DocStream.lshCandidates(
        DocStream.bandRows(mem1.toDF().toDF("doc_id", "text"),
          "doc_id", "text").as[DocStream.BandRow], cap = 50)
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("ooo_loose")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ooock1").toString)
      .start()
    // shuffled slices: 4 and 2 land before 1 and 3
    mem1.addData(4L -> (base + " d"), 2L -> (base + " b"))
    q1.processAllAvailable()
    mem1.addData(1L -> base, 3L -> (base + " c"))
    q1.processAllAvailable(); q1.stop()
    val streamed = spark.table("ooo_loose")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docsDf = Seq(1L -> base, 2L -> (base + " b"), 3L -> (base + " c"),
      4L -> (base + " d")).toDF("doc_id", "text")
    val banded = DocStream.bandRows(docsDf, "doc_id", "text")
    val batch = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"below-cap shuffled arrival must match batch: $streamed vs $batch")
    assert(streamed.nonEmpty)

    // (b) cap BINDING under inverted arrival: the stream keeps
    // first-K-by-ARRIVAL {3,1} (doc 2 finds its buckets full), while
    // the id-ranked oracle keeps smallest-K {1,2} — the documented
    // divergence. Pairs are never retracted, merely different.
    val mem2 = MemoryStream[(Long, String)]
    val q2 = DocStream.lshCandidates(
        DocStream.bandRows(mem2.toDF().toDF("doc_id", "text"),
          "doc_id", "text").as[DocStream.BandRow], cap = 2)
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("ooo_tight")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ooock2").toString)
      .start()
    // one micro-batch per doc — addData without a trigger in between
    // coalesces into a single (id-sorted) batch
    mem2.addData(3L -> base); q2.processAllAvailable()
    mem2.addData(1L -> base); q2.processAllAvailable()
    mem2.addData(2L -> base); q2.processAllAvailable()
    q2.stop()
    val tight = spark.table("ooo_tight")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight == Set((1L, 3L)),
      s"first-K-by-arrival must keep {3,1} and ignore 2: $tight")
  }

  test("bucket cap: the (cap+1)-th id is ignored, pairs stay within cap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.lshCandidates(
        DocStream.bandRows(mem.toDF().toDF("doc_id", "text"),
          "doc_id", "text").as[DocStream.BandRow], cap = 2)
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("capped")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("capck").toString)
      .start()
    mem.addData(1L -> base, 2L -> base, 3L -> base)
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("capped")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs share every bucket; cap=2 keeps ids 1,2 → the only
    // pair is (1,2); doc 3 is ignored in every full bucket.
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }
}
