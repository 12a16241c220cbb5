package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom file-skipping index's two contracts: no false negatives
  * (a pruned lookup equals a full scan — also oracle-gated via
  * q_bloom_skip) and real pruning (candidates are a strict subset of
  * the layout's files for point lookups).
  */
class IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var layout: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("payload", StringType)))
    val rows = Seq.tabulate(1000)(i => Row(i.toLong, s"p$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_idx")
    layout = s"$dir/t"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      .repartition(8, col("id"))
      .write.mode("overwrite").parquet(layout)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bloom skip: true files always candidates, most files pruned, lookup exact") {
    val data = spark.read.parquet(layout)
    val index = SkippingIndex.build(data, "id")
    assert(index.count() == 8L)
    val keys = Seq(5L, 123L, 777L)
    val cand = SkippingIndex.candidateFiles(spark, index, keys)
    val trueFiles = data.filter(col("id").isin(keys: _*))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(trueFiles.subsetOf(cand.toSet),
      "Bloom must never exclude a file that holds a probed key")
    assert(cand.size < 8,
      s"expected pruning below the 8-file layout, got ${cand.size}")
    val got = SkippingIndex.lookup(spark, layout, index, "id", keys,
      Seq(col("id"), col("payload"))).orderBy("id").collect().toSeq
    val want = data.filter(col("id").isin(keys: _*))
      .select(col("id"), col("payload")).orderBy("id").collect().toSeq
    assert(got == want)
  }

  test("bloom skip: absent key returns zero rows (possibly via the empty-candidate path)") {
    val data = spark.read.parquet(layout)
    val index = SkippingIndex.build(data, "id")
    val n = SkippingIndex.lookup(spark, layout, index, "id",
      Seq(1000000L), Seq(col("id"))).count()
    assert(n == 0L)
  }
}
