package graft

import graft.core.Dictionary
import graft.est.ProgressiveSampling
import graft.nn.{Trainer, Transformer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the transformer entry (not part of the
  * driver contract). */
object ProfileTransformer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratchT] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val modelCols =
      Seq("l_returnflag", "l_linestatus", "l_quantity", "l_discount", "l_tax")
    val df = graft.core.Tables.read(spark, sfDir, "lineitem")
      .select(modelCols.map(col): _*)
    val meta = time("tableMeta")(
      Dictionary.tableMeta(df, "lineitem", modelCols))
    val data = time("collectEncoded 30k")(
      Trainer.collectEncoded(df, meta.columns, maxRows = 30000))
    val model = new Transformer(
      nin = modelCols.length,
      inputBins = meta.columns.map(_.distributionSize).toArray,
      dModel = 16, dFf = 32, numHeads = 2, numBlocks = 2,
      columnMasking = true, seed = 11123L)
    time("train 2 epochs")(
      Trainer.train(model, data, epochs = 2, batchSize = 1024,
        schedule = Trainer.ConstantLr(5e-3f), seed = 0L))
    val ps = new ProgressiveSampling(model, meta, numSamples = 1000,
      shortcircuit = true)
    time("psample x1")(println("  est=" + ps.query(Queries.W1)))
    time("psample x30")(for (_ <- 0 until 30) ps.query(Queries.W1))
    spark.stop()
  }
}
