package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the corpus dedup family (not part of the
  * driver contract). Times the shared n-gram Jaccard pair pipeline and
  * cluster formation in isolation; `GRAFT_CC_TRACE=1` additionally
  * prints per-round convergence of connectedComponents. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes",
        (4 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = graft.core.Tables.read(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    time("docs.count")(docs.count())
    val pairs = time("pairs pipeline")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = 100, materialize = true))
    println("  pairs=" + pairs.count())
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val comps = time("components")(
      Dedup.connectedComponents(pairs.select("id_a", "id_b"), "id_a", "id_b")
        .count())
    Thread.sleep(500) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println("  comps=" + comps + " jobs=" + jobs.get())
    var lastT = System.nanoTime()
    val starComps = time("components (star)")(
      Dedup.connectedComponentsStar(pairs.select("id_a", "id_b"),
        "id_a", "id_b",
        trace = (r, fp, c) => {
          val now = System.nanoTime()
          println(f"[scratch]   star round $r%2d ${(now - lastT) / 1e9}%8.2f s" +
            s" fp=$fp converged=$c")
          lastT = now
        })
        .count())
    println("  starComps=" + starComps)
    spark.stop()
  }
}
