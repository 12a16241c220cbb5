package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (comma-separated names), mirroring Bench;
    // unset for the driver's full run. Filters the oracle dump too, so
    // check.py over the subset outDir stays consistent.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // Alphabetical like Bench (a Map's iteration order is arbitrary):
    // deterministic run order is what lets the last-consumer release
    // schedule below free each shared materialization's executor
    // storage as soon as its final selected consumer has written.
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(e => keep(e._1))
    val releaseAfter: Map[String, Seq[String]] =
      Queries.sharedConsumers.toSeq.flatMap { case (res, consumers) =>
        selected.map(_._1).filter(consumers).lastOption.map(_ -> res)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      releaseAfter.getOrElse(name, Nil)
        .foreach(Queries.releaseShared(_, spark, sfDir))
    }
    Queries.releaseAllShared(spark, sfDir)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => keep(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
