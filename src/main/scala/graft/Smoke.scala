package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: drives SparkEntry.entry the way the driver does
  * (rows>0 check) and prints the result.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(100, truncate = false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
