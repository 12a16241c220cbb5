package graft.est

import graft.query.Pred
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The optimizer-estimate baseline — Spark-native analog of the
  * reference's `Postgres` estimator (estimators.py:619-677: run `analyze`,
  * then read `EXPLAIN`'s `Plan Rows`). Here: persist the table to the
  * catalog, `ANALYZE ... COMPUTE STATISTICS FOR ALL COLUMNS`, and read
  * Catalyst's CBO `FilterEstimation` row count from the optimized plan.
  */
object Cbo {

  /** Register + analyze once per (tableName); returns the catalog name. */
  def ensureAnalyzed(spark: SparkSession, df: DataFrame,
      tableName: String): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    if (!spark.catalog.tableExists(tableName)) {
      // The in-memory catalog forgets tables between sessions but the
      // warehouse directory persists; clear a stale location first.
      val warehouse = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      val loc = new java.io.File(warehouse, tableName.toLowerCase)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
      df.write.mode("overwrite").saveAsTable(tableName)
      spark.sql(
        s"ANALYZE TABLE $tableName COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  /** Catalyst's estimated output rows for `SELECT * WHERE preds`;
    * -1 when the optimizer declines to estimate. */
  def estimate(spark: SparkSession, tableName: String,
      preds: Seq[Pred]): Long = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    val plan = spark.table(tableName).filter(Pred.conj(preds))
      .queryExecution.optimizedPlan
    plan.stats.rowCount.map(_.toLong).getOrElse(-1L)
  }
}
