package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the reference's core task (estimate
    * `SELECT COUNT(*) FROM lineitem WHERE <W1>` several ways) on
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val oracle = Queries.queries("q_oracle_card")(spark, dir)
      .select(lit("oracle").as("estimator"), col("card").as("est_card"))
    val heur = Queries.queries("q_heuristic_card")(spark, dir)
      .select(lit("heuristic").as("estimator"), col("est_card"))
    val samp = Queries.queries("q_sample_card")(spark, dir)
      .select(lit("sampling").as("estimator"), col("est_card"))
    val psample = Queries.queries("q_psample_card")(spark, dir)
      .select(lit("psample").as("estimator"), col("est_card"))
    val msample = Queries.queries("q_model_sample_card")(spark, dir)
      .select(lit("msample").as("estimator"), col("est_card"))
    val transformer = Queries.queries("q_psample_transformer")(spark, dir)
      .select(lit("psample_transformer").as("estimator"), col("est_card"))
    val bn = Queries.queries("q_bn_card")(spark, dir)
      .select(lit("bayesnet").as("estimator"), col("est_card"))
    val maxdiff = Queries.queries("q_maxdiff_card")(spark, dir)
      .select(lit("maxdiff").as("estimator"), col("est_card"))
    val cbo = Queries.queries("q_cbo_card")(spark, dir)
      .select(lit("cbo").as("estimator"), col("est_card"))
    val ensemble = Queries.queries("q_psample_ensemble")(spark, dir)
      .select(lit("psample_ensemble").as("estimator"), col("est_card"))
    val embed = Queries.queries("q_psample_embed")(spark, dir)
      .select(lit("psample_embed").as("estimator"), col("est_card"))
    val approx = Queries.queries("q_approx_count")(spark, dir)
      .select(lit("approx_count_sql").as("estimator"), col("est_card"))
    oracle.union(heur).union(samp).union(psample).union(msample)
      .union(transformer).union(bn).union(maxdiff).union(cbo)
      .union(ensemble).union(embed).union(approx)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
