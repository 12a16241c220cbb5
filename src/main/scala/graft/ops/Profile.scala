package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling: per-column row/null/distinct counts and numeric
  * min/max in ONE aggregation pass — the ingest-time data-quality report
  * every pipeline snapshot gets before training jobs trust it.
  *
  * Scale shape: a single `agg` over the scan; the multiple exact
  * `count(DISTINCT)`s plan as one Expand (one shuffle, data replicated
  * once per distinct column inside the same exchange). That is the
  * exact-answer cost; at open-corpus scale swap `countDistinct` for
  * `approx_count_distinct` and the Expand disappears (the oracle checks
  * the exact variant). The unpivot to one-row-per-column happens on the
  * single aggregated row — driver-sized, not data-sized.
  *
  * Numeric min/max surface as DOUBLE; other types as NULL — avoiding
  * engine-specific string formatting of timestamps/decimals in the
  * checked artifact.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def isNum(c: String) = df.schema(c).dataType.isInstanceOf[NumericType]
    def minMax(c: String, f: Column => Column): Column =
      if (isNum(c)) f(col(c)).cast("double") else lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        minMax(c, min).as(s"__min_$c"),
        minMax(c, max).as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col("__total").as("n_rows"),
        (col("__total") - col(s"__cnt_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_d"),
        col(s"__max_$c").as("max_d"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  /** DuckDB twin: one SELECT per column UNION ALL'd (oracle-scale; the
    * Spark side is the one-pass plan). `numeric` flags which columns
    * surface min/max. */
  def profileSql(table: String, cols: Seq[(String, Boolean)]): String =
    cols.map { case (c, isNum) =>
      val mn = if (isNum) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (isNum) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"SELECT '$c' AS col_name, count(*) AS n_rows, " +
        s"count(*) - count($c) AS n_null, " +
        s"count(DISTINCT $c) AS n_distinct, $mn AS min_d, $mx AS max_d " +
        s"FROM $table"
    }.mkString(" UNION ALL ") + " ORDER BY col_name"
}
