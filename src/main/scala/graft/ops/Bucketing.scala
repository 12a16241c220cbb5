package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-storage co-located joins — the 100 TB technique the ad-hoc
  * entries can't show: pay the shuffle ONCE at write time (bucketBy +
  * sortBy on the join key), then every subsequent join on that key is
  * exchange-free (and with sorted buckets, sort-free): a SortMergeJoin
  * whose both sides stream straight from the scan.
  *
  * At real scale this is how fact↔dim and fact↔fact joins on a stable
  * key (user_id, custkey, doc_id) amortize: one layout job, unbounded
  * downstream joins/aggregations reading co-located partitions. The
  * OpsSpec plan test asserts the exchange-free shape; the catalog entry
  * (`q_bucketed_join`) oracle-checks that the layout rewrite preserves
  * join semantics exactly.
  */
object Bucketing {

  /** Materializes `df` as a bucketed+sorted parquet table (external, at
    * `baseDir/name`) if this session hasn't already, and returns the
    * catalog-backed DataFrame. Bucket metadata lives in the session
    * catalog — reads resolve bucket files without a metastore service.
    * Callers key `name` by the source dir so different SF inputs never
    * alias.
    */
  def bucketedTable(spark: SparkSession, name: String, df: => DataFrame,
      keyCol: String, numBuckets: Int, baseDir: String): DataFrame = {
    if (!spark.catalog.tableExists(name)) {
      df.write
        .bucketBy(numBuckets, keyCol)
        .sortBy(keyCol)
        .option("path", s"$baseDir/$name")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    }
    spark.table(name)
  }

  /** Orders⋈customer per-nation rollup over bucketed tables: the join
    * reads co-located buckets (no exchange, no per-query sort on the
    * join side); the only shuffle left is the small nation-key
    * aggregation. Semantically identical to the plain declarative join
    * — which is exactly what the oracle checks.
    */
  /** Cache key for materialized layouts: the source dir PLUS the
    * source file's (mtime, length) fingerprint, so a regenerated
    * source parquet at the same path invalidates stale cross-JVM
    * copies instead of being silently reused. The session timezone is
    * part of the key too: a date-partitioned layout's `to_date(ts)`
    * partition values depend on it, so a layout written by a non-UTC
    * session must never alias a UTC run's (and vice versa). */
  private def dirTag(spark: SparkSession, sfDir: String,
      table: String): String = {
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val f = new java.io.File(s"$sfDir/$table.parquet")
    val key = s"$sfDir:${f.lastModified}:${f.length}:$tz"
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
  }

  def ordersPerNationBucketed(spark: SparkSession, sfDir: String,
      numBuckets: Int = 8): DataFrame = {
    val tag = dirTag(spark, sfDir, "orders") + dirTag(spark, sfDir, "customer")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed"
    val ord = bucketedTable(spark, s"graft_b_${tag}_orders",
      graft.core.Tables.read(spark, sfDir, "orders")
        .select(col("o_custkey"), col("o_totalprice")),
      "o_custkey", numBuckets, base)
    val cust = bucketedTable(spark, s"graft_b_${tag}_customer",
      graft.core.Tables.read(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
      "c_custkey", numBuckets, base)
    ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("revenue_cents"))
      .orderBy("c_nationkey")
  }

  def ordersPerNationSql(ordersTable: String, customerTable: String): String =
    s"SELECT c_nationkey, count(*) AS n_orders, " +
      "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) " +
      "AS revenue_cents " +
      s"FROM $ordersTable JOIN $customerTable ON o_custkey = c_custkey " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"

  /** Z-order (Morton) interleave of the low `bits` bits of two
    * non-negative dimensions — the multi-dimensional clustering key for
    * data layouts: sorting by `z` places rows close in BOTH dimensions
    * into the same files, so per-file min/max stats prune 2-D box
    * queries on either dimension (a single-column sort prunes only its
    * own dimension and degrades the other to a full scan). At 100 TB
    * this is the layout job you run once at ingest; every (customer ×
    * date-range) query after it skips most files on stats alone —
    * LayoutSpec measures exactly that file-overlap count on both
    * layouts.
    *
    * Pure integer bit-arithmetic (the parallel-prefix spread), identical
    * in Spark and DuckDB — no UDF, whole-stage-codegen'd, and
    * oracle-checkable.
    *
    * CONTRACT: inputs are TRUNCATED to their low `bits` bits — values
    * ≥ 2^bits alias onto the same cell (customer 1 and 65537 share
    * x-bits at the default 16), which silently degrades the pruning
    * win. Size `bits` to the dimension's range, or pre-bucket wide
    * dimensions (e.g. `key % 2^bits`-style coarsening is fine for
    * clustering: aliasing distant keys costs locality, never
    * correctness, since the layout only orders rows).
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 16, "bits in [1,16]")
    def spread(v: Column): Column = {
      val v0 = v.cast("long").bitwiseAND(lit((1L << bits) - 1))
      val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
      v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** DuckDB twin of [[zorder2]] (textual expansion of the same spread
    * chain; size doubles per stage but tops out ~1.6 KB for short
    * column names). */
  def zorder2Sql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 16, "bits in [1,16]")
    def spread(v: String): String = {
      val v0 = s"(CAST($v AS BIGINT) & ${(1L << bits) - 1})"
      val v1 = s"(($v0 | ($v0 << 8)) & ${0x00FF00FFL})"
      val v2 = s"(($v1 | ($v1 << 4)) & ${0x0F0F0F0FL})"
      val v3 = s"(($v2 | ($v2 << 2)) & ${0x33333333L})"
      s"(($v3 | ($v3 << 1)) & ${0x55555555L})"
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  /** The partner layout technique: Hive-style date partitioning, so a
    * filter on the partition column reaches the scan as
    * PartitionFilters and skips whole directories — at 100 TB a
    * one-week query over a year of events reads ~2% of the files
    * instead of filtering 100% of the rows. Materialized once per
    * session (the write is the honest ingest-time cost); the returned
    * DataFrame is path-backed, so pruning needs no catalog.
    */
  def datePartitionedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val tag = dirTag(spark, sfDir, "events")
    val path =
      s"${System.getProperty("java.io.tmpdir")}/graft_part/events_$tag"
    if (!new java.io.File(s"$path/_SUCCESS").exists()) {
      graft.core.Tables.read(spark, sfDir, "events")
        .withColumn("dt", to_date(col("ts")))
        .write.partitionBy("dt").mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
