package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column dictionary ("domain"): the complete sorted list of distinct
  * values, with the null (if any) at position 0.
  *
  * Mirrors the reference's `Column.SetDistribution` semantics
  * (reference common.py:67-85): domain is `sort(unique(values))` with
  * NaN/NaT inserted before the smallest value, so bin 0 is reserved for
  * null whenever a null exists. That invariant is load-bearing: a
  * predicate mask computed over the domain is always false at position 0,
  * so a null row can never satisfy a conjunct (common.py:11-24).
  *
  * Scale posture: only the *domain* (bounded, dictionary-encoded columns;
  * ~4k values/column in the reference's DMV data) crosses to the driver
  * and is broadcast. Raw data never does.
  */
final case class ColumnMeta(
    name: String,
    dataType: DataType,
    domain: Array[Any],
    hasNull: Boolean) {

  /** Reference `DistributionSize` (common.py:52-57): vocab size incl. null. */
  def distributionSize: Int = domain.length

  private lazy val valueToBin: Map[Any, Int] =
    domain.iterator.zipWithIndex.filter(_._1 != null).toMap

  /** Reference `Column.ValToBin` (common.py:59-65). Null → 0 when present. */
  def valToBin(v: Any): Int =
    if (v == null) { require(hasNull, s"null not in domain of $name"); 0 }
    else valueToBin.getOrElse(v, -1)

  /** Total ordering used for range predicates over the domain. */
  lazy val ordering: Ordering[Any] = ColumnMeta.orderingFor(dataType)

  /** Domain values (excluding null slot) as a typed array for mask eval. */
  def nonNullDomain: Array[Any] = if (hasNull) domain.drop(1) else domain
}

object ColumnMeta {
  /** Spark (and DuckDB) order strings by UTF-8 binary collation; Java's
    * natural String order is UTF-16 code-unit order. They diverge on
    * supplementary-plane characters, so driver-side domain sorts must
    * compare UTF-8 bytes unsigned. */
  private val utf8Ordering: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = {
      val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** Ordering consistent with Spark's `orderBy(asc)` for supported types. */
  def orderingFor(dt: DataType): Ordering[Any] = dt match {
    case StringType => utf8Ordering
    case IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
    case LongType => Ordering.Long.on[Any](_.asInstanceOf[Long])
    case DoubleType =>
      Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
    case FloatType =>
      Ordering.Float.TotalOrdering.on[Any](_.asInstanceOf[Float])
    case TimestampType =>
      Ordering.Long.on[Any](_.asInstanceOf[java.sql.Timestamp].getTime)
    // Parquet TIMESTAMP with isAdjustedToUTC=false reads as NTZ, whose
    // external type is LocalDateTime; predicate literals may still be
    // java.sql.Timestamp (Pred.ts builds UTC instants, and the session
    // timezone is UTC), so normalize both to epoch millis.
    case TimestampNTZType =>
      Ordering.Long.on[Any] {
        case t: java.time.LocalDateTime =>
          t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
        case t: java.sql.Timestamp => t.getTime
        case other => throw new IllegalArgumentException(
          s"not a timestamp: $other")
      }
    case DateType =>
      Ordering.Long.on[Any](_.asInstanceOf[java.sql.Date].getTime)
    case other => throw new IllegalArgumentException(s"unsupported: $other")
  }
}

/** Reference `Table` (common.py:101-145): ordered columns + cardinality. */
final case class TableMeta(
    name: String,
    cardinality: Long,
    columns: Seq[ColumnMeta]) {
  val nameToIndex: Map[String, Int] =
    columns.iterator.map(_.name).zipWithIndex.toMap
  def column(name: String): ColumnMeta = columns(nameToIndex(name))
}

/** Dataset registry (reference datasets.py:9-20): named loaders that pick
  * the modeled column subset for each table.
  */
object Tables {
  /** Modeled column subsets per table (the analog of LoadDmv's 11-of-20
    * projection, reference datasets.py:11-15). */
  val modeledColumns: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_returnflag", "l_linestatus", "l_quantity",
      "l_discount", "l_tax", "l_shipdate", "l_linenumber"),
    "orders" -> Seq("o_orderstatus", "o_orderpriority", "o_totalprice",
      "o_orderdate"),
    "customer" -> Seq("c_nationkey", "c_mktsegment", "c_acctbal"),
    "events" -> Seq("event_type", "user_id", "value")
  )

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    if (table == "events") readEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$table.parquet")

  /** CSV scan with projection — the reference's load path
    * (`pd.read_csv(usecols=cols)`, common.py:186-193): header CSV with
    * an explicit schema (type casts, common.py:195-214, including
    * timestamp parsing), projected so column pruning reaches the scan.
    */
  def readCsv(spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      cols: Seq[String] = Nil,
      timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .schema(schema)
      .csv(path)
    if (cols.isEmpty) df else df.select(cols.map(col): _*)
  }

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. Read nanos as long and floor to microseconds
    * (what DuckDB's µs TIMESTAMP does on read) via `(ts - pmod(ts,1000))
    * div 1000` — exact integer arithmetic (ns-since-epoch exceeds a
    * double's 2^53 mantissa) with floor semantics even pre-epoch, where
    * plain `div` would truncate toward zero.
    * `nanosAsLong` is a session conf (no per-read parquet option exists);
    * setting it is idempotent and only affects NANOS-typed columns.
    */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    // Driver layout: TIMESTAMP(NANOS), surfaced as long under the
    // legacy conf → truncate to µs. Derived dirs (ScaleData) write a
    // plain µs TIMESTAMP that DuckDB can also read — pass it through.
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
    else
      // Driver may also write µs TIMESTAMP with isAdjustedToUTC=false,
      // which Spark reads as TIMESTAMP_NTZ — a type `unix_micros()` and
      // streaming watermarks reject. Cast to TIMESTAMP: exact under the
      // UTC session timezone Bench/Verify pin, identical to DuckDB's
      // read, and a no-op when the column is already LTZ.
      df.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

  /** Load a table projected to its modeled columns (column pruning reaches
    * the parquet scan — the Spark analog of `usecols`, common.py:189). */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = read(spark, sfDir, table)
    modeledColumns.get(table) match {
      case Some(cols) => df.select(cols.map(col): _*)
      case None => df
    }
  }
}
