package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Builds per-column sorted dictionaries ("domains") and dictionary-encodes
  * rows — the reference's data layer (common.py:67-85, 273-312) re-expressed
  * as DataFrame transforms.
  *
  * Distributed shape: the domain build is a shuffle aggregation
  * (`distinct` → sort), and only the bounded vocab is collected; encoding is
  * a broadcast hash join per column (codegen'd, no shuffle of the fact
  * table). At 100 TB the same plan holds as long as domains stay
  * dictionary-sized; `maxDomainSize` guards against accidentally
  * dictionary-encoding a high-cardinality column.
  */
object Dictionary {

  /** Reference `Column.SetDistribution` (common.py:67-85): distinct values,
    * sorted ascending, null first. One job per column; columns are fetched
    * in a single pass each (Catalyst prunes the scan to the one column).
    */
  def columnMeta(df: DataFrame, colName: String,
      maxDomainSize: Int = 1 << 22): ColumnMeta = {
    val field = df.schema(colName)
    val rows = df.select(col(colName)).distinct()
      .orderBy(col(colName).asc_nulls_first)
      .limit(maxDomainSize + 1)
      .collect()
    require(rows.length <= maxDomainSize,
      s"domain of $colName exceeds $maxDomainSize; not dictionary-encodable")
    val domain = rows.map(_.get(0))
    val hasNull = domain.nonEmpty && domain(0) == null
    ColumnMeta(colName, field.dataType, domain, hasNull)
  }

  /** Build TableMeta for the given columns (defaults to all) in ONE pass:
    * a single aggregation computes `count(*)` plus per-column
    * `collect_set` + null flags, so the fact table is scanned once (with
    * map-side partial aggregation) instead of ncols+1 times. Sorting the
    * bounded domains happens on the driver. `maxDomainSize` guards
    * against dictionary-encoding a high-cardinality column — at 100 TB a
    * blown domain must fail fast, not OOM the driver.
    */
  def tableMeta(df: DataFrame, name: String, cols: Seq[String] = Nil,
      maxDomainSize: Int = 1 << 22): TableMeta = {
    val wanted = if (cols.isEmpty) df.schema.fieldNames.toSeq else cols
    val aggs = wanted.flatMap { c =>
      Seq(collect_set(col(c)).as(s"__dom_$c"),
        max(when(col(c).isNull, 1).otherwise(0)).as(s"__null_$c"))
    } :+ count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val cardinality = row.getAs[Long]("__n")
    val metas = wanted.map { c =>
      val dt = df.schema(c).dataType
      val distinct = row.getAs[scala.collection.Seq[Any]](s"__dom_$c").toArray
      require(distinct.length <= maxDomainSize,
        s"domain of $c exceeds $maxDomainSize; not dictionary-encodable")
      val hasNull = row.getAs[Int](s"__null_$c") == 1
      val sorted = distinct.sorted(ColumnMeta.orderingFor(dt))
      val domain = if (hasNull) null +: sorted else sorted
      ColumnMeta(c, dt, domain, hasNull)
    }
    TableMeta(name, cardinality, metas)
  }

  /** Vocab as a (value, bin) DataFrame for join-based encoding. Bin ids
    * follow the reference convention (common.py:291-303): null (if present)
    * is bin 0 and non-null values are shifted by +1; otherwise bins are
    * 0..K-1 in sorted order. Equivalently:
    * `dense_rank() OVER (ORDER BY v ASC NULLS FIRST) - 1`.
    */
  def vocabDf(spark: SparkSession, meta: ColumnMeta): DataFrame = {
    // The full domain INCLUDING the null slot (bin 0 when present), so
    // the vocab row count equals distributionSize and matches a DuckDB
    // `dense_rank() ... NULLS FIRST - 1` over DISTINCT values exactly.
    val rows = meta.domain.zipWithIndex.map { case (v, i) => Row(v, i) }
    val schema = StructType(Seq(
      StructField("value", meta.dataType, nullable = meta.hasNull),
      StructField("bin", IntegerType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Reference `Discretize` (common.py:273-312): append `<c>_bin` int
    * columns for each meta via broadcast joins against the vocabs. Null →
    * bin 0. The fact table is never shuffled; each join is a broadcast
    * hash join inside one whole-stage-codegen pipeline.
    */
  def discretize(df: DataFrame, metas: Seq[ColumnMeta]): DataFrame =
    metas.foldLeft(df) { (acc, m) =>
      val vocab = vocabDf(df.sparkSession, m)
        .withColumnRenamed("value", s"__v_${m.name}")
        .withColumnRenamed("bin", s"${m.name}_bin")
      val joined = acc.join(broadcast(vocab),
        acc(m.name) === vocab(s"__v_${m.name}"), "left")
        .drop(s"__v_${m.name}")
      if (m.hasNull)
        joined.withColumn(s"${m.name}_bin",
          coalesce(col(s"${m.name}_bin"), lit(0)))
      else joined
    }

  /** The training matrix (reference TableDataset, common.py:237-270): one
    * int array column of bin ids per row, in meta column order.
    */
  def encodedMatrix(df: DataFrame, metas: Seq[ColumnMeta]): DataFrame =
    discretize(df, metas)
      .select(array(metas.map(m => col(s"${m.name}_bin")): _*).as("bins"))
}
