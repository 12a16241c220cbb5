package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-synth` — a DataSource V2 batch source generating a
  * deterministic synthetic corpus-metadata table, no files involved:
  *
  * {{{
  *   spark.read.format("graft-synth")
  *     .option("rows", 100000).option("partitions", 8).load()
  * }}}
  *
  * Schema: (doc_id bigint, lang string, source string, n_tokens int),
  * every field a pure function of doc_id via a Lehmer step
  * (`x = doc_id * 48271 mod 2^31-1`) — portable integer arithmetic, so
  * a DuckDB `generate_series` twin reproduces it EXACTLY and the source
  * is oracle-checked end-to-end (`q_synth_source`), unlike
  * `spark.range` twins which stop at the ids.
  *
  * Why a custom source and not `spark.range(...).select(...)`: this is
  * the load-generator / external-system shape — demonstrating the
  * connector surface the engine offers at 100 TB: the row range splits
  * into `partitions` independent `InputPartition`s (parallel, no
  * driver-side data), and column pruning is pushed INTO the reader
  * (`SupportsPushDownRequiredColumns` — a `select(lang)` never computes
  * the other fields; the plan's ReadSchema shows the pruned struct).
  */
class SynthSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DSv2's option contract is case-insensitive; the raw properties
    // map is not — wrap it so .option("ROWS", ...) doesn't silently
    // fall back to the default.
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerBatch", 1000L))
  }
}

object SynthSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  val langs: Array[String] = Array("en", "de", "fr", "es")

  /** The shared generator step — mirrored verbatim in the DuckDB twin. */
  def mix(docId: Long): Long = (docId * 48271L) % 2147483647L

  /** DuckDB twin of a full `graft-synth` read with `rows` rows. */
  def synthSql(rows: Long): String =
    s"""SELECT i AS doc_id,
  CASE ((i * 48271) % 2147483647) % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
       WHEN 2 THEN 'fr' ELSE 'es' END AS lang,
  'src' || CAST(((i * 48271) % 2147483647) % 5 AS VARCHAR) AS source,
  CAST(((i * 48271) % 2147483647) % 501 AS INTEGER) AS n_tokens
FROM generate_series(0, ${rows - 1}) s(i)"""
}

class SynthTable(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synth($rows)"
  override def schema(): StructType = SynthSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, rowsPerBatch)
}

class SynthScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = SynthSource.fullSchema
  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[org.apache.spark.sql.sources.Filter]

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** doc_id range predicates narrow the GENERATED range — pushdown here
    * doesn't just skip I/O, it removes the work entirely (the ids are
    * the iteration space). Everything else stays a post-scan filter. */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources._
    // Long.MaxValue bounds are rejected (left to Spark's post-scan
    // filter) rather than accepted: the half-open conversion's `v + 1`
    // would overflow and, because accepted filters are CONSUMED, the
    // wrong bound would be the only filtering that ever happens.
    val (accepted, rejected) = filters.partition {
      case EqualTo("doc_id", v: java.lang.Long) => v < Long.MaxValue
      case GreaterThan("doc_id", v: java.lang.Long) => v < Long.MaxValue
      case GreaterThanOrEqual("doc_id", _: java.lang.Long) => true
      case LessThan("doc_id", _: java.lang.Long) => true
      case LessThanOrEqual("doc_id", v: java.lang.Long) => v < Long.MaxValue
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case GreaterThan(_, v: java.lang.Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = math.max(lo, v.longValue())
      case LessThan(_, v: java.lang.Long) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual(_, v: java.lang.Long) => hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed

  override def build(): Scan =
    new SynthScan(math.min(lo, hi), hi, partitions, rowsPerBatch, required)
}

class SynthScan(from: Long, until: Long, partitions: Int, rowsPerBatch: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    SynthScan.splitRange(from, until, partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  /** Streaming twin of the batch read: the same generator advances an
    * Offset of `rowsPerBatch` row indices per trigger until `rows` is
    * reached — each micro-batch plans the SAME InputPartition/reader
    * machinery over its index range, so batch and streaming reads of
    * equal ranges are row-identical (asserted in SynthSourceSpec). */
  override def toMicroBatchStream(checkpointLocation: String)
      : streaming.MicroBatchStream =
    new SynthMicroBatchStream(from, until, partitions, rowsPerBatch, required)
}

object SynthScan {
  def splitRange(from: Long, until: Long, parts: Int): Array[InputPartition] = {
    val n = until - from
    val per = math.max(1L, (n + parts - 1) / parts)
    (from until until by per)
      .map(s => SynthPartition(s, math.min(s + per, until)))
      .toArray[InputPartition]
  }
}

case class SynthOffset(index: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = index.toString
}

class SynthMicroBatchStream(from: Long, until: Long, partitions: Int,
    rowsPerBatch: Long, required: StructType)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl {

  private def idx(o: streaming.Offset): Long = o match {
    case SynthOffset(i) => i
    case other => other.json.toLong // SerializedOffset from the log
  }

  override def initialOffset(): streaming.Offset = SynthOffset(from)

  // STATELESS offset advance via SupportsAdmissionControl: the engine
  // hands us the last committed offset, so a restarted instance
  // continues exactly where the checkpoint ends. (The no-arg
  // latestOffset() poll-counter formulation is restart-UNSAFE: the
  // engine's first poll happens before any deserializeOffset call, a
  // fresh instance answers below the checkpoint, and the offset log
  // runs backwards — committed rows then re-emit. Caught by the
  // restart spec; the probe showed offsets 900 -> 400 -> 900.)
  override def getDefaultReadLimit: streaming.ReadLimit =
    streaming.ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    val step = limit match {
      case m: streaming.ReadMaxRows => m.maxRows()
      // Trigger.AvailableNow asks for everything that exists right now.
      case _: streaming.ReadAllAvailable => until - idx(start)
      case _ => rowsPerBatch
    }
    SynthOffset(math.min(until, idx(start) + step))
  }

  override def latestOffset(): streaming.Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl.latestOffset(start, limit) is used")

  // Trigger.AvailableNow snapshots this before the run to decide when
  // the stream has drained; the default null would read as "no data"
  // and terminate the wrapper without emitting a single batch.
  override def reportLatestOffset(): streaming.Offset = SynthOffset(until)

  override def deserializeOffset(json: String): streaming.Offset =
    SynthOffset(json.toLong)

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] =
    SynthScan.splitRange(idx(start), idx(end), partitions)

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {

  /** Vectorized read path: the generator fills `OnHeapColumnVector`s in
    * 4K-row batches — the same columnar hand-off the built-in parquet
    * reader uses, so the scan feeds ColumnarToRow/whole-stage codegen
    * without per-row object churn. The row-based createReader stays as
    * the contract fallback; SynthSourceSpec asserts both paths emit
    * identical rows and that the plan actually goes columnar.
    */
  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
    val sp = p.asInstanceOf[SynthPartition]
    val batchSize = 4096
    new PartitionReader[ColumnarBatch] {
      private var pos = sp.start
      // Vectors and batch are allocated ONCE and reset per fill (the
      // parquet reader's reuse pattern); the 4 lang / 5 source values
      // are pre-encoded so the hot loop does no String/byte[] churn.
      private val vectors =
        OnHeapColumnVector.allocateColumns(batchSize, required)
      private val batch =
        new ColumnarBatch(vectors.asInstanceOf[Array[ColumnVector]])
      private val langBytes = SynthSource.langs.map(_.getBytes("UTF-8"))
      private val srcBytes =
        (0 until 5).map(i => s"src$i".getBytes("UTF-8")).toArray

      override def next(): Boolean = {
        if (pos >= sp.end) false
        else {
          val n = math.min(batchSize.toLong, sp.end - pos).toInt
          var f = 0
          while (f < required.fields.length) {
            val v = vectors(f)
            v.reset()
            required.fields(f).name match {
              case "doc_id" =>
                var i = 0
                while (i < n) { v.putLong(i, pos + i); i += 1 }
              case "lang" =>
                var i = 0
                while (i < n) {
                  val b = langBytes((SynthSource.mix(pos + i) % 4).toInt)
                  v.putByteArray(i, b, 0, b.length); i += 1
                }
              case "source" =>
                var i = 0
                while (i < n) {
                  val b = srcBytes((SynthSource.mix(pos + i) % 5).toInt)
                  v.putByteArray(i, b, 0, b.length); i += 1
                }
              case "n_tokens" =>
                var i = 0
                while (i < n) {
                  v.putInt(i, (SynthSource.mix(pos + i) % 501).toInt); i += 1
                }
              case other => throw new IllegalArgumentException(
                s"unknown column $other")
            }
            f += 1
          }
          batch.setNumRows(n)
          pos += n
          true
        }
      }

      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    // Resolve the pruned projection ONCE per partition: the reader
    // computes only the requested fields, in the requested order.
    val fieldGen: Array[Long => Any] = required.fields.map { f =>
      f.name match {
        case "doc_id" => (i: Long) => i
        case "lang" => (i: Long) =>
          UTF8String.fromString(
            SynthSource.langs((SynthSource.mix(i) % 4).toInt)
)
        case "source" => (i: Long) =>
          UTF8String.fromString("src" + (SynthSource.mix(i) % 5))
        case "n_tokens" => (i: Long) => (SynthSource.mix(i) % 501).toInt
        case other => throw new IllegalArgumentException(
          s"unknown column $other")
      }
    }
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fieldGen.map(g => g(i)).toSeq)
      override def close(): Unit = ()
    }
  }
}
