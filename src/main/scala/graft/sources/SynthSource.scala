package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
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
    val partBy = opts.get("partitionBy")
    require(partBy == null || partBy == "lang",
      s"unsupported partitionBy=$partBy (only 'lang')")
    new SynthTable(
      opts.getLong("rows", 1000L),
      opts.getInt("partitions", 4),
      opts.getLong("rowsPerBatch", 1000L),
      partitionByLang = partBy == "lang")
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

class SynthTable(rows: Long, partitions: Int, rowsPerBatch: Long,
    partitionByLang: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft-synth($rows)"
  override def schema(): StructType = SynthSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions, rowsPerBatch, partitionByLang)
}

class SynthScanBuilder(rows: Long, partitions: Int, rowsPerBatch: Long,
    partitionByLang: Boolean = false)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
  private var required: StructType = SynthSource.fullSchema
  private var lo = 0L          // inclusive
  private var hi = rows        // exclusive
  private var pushed = Array.empty[org.apache.spark.sql.sources.Filter]
  private var aggTags: Option[Seq[String]] = None
  private var limitN: Option[Int] = None

  /** LIMIT pushdown: the generator's iteration space IS the row set,
    * so LIMIT n truncates the (filter-narrowed) id range — no work is
    * generated past the cutoff. COMPLETE (`isPartiallyPushed=false`):
    * the range arithmetic is exact, so Spark drops its own Limit node.
    */
  override def pushLimit(limit: Int): Boolean = { limitN = Some(limit); true }

  /** ORDER BY doc_id ASC LIMIT n pushdown: ids are generated in
    * ascending order, so the top-n IS the first n ids of the narrowed
    * range, emitted from ONE partition (complete pushdown requires the
    * scan itself to honor the order — a multi-partition scan's global
    * concatenation order is not guaranteed). Spark drops BOTH the Sort
    * and the Limit: at 100 TB this is the "ORDER BY key LIMIT k over a
    * key-sorted layout" shortcut every lakehouse format chases. Any
    * other sort shape is declined and planned normally. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val ok = orders.length == 1 && (orders(0).expression() match {
      case f: NamedReference =>
        f.fieldNames.length == 1 && f.fieldNames()(0) == "doc_id" &&
          orders(0).direction() == SortDirection.ASCENDING
      case _ => false
    })
    if (ok) limitN = Some(limit)
    ok
  }

  override def isPartiallyPushed(): Boolean = false

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

  /** Aggregate pushdown, the last leg of the pushdown story (columns,
    * filters, limits are above): COUNT(*), MIN(doc_id), MAX(doc_id)
    * over the (already filter-narrowed) id range are CLOSED FORM for a
    * generative source — count = hi − lo, min = lo, max = hi − 1 — so
    * the "scan" emits one precomputed row and zero generator work runs.
    * The 100 TB analog: a source that answers aggregates from catalog
    * stats / file footers instead of data (what parquet footer counts
    * and Iceberg/Delta manifests enable); DSv2 gives it a first-class
    * seat via `SupportsPushDownAggregates`. Complete pushdown (Spark
    * plans no aggregate at all) — only claimed for the ungrouped,
    * fully-closed-form shapes; anything else is declined and Spark
    * aggregates the generated rows as usual. Spark only attempts this
    * when every filter was consumed by `pushFilters`, so `lo`/`hi`
    * already reflect the full predicate set.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = tagsFor(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    tagsFor(agg) match {
      case some @ Some(_) => aggTags = some; true
      case None => false
    }

  private def tagsFor(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[String]] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    def isDocId(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case f: NamedReference =>
          f.fieldNames.length == 1 && f.fieldNames()(0) == "doc_id"
        case _ => false
      }
    if (agg.groupByExpressions.nonEmpty) None
    else {
      val tags = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        case m: Min if isDocId(m.column) => Some("min")
        case m: Max if isDocId(m.column) => Some("max")
        case _ => None
      }
      if (tags.forall(_.isDefined)) Some(tags.flatten) else None
    }
  }

  override def build(): Scan = aggTags match {
    case Some(tags) => new SynthAggScan(math.min(lo, hi), hi, tags)
    case None if limitN.isDefined =>
      // Truncated range from ONE partition: ascending-id emission is
      // the pushed ORDER, and n rows never justify task fan-out.
      val l = math.min(lo, hi)
      new SynthScan(l, math.min(hi, l + limitN.get), 1, rowsPerBatch,
        required)
    case None if partitionByLang =>
      new SynthLangScan(math.min(lo, hi), hi, required)
    case None =>
      new SynthScan(math.min(lo, hi), hi, partitions, rowsPerBatch, required)
  }
}

/** Key-grouped read: one input partition per `lang` value, each
  * carrying its key (`HasPartitionKey`) and the whole scan reporting
  * `KeyGroupedPartitioning(identity(lang))` — the DSv2 contract behind
  * storage-partitioned execution (SPARK-37375), the same one Iceberg/
  * Delta bucket layouts use. With
  * `spark.sql.sources.v2.bucketing.enabled`, a `groupBy(lang)`
  * aggregates with NO shuffle and a lang⋈lang join of two such scans
  * is exchange-free on both sides — at 100 TB this is the "the storage
  * layout IS the exchange" move: pay partitioning once at ingest, skip
  * it in every query after.
  *
  * Each partition generates the full id range and emits only its
  * lang's subsequence — the honest cost model of any key-partitioned
  * external system (a Kafka topic, a sharded table): selectivity at
  * the source, clustering for free downstream. */
class SynthLangScan(from: Long, until: Long, required: StructType)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth key-grouped by lang over [$from, $until)"

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning
      .KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .identity("lang")),
        SynthSource.langs.length)

  override def planInputPartitions(): Array[InputPartition] =
    SynthSource.langs.indices
      .map(i => SynthLangPartition(i, from, until))
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthLangReaderFactory(required)
}

case class SynthLangPartition(langIdx: Int, start: Long, end: Long)
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(SynthSource.langs(langIdx)))
}

class SynthLangReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lp = p.asInstanceOf[SynthLangPartition]
    val inner = new SynthReaderFactory(required)
      .createReader(SynthPartition(lp.start, lp.end))
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      // the generator position is tracked here, in lockstep with the
      // inner reader (one id per inner.next()), because membership is
      // a function of the id and the pruned schema may not carry it
      private var id = lp.start - 1
      override def next(): Boolean = {
        while (inner.next()) {
          id += 1
          cur = inner.get()
          if ((SynthSource.mix(id) % 4).toInt == lp.langIdx) return true
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = inner.close()
    }
  }
}

/** One-row scan answering a completely-pushed-down aggregation over the
  * id range [from, until) in closed form. Empty range: count 0, null
  * min/max (SQL aggregate semantics on empty input). */
class SynthAggScan(from: Long, until: Long, tags: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(tags.zipWithIndex.map {
    case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth pushed aggregates [${tags.mkString(", ")}] over [$from, $until)"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthPartition(0L, 1L))

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthAggReaderFactory(from, until, tags)
}

class SynthAggReaderFactory(from: Long, until: Long, tags: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else {
        emitted = true; true
      }
      override def get(): InternalRow = {
        val n = until - from
        val vals: Seq[Any] = tags.map {
          case "count" => n
          case "min" => if (n > 0) from else null
          case "max" => if (n > 0) until - 1 else null
        }
        InternalRow.fromSeq(vals)
      }
      override def close(): Unit = ()
    }
}

class SynthScan(from: Long, until: Long, partitions: Int, rowsPerBatch: Long,
    required: StructType) extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeV2Filtering
    with SupportsReportOrdering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The generator emits doc_id strictly ascending within every input
    * partition (ranges and runtime-filtered runs alike), and saying so
    * lets the planner ELIDE sorts that are already satisfied — the
    * parquet-sorted-files / Iceberg sorted-layout contract. Only
    * reported when the pruned schema still carries doc_id. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (required.fieldNames.contains("doc_id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        org.apache.spark.sql.connector.expressions.Expressions
          .column("doc_id"),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
    else Array.empty

  // Runtime-filtered state. Spark narrows it on the DRIVER at
  // execution time (BatchScanExec.filteredPartitions calls filter()
  // then re-plans input partitions), after the static [from, until)
  // range was already fixed by compile-time filter pushdown. `rtIds`
  // keeps the exact observed join keys (sorted) so partition planning
  // covers only matched ids even when they're scattered across the
  // range; the [rtFrom, rtUntil) envelope is both a fast path and the
  // fallback when the key set is too large to plan per-run.
  private var rtFrom = from
  private var rtUntil = until
  private var rtIds: Option[Array[Long]] = None
  private[sources] def currentRange: (Long, Long) = (rtFrom, rtUntil)
  private[sources] def currentCoverage: Long =
    rtIds.map(_.length.toLong).getOrElse(math.max(0L, rtUntil - rtFrom))

  /** Honest post-pushdown statistics. Without this, a DSv2 scan falls
    * back to `spark.sql.defaultSizeInBytes` (Long.MaxValue) and can
    * NEVER be chosen as a broadcast side — the planner is flying blind.
    * With it, join strategy (broadcast vs shuffle) and DPP's
    * cost-benefit heuristic key off the filter-narrowed range, exactly
    * the role parquet footers / catalog stats play at 100 TB. Reported
    * size is rows × the pruned row width, so column pruning shrinks the
    * estimate too. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, rtUntil - rtFrom)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * SynthScan.rowBytes(required))

    /** Closed-form per-column stats (distinct counts, min/max, null
      * counts) — with CBO on, Catalyst's selectivity and join-reorder
      * estimates run off these instead of guessing, the role ANALYZE
      * TABLE output plays for warehouse tables. All exact for the
      * generator except n_tokens' min/max, which report the codomain
      * bounds (a legal over-approximation for an estimate). */
    override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      import org.apache.spark.sql.connector.expressions.Expressions
      import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
      import java.util.{Optional, OptionalLong}
      def stat(distinct: Long, mn: Option[Any], mx: Option[Any],
          len: Long): ColumnStatistics = new ColumnStatistics {
        override def distinctCount(): OptionalLong = OptionalLong.of(distinct)
        override def min(): Optional[Object] =
          mn.fold(Optional.empty[Object]())(v =>
            Optional.of(v.asInstanceOf[Object]))
        override def max(): Optional[Object] =
          mx.fold(Optional.empty[Object]())(v =>
            Optional.of(v.asInstanceOf[Object]))
        override def nullCount(): OptionalLong = OptionalLong.of(0L)
        override def avgLen(): OptionalLong = OptionalLong.of(len)
        override def maxLen(): OptionalLong = OptionalLong.of(len)
      }
      val m = new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        ColumnStatistics]()
      required.fieldNames.foreach {
        case "doc_id" => m.put(Expressions.column("doc_id"),
          stat(n, Some(rtFrom).filter(_ => n > 0),
            Some(rtUntil - 1).filter(_ => n > 0), 8))
        case "lang" => m.put(Expressions.column("lang"),
          stat(math.min(n, SynthSource.langs.length.toLong), None, None, 2))
        case "source" => m.put(Expressions.column("source"),
          stat(math.min(n, 5L), None, None, 4))
        case "n_tokens" => m.put(Expressions.column("n_tokens"),
          stat(math.min(n, 501L), Some(0).filter(_ => n > 0),
            Some(500).filter(_ => n > 0), 4))
        case _ => ()
      }
      m
    }
  }

  /** Runtime (join-time) filtering — the DSv2 analog of dynamic
    * partition pruning: when this scan sits under a join whose other
    * side is small and selective, Spark evaluates the build side
    * FIRST, translates the observed join keys into an IN predicate,
    * and hands it here before input partitions are planned. We fold
    * the keys' [min, max] envelope into the generated range — work is
    * eliminated at task-planning time, not filtered after generation.
    * (An envelope, not the exact set, because the reader generates
    * contiguous ranges; the join above re-applies the exact predicate,
    * and runtime filters are best-effort by contract.) */
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("doc_id"))

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit =
    predicates.foreach { p =>
      val kids = p.children()
      val onDocId = kids.nonEmpty && (kids(0) match {
        case f: NamedReference =>
          f.fieldNames.length == 1 && f.fieldNames()(0) == "doc_id"
        case _ => false
      })
      if (p.name() == "IN" && onDocId) {
        val ids = kids.drop(1).toSeq.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
            l.value() match {
              case x: java.lang.Long => x.longValue()
              case x: java.lang.Integer => x.longValue()
            }
        }
        if (ids.isEmpty) { rtUntil = rtFrom; rtIds = Some(Array.empty) }
        else {
          rtFrom = math.max(rtFrom, ids.min)
          rtUntil = math.min(rtUntil, ids.max + 1L)
          val inRange = ids.distinct.sorted
            .filter(i => i >= rtFrom && i < rtUntil).toArray
          rtIds = Some(rtIds.fold(inRange)(prev =>
            prev.toSet.intersect(inRange.toSet).toArray.sorted))
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] = rtIds match {
    // Exact-key planning: contiguous id runs become input partitions,
    // so only matched rows are ever generated — the scattered-key case
    // an envelope can't prune (point-lookup scheduling, like file
    // skipping off a Bloom sidecar). Keys arriving here are already
    // bounded by Spark's in-subquery broadcast threshold; past a task
    // overhead cap we fall back to the envelope, which the join above
    // re-filters.
    case Some(ids) if ids.length <= 64 * math.max(1, partitions) =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[SynthPartition]
      var i = 0
      while (i < ids.length) {
        var j = i
        while (j + 1 < ids.length && ids(j + 1) == ids(j) + 1) j += 1
        runs += SynthPartition(ids(i), ids(j) + 1)
        i = j + 1
      }
      runs.toArray[InputPartition]
    case _ =>
      SynthScan.splitRange(rtFrom, math.max(rtFrom, rtUntil), partitions)
  }

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
  /** Estimated in-memory bytes per generated row for the pruned schema:
    * 8 per fixed-width column, 16 per string — deliberately simple; the
    * planner needs the right order of magnitude, not precision. */
  def rowBytes(schema: StructType): Long =
    math.max(8L, schema.fields.map {
      case f if f.dataType == StringType => 16L
      case _ => 8L
    }.sum)

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
