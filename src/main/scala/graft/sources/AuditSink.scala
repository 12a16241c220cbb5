package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `graft-audit` — a DataSource V2 batch SINK exercising the two-phase
  * commit protocol: each task writer folds its partition into a
  * (rowCount, xor-of-row-hashes) `WriterCommitMessage`; the driver's
  * `commit()` aggregates the messages into a named audit result. Until
  * commit, nothing is visible — aborted/speculative tasks discard their
  * messages, which is exactly the exactly-once contract a real sink
  * (file commit protocol, transactional table) builds on.
  *
  * The checksum is a wrapping SUM of per-row Murmur3 hashes:
  * commutative, so it is independent of partitioning and row order —
  * two writes of the same data through any plan agree (asserted in
  * SynthSourceSpec). Addition (not XOR) on purpose: an XOR fold
  * cancels any row appearing an even number of times, so two datasets
  * differing by duplicate-pair multiplicity would collide; the sum is
  * multiplicity-sensitive.
  *
  * Deployment scope: the committed result lands in a driver-JVM
  * singleton map — correct for local mode and for this repo's oracle
  * gate, but a REAL deployment of this protocol would commit the
  * aggregated message to durable coordination state (a metastore
  * table, a transaction log, a commit service) in `commit()`, not a
  * process-local map. The task-message/visible-only-on-commit protocol
  * is the part that carries over unchanged.
  *
  * {{{
  *   df.write.format("graft-audit").option("id", "run1")
  *     .mode("append").save()
  *   val (rows, checksum) = AuditSink.result("run1").get
  * }}}
  */
class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-audit"

  // The sink accepts whatever schema the query writes: with
  // supportsExternalMetadata, Spark hands the written query's schema
  // to getTable instead of validating against inferSchema's.
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema, properties.getOrDefault("id", "default"))
}

object AuditSink {
  private val results = new ConcurrentHashMap[String, (Long, Long)]()

  def result(id: String): Option[(Long, Long)] = Option(results.get(id))
  def clear(id: String): Unit = results.remove(id)
  private[sources] def put(id: String, rows: Long, checksum: Long): Unit =
    results.put(id, (rows, checksum))
}

class AuditTable(writeSchema: StructType, id: String)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-audit($id)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // The sink is stateless between writes (commit overwrites the
      // audit slot), so truncate-then-write IS a plain write — but the
      // interface must say so or overwrite mode fails at write
      // planning despite the TRUNCATE capability.
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(id, info.schema())
      }
    }
}

case class AuditMessage(rows: Long, checksum: Long) extends WriterCommitMessage

class AuditBatchWrite(id: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    var rows = 0L
    var checksum = 0L
    messages.foreach { case AuditMessage(r, c) => rows += r; checksum += c }
    AuditSink.put(id, rows, checksum)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class AuditWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var checksum = 0L
      // Row hash via the unsafe row's bytes — schema-agnostic and
      // stable; sum-folded (wrapping) so the total is order/partition-
      // invariant yet still sensitive to row multiplicity (XOR would
      // cancel even-count duplicates).
      private val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(schema)

      override def write(record: InternalRow): Unit = {
        val u = toUnsafe(record)
        checksum += org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
            u.getSizeInBytes, 42).toLong
        rows += 1
      }

      override def commit(): WriterCommitMessage = AuditMessage(rows, checksum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
