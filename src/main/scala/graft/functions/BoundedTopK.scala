package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_top_k(score, id, k)` — exact per-group top-k as a native
  * `TypedImperativeAggregate` with a bounded buffer, replacing the
  * window formulation `row_number() OVER (PARTITION BY g ORDER BY score
  * DESC) <= k`.
  *
  * Why this exists at 100 TB: the window plan shuffles EVERY input row
  * to its group's partition and fully sorts each partition just to keep
  * k rows; a skewed group (one giant partition) serializes on a single
  * task. This aggregate partial-aggregates map-side — each buffer holds
  * at most k (score, id) pairs — so the shuffle carries
  * ≤ groups × k × partitions rows instead of the whole table, group
  * skew collapses at the mappers, and no sort of data-sized input ever
  * runs. Same trick the reference applies to its frequent-element scan
  * (a bounded summary crossing the exchange instead of the rows).
  *
  * Semantics are EXACT and deterministic: keep the k best by
  * (score DESC, id ASC) — ties on score are broken by the smaller id,
  * so the result set equals the window formulation's under the same
  * tie-break and is engine-portable (the DuckDB oracle for
  * `q_topk_per_group` is the window form). Null score or id: row
  * ignored (SQL aggregate convention). NaN sorts above +Inf
  * (java.lang.Double.compare), matching Spark's and DuckDB's
  * ORDER BY ... DESC treatment of NaN as largest.
  *
  * Output: array<struct<score double, id bigint>> sorted by
  * (score desc, id asc) — position+1 IS the dense rank.
  *
  * Relation to [[graft.ops.Relational.topKPerGroup]]: that operator is
  * the same bounded-heap idea expressed WITHOUT a custom aggregate
  * (mapPartitions prune, then a rank window over the pruned set) and
  * generalizes to arbitrary orderable column types; this one folds the
  * prune INTO the aggregation so there is no second pass and no window
  * at all — the preferred form when (double, bigint) fits the schema.
  *
  * Buffer is two parallel arrays + an index of the current worst entry;
  * an admitted row overwrites the worst in O(1) and re-scans for the
  * new worst in O(k). Merge feeds the other buffer's entries through
  * the same bounded insert — associative and commutative, so any merge
  * tree yields the same set (asserted across partition layouts in
  * OpsSpec).
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Buffer] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (s, i) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${BoundedTopK.name} needs (double, bigint), got ($s, $i)")
    }

  override def createAggregationBuffer(): BoundedTopK.Buffer =
    new BoundedTopK.Buffer(k)

  override def update(buf: BoundedTopK.Buffer,
      input: InternalRow): BoundedTopK.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: BoundedTopK.Buffer,
      other: BoundedTopK.Buffer): BoundedTopK.Buffer = {
    var j = 0
    while (j < other.size) {
      buf.offer(other.scores(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: BoundedTopK.Buffer): Any = {
    val idx = Array.range(0, buf.size)
    val sorted = idx.sortWith { (a, b) =>
      val c = java.lang.Double.compare(buf.scores(b), buf.scores(a))
      c < 0 || (c == 0 && buf.ids(a) < buf.ids(b))
    }
    new GenericArrayData(sorted.map(j => InternalRow(buf.scores(j), buf.ids(j))))
  }

  override def serialize(buf: BoundedTopK.Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) {
      bb.putDouble(buf.scores(j))
      bb.putLong(buf.ids(j))
      j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.Buffer(k)
    var j = 0
    while (j < n) {
      buf.offer(bb.getDouble, bb.getLong)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = BoundedTopK.name
}

object BoundedTopK {
  val name = "graft_top_k"

  /** Bounded top-k working state: parallel (score, id) arrays capped at
    * k entries, plus the index of the current WORST kept entry so a
    * non-admitting row costs one comparison. */
  final class Buffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0
    private var worst = -1 // index of the worst kept entry, -1 if empty

    /** (s1, i1) strictly better than (s2, i2) under (score DESC, id ASC). */
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def offer(s: Double, i: Long): Unit = {
      if (size < k) {
        scores(size) = s
        ids(size) = i
        if (worst < 0 || better(scores(worst), ids(worst), s, i)) worst = size
        size += 1
      } else if (better(s, i, scores(worst), ids(worst))) {
        scores(worst) = s
        ids(worst) = i
        var w = 0
        var j = 1
        while (j < size) {
          if (better(scores(w), ids(w), scores(j), ids(j))) w = j
          j += 1
        }
        worst = w
      }
    }
  }

  /** Idempotently register so `expr("graft_top_k(score, id, k)")`
    * resolves (same idiom as [[MisraGriesTopK.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[BoundedTopK].getName, name),
        { exprs: Seq[Expression] =>
          require(exprs.length == 3,
            s"$name(score, id, k) takes 3 arguments, got ${exprs.length}")
          val k = exprs(2) match {
            case Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"$name k must be an integer literal, got $other")
          }
          BoundedTopK(exprs(0), exprs(1), k).toAggregateExpression()
        })
    }
  }
}
