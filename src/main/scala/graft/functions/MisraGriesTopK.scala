package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_heavy_hitters(term, k)` — Misra–Gries frequent-elements
  * sketch as a native `TypedImperativeAggregate`: the top-terms scan
  * that works at 100 TB, where `groupBy(term).count` would shuffle a
  * row per distinct term (an open-web token vocabulary) just to read
  * off the head.
  *
  * State is AT MOST k counters per aggregation buffer — constant
  * memory, partial-aggregated map-side, and the only shuffled bytes are
  * the k-entry summaries. The classic guarantees (Misra & Gries 1982;
  * merge rule per Agarwal et al., "Mergeable Summaries", PODS'12):
  *
  *  - every term with true count > N/(k+1) is IN the result,
  *  - estimates only undercount: est ≤ true ≤ est + N/(k+1),
  *
  * and both survive arbitrary merge trees (the merge sums counters,
  * then subtracts the (k+1)-th largest to shed back to k — the shed
  * mass telescopes into the same N/(k+1) bound). The surviving
  * tail-term SET depends on partitioning (the guarantee does not), so
  * the catalog entry is rows-only with the exact counts joined
  * alongside; OpsSpec asserts the guarantee itself across partition
  * layouts.
  *
  * Output: array<struct<term string, est bigint>> sorted by (est desc,
  * term asc).
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${MisraGriesTopK.name} needs a string column, got $other")
    }

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString // UTF8String may alias a reused page; copy out
      val cur = buf.get(s)
      if (cur != null) buf.put(s, cur + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else {
        // Decrement-all: cancels one occurrence of EVERY tracked term
        // against this one — the step that bounds undercounting by the
        // number of decrement rounds ≤ N/(k+1).
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long])
      : java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size > k) {
      // Shed to k: subtract the (k+1)-th largest count from everyone,
      // drop the non-positive — at most k strictly-greater survivors.
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= threshold) eit.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    scala.util.Sorting.stableSort(entries,
      (a: (String, Long), b: (String, Long)) =>
        a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long])
      : Array[Byte] = {
    // Encode each key once; this runs per buffer on the partial-agg
    // shuffle path.
    val keys = new Array[Array[Byte]](buf.size)
    val counts = new Array[Long](buf.size)
    var size = 4
    var i = 0
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      keys(i) = e.getKey.getBytes("UTF-8")
      counts(i) = e.getValue
      size += 4 + keys(i).length + 8
      i += 1
    }
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    i = 0
    while (i < keys.length) {
      bb.putInt(keys(i).length)
      bb.put(keys(i))
      bb.putLong(counts(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, java.lang.Long](n * 2 + 8)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.put(new String(arr, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = MisraGriesTopK.name
}

object MisraGriesTopK {
  val name = "graft_heavy_hitters"

  /** Idempotently register so `expr("graft_heavy_hitters(c, k)")`
    * resolves (same idiom as [[CappedCollectSetLong.ensureRegistered]]). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[MisraGriesTopK].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name(column, k) takes 2 args")
          val k = children(1) match {
            case Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"$name k must be an integer literal, got $other")
          }
          MisraGriesTopK(children.head, k).toAggregateExpression()
        })
    }
  }
}
