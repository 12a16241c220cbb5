package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_capped_collect_set(id, cap)` — a size-capped distinct-collect
  * over an integral column, as a native `TypedImperativeAggregate`.
  *
  * Semantics: groups with at most `cap` distinct values evaluate to the
  * SORTED distinct array; groups with MORE than `cap` distinct values
  * evaluate to NULL. The aggregation buffer never holds more than
  * `cap + 1` elements — once over-cap is certain the buffer stops
  * growing, so a hot key (a boilerplate shingle shared by millions of
  * documents) costs O(cap) memory on its reducer instead of O(group).
  *
  * This is the aggregate a DF-capped dedup posting-list build needs
  * (ops/Dedup.scala): the built-in `collect_set` + `size(...) <= cap`
  * filter has the right SEMANTICS but buffers the entire hot group
  * before the filter can drop it, and a count-prepass + anti-join keeps
  * buffers bounded but pays an extra full shuffle (measured +3 s at
  * sf0.1 from the added stages alone). No built-in expresses
  * "collect-unless-too-many", hence the custom Expression — the
  * preference order the project follows (compose built-ins, else a
  * native Catalyst expression, else mapPartitions).
  */
case class CappedCollectSetLong(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]] {

  require(cap >= 0, s"cap must be >= 0, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_capped_collect_set needs an integral column, got $other")
    }

  override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
    new java.util.HashSet[java.lang.Long]()

  private def asLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  override def update(buf: java.util.HashSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.HashSet[java.lang.Long] = {
    // size == cap + 1 marks a certainly-over-cap group; stop growing.
    if (buf.size <= cap) {
      val v = child.eval(input)
      if (v != null) buf.add(asLong(v))
    }
    buf
  }

  override def merge(buf: java.util.HashSet[java.lang.Long],
      other: java.util.HashSet[java.lang.Long])
      : java.util.HashSet[java.lang.Long] = {
    // |buf ∪ other| >= |other|, so if either side overflowed the merged
    // buffer reaches cap + 1 and stops there.
    val it = other.iterator()
    while (it.hasNext && buf.size <= cap) buf.add(it.next())
    buf
  }

  override def eval(buf: java.util.HashSet[java.lang.Long]): Any =
    if (buf.size > cap) null
    else {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buf: java.util.HashSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashSet[java.lang.Long](Integer.highestOneBit(n) * 2 + 8)
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectSetLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectSetLong =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = CappedCollectSetLong.name
}

object CappedCollectSetLong {
  val name = "graft_capped_collect_set"

  /** Idempotently register the aggregate in the session's function
    * registry so `expr("graft_capped_collect_set(c, k)")` resolves. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id)) {
      registry.registerFunction(
        id,
        new ExpressionInfo(classOf[CappedCollectSetLong].getName, name),
        (children: Seq[Expression]) => {
          require(children.length == 2, s"$name(column, cap) takes 2 args")
          val cap = children(1) match {
            case Literal(v: Int, IntegerType) => v
            case other => throw new IllegalArgumentException(
              s"$name cap must be an integer literal, got $other")
          }
          CappedCollectSetLong(children.head, cap).toAggregateExpression()
        })
    }
  }
}
