package graft.query

import graft.core.{ColumnMeta, TableMeta}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 5-operator predicate vocabulary (estimators.py:20-26). */
sealed abstract class Op(val sym: String) {
  def eval[T](ord: Ordering[T])(x: T, v: T): Boolean = this match {
    case Op.Eq => ord.equiv(x, v)
    case Op.Lt => ord.lt(x, v)
    case Op.Gt => ord.gt(x, v)
    case Op.Leq => ord.lteq(x, v)
    case Op.Geq => ord.gteq(x, v)
  }
}
object Op {
  case object Eq extends Op("=")
  case object Lt extends Op("<")
  case object Gt extends Op(">")
  case object Leq extends Op("<=")
  case object Geq extends Op(">=")
  val all: Seq[Op] = Seq(Eq, Lt, Gt, Leq, Geq)
  def parse(s: String): Op = all.find(_.sym == s).getOrElse(
    throw new IllegalArgumentException(s"unknown op $s"))
}

/** One conjunct of `SELECT COUNT(*) FROM T WHERE c op v AND ...`
  * (reference estimators.py:41-52: parallel (columns, operators, vals)).
  */
final case class Pred(col: String, op: Op, value: Any) {

  /** Compile to a Spark Column. Spark's null comparison semantics
    * (null op v → null → row filtered) match the reference's "null never
    * qualifies" rule (common.py:11-24) for free.
    */
  def toColumn: Column = {
    val c = org.apache.spark.sql.functions.col(col)
    val v = lit(value)
    op match {
      case Op.Eq => c === v
      case Op.Lt => c < v
      case Op.Gt => c > v
      case Op.Leq => c <= v
      case Op.Geq => c >= v
    }
  }

  /** DuckDB-compatible SQL text (the analog of QueryToPredicate,
    * estimators.py:93-111) — feeds SparkEntry.oracleSql.
    */
  def toSql: String = s"$col ${op.sym} ${Pred.sqlLiteral(value)}"

  /** Boolean mask over a column's domain (reference estimators.py:226-236):
    * `op(all_distinct_values, v)` — position 0 is false when null present.
    */
  def domainMask(meta: ColumnMeta): Array[Boolean] = {
    require(meta.name == col)
    val ord = meta.ordering
    meta.domain.map(d => d != null && op.eval(ord)(d, value))
  }
}

object Pred {
  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  def sqlLiteral(v: Any): String = v match {
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp =>
      "TIMESTAMP '" + tsFmt.format(t.toInstant) + "'"
    case d: java.sql.Date => "DATE '" + d.toString + "'"
    case other => other.toString
  }

  /** Parse a naive UTC timestamp string into the instant Spark stores. */
  def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.LocalDateTime
      .parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC))

  /** AND of all conjuncts as one Spark Column. */
  def conj(preds: Seq[Pred]): Column =
    preds.map(_.toColumn).reduce(_ && _)

  /** `WHERE ...` text for DuckDB oracles. */
  def whereSql(preds: Seq[Pred]): String =
    preds.map(_.toSql).mkString(" AND ")

  /** Reference FillInUnqueriedColumns (estimators.py:114-131): expand to
    * table column order, empty Seq = wildcard. Generalized to allow
    * multiple conjuncts on one column (mask = AND of them).
    */
  def fillWildcards(meta: TableMeta, preds: Seq[Pred]): Seq[Seq[Pred]] = {
    val byCol = preds.groupBy(_.col)
    meta.columns.map(c => byCol.getOrElse(c.name, Nil))
  }
}
