package graft.query

import graft.core.{ColumnMeta, TableMeta}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's 5-operator predicate vocabulary (estimators.py:20-26),
  * extended (r15) with the three shapes the domain-mask architecture
  * expresses natively but the reference never surfaced:
  *
  *   - [[Op.In]] — `col IN (v1, …, vk)`: a mask is an arbitrary boolean
  *     vector over the domain (estimators.py:226-236), so IN is just the
  *     UNION of k equality masks; the exact path is `Column.isin`.
  *   - [[Op.IsNull]] / [[Op.NotNull]] — the null-at-bin-0 domain
  *     convention (common.py:74-80) exists precisely so a mask can
  *     address the null slot: IS NULL is the position-0 mask, IS NOT
  *     NULL its complement. (The base vocabulary's "null never
  *     qualifies" rule, common.py:11-24, is about VALUE comparisons —
  *     IS NULL is the query *for* the null slot, so it is the one op
  *     whose mask is true at position 0.)
  */
sealed abstract class Op(val sym: String) {
  /** Scalar comparison for the 5 reference ops. [[Op.In]]/null tests are
    * value-set / null-slot shaped and are evaluated by [[Pred]] itself. */
  def eval[T](ord: Ordering[T])(x: T, v: T): Boolean = this match {
    case Op.Eq => ord.equiv(x, v)
    case Op.Lt => ord.lt(x, v)
    case Op.Gt => ord.gt(x, v)
    case Op.Leq => ord.lteq(x, v)
    case Op.Geq => ord.gteq(x, v)
    case other => throw new IllegalArgumentException(
      s"$other is not a scalar comparison; Pred evaluates it directly")
  }

  /** Whether this op compares the column against a single scalar value
    * (the reference's original vocabulary). */
  def isScalar: Boolean = this match {
    case Op.Eq | Op.Lt | Op.Gt | Op.Leq | Op.Geq => true
    case _ => false
  }
}
object Op {
  case object Eq extends Op("=")
  case object Lt extends Op("<")
  case object Gt extends Op(">")
  case object Leq extends Op("<=")
  case object Geq extends Op(">=")
  /** `col IN (v1, …, vk)` — Pred.value is a Seq[Any] of the k literals. */
  case object In extends Op("IN")
  /** `col NOT IN (v1, …, vk)` (r16) — the complement of the IN mask
    * MINUS the null slot: SQL three-valued logic makes `null NOT IN
    * (…)` unknown, so a null row never qualifies, same as every value
    * comparison. Pred.value is the literal Seq, like [[In]]. */
  case object NotIn extends Op("NOT IN")
  /** `col IS NULL` — Pred.value is ignored (null by convention). */
  case object IsNull extends Op("IS NULL")
  /** `col IS NOT NULL` — Pred.value is ignored (null by convention). */
  case object NotNull extends Op("IS NOT NULL")
  /** `col LIKE 'abc%'` (r17) — Pred.value is the literal PREFIX (no
    * trailing `%`). A prefix pattern is a contiguous range over the
    * sorted string domain, so the mask costs the same as a comparison;
    * non-prefix patterns stay outside the vocabulary (SqlFront and
    * PredExtract both fall through on them). Null rows never qualify
    * (`null LIKE p` is unknown), matching every value comparison. */
  case object PrefixLike extends Op("LIKE")

  /** The reference's own 5-op vocabulary (estimators.py:20-26); workload
    * generators draw from this set. */
  val all: Seq[Op] = Seq(Eq, Lt, Gt, Leq, Geq)
  /** all + the r15-r17 mask-native extensions. */
  val extended: Seq[Op] = all ++ Seq(In, NotIn, IsNull, NotNull, PrefixLike)
  def parse(s: String): Op = extended.find(_.sym == s).getOrElse(
    throw new IllegalArgumentException(s"unknown op $s"))
}

/** One conjunct of `SELECT COUNT(*) FROM T WHERE c op v AND ...`
  * (reference estimators.py:41-52: parallel (columns, operators, vals)).
  * For [[Op.In]], `value` is the literal list as a `Seq[Any]`; for the
  * null tests it is unused.
  */
final case class Pred(col: String, op: Op, value: Any) {

  private def inValues: Seq[Any] = value match {
    case s: Seq[_] => s
    case other => throw new IllegalArgumentException(
      s"IN predicate on $col needs a Seq of literals, got: $other")
  }

  /** Compile to a Spark Column. Spark's null comparison semantics
    * (null op v → null → row filtered) match the reference's "null never
    * qualifies" rule (common.py:11-24) for free; IS [NOT] NULL are the
    * explicit null-slot tests.
    */
  def toColumn: Column = {
    val c = org.apache.spark.sql.functions.col(col)
    op match {
      case Op.Eq => c === lit(value)
      case Op.Lt => c < lit(value)
      case Op.Gt => c > lit(value)
      case Op.Leq => c <= lit(value)
      case Op.Geq => c >= lit(value)
      case Op.In =>
        require(inValues.nonEmpty, s"empty IN list on $col")
        c.isin(inValues: _*)
      case Op.NotIn =>
        require(inValues.nonEmpty, s"empty NOT IN list on $col")
        // `!isin` keeps SQL's three-valued logic: a null column value
        // yields null → filtered, matching the mask's false null slot.
        !c.isin(inValues: _*)
      case Op.IsNull => c.isNull
      case Op.NotNull => c.isNotNull
      case Op.PrefixLike =>
        // startsWith, not a LIKE pattern: the stored value is the raw
        // prefix, so no metacharacter handling is needed on this side.
        c.startsWith(lit(value.asInstanceOf[String]))
    }
  }

  /** DuckDB-compatible SQL text (the analog of QueryToPredicate,
    * estimators.py:93-111) — feeds SparkEntry.oracleSql.
    */
  def toSql: String = op match {
    case Op.In =>
      require(inValues.nonEmpty, s"empty IN list on $col")
      s"$col IN (${inValues.map(Pred.sqlLiteral).mkString(", ")})"
    case Op.NotIn =>
      require(inValues.nonEmpty, s"empty NOT IN list on $col")
      s"$col NOT IN (${inValues.map(Pred.sqlLiteral).mkString(", ")})"
    case Op.IsNull => s"$col IS NULL"
    case Op.NotNull => s"$col IS NOT NULL"
    case Op.PrefixLike =>
      // Rebuild the pattern from the raw prefix, escaping any LIKE
      // metacharacters it happens to contain (they are literal chars
      // in the prefix), with an explicit ESCAPE clause only when
      // needed — both Spark and DuckDB accept the same spelling.
      val p = value.asInstanceOf[String]
      val needsEscape = p.exists(ch => ch == '%' || ch == '_' || ch == '\\')
      val escaped = p.flatMap {
        case '%' => "\\%"
        case '_' => "\\_"
        case '\\' => "\\\\"
        case ch => ch.toString
      }
      val patLit = Pred.sqlLiteral(escaped + "%")
      if (needsEscape) s"$col LIKE $patLit ESCAPE '\\'"
      else s"$col LIKE $patLit"
    case _ => s"$col ${op.sym} ${Pred.sqlLiteral(value)}"
  }

  /** Boolean mask over a column's domain (reference estimators.py:226-236):
    * `op(all_distinct_values, v)` — position 0 is false for every value
    * comparison when null is present; [[Op.IsNull]] is the one op whose
    * mask is true EXACTLY at the null slot, [[Op.NotNull]] its
    * complement.
    */
  def domainMask(meta: ColumnMeta): Array[Boolean] = {
    require(meta.name == col)
    op match {
      case Op.IsNull => meta.domain.map(_ == null)
      case Op.NotNull => meta.domain.map(_ != null)
      case Op.In =>
        val vs = inValues
        meta.domain.map(d =>
          d != null && vs.exists(v => Pred.domainEquiv(meta, d, v)))
      case Op.NotIn =>
        // Complement of the IN mask, null slot stays false (three-
        // valued logic: null NOT IN (…) is unknown → row filtered).
        val vs = inValues
        meta.domain.map(d =>
          d != null && !vs.exists(v => Pred.domainEquiv(meta, d, v)))
      case Op.PrefixLike =>
        // String prefix over the sorted domain (a contiguous range);
        // non-string domain values are incomparable → slot stays false
        // (the domainCompare None convention), null slot false.
        val p = value.asInstanceOf[String]
        meta.domain.map {
          case s: String => s.startsWith(p)
          case _ => false
        }
      case scalar =>
        meta.domain.map(d =>
          d != null && Pred.domainCompare(meta, d, value)
            .exists(c => scalar match {
              case Op.Eq => c == 0
              case Op.Lt => c < 0
              case Op.Gt => c > 0
              case Op.Leq => c <= 0
              case Op.Geq => c >= 0
              case _ => false
            }))
    }
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

  private def isNumeric(v: Any): Boolean = v match {
    case _: Byte | _: Short | _: Int | _: Long | _: Float | _: Double |
        _: java.math.BigDecimal | _: BigDecimal => true
    case _ => false
  }

  private def toBigDec(v: Any): java.math.BigDecimal = v match {
    case b: Byte => java.math.BigDecimal.valueOf(b.toLong)
    case s: Short => java.math.BigDecimal.valueOf(s.toLong)
    case i: Int => java.math.BigDecimal.valueOf(i.toLong)
    case l: Long => java.math.BigDecimal.valueOf(l)
    // exact binary expansion, so Float-vs-Double cross compares agree
    // with the engines' widen-to-double semantics
    case f: Float => new java.math.BigDecimal(f.toDouble)
    case d: Double => new java.math.BigDecimal(d)
    case b: java.math.BigDecimal => b
    case b: BigDecimal => b.bigDecimal
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private def isTemporal(v: Any): Boolean = v match {
    case _: java.sql.Timestamp | _: java.sql.Date |
        _: java.time.LocalDateTime => true
    case _ => false
  }

  /** Compare a domain value against a predicate literal, tolerating the
    * numeric-type mismatches SQL front-ends produce (an integral literal
    * against a DOUBLE column, a DECIMAL-parsed `1.0` against an INT
    * column): same-class values go through the column's engine-faithful
    * ordering; numeric cross-class pairs compare exactly in BigDecimal
    * (the widest common space — what both Spark and DuckDB's implicit
    * casts converge to for in-range values); temporal cross-class pairs
    * (µs-NTZ domains surface LocalDateTime, Pred.ts builds Timestamp)
    * through the column ordering, which normalizes both to epoch. Any
    * other cross-class pair — e.g. a string column against the integer
    * 5 out of `IN ('R', 5)` — is None = incomparable: the mask slot
    * stays false (a cast-mismatched literal can never match a domain
    * value) instead of throwing a ClassCastException deep in mask
    * evaluation. */
  def domainCompare(meta: ColumnMeta, d: Any, v: Any): Option[Int] = {
    if (d != null && v != null && d.getClass == v.getClass)
      Some(meta.ordering.compare(d, v))
    else if (isNumeric(d) && isNumeric(v))
      Some(toBigDec(d).compareTo(toBigDec(v)))
    else if (isTemporal(d) && isTemporal(v))
      Some(meta.ordering.compare(d, v))
    else None
  }

  def domainEquiv(meta: ColumnMeta, d: Any, v: Any): Boolean =
    domainCompare(meta, d, v).contains(0)

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
