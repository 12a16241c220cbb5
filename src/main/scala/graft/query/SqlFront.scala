package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Between, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

/** SQL front-end for the estimator stack — the piece the reference's
  * CLI never had (its workloads arrive as parallel Python lists,
  * estimators.py:41-52; queries are authored by hand). Rather than
  * hand-rolling a grammar, the parse is delegated to CATALYST'S OWN
  * SQL parser (`sessionState.sqlParser.parsePlan`) and only the
  * resulting unresolved logical plan is walked — so the accepted
  * surface is exactly Spark's SQL dialect, string escaping / literal
  * typing / operator precedence / BETWEEN-desugaring come for free,
  * and anything outside the reference's 5-op conjunctive vocabulary
  * is rejected with a reason instead of silently mis-read.
  *
  * Accepted shape: `SELECT <anything> FROM <one table> [WHERE
  * <conjunction of col op literal>]` where op ∈ {=, <, >, <=, >=}
  * (either operand order; `BETWEEN x AND y` arrives pre-desugared by
  * the parser as `>= x AND <= y`). No OR, no IS NULL, no functions
  * over columns, no joins, no GROUP BY — those are query-engine
  * territory (spark.sql answers them directly); this front-end exists
  * to hand the WHERE clause to [[Pred]]-driven estimators.
  */
object SqlFront {

  /** Catalyst literal → the natural Scala value the [[Pred]] vocabulary
    * (and the reference's column domains) uses: integral types widen to
    * Long, DECIMAL literals (Spark parses `1.0` as DECIMAL(2,1)) and
    * FLOAT narrow/widen to Double, UTF8String → String, internal
    * micros/days → java.sql types. */
  private def literalValue(l: Literal): Any = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      l.value.asInstanceOf[Number].longValue()
    case FloatType => l.value.asInstanceOf[Float].toDouble
    case DoubleType => l.value
    case _: DecimalType =>
      l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toBigDecimal.doubleValue
    case StringType => l.value.toString
    case TimestampType =>
      DateTimeUtils.toJavaTimestamp(l.value.asInstanceOf[Long])
    case DateType =>
      DateTimeUtils.toJavaDate(l.value.asInstanceOf[Int])
    case BooleanType => l.value
    case other => throw new IllegalArgumentException(
      s"unsupported literal type $other in predicate")
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    // Spark 4's parser emits BETWEEN as the unresolved `between`
    // function (its Between RuntimeReplaceable only appears at
    // analysis, which never runs here) — desugar to the two bound
    // conjuncts the vocabulary speaks.
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("between") &&
          f.arguments.size == 3 =>
      Seq(GreaterThanOrEqual(f.arguments(0), f.arguments(1)),
        LessThanOrEqual(f.arguments(0), f.arguments(2)))
    case Between(input, lower, upper, _) =>
      Seq(GreaterThanOrEqual(input, lower), LessThanOrEqual(input, upper))
    case x => Seq(x)
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.last)
    case _ => None
  }

  /** One conjunct → one [[Pred]]; literal-on-the-left flips the
    * operator (5 < x ≡ x > 5). */
  private def toPred(e: Expression): Pred = e match {
    case EqualTo(a, l: Literal) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Eq, literalValue(l))
    case EqualTo(l: Literal, a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Eq, literalValue(l))
    case LessThan(a, l: Literal) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Lt, literalValue(l))
    case LessThan(l: Literal, a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Gt, literalValue(l))
    case GreaterThan(a, l: Literal) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Gt, literalValue(l))
    case GreaterThan(l: Literal, a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Lt, literalValue(l))
    case LessThanOrEqual(a, l: Literal) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Leq, literalValue(l))
    case LessThanOrEqual(l: Literal, a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Geq, literalValue(l))
    case GreaterThanOrEqual(a, l: Literal) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Geq, literalValue(l))
    case GreaterThanOrEqual(l: Literal, a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.Leq, literalValue(l))
    case other => throw new IllegalArgumentException(
      "predicate outside the 5-op conjunctive vocabulary: " +
        s"${other.sql} (supported: col {=,<,>,<=,>=} literal, AND)")
  }

  /** Parse a single-table SQL query into (table name, conjuncts).
    * Throws IllegalArgumentException with the offending fragment for
    * anything outside the accepted shape. */
  def parse(spark: SparkSession, sql: String): (String, Seq[Pred]) = {
    val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(sql)
    val rels = plan.collect { case r: UnresolvedRelation => r }
    require(rels.size == 1,
      s"expected exactly one table, found ${rels.size} in: $sql")
    val grouped = plan.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }
    require(grouped.isEmpty, s"GROUP BY is not estimator territory: $sql")
    val filters = plan.collect { case f: Filter => f.condition }
    require(filters.size <= 1, s"expected at most one WHERE: $sql")
    val preds = filters.headOption
      .map(splitConjuncts(_).map(toPred)).getOrElse(Nil)
    (rels.head.multipartIdentifier.last, preds)
  }
}
