package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Between, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual, Like, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Filter, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort, SubqueryAlias}
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
  * and anything outside the predicate vocabulary is rejected with a
  * reason instead of silently mis-read.
  *
  * Accepted shape: `SELECT <anything> FROM <one table> [WHERE
  * <conjunction>]` where each conjunct is `col op literal` with
  * op ∈ {=, <, >, <=, >=} (either operand order; `BETWEEN x AND y`
  * arrives pre-desugared as `>= x AND <= y`), `col IN (lit, …)`,
  * a single-column OR of equalities (folded into IN — the mask union),
  * `col NOT IN (lit, …)` (r16 — the complement mask, null slot stays
  * false per SQL three-valued logic), `col != lit` / `col <> lit`
  * (Not(EqualTo) — the single-literal complement mask),
  * or `col IS [NOT] NULL` (the null-at-bin-0 mask / its complement).
  * Cross-column OR, functions over columns, joins and GROUP BY
  * stay query-engine territory (spark.sql answers them directly); this
  * front-end exists to hand the WHERE clause to [[Pred]]-driven
  * estimators. The logical plan is node-whitelisted: any clause that
  * parses to a node outside the accepted set (HAVING's
  * UnresolvedHaving, WITH's CTE nodes, set operations, …) is rejected
  * by name rather than silently dropped.
  */
object SqlFront {

  /** The raw prefix of a LIKE pattern, when (and only when) the
    * pattern is `<literal-prefix>%`: exactly one UNESCAPED `%`, at the
    * end, and no unescaped `_`. Valid escape sequences in the prefix
    * UNESCAPE to their literal character (r18, VERDICT r17 #9:
    * `LIKE 'ab\%c%' ESCAPE '\'` is the literal prefix `ab%c`) — only
    * the sequences Spark itself accepts (`\%`, `\_`, `\\`); any other
    * escape use (Spark raises for those patterns) and a dangling
    * trailing escape fall through. An empty prefix (`LIKE '%'`) is
    * accepted: its mask is the IS NOT NULL mask, which is exactly
    * SQL's semantics. */
  def likePrefix(pattern: String, escapeChar: Char): Option[String] = {
    val sb = new StringBuilder
    var i = 0
    val n = pattern.length
    while (i < n) {
      val ch = pattern.charAt(i)
      if (ch == escapeChar) {
        if (i + 1 >= n) return None // dangling escape — invalid pattern
        val nx = pattern.charAt(i + 1)
        if (nx == '%' || nx == '_' || nx == escapeChar) {
          sb.append(nx); i += 2
        } else return None // escape sequence Spark rejects
      } else if (ch == '%') {
        // a bare % is accepted only as the final character
        return if (i == n - 1) Some(sb.result()) else None
      } else if (ch == '_') {
        return None // single-char wildcard — not a literal prefix
      } else { sb.append(ch); i += 1 }
    }
    None // no trailing unescaped % — an exact match, not a prefix
  }

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

  /** Flatten an OR tree of single-column equalities / IN lists into
    * (column, values). The domain-mask architecture makes this exactly
    * [[Op.In]]: a mask is an arbitrary boolean vector over the vocab
    * (estimators.py:226-236), and `x = a OR x = b` is the union of the
    * two `=` masks. Literal order is preserved left-to-right. */
  private def orToIn(e: Expression): (String, Seq[Any]) = {
    def leaves(x: Expression): Seq[(String, Seq[Any])] = x match {
      case Or(l, r) => leaves(l) ++ leaves(r)
      case EqualTo(a, lit: Literal) if attrName(a).isDefined =>
        Seq((attrName(a).get, Seq(literalValue(lit))))
      case EqualTo(lit: Literal, a) if attrName(a).isDefined =>
        Seq((attrName(a).get, Seq(literalValue(lit))))
      case In(a, vs) if attrName(a).isDefined &&
          vs.forall(_.isInstanceOf[Literal]) =>
        Seq((attrName(a).get,
          vs.map(v => literalValue(v.asInstanceOf[Literal]))))
      case other => throw new IllegalArgumentException(
        "OR is supported only as a single-column union of equalities " +
          s"(the IN mask) — outside the vocabulary: ${other.sql}")
    }
    val ls = leaves(e)
    val cols = ls.map(_._1).distinct
    require(cols.size == 1,
      "OR across different columns is outside the vocabulary " +
        s"(columns: ${cols.mkString(", ")}): ${e.sql}")
    (cols.head, ls.flatMap(_._2))
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
    case In(a, vs) if attrName(a).isDefined &&
        vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      Pred(attrName(a).get, Op.In,
        vs.map(v => literalValue(v.asInstanceOf[Literal])))
    case Not(In(a, vs)) if attrName(a).isDefined &&
        vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      Pred(attrName(a).get, Op.NotIn,
        vs.map(v => literalValue(v.asInstanceOf[Literal])))
    // Catalyst has no NotEqualTo node: `a != v` / `a <> v` parse to
    // Not(EqualTo) — the single-literal complement mask, i.e. NOT IN (v)
    // (null rows stay filtered under both spellings, so the fold is
    // three-valued-logic exact).
    case Not(EqualTo(a, l: Literal)) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.NotIn, Seq(literalValue(l)))
    case Not(EqualTo(l: Literal, a)) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.NotIn, Seq(literalValue(l)))
    case o: Or =>
      val (c, vs) = orToIn(o)
      Pred(c, Op.In, vs)
    // `col LIKE 'abc%'` (r17): a PREFIX pattern is a contiguous range
    // over the sorted string domain — one mask, no model change. Any
    // other pattern ('%abc', 'a_c', an escaped wildcard) is outside
    // the vocabulary and rejected with the offending pattern.
    case Like(a, l: Literal, esc) if attrName(a).isDefined &&
        l.dataType == StringType && l.value != null =>
      SqlFront.likePrefix(l.value.toString, esc) match {
        case Some(prefix) => Pred(attrName(a).get, Op.PrefixLike, prefix)
        case None => throw new IllegalArgumentException(
          "only prefix LIKE patterns ('abc%') are in the vocabulary; " +
            s"got: ${l.value}")
      }
    case IsNull(a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.IsNull, null)
    case IsNotNull(a) if attrName(a).isDefined =>
      Pred(attrName(a).get, Op.NotNull, null)
    case other => throw new IllegalArgumentException(
      "predicate outside the conjunctive vocabulary: " +
        s"${other.sql} (supported: col {=,<,>,<=,>=} literal, " +
        "col IN (literals), single-column OR of equalities, " +
        "col IS [NOT] NULL, AND)")
  }

  /** Shared front half of [[parse]]/[[parseDnf]]: node whitelist +
    * single-table + at-most-one-WHERE checks, returning the table name
    * and the raw WHERE condition.
    *
    * THREAD-SAFETY CONTRACT (ADVICE r18): this path uses ONLY the
    * stateless `sessionState.sqlParser` and walks the UNRESOLVED plan
    * — no conf reads, no temp-view/catalog access, no analysis. Callers
    * (q_sql_front_workload fans 200 parses out on a shared session)
    * rely on parse staying side-effect-free; any future addition that
    * touches session state must drop that parallelism. */
  private def parseShape(spark: SparkSession, sql: String)
      : (String, Option[Expression]) = {
    val plan: LogicalPlan = spark.sessionState.sqlParser.parsePlan(sql)
    val rels = plan.collect { case r: UnresolvedRelation => r }
    require(rels.size == 1,
      s"expected exactly one table, found ${rels.size} in: $sql")
    val grouped = plan.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }
    require(grouped.isEmpty, s"GROUP BY is not estimator territory: $sql")
    // Whitelist the logical node classes the walk below understands.
    // Anything else (UnresolvedHaving, CTEs, set ops, LATERAL, …) would
    // otherwise be SILENTLY DROPPED — a parse that loses a clause must
    // reject, not mis-estimate.
    plan.foreach {
      case _: Project | _: Filter | _: Aggregate | _: Sort | _: Distinct |
          _: GlobalLimit | _: LocalLimit | _: SubqueryAlias |
          _: UnresolvedRelation => ()
      case other => throw new IllegalArgumentException(
        s"unsupported clause (logical node ${other.nodeName}) in: $sql")
    }
    val filters = plan.collect { case f: Filter => f.condition }
    require(filters.size <= 1, s"expected at most one WHERE: $sql")
    (rels.head.multipartIdentifier.last, filters.headOption)
  }

  /** Parse a single-table SQL query into (table name, conjuncts).
    * Throws IllegalArgumentException with the offending fragment for
    * anything outside the accepted shape. */
  def parse(spark: SparkSession, sql: String): (String, Seq[Pred]) = {
    val (table, cond) = parseShape(spark, sql)
    (table, cond.map(splitConjuncts(_).map(toPred)).getOrElse(Nil))
  }

  /** Disjunct cap for [[parseDnf]] — mirrors the optimizer side
    * (PredExtract.maxDisjuncts): each disjunct doubles the
    * inclusion–exclusion probe count. */
  val maxDisjuncts = 8

  /** Like [[parse]], but the WHERE may be a bounded cross-column
    * DISJUNCTION of conjunctions (r17): returns the DNF (no WHERE =
    * one empty disjunct). A single-column OR of equalities still folds
    * to ONE In-mask leaf (cheaper than two disjuncts), so
    * `parseDnf(sql)` has exactly one disjunct whenever [[parse]]
    * accepts the text. Expansions past [[maxDisjuncts]] reject with
    * the offending fragment — the front-end's reject-by-name
    * contract, where the optimizer path falls through silently. */
  def parseDnf(spark: SparkSession, sql: String)
      : (String, Seq[Seq[Pred]]) = {
    val (table, cond) = parseShape(spark, sql)
    def expand(x: Expression): Seq[Seq[Expression]] = x match {
      case o: Or =>
        // single-column union first: one In leaf, not two disjuncts
        val folded =
          try { toPred(o); true }
          catch { case _: IllegalArgumentException => false }
        if (folded) Seq(Seq(o))
        else {
          val ds = expand(o.left) ++ expand(o.right)
          require(ds.size <= maxDisjuncts,
            s"OR expands past $maxDisjuncts disjuncts: ${x.sql}")
          ds
        }
      case And(l, r) =>
        val ls = expand(l); val rs = expand(r)
        require(ls.size * rs.size <= maxDisjuncts,
          s"OR expands past $maxDisjuncts disjuncts: ${x.sql}")
        for (a <- ls; b <- rs) yield a ++ b
      case leaf => Seq(splitConjuncts(leaf))
    }
    val dnf = cond.map(expand(_).map(_.flatMap(splitConjuncts)
      .map(toPred))).getOrElse(Seq(Nil))
    (table, dnf)
  }
}
