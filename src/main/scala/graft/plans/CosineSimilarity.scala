package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity between a `array<float>` column and
  * a `array<double>` vector (normally a literal query vector).
  *
  * Why a custom Expression: the literal-chain formulation
  * (`Similarity.cosineCol`, 3×64-term trees per call site) is exact but
  * pays Catalyst tree-size costs, and `zip_with`/`aggregate` lambdas
  * allocate per row. This kernel is one expression node whose generated
  * code is a tight loop — the preferred rung on the extension ladder
  * (Expression with doGenCode > UDF). Accumulation order matches the
  * left-associated chains bit-for-bit (ascending index, dot and norms
  * per element), so it is interchangeable with the oracle-checked
  * formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity expects (array<float>, array<double>), got $other")
    }
  }

  override protected def nullSafeEval(v: Any, q: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val b = q.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

object CosineSimilarity {
  /** The injectFunction registration triple for [[GraftExtensions]]. */
  val registration: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_cosine(embedding, query)")
      CosineSimilarity(children(0), children(1))
    })

  /** Column API (requires a session built with [[GraftExtensions]]):
    * cosine of an `array<float>` column vs a literal query vector. */
  def apply(embCol: Column, query: Array[Float]): Column = {
    import org.apache.spark.sql.functions._
    call_function("graft_cosine", embCol,
      array(query.map(v => lit(v.toDouble)): _*))
  }
}
