package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Expression — the
  * canonicalization step a web-crawl text pipeline runs before hashing
  * or tokenizing (the same text arrives both precomposed and decomposed;
  * un-normalized, exact dedup misses byte-different/char-identical
  * copies).
  *
  * Why a custom Expression and not a UDF: Spark has no normalization
  * built-in, and a Scala UDF would pay serialization + a non-codegen
  * boundary per row on the hottest path there is (every byte of a 100 TB
  * corpus flows through this). The generated code is a branch plus a
  * JDK `Normalizer` call, with an `isNormalized` fast path that returns
  * the input `UTF8String` unchanged (zero-copy) for the overwhelmingly
  * common already-NFC case.
  *
  * DuckDB twin for oracle checks: `nfc_normalize(x)`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_nfc expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("nfcIn")
      s"""
         |String $s = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($s,
         |          java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  val name = "graft_nfc"

  private val builder: Seq[Expression] => Expression = children => {
    require(children.length == 1, s"$name(text)")
    NfcNormalize(children.head)
  }

  /** The injectFunction registration triple (SQL name `graft_nfc`). */
  val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(classOf[NfcNormalize].getName, name),
    builder)

  /** Session-registry path for sessions not built with GraftExtensions
    * (same idiom as [[CappedCollectSetLong.ensureRegistered]]); use with
    * `call_function(NfcNormalize.name, col)`. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    if (!registry.functionExists(id))
      registry.registerFunction(id,
        new ExpressionInfo(classOf[NfcNormalize].getName, name), builder)
  }
}
