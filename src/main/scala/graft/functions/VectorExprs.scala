package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Native Catalyst expression for the vector hot path (SURVEY §5.3): a
  * whole-stage-codegen dot product over two float arrays.
  *
  * Preference order applied (builder contract): built-in higher-order
  * functions already express dot products, but their per-element lambda is
  * interpreted; for the ANN/similarity paths that fold 64 elements per row
  * pair this is the measured bottleneck, which justifies dropping to a
  * custom `Expression` with `doGenCode` — a tight primitive `for` loop in
  * generated Java, no boxing, no closure dispatch. A Scala UDF would box
  * every array; this stays inside WholeStageCodegen.
  *
  * Deterministic: strict left-to-right accumulation in array order, same in
  * interpreted and codegen paths.
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  val DotName = "graft_dot"

  private val dotBuilder: Seq[Expression] => Expression =
    children => FloatVecDot(children(0), children(1))

  /** Imperative registration — used by query builders so the expression is
    * available regardless of how the session was constructed. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(DotName, dotBuilder, "built-in")

  /** Column-level helper: `dot(a, b)` after [[register]]. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(DotName, a, b)
}

/** Config-level registration: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions` makes graft_dot a
  * session built-in (the SparkSessionExtensions surface of the contract). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(VectorExprs.DotName),
      new ExpressionInfo(classOf[FloatVecDot].getName, VectorExprs.DotName),
      children => FloatVecDot(children(0), children(1))))
  }
}
