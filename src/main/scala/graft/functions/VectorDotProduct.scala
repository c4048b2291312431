package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd float-vector dot product:
  * `vec_dot(array<float>, array<float>) → double`.
  *
  * The composable formulation — `aggregate(zip_with(a, b, (x,y) -> x*y),
  * 0D, (s,v) -> s+v)` — materializes an intermediate array and runs two
  * higher-order-function interpreters per row. This expression is a
  * single fused loop over the two `ArrayData` buffers inside
  * whole-stage codegen: no allocation, no lambda dispatch. Used by the
  * similarity operators (v1/v3/t9) where the dot product executes once
  * per candidate *pair* — the hottest scalar in the engine at 100 TB.
  *
  * Summation order is left-to-right, identical to the `aggregate` fold
  * it replaces, so results (and the DuckDB oracles) are bit-identical.
  */
case class VectorDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorDotProduct {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VectorDotProduct].getName, "vec_dot"),
    (children: Seq[Expression]) => VectorDotProduct(children(0), children(1)))

  /** Idempotent per-session registration (for sessions built without
    * [[graft.GraftExtensions]]). Checks first so repeated calls from
    * the vector operators don't log "function vec_dot replaced" and
    * don't churn the registry on every query. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("vec_dot")))
      reg.createOrReplaceTempFunction(
        "vec_dot", children => VectorDotProduct(children(0), children(1)),
        "built-in")
  }
}
