package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(array<string>) → struct<top_tok: bigint,
  * distinct_trigrams: bigint>` — the per-document counting pass behind
  * the Gopher-style repetition statistics (t14): the count of the
  * most frequent token and the number of DISTINCT 3-token trigrams.
  *
  * The composable formulation sorts the token array and folds it with
  * an interpreted `aggregate` lambda, then builds every trigram
  * string and runs `array_distinct` — four higher-order passes per
  * document. This kernel is one compiled pass each (open-addressed
  * counting via java.util.HashMap on UTF8String keys, exact — no
  * hashing shortcut can alter the counts), bit-identical to the SQL
  * (asserted in TokenStatsSpec; the DuckDB oracle keeps the naive
  * count-per-distinct-token derivation).
  */
object TokenStats {

  private val Sep = UTF8String.fromString(" ")

  /** (top token count, distinct trigram count) in one pass each. */
  def tokenStats(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](Math.max(16, n * 2))
    var top = 0L
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    var distinctTg = 0L
    if (n >= 3) {
      val seen = new java.util.HashSet[UTF8String](Math.max(16, n * 2))
      i = 0
      while (i <= n - 3) {
        val tg = UTF8String.concatWs(Sep,
          words.getUTF8String(i), words.getUTF8String(i + 1),
          words.getUTF8String(i + 2))
        if (seen.add(tg)) distinctTg += 1
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](top, distinctTg))
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_stats"),
    new ExpressionInfo(classOf[TokenStatsExpr].getName, "token_stats"),
    (children: Seq[Expression]) => TokenStatsExpr(children.head))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("token_stats")))
      reg.createOrReplaceTempFunction(
        "token_stats", children => TokenStatsExpr(children.head), "built-in")
  }
}

case class TokenStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_stats expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("top_tok", LongType, nullable = false),
    StructField("distinct_trigrams", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.tokenStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.tokenStats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}
