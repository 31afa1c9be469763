/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
 * packaging for native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Count of positions where two long-array signatures agree — the inner
  * loop of MinHash estimated-Jaccard verification.
  *
  * The built-in spelling, `aggregate(zip_with(a, b, eq), 0, +)`, is a
  * nested higher-order function: interpreted evaluation with a lambda
  * variable environment and an array allocation per row. On a 12.5M-pair
  * verify join that interpretation dominated the whole query. This is
  * the (b)-tier custom-code route (SURVEY.md §7.3): a native
  * `BinaryExpression` whose `doGenCode` emits a tight primitive loop
  * inside WholeStageCodegen — no allocation, no virtual calls.
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sig_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

object SigMatchCount {
  /** Positions where two `array<bigint>` columns agree (codegen'd). */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(SigMatchCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sig_match_count"),
      new ExpressionInfo(classOf[SigMatchCount].getName, "sig_match_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sig_match_count takes exactly 2 arguments")
        SigMatchCount(args(0), args(1))
      })

  /** Imperative registration onto an existing session (REPL / tests). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
