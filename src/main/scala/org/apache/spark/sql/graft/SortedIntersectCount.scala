/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
 * packaging for native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Set-intersection size of two ASC-SORTED, DISTINCT `array<string>`
  * columns via a single merge walk — the verify inner loop of the
  * prefix-filter exact similarity join.
  *
  * The built-in spelling, `size(array_intersect(a, b))`, builds a hash
  * set of one side PER ROW (UTF8String hashing + boxing + an output
  * array that is immediately reduced to its length). On a candidate
  * verify join the hash-set build dominated the whole query (measured
  * 4.6 s → 1.3 s at 205k candidate pairs, sf0.1 profile). The merge
  * walk does zero allocation: two cursors, byte-wise `UTF8String`
  * comparisons (the SAME binary ordering `sort_array` uses for
  * StringType, so "sorted by sort_array" is exactly the precondition).
  *
  * Contract: both arrays ascending-sorted and duplicate-free, as
  * produced by `sort_array(array_distinct(...))`. Null ELEMENTS are
  * skipped (never counted as matches); unsorted input silently
  * undercounts — this is the (b)-tier custom-code route, not a general
  * replacement for `array_intersect`.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Merge-walk set-intersection count of two sorted distinct
    * `array<string>` columns (codegen'd).
    */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "sorted_intersect_count takes exactly 2 arguments")
        SortedIntersectCount(args(0), args(1))
      })

  /** Imperative registration onto an existing session (REPL / tests). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
