/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
 * packaging for native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Index of the FIRST band (0-based) where two banded long-array MinHash
  * signatures agree on every component, or -1 if no band matches. Band b
  * spans components [b·r, (b+1)·r) for rows-per-band r.
  *
  * This is the exactly-once emission predicate for LSH candidate pairs:
  * a near-dup pair collides in MANY bands (a j≈1 pair in ALL of them),
  * so a bucket self-join emits it once per colliding band and needs a
  * `distinct` shuffle over the whole blow-up to dedup. Filtering the
  * joined rows on `band == first_matching_band(sigA, sigB, r)` keeps
  * exactly one row per pair with a codegen'd scalar instead of a shuffle
  * — the dominant cost of the pairs query on dup-heavy corpora.
  *
  * Like [[SigMatchCount]], the higher-order-function spelling of this
  * predicate would evaluate interpreted per joined row; `doGenCode`
  * emits a tight primitive loop with early exit inside
  * WholeStageCodegen.
  */
case class FirstMatchingBand(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "first_matching_band"

  override protected def nullSafeEval(a: Any, b: Any, rv: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val r = rv.asInstanceOf[Int]
    // r <= 0 would make the inner loop vacuous and report band 0 for
    // EVERY pair — a caller bug that must fail, not keep all rows
    if (r <= 0) throw new IllegalArgumentException(
      s"first_matching_band: rowsPerBand must be positive, got $r")
    val n = math.min(x.numElements(), y.numElements())
    var band = 0
    while (band * r + r <= n) {
      var i = band * r
      var all = true
      while (all && i < band * r + r) {
        if (x.getLong(i) != y.getLong(i)) all = false
        i += 1
      }
      if (all) return band
      band += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val band = ctx.freshName("band")
      val all = ctx.freshName("all")
      val res = ctx.freshName("res")
      s"""
         |if ($r <= 0) throw new IllegalArgumentException(
         |  "first_matching_band: rowsPerBand must be positive, got " + $r);
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $res = -1;
         |for (int $band = 0; $res < 0 && $band * $r + $r <= $n; $band++) {
         |  boolean $all = true;
         |  for (int $i = $band * $r; $all && $i < $band * $r + $r; $i++) {
         |    if ($a.getLong($i) != $b.getLong($i)) $all = false;
         |  }
         |  if ($all) $res = $band;
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FirstMatchingBand =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object FirstMatchingBand {
  /** First band of width `rowsPerBand` where two `array<bigint>` columns
    * agree on every component; -1 if none (codegen'd).
    */
  def column(a: Column, b: Column, rowsPerBand: Column): Column =
    ExpressionUtils.column(FirstMatchingBand(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(rowsPerBand)))
}
