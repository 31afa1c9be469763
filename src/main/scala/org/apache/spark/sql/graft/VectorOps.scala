/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
 * packaging for native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Shared shape of the vector inner loops ([[DotF64]], [[SqDistF64]]):
  * a `BinaryExpression` over two float/double arrays that accumulates a
  * double left-to-right — EXACTLY the arithmetic of the HOF spelling
  * `aggregate(zip_with(a, b, f), 0.0, _+_)` it replaces (same element
  * upcasts, same summation order, so every previously-computed score is
  * bit-identical and the driver's hash oracle can't tell the spellings
  * apart), but evaluated as one codegen'd primitive loop instead of an
  * interpreted lambda environment plus a per-row array allocation.
  * zip_with's null semantics are preserved: a null element or a length
  * mismatch (zip_with pads with nulls) poisons the result to null.
  */
trait VectorFoldF64 { self: BinaryExpression with ExpectsInputTypes =>

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** (acc, x, y) => new acc, in doubles. */
  protected def fold(acc: Double, x: Double, y: Double): Double

  /** Java source for the loop body's accumulation, given element vars. */
  protected def foldCode(acc: String, x: String, y: String): String

  protected final def evalArrays(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = elemIsFloat(self.left)
    val rf = elemIsFloat(self.right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc = fold(acc, xv, yv)
      i += 1
    }
    acc
  }

  protected final def genArrays(ctx: CodegenContext, ev: ExprCode): ExprCode =
    self.nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      def get(arr: String, isFloat: Boolean) =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = ${get(a, elemIsFloat(self.left))};
         |    double $yv = ${get(b, elemIsFloat(self.right))};
         |    ${foldCode(acc, xv, yv)}
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Dot product of two float/double array columns, in double — the inner
  * loop of every cosine score (brute top-k, k-NN join, LSH ANN probe
  * scoring, near-dup verification). `dot_f64(v, v)` is the squared L2
  * norm, so the norm shares the same loop.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with VectorFoldF64 {

  override def prettyName: String = "dot_f64"
  override protected def fold(acc: Double, x: Double, y: Double): Double = acc + x * y
  override protected def foldCode(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"

  override protected def nullSafeEval(a: Any, b: Any): Any = evalArrays(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genArrays(ctx, ev)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

/** Squared euclidean distance of two float/double array columns, in
  * double — the inner loop of IVF centroid assignment, where the HOF
  * spelling ran once per centroid per row (16 interpreted folds/row at
  * the default codebook size).
  */
case class SqDistF64(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with VectorFoldF64 {

  override def prettyName: String = "sqdist_f64"
  override protected def fold(acc: Double, x: Double, y: Double): Double = {
    val d = x - y
    acc + d * d
  }
  override protected def foldCode(acc: String, x: String, y: String): String =
    s"{ double __d = $x - $y; $acc += __d * __d; }"

  override protected def nullSafeEval(a: Any, b: Any): Any = evalArrays(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    genArrays(ctx, ev)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistF64 =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Codegen'd dot product in double (see [[DotF64]]). */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotF64(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd squared L2 distance in double (see [[SqDistF64]]). */
  def sqdist(a: Column, b: Column): Column =
    ExpressionUtils.column(SqDistF64(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  private def descriptor(
      name: String,
      cls: Class[_],
      make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name takes exactly 2 arguments")
        make(args(0), args(1))
      })

  private[graft] val dotDescriptor = descriptor("dot_f64", classOf[DotF64], DotF64.apply)
  private[graft] val sqdistDescriptor =
    descriptor("sqdist_f64", classOf[SqDistF64], SqDistF64.apply)

  /** Imperative registration onto an existing session (REPL / tests). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(dotDescriptor, sqdistDescriptor).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
