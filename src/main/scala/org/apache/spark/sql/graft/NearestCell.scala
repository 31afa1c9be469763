/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (ExpressionUtils) — the standard packaging for
 * native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, TypeCollection}

/** Coarse-quantizer cell assignment as ONE expression: the index of the
  * nearest centroid — minimum squared L2, or maximum dot product when
  * `spherical` (spelled `dot · (−1.0)` exactly like the composed form).
  *
  * Replaces `array_min(array(struct(d_i, i)…)).getField("i")` — a
  * k-struct tree per call site that boxes a struct array per row and
  * that Catalyst re-walks on every pass (q127 carried 144 sqdist nodes
  * from this spelling alone across its probe branches).
  *
  * Value semantics are IDENTICAL to the composed spelling (SimilaritySpec
  * pins the equivalence):
  *
  *  - distances accumulate left-to-right in double with the
  *    float→double element upcast;
  *  - the winner is the first index attaining the minimum under Spark's
  *    double ordering (ties → lowest index; all-NaN → index 0);
  *  - a null / short / null-element vector makes every distance null,
  *    and a null `d` field sorts FIRST in the struct ordering, so the
  *    composed form returns index 0 — replicated exactly.
  */
case class NearestCell(
    child: Expression,
    centroids: Seq[Seq[Double]],
    spherical: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  private val k = centroids.length
  private val dim = centroids.head.length

  override def prettyName: String = "nearest_cell"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  // null inputs assign to cell 0 (the composed form's null-d-sorts-first
  // behavior), never to a null cell
  override def nullable: Boolean = false

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var c = 0
    while (c < k) {
      var d = 0
      val cent = centroids(c)
      while (d < dim) { a(c * dim + d) = cent(d); d += 1 }
      c += 1
    }
    a
  }

  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Called from interpreted eval and generated code alike. */
  def nearest(v: ArrayData): Int = {
    if (v == null) return 0
    val n = v.numElements()
    if (n != dim) return 0 // length mismatch nulls every distance
    var d = 0
    while (d < n) {
      if (v.isNullAt(d)) return 0 // null element nulls every distance
      d += 1
    }
    val isF = childIsFloat
    var best = 0
    var bestD = Double.NaN
    var c = 0
    while (c < k) {
      val off = c * dim
      var s = 0.0
      var i = 0
      if (spherical) {
        while (i < dim) {
          s += (if (isF) v.getFloat(i).toDouble else v.getDouble(i)) * flat(off + i)
          i += 1
        }
        s = s * -1.0
      } else {
        while (i < dim) {
          val x = (if (isF) v.getFloat(i).toDouble else v.getDouble(i)) - flat(off + i)
          s += x * x
          i += 1
        }
      }
      if (c == 0 || java.lang.Double.compare(s, bestD) < 0) { bestD = s; best = c }
      c += 1
    }
    best
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    nearest(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCell", this, classOf[NearestCell].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        int ${ev.value} = $ref.nearest(${childGen.isNull} ?
          null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  def apply(vec: Column, centroids: Seq[Seq[Double]], spherical: Boolean): Column =
    ExpressionUtils.column(NearestCell(
      ExpressionUtils.expression(vec), centroids, spherical))
}
