/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (ExpressionUtils) — the standard packaging for
 * native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, TypeCollection}

/** Product-quantization encode as ONE expression: per subspace `j`, the
  * argmin over `k` codebook-centroid squared distances of
  * `vec[j·subDim ..< (j+1)·subDim]`, ties to the lowest code.
  *
  * Replaces the composed spelling
  * `array((0 until m).map(j => array_position(ds_j, array_min(ds_j)) - 1))`
  * where each `ds_j` is an `array(...)` of `k` [[SqDistF64]] probes —
  * an `m × k`-node tree (512 expression nodes at m=8, k=64) that every
  * analysis/optimizer pass re-walks and whose generated code builds and
  * scans a boxed k-array per subspace per row. Profiled r22: the PQ
  * family's bench wall was dominated by exactly this planning +
  * per-row boxing.
  *
  * Value semantics are IDENTICAL to the composed spelling, edge cases
  * included (PqSpec pins the equivalence):
  *
  *  - distances accumulate `(x−c)²` left-to-right in double, with the
  *    float→double element upcast of [[SqDistF64]];
  *  - the winning code is the FIRST index attaining the minimum under
  *    Spark's double ordering (`java.lang.Double.compare`; all-NaN
  *    distances pick code 0 the way `array_position(ds, NaN)` does);
  *  - a null input vector yields an array of `m` null codes (slice →
  *    sqdist null-poisoning, not a null array);
  *  - a subspace whose slice is short (vector shorter than `dim`) or
  *    contains a null element yields a null code for that subspace.
  */
case class PqEncode(
    child: Expression,
    codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {

  private val m = codebooks.length
  private val k = codebooks.head.length
  private val subDim = codebooks.head.head.length

  override def prettyName: String = "pq_encode"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  // a null vector encodes to an array of null CODES, never a null array
  override def nullable: Boolean = false

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * subDim)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var d = 0
        val cent = codebooks(j)(c)
        while (d < subDim) { a((j * k + c) * subDim + d) = cent(d); d += 1 }
        c += 1
      }
      j += 1
    }
    a
  }

  @transient private lazy val childIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** The whole encode for one row; called from both interpreted eval and
    * the generated code (one virtual call per row, primitive loops
    * inside — JIT-compiled once instead of janino-compiled per plan).
    */
  def encodeArray(v: ArrayData): ArrayData = {
    val out = new Array[Any](m)
    if (v == null) return new GenericArrayData(out) // m null codes
    val n = v.numElements()
    val isF = childIsFloat
    var j = 0
    while (j < m) {
      val off = j * subDim
      var code: Any = null
      if (off + subDim <= n) {
        var hasNull = false
        var d = 0
        while (d < subDim && !hasNull) {
          if (v.isNullAt(off + d)) hasNull = true
          d += 1
        }
        if (!hasNull) {
          var best = 0
          var bestD = Double.NaN
          var c = 0
          while (c < k) {
            val cOff = (j * k + c) * subDim
            var s = 0.0
            var d2 = 0
            while (d2 < subDim) {
              val x = (if (isF) v.getFloat(off + d2).toDouble
                       else v.getDouble(off + d2)) - flat(cOff + d2)
              s += x * x
              d2 += 1
            }
            // first strict minimum under Double.compare — the exact
            // array_position(ds, array_min(ds)) tie/NaN behavior
            if (c == 0 || java.lang.Double.compare(s, bestD) < 0) {
              bestD = s; best = c
            }
            c += 1
          }
          code = java.lang.Integer.valueOf(best)
        }
      }
      out(j) = code
      j += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    encodeArray(if (v == null) null else v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.encodeArray(${childGen.isNull} ?
            null : ${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec), codebooks))
}
