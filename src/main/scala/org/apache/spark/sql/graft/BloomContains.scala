/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (ExpressionUtils) — the standard packaging for
 * native Catalyst extensions. */
package org.apache.spark.sql.graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, DataType, LongType}

/** Byte-level Bloom filter: the ONE set-bits/probe-bits implementation
  * shared by the build side ([[graft.ext.BloomGate.BloomAgg]]) and the
  * probe side ([[BloomContains]]) — the two MUST agree bit-for-bit or
  * membership silently degrades, so neither re-spells the math.
  *
  * Layout (little-endian): `int32 magic "GBLM" | int32 k |
  * int64 numBits | int64 words[(numBits+63)/64]`. Probes use
  * Kirsch–Mitzenmacher double hashing over the single 64-bit input
  * hash: `bit_i = (h1 + i·h2) mod numBits` with
  * `h2 = (rotl(h1, 31) · φ64) | 1` (odd, so the probe stride never
  * collapses to zero on any h1).
  */
object BloomBytes {

  val Magic: Int = 0x47424C4D // "GBLM"
  val HeaderBytes: Int = 16

  @inline private def h2(hash: Long): Long =
    (java.lang.Long.rotateLeft(hash, 31) * 0x9E3779B97F4A7C15L) | 1L

  /** The i-th probe's bit index in [0, numBits). */
  @inline def probeBit(hash: Long, i: Int, numBits: Long): Long =
    ((hash + i.toLong * h2(hash)) & Long.MaxValue) % numBits

  /** Build-side twin of [[mightContain]]: set the k probe bits in a
    * raw word array (no header).
    */
  def setBits(words: Array[Long], numBits: Long, k: Int, hash: Long): Unit = {
    var i = 0
    while (i < k) {
      val bit = probeBit(hash, i, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L).toInt)
      i += 1
    }
  }

  def serialize(k: Int, numBits: Long, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(HeaderBytes + 8 * words.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic).putInt(k).putLong(numBits)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** True iff every probe bit of `hash` is set. Malformed filter bytes
    * throw (never a silent "false": a corrupt filter passed to an
    * admission gate must fail the query, not wave everything through).
    */
  def mightContain(filter: Array[Byte], hash: Long): Boolean = {
    val bb = ByteBuffer.wrap(filter).order(ByteOrder.LITTLE_ENDIAN)
    require(filter.length >= HeaderBytes && bb.getInt(0) == Magic,
      s"not a GBLM bloom filter (${filter.length} bytes)")
    val k = bb.getInt(4)
    val numBits = bb.getLong(8)
    require(k > 0 && numBits > 0 &&
      filter.length >= HeaderBytes + 8 * ((numBits + 63) >>> 6),
      s"corrupt bloom header: k=$k numBits=$numBits len=${filter.length}")
    var i = 0
    while (i < k) {
      val bit = probeBit(hash, i, numBits)
      val word = bb.getLong(HeaderBytes + 8 * (bit >>> 6).toInt)
      if ((word & (1L << (bit & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }
}

/** `bloom_contains(filter binary, hash long) → boolean` — native
  * codegen membership probe. The filter operand is typically a plan
  * literal (a driver-built, O(MB) serialized filter — the
  * centroid-literal class of O(1) driver round-trip), so the probe is
  * k cache-friendly word reads per row inside WholeStageCodegen; the
  * big side never shuffles.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def prettyName: String = "bloom_contains"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(f: Any, h: Any): Any =
    BloomBytes.mightContain(f.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, h) =>
      s"org.apache.spark.sql.graft.BloomBytes.mightContain($f, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {

  def apply(filter: Column, hash: Column): Column =
    ExpressionUtils.column(BloomContains(
      ExpressionUtils.expression(filter), ExpressionUtils.expression(hash)))

  /** For [[GraftExtensions]] SQL registration. */
  def descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "bloom_contains(filter, hash) takes 2 arguments")
      BloomContains(args.head, args(1))
    })

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
