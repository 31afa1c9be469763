/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (ExpressionUtils) — the standard packaging for
 * native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_size(string) → bigint`: the DEFLATE-compressed byte count
  * of a string's UTF-8 bytes — the primitive under the
  * compression-ratio quality signal (Gopher's "documents that compress
  * too well are boilerplate/repetition; too badly, binary junk or
  * random glyphs"). Exposed as the raw size, not the ratio, so callers
  * divide by whatever length basis they standardize on
  * (`octet_length` here) and the expression stays a pure function of
  * one column.
  *
  * Level 6 (zlib default) pinned explicitly: the signal must be
  * deterministic across JVMs for the oracle/spec story, and the
  * default constant is the one every production zlib build agrees on.
  * Per-row cost is O(len) with a thread-local Deflater (a fresh
  * Deflater per row would malloc/free its window each call).
  */
object DeflateBytes {

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, /* nowrap = */ true)
  }

  def deflatedSize(s: UTF8String): Long = {
    val input = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(input)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "deflate_size"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    DeflateBytes.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DeflateBytes.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  def apply(c: Column): Column =
    ExpressionUtils.column(DeflateSize(ExpressionUtils.expression(c)))

  /** For [[GraftExtensions]] SQL registration. */
  def descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("deflate_size"),
    new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "deflate_size(string) takes 1 argument")
      DeflateSize(args.head)
    })

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
