/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
 * packaging for native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length, in CHARACTERS, of the longest common prefix of two strings —
  * the match-extension inner loop of the exact-substring decontamination
  * join ([[graft.ext.Dedup.exactSubstringContamination]]): every anchor
  * candidate extends left/right by exactly this, so the loop runs once
  * per candidate over bounded text.
  *
  * The composable spelling (zip per-char substrings into a boolean list
  * and scan for the first mismatch) allocates two char arrays plus a
  * list per ROW; this walk is zero-allocation over the underlying UTF-8
  * bytes, advancing a cursor one CODE POINT at a time
  * (`numBytesForFirstByte`) so multi-byte characters are counted as one
  * and a partial final character never counts. Byte-wise equality of
  * identical prefixes implies identical char boundaries, so the
  * per-char byte compare is exact for any input.
  */
case class CommonPrefixChars(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "common_prefix_chars"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val nx = x.numBytes()
    val ny = y.numBytes()
    var i = 0
    var c = 0L
    var break = false
    while (!break && i < nx && i < ny) {
      val nb = UTF8String.numBytesForFirstByte(x.getByte(i))
      if (i + nb > nx || i + nb > ny) break = true
      else {
        var k = 0
        var eq = true
        while (eq && k < nb) {
          if (x.getByte(i + k) != y.getByte(i + k)) eq = false
          k += 1
        }
        if (eq) { c += 1; i += nb } else break = true
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val nb = ctx.freshName("nb")
      val c = ctx.freshName("c")
      val eq = ctx.freshName("eq")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $nx = $a.numBytes();
         |int $ny = $b.numBytes();
         |int $i = 0; long $c = 0L;
         |while ($i < $nx && $i < $ny) {
         |  int $nb = $utf8.numBytesForFirstByte($a.getByte($i));
         |  if ($i + $nb > $nx || $i + $nb > $ny) break;
         |  boolean $eq = true;
         |  for (int $k = 0; $k < $nb; $k++) {
         |    if ($a.getByte($i + $k) != $b.getByte($i + $k)) { $eq = false; break; }
         |  }
         |  if (!$eq) break;
         |  $c++; $i += $nb;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixChars =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixChars {
  /** Character count of the longest common prefix (codegen'd). */
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(CommonPrefixChars(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("common_prefix_chars"),
      new ExpressionInfo(classOf[CommonPrefixChars].getName, "common_prefix_chars"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "common_prefix_chars takes exactly 2 arguments")
        CommonPrefixChars(args(0), args(1))
      })

  /** Imperative registration onto an existing session (REPL / tests). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
