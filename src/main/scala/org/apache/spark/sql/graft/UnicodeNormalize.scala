/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (ExpressionUtils) — the standard packaging for
 * native Catalyst extensions. */
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen expression — the missing
  * prerequisite under every text-dedup key: `café` spelled NFC
  * (U+00E9) and NFD (e + U+0301) fingerprint as different documents,
  * ligatures (ﬁ) and fullwidth forms (Ｓ) dodge token matching, and a
  * crawl mixes all of them freely. NFC is the storage-canonical form
  * (what the dedup fingerprint should hash); NFKC additionally folds
  * compatibility variants (ligatures, fullwidth, superscripts) — the
  * aggressive form for match keys, lossy for display text.
  *
  * Implementation: `java.text.Normalizer` (ICU-grade tables shipped
  * with the JDK) behind a static helper, called from both interpreted
  * and generated code — one row in, one row out, fully inside
  * WholeStageCodegen, no UDF. The fast path is free: `Normalizer
  * .isNormalized` is O(n) with no allocation, and real-world crawl
  * text is overwhelmingly already-NFC, so most rows pay a scan, not a
  * rebuild.
  */
object UnicodeNormalizeBytes {

  /** `form` is the [[java.text.Normalizer.Form]] ordinal — passed as a
    * plan-literal int so generated code stays a static call.
    */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val f = Normalizer.Form.values()(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

abstract class UnicodeNormalizeBase extends UnaryExpression with ExpectsInputTypes {
  protected def form: Normalizer.Form

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalizeBytes.normalize(input.asInstanceOf[UTF8String], form.ordinal())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.UnicodeNormalizeBytes.normalize($c, ${form.ordinal()})")
}

/** `nfc_normalize(string) → string` (named for parity with DuckDB's
  * function of the same name, which the oracle uses).
  */
case class NfcNormalize(child: Expression) extends UnicodeNormalizeBase {
  override protected def form: Normalizer.Form = Normalizer.Form.NFC
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `nfkc_normalize(string) → string` — compatibility folding for
  * match/dedup keys (no DuckDB twin; spec-pinned instead).
  */
case class NfkcNormalize(child: Expression) extends UnicodeNormalizeBase {
  override protected def form: Normalizer.Form = Normalizer.Form.NFKC
  override def prettyName: String = "nfkc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfkcNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  def nfc(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))

  def nfkc(c: Column): Column =
    ExpressionUtils.column(NfkcNormalize(ExpressionUtils.expression(c)))

  /** For [[GraftExtensions]] SQL registration. */
  def descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(string) takes 1 argument")
        NfcNormalize(args.head)
      }),
    (FunctionIdentifier("nfkc_normalize"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "nfkc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfkc_normalize(string) takes 1 argument")
        NfkcNormalize(args.head)
      }))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
