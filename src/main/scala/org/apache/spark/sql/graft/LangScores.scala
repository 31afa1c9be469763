/* Lives under org.apache.spark.sql so it can use the private[sql]
 * Expression plumbing (AbstractDataType, ExpressionUtils) — the standard
 * packaging for native Catalyst extensions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All five language-ID stopword scores in ONE pass over the text —
  * the fused form of `graft.ext.LangId.score` for every candidate
  * language at once.
  *
  * The per-language spelling runs one `regexp_count` with a 10-way
  * alternation per whitespace-tokenized language plus ten `contains`
  * probes for zh — five scans of every row (the regexp engine's
  * backtracking entry/exit per position dominates). Here a single
  * tokenization walk looks each token up in a precomputed
  * token → language-bitmask table, and the zh characters probe the raw
  * text once each; `doGenCode` emits one static call inside
  * WholeStageCodegen. Semantics are pinned to the regexp spelling by
  * property test (LangScoresSpec): token boundaries are exactly the
  * Java regex `\s` class, matching `(?<=^|\s)w(?=\s|$)` on the
  * lowercased text.
  *
  * Output: `array<int>` of length 5 in `LangId.langs` declaration
  * order (en, es, de, fr, zh).
  */
case class LangScores(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "lang_scores"

  override protected def nullSafeEval(input: Any): Any =
    LangScores.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.LangScores.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

object LangScores {

  /** Mirrors `graft.ext.LangId` (kept there as the semantic source of
    * truth; the equivalence is spec-asserted so the two cannot drift
    * silently). Whitespace-tokenized languages in bitmask order.
    */
  private val wsLangs: Seq[Seq[String]] = Seq(
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),   // en
    Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),    // es
    Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "den", "mit"), // de
    Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour")) // fr

  private val zhChars: Array[String] =
    Array("的", "是", "在", "了", "我", "有", "和", "人", "这", "不")

  /** token → bitmask of whitespace-tokenized languages containing it. */
  private val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    for ((words, li) <- wsLangs.zipWithIndex; w <- words) {
      val prev = m.get(w)
      m.put(w, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << li)))
    }
    m
  }

  /** Exactly the Java regex `\s` class — NOT Character.isWhitespace,
    * which additionally accepts U+001C-001F and would un-pin the
    * regexp parity.
    */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One text walk → all five scores. Public because generated code
    * calls it.
    */
  def compute(s: UTF8String): GenericArrayData = {
    val raw = s.toString
    val scores = new Array[Int](5)
    var z = 0
    while (z < zhChars.length) {
      if (raw.contains(zhChars(z))) scores(4) += 1
      z += 1
    }
    // UTF8String.toLowerCase is EXACTLY what Spark's lower() computes —
    // a JDK-locale or Locale.ROOT lowercase here would diverge from the
    // regexp spelling on non-ASCII text under tr/az default locales
    val lower = s.toLowerCase.toString
    val n = lower.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      var j = i
      while (j < n && !isWs(lower.charAt(j))) j += 1
      if (j > i && j - i <= 6) { // longest table entry is 6 chars
        val mask = table.get(lower.substring(i, j))
        if (mask != null) {
          val b = mask.intValue()
          var k = 0
          while (k < 4) {
            if ((b & (1 << k)) != 0) scores(k) += 1
            k += 1
          }
        }
      }
      i = j
    }
    new GenericArrayData(scores)
  }

  /** All five `LangId.langs`-ordered stopword scores (codegen'd). */
  def column(text: Column): Column =
    ExpressionUtils.column(LangScores(ExpressionUtils.expression(text)))

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graft] val descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("lang_scores"),
      new ExpressionInfo(classOf[LangScores].getName, "lang_scores"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "lang_scores takes exactly 1 argument")
        LangScores(args.head)
      })

  /** Imperative registration onto an existing session (REPL / tests). */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = descriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
