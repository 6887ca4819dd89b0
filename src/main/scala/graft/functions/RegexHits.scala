package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native summed regex match count — `Σ_p (size(split(text, p, -1)) - 1)`
  * over a FIXED pattern list, in one pass per pattern with PRECOMPILED
  * patterns.
  *
  * Why native: Spark's `split` (`StringSplit` → `UTF8String.split`)
  * compiles its regex and converts the UTF8String to a Java String ON
  * EVERY ROW, and the word-hit heuristics ([[graft.text.TextOps.langId]],
  * `qualitySignals`' stopword count) issue up to 22 splits per row — the
  * r19 plan audit measured the language family (op_lang_id,
  * op_lid_confusion, op_corpus_drift) dominated by per-row Pattern.compile.
  * Here the patterns compile once per expression instance and the string
  * converts once per row. Same escalation rule as [[CharDivStats]].
  *
  * Semantics are EXACTLY the split-count sum (RegexHitsSpec pins it):
  * Java `split(_, -1)` yields (number of sequential non-overlapping
  * matches) + 1 pieces — a leading piece is produced even for a match at
  * position 0 (our patterns are never zero-width), trailing empties are
  * kept — so find()-counting is value-identical, including the
  * adjacent-word quirk where " the the " counts ONE `\\sthe\\s` hit (the
  * second "the" lost its leading space to the first match). NULL input
  * stays NULL. */
case class RegexHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "RegexHits: at least one pattern")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case StringType => TypeCheckSuccess
      case t => TypeCheckFailure(s"RegexHits needs STRING, got ${t.sql}")
    }
  }

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    patterns.map(java.util.regex.Pattern.compile).toArray

  override protected def nullSafeEval(input: Any): Any =
    RegexHits.count(input.asInstanceOf[UTF8String], compiled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pats = ctx.addReferenceObj("regexHitsPatterns", compiled,
      "java.util.regex.Pattern[]")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = graft.functions.RegexHits.count($s, $pats);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RegexHits =
    copy(child = newChild)
}

object RegexHits {
  /** Shared by interpreted eval and codegen: one String conversion, then
    * one sequential find() sweep per precompiled pattern. */
  def count(s: UTF8String, pats: Array[java.util.regex.Pattern]): Int = {
    val str = s.toString
    var n = 0
    var i = 0
    while (i < pats.length) {
      val m = pats(i).matcher(str)
      while (m.find()) n += 1
      i += 1
    }
    n
  }

  /** Column API. */
  def apply(str: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(RegexHits(ColumnBridge.expression(str), patterns))
}
