package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native DISTINCT character n-grams of a string, in first-occurrence
  * order — `array<string>` of every length-`n` codepoint window
  * (SQL-substring semantics, so `substring(s, i, n)` mirrors it exactly).
  * Strings shorter than `n` yield an empty array; NULL stays NULL.
  *
  * Why native: the HOF formulation (char split → filter → 3 slices →
  * 2 zip_with concats → array_distinct) evaluates ~6 interpreted lambda
  * passes with per-char object churn — measured ~2.6 ms/doc inside
  * [[graft.text.TextOps.ngramLangId]], 12.8 s at sf0.1 for what is one
  * substring loop. Same escalation as [[MinHashSig]]/[[SignedProj]]:
  * one primitive pass, codegen-friendly.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case StringType => TypeCheckSuccess
      case t => TypeCheckFailure(s"CharNgrams needs STRING, got ${t.sql}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharNgrams.distinctNgrams(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.CharNgrams.distinctNgrams($s, $n));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  /** Shared by interpreted eval and codegen: distinct n-grams
    * (codepoint windows), first occurrence first. */
  def distinctNgrams(s: UTF8String, n: Int): Array[AnyRef] = {
    val chars = s.numChars()
    if (chars < n) return Array.empty
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= chars - n) {
      // substringSQL is 1-based and codepoint-aware — identical to SQL
      // substring(s, i+1, n) in both engines
      seen.add(s.substringSQL(i + 1, n))
      i += 1
    }
    seen.toArray(new Array[AnyRef](seen.size))
  }

  /** Column API: distinct character n-grams of a string column. */
  def apply(str: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(str), n))
}
