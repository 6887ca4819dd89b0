package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native cosine similarity over two `array<float>` or `array<double>`
  * embedding columns (each side's element type read independently, so a
  * float corpus can score against a double reconstruction).
  *
  * Replaces the three interpreted `aggregate(zip_with(...))` passes in the
  * brute-force ANN path with one fused codegen loop. Accumulation is
  * left-to-right in double — bit-identical to the HOF version and to the
  * DuckDB oracle's `list_sum(list_transform(...))`, so `op_ann_topk` keeps
  * hash-matching. The double-array rung exists for the SQ8 family
  * (round 16): reconstructions are exact doubles, and the interpreted HOF
  * cosine was the measured 1,922-second term in op_sq_ann's ×100 scan.
  *
  * Returns NULL when lengths differ or either norm is zero (mirrors the
  * division result of the HOF version: 0/0 → NaN is avoided up front).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val aD = elemIsDouble(left); val bD = elemIsDouble(right)
    if (a.numElements() != b.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
        val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na * nb)
      if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      val getX = if (elemIsDouble(left)) s"$a.getDouble($i)"
        else s"(double) $a.getFloat($i)"
      val getY = if (elemIsDouble(right)) s"$b.getDouble($i)"
        else s"(double) $b.getFloat($i)"
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $na = 0.0, $nb = 0.0;
          for (int $i = 0; $i < $a.numElements(); $i++) {
            double $x = $getX;
            double $y = $getY;
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          double $denom = java.lang.Math.sqrt($na * $nb);
          if ($denom == 0.0) { ${ev.isNull} = true; }
          else { ${ev.value} = $dot / $denom; }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
