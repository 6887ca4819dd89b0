package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native left-to-right double dot product over two numeric array columns
  * (float or double elements, mixed allowed) — one fused codegen loop.
  *
  * The PQ encode path evaluates `m × ksub` subvector·codeword dots per
  * corpus row; as interpreted `aggregate(zip_with(...))` HOFs each dot
  * allocates a zipped array and boxes every element, and the expression
  * tree sits outside whole-stage codegen. This expression replaces them
  * with a primitive loop (the [[CosineSim]] treatment for the cosine
  * path). Accumulation order is identical to the HOF form and to DuckDB's
  * `list_sum(list_transform(list_zip(...)))`, so oracle hashes are
  * unaffected (NativeExprSpec pins bit-equality against the HOF).
  *
  * Returns NULL when either side is NULL, lengths differ, or any element
  * is NULL — matching the HOF form, where a null element nulls the zipped
  * product and the aggregate. Element/array type misuse is rejected at
  * analysis time ([[checkInputDataTypes]]), not execution.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    Seq(left, right).map(_.dataType).zipWithIndex.collectFirst {
      case (t, i) if !t.isInstanceOf[ArrayType] ||
          !Set[DataType](FloatType, DoubleType)
            .contains(t.asInstanceOf[ArrayType].elementType) =>
        TypeCheckFailure(
          s"DotProduct argument ${i + 1} needs ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
    }.getOrElse(TypeCheckSuccess)
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => throw new IllegalArgumentException(s"DotProduct needs arrays, got $t")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val (ta, tb) = (elemType(left), elemType(right))
      def get(ad: ArrayData, i: Int, t: DataType): Double = t match {
        case FloatType => ad.getFloat(i).toDouble
        case DoubleType => ad.getDouble(i)
        case _ => throw new IllegalArgumentException(s"unsupported element $t")
      }
      var dot = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        dot += get(a, i, ta) * get(b, i, tb)
        i += 1
      }
      java.lang.Double.valueOf(dot)
    }
  }

  private def accessor(arr: String, i: String, t: DataType): String = t match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(s"unsupported element $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          for (int $i = 0; $i < $a.numElements(); $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) {
              ${ev.isNull} = true;
              break;
            }
            $dot += ${accessor(a, i, elemType(left))} *
              ${accessor(b, i, elemType(right))};
          }
          if (!${ev.isNull}) {
            ${ev.value} = $dot;
          }
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
