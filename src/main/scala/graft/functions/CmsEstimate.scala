package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native Count-Min-Sketch frequency estimate for a STRING item — the
  * probe half of the sketch-prefiltered heavy-hitters pattern
  * ([[graft.text.TextOps.heavyHitters]]).
  *
  * The serialized sketch rides the expression to the executors
  * ([[BloomMightContain]]'s pattern); the probe is d hash-and-read-min
  * array lookups, codegen'd, no shuffle. Guarantee: the CMS estimate
  * NEVER undercounts (`est ≥ true`), so `estimate ≥ T` keeps a SUPERSET
  * of the true heavy hitters and an exact recount of the survivors
  * settles false positives — result-identical to the full aggregation,
  * while the wide shuffle carries only candidate rows. */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate needs a string item, got ${t.sql}")
    }

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))

  override protected def nullSafeEval(item: Any): Any =
    sketch.estimateCount(item.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cms = ctx.addReferenceObj("cmSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, item =>
      s"${ev.value} = $cms.estimateCount($item.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsEstimate {
  def apply(item: Column, sketch: CountMinSketch): Column = {
    val out = new java.io.ByteArrayOutputStream()
    sketch.writeTo(out)
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(item), out.toByteArray))
  }
}
