package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that REFUSES whole-stage codegen — the codegen-stage
  * BOUNDARY tool, used where a huge-but-cheap scalar tree would otherwise
  * be compiled INTO a corpus-scale operator's generated method and blow
  * Janino's method-size limit, knocking the whole stage (the expensive
  * operator included) back to interpreted eval.
  *
  * The concrete case: [[graft.ops.Audit.dpCounts]]/[[graft.ops.Audit
  * .dpSum]] add Laplace noise built from TWO 17-term portable-ln Horner
  * chains. Projection collapse fuses that projection into the group-by
  * aggregation's output, the combined generated method fails to compile,
  * and Spark silently runs the ENTIRE aggregation interpreted (observed:
  * `ERROR CodeGenerator: Failed to compile` on every dp query). Wrapping
  * the noise in NoCodegen closes the codegen span ABOVE the aggregation —
  * the corpus-scale aggregate keeps its own WholeStageCodegen stage, and
  * only the |groups|-row noise projection evaluates interpreted, which is
  * exactly the repo rule: CodegenFallback is fine in tiny frames, never
  * upstream of a wide materializing stage. */
case class NoCodegen(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(newChild: Expression): NoCodegen =
    copy(child = newChild)
}

object NoCodegen {
  def apply(c: Column): Column =
    ColumnBridge.column(NoCodegen(ColumnBridge.expression(c)))
}
