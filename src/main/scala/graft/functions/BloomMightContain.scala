package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe over a LONG key column — the
  * probe-side half of a Bloom-prefiltered join ([[graft.ops.BloomJoin]]).
  *
  * The serialized filter rides the expression (and therefore the plan) to
  * the executors; each task deserializes it once (`@transient lazy`) and
  * the probe is a codegen'd O(numHashes) bit test with NO shuffle, NO
  * broadcast-hash-table build, and NO driver round-trip per row — the
  * standard trick for cutting a big scan down to near-match volume before
  * an exact join settles false positives. Guarantee: no false negatives
  * (`mightContain` is a superset test), so `prefilter + exact join` is
  * result-identical to the exact join alone.
  *
  * Sizing: a filter for n keys at fpp f costs ~-1.44·n·log2(f) bits
  * (~9 KB for 10k keys at 1%); at 100 TB the build side's keys must stay
  * driver-collectable (it is the BROADCAST side of the join this
  * accelerates) — for bigger build sides, partition both sides instead.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs an integral key, got ${t.sql}")
    }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(key: Any): Any = key match {
    case l: java.lang.Long => filter.mightContainLong(l)
    case i: java.lang.Integer => filter.mightContainLong(i.longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, key =>
      s"${ev.value} = $bf.mightContainLong((long) $key);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, filter: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), out.toByteArray))
  }
}
