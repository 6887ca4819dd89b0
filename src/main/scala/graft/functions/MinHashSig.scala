package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native MinHash-signature expression: `array<string>` shingles →
  * `array<long>` of `numHashes` affine-permuted minima.
  *
  * One fused whole-stage-codegen pass replaces the higher-order-function
  * pipeline in [[graft.text.Dedup.minhashSignature]] (HOFs don't codegen;
  * interpreted eval allocates a 64-wide array per shingle). Hashing matches
  * Spark's `xxhash64` (XXH64 over UTF8 bytes, seed 42) followed by the same
  * fold/affine steps, so signatures are bit-identical to the expression
  * version.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 2147483647L

  // Deterministic affine family — keep in sync with graft.text.Dedup.
  private lazy val coefA: Array[Long] =
    Array.tabulate(numHashes)(i => 2654435761L * (i + 1) % P | 1L)
  private lazy val coefB: Array[Long] =
    Array.tabulate(numHashes)(i => 40503L * (i + 7) * 2654435769L % P)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = Array.fill(numHashes)(P)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val x = ((h % P) + P) % P
        var j = 0
        while (j < numHashes) {
          val v = (coefA(j) * x + coefB(j)) % P
          if (v < acc(j)) acc(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashCoefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashCoefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      s"""
        long[] $acc = new long[$numHashes];
        java.util.Arrays.fill($acc, ${P}L);
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if (!$arr.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
            long $x = org.apache.spark.sql.catalyst.expressions.XXH64
              .hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            $x = (($x % ${P}L) + ${P}L) % ${P}L;
            for (int $j = 0; $j < $numHashes; $j++) {
              long $v = ($aRef[$j] * $x + $bRef[$j]) % ${P}L;
              if ($v < $acc[$j]) $acc[$j] = $v;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column API: minhash signature of a string-array column. */
  def apply(shingles: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
