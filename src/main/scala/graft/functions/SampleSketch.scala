package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic bounded SAMPLE sketch — [[KmvSketch]]'s sibling for
  * QUANTILE estimation: keeps the `k` (hash, value) pairs with the
  * smallest hashes. Because a uniform content hash orders rows uniformly
  * at random — but reproducibly — the kept values are a uniform sample
  * of the group that is a pure function of the data: the same sample on
  * every rerun, every partitioning, and in the DuckDB oracle (contrast
  * reservoir sampling, which depends on encounter order, and t-digest/
  * KLL, whose compactions are implementation-specific).
  *
  * Mergeability is the 100 TB story: the buffer is a bounded sorted map,
  * map-side partials ship ≤ k pairs per partition, and min-k-by-hash is
  * associative and commutative — per-group quantile estimates in one
  * pass with fixed memory and no full sort of the value column.
  *
  * Hash collisions (two rows, one hash) keep the SMALLEST value —
  * arbitrary but deterministic, mirrored in the oracle's
  * `min(value) … GROUP BY hash`.
  */
case class SampleSketch(hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {

  require(k >= 1)

  override def children: Seq[Expression] = Seq(hash, value)

  /** Analysis-time type gate: both children must be LongType — without it
    * a mistyped hash/value column compiles and ClassCastExceptions at
    * execution, deep inside a stage. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hash.dataType == LongType && value.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SampleSketch requires (BIGINT hash, BIGINT value) children, got " +
          s"(${hash.dataType.simpleString}, ${value.dataType.simpleString})")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
    new java.util.TreeMap[java.lang.Long, java.lang.Long]()

  private def trim(b: java.util.TreeMap[java.lang.Long, java.lang.Long]): Unit =
    while (b.size > k) b.pollLastEntry()

  private def put(b: java.util.TreeMap[java.lang.Long, java.lang.Long],
      h: Long, v: Long): Unit = {
    val prev = b.get(h)
    if (prev == null || v < prev) b.put(h, v)
    trim(b)
  }

  override def update(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null) {
      val hl = h.asInstanceOf[Long]
      if (buffer.size < k || hl <= buffer.lastKey())
        put(buffer, hl, v.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long],
      other: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(buffer, e.getKey, e.getValue)
    }
    buffer
  }

  /** The sample VALUES in hash order (the uniform-random order) — sort
    * with `array_sort` before rank/quantile extraction. */
  override def eval(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size)
    val it = buffer.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    val n = in.readInt()
    var i = 0
    while (i < n) { b.put(in.readLong(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleSketch =
    copy(hash = newChildren(0), value = newChildren(1))
}

object SampleSketch {
  /** Column API: the values of the k smallest-hash rows, in hash order. */
  def apply(hash: Column, value: Column, k: Int): Column =
    ColumnBridge.column(
      SampleSketch(ColumnBridge.expression(hash),
        ColumnBridge.expression(value), k).toAggregateExpression())

  /** Rank-`q`-percent element of the SORTED sample (nearest-rank with
    * exact integer index math: index = (size−1)·q/100, 0-based) — the
    * quantile estimate the sample exists for. An EMPTY sample (a group
    * whose hash/value inputs were all NULL) yields NULL instead of an
    * invalid element_at index 0. */
  def quantile(sortedSample: Column, qPercent: Int): Column = {
    import org.apache.spark.sql.functions._
    require(qPercent >= 0 && qPercent <= 100)
    when(size(sortedSample) > 0,
      element_at(sortedSample,
        ((size(sortedSample) - 1) * qPercent / 100 + 1).cast(IntegerType)))
  }
}
