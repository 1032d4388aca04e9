package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Exact per-group top-k as a BOUNDED-HEAP native aggregate — the
  * partial-aggregation answer to "top 5 per segment over 100 TB".
  *
  * The window spelling (`ROW_NUMBER() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k`) sorts EVERY group's full row set after shuffling every
  * fact row to its group's task; this aggregate keeps at most `k`
  * (value, id) slots per partial buffer, so each map task ships k
  * entries per group it saw and the reduce side merges heaps — the
  * per-group generalization of what `TakeOrderedAndProject` does for a
  * global LIMIT+ORDER BY. Skewed groups cost k slots like any other
  * group, where the window plan concentrates the hot group's entire
  * row set on one task.
  *
  * Ordering is total and deterministic: value DESC, id ASC on ties —
  * so the emitted array is reproducible and the DuckDB window oracle
  * states the same rows. Nulls in either child are skipped.
  */
case class TopKByAggregate(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be positive")

  override def left: Expression = value
  override def right: Expression = id

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (double, bigint), got (${value.dataType}, ${id.dataType})")

  /** Max-heap whose root is the WORST kept entry (smallest value;
    * among equal values the largest id), so one dequeue evicts it.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // smaller v = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // bigger id
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      // + 0.0 collapses -0.0 to +0.0 on enqueue (NaN passes through),
      // so Double.compare's total order agrees with SQL ORDER BY —
      // which treats the zero signs as equal and tie-breaks by id —
      // everywhere downstream: eviction, merge, and the emitted sort.
      buf.enqueue((v.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Ascending by worstFirst (java.lang.Double.compare) = v DESC, id
    // ASC — the SAME total order the heap evicts by, so NaN keys keep
    // a strict weak order; ±0.0 were canonicalized on enqueue, so the
    // zero signs tie-break by id exactly as a SQL window oracle does.
    val arr = buf.toArray.sorted(worstFirst)
    new GenericArrayData(arr.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, i)): Any
    })
  }

  override def serialize(
      buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, i) => out.writeDouble(v); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByAggregate =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): TopKByAggregate =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKByAggregate =
    copy(value = l, id = r)

  override def prettyName: String = "top_k_by"
}

object TopKByAggregate {
  /** `topKBy($"price", $"order_id", 5)` aggregates to the top-5
    * (v, id) structs by value DESC (id ASC on ties), heap-bounded.
    */
  def topKBy(value: Column, id: Column, k: Int): Column =
    ExprBridge.column(TopKByAggregate(
      ExprBridge.expression(value), ExprBridge.expression(id), k)
      .toAggregateExpression())
}

/** Exact per-group BOTTOM-k — [[TopKByAggregate]] with the total order
  * flipped (value ASC, id ASC on ties), because the k-smallest problem
  * is what weighted sampling without replacement reduces to: with key
  * -ln(u)/w per row (Efraimidis & Spirakis 2006's exponential form;
  * q164's spelling), the k SMALLEST keys ARE an exact
  * weighted sample of size k. As a bounded-heap native aggregate the
  * sample is mergeable — map tasks ship ≤k slots per group however
  * skewed the group, and the merge path doubles as Structured
  * Streaming's state update, which is what gives the sampling family
  * its streaming twin ([[graft.streaming.StreamingOps.weightedSampleStream]])
  * — where the window spelling (`ROW_NUMBER ... ORDER BY key`) sorts
  * every group's full row set after concentrating it on one task.
  */
case class BottomKByAggregate(
    value: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be positive")

  override def left: Expression = value
  override def right: Expression = id

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (double, bigint), got (${value.dataType}, ${id.dataType})")

  /** Heap root = the WORST kept entry: LARGEST value; among equal
    * values the largest id — one dequeue evicts it. */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1) // larger v = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // bigger id
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = value.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      // + 0.0 collapses -0.0 to +0.0 on enqueue (NaN passes through) —
      // same rationale as TopKByAggregate.update: Double.compare then
      // matches the SQL ORDER BY zero-sign semantics everywhere.
      buf.enqueue((v.asInstanceOf[Double] + 0.0, i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Sort with the SAME total order the heap evicts by (worstFirst
    // reversed): java.lang.Double.compare, not primitive </==, so NaN
    // keys stay a strict weak order (timsort contract); ±0.0 were
    // canonicalized on enqueue, so zero signs tie-break by id as a
    // SQL window oracle does.
    val arr = buf.toArray.sorted(worstFirst) // ascending = v ASC, id ASC
    new GenericArrayData(arr.map { case (v, i) =>
      new GenericInternalRow(Array[Any](v, i)): Any
    })
  }

  override def serialize(
      buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, i) => out.writeDouble(v); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(
      bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKByAggregate =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): BottomKByAggregate =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BottomKByAggregate =
    copy(value = l, id = r)

  override def prettyName: String = "bottom_k_by"
}

object BottomKByAggregate {
  /** `bottomKBy($"key", $"doc_id", 20)` aggregates to the 20 smallest
    * (v, id) structs by value ASC (id ASC on ties), heap-bounded.
    */
  def bottomKBy(value: Column, id: Column, k: Int): Column =
    ExprBridge.column(BottomKByAggregate(
      ExprBridge.expression(value), ExprBridge.expression(id), k)
      .toAggregateExpression())
}
