package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** DDSketch (Masson, Rim & Lee, VLDB 2019) as a MERGEABLE native
  * aggregate — the quantile member of the bounded-state sketch family
  * beside [[CountMinSketchAgg]] (counts) and Misra-Gries (candidates):
  * a fully-mergeable quantile summary with a RELATIVE-error guarantee.
  *
  * Positive values land in logarithmic buckets i = ⌈ln x / ln γ⌉ with
  * γ = (1+α)/(1−α); the bucket midpoint 2γ^i/(γ+1) is then within
  * relative error α of EVERY value in the bucket, so any rank walk over
  * the bucket counts returns a quantile estimate within α of the exact
  * order statistic of the same rank — the guarantee q287 states as an
  * oracle-checked contract. Values ≤ 0 (absent from the fixtures, but
  * the aggregate must not corrupt on them) count into a reserved
  * underflow bucket that any quantile walk reports as 0.0.
  *
  * State is the bucket-count map: at α = 1% that is ≤ ~71k buckets over
  * the ENTIRE positive double range and a few hundred on any real value
  * distribution — past `maxBuckets` the lowest buckets collapse into
  * one (the paper's eviction, preserving upper-quantile accuracy).
  * Merge is bucket-wise sum — exactly associative while no collapse
  * triggers, so ANY partition of the input (executors, or STREAMING
  * micro-batches) folds to the identical bucket array, the property
  * StreamingSpec asserts for [[graft.streaming.StreamingOps
  * .quantileStream]] bit for bit. (A collapse, like the paper's, is
  * trigger-order dependent; it only engages past maxBuckets, where the
  * α guarantee on upper quantiles — not the byte layout — remains the
  * contract.)
  *
  * Evaluates to a flat sorted array<long> of (bucket, count) pairs
  * [b0, c0, b1, c1, …] — deterministic for bit-equality tests and
  * trivially explodable for a relational rank walk.
  */
case class DdSketchAgg(
    child: Expression,
    alpha: Double,
    maxBuckets: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeMap[Int, Long]]
    with UnaryLike[Expression] {

  require(alpha > 0 && alpha < 1, s"alpha must be in (0, 1), got $alpha")
  require(maxBuckets >= 16, s"maxBuckets must be >= 16, got $maxBuckets")

  private val gamma = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  /** Reserved bucket for values <= 0. Int.MinValue sorts first, so the
    * flattened pair array keeps the underflow count in front. */
  private val Underflow = Int.MinValue

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types
    .LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected double input, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.TreeMap[Int, Long] =
    mutable.TreeMap.empty[Int, Long]

  private def add(buf: mutable.TreeMap[Int, Long], b: Int, n: Long): Unit = {
    buf.updateWith(b) {
      case Some(c) => Some(c + n)
      case None    => Some(n)
    }
    if (buf.size > maxBuckets) {
      // collapse the two lowest buckets (paper §2.3): low quantiles blur,
      // the upper-quantile guarantee survives any number of collapses
      val (b0, c0) = buf.head
      buf.remove(b0)
      val (b1, c1) = buf.head
      buf.update(b1, c1 + c0)
    }
  }

  override def update(buf: mutable.TreeMap[Int, Long],
                      input: InternalRow): mutable.TreeMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val b = if (x > 0) math.ceil(math.log(x) / logGamma).toInt
              else Underflow
      add(buf, b, 1L)
    }
    buf
  }

  override def merge(buf: mutable.TreeMap[Int, Long],
                     other: mutable.TreeMap[Int, Long])
      : mutable.TreeMap[Int, Long] = {
    other.foreach { case (b, c) => add(buf, b, c) }
    buf
  }

  override def eval(buf: mutable.TreeMap[Int, Long]): Any = {
    val out = new Array[Long](buf.size * 2)
    var i = 0
    buf.foreach { case (b, c) =>
      out(i) = b.toLong; out(i + 1) = c; i += 2
    }
    new GenericArrayData(out.map(_.asInstanceOf[Any]))
  }

  override def serialize(buf: mutable.TreeMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 12)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (b, c) => out.writeInt(b); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Int, Long] = {
    require(bytes.length >= 4,
      s"dd_sketch buffer is ${bytes.length} bytes, expected at least 4")
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    require(bytes.length == 4 + n * 12,
      s"dd_sketch buffer is ${bytes.length} bytes, expected ${4 + n * 12} " +
        s"for $n buckets — was this sketch serialized differently?")
    val buf = mutable.TreeMap.empty[Int, Long]
    var i = 0
    while (i < n) { buf.update(in.readInt(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): DdSketchAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildInternal(c: Expression): DdSketchAgg =
    copy(child = c)

  override def prettyName: String = "dd_sketch"
}

object DdSketchAgg {

  /** `Column` wrapper: `ddSketch($"value", 0.01)` aggregates to a flat
    * sorted array<long> of (bucket, count) pairs. */
  def ddSketch(c: Column, alpha: Double, maxBuckets: Int = 2048): Column =
    ExprBridge.column(
      DdSketchAgg(ExprBridge.expression(c), alpha, maxBuckets)
        .toAggregateExpression())

  /** Driver/spec-side quantile walk over an evaluated pair array:
    * the value whose rank is ⌈q·n⌉ in the bucket CDF, reported as the
    * bucket midpoint 2γ^b/(γ+1) (underflow bucket → 0.0). */
  def quantile(pairs: IndexedSeq[Long], alpha: Double, q: Double): Double = {
    val gamma = (1 + alpha) / (1 - alpha)
    val n = (1 until pairs.length by 2).map(pairs).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < pairs.length) {
      cum += pairs(i + 1)
      if (cum >= target) {
        val b = pairs(i).toInt
        return if (b == Int.MinValue) 0.0
               else 2.0 * math.pow(gamma, b) / (gamma + 1)
      }
      i += 2
    }
    0.0
  }
}
