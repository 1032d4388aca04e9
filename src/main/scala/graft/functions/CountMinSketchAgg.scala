package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a MERGEABLE native
  * aggregate — the fixed-size counting complement to [[MisraGriesSketch]]
  * (which keeps CANDIDATES; this keeps COUNTS). State is a d×w Long
  * array, FIXED at construction regardless of the key domain — the 100
  * TB property: executors fold their partitions into 4096 counters
  * locally and the shuffle moves one array per partial buffer, never a
  * per-key row. Merge is elementwise sum, which makes the sketch exactly
  * associative: ANY partition of the input — across executors, or across
  * STREAMING micro-batches — folds to the identical counter array, the
  * property StreamingSpec asserts for [[graft.streaming.StreamingOps
  * .cmsStream]] and the relational q254 states as an oracle contract.
  *
  * Estimate = min over the d row counters for a key: structurally never
  * an undercount, and over-counting is bounded by Markov — for each row,
  * E[overcount] ≤ n/w, so P[overcount > 4n/w on all 4 independent rows]
  * is vanishing (q254's oracle-asserted envelope).
  *
  * Hashing is engine-deterministic Scala (FNV-1a fingerprint, splitmix64
  * row seeds): the SKETCH ARRAY itself is reproducible across runs and
  * across any update/merge order, so the spec can compare streaming and
  * batch arrays bit-for-bit.
  */
case class CountMinSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(d >= 1 && d <= 16, s"depth must be in [1, 16], got $d")
  require(w >= 2, s"width must be >= 2, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val fp = CountMinSketchAgg.fingerprint(
        v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < d) {
        buf(i * w + CountMinSketchAgg.index(fp, i, w)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(_.asInstanceOf[Any]))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    // fail loudly on a truncated or foreign buffer (e.g. a sketch
    // serialized with different d/w) instead of surfacing as an
    // EOFException deep inside DataInputStream
    require(bytes.length == d * w * 8,
      s"cms_sketch buffer is ${bytes.length} bytes, expected ${d * w * 8} " +
        s"(d=$d, w=$w) — was this sketch serialized with different d/w?")
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildInternal(c: Expression)
      : CountMinSketchAgg = copy(child = c)

  override def prettyName: String = "cms_sketch"
}

object CountMinSketchAgg {
  /** 64-bit FNV-1a over the key bytes — the stable fingerprint the d
    * row hashes derive from (one byte pass per row, not d). */
  def fingerprint(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }

  private def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Row i's bucket for fingerprint `fp` — splitmix64 of the seeded
    * fingerprint keeps the d rows pairwise independent. */
  def index(fp: Long, i: Int, w: Int): Int =
    ((splitmix64(fp ^ (i.toLong * 0x9e3779b97f4a7c15L)) >>> 1) % w).toInt

  /** Point estimate from an evaluated sketch array: min over rows —
    * never under the true count (every row only ever adds collisions).
    * Spec/driver-side helper; distributed consumers keep the array. */
  def estimate(sketch: IndexedSeq[Long], key: String, d: Int, w: Int): Long = {
    val fp = fingerprint(key.getBytes("UTF-8"))
    (0 until d).map(i => sketch(i * w + index(fp, i, w))).min
  }

  /** `Column` wrapper: `cms($"term", 4, 1024)` aggregates to a flat
    * array<long> of d×w counters. */
  def cms(c: Column, d: Int, w: Int): Column =
    ExprBridge.column(
      CountMinSketchAgg(ExprBridge.expression(c), d, w)
        .toAggregateExpression())
}
