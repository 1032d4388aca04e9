package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a MERGEABLE native aggregate —
  * the bounded-state answer to "top tokens over 100 TB of text".
  *
  * An exact `groupBy(token).count` shuffles every distinct key; over a
  * web-scale corpus the token domain is billions of keys, nearly all of
  * which are irrelevant to a heavy-hitter question. This aggregate keeps
  * at most `k` (token, count) slots per partial buffer, so the shuffle
  * carries `k` entries per map task no matter how large the key domain
  * grows — the same partial-aggregation contract Spark's own
  * `hll_sketch_agg` / `percentile_approx` sketches follow.
  *
  * Guarantee (Misra-Gries 1982; merge bound per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with `k` counters the summary's
  * undercount is at most n/(k+1) TOTAL — including across `merge` —
  * so every item with true frequency > n/(k+1) is guaranteed present.
  * The consumer (q197) therefore uses the sketch only to nominate
  * candidates, then recounts exactly on the candidate set (a broadcast
  * semi-join, not a full-domain shuffle) — the final answer is EXACT;
  * the sketch just bounds the state. The reference has no frequent-items
  * path at all — this is part of the mandated extension surface.
  *
  * Determinism: the emitted map's stored counts depend on encounter
  * order, but the KEY SET above the n/(k+1) floor does not — and only
  * the key set feeds q197's exact recount, so the query output is
  * order-independent. Update amortizes O(1) per row: each decrement
  * round wipes k+1 units of mass, so rounds number at most n/(k+1).
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "k must be positive")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L, owned = false)
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    // weighted-add merge: each of the other summary's (key, count)
    // entries replays through add() with its full weight, whose
    // decrement rounds keep the buffer at <= k slots throughout — the
    // buffer can never exceed k afterwards, so no separate shrink pass
    // is needed. Each decrement round cancels (k+1) units of mass, so
    // the total undercount stays <= n/(k+1) across any merge tree
    // (Agarwal et al., "Mergeable Summaries", PODS'12 §3.1's bound
    // holds for weighted updates).
    other.foreach { case (key, c) => add(buf, key, c, owned = true) }
    buf
  }

  /** Add `c` occurrences of `key`. `owned` = false means `key` may alias
    * reused UnsafeRow memory and must be cloned before being stored.
    */
  private def add(
      buf: mutable.HashMap[UTF8String, Long],
      key: UTF8String,
      c: Long,
      owned: Boolean): Unit = {
    buf.get(key) match {
      case Some(cur) => buf.update(key, cur + c)
      case None =>
        if (buf.size < k) buf.update(if (owned) key else key.clone(), c)
        else {
          // decrement round: incoming mass `c` cancels against the floor
          // of the resident counts; survivors keep the difference
          val dec = math.min(c, buf.valuesIterator.min)
          val keys = buf.keysIterator.toArray
          keys.foreach { kk =>
            val nv = buf(kk) - dec
            if (nv <= 0L) buf.remove(kk) else buf.update(kk, nv)
          }
          val rem = c - dec
          if (rem > 0L && buf.size < k)
            buf.update(if (owned) key else key.clone(), rem)
        }
    }
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic key order (bytewise) so the emitted map is stable
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)

  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)

  override protected def withNewChildInternal(c: Expression): MisraGriesSketch =
    copy(child = c)

  override def prettyName: String = "misra_gries_sketch"
}

object MisraGriesSketch {
  /** `Column` wrapper: `misraGries($"tok", 256)` aggregates to a
    * map<string,long> of at most 256 candidate heavy hitters.
    */
  def misraGries(c: Column, k: Int): Column =
    ExprBridge.column(
      MisraGriesSketch(ExprBridge.expression(c), k).toAggregateExpression())
}
