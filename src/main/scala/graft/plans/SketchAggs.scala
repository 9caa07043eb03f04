package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory HEAVY-HITTER summary (Misra–Gries) as a custom
  * [[TypedImperativeAggregate]] — the whole-aggregate extension point
  * the scalar expressions in [[HashExprs]] can't cover.
  *
  * Why it exists: an exact top-k over a high-cardinality key
  * ([[graft.operators.Analytics.skewReport]]) shuffles one row per
  * distinct key — at 100 TB that is the full key census. Misra–Gries
  * holds k counters per partial (a few hundred bytes), merges
  * associatively in the reduce (the same shape HLL/quantile sketches
  * use), and guarantees: every key with true frequency > N/(k+1)
  * survives, and each reported count is within N/(k+1) BELOW its true
  * frequency (never above). When the key's distinct count is ≤ k the
  * summary never evicts and the counts are EXACT — which is what the
  * oracle gate exercises (bounded-domain key, exact counts through
  * the multi-partition merge path); the eviction/trim path is
  * spec-pinned on a synthetic skewed fixture.
  *
  * Buffer is a plain hash map serialized with a length-prefixed
  * stream; `eval` emits array<struct<item, cnt>> sorted by
  * (cnt desc, item) so output order is deterministic.
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "heavy-hitter capacity must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1
        case None if buf.size < k => buf(key) = 1L
        case None =>
          // classic MG step: an unseen key past capacity decrements
          // every counter; zeros free their slots
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { kk =>
            val nc = buf(kk) - 1
            if (nc == 0) dead += kk else buf(kk) = nc
          }
          dead.foreach(buf -= _)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1(key) = b1.getOrElse(key, 0L) + c }
    if (b1.size > k) {
      // mergeable-summaries trim: subtract the (k+1)-th largest count
      // from everyone, drop the non-positive — restores size ≤ k with
      // the same N/(k+1) error bound (Agarwal et al., PODS'12)
      val cStar = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { kk =>
        val nc = b1(kk) - cStar
        if (nc <= 0) dead += kk else b1(kk) = nc
      }
      dead.foreach(b1 -= _)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf(in.readUTF()) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "heavy_hitters"
}

object SketchAggs {
  /** Column form: `heavyHitters(col("event_type"), 8)` aggregates to
    * the sorted array<struct<item, cnt>> summary.
    */
  def heavyHitters(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(c), k).toAggregateExpression())
}
