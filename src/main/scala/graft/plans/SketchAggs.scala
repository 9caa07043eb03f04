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

/** Bounded-heap TOP-K per group as a custom
  * [[TypedImperativeAggregate]] — the aggregate form of "top n rows
  * per key".
  *
  * Why it exists: the row_number-window formulation
  * ([[graft.operators.Analytics.topOrdersPerCustomer]]) shuffles
  * EVERY raw row to its key's partition and sorts whole partitions,
  * only to discard all but k rows — at 100 TB that is a full-data
  * exchange plus a full sort to keep a few rows per key. This
  * aggregate keeps a k-element min-heap per group per partition
  * (map-side partial), so the shuffle carries ≤ k rows per (group ×
  * partition) and nothing is ever globally sorted. Exact, not a
  * sketch: top-k under a total order is associatively mergeable.
  *
  * Ordering: higher `ord` wins; ties break to the SMALLER `payload`
  * (payload ids are unique), making the result total-ordered and
  * deterministic under any partition merge order. `eval` emits
  * array<struct<payload, ord>> best-first.
  */
case class TopKByOrd(ord: Expression, payload: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, "top-k capacity must be positive")

  // max-of-ordering = WORST kept entry, so the heap head is the
  // eviction candidate: smaller ord is worse; same ord, larger
  // payload is worse
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    pair: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) { buf.dequeue(); buf.enqueue(pair) }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      offer(buf, (o.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach(offer(b1, _))
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending under worstFirst = best first (the ordering's max is
    // the worst entry)
    val best = buf.toSeq.sorted(worstFirst)
    new GenericArrayData(best.map { case (o, p) =>
      InternalRow(p, o)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (o, p) => out.writeDouble(o); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByOrd =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByOrd =
    copy(inputAggBufferOffset = newOffset)
  override def left: Expression = ord
  override def right: Expression = payload
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKByOrd =
    copy(ord = newLeft, payload = newRight)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("payload", LongType, nullable = false),
    StructField("ord", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by"
}

/** BLOOM FILTER build as a custom [[TypedImperativeAggregate]] — the
  * runtime-filter pattern: aggregate the (small) build side's key set
  * into a kilobyte bitset, broadcast it, and pre-filter the (huge)
  * probe side BEFORE its shuffle, so rows that cannot join never leave
  * their scan task. At 100 TB this is the difference between shuffling
  * the full fact table into a semi join and shuffling only the ~σ
  * fraction that might match (false positives are culled by the exact
  * join after — the bloom never changes results, only bytes moved).
  *
  * The child is the PRE-HASHED position array (`pmod(xxhash64(key, i),
  * numBits)` per hash function, computed by codegen'd built-ins before
  * the aggregate) rather than the raw key: build and probe evaluate
  * the IDENTICAL Spark expressions, so the filter needs no Scala-side
  * reimplementation of xxhash64 that could drift from the engine's.
  * `update` only sets bits; `merge` ORs words — associative, partial-
  * aggregation-friendly, constant size.
  */
case class BloomAgg(child: Expression, numBits: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  private def numWords: Int = numBits / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val pos = arr.getLong(i)
        buf((pos >>> 6).toInt) |= (1L << (pos & 63))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < numWords) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < numWords) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"
}

/** ONE-PASS power-iteration step for [[graft.operators.Similarity.embedPcaPower]]:
  * w[j] = Σ_rows round6(x[j] · round6(x · v)) as exact decimal(38,6) —
  * the whole per-iteration reduction fused into a single aggregate, so
  * each iteration is ONE narrow scan of the cached vectors instead of
  * a 64-way posexplode + d-group shuffle (the old plan moved |rows|·d
  * (dim, decimal) rows through an exchange per iteration; this moves
  * d decimals per partition).
  *
  * Bit-equivalence with the SQL form it replaces (spec-pinned in
  * HashExprsSpec and gated by the embed_pca_power oracle):
  *  - the dot is the same sequential left fold of IEEE double
  *    multiply-adds `aggregate(zip_with(e, v, a·b), 0.0, acc+x)`
  *    evaluates, then `BigDecimal.valueOf(dot).setScale(6, HALF_UP)
  *    .doubleValue` — exactly Spark's `round(_, 6)` on DoubleType;
  *  - each contribution replays `round(x·dot, 6).cast(decimal(28,6))`:
  *    valueOf-based 6dp rounding, then the 6dp-exact unscaled long;
  *  - the per-dimension sum accumulates unscaled 1e-6 units in a long
  *    with exact-overflow promotion into a BigInteger spill (decimal
  *    sum semantics at any corpus size);
  *  - rows whose vector is null, not of length d, or contains a null /
  *    non-finite-producing element contribute exactly what the SQL
  *    form's null-propagating pipeline contributed: nothing.
  * A dimension with no non-null contribution evaluates to null (sum
  * semantics); a corpus with no vectors at all yields an empty array
  * (the old plan's empty group-by result).
  */
case class PcaPowerStep(child: Expression, v: Seq[Double],
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PcaPowerStep.Buf]
  with UnaryLike[Expression] {

  private def d: Int = v.length
  private lazy val varr: Array[Double] = v.toArray

  override def createAggregationBuffer(): PcaPowerStep.Buf =
    new PcaPowerStep.Buf(new Array[Long](d),
      new Array[java.math.BigInteger](d), new Array[Long](d), 0L)

  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  override def update(buf: PcaPowerStep.Buf, input: InternalRow): PcaPowerStep.Buf = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    buf.rows += 1L
    if (arr.numElements() != d) return buf
    // null element ⇒ the zip_with/aggregate fold yields a null dot ⇒
    // every contribution of this row is null
    var i = 0
    while (i < d) { if (arr.isNullAt(i)) return buf; i += 1 }
    var acc = 0.0
    i = 0
    while (i < d) { acc = acc + arr.getDouble(i) * varr(i); i += 1 }
    val dot = round6(acc)
    if (java.lang.Double.isNaN(dot) || java.lang.Double.isInfinite(dot)) return buf
    i = 0
    while (i < d) {
      val t = round6(arr.getDouble(i) * dot)
      if (!java.lang.Double.isNaN(t) && !java.lang.Double.isInfinite(t)) {
        // cast(double as decimal(28,6)): valueOf (decimal-string)
        // semantics, setScale(6, HALF_UP), exact unscaled units
        val u = java.math.BigDecimal.valueOf(t)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .unscaledValue()
        if (u.bitLength() < 63) {
          val ul = u.longValue()
          val s = buf.acc(i) + ul
          // overflow check (Math.addExact shape, no exception)
          if (((buf.acc(i) ^ s) & (ul ^ s)) < 0) {
            val sp = if (buf.spill(i) == null) java.math.BigInteger.ZERO else buf.spill(i)
            buf.spill(i) = sp.add(java.math.BigInteger.valueOf(buf.acc(i)))
              .add(java.math.BigInteger.valueOf(ul))
            buf.acc(i) = 0L
          } else buf.acc(i) = s
        } else {
          val sp = if (buf.spill(i) == null) java.math.BigInteger.ZERO else buf.spill(i)
          buf.spill(i) = sp.add(u)
        }
        buf.cnt(i) += 1L
      }
      i += 1
    }
    buf
  }

  override def merge(b1: PcaPowerStep.Buf, b2: PcaPowerStep.Buf): PcaPowerStep.Buf = {
    b1.rows += b2.rows
    var i = 0
    while (i < d) {
      val s = b1.acc(i) + b2.acc(i)
      if (((b1.acc(i) ^ s) & (b2.acc(i) ^ s)) < 0) {
        val sp = if (b1.spill(i) == null) java.math.BigInteger.ZERO else b1.spill(i)
        b1.spill(i) = sp.add(java.math.BigInteger.valueOf(b1.acc(i)))
          .add(java.math.BigInteger.valueOf(b2.acc(i)))
        b1.acc(i) = 0L
      } else b1.acc(i) = s
      if (b2.spill(i) != null) {
        val sp = if (b1.spill(i) == null) java.math.BigInteger.ZERO else b1.spill(i)
        b1.spill(i) = sp.add(b2.spill(i))
      }
      b1.cnt(i) += b2.cnt(i)
      i += 1
    }
    b1
  }

  override def eval(buf: PcaPowerStep.Buf): Any = {
    if (buf.rows == 0L) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](d)
    var i = 0
    while (i < d) {
      out(i) =
        if (buf.cnt(i) == 0L) null
        else {
          val total =
            (if (buf.spill(i) == null) java.math.BigInteger.ZERO else buf.spill(i))
              .add(java.math.BigInteger.valueOf(buf.acc(i)))
          org.apache.spark.sql.types.Decimal(
            new java.math.BigDecimal(total, 6), 38, 6)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: PcaPowerStep.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.rows)
    var i = 0
    while (i < d) {
      out.writeLong(buf.acc(i)); out.writeLong(buf.cnt(i))
      if (buf.spill(i) == null) out.writeInt(0)
      else {
        val b = buf.spill(i).toByteArray
        out.writeInt(b.length); out.write(b)
      }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PcaPowerStep.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.rows = in.readLong()
    var i = 0
    while (i < d) {
      buf.acc(i) = in.readLong(); buf.cnt(i) = in.readLong()
      val len = in.readInt()
      if (len > 0) {
        val b = new Array[Byte](len); in.readFully(b)
        buf.spill(i) = new java.math.BigInteger(b)
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PcaPowerStep =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PcaPowerStep =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PcaPowerStep =
    copy(child = newChild)

  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 6), containsNull = true)
  override def prettyName: String = "pca_power_step"
}

object PcaPowerStep {
  /** d unscaled-long accumulators (1e-6 units) + lazy BigInteger
    * spill per dim + non-null-contribution counts + total rows seen.
    */
  final class Buf(val acc: Array[Long],
                  val spill: Array[java.math.BigInteger],
                  val cnt: Array[Long],
                  var rows: Long)
}

/** ONE-PASS per-(list, dim) centroid sums for the Lloyd's iterations in
  * [[graft.operators.Similarity.trainCodebook]] /
  * [[graft.operators.Similarity.trainTwoLevelCodebook]]: the centroid
  * update Σ x[pos], count per (list_id, pos) fused into a single
  * aggregate over (list_id, embedding) rows — replacing a d-way
  * posexplode + (k·d)-group decimal group-by that moved |rows|·d
  * (list, pos, decimal) rows through an exchange per training round.
  * The assignment expression stays in the (codegen'd) projection
  * feeding the aggregate, so this works for any list source: the flat
  * nearest-centroid pass, the factored two-level assignment, or a
  * persisted list_id column.
  *
  * Bit-equivalence with the SQL form it replaces (spec-pinned, and the
  * trained codebooks feed oracle-gated index builds):
  *  - each element replays `cast(x as decimal(28,12))` — valueOf
  *    (decimal-string) semantics on the double-widened value, then
  *    setScale(12, HALF_UP) — accumulated as exact unscaled 1e-12
  *    units in a long with BigInteger overflow spill;
  *  - `n` counts EVERY exploded element (the SQL `count(lit(1))`
  *    counted null/NaN elements too; the sum excludes them, exactly
  *    like the decimal cast's null);
  *  - output rows appear only for (list, pos) groups that had at least
  *    one exploded element, sorted by (list_id, pos); `s` is null when
  *    every element of the group was null/non-finite (sum-of-nulls).
  */
case class CentroidSumsAgg(listId: Expression, emb: Expression,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[CentroidSumsAgg.Acc]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = listId
  override def right: Expression = emb

  @transient private lazy val isFloat =
    emb.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): mutable.LongMap[CentroidSumsAgg.Acc] =
    new mutable.LongMap[CentroidSumsAgg.Acc]()

  override def update(buf: mutable.LongMap[CentroidSumsAgg.Acc],
                      input: InternalRow): mutable.LongMap[CentroidSumsAgg.Acc] = {
    val lidAny = listId.eval(input)
    val embAny = emb.eval(input)
    if (lidAny == null || embAny == null) return buf
    val lid = lidAny.asInstanceOf[Int]
    val arr = embAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val key = (lid.toLong << 32) | (i.toLong & 0xFFFFFFFFL)
      val acc = buf.getOrNull(key) match {
        case null =>
          val a = new CentroidSumsAgg.Acc; buf(key) = a; a
        case a => a
      }
      acc.cnt += 1L
      if (!arr.isNullAt(i)) {
        val x: Double =
          if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (!java.lang.Double.isNaN(x) && !java.lang.Double.isInfinite(x)) {
          // cast(double as decimal(28,12)): valueOf semantics,
          // HALF_UP at scale 12, exact unscaled units
          val u = java.math.BigDecimal.valueOf(x)
            .setScale(12, java.math.RoundingMode.HALF_UP)
            .unscaledValue()
          if (u.bitLength() < 63) {
            val ul = u.longValue()
            val s = acc.acc + ul
            if (((acc.acc ^ s) & (ul ^ s)) < 0) {
              acc.spill = acc.spillOrZero
                .add(java.math.BigInteger.valueOf(acc.acc))
                .add(java.math.BigInteger.valueOf(ul))
              acc.acc = 0L
            } else acc.acc = s
          } else acc.spill = acc.spillOrZero.add(u)
          acc.hasSum = true
        }
      }
      i += 1
    }
    buf
  }

  override def merge(b1: mutable.LongMap[CentroidSumsAgg.Acc],
                     b2: mutable.LongMap[CentroidSumsAgg.Acc]): mutable.LongMap[CentroidSumsAgg.Acc] = {
    b2.foreach { case (key, a2) =>
      b1.getOrNull(key) match {
        case null => b1(key) = a2
        case a1 =>
          val s = a1.acc + a2.acc
          if (((a1.acc ^ s) & (a2.acc ^ s)) < 0) {
            a1.spill = a1.spillOrZero
              .add(java.math.BigInteger.valueOf(a1.acc))
              .add(java.math.BigInteger.valueOf(a2.acc))
            a1.acc = 0L
          } else a1.acc = s
          if (a2.spill != null)
            a1.spill = a1.spillOrZero.add(a2.spill)
          a1.cnt += a2.cnt
          a1.hasSum = a1.hasSum || a2.hasSum
      }
    }
    b1
  }

  override def eval(buf: mutable.LongMap[CentroidSumsAgg.Acc]): Any = {
    val keys = buf.keys.toArray.sorted
    val rows = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) {
      val key = keys(i)
      val a = buf(key)
      val s =
        if (!a.hasSum) null
        else {
          val total = a.spillOrZero.add(java.math.BigInteger.valueOf(a.acc))
          org.apache.spark.sql.types.Decimal(
            new java.math.BigDecimal(total, 12), 38, 12)
        }
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(
        (key >> 32).toInt, (key & 0xFFFFFFFFL).toInt, s, a.cnt)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.LongMap[CentroidSumsAgg.Acc]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, a) =>
      out.writeLong(key); out.writeLong(a.acc); out.writeLong(a.cnt)
      out.writeBoolean(a.hasSum)
      if (a.spill == null) out.writeInt(0)
      else {
        val b = a.spill.toByteArray
        out.writeInt(b.length); out.write(b)
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[CentroidSumsAgg.Acc] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      val a = new CentroidSumsAgg.Acc
      a.acc = in.readLong(); a.cnt = in.readLong(); a.hasSum = in.readBoolean()
      val len = in.readInt()
      if (len > 0) {
        val b = new Array[Byte](len); in.readFully(b)
        a.spill = new java.math.BigInteger(b)
      }
      buf(key) = a
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CentroidSumsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CentroidSumsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CentroidSumsAgg =
    copy(listId = newLeft, emb = newRight)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("list_id", IntegerType, nullable = false),
    StructField("pos", IntegerType, nullable = false),
    StructField("s", DecimalType(38, 12), nullable = true),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "centroid_sums"
}

object CentroidSumsAgg {
  /** Per-(list, pos) accumulator: unscaled-long sum (1e-12 units) with
    * lazy BigInteger spill, element count, and whether any non-null
    * finite element contributed (sum-of-nulls ⇒ null, like SQL sum).
    */
  final class Acc {
    var acc: Long = 0L
    var spill: java.math.BigInteger = null
    var cnt: Long = 0L
    var hasSum: Boolean = false
    def spillOrZero: java.math.BigInteger =
      if (spill == null) java.math.BigInteger.ZERO else spill
  }
}

object SketchAggs {
  /** Column form of [[CentroidSumsAgg]]: one-pass per-(list, dim)
    * centroid sums + counts for a Lloyd's update.
    */
  def centroidSums(listId: Column, emb: Column): Column =
    GraftSqlBridge.column(
      CentroidSumsAgg(GraftSqlBridge.expression(listId),
        GraftSqlBridge.expression(emb)).toAggregateExpression())

  /** Column form of [[PcaPowerStep]]: one-pass Σ round6(x[j]·round6(x·v)). */
  def pcaPowerStep(c: Column, v: Array[Double]): Column =
    GraftSqlBridge.column(
      PcaPowerStep(GraftSqlBridge.expression(c), v.toSeq).toAggregateExpression())

  /** Column form: `heavyHitters(col("event_type"), 8)` aggregates to
    * the sorted array<struct<item, cnt>> summary.
    */
  def heavyHitters(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(c), k).toAggregateExpression())

  /** Column form: `topKBy(ord, payload, k)` aggregates to the
    * best-first array<struct<payload, ord>> of the k rows with the
    * highest `ord` (ties to the smaller payload).
    */
  def topKBy(ord: Column, payload: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByOrd(GraftSqlBridge.expression(ord.cast("double")),
        GraftSqlBridge.expression(payload.cast("long")), k).toAggregateExpression())

  import org.apache.spark.sql.functions.{array, element_at, lit, pmod, shiftright, xxhash64}

  /** The k bloom positions of `key` — pmod(xxhash64(key, i), numBits)
    * per hash index, all codegen'd built-ins. Build and probe BOTH go
    * through this, so the two sides can never disagree on the hash.
    */
  def bloomPositions(key: Column, numBits: Int, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(numBits.toLong))): _*)

  /** Aggregate the build side's keys into an array<long> bitset. */
  def bloomAgg(key: Column, numBits: Int = 1 << 17, numHashes: Int = 5): Column =
    GraftSqlBridge.column(
      BloomAgg(GraftSqlBridge.expression(
        bloomPositions(key, numBits, numHashes)), numBits).toAggregateExpression())

  /** Probe: true iff every position's bit is set in `bloom` (an
    * array<long> column) — pure built-in bit math, stays in codegen.
    * May return true for a non-member (false positive, rate set by
    * numBits/numHashes); never false for a member.
    */
  def bloomMightContain(bloom: Column, key: Column,
                        numBits: Int = 1 << 17, numHashes: Int = 5): Column =
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(key, lit(i)), lit(numBits.toLong))
      val word = element_at(bloom, shiftright(pos, 6).cast("int") + 1)
      // variable-amount shift: the Scala shiftright helper only takes a
      // literal Int, the SQL function form takes a column
      org.apache.spark.sql.functions.call_function("shiftright",
          word, pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
}
