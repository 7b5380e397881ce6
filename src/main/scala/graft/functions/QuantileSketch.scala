package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, Decimal, DoubleType}

/** A mergeable QUANTILE sketch via deterministic bottom-k sampling — the
  * fourth custom aggregate next to HLL, CMS and top-k, covering the last
  * of the classic mergeable-summary families.
  *
  * Construction: every value gets the engine's md5-derived 60-bit hash
  * (of its exact cent-integer rendering — never the double's string,
  * whose formatting differs per engine); the sketch keeps the k = 256
  * (hash, value) pairs with the SMALLEST hashes. A bottom-k-by-hash set
  * is a uniform sample that is a pure FUNCTION OF THE VALUE MULTISET:
  * independent of row order, partitioning, and merge shape (merge =
  * bottom-k of the union — associative, commutative, idempotent). The
  * estimate is the lower median (quantile_disc 0.5) of the kept values.
  *
  * That determinism is the point: unlike an RNG reservoir, the DuckDB
  * oracle reproduces the sketch EXACTLY in SQL (ROW_NUMBER over the same
  * hash order, LIMIT k, same disc-median element), so the driver
  * hash-gate pins the full estimate value, not a tolerance bool.
  *
  * 100 TB shape: constant 4 KB buffer per group, map-side partials,
  * shuffle carries O(groups · k) — exact medians need a full sort or a
  * two-pass rank; this is the one-pass mergeable alternative with
  * ±O(1/√k) quantile error. */
case class BottomKMedianAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKMedianAgg.Buf] with UnaryLike[Expression] {

  import BottomKMedianAgg.{Buf, K}

  override def prettyName: String = "bkq_median"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      // widen any numeric input instead of a mid-task ClassCastException
      // (AbstractDataType/ImplicitCastInputTypes are private to Spark, so
      // the coercion lives here)
      val d = v match {
        case x: java.lang.Double  => x.doubleValue()
        case x: java.lang.Float   => x.toDouble
        case x: java.lang.Long    => x.toDouble
        case x: java.lang.Integer => x.toDouble
        case x: Decimal           => x.toDouble
        case other => throw new IllegalArgumentException(
          s"bkq_median: unsupported input ${other.getClass.getSimpleName}")
      }
      val cents = math.round(d * 100.0)
      val h = Sketches.md5Long60(java.lang.Long.toString(cents)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      buf.offer(h, d)
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = { b1.absorb(b2); b1 }

  override def eval(buf: Buf): Any = buf.discMedian

  override def serialize(buf: Buf): Array[Byte] = {
    val arr = buf.entries
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKMedianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKMedianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKMedianAgg =
    copy(child = newChild)
}

object BottomKMedianAgg {
  /** Sample size: ±1/√k ≈ 6% worst-case quantile-rank error. */
  val K = 256

  /** Bounded bottom-k multiset of (hash, value), worst entry on top of a
    * max-heap so inserts beyond k are one compare. Ties on the full
    * (hash, value) key are interchangeable — equal pairs carry equal
    * values, so WHICH one survives can't change the value multiset. */
  final class Buf {
    private val ord = Ordering.Tuple2[Long, Double]
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](ord)

    def offer(h: Long, v: Double): Unit = {
      if (pq.size < K) pq.enqueue((h, v))
      else if (ord.lt((h, v), pq.head)) { pq.dequeue(); pq.enqueue((h, v)) }
    }

    def absorb(other: Buf): Unit = other.entries.foreach { case (h, v) => offer(h, v) }

    def entries: Array[(Long, Double)] = pq.toArray

    /** Lower median (DuckDB quantile_disc 0.5: 0-based index (n−1)/2 of
      * the ascending values) of the kept sample; null on empty. */
    def discMedian: Any = {
      if (pq.isEmpty) return null
      val vs = pq.toArray.map(_._2).sorted
      vs((vs.length - 1) / 2)
    }
  }
}
