package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SURVEY §2j `udaf_hll` — a from-scratch HyperLogLog distinct-count
  * sketch as a `TypedImperativeAggregate`, the Catalyst-native UDAF
  * mechanism for aggregates whose buffer is an opaque object rather than
  * a fixed row (the same machinery Spark's own HLL++ and percentile
  * aggregates ride on).
  *
  * Algorithm: classic HLL (Flajolet/Fusy/Gandouet/Meunier 2007) with the
  * standard small-range linear-counting correction. p = 12 → m = 4096
  * byte registers → relative standard deviation 1.04/√m ≈ 1.63%, 4 KB
  * per group buffer. Values are hashed with Spark's own xxhash64 (seed
  * 42), so the estimate is deterministic across runs, partitionings, and
  * merge orders (registers merge by max — associative + commutative).
  *
  * 100 TB shape: the buffer is a constant 4 KB regardless of input
  * cardinality, partials combine map-side, and the shuffle carries
  * O(groups · 4 KB) — the whole point of sketching cardinality instead
  * of shipping values to a distinct. */
case class HyperLogLogAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HyperLogLogAgg.{M, P}

  override def prettyName: String = "hll_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val idx = (h >>> (64 - P)).toInt
      // rank of the first 1-bit in the remaining 64-p bits (1-based);
      // an all-zero remainder gets the max rank 64-p+1
      val rank = java.lang.Long.numberOfLeadingZeros((h << P) | (1L << (P - 1))) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Double.longBitsToDouble((1023L - buf(i)) << 52) // 2^-reg
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M.toDouble * M.toDouble / invSum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLogAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HyperLogLogAgg =
    copy(child = newChild)
}

object HyperLogLogAgg {
  /** Register-index bits; m = 2^p registers of one byte each. */
  val P = 12
  val M: Int = 1 << P
  /** Relative standard deviation of the estimator at this m. */
  val Rsd: Double = 1.04 / math.sqrt(M.toDouble)
}
