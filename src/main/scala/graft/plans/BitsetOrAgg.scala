package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** OR-fold of per-row bit-position arrays into one fixed-size bitset —
  * the bloom-index build aggregate ([[BloomSkipIndex]]).
  *
  * Scale shape: the previous build exploded every (row × gram × hash)
  * bit position into its own row and funneled ~10⁸ rows through a
  * `collect_set` shuffle at sf1; this keeps the whole per-partition
  * state at `nBits/8` BYTES (8 KB at 2¹⁶ bits), updates row-locally,
  * and ships exactly one bitset per (file, partition) through the
  * merge — the build becomes scan-bound, which is the contract an
  * index build must meet at 100 TB.
  *
  * Two output modes:
  *  - `packed = false`: ascending distinct bit positions (the same
  *    value `sort_array(collect_set(...))` produced — SQL-replayable
  *    and oracle-comparable);
  *  - `packed = true` (r14, the sidecar-at-rest format): the raw
  *    `nBits/64` long words. FIXED 8 KB per group regardless of bit
  *    density — a dense 2¹⁶-position unpacked array costs 256 KB+ of
  *    boxed driver memory per file once collected, which at the ~10⁶
  *    files of a 100 TB table is unserveable; the packed form keeps
  *    the whole probe map at ~8 GB worst-case and probes by bit-test. */
case class BitsetOrAgg(
    child: Expression,
    nBits: Int,
    packed: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(nBits > 0 && nBits % 64 == 0,
    s"bitset_or needs a positive multiple-of-64 bit count, got $nBits")

  override def nullable: Boolean = false
  override def dataType: DataType =
    if (packed) ArrayType(LongType, containsNull = false)
    else ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = if (packed) "bitset_or_packed" else "bitset_or"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](nBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val bit = arr.getInt(i)
        require(bit >= 0 && bit < nBits, s"bitset_or: bit $bit out of [0, $nBits)")
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (packed) return new GenericArrayData(buf.clone())
    var count = 0
    var i = 0
    while (i < buf.length) { count += java.lang.Long.bitCount(buf(i)); i += 1 }
    val out = new Array[Int](count)
    var k = 0
    i = 0
    while (i < buf.length) {
      var w = buf(i)
      while (w != 0L) {
        val t = java.lang.Long.numberOfTrailingZeros(w)
        out(k) = i * 64 + t
        k += 1
        w &= w - 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitsetOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitsetOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitsetOrAgg =
    copy(child = newChild)
}

object BitsetOrAgg {
  /** Column form: OR all bit positions of `c` (array<int>) per group. */
  def bitsetOr(c: Column, nBits: Int): Column =
    ColumnBridge.column(
      BitsetOrAgg(ColumnBridge.expression(c), nBits).toAggregateExpression())

  /** Packed form: the raw bitset words (array<bigint>, nBits/64 longs —
    * fixed size, bit-density-independent). */
  def bitsetOrPacked(c: Column, nBits: Int): Column =
    ColumnBridge.column(
      BitsetOrAgg(ColumnBridge.expression(c), nBits, packed = true)
        .toAggregateExpression())
}
