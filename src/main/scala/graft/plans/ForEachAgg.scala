package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** The CH `-ForEach` aggregate combinator (`sumForEach`, `minForEach`,
  * `maxForEach`, `avgForEach`, `countForEach`): aggregates ARRAY columns
  * element-wise across the rows of a group — position i of the result
  * aggregates the i-th element of every row's array. The result length is
  * the longest array seen; shorter arrays simply contribute nothing at the
  * positions they lack (CH semantics).
  *
  * Same design as [[SumMapAgg]]: a [[TypedImperativeAggregate]] whose
  * buffer is one (value, count) cell per position — O(max array length)
  * state, map-side combine applies, merges are element-wise and
  * associative, so the aggregate is one partial+final pass at any scale.
  *
  * Integral elements aggregate as Long, everything else (including
  * Decimal) as Double — the same widening contract as [[SumMapAgg]] minus
  * the Decimal tier, documented on the text surface.
  *
  * Reference: combinators parse as plain function names
  * (ClickHouseParser.py:15571-15603); semantics from CH docs.
  */
case class ForEachAgg(
    child: Expression,
    op: String,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ForEachAgg.Buf]
  with UnaryLike[Expression] {

  require(ForEachAgg.Ops.contains(op), s"ForEachAgg op: $op")

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private def integral: Boolean = elemType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def sumType: DataType = if (integral) LongType else DoubleType

  override def nullable: Boolean = false
  override def dataType: DataType = op match {
    case "count" => ArrayType(LongType, containsNull = false)
    case "avg" => ArrayType(DoubleType, containsNull = true)
    case "sum" => ArrayType(sumType, containsNull = false)
    case _ => ArrayType(sumType, containsNull = true) // min / max
  }
  override def prettyName: String = s"${op}_for_each"

  override def createAggregationBuffer(): ForEachAgg.Buf =
    new ForEachAgg.Buf(ArrayBuffer.empty, ArrayBuffer.empty)

  private def widen(v: Any): Any =
    if (integral) java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)
    else v match {
      case d: Decimal => java.lang.Double.valueOf(d.toDouble)
      case n: Number => java.lang.Double.valueOf(n.doubleValue)
      case other => other
    }

  private def combine(prev: Any, v: Any): Any =
    if (prev == null) v
    else op match {
      case "sum" | "avg" =>
        if (integral) java.lang.Long.valueOf(
          prev.asInstanceOf[Long] + v.asInstanceOf[Long])
        else java.lang.Double.valueOf(
          prev.asInstanceOf[Double] + v.asInstanceOf[Double])
      case "min" =>
        if (integral) java.lang.Long.valueOf(
          math.min(prev.asInstanceOf[Long], v.asInstanceOf[Long]))
        else java.lang.Double.valueOf(
          math.min(prev.asInstanceOf[Double], v.asInstanceOf[Double]))
      case "max" =>
        if (integral) java.lang.Long.valueOf(
          math.max(prev.asInstanceOf[Long], v.asInstanceOf[Long]))
        else java.lang.Double.valueOf(
          math.max(prev.asInstanceOf[Double], v.asInstanceOf[Double]))
      case _ => prev // count: values unused
    }

  private def grow(buf: ForEachAgg.Buf, n: Int): Unit =
    while (buf.vals.size < n) { buf.vals += null; buf.counts += 0L }

  override def update(buf: ForEachAgg.Buf, input: InternalRow): ForEachAgg.Buf = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      grow(buf, n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          if (op != "count")
            buf.vals(i) = combine(buf.vals(i), widen(a.get(i, elemType)))
          buf.counts(i) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: ForEachAgg.Buf, b2: ForEachAgg.Buf): ForEachAgg.Buf = {
    grow(b1, b2.vals.size)
    var i = 0
    while (i < b2.vals.size) {
      if (b2.counts(i) > 0) {
        if (op != "count" && b2.vals(i) != null)
          b1.vals(i) = combine(b1.vals(i), b2.vals(i))
        b1.counts(i) += b2.counts(i)
      }
      i += 1
    }
    b1
  }

  override def eval(buf: ForEachAgg.Buf): Any = {
    val zero: Any =
      if (integral) java.lang.Long.valueOf(0L) else java.lang.Double.valueOf(0.0)
    val out: Array[Any] = op match {
      case "count" =>
        buf.counts.map(c => java.lang.Long.valueOf(c): Any).toArray
      case "sum" =>
        buf.vals.map(v => if (v == null) zero else v).toArray
      case "avg" =>
        buf.vals.indices.map { i =>
          if (buf.counts(i) == 0L) null
          else java.lang.Double.valueOf(
            buf.vals(i).asInstanceOf[Number].doubleValue / buf.counts(i)): Any
        }.toArray
      case _ => buf.vals.toArray // min / max: absent positions stay NULL
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ForEachAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeInt(buf.vals.size)
    var i = 0
    while (i < buf.vals.size) {
      out.writeObject(buf.vals(i))
      out.writeLong(buf.counts(i))
      i += 1
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ForEachAgg.Buf = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val vals = new ArrayBuffer[Any](n)
    val counts = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) {
      vals += in.readObject()
      counts += in.readLong()
      i += 1
    }
    in.close()
    new ForEachAgg.Buf(vals, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ForEachAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ForEachAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ForEachAgg =
    copy(child = newChild)
}

object ForEachAgg {
  val Ops: Set[String] = Set("sum", "min", "max", "avg", "count")

  /** Per-position (value, count) cells; position i aggregates element i. */
  final class Buf(val vals: ArrayBuffer[Any], val counts: ArrayBuffer[Long])

  /** Column form: `<op>ForEach(arrayCol)` usable in any agg position. */
  def forEach(arr: Column, op: String): Column =
    ColumnBridge.column(
      ForEachAgg(ColumnBridge.expression(arr), op).toAggregateExpression())
}
