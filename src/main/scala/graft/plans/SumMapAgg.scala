package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CH `sumMap(key, value)` — per-key sums over the group, returned as a
  * tuple of (sorted keys, sums at the matching position). CH's canonical
  * form takes parallel arrays per row; the scalar-pair form here is its
  * one-pair-per-row special case (`sumMap([k], [v])`), which is what the
  * q89-style per-key rollups actually use.
  *
  * Same design as [[TopKAgg]]: a [[TypedImperativeAggregate]] whose
  * buffer is a key→sum map, merged per key — map-side combine applies,
  * only (key, sum) pairs cross the wire, and the sorted-key output makes
  * the result hash-verifiable cross-engine. State is O(distinct keys per
  * group) — the CH semantics; for unbounded key cardinality pre-aggregate
  * with a two-level groupBy (the q89 shape) instead.
  *
  * Integral values sum as Long, Decimal as Decimal, everything else as
  * Double. Output fields are named col1/col2 so the CH tuple accessors
  * `.1`/`.2` (tupleElement) work unchanged.
  *
  * Reference: sumMap parses as a plain function
  * (ClickHouseParser.py:15571-15603); semantics from CH docs.
  */
case class SumMapAgg(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Any]]
  with BinaryLike[Expression] {

  private def sumType: DataType = right.dataType match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case d: DecimalType => d
    case _ => DoubleType
  }

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("col1", ArrayType(left.dataType, containsNull = false)),
    StructField("col2", ArrayType(sumType, containsNull = false))))
  override def prettyName: String = "sum_map"

  override def createAggregationBuffer(): java.util.HashMap[Any, Any] =
    new java.util.HashMap[Any, Any]()

  private def add(a: Any, b: Any): Any = sumType match {
    case LongType =>
      java.lang.Long.valueOf(a.asInstanceOf[Number].longValue +
        b.asInstanceOf[Number].longValue)
    case _: DecimalType =>
      a.asInstanceOf[Decimal] + b.asInstanceOf[Decimal]
    case _ =>
      java.lang.Double.valueOf(a.asInstanceOf[Number].doubleValue +
        b.asInstanceOf[Number].doubleValue)
  }

  private def widen(v: Any): Any = sumType match {
    case LongType => java.lang.Long.valueOf(v.asInstanceOf[Number].longValue)
    case _: DecimalType => v
    case _ => java.lang.Double.valueOf(v.asInstanceOf[Number].doubleValue)
  }

  override def update(buf: java.util.HashMap[Any, Any],
      input: InternalRow): java.util.HashMap[Any, Any] = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null) {
      val key = k match {
        case u: UTF8String => u.clone()
        case other => other
      }
      val prev = buf.get(key)
      buf.put(key, if (prev == null) widen(v) else add(prev, v))
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Any, Any],
      b2: java.util.HashMap[Any, Any]): java.util.HashMap[Any, Any] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else add(prev, e.getValue))
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Any, Any]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(left.dataType)
    val keys = new Array[Any](buf.size())
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    val sorted = keys.sortWith((x, y) => ord.lt(x, y))
    val sums = sorted.map(buf.get)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sorted), new GenericArrayData(sums)))
  }

  override def serialize(buf: java.util.HashMap[Any, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeObject(e.getKey)
      out.writeObject(e.getValue)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Any] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Any, Any](n * 2)
    var i = 0
    while (i < n) {
      val key = in.readObject()
      val v = in.readObject()
      m.put(key, v)
      i += 1
    }
    in.close()
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SumMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SumMapAgg =
    copy(left = newLeft, right = newRight)
}

object SumMapAgg {
  /** Column form: `sumMap(key, value)` usable in any agg position. */
  def sumMap(key: Column, value: Column): Column =
    ColumnBridge.column(
      SumMapAgg(ColumnBridge.expression(key), ColumnBridge.expression(value))
        .toAggregateExpression())
}

/** minMap/maxMap (CH sumMap siblings): per-key extremum with the SAME
  * bounded aggregation state — a key → best-value map, sized by distinct
  * keys, never by row count (the 100 TB contract SumMapAgg set). Output
  * is the (sorted keys, extrema) col1/col2 tuple. */
case class ExtremumMapAgg(
    left: Expression,
    right: Expression,
    isMin: Boolean,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Any]]
  with BinaryLike[Expression] {

  // CH minMap/maxMap take (keys array, values array) per row; the
  // scalar-pair form is accepted too (≡ one-element arrays)
  private def keyType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case t => t
  }
  private def valueType: DataType = right.dataType match {
    case ArrayType(et, _) => et
    case t => t
  }

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("col1", ArrayType(keyType, containsNull = false)),
    StructField("col2", ArrayType(valueType, containsNull = false))))
  override def prettyName: String = if (isMin) "min_map" else "max_map"

  // the buffer is a JDK HashMap serialized with ObjectOutputStream:
  // keys need value-equality hashCode/equals and both sides need Java
  // serialization, which holds for atomic types but NOT for catalyst
  // nested values (InternalRow/ArrayData) or raw byte arrays — reject
  // those at analysis time instead of failing at shuffle time
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case BinaryType | NullType => false
      case _: ArrayType | _: MapType | _: StructType => false
      case _: UserDefinedType[_] => false
      case _ => true
    }
    if (!ok(keyType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName key type must be an atomic (non-binary) type, " +
          s"got ${keyType.catalogString}")
    else if (!ok(valueType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName value type must be an atomic (non-binary) type, " +
          s"got ${valueType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): java.util.HashMap[Any, Any] =
    new java.util.HashMap[Any, Any]()

  @transient private lazy val vOrd =
    TypeUtils.getInterpretedOrdering(valueType)

  private def better(a: Any, b: Any): Any =
    if (if (isMin) vOrd.lt(b, a) else vOrd.gt(b, a)) b else a

  private def put(buf: java.util.HashMap[Any, Any], k: Any, v: Any): Unit = {
    if (k == null || v == null) return
    val key = k match {
      case u: UTF8String => u.clone()
      case other => other
    }
    val vc = v match {
      case u: UTF8String => u.clone()
      case other => other
    }
    val prev = buf.get(key)
    buf.put(key, if (prev == null) vc else better(prev, vc))
  }

  override def update(buf: java.util.HashMap[Any, Any],
      input: InternalRow): java.util.HashMap[Any, Any] = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null) (k, v) match {
      case (ka: org.apache.spark.sql.catalyst.util.ArrayData,
            va: org.apache.spark.sql.catalyst.util.ArrayData) =>
        val n = math.min(ka.numElements(), va.numElements())
        var i = 0
        while (i < n) {
          put(buf, ka.get(i, keyType), va.get(i, valueType))
          i += 1
        }
      case _ => put(buf, k, v)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Any, Any],
      b2: java.util.HashMap[Any, Any]): java.util.HashMap[Any, Any] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else better(prev, e.getValue))
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Any, Any]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val keys = new Array[Any](buf.size())
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    val sorted = keys.sortWith((x, y) => ord.lt(x, y))
    val vals = sorted.map(buf.get)
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sorted), new GenericArrayData(vals)))
  }

  override def serialize(buf: java.util.HashMap[Any, Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeObject(e.getKey)
      out.writeObject(e.getValue)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Any] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Any, Any](n * 2)
    var i = 0
    while (i < n) {
      val key = in.readObject()
      val v = in.readObject()
      m.put(key, v)
      i += 1
    }
    in.close()
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExtremumMapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExtremumMapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtremumMapAgg =
    copy(left = newLeft, right = newRight)
}

object ExtremumMapAgg {
  def minMap(key: Column, value: Column): Column =
    ColumnBridge.column(ExtremumMapAgg(ColumnBridge.expression(key),
      ColumnBridge.expression(value), isMin = true).toAggregateExpression())
  def maxMap(key: Column, value: Column): Column =
    ColumnBridge.column(ExtremumMapAgg(ColumnBridge.expression(key),
      ColumnBridge.expression(value), isMin = false).toAggregateExpression())
}
