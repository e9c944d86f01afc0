package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Merge-side aggregates for the CH `-State`/`-Merge` combinator pair
  * (the `AggregateFunction(...)` column backbone of CH materialized-view
  * rollups; the combinators parse as plain function names,
  * ClickHouseParser.py:15571-15603).
  *
  * Here a topK/sumMap STATE is not opaque bytes but the typed
  * `(col1: sorted keys, col2: counts/sums)` tuple that [[SumMapAgg]]
  * already emits — parquet-storable, schema-carrying (the merge side
  * recovers key/value types from the column schema at plan time, the
  * role CH's `AggregateFunction(f, T)` type annotation plays), and
  * mergeable by key. These two consume such tuples:
  *
  *  - [[SumMapMergeAgg]]: `sumMapMerge(s)` — fold per-key sums across
  *    states, emit the same sorted tuple shape. Round-trips exactly:
  *    `sumMapMerge(sumMapState(k, v))` ≡ `sumMap(k, v)`.
  *  - [[TopKMergeAgg]]: `topKMerge(k)(s)` — fold per-value counts,
  *    finalize to the k most frequent (count desc, value asc — the
  *    [[TopKAgg]] ordering pin).
  *
  * Both are TypedImperativeAggregates: partial maps merge map-side, only
  * (key, sum) pairs cross the wire — one partial+final pass at any scale.
  */
private[graft] trait TupleStateConsumer {
  def child: Expression

  protected lazy val keyType: DataType = child.dataType match {
    case StructType(fields) if fields.length == 2 =>
      fields(0).dataType.asInstanceOf[ArrayType].elementType
    case other => throw new IllegalArgumentException(
      s"ChSql: -Merge expects a (keys, values) state tuple, got $other")
  }
  protected lazy val valType: DataType =
    child.dataType.asInstanceOf[StructType](1)
      .dataType.asInstanceOf[ArrayType].elementType

  protected def add(a: Any, b: Any): Any = valType match {
    case LongType =>
      java.lang.Long.valueOf(a.asInstanceOf[Number].longValue +
        b.asInstanceOf[Number].longValue)
    case _: DecimalType => a.asInstanceOf[Decimal] + b.asInstanceOf[Decimal]
    case _ =>
      java.lang.Double.valueOf(a.asInstanceOf[Number].doubleValue +
        b.asInstanceOf[Number].doubleValue)
  }

  /** Fold one state tuple (an InternalRow of two arrays) into the map. */
  protected def foldState(buf: java.util.HashMap[Any, Any],
      state: Any): Unit = state match {
    case null => ()
    case row: InternalRow =>
      val keys = row.getArray(0)
      val vals = row.getArray(1)
      var i = 0
      val n = keys.numElements()
      while (i < n) {
        val k = keys.get(i, keyType) match {
          case u: UTF8String => u.clone()
          case o => o
        }
        val v = vals.get(i, valType)
        val prev = buf.get(k)
        buf.put(k, if (prev == null) v else add(prev, v))
        i += 1
      }
    case other => throw new IllegalStateException(
      s"ChSql: -Merge state row expected, got ${other.getClass}")
  }

  protected def writeMap(buf: java.util.HashMap[Any, Any]): Array[Byte] = {
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

  protected def readMap(bytes: Array[Byte]): java.util.HashMap[Any, Any] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Any, Any](n * 2)
    var i = 0
    while (i < n) { m.put(in.readObject(), in.readObject()); i += 1 }
    in.close()
    m
  }

  protected def mergeMaps(b1: java.util.HashMap[Any, Any],
      b2: java.util.HashMap[Any, Any]): java.util.HashMap[Any, Any] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = b1.get(e.getKey)
      b1.put(e.getKey, if (prev == null) e.getValue else add(prev, e.getValue))
    }
    b1
  }
}

/** `sumMapMerge(state)` — see file doc. Output shape = input shape
  * (sorted keys, per-key sums), so merges chain across MV tiers. */
case class SumMapMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Any]]
  with UnaryLike[Expression] with TupleStateConsumer {

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("col1", ArrayType(keyType, containsNull = false)),
    StructField("col2", ArrayType(valType, containsNull = false))))
  override def prettyName: String = "sum_map_merge"

  override def createAggregationBuffer(): java.util.HashMap[Any, Any] =
    new java.util.HashMap[Any, Any]()

  override def update(buf: java.util.HashMap[Any, Any],
      input: InternalRow): java.util.HashMap[Any, Any] = {
    foldState(buf, child.eval(input)); buf
  }

  override def merge(b1: java.util.HashMap[Any, Any],
      b2: java.util.HashMap[Any, Any]): java.util.HashMap[Any, Any] =
    mergeMaps(b1, b2)

  override def eval(buf: java.util.HashMap[Any, Any]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val keys = new Array[Any](buf.size())
    val it = buf.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    val sorted = keys.sortWith((x, y) => ord.lt(x, y))
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sorted),
      new GenericArrayData(sorted.map(buf.get))))
  }

  override def serialize(buf: java.util.HashMap[Any, Any]): Array[Byte] =
    writeMap(buf)
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Any] =
    readMap(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SumMapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SumMapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): SumMapMergeAgg = copy(child = newChild)
}

object SumMapMergeAgg {
  def sumMapMerge(state: Column): Column =
    ColumnBridge.column(
      SumMapMergeAgg(ColumnBridge.expression(state)).toAggregateExpression())
}

/** `topKMerge(k)(state)` — see file doc. Finalizes to the k most
  * frequent values with the [[TopKAgg]] ordering pin (count desc, value
  * asc), so `topKMerge(k)(topKState(x))` ≡ `topK(k)(x)` exactly. */
case class TopKMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Any]]
  with UnaryLike[Expression] with TupleStateConsumer {

  require(k > 0, s"topKMerge needs k > 0, got $k")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(keyType, containsNull = false)
  override def prettyName: String = "top_k_merge"

  override def createAggregationBuffer(): java.util.HashMap[Any, Any] =
    new java.util.HashMap[Any, Any]()

  override def update(buf: java.util.HashMap[Any, Any],
      input: InternalRow): java.util.HashMap[Any, Any] = {
    foldState(buf, child.eval(input)); buf
  }

  override def merge(b1: java.util.HashMap[Any, Any],
      b2: java.util.HashMap[Any, Any]): java.util.HashMap[Any, Any] =
    mergeMaps(b1, b2)

  override def eval(buf: java.util.HashMap[Any, Any]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(keyType)
    val entries = new Array[(Any, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue.asInstanceOf[Number].longValue)
      i += 1
    }
    val top = entries.sortWith { case ((v1, n1), (v2, n2)) =>
      if (n1 != n2) n1 > n2 else ord.lt(v1, v2)
    }.take(k).map(_._1)
    new GenericArrayData(top)
  }

  override def serialize(buf: java.util.HashMap[Any, Any]): Array[Byte] =
    writeMap(buf)
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Any] =
    readMap(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): TopKMergeAgg = copy(child = newChild)
}

object TopKMergeAgg {
  def topKMerge(state: Column, k: Int): Column =
    ColumnBridge.column(
      TopKMergeAgg(ColumnBridge.expression(state), k).toAggregateExpression())
}
