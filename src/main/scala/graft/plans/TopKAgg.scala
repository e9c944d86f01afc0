package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** CH `topK(k)(x)` — the k most frequent values, ordered by frequency
  * descending then value ascending (CH leaves ties arbitrary; pinning
  * value order makes the result hash-verifiable cross-engine).
  *
  * EXACT tier as a [[TypedImperativeAggregate]]: a per-partition
  * open-addressing count map, partial maps merged by key — map-side
  * combine applies, only (value, count) pairs cross the wire. CH's own
  * topK is a bounded SpaceSaving sketch whose result depends on stream
  * order; a merge-order-dependent answer can't ride the oracle gate, so
  * the deterministic exact tier is the default here (same policy as the
  * uniq family: deterministic tier carries the contract, sketch tier
  * available where approximation is acceptable). Scale note: state is
  * O(distinct values per group) — for unbounded-cardinality columns
  * pre-aggregate (groupBy value → count → window top-k, the q63 shape)
  * instead.
  *
  * Reference: topK parses as a parametric function
  * (ClickHouseParser.py:15571-15603); semantics from CH docs.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"topK needs k > 0, got $k")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): java.util.HashMap[Any, Long] =
    new java.util.HashMap[Any, Long]()

  override def update(buf: java.util.HashMap[Any, Long],
      input: InternalRow): java.util.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // values coming out of eval may alias mutable row buffers
      val key = v match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buf.merge(key, 1L, (a, b) => a + b)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Any, Long],
      b2: java.util.HashMap[Any, Long]): java.util.HashMap[Any, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    b1
  }

  override def eval(buf: java.util.HashMap[Any, Long]): Any = {
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    val entries = new Array[(Any, Long)](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    val top = entries.sortWith { case ((v1, n1), (v2, n2)) =>
      if (n1 != n2) n1 > n2 else ord.lt(v1, v2)
    }.take(k).map(_._1)
    new GenericArrayData(top)
  }

  override def serialize(buf: java.util.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeObject(e.getKey)
      out.writeLong(e.getValue)
    }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Any, Long] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[Any, Long](n * 2)
    var i = 0
    while (i < n) {
      val key = in.readObject()
      val cnt = in.readLong()
      m.put(key, cnt)
      i += 1
    }
    in.close()
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** Column form: `topK(c, k)` usable in any agg position. */
  def topK(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
