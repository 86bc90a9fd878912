package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Bounded per-key top-k as an aggregate function (SURVEY.md §2 tier b).
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ...) <= k` shuffles and
  * sorts EVERY row of every key. This aggregate keeps a k-bounded heap
  * per key with map-side partial aggregation, so only k rows per key per
  * partition cross the wire — at 100 TB that's the difference between a
  * full-data sort-shuffle and a k×keys×partitions trickle. Skew-immune
  * for the same reason partial sums are.
  *
  * Input must be a struct whose *ascending lexicographic* order encodes
  * the wanted ranking (descending fields enter negated); the k smallest
  * structs are kept and returned sorted, so
  * `posexplode(topk(...))` reproduces (rank-1, row).
  */
case class TopKStructs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  // max-heap on top → dequeue evicts the currently-worst kept row
  private lazy val ord: Ordering[InternalRow] =
    InterpretedOrdering.forSchema(structType.map(_.dataType))
  private lazy val proj = UnsafeProjection.create(structType)

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ord)

  override def update(buf: mutable.PriorityQueue[InternalRow], input: InternalRow)
      : mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) buf.enqueue(proj(row).copy())
      else if (ord.lt(row, buf.head)) { buf.dequeue(); buf.enqueue(proj(row).copy()) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (ord.lt(row, buf.head)) { buf.dequeue(); buf.enqueue(row) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map(_.asInstanceOf[UnsafeRow])
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(rows.length)
    rows.foreach { r =>
      val bytes = r.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKStructs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object TopKAggregate {
  /** Column API: `topk(struct(-price, orderkey), 3)`. */
  def topk(ordStruct: Column, k: Int): Column =
    ExprBridge.column(
      TopKStructs(ExprBridge.expression(ordStruct), k).toAggregateExpression())
}
