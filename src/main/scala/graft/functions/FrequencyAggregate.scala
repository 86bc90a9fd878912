package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters summary (SURVEY.md §2).
  *
  * Keeps at most `k` counters per partition and per merged state, so a
  * frequent-items query shuffles O(k) rows per partition instead of the
  * full distinct-word long tail — at 100 TB that's the difference
  * between a bounded-size sketch exchange and a word-count shuffle
  * whose cardinality is the vocabulary. The classic guarantee survives
  * merging (mergeable-summaries result, Agarwal et al., PODS'12):
  * every item with true count > n/k is present in the final summary.
  * The summary is a CANDIDATE set: counts are lower bounds, so exact
  * queries re-count candidates in a second pass — which also makes the
  * final answer deterministic regardless of partitioning and merge
  * order (the sketch only has to be a superset of the qualifying set).
  *
  * Returns the candidate items as a sorted array<string>.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      buf.get(w) match {
        case Some(c) => buf(w) = c + 1
        case None if buf.size < k => buf(w) = 1L
        case None => // decrement-all step: every tracked count -1
          val dead = mutable.ArrayBuffer.empty[String]
          for ((key, c) <- buf) {
            if (c == 1L) dead += key else buf(key) = c - 1
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((w, c) <- other) buf(w) = buf.getOrElse(w, 0L) + c
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // the non-positive remainder — the standard mergeable reduction
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      for ((key, c) <- buf) {
        if (c - d <= 0L) dead += key else buf(key) = c - d
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    for ((w, c) <- buf) { dos.writeUTF(w); dos.writeLong(c) }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf(dis.readUTF()) = dis.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object FrequencyAggregate {
  /** Column API: `misraGries(col("word"), 400)`. */
  def misraGries(item: Column, k: Int): Column =
    ExprBridge.column(
      MisraGries(ExprBridge.expression(item), k).toAggregateExpression())
}
