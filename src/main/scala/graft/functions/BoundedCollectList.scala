package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType}

/** Aggregation buffer for [[BoundedCollectList]]: the collected values
  * plus a sticky overflow flag. Once a group exceeds the cap the items
  * are RELEASED (cleared) — an overflowed group costs O(1) memory for
  * the rest of the aggregation, not O(group).
  */
final class BoundedListBuffer(
    val items: mutable.ArrayBuffer[Any] = mutable.ArrayBuffer.empty[Any],
    var overflowed: Boolean = false)

/** `collect_list` with a HARD per-group size cap, evaluated INSIDE the
  * aggregation: a group that exceeds `cap` elements evaluates to NULL
  * (and frees its buffer the moment it overflows), so both the memory
  * bound and the oversize-drop decision live in the single aggregation
  * pass — no pre-counting, no second shuffle, and crucially NO driver
  * probe: a plan built over this aggregate stays fully lazy.
  *
  * This is the LSH skew guard's execution form (see
  * [[graft.scale.Dedup]]): degenerate buckets (boilerplate content
  * hashing to one band key) would otherwise buffer ~N members in one
  * aggregation buffer — the executor-OOM mode — and explode bucket²
  * candidate pairs downstream. Capping inside the agg bounds the buffer
  * at cap+1 elements per group on BOTH the map-side partial and the
  * final merge, at any corpus size.
  *
  * Like `collect_list` this is a [[TypedImperativeAggregate]] (planned
  * as ObjectHashAggregate); null inputs are skipped; element order is
  * partition-dependent, so treat the result as a SET (every graft
  * consumer does — pair explosion and min-id keeps are order-free).
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedListBuffer] with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def prettyName: String = "bounded_collect_list"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): BoundedListBuffer = new BoundedListBuffer()

  override def update(buf: BoundedListBuffer, input: InternalRow): BoundedListBuffer = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        buf.items += InternalRow.copyValue(v)
        if (buf.items.length > cap) {
          buf.overflowed = true
          buf.items.clear()
        }
      }
    }
    buf
  }

  override def merge(buf: BoundedListBuffer, other: BoundedListBuffer): BoundedListBuffer = {
    if (buf.overflowed || other.overflowed) {
      buf.overflowed = true
      buf.items.clear()
    } else {
      buf.items ++= other.items
      if (buf.items.length > cap) {
        buf.overflowed = true
        buf.items.clear()
      }
    }
    buf
  }

  override def eval(buf: BoundedListBuffer): Any =
    if (buf.overflowed) null else new GenericArrayData(buf.items.toArray)

  // shuffle format for the partial buffers: one UnsafeRow of
  // (overflowed boolean, array<childType>) — the same generic-value
  // projection trick Spark's own Collect uses
  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](BooleanType, ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: BoundedListBuffer): Array[Byte] = {
    val arr = new GenericArrayData(buf.items.toArray)
    projection.apply(InternalRow.apply(buf.overflowed, arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): BoundedListBuffer = {
    val buf = new BoundedListBuffer()
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    buf.overflowed = row.getBoolean(0)
    if (!buf.overflowed) {
      row.getArray(1).foreach(child.dataType, (_, v: Any) => buf.items += v)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)
}

object BoundedCollectList {

  /** `bounded_collect_list(c, cap)` as a user-facing aggregate Column:
    * the group's values as an array, or NULL when the group holds more
    * than `cap` of them.
    */
  def apply(c: Column, cap: Int): Column =
    ColumnBridge.column(
      BoundedCollectList(ColumnBridge.expression(c), cap).toAggregateExpression())
}
