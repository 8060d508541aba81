package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native aggregate: keep the `k` pairs
  * `(score, id)` with the SMALLEST score (ties by id) seen in the group.
  *
  * Why a custom [[TypedImperativeAggregate]] instead of
  * `row_number() OVER (PARTITION BY g ORDER BY s)`: the window form
  * sorts EVERY group member through the tasks holding that group — a
  * 10^8-member cluster funnels 10^8 rows through one sort to keep 25 —
  * while this buffer is HARD-BOUNDED at k pairs, updates and merges are
  * partial-aggregable (map-side combine like any agg), and the shuffle
  * carries at most k pairs per group per partition. The window form
  * stays exactly expressible in SQL, which is what the DuckDB oracle
  * runs.
  *
  * Returns the kept pairs ascending by (score, id) as
  * `array<struct<score: double, id: bigint>>` (fewer than k when the
  * group is smaller). Rows where either input is null are ignored.
  */
case class TopKBy(left: Expression, right: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
    with BinaryLike[Expression] {
  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "top_k_by"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](TopKBy.Ord)

  private def add(buf: java.util.TreeSet[(Double, Long)],
                  p: (Double, Long)): Unit = {
    buf.add(p)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      add(buf, (s.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
                     other: java.util.TreeSet[(Double, Long)]):
      java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator() // ascending (score, id)
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      bb.putDouble(s)
      bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.add((bb.getDouble(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(left = newLeft, right = newRight)
}

object TopKBy {
  /** (score, id) ascending; a named serializable object because the
    * expression (and thus the comparator it references) ships to
    * executors inside the physical plan. */
  private[functions] object Ord
      extends java.util.Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** Aggregate Column: the k smallest (score, id) pairs, ascending. */
  def topKMin(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
