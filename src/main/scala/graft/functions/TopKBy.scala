package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mutable bounded top-k state: distinct (score, id) pairs with
  * MULTIPLICITY, total count capped at k by trimming from the largest
  * pair — so duplicate input rows survive exactly as the
  * `row_number() OVER (ORDER BY score, id) <= k` window form would keep
  * them. */
final class TopKBuf(val k: Int) {
  val m = new java.util.TreeMap[(Double, Long), Long](TopKBy.Ord)
  var total = 0L

  def add(p: (Double, Long), c: Long): Unit = {
    val prev = m.get(p)
    m.put(p, if (prev == null) c else prev + c)
    total += c
    while (total > k) {
      val last = m.lastEntry()
      val drop = math.min(last.getValue, total - k)
      if (drop == last.getValue) m.remove(last.getKey)
      else m.put(last.getKey, last.getValue - drop)
      total -= drop
    }
  }
}

/** Bounded per-group top-k as a native aggregate: keep the `k` rows
  * with the SMALLEST `(score, id)` (ties by id, duplicate rows kept by
  * multiplicity — exactly the `row_number() OVER (PARTITION BY g
  * ORDER BY score, id) <= k` answer). The id may be any INTEGRAL type
  * (tinyint through bigint — widening to long is order-preserving, so
  * the tie-break is unchanged); it is RETURNED as bigint, so a caller
  * that must preserve a narrower id type casts the exploded `id` back.
  *
  * Why a custom [[TypedImperativeAggregate]] instead of that window:
  * the window form sorts EVERY group member through the tasks holding
  * that group — a 10^8-member cluster funnels 10^8 rows through one
  * sort to keep 25 — while this buffer is HARD-BOUNDED at k pairs,
  * updates and merges are partial-aggregable (map-side combine like any
  * agg), and the shuffle carries at most k pairs per group per
  * partition. The window form stays exactly expressible in SQL, which
  * is what the DuckDB oracle runs.
  *
  * Returns the kept rows ascending by (score, id) as
  * `array<struct<score: double, id: bigint>>` (fewer than k when the
  * group is smaller; duplicate rows repeat). Rows where either input is
  * null are ignored.
  */
case class TopKBy(left: Expression, right: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf]
    with BinaryLike[Expression] {
  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "top_k_by"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a DOUBLE score, got ${left.dataType.sql}")
    else if (!TopKBy.isIntegralId(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an integral id, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      // any integral id widens losslessly to the long state key
      buf.add((s.asInstanceOf[Double], id.asInstanceOf[Number].longValue()),
        1L)
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.add(e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.total.toInt)
    val it = buf.m.entrySet().iterator() // ascending (score, id)
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      val (s, id) = e.getKey
      var c = e.getValue
      while (c > 0) {
        out(i) = new GenericInternalRow(Array[Any](s, id))
        i += 1
        c -= 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.m.size() * 24)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.getKey._1)
      bb.putLong(e.getKey._2)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 24)
      buf.add((bb.getDouble(), bb.getLong()), bb.getLong())
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
  /** The id types [[TopKBy]] accepts (anything that widens losslessly
    * to its bigint state key) — callers with other id types (strings,
    * decimals) keep the equivalent `row_number` window form. */
  def isIntegralId(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

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

  /** Aggregate Column: the k smallest (score, id) rows, ascending,
    * duplicates kept by multiplicity. */
  def topKMin(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKBy(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
