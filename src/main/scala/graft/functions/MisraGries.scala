package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native aggregate: at most `k`
  * (item, count) counters, maintained with the classic decrement-all rule
  * (Misra & Gries 1982) and merged with the counter-sum + (k+1)-th-largest
  * subtraction rule from Agarwal et al., "Mergeable Summaries" (PODS
  * 2012). After any sequence of updates and merges over a stream of N
  * items, every stored count underestimates the true frequency by at most
  * N/(k+1) — so ANY item with true frequency strictly above N/k is
  * GUARANTEED to be among the surviving keys. That superset guarantee is
  * what makes the two-pass exact heavy-hitters plan work
  * ([[graft.analytics.Sketches.heavyHitters]]): pass 1 returns ≤ k
  * candidates from bounded state, pass 2 recounts only those candidates
  * exactly.
  *
  * Why a custom [[TypedImperativeAggregate]]: the buffer is HARD-BOUNDED
  * at k string counters regardless of the key cardinality, updates and
  * merges are partial-aggregable (map-side combine like any agg), and no
  * vocabulary-sized hash table ever forms on any single task — the shape
  * that survives a 10^9-distinct-token corpus where an exact
  * `GROUP BY token` must shuffle every distinct key. The exact
  * formulation stays SQL-expressible (`HAVING count(*) * k > N`), which
  * is what the DuckDB oracle runs against the recounted output.
  *
  * Returns the surviving candidate keys sorted ascending as
  * `array<string>` (fewer than k when the input has fewer distinct
  * values — then the summary is exact). Null inputs are ignored.
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {
  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a STRING input, got ${child.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias reused page memory — materialize to String
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // decrement-all: k+1 distinct items each give up one unit
          val dead = mutable.ArrayBuffer.empty[String]
          val it = buf.iterator
          while (it.hasNext) {
            val (key, c) = it.next()
            if (c == 1L) dead += key else buf.update(key, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]):
      mutable.HashMap[String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from every counter and drop
      // the non-positive — the mergeable-summaries trim that preserves
      // the additive N/(k+1) error bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(buf.size - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      val it = buf.iterator
      while (it.hasNext) {
        val (key, c) = it.next()
        if (c <= sub) dead += key else buf.update(key, c - sub)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    val out = new Array[Any](keys.length)
    var i = 0
    while (i < keys.length) { out(i) = UTF8String.fromString(keys(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Aggregate Column: the ≤ k surviving Misra–Gries candidate keys,
    * sorted ascending — a guaranteed superset of every item with
    * frequency > N/k. */
  def mgCandidates(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())
}
