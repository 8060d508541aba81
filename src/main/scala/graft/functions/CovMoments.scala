package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** One-pass covariance moments as a native aggregate: per input vector
  * `x` (array<double>, uniform dimension d) it accumulates
  * `[d, n, Σx_0..Σx_{d-1}, upper-triangle Σx_i·x_j]` in a single
  * primitive loop — where the composed form explodes every row into
  * d(d+1)/2 + d term structs before the partial aggregation (2 145
  * interpreted rows per 64-dim vector). The exchange is identical (one
  * moment buffer per partition); this kernel removes the d²/2-per-row
  * interpreted explode from the map stage, which is what dominates at
  * corpus scale.
  *
  * Buffer layout: `[d, n, sx(d), sxx(d(d+1)/2 row-major upper)]`; the
  * empty buffer is a zero-length array until the first input fixes d.
  * Null vectors are ignored; inputs of a different length than the first
  * seen are ignored (callers pre-filter to the majority dimension via
  * `Pq.vectors`, so this is belt-and-braces, not policy).
  */
case class CovMoments(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {

  override def prettyName: String = "cov_moments"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf0: Array[Double],
                      input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf0
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf0
    var buf = buf0
    if (buf.isEmpty) buf = new Array[Double](2 + d + d * (d + 1) / 2)
    if (buf(0) == 0.0) buf(0) = d.toDouble
    else if (buf(0) != d.toDouble) return buf // dim mismatch: ignore row
    buf(1) += 1.0
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = arr.getDouble(i); i += 1 }
    i = 0
    var p = 2 + d
    while (i < d) {
      buf(2 + i) += x(i)
      val xi = x(i)
      var j = i
      while (j < d) { buf(p) += xi * x(j); p += 1; j += 1 }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Double],
                     other: Array[Double]): Array[Double] = {
    if (other.isEmpty || other(0) == 0.0) return buf
    if (buf.isEmpty || buf(0) == 0.0) return other.clone()
    require(buf.length == other.length,
      s"covariance buffers disagree on dimension: ${buf(0)} vs ${other(0)}")
    var i = 1
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovMoments =
    copy(child = newChild)
}

object CovMoments {
  /** Aggregate Column: `[d, n, sx..., sxx(upper)...]` moments. */
  def covMoments(c: Column): Column =
    ColumnBridge.column(
      CovMoments(ColumnBridge.expression(c)).toAggregateExpression())
}
