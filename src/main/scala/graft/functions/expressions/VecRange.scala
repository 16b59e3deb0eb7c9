package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, StructField, StructType}

/** `vec_range(v array<float>, dim int-literal)` — the per-dimension
  * corpus [min, max] envelope of a float-vector column as ONE aggregate:
  * `struct<mns array<float>, mxs array<float>>`, each of length `dim`.
  * The "training" pass of the SQ8 scalar quantizer
  * ([[graft.operators.Similarity.sq8Rng]]) and the generic range-stat
  * any per-dimension normalizer needs.
  *
  * Why a native aggregate (SURVEY.md §7.6 escalation rule): the
  * composed formulation is 2·dim independent `min(element_at(v, i))` /
  * `max(element_at(v, i))` aggregates — at dim 64 that is 128 aggregate
  * states whose generated `doAggregateWithoutKey` exceeds Janino's 64KB
  * method limit, so the whole stage silently fell back to interpreted
  * evaluation on every q120/q122/stream-index run. This kernel is one
  * aggregation state (a float[2·dim] buffer) updated by a 4-instruction
  * loop, planned through ObjectHashAggregate with map-side partial
  * merge — one corpus pass, one tiny exchange, however large the
  * corpus.
  *
  * Value semantics mirror the composed min/max aggregates exactly on
  * the engine's NaN-free float corpora: per dimension, NULL slots are
  * ignored; a dimension with no non-null value (or `dim` beyond every
  * vector's length) yields NULL in both arrays; NULL vectors are
  * skipped; an empty corpus yields a NULL struct (the untyped agg's
  * all-null row). Floats compare by `<`/`>` — identical to the builtin
  * min/max ordering except for NaN, which the builtins sort largest
  * (fixture-pinned NaN-free, the [[Sq8]] convention).
  */
case class VecRangeAgg(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Float]] {

  private def child = children.head

  /** Foldable dim, bounded so a hostile SQL literal can't allocate an
    * arbitrarily large buffer per group. */
  private lazy val dim: Int = children(1).eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, children(1).dataType) match {
      case (ArrayType(FloatType, _), IntegerType)
        if children(1).foldable &&
          children(1).eval(null) != null &&
          children(1).eval(null).asInstanceOf[Int] > 0 &&
          children(1).eval(null).asInstanceOf[Int] <= (1 << 16) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "vec_range requires (array<float>, int literal in [1, 65536]), got " +
          s"${children.map(_.dataType).mkString(", ")}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("mns", ArrayType(FloatType, containsNull = true)),
    StructField("mxs", ArrayType(FloatType, containsNull = true))))
  override def prettyName: String = "vec_range"
  override def nullable: Boolean = true

  /** Buffer: mins in [0, dim), maxes in [dim, 2·dim); +Inf/−Inf mark a
    * dimension no value has reached yet. Empty array = no rows seen
    * (distinguishes an empty corpus from an all-null one: both → NULL). */
  override def createAggregationBuffer(): Array[Float] = Array.emptyFloatArray

  private def ensure(buf: Array[Float]): Array[Float] =
    if (buf.nonEmpty) buf
    else {
      val b = new Array[Float](2 * dim)
      java.util.Arrays.fill(b, 0, dim, Float.PositiveInfinity)
      java.util.Arrays.fill(b, dim, 2 * dim, Float.NegativeInfinity)
      b
    }

  override def update(buf: Array[Float], input: InternalRow): Array[Float] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val b = ensure(buf)
    val n = math.min(dim, arr.numElements())
    var d = 0
    while (d < n) {
      if (!arr.isNullAt(d)) {
        val x = arr.getFloat(d)
        if (x < b(d)) b(d) = x
        if (x > b(dim + d)) b(dim + d) = x
      }
      d += 1
    }
    b
  }

  override def merge(buf: Array[Float], other: Array[Float]): Array[Float] = {
    if (other.isEmpty) return buf
    val b = ensure(buf)
    var d = 0
    while (d < dim) {
      if (other(d) < b(d)) b(d) = other(d)
      if (other(dim + d) > b(dim + d)) b(dim + d) = other(dim + d)
      d += 1
    }
    b
  }

  override def eval(buf: Array[Float]): Any = {
    if (buf.isEmpty) return null
    val mns = new Array[Any](dim)
    val mxs = new Array[Any](dim)
    var d = 0
    while (d < dim) {
      // an untouched dimension still carries the ±Inf markers → NULL
      if (!(buf(d) == Float.PositiveInfinity &&
          buf(dim + d) == Float.NegativeInfinity)) {
        mns(d) = java.lang.Float.valueOf(buf(d))
        mxs(d) = java.lang.Float.valueOf(buf(dim + d))
      }
      d += 1
    }
    InternalRow(new GenericArrayData(mns), new GenericArrayData(mxs))
  }

  override def serialize(buf: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * buf.length)
    bb.asFloatBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](bytes.length / 4)
    ByteBuffer.wrap(bytes).asFloatBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecRangeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecRangeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecRangeAgg =
    copy(children = newChildren)
}
