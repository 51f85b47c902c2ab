package graft.spark.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

import graft.core.{Histogram, HistogramSerde, Layout, SketchEnvelope}

/**
 * Histogram sketch aggregation as a native `TypedImperativeAggregate`.
 *
 * Functionally identical to the `Aggregator`-based `hist_sketch`, but the
 * aggregation buffer crossing the partial->shuffle->final boundary is the V1
 * wire format rather than a kryo object graph: a compact bit-packed payload
 * (dense-or-sparse, whichever is fewer bits) instead of the raw 8-byte-per-
 * bin counter array. At 10^5-10^6 shuffled group buffers that is the
 * difference between KBs and tens of bytes per sketch on the wire.
 */
case class HistogramSketchAgg(
    child: Expression,
    layout: Layout,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    packed: Boolean = false)
    extends TypedImperativeAggregate[Histogram] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = BinaryType

  // packed = adaptive bit-width counters for the PRE-shuffle partial buffers
  // (where the 10^5-10^6 per-group buffers live); post-shuffle deserialize
  // rebuilds dynamic counters, which is fine — result bytes are identical
  override def createAggregationBuffer(): Histogram =
    if (packed) Histogram.packed(layout) else Histogram(layout)

  // Unboxed hot path: after Spark binds references, a plain double column
  // arrives as a BoundReference — read it with getDouble instead of eval()
  // (which boxes a java.lang.Double per row; at 10^8-row rates the boxing
  // garbage alone drives young-GC pauses, measured on multi-executor runs).
  @transient private lazy val boundOrdinal: Int = child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == org.apache.spark.sql.types.DoubleType => b.ordinal
    case _ => -1
  }

  override def update(buffer: Histogram, input: InternalRow): Histogram = {
    val ord = boundOrdinal
    if (ord >= 0) {
      if (!input.isNullAt(ord)) buffer.addValue(input.getDouble(ord))
    } else {
      val v = child.eval(input)
      if (v != null) buffer.addValue(v.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: Histogram, other: Histogram): Histogram = buffer.add(other)

  override def eval(buffer: Histogram): Any = SketchEnvelope.toBytes(buffer)

  override def serialize(buffer: Histogram): Array[Byte] = HistogramSerde.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Histogram =
    HistogramSerde.fromBytes(layout, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "hist_sketch_binary"
}

object HistogramSketchAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column constructor: aggregate with a V1-binary buffer. */
  def apply(c: Column, layout: Layout): Column =
    ColumnBridge.column(
      HistogramSketchAgg(ColumnBridge.expression(c.cast("double")), layout)
        .toAggregateExpression())
}

/**
 * Count-weighted histogram aggregation with the same V1-wire aggregation
 * buffer as [[HistogramSketchAgg]] (reference semantics
 * `addValue(double, long)`, Histogram.java:283-290). The kryo
 * `Aggregator`-based `hist_sketch_weighted` remains as the
 * encoder-API variant; this is the high-group-cardinality path — compact
 * shuffle buffers plus an unboxed (getDouble/getLong) per-row update.
 */
case class HistogramSketchWeightedAgg(
    value: Expression,
    weight: Expression,
    layout: Layout,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Histogram] {

  override def children: Seq[Expression] = Seq(value, weight)

  override def nullable: Boolean = false

  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Histogram = Histogram(layout)

  // Unboxed hot path for BOTH children (see HistogramSketchAgg.boundOrdinal):
  // eval() boxes a java.lang.Double + java.lang.Long per row otherwise.
  @transient private lazy val valueOrdinal: Int = value match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == DoubleType => b.ordinal
    case _ => -1
  }
  @transient private lazy val weightOrdinal: Int = weight match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference
        if b.dataType == org.apache.spark.sql.types.LongType => b.ordinal
    case _ => -1
  }

  override def update(buffer: Histogram, input: InternalRow): Histogram = {
    val vOrd = valueOrdinal
    val wOrd = weightOrdinal
    if (vOrd >= 0 && wOrd >= 0) {
      if (!input.isNullAt(vOrd) && !input.isNullAt(wOrd)) {
        buffer.addValue(input.getDouble(vOrd), input.getLong(wOrd))
      }
    } else {
      val v = value.eval(input)
      val w = weight.eval(input)
      if (v != null && w != null) {
        buffer.addValue(v.asInstanceOf[Double], w.asInstanceOf[Long])
      }
    }
    buffer
  }

  override def merge(buffer: Histogram, other: Histogram): Histogram = buffer.add(other)

  override def eval(buffer: Histogram): Any = SketchEnvelope.toBytes(buffer)

  override def serialize(buffer: Histogram): Array[Byte] = HistogramSerde.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): Histogram =
    HistogramSerde.fromBytes(layout, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketchWeightedAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketchWeightedAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramSketchWeightedAgg =
    copy(value = newChildren(0), weight = newChildren(1))

  override def prettyName: String = "hist_sketch_weighted_binary"
}

object HistogramSketchWeightedAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column constructor: (value, weight) aggregate with a V1-binary buffer. */
  def apply(value: Column, weight: Column, layout: Layout): Column =
    ColumnBridge.column(
      HistogramSketchWeightedAgg(
        ColumnBridge.expression(value.cast("double")),
        ColumnBridge.expression(weight.cast("long")),
        layout)
        .toAggregateExpression())
}
