package graft.spark

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core._
import graft.sketches._

/**
 * Typed Catalyst aggregators for the sketch family. Each is an
 * `Aggregator[IN, BUF, Array[Byte]]` registered through `functions.udaf`,
 * which Spark plans as a TypedImperativeAggregate inside
 * ObjectHashAggregateExec: per-partition partial aggregation (reduce) +
 * shuffle of serialized buffers + final merge. All merges are associative
 * and commutative, so results are partitioning-invariant.
 *
 * Null inputs are skipped (SQL aggregate semantics). Buffers travel as kryo
 * blobs only at the partial/final boundary — O(groups), not O(rows).
 */
object Aggs {

  /** DynaHist-semantics histogram over a double column; output is the
   * self-describing [[graft.core.SketchEnvelope]] bytes. With `packed`, the
   * per-group buffer uses adaptive bit-width counters (up to 64x less
   * resident memory at very high group cardinality). */
  final class HistogramAgg(layout: Layout, packed: Boolean = false)
      extends Aggregator[java.lang.Double, Histogram, Array[Byte]] {
    override def zero: Histogram =
      if (packed) Histogram.packed(layout) else Histogram(layout)
    override def reduce(b: Histogram, a: java.lang.Double): Histogram = {
      if (a != null) b.addValue(a.doubleValue())
      b
    }
    override def merge(b1: Histogram, b2: Histogram): Histogram = b1.add(b2)
    override def finish(b: Histogram): Array[Byte] = SketchEnvelope.toBytes(b)
    override def bufferEncoder: Encoder[Histogram] = Encoders.kryo[Histogram]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Weighted histogram over (value, count) pairs. */
  final class HistogramWeightedAgg(layout: Layout)
      extends Aggregator[(java.lang.Double, java.lang.Long), Histogram, Array[Byte]] {
    override def zero: Histogram = Histogram(layout)
    override def reduce(b: Histogram, a: (java.lang.Double, java.lang.Long)): Histogram = {
      if (a._1 != null && a._2 != null) b.addValue(a._1.doubleValue(), a._2.longValue())
      b
    }
    override def merge(b1: Histogram, b2: Histogram): Histogram = b1.add(b2)
    override def finish(b: Histogram): Array[Byte] = SketchEnvelope.toBytes(b)
    override def bufferEncoder: Encoder[Histogram] = Encoders.kryo[Histogram]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Re-merges already-finished histogram sketch columns (envelope bytes):
   * the second phase of salted/two-level aggregation and checkpoint resume. */
  final class HistogramMergeAgg
      extends Aggregator[Array[Byte], Option[Histogram], Array[Byte]] {
    override def zero: Option[Histogram] = None
    override def reduce(b: Option[Histogram], bytes: Array[Byte]): Option[Histogram] = {
      if (bytes == null || bytes.isEmpty) return b
      val h = SketchEnvelope.fromBytes(bytes)
      b match {
        case Some(acc) => Some(acc.add(h))
        case None      => Some(h)
      }
    }
    override def merge(b1: Option[Histogram], b2: Option[Histogram]): Option[Histogram] =
      (b1, b2) match {
        case (Some(a), Some(b)) => Some(a.add(b))
        case (Some(_), None)    => b1
        case _                  => b2
      }
    override def finish(b: Option[Histogram]): Array[Byte] =
      b.map(SketchEnvelope.toBytes).getOrElse(Array.empty[Byte])
    override def bufferEncoder: Encoder[Option[Histogram]] = Encoders.kryo[Option[Histogram]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Generic re-merge of already-finished sketch byte columns: the second
   * phase of two-level aggregation (e.g. per-day sketch tables merged into
   * monthly rollups) for any companion sketch. Deterministic for HLL
   * (register max), CMS (counter addition) and Bloom (bit OR); t-digest and
   * KLL merges are order-sensitive internally but keep their error bounds
   * under any merge tree. */
  abstract class BytesMergeAgg[S <: AnyRef](implicit tag: scala.reflect.ClassTag[S])
      extends Aggregator[Array[Byte], Option[S], Array[Byte]] {
    protected def decode(bytes: Array[Byte]): S
    protected def mergeSketch(a: S, b: S): S
    protected def encode(s: S): Array[Byte]
    override def zero: Option[S] = None
    override def reduce(b: Option[S], bytes: Array[Byte]): Option[S] = {
      if (bytes == null || bytes.isEmpty) return b
      val s = decode(bytes)
      b match {
        case Some(acc) => Some(mergeSketch(acc, s))
        case None      => Some(s)
      }
    }
    override def merge(b1: Option[S], b2: Option[S]): Option[S] = (b1, b2) match {
      case (Some(a), Some(b)) => Some(mergeSketch(a, b))
      case (Some(_), None)    => b1
      case _                  => b2
    }
    override def finish(b: Option[S]): Array[Byte] =
      b.map(encode).getOrElse(Array.empty[Byte])
    override def bufferEncoder: Encoder[Option[S]] = Encoders.kryo[Option[S]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class HllMergeAgg extends BytesMergeAgg[Hll] {
    override protected def decode(b: Array[Byte]): Hll = Hll.fromBytes(b)
    override protected def mergeSketch(a: Hll, b: Hll): Hll = a.merge(b)
    override protected def encode(s: Hll): Array[Byte] = s.toBytes
  }

  final class CountMinMergeAgg extends BytesMergeAgg[CountMin] {
    override protected def decode(b: Array[Byte]): CountMin = CountMin.fromBytes(b)
    override protected def mergeSketch(a: CountMin, b: CountMin): CountMin = a.merge(b)
    override protected def encode(s: CountMin): Array[Byte] = s.toBytes
  }

  final class BloomMergeAgg extends BytesMergeAgg[BloomFilter] {
    override protected def decode(b: Array[Byte]): BloomFilter = BloomFilter.fromBytes(b)
    override protected def mergeSketch(a: BloomFilter, b: BloomFilter): BloomFilter =
      a.merge(b)
    override protected def encode(s: BloomFilter): Array[Byte] = s.toBytes
  }

  final class TDigestMergeAgg extends BytesMergeAgg[TDigest] {
    override protected def decode(b: Array[Byte]): TDigest = TDigest.fromBytes(b)
    override protected def mergeSketch(a: TDigest, b: TDigest): TDigest = a.merge(b)
    override protected def encode(s: TDigest): Array[Byte] = s.toBytes
  }

  final class KllMergeAgg extends BytesMergeAgg[Kll] {
    override protected def decode(b: Array[Byte]): Kll = Kll.fromBytes(b)
    override protected def mergeSketch(a: Kll, b: Kll): Kll = a.merge(b)
    override protected def encode(s: Kll): Array[Byte] = s.toBytes
  }

  /** HyperLogLog distinct count over strings (nulls skipped). */
  final class HllStringAgg(precision: Int)
      extends Aggregator[String, Hll, Array[Byte]] {
    override def zero: Hll = Hll(precision)
    override def reduce(b: Hll, a: String): Hll = {
      if (a != null) b.addString(a)
      b
    }
    override def merge(b1: Hll, b2: Hll): Hll = b1.merge(b2)
    override def finish(b: Hll): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** HyperLogLog distinct count over longs. */
  final class HllLongAgg(precision: Int)
      extends Aggregator[java.lang.Long, Hll, Array[Byte]] {
    override def zero: Hll = Hll(precision)
    override def reduce(b: Hll, a: java.lang.Long): Hll = {
      if (a != null) b.addLong(a.longValue())
      b
    }
    override def merge(b1: Hll, b2: Hll): Hll = b1.merge(b2)
    override def finish(b: Hll): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[Hll] = Encoders.kryo[Hll]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Count-min frequency sketch over strings. */
  final class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[String, CountMin, Array[Byte]] {
    override def zero: CountMin = CountMin(depth, width)
    override def reduce(b: CountMin, a: String): CountMin = {
      if (a != null) b.addString(a)
      b
    }
    override def merge(b1: CountMin, b2: CountMin): CountMin = b1.merge(b2)
    override def finish(b: CountMin): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[CountMin] = Encoders.kryo[CountMin]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Count-weighted count-min sketch over (item, weight) pairs — e.g. token
   * frequencies where each row carries a precomputed count. */
  final class CountMinWeightedAgg(depth: Int, width: Int)
      extends Aggregator[(String, java.lang.Long), CountMin, Array[Byte]] {
    override def zero: CountMin = CountMin(depth, width)
    override def reduce(b: CountMin, a: (String, java.lang.Long)): CountMin = {
      if (a._1 != null && a._2 != null) b.addString(a._1, a._2.longValue())
      b
    }
    override def merge(b1: CountMin, b2: CountMin): CountMin = b1.merge(b2)
    override def finish(b: CountMin): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[CountMin] = Encoders.kryo[CountMin]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Bloom membership filter over longs. */
  final class BloomLongAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[java.lang.Long, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter(expectedItems, fpp)
    override def reduce(b: BloomFilter, a: java.lang.Long): BloomFilter = {
      if (a != null) b.addLong(a.longValue())
      b
    }
    override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = b1.merge(b2)
    override def finish(b: BloomFilter): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** t-digest quantile sketch over doubles. */
  final class TDigestAgg(compression: Double)
      extends Aggregator[java.lang.Double, TDigest, Array[Byte]] {
    override def zero: TDigest = TDigest(compression)
    override def reduce(b: TDigest, a: java.lang.Double): TDigest = {
      if (a != null) b.add(a.doubleValue())
      b
    }
    override def merge(b1: TDigest, b2: TDigest): TDigest = b1.merge(b2)
    override def finish(b: TDigest): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[TDigest] = Encoders.kryo[TDigest]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** KLL rank/quantile sketch over doubles. */
  final class KllAgg(k: Int)
      extends Aggregator[java.lang.Double, Kll, Array[Byte]] {
    override def zero: Kll = Kll(k)
    override def reduce(b: Kll, a: java.lang.Double): Kll = {
      if (a != null) b.add(a.doubleValue())
      b
    }
    override def merge(b1: Kll, b2: Kll): Kll = b1.merge(b2)
    override def finish(b: Kll): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[Kll] = Encoders.kryo[Kll]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
