package graft.sketches

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/**
 * KLL streaming quantile sketch (Karnin, Lang, Liberty, "Optimal Quantile
 * Approximation in Streams", FOCS 2016). A hierarchy of compactors: level h
 * holds items each representing 2^h inputs; a full level sorts itself and
 * promotes every other item (random offset) to level h+1. Capacities shrink
 * geometrically (c = 2/3) below the top level, giving O(k * log log(1/d))
 * space and normalized rank error ~ 1/k with high probability.
 *
 * Merge concatenates levels and re-compacts; associative in distribution
 * (rank-error bounds are preserved under any merge tree).
 */
final class Kll private (
    val k: Int,
    private var compactors: ArrayBuffer[ArrayBuffer[Double]],
    private var totalVar: Long,
    private var coinState: Long)
    extends Serializable {

  private val c = 2.0 / 3.0

  def total: Long = totalVar
  def isEmpty: Boolean = totalVar == 0
  def numLevels: Int = compactors.length

  private def capacity(level: Int): Int = {
    val depth = compactors.length - level - 1
    math.max(2, math.ceil(k * math.pow(c, depth.toDouble)).toInt)
  }

  private def size: Int = compactors.map(_.length).sum
  private def capacityTotal: Int = compactors.indices.map(capacity).sum

  /** Deterministic pseudo-random coin (splitmix64 step over internal state):
   * reproducible for a fixed insertion order, unbiased across compactions. */
  private def coin(): Boolean = {
    coinState += 0x9e3779b97f4a7c15L
    var z = coinState
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) < 0
  }

  def add(x: Double): this.type = {
    require(!x.isNaN, "value must not be NaN")
    compactors(0) += x
    totalVar += 1
    if (size > capacityTotal) compress()
    this
  }

  private def compress(): Unit = {
    var level = 0
    var done = false
    while (!done && level < compactors.length) {
      if (compactors(level).length >= capacity(level)) {
        if (level + 1 == compactors.length) compactors += ArrayBuffer.empty[Double]
        val sorted = compactors(level).sortInPlace()
        val n = sorted.length
        // compact an even-length range so total weight is conserved exactly;
        // an odd count retains one edge item (random edge) at this level
        var evenStart = 0
        var evenEnd = n
        var retained: Option[Double] = None
        if (n % 2 == 1) {
          if (coin()) { retained = Some(sorted(0)); evenStart = 1 }
          else { retained = Some(sorted(n - 1)); evenEnd = n - 1 }
        }
        val offset = if (coin()) 1 else 0
        val promoted = new ArrayBuffer[Double]((evenEnd - evenStart) / 2)
        var i = evenStart + offset
        while (i < evenEnd) {
          promoted += sorted(i)
          i += 2
        }
        compactors(level) = ArrayBuffer.empty[Double]
        retained.foreach(compactors(level) += _)
        compactors(level + 1) ++= promoted
        done = true
      }
      level += 1
    }
  }

  def merge(other: Kll): this.type = {
    require(k == other.k, "k mismatch")
    while (compactors.length < other.compactors.length) {
      compactors += ArrayBuffer.empty[Double]
    }
    var level = 0
    while (level < other.compactors.length) {
      compactors(level) ++= other.compactors(level)
      level += 1
    }
    totalVar += other.totalVar
    coinState ^= other.coinState * 0x9e3779b97f4a7c15L
    while (size > capacityTotal) compress()
    this
  }

  /** All (value, weight) pairs, sorted by value. */
  private def weighted: Array[(Double, Long)] = {
    val out = new ArrayBuffer[(Double, Long)](size)
    var level = 0
    while (level < compactors.length) {
      val w = 1L << level
      compactors(level).foreach(v => out += ((v, w)))
      level += 1
    }
    out.sortInPlace()(Ordering.by(_._1))
    out.toArray
  }

  /** Value at normalized rank q (0..1). */
  def quantile(q: Double): Double = {
    if (isEmpty) return Double.NaN
    val items = weighted
    val target = math.max(0L, math.min(totalVar - 1, math.round(q * (totalVar - 1)).toLong))
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum > target) return items(i)._1
      i += 1
    }
    items.last._1
  }

  /** Estimated number of recorded values <= x. */
  def rank(x: Double): Long = {
    var r = 0L
    var level = 0
    while (level < compactors.length) {
      val w = 1L << level
      compactors(level).foreach(v => if (v <= x) r += w)
      level += 1
    }
    r
  }

  def toBytes: Array[Byte] = {
    val n = size
    val buf = ByteBuffer.allocate(4 + 8 + 8 + 4 + compactors.length * 4 + n * 8)
    buf.putInt(k).putLong(totalVar).putLong(coinState).putInt(compactors.length)
    compactors.foreach(cc => buf.putInt(cc.length))
    compactors.foreach(_.foreach(buf.putDouble))
    buf.array()
  }
}

object Kll {

  def apply(k: Int = 200): Kll = {
    require(k >= 8)
    new Kll(k, ArrayBuffer(ArrayBuffer.empty[Double]), 0L, 0x243f6a8885a308d3L)
  }

  def fromBytes(bytes: Array[Byte]): Kll = {
    val buf = ByteBuffer.wrap(bytes)
    val k = buf.getInt
    val total = buf.getLong
    val coinState = buf.getLong
    val nLevels = buf.getInt
    val sizes = Array.fill(nLevels)(buf.getInt)
    val compactors = ArrayBuffer.tabulate(nLevels) { i =>
      val cc = new ArrayBuffer[Double](sizes(i))
      (0 until sizes(i)).foreach(_ => cc += buf.getDouble)
      cc
    }
    new Kll(k, compactors, total, coinState)
  }
}
