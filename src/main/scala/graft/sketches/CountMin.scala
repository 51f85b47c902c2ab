package graft.sketches

import java.nio.ByteBuffer

/**
 * Count-min frequency sketch (Cormode & Muthukrishnan 2005). depth x width
 * counter matrix; row i uses the seeded hash family i. Point estimate is the
 * row minimum: always >= the true count, and <= true + eps*N with probability
 * 1 - delta, for eps = e/width and delta = e^-depth. Merge is element-wise
 * addition — associative and commutative.
 */
final class CountMin private (
    val depth: Int,
    val width: Int,
    val counters: Array[Long], // depth * width, row-major
    private var totalVar: Long)
    extends Serializable {

  def total: Long = totalVar

  def epsilon: Double = math.E / width
  def delta: Double = math.exp(-depth.toDouble)

  private def bucket(hash: Long, row: Int): Int = {
    val h = Hashing.hashLong(hash, seed = row.toLong + 1)
    ((h % width + width) % width).toInt
  }

  def addHash(hash: Long, count: Long = 1L): this.type = {
    require(count >= 0)
    var row = 0
    while (row < depth) {
      counters(row * width + bucket(hash, row)) += count
      row += 1
    }
    totalVar += count
    this
  }

  def addLong(v: Long, count: Long = 1L): this.type = addHash(Hashing.hashLong(v), count)
  def addString(v: String, count: Long = 1L): this.type = addHash(Hashing.hashString(v), count)

  def estimateHash(hash: Long): Long = {
    var est = Long.MaxValue
    var row = 0
    while (row < depth) {
      val c = counters(row * width + bucket(hash, row))
      if (c < est) est = c
      row += 1
    }
    est
  }

  def estimateLong(v: Long): Long = estimateHash(Hashing.hashLong(v))
  def estimateString(v: String): Long = estimateHash(Hashing.hashString(v))

  def merge(other: CountMin): this.type = {
    require(depth == other.depth && width == other.width, "dimension mismatch")
    var i = 0
    while (i < counters.length) {
      counters(i) += other.counters(i)
      i += 1
    }
    totalVar += other.totalVar
    this
  }

  def toBytes: Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 4 + 8 + counters.length * 8)
    buf.putInt(depth).putInt(width).putLong(totalVar)
    counters.foreach(buf.putLong)
    buf.array()
  }
}

object CountMin {

  def apply(depth: Int = 5, width: Int = 2048): CountMin = {
    require(depth > 0 && width > 0)
    new CountMin(depth, width, new Array[Long](depth * width), 0L)
  }

  /** Sizes the sketch for the published (eps, delta) guarantee. */
  def forGuarantee(eps: Double, delta: Double): CountMin =
    apply(math.ceil(math.log(1 / delta)).toInt, math.ceil(math.E / eps).toInt)

  def fromBytes(bytes: Array[Byte]): CountMin = {
    val buf = ByteBuffer.wrap(bytes)
    val depth = buf.getInt
    val width = buf.getInt
    val total = buf.getLong
    val counters = Array.fill(depth * width)(buf.getLong)
    new CountMin(depth, width, counters, total)
  }
}

/**
 * Bloom membership filter (Bloom 1970) using Kirsch-Mitzenmacher double
 * hashing: bit positions h1 + i*h2 mod m for i in [0, k). Merge is bit-wise
 * OR (same dimensions) — associative, commutative, idempotent.
 */
final class BloomFilter private (
    val numBits: Long,
    val numHashes: Int,
    val bits: Array[Long])
    extends Serializable {

  def addHash(hash: Long): this.type = {
    val h1 = hash
    val h2 = Hashing.hashLong(hash, seed = 0x5bf03635L)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
    this
  }

  def mightContainHash(hash: Long): Boolean = {
    val h1 = hash
    val h2 = Hashing.hashLong(hash, seed = 0x5bf03635L)
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def addLong(v: Long): this.type = addHash(Hashing.hashLong(v))
  def addString(v: String): this.type = addHash(Hashing.hashString(v))
  def mightContainLong(v: Long): Boolean = mightContainHash(Hashing.hashLong(v))
  def mightContainString(v: String): Boolean = mightContainHash(Hashing.hashString(v))

  def merge(other: BloomFilter): this.type = {
    require(numBits == other.numBits && numHashes == other.numHashes, "dimension mismatch")
    var i = 0
    while (i < bits.length) {
      bits(i) |= other.bits(i)
      i += 1
    }
    this
  }

  /** Expected false-positive probability at the current fill ratio. */
  def expectedFpp: Double = {
    var ones = 0L
    bits.foreach(w => ones += java.lang.Long.bitCount(w))
    math.pow(ones.toDouble / numBits, numHashes.toDouble)
  }

  def toBytes: Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + bits.length * 8)
    buf.putLong(numBits).putInt(numHashes)
    bits.foreach(buf.putLong)
    buf.array()
  }
}

object BloomFilter {

  /** Sizes for expected insertions at the target false-positive probability. */
  def apply(expectedItems: Long, fpp: Double): BloomFilter = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    val m = math.max(64L, math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong)
    val mWords = ((m + 63) >>> 6).toInt
    val k = math.max(1, math.round(ln2 * m / expectedItems).toInt)
    new BloomFilter(mWords.toLong * 64L, k, new Array[Long](mWords))
  }

  def fromBytes(bytes: Array[Byte]): BloomFilter = {
    val buf = ByteBuffer.wrap(bytes)
    val numBits = buf.getLong
    val numHashes = buf.getInt
    val bits = Array.fill((numBits >>> 6).toInt)(buf.getLong)
    new BloomFilter(numBits, numHashes, bits)
  }
}
