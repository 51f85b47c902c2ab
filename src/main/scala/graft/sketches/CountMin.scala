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

  /**
   * Compact aggregation-buffer encoding (see [[Hll.toCompactBytes]]):
   * sparse (indexGap varint, value varint) pairs over the NONZERO counters
   * only — a partial buffer that saw a handful of items ships (and costs
   * encode CPU for) just those counters, not the whole depth x width
   * matrix. Marker byte -1 (dense payloads start with the high byte of a
   * positive int32 depth, i.e. 0); dense fallback when not clearly
   * smaller. Only ever crosses the partial->final shuffle; the stored
   * wire format is unchanged.
   */
  def toCompactBytes(c: CountMin): Array[Byte] = {
    val n = c.counters.length
    var nNonzero = 0
    var i = 0
    while (i < n) {
      if (c.counters(i) != 0L) nNonzero += 1
      i += 1
    }
    val dense = 4 + 4 + 8 + n * 8
    // conservative sparse bound: ~5 B gap + ~10 B value per pair + header
    if (20L + nNonzero.toLong * 15L >= dense.toLong) return c.toBytes
    val out = new java.io.ByteArrayOutputStream(20 + nNonzero * 8)
    out.write(0xff)
    Varint.write(out, c.depth.toLong)
    Varint.write(out, c.width.toLong)
    Varint.write(out, c.total)
    Varint.write(out, nNonzero.toLong)
    var prev = -1
    i = 0
    while (i < n) {
      if (c.counters(i) != 0L) {
        Varint.write(out, (i - prev).toLong)
        Varint.write(out, c.counters(i))
        prev = i
      }
      i += 1
    }
    out.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): CountMin = {
    if (bytes(0) == -1.toByte) { // compact sparse-pair form
      val r = new Varint.Reader(bytes, 1)
      val depth = r.read().toInt
      val width = r.read().toInt
      require(depth > 0 && width > 0 && depth.toLong * width <= Int.MaxValue,
        "corrupt count-min payload (sparse dims)")
      val total = r.read()
      val n = depth * width
      val nNonzero = r.read().toInt
      require(nNonzero >= 0 && nNonzero <= n, "corrupt count-min payload (sparse count)")
      val counters = new Array[Long](n)
      var idx = -1
      var k = 0
      while (k < nNonzero) {
        idx += r.read().toInt
        require(idx >= 0 && idx < n, "corrupt count-min payload (sparse index)")
        counters(idx) = r.read()
        k += 1
      }
      return new CountMin(depth, width, counters, total)
    }
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

  /**
   * Compact aggregation-buffer encoding (see [[Hll.toCompactBytes]]):
   * sparse nonzero-word list [-1, varint numBits, varint numHashes,
   * varint nNonzero, (varint wordIndexGap, 8-byte word)*] — a partial
   * buffer holding a handful of items ships tens of bytes instead of the
   * full bitset. Marker -1 (dense payloads start with the high byte of a
   * positive int64 numBits, i.e. 0); dense fallback when not smaller.
   * Shuffle-internal only; the stored wire format is unchanged.
   */
  def toCompactBytes(f: BloomFilter): Array[Byte] = {
    val words = f.bits
    var nNonzero = 0
    var i = 0
    while (i < words.length) {
      if (words(i) != 0L) nNonzero += 1
      i += 1
    }
    val dense = 8 + 4 + words.length * 8
    if (16L + nNonzero.toLong * 13L >= dense.toLong) return f.toBytes
    val out = new java.io.ByteArrayOutputStream(16 + nNonzero * 10)
    out.write(0xff)
    Varint.write(out, f.numBits)
    Varint.write(out, f.numHashes.toLong)
    Varint.write(out, nNonzero.toLong)
    var prev = -1
    i = 0
    while (i < words.length) {
      if (words(i) != 0L) {
        Varint.write(out, (i - prev).toLong)
        var s = 56
        val w = words(i)
        while (s >= 0) { out.write(((w >>> s) & 0xffL).toInt); s -= 8 }
        prev = i
      }
      i += 1
    }
    out.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): BloomFilter = {
    if (bytes(0) == -1.toByte) { // compact sparse-word form
      val r = new Varint.Reader(bytes, 1)
      val numBits = r.read()
      val numHashes = r.read().toInt
      require(numBits > 0 && (numBits & 63L) == 0L && (numBits >>> 6) <= Int.MaxValue &&
        numHashes > 0, "corrupt bloom payload (sparse dims)")
      val nWords = (numBits >>> 6).toInt
      val nNonzero = r.read().toInt
      require(nNonzero >= 0 && nNonzero <= nWords, "corrupt bloom payload (sparse count)")
      val words = new Array[Long](nWords)
      var idx = -1
      var k = 0
      while (k < nNonzero) {
        idx += r.read().toInt
        require(idx >= 0 && idx < nWords, "corrupt bloom payload (sparse index)")
        var w = 0L
        var b = 0
        while (b < 8) { w = (w << 8) | (r.readByte() & 0xffL); b += 1 }
        words(idx) = w
        k += 1
      }
      return new BloomFilter(numBits, numHashes, words)
    }
    val buf = ByteBuffer.wrap(bytes)
    val numBits = buf.getLong
    val numHashes = buf.getInt
    val bits = Array.fill((numBits >>> 6).toInt)(buf.getLong)
    new BloomFilter(numBits, numHashes, bits)
  }
}
