package graft.sketches

import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {

  test("xxHash64 distributes and is seed-sensitive") {
    val h1 = Hashing.hashString("hello")
    val h2 = Hashing.hashString("hello", seed = 1)
    val h3 = Hashing.hashString("hellp")
    assert(h1 != h2 && h1 != h3)
    assert(Hashing.hashLong(42L) == Hashing.hashLong(42L))
    // bytes vs string agreement
    assert(Hashing.hashBytes("hello".getBytes("UTF-8")) == h1)
    // long inputs exercise the 32-byte block path
    val long = "x" * 1000
    assert(Hashing.hashString(long) != Hashing.hashString(long + "y"))
  }

  test("HLL estimate within 3 standard errors across cardinalities, merge == bulk") {
    val rnd = new java.util.SplittableRandom(1L)
    for (n <- Seq(100, 10000, 200000)) {
      val items = Array.fill(n)(rnd.nextLong())
      val all = Hll()
      items.foreach(all.addLong)
      val err = math.abs(all.estimate - n) / n
      assert(err <= 3 * all.standardError, s"n=$n est=${all.estimate} err=$err")
      // split-merge gives the identical sketch (register max is order-free)
      val (a, b) = items.splitAt(n / 3)
      val ha = Hll()
      a.foreach(ha.addLong)
      val hb = Hll()
      b.foreach(hb.addLong)
      val merged = Hll().merge(hb).merge(ha)
      assert(java.util.Arrays.equals(merged.toBytes, all.toBytes))
    }
  }

  test("HLL duplicate insensitivity and serde round-trip") {
    val h = Hll(12)
    (0 until 1000).foreach(i => h.addString(s"item-${i % 100}"))
    val err = math.abs(h.estimate - 100) / 100.0
    assert(err <= 3 * h.standardError, s"est=${h.estimate}")
    val back = Hll.fromBytes(h.toBytes)
    assert(back.estimate == h.estimate)
  }

  test("count-min never underestimates and respects eps*N bound, merge == bulk") {
    val rnd = new java.util.SplittableRandom(2L)
    // zipf-ish frequencies
    val freqs = (0 until 500).map(i => (s"key$i", 1 + 5000 / (i + 1)))
    val cms = CountMin(depth = 5, width = 1024)
    freqs.foreach { case (k, f) => cms.addString(k, f.toLong) }
    val n = cms.total
    for ((k, f) <- freqs) {
      val est = cms.estimateString(k)
      assert(est >= f, s"$k underestimated: $est < $f")
      assert(est <= f + (cms.epsilon * n).ceil.toLong * 3, s"$k overestimated: $est vs $f")
    }
    // merge equals bulk exactly (counter matrix addition)
    val (a, b) = freqs.splitAt(200)
    val c1 = CountMin(5, 1024)
    a.foreach { case (k, f) => c1.addString(k, f.toLong) }
    val c2 = CountMin(5, 1024)
    b.foreach { case (k, f) => c2.addString(k, f.toLong) }
    val merged = c1.merge(c2)
    assert(java.util.Arrays.equals(merged.toBytes, cms.toBytes))
    val back = CountMin.fromBytes(cms.toBytes)
    assert(back.estimateString("key0") == cms.estimateString("key0"))
  }

  test("bloom filter: no false negatives, bounded false positives, merge == union") {
    val bf = BloomFilter(10000, 0.01)
    val members = (0 until 10000).map(i => s"member-$i")
    members.foreach(bf.addString)
    assert(members.forall(bf.mightContainString), "false negative!")
    val probes = (0 until 20000).map(i => s"nonmember-$i")
    val fp = probes.count(bf.mightContainString)
    val fpr = fp.toDouble / probes.size
    assert(fpr <= 0.03, s"observed FPP $fpr exceeds 3x design 0.01")
    // merge == bulk (bit OR)
    val b1 = BloomFilter(10000, 0.01)
    val b2 = BloomFilter(10000, 0.01)
    members.take(5000).foreach(b1.addString)
    members.drop(5000).foreach(b2.addString)
    assert(java.util.Arrays.equals(b1.merge(b2).toBytes, bf.toBytes))
    val back = BloomFilter.fromBytes(bf.toBytes)
    assert(back.mightContainString("member-17"))
  }

  test("t-digest quantiles: tight rank error, tails exact-ish, merge preserves bounds") {
    val rnd = new java.util.SplittableRandom(3L)
    val n = 100000
    val values = Array.fill(n)(math.exp(rnd.nextGaussian()))
    val sorted = values.sorted
    val td = TDigest(100)
    values.foreach(td.add(_))
    assert(td.totalWeight == n.toDouble)
    for (q <- Seq(0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999)) {
      val est = td.quantile(q)
      // rank error: position of estimate in sorted data vs target rank
      val pos = {
        val idx = java.util.Arrays.binarySearch(sorted, est)
        if (idx >= 0) idx else -idx - 1
      }
      val rankErr = math.abs(pos.toDouble / n - q)
      assert(rankErr <= 0.01, s"q=$q est=$est rankErr=$rankErr")
    }
    assert(td.quantile(0.0) == sorted.head && td.quantile(1.0) == sorted.last)
    // merged digest keeps the bound
    val (a, b) = values.splitAt(n / 2)
    val t1 = TDigest(100)
    a.foreach(t1.add(_))
    val t2 = TDigest(100)
    b.foreach(t2.add(_))
    val m = TDigest(100).merge(t1).merge(t2)
    for (q <- Seq(0.01, 0.5, 0.99)) {
      val est = m.quantile(q)
      val pos = {
        val idx = java.util.Arrays.binarySearch(sorted, est)
        if (idx >= 0) idx else -idx - 1
      }
      assert(math.abs(pos.toDouble / n - q) <= 0.015, s"merged q=$q")
    }
    // centroid count stays bounded by ~2*compression
    assert(m.centroidCount <= 220, s"centroids=${m.centroidCount}")
    val back = TDigest.fromBytes(td.toBytes)
    assert(back.quantile(0.5) == td.quantile(0.5))
  }

  test("t-digest cdf is monotone and consistent with quantile") {
    val rnd = new java.util.SplittableRandom(9L)
    val td = TDigest(100)
    (0 until 50000).foreach(_ => td.add(rnd.nextDouble() * 100))
    var prev = 0.0
    for (x <- 0 to 100 by 5) {
      val c = td.cdf(x.toDouble)
      assert(c >= prev - 1e-12, s"cdf not monotone at $x")
      prev = c
    }
    assert(math.abs(td.cdf(50.0) - 0.5) < 0.01)
  }

  test("KLL rank error within bound, weight conserved, merge keeps bound") {
    val rnd = new java.util.SplittableRandom(4L)
    val n = 200000
    val values = Array.fill(n)(rnd.nextDouble() * 1e6)
    val sorted = values.sorted
    val kll = Kll(200)
    values.foreach(kll.add(_))
    assert(kll.total == n.toLong)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = kll.quantile(q)
      val pos = {
        val idx = java.util.Arrays.binarySearch(sorted, est)
        if (idx >= 0) idx else -idx - 1
      }
      val rankErr = math.abs(pos.toDouble / n - q)
      assert(rankErr <= 0.02, s"q=$q est=$est rankErr=$rankErr")
    }
    // rank() weight conservation: rank of +inf == total
    assert(kll.rank(Double.MaxValue) == n.toLong)
    // merged sketch keeps the bound
    val (a, b) = values.splitAt(n / 2)
    val k1 = Kll(200)
    a.foreach(k1.add(_))
    val k2 = Kll(200)
    b.foreach(k2.add(_))
    val m = k1.merge(k2)
    assert(m.total == n.toLong)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = m.quantile(q)
      val pos = {
        val idx = java.util.Arrays.binarySearch(sorted, est)
        if (idx >= 0) idx else -idx - 1
      }
      assert(math.abs(pos.toDouble / n - q) <= 0.03, s"merged q=$q")
    }
    val back = Kll.fromBytes(kll.toBytes)
    assert(back.quantile(0.5) == kll.quantile(0.5) && back.total == kll.total)
  }

  test("KLL NaN rejected; empty quantile NaN") {
    val kll = Kll()
    intercept[IllegalArgumentException](kll.add(Double.NaN))
    assert(kll.quantile(0.5).isNaN)
    val td = TDigest()
    intercept[IllegalArgumentException](td.add(Double.NaN))
    assert(td.quantile(0.5).isNaN)
  }

  test("compact aggregation-buffer encodings round-trip to identical state " +
    "and shrink sparse buffers") {
    val rnd = new java.util.SplittableRandom(5L)
    // HLL: empty / few / many / near-full register fills
    for (n <- Seq(0, 1, 7, 500, 200000)) {
      val h = Hll(12)
      (0 until n).foreach(_ => h.addLong(rnd.nextLong()))
      val c = Hll.toCompactBytes(h)
      val back = Hll.fromBytes(c)
      assert(back.precision == h.precision)
      assert(java.util.Arrays.equals(back.registers, h.registers), s"hll n=$n")
      assert(java.util.Arrays.equals(back.toBytes, h.toBytes))
      if (n <= 7) assert(c.length <= 8 + 3 * n, s"hll n=$n not sparse: ${c.length}")
      if (n >= 200000) assert(c.length == h.toBytes.length) // dense fallback
    }
    // CMS: varint counters incl. multi-byte counts
    for (n <- Seq(0, 3, 1000)) {
      val cm = CountMin(5, 2048)
      (0 until n).foreach(i => cm.addLong(rnd.nextLong(), 1L + (i % 5) * 100000L))
      val c = CountMin.toCompactBytes(cm)
      val back = CountMin.fromBytes(c)
      assert(back.depth == cm.depth && back.width == cm.width && back.total == cm.total)
      assert(back.counters.toSeq == cm.counters.toSeq, s"cms n=$n")
      assert(java.util.Arrays.equals(back.toBytes, cm.toBytes))
      assert(c.length < cm.toBytes.length, s"cms n=$n not smaller: ${c.length}")
    }
    // Bloom: sparse word list vs dense fallback
    for (n <- Seq(0, 1, 10, 90000)) {
      val bf = BloomFilter(100000, 0.01)
      (0 until n).foreach(_ => bf.addLong(rnd.nextLong()))
      val c = BloomFilter.toCompactBytes(bf)
      val back = BloomFilter.fromBytes(c)
      assert(back.numBits == bf.numBits && back.numHashes == bf.numHashes)
      assert(back.bits.toSeq == bf.bits.toSeq, s"bloom n=$n")
      assert(java.util.Arrays.equals(back.toBytes, bf.toBytes))
      if (n <= 10) assert(c.length <= 16 + 13 * 7 * n, s"bloom n=$n not sparse")
      if (n >= 90000) assert(c.length == bf.toBytes.length) // dense fallback
    }
  }
}
