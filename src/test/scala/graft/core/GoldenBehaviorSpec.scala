package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * Behavioral goldens replicated from the reference's own tests and demos
 * (dynahist `demo/HistogramUsage.java:48-173`,
 * `demo/MappingToCustomLayout.java:30-76`, `AbstractHistogramTest.java`):
 * exact printed bin tables (including clamped bounds formatted to 17
 * significant digits), degenerate-shape quantile exactness, merge equality,
 * and the end-to-end LogQuadratic -> CustomLayout re-binning table over one
 * million SplittableRandom(0) values.
 */
class GoldenBehaviorSpec extends AnyFunSuite {

  private val usageLayout = LogQuadraticLayout(1e-5, 1e-2, -1e6, 1e6)

  test("single value prints with both bounds clamped to the value (usage demo)") {
    val h = Histogram(usageLayout).addValue(-5.5)
    assert(
      PrintUtil.print(h) ==
        "-5.50000000000000000E+00 - -5.50000000000000000E+00 :                   1\n")
  }

  test("value with multiplicity prints the multiplicity (usage demo)") {
    val h = Histogram(usageLayout).addValue(-5.5, 5)
    assert(
      PrintUtil.print(h) ==
        "-5.50000000000000000E+00 - -5.50000000000000000E+00 :                   5\n")
  }

  test("median of one value within layout bound (usage demo)") {
    val h = Histogram(usageLayout).addValue(5.5)
    assert(math.abs(h.quantile(0.5) - 5.5) <= math.max(1e-5, 5.5 * 1e-2))
  }

  test("median of 0..100 each x5 within layout bound (usage demo)") {
    val h = Histogram(usageLayout)
    (0 to 100).foreach(i => h.addValue(i.toDouble, 5))
    assert(math.abs(h.quantile(0.5) - 50) <= math.max(1e-5, 50 * 1e-2))
  }

  test("merge equals bulk-recorded histogram incl. hashCode (usage demo)") {
    val h1 = Histogram(usageLayout).addValue(-55.5).addValue(100)
    val h2 = Histogram(usageLayout).addValue(5).addValue(-7.5)
    val total = Histogram(usageLayout).addValue(-55.5).addValue(100).addValue(5).addValue(-7.5)
    h1.add(h2)
    assert(total == h1 && total.hashCode == h1.hashCode)
  }

  test("degenerate shape: all values identical -> every estimator/quantile exact") {
    val layout = LogQuadraticLayout(1e-8, 1e-2, -1e6, 1e6)
    val h = Histogram(layout)
    (1 to 5).foreach(_ => h.addValue(2))
    for (
      est <- Seq(
        ValueEstimator.Uniform,
        ValueEstimator.LowerBound,
        ValueEstimator.UpperBound,
        ValueEstimator.MidPoint)
    ) {
      assert(h.valueAt(0, est) == 2.0)
      for (p <- Seq(0.0, 0.5, 1.0)) {
        assert(h.quantile(p, QuantileEstimator.SciPyDefault, est) == 2.0, s"p=$p est=$est")
      }
    }
  }

  test("re-binning to CustomLayout: exact table over 50 values (mapping demo 1)") {
    val layout = LogLinearLayout(1e-5, 1e-2, 0, 1e6)
    val h = Histogram(layout)
    val random = new java.util.SplittableRandom(0)
    var i = 0
    while (i < 1000000) {
      h.addValue(random.nextDouble() * i)
      i += 20000
    }
    val result = Histogram(CustomLayout(0.0, 1.0, 10.0, 100.0, 1000.0, 10000.0, 1000000.0))
    result.add(h)
    assert(
      PrintUtil.prettyPrint(result) ==
        " 0.00000000000000000E+00 -  9.99999999999999900E-01 : *\n" +
          " 1.00000000000000000E+03 -  9.99999999999999800E+03 : ****\n" +
          " 1.00000000000000000E+04 -  8.32961371433129400E+05 : " +
          "**************************************************\n")
  }

  test("re-binning to CustomLayout: exact table over 1M values (mapping demo 2)") {
    val layout = LogQuadraticLayout(1e-5, 1e-2, 0, 1e6)
    val h = Histogram(layout)
    val random = new java.util.SplittableRandom(0)
    var i = 0
    while (i < 1000000) {
      h.addValue(random.nextDouble() * i)
      i += 1
    }
    val result = Histogram(CustomLayout(0.0, 1.0, 10.0, 100.0, 1000.0, 10000.0, 1000000.0))
    result.add(h)
    assert(
      PrintUtil.print(result) ==
        " 0.00000000000000000E+00 -  9.99999999999999900E-01 :                  18\n" +
          " 1.00000000000000000E+00 -  9.99999999999999800E+00 :                 115\n" +
          " 1.00000000000000000E+01 -  9.99999999999999900E+01 :                 933\n" +
          " 1.00000000000000000E+02 -  9.99999999999999900E+02 :                6839\n" +
          " 1.00000000000000000E+03 -  9.99999999999999800E+03 :               47938\n" +
          " 1.00000000000000000E+04 -  9.99369111955750600E+05 :              944157\n")
  }

  test("empty histogram toString fields match semantics") {
    val h = Histogram(usageLayout)
    assert(h.isEmpty && h.totalCount == 0 && h.underflowCount == 0 && h.overflowCount == 0)
    assert(h.estimatedFootprintBytes > 0)
  }

  test("compressed serialization round-trips") {
    val rnd = new java.util.SplittableRandom(6L)
    val h = Histogram(usageLayout)
    (0 until 5000).foreach(_ => h.addValue(rnd.nextDouble(-1e5, 1e5)))
    val compressed = Compression.writeCompressed(h)
    val raw = HistogramSerde.toBytes(h)
    assert(compressed.length < raw.length || raw.length < 64)
    assert(Compression.readCompressed(usageLayout, compressed) == h)
  }
}
