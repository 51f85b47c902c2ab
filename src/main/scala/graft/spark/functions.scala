package graft.spark

import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.{udaf, udf}

import graft.core._
import graft.sketches._

/** One exploded histogram bin row. */
final case class BinRow(bin_index: Int, cnt: Long, lower: Double, upper: Double)

/**
 * Column-level sketch API: aggregation functions producing sketch bytes, and
 * scalar functions querying them. Aggregations run distributed (partial +
 * final); the scalar query functions are cheap per-group post-processing.
 *
 * Everything is also SQL-registrable via [[functions.registerAll]].
 */
object functions {

  // -------------------------------------------------------------------------
  // aggregation columns
  // -------------------------------------------------------------------------

  /** Error-bounded histogram sketch of a double column. */
  def hist_sketch(c: Column, layout: Layout): Column =
    udaf(new Aggs.HistogramAgg(layout), Encoders.DOUBLE).apply(c)

  /** Same aggregation with adaptive bit-width (packed) counter buffers —
   * up to 64x smaller resident per-group state; prefer when millions of
   * group buffers are live in the aggregation hash map at once. */
  def hist_sketch_packed(c: Column, layout: Layout): Column =
    udaf(new Aggs.HistogramAgg(layout, packed = true), Encoders.DOUBLE).apply(c)

  /** Same aggregation with a native TypedImperativeAggregate whose shuffle
   * buffer is the compact V1 wire format instead of a kryo object graph —
   * prefer for very high group cardinality. */
  def hist_sketch_binary(c: Column, layout: Layout): Column =
    graft.spark.expressions.HistogramSketchAgg(c, layout)

  /** Count-weighted histogram sketch over (value, weight). */
  def hist_sketch_weighted(value: Column, weight: Column, layout: Layout): Column =
    udaf(
      new Aggs.HistogramWeightedAgg(layout),
      Encoders.tuple(Encoders.DOUBLE, Encoders.LONG)).apply(value, weight)

  /** Count-weighted histogram sketch with the native TypedImperativeAggregate
   * (V1-format shuffle buffers, unboxed update) — the [[hist_sketch_binary]]
   * treatment for the weighted path; byte-identical output to
   * [[hist_sketch_weighted]]. Prefer at high group cardinality. */
  def hist_sketch_weighted_binary(value: Column, weight: Column, layout: Layout): Column =
    graft.spark.expressions.HistogramSketchWeightedAgg(value, weight, layout)

  /** Merges a column of histogram sketch bytes into one sketch (phase 2 of
   * salted/tree aggregation; checkpoint resume). */
  def hist_merge(c: Column): Column =
    udaf(new Aggs.HistogramMergeAgg, Encoders.BINARY).apply(c)

  /** HyperLogLog sketch of a string column. */
  def hll_sketch(c: Column, precision: Int = Hll.DefaultPrecision): Column =
    udaf(new Aggs.HllStringAgg(precision), Encoders.STRING).apply(c)

  /** HyperLogLog sketch of a long column. */
  def hll_sketch_long(c: Column, precision: Int = Hll.DefaultPrecision): Column =
    udaf(new Aggs.HllLongAgg(precision), Encoders.LONG).apply(c)

  /** Count-min frequency sketch of a string column. */
  def cms_sketch(c: Column, depth: Int = 5, width: Int = 2048): Column =
    udaf(new Aggs.CountMinAgg(depth, width), Encoders.STRING).apply(c)

  /** Re-merge aggregators for stored companion-sketch byte columns — the
   * second phase of two-level rollups (per-day sketch tables -> monthly). */
  def hll_merge(c: Column): Column =
    udaf(new Aggs.HllMergeAgg, Encoders.BINARY).apply(c)
  def cms_merge(c: Column): Column =
    udaf(new Aggs.CountMinMergeAgg, Encoders.BINARY).apply(c)
  def bloom_merge(c: Column): Column =
    udaf(new Aggs.BloomMergeAgg, Encoders.BINARY).apply(c)
  def tdigest_merge(c: Column): Column =
    udaf(new Aggs.TDigestMergeAgg, Encoders.BINARY).apply(c)
  def kll_merge(c: Column): Column =
    udaf(new Aggs.KllMergeAgg, Encoders.BINARY).apply(c)

  /** Count-weighted count-min sketch over (item, weight). */
  def cms_sketch_weighted(
      item: Column,
      weight: Column,
      depth: Int = 5,
      width: Int = 2048): Column =
    udaf(
      new Aggs.CountMinWeightedAgg(depth, width),
      Encoders.tuple(Encoders.STRING, Encoders.LONG)).apply(item, weight)

  /** Bloom filter of a long column. */
  def bloom_sketch(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    udaf(new Aggs.BloomLongAgg(expectedItems, fpp), Encoders.LONG).apply(c)

  /** t-digest quantile sketch of a double column. */
  def tdigest_sketch(c: Column, compression: Double = 100.0): Column =
    udaf(new Aggs.TDigestAgg(compression), Encoders.DOUBLE).apply(c)

  /** KLL rank/quantile sketch of a double column. */
  def kll_sketch(c: Column, k: Int = 200): Column =
    udaf(new Aggs.KllAgg(k), Encoders.DOUBLE).apply(c)

  // -------------------------------------------------------------------------
  // scalar sketch query functions (over sketch bytes)
  // -------------------------------------------------------------------------

  private def hist(b: Array[Byte]): Histogram = SketchEnvelope.fromBytes(b)

  val histQuantileUdf: UserDefinedFunction =
    udf((b: Array[Byte], p: Double) => hist(b).quantile(p))

  val histQuantilesUdf: UserDefinedFunction =
    udf((b: Array[Byte], ps: Seq[Double]) => {
      val pre = hist(b).preprocessed // O(log bins) per quantile
      ps.map(pre.quantile(_))
    })

  val histValueAtRankUdf: UserDefinedFunction =
    udf((b: Array[Byte], rank: Long) => hist(b).valueAt(rank))

  val histTotalUdf: UserDefinedFunction = udf((b: Array[Byte]) => hist(b).totalCount)
  val histMinUdf: UserDefinedFunction = udf((b: Array[Byte]) => hist(b).min)
  val histMaxUdf: UserDefinedFunction = udf((b: Array[Byte]) => hist(b).max)
  val histUnderflowUdf: UserDefinedFunction = udf((b: Array[Byte]) => hist(b).underflowCount)
  val histOverflowUdf: UserDefinedFunction = udf((b: Array[Byte]) => hist(b).overflowCount)

  val histBinsUdf: UserDefinedFunction = udf((b: Array[Byte]) =>
    hist(b).nonEmptyBins.map(bin =>
      BinRow(bin.binIndex, bin.binCount, bin.lowerBound, bin.upperBound)))

  // The scalar query functions below are native Catalyst expressions
  // (graft.spark.expressions.HistScalars): a static call inside whole-stage
  // codegen, no UDF boxing/encoding boundary. The UDF variants above remain
  // for compatibility.
  def hist_quantile(sketch: Column, p: Double): Column =
    expressions.HistScalars.quantile(sketch, org.apache.spark.sql.functions.lit(p))

  def hist_quantiles(sketch: Column, ps: Seq[Double]): Column =
    expressions.HistScalars.quantiles(
      sketch,
      org.apache.spark.sql.functions.array(ps.map(org.apache.spark.sql.functions.lit): _*))

  def hist_value_at_rank(sketch: Column, rank: Column): Column =
    expressions.HistScalars.valueAtRank(sketch, rank)

  /** Rank-value estimate under an explicit reconstruction policy (reference
   * `getValue(rank, ValueEstimator)`): uniform | lower_bound | upper_bound |
   * mid_point. lower/upper bracket the true order statistic; mid_point
   * halves the error bounds. Native expression (whole-stage codegen). */
  def hist_value_at_rank(sketch: Column, rank: Column, estimator: String): Column =
    expressions.HistParamScalars.valueAtRank(sketch, rank, estimator)

  /** Quantile under explicit SciPy plotting positions and value estimator
   * (reference `getQuantile(p, QuantileEstimator, ValueEstimator)`).
   * Native expression (whole-stage codegen). */
  def hist_quantile(
      sketch: Column,
      p: Double,
      alphap: Double,
      betap: Double,
      estimator: String = "uniform"): Column =
    expressions.HistParamScalars.quantile(
      sketch, org.apache.spark.sql.functions.lit(p), alphap, betap, estimator)

  def hist_total(sketch: Column): Column =
    expressions.HistScalars.stat(sketch, expressions.HistStat.Total)
  def hist_min(sketch: Column): Column =
    expressions.HistScalars.stat(sketch, expressions.HistStat.Min)
  def hist_max(sketch: Column): Column =
    expressions.HistScalars.stat(sketch, expressions.HistStat.Max)
  def hist_underflow(sketch: Column): Column =
    expressions.HistScalars.stat(sketch, expressions.HistStat.Underflow)
  def hist_overflow(sketch: Column): Column =
    expressions.HistScalars.stat(sketch, expressions.HistStat.Overflow)

  /** Array of (bin_index, cnt, lower, upper) structs; explode() it for rows. */
  def hist_bins(sketch: Column): Column = expressions.HistScalars.bins(sketch)

  /** Lossy re-binning into a different layout — native expression; also
   * SQL-callable as hist_rebin_log_quadratic/log_linear/log_optimal/otel/
   * custom with layout literals. */
  def hist_rebin(sketch: Column, newLayout: Layout): Column =
    expressions.HistParamScalars.rebin(sketch, newLayout)

  /** Converts a histogram blob written by the reference toolchain
   * (`Layout.writeWithTypeInfo` + V1 payload) into this library's sketch
   * envelope — the column-level migration path for existing data. Native
   * expression; SQL-callable as hist_from_reference. */
  def hist_from_reference(c: Column): Column = expressions.HistParamScalars.fromReference(c)

  /** Inverse of [[hist_from_reference]]: emits blobs the reference
   * toolchain reads back with `Layout.readWithTypeInfo` + V1 read. */
  def hist_to_reference(c: Column): Column = expressions.HistParamScalars.toReference(c)

  /** Scalar merge of two sketch columns. */
  val histMerge2Udf: UserDefinedFunction = udf((a: Array[Byte], b: Array[Byte]) => {
    if (a == null || a.isEmpty) b
    else if (b == null || b.isEmpty) a
    else SketchEnvelope.toBytes(hist(a).add(hist(b)))
  })

  def hist_merge2(a: Column, b: Column): Column = histMerge2Udf(a, b)

  /** Bin index of a value under a layout — a native Catalyst expression
   * (whole-stage codegen, no boxing); see
   * [[graft.spark.expressions.HistBinIndex]]. */
  def hist_bin_index(value: Column, layout: Layout): Column =
    graft.spark.expressions.HistBinIndex(value, layout)

  val hllEstimateUdf: UserDefinedFunction =
    udf((b: Array[Byte]) => Hll.fromBytes(b).estimate)

  def hll_estimate(sketch: Column): Column = hllEstimateUdf(sketch)

  val cmsEstimateUdf: UserDefinedFunction =
    udf((b: Array[Byte], item: String) => CountMin.fromBytes(b).estimateString(item))

  def cms_estimate(sketch: Column, item: Column): Column = cmsEstimateUdf(sketch, item)

  val cmsTotalUdf: UserDefinedFunction = udf((b: Array[Byte]) => CountMin.fromBytes(b).total)
  def cms_total(sketch: Column): Column = cmsTotalUdf(sketch)

  val bloomMightContainUdf: UserDefinedFunction =
    udf((b: Array[Byte], item: Long) => BloomFilter.fromBytes(b).mightContainLong(item))

  def bloom_might_contain(sketch: Column, item: Column): Column =
    bloomMightContainUdf(sketch, item)

  val tdigestQuantileUdf: UserDefinedFunction =
    udf((b: Array[Byte], p: Double) => TDigest.fromBytes(b).quantile(p))

  def tdigest_quantile(sketch: Column, p: Double): Column =
    tdigestQuantileUdf(sketch, org.apache.spark.sql.functions.lit(p))

  val tdigestCdfUdf: UserDefinedFunction =
    udf((b: Array[Byte], x: Double) => TDigest.fromBytes(b).cdf(x))

  def tdigest_cdf(sketch: Column, x: Column): Column = tdigestCdfUdf(sketch, x)

  val kllQuantileUdf: UserDefinedFunction =
    udf((b: Array[Byte], p: Double) => Kll.fromBytes(b).quantile(p))

  def kll_quantile(sketch: Column, p: Double): Column =
    kllQuantileUdf(sketch, org.apache.spark.sql.functions.lit(p))

  val kllRankUdf: UserDefinedFunction =
    udf((b: Array[Byte], x: Double) => Kll.fromBytes(b).rank(x))

  def kll_rank(sketch: Column, x: Column): Column = kllRankUdf(sketch, x)

  // -------------------------------------------------------------------------
  // SQL registration
  // -------------------------------------------------------------------------

  /**
   * Registers the sketch functions for SQL use on an existing session.
   *
   * The histogram scalar queries and layout-parameterized aggregates go in
   * as NATIVE expression builders (same table `SparkSessionExtensions`
   * injects — `hist_sketch_log_quadratic(v, 1e-3, 1e-2, 0, 1e6)` etc. are
   * SQL-callable with arbitrary layout literals); the `Aggregator`-backed
   * companion sketches register through the UDF registry.
   */
  def registerAll(spark: SparkSession): Unit = {
    GraftExtensions.nativeBuilders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.RegistryBridge.registerNative(spark, name, builder)
    }
    val defaultLayout: Layout = LogQuadraticLayout(1e-8, 1e-2, -1e9, 1e9)
    spark.udf.register(
      "hist_sketch",
      udaf(new Aggs.HistogramAgg(defaultLayout), Encoders.DOUBLE))
    spark.udf.register("hist_merge", udaf(new Aggs.HistogramMergeAgg, Encoders.BINARY))
    spark.udf.register(
      "hist_sketch_weighted",
      udaf(
        new Aggs.HistogramWeightedAgg(defaultLayout),
        Encoders.tuple(Encoders.DOUBLE, Encoders.LONG)))
    // hll_sketch / cms_sketch / cms_sketch_weighted / bloom_sketch /
    // tdigest_sketch / kll_sketch register above as NATIVE parameterized
    // builders (per-call accuracy literals, e.g. hll_sketch(c, 12),
    // cms_sketch(c, 5, 1024), bloom_sketch(k, 1e5, 0.01)); the kryo
    // Aggregator forms stay on the Column DSL (functions.hll_sketch etc.)
    // two-level rollup re-aggregators over stored sketch byte columns
    spark.udf.register("hll_merge", udaf(new Aggs.HllMergeAgg, Encoders.BINARY))
    spark.udf.register("cms_merge", udaf(new Aggs.CountMinMergeAgg, Encoders.BINARY))
    spark.udf.register("bloom_merge", udaf(new Aggs.BloomMergeAgg, Encoders.BINARY))
    spark.udf.register("tdigest_merge", udaf(new Aggs.TDigestMergeAgg, Encoders.BINARY))
    spark.udf.register("kll_merge", udaf(new Aggs.KllMergeAgg, Encoders.BINARY))
    spark.udf.register("hll_estimate", hllEstimateUdf)
    spark.udf.register("cms_estimate", cmsEstimateUdf)
    spark.udf.register("bloom_might_contain", bloomMightContainUdf)
    spark.udf.register("tdigest_quantile", tdigestQuantileUdf)
    spark.udf.register("tdigest_cdf", tdigestCdfUdf)
    spark.udf.register("kll_quantile", kllQuantileUdf)
    spark.udf.register("kll_rank", kllRankUdf)
    // text-analysis / dedup scalar surface for SQL-only users (the column
    // values these compute are oracle-covered through q10/q11/q12/q14/q17;
    // SQL resolution parity is asserted in ExpressionSpec)
    spark.udf.register("token_count", (s: String) => graft.text.TextFunctions.tokenCount(s))
    spark.udf.register(
      "bpeish_token_count",
      (s: String) => graft.text.TextFunctions.bpeishTokenCount(s))
    spark.udf.register("quality_score", (s: String) => graft.text.TextFunctions.qualityScore(s))
    spark.udf.register("lang_id", (s: String) => graft.text.TextFunctions.langId(s))
    spark.udf.register("doc_fingerprint", (s: String) => graft.text.TextFunctions.fingerprint64(s))
    spark.udf.register("simhash64", (s: String) => graft.text.TextFunctions.simhash64(s))
    spark.udf.register(
      "hamming64",
      (a: Long, b: Long) => graft.text.TextFunctions.hammingDistance(a, b))
    spark.udf.register(
      "shingle_jaccard",
      (a: String, b: String, k: Int) => graft.text.TextFunctions.shingleJaccard(a, b, k))
    spark.udf.register(
      "minhash_signature",
      (s: String, numHashes: Int, k: Int) =>
        graft.text.TextFunctions.minhashSignature(s, numHashes, k))
    spark.udf.register(
      "cosine_sim",
      (a: Seq[Float], b: Seq[Float]) => {
        val len = math.min(a.length, b.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < len) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      })
  }
}
