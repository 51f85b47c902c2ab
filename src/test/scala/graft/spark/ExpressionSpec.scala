package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.spark.functions._

class ExpressionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val layout = LogQuadraticLayout(1e-8, 1e-2, -1e6, 1e6)

  test("hist_bin_index native expression agrees with the kernel mapping") {
    import spark.implicits._
    val rnd = new java.util.SplittableRandom(3L)
    val vs = Array.fill(5000)(rnd.nextDouble(-2e6, 2e6))
    val got = vs.toSeq
      .toDF("v")
      .select(col("v"), hist_bin_index(col("v"), layout).as("idx"))
      .collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    got.foreach { case (v, idx) =>
      assert(idx == layout.mapToBinIndex(v), s"v=$v")
    }
  }

  test("hist_bin_index handles nulls and stays inside whole-stage codegen") {
    // a range-backed plan (not a constant-foldable local relation): nulls via
    // a conditional, codegen visible in the physical plan
    val df = spark
      .range(0, 10)
      .select(
        hist_bin_index(
          when(col("id") % 3 === 0, col("id").cast("double")),
          layout).as("idx"),
        col("id"))
    val rows = df.collect()
    rows.foreach { r =>
      if (r.getLong(1) % 3 == 0) {
        assert(r.getInt(0) == layout.mapToBinIndex(r.getLong(1).toDouble))
      } else {
        assert(r.isNullAt(0))
      }
    }
    // "*(n)" prefixes mark operators inside a whole-stage-codegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.linesIterator.exists(l => l.contains("*(") && l.contains("hist_bin_index")),
      s"expression not inside a codegen stage:\n$plan")
  }

  test("per-bin counts via hist_bin_index groupBy equal exploded sketch bins") {
    import spark.implicits._
    val rnd = new java.util.SplittableRandom(8L)
    val vs = Array.fill(20000)(rnd.nextDouble(0.001, 1e5))
    val df = vs.toSeq.toDF("v")
    val viaExpr = df
      .groupBy(hist_bin_index(col("v"), layout).as("bin_index"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val viaSketch = df
      .agg(hist_sketch(col("v"), layout).as("sk"))
      .select(explode(hist_bins(col("sk"))).as("b"))
      .select(col("b.bin_index"), col("b.cnt"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    assert(viaExpr == viaSketch)
  }

  test("hist_sketch_binary (TypedImperativeAggregate) equals the Aggregator-based sketch") {
    import spark.implicits._
    val rnd = new java.util.SplittableRandom(12L)
    val rows = (0 until 30000).map(i => (s"g${i % 5}", rnd.nextDouble() * 1e5))
    val df = rows.toDF("g", "v").repartition(8)
    val a = df
      .groupBy(col("g"))
      .agg(hist_sketch(col("v"), layout).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq)
      .toMap
    val b = df
      .groupBy(col("g"))
      .agg(hist_sketch_binary(col("v"), layout).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq)
      .toMap
    assert(a == b)
    // the binary-buffer variant must shuffle compact V1 payloads: its
    // serialized buffer is dramatically smaller than the kryo object graph
    val h = graft.core.Histogram(layout)
    rows.foreach(r => h.addValue(r._2))
    val v1 = graft.core.HistogramSerde.toBytes(h).length
    assert(v1 < 8 * h.nonEmptyBins.size, s"V1 size $v1 not compact")
  }

  test("many-group sketch aggregation is correct past the object-hash fallback threshold") {
    import spark.implicits._
    // 20k groups >> spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    // (default 128): exercises the sort-based fallback path with object buffers
    val rnd = new java.util.SplittableRandom(5L)
    val rows = (0 until 200000).map(i => (i % 20000, rnd.nextDouble() * 1000))
    val out = rows
      .toDF("g", "v")
      .groupBy(col("g"))
      .agg(hist_sketch(col("v"), layout).as("sk"))
      .select(col("g"), functions.hist_total(col("sk")).as("n"))
      .collect()
    assert(out.length == 20000)
    assert(out.forall(_.getLong(1) == 10L))
  }
}
