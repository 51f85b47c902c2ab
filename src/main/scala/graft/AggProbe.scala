package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B probe: kryo-Aggregator hist_sketch vs native
 * TypedImperativeAggregate hist_sketch_binary (V1 buffers + unboxed update)
 * on the Bench engine workload. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val layout = graft.core.LogQuadraticLayout(1e-2, 1e-2, 0, 1e9)
    val n = 200000000L
    def base = spark.range(0, n, 1, cpus.toInt * 4)
      .select((col("id") % 4).as("g"),
        exp((pmod(hash(col("id")), lit(100000)).cast("double") / 100000.0)
          * lit(math.log(1e4) - math.log(10.0)) + lit(math.log(10.0))).as("v"))
    def run(tag: String, agg: org.apache.spark.sql.Column): Unit = {
      base.groupBy(col("g")).agg(agg).collect() // warm
      var best = Double.MaxValue
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        base.groupBy(col("g")).agg(agg).collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"AGGPROBE $tag sec=$best%.2f thr=${n / best / 1e6}%.1f M/s")
    }
    run("kryo_udaf", graft.spark.functions.hist_sketch(col("v"), layout))
    run("binary_native", graft.spark.functions.hist_sketch_binary(col("v"), layout))
    spark.stop()
  }
}
