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

    // 32-way CPU sanity probe: pure-JVM splitmix64 throughput at 1 thread vs
    // `cpus` threads. On a quiet host the ratio approaches the core count; a
    // collapsed ratio means co-tenant contention, making a slow bench run
    // self-diagnosing (this shared host swings 8x run-to-run).
    def spin(iters: Long, seed: Long): Long = {
      var z = seed
      var acc = 0L
      var i = 0L
      while (i < iters) {
        z += 0x9e3779b97f4a7c15L
        var x = z
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
        x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
        acc ^= x ^ (x >>> 31)
        i += 1
      }
      acc
    }
    val spinIters = 200000000L
    val t1a = System.nanoTime()
    val sink1 = spin(spinIters, 1L)
    val oneThreadSec = (System.nanoTime() - t1a) / 1e9
    val nThreads = cpus.toInt
    val threads = (0 until nThreads).map { t =>
      new Thread(() => { val s = spin(spinIters, t + 2L); if (s == 42L) println(s) })
    }
    val tNa = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val nThreadSec = (System.nanoTime() - tNa) / 1e9
    if (sink1 == 42L) println(sink1) // keep the single-thread loop live
    // each of the N threads does the SAME work as the 1-thread run, so on a
    // quiet host nThreadSec ~ oneThreadSec and the efficiency ~ 1.0
    val cpuEff = oneThreadSec / nThreadSec

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

    // per-query job count + shuffle bytes from the listener bus: fixed-
    // overhead-bound queries (many short sequential jobs, e.g. q29's
    // LSH chain + CC rounds) are then distinguishable from data-bound ones
    // in the artifact itself
    val qListener = new org.apache.spark.scheduler.SparkListener {
      val jobsStarted = new java.util.concurrent.atomic.AtomicLong
      val jobsEnded = new java.util.concurrent.atomic.AtomicLong
      val shuffleRead = new java.util.concurrent.atomic.AtomicLong
      val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobsStarted.incrementAndGet()
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobsEnded.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      /** Listener events are async: wait (bounded) until every started job's
       * end event has been processed so per-query diffs don't bleed over. */
      def settle(): Unit = {
        val deadline = System.nanoTime() + 5000000000L
        while (jobsEnded.get() < jobsStarted.get() && System.nanoTime() < deadline)
          Thread.sleep(10)
        // a lagging listener bus (the contended-host case these metrics are
        // meant to diagnose) bleeds one query's jobs/shuffle deltas into the
        // next — make that identifiable in the artifact's stderr log
        if (jobsEnded.get() < jobsStarted.get()) {
          System.err.println(
            s"[bench] WARN settle timeout: ${jobsStarted.get() - jobsEnded.get()} " +
              "job-end event(s) unprocessed; next query's metrics may include them")
        }
        Thread.sleep(50) // task-end events for the last job trail the job end
      }
    }
    spark.sparkContext.addSparkListener(qListener)

    case class QMetrics(
        sec: Double, jobs: Long, shuffleRead: Long, shuffleWrite: Long, err: String)
    def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      qListener.settle()
      val (j0, r0, w0) =
        (qListener.jobsStarted.get(), qListener.shuffleRead.get(), qListener.shuffleWrite.get())
      val t0 = System.nanoTime()
      // a throwing query must surface as an err entry in the artifact, not
      // masquerade as a fast wall-time (verdict-r5 item 3)
      val err = try { fn(spark, sfDir).count(); null } catch {
        case t: Throwable =>
          s"${t.getClass.getName}: ${Option(t.getMessage).getOrElse("").take(200)}"
      }
      val sec = (System.nanoTime() - t0) / 1e9
      qListener.settle()
      val m = QMetrics(sec, qListener.jobsStarted.get() - j0,
        qListener.shuffleRead.get() - r0, qListener.shuffleWrite.get() - w0, err)
      System.err.println(
        f"[bench] $name: $sec%.2f s (${m.jobs} jobs, ${m.shuffleRead}%d B shuffle read)" +
          (if (err != null) s" ERR $err" else ""))
      name -> m
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.sec }
      .mkString("{", ",", "}")
    val qm = results.toSeq.sortBy(_._1).map { case (k, v) =>
      s"\"" + k + s"\":{\"jobs\":${v.jobs},\"shuffle_read_bytes\":${v.shuffleRead}," +
        s"\"shuffle_write_bytes\":${v.shuffleWrite}," +
        s"\"err\":${if (v.err == null) "null" else jsonStr(v.err)}}"
    }.mkString("{", ",", "}")
    // compact line stays small: only FAILING queries appear here ({} when clean)
    val errsJson = results.toSeq.filter(_._2.err != null).sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + jsonStr(v.err) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_.sec).sum else 0.0

    // Locale.ROOT formatting: the f-interpolator is locale-dependent and a
    // comma-decimal locale would break the driver's JSON parse
    def num(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    // common fields: "queries" stays a flat name->seconds map (the driver's
    // parser expects numeric values there); the per-query {jobs, shuffle
    // bytes} diagnostics live under the separate "query_metrics" key
    val core =
      s""""metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errsJson,""" +
        s""""sf":"$sfDir",""" +
        s""""sketch_update":{"rows":$n,"sec":${num("%.2f", engineBest)},""" +
        s""""turns_per_sec":${num("%.0f", turnsPerSec)}},""" +
        s""""cpu_probe":{"threads":$nThreads,"one_thread_sec":${num("%.2f", oneThreadSec)},""" +
        s""""n_thread_sec":${num("%.2f", nThreadSec)},""" +
        s""""parallel_efficiency":${num("%.3f", cpuEff)}}"""
    // stdout gets the COMPACT line (~1.5 kB): the driver captures a bounded
    // stdout tail, and round 4's line with embedded query_metrics was long
    // enough to get clipped and parse as null. The full artifact (with
    // query_metrics) goes to the file below.
    println(s"{$core}")
    val json = s"""{$core,"query_metrics":$qm}"""
    // also persist to a file so the round artifact of record stays
    // machine-readable even when sbt log lines interleave with stdout
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local/BENCH_last.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    } catch {
      case e: Exception => System.err.println(s"[bench] could not write $outPath: $e")
    }
    spark.stop()
  }
}
