package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.LogQuadraticLayout

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.spark.SparkTestSession.spark
  private val layout = LogQuadraticLayout(1e-3, 1e-2, 0, 1e6)

  test("windowed streaming histogram equals the batch aggregation") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    try {
      val rnd = new java.util.SplittableRandom(1L)
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val rows = (0 until 20000).map { i =>
        (new java.sql.Timestamp(base.getTime + (i % 600) * 1000L), rnd.nextDouble() * 1000)
      }
      rows.toDF("ts", "v").write.parquet(s"$tmp/in")

      val stream = spark.readStream
        .schema("ts timestamp, v double")
        .parquet(s"$tmp/in")
      val agg = StreamingSketch.windowedHistogram(stream, "ts", "v", layout, "5 minutes", "1 minute")
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("stream_out")
        .start()
      try {
        q.processAllAvailable()
      } finally q.stop()

      val streamed = spark
        .table("stream_out")
        .select(col("window_start"), col("n"), col("p50"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
        .toSet

      val batch = rows
        .toDF("ts", "v")
        .groupBy(window(col("ts"), "5 minutes"))
        .agg(graft.spark.functions.hist_sketch(col("v"), layout).as("sk"))
        .select(
          col("window.start"),
          graft.spark.functions.hist_total(col("sk")),
          graft.spark.functions.hist_quantile(col("sk"), 0.5))
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
        .toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("stateful sketch state survives a query RESTART via checkpoint recovery") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream3").toString
    try {
      val rnd = new java.util.SplittableRandom(5L)
      val batch1 = (0 until 4000).map(i => (s"k${i % 3}", rnd.nextDouble() * 100))
      val batch2 = (0 until 4000).map(i => (s"k${i % 3}", 100 + rnd.nextDouble() * 100))
      batch1.toDF("k", "v").write.parquet(s"$tmp/in")

      def startQuery() = {
        val stream = spark.readStream
          .schema("k string, v double")
          .parquet(s"$tmp/in")
          .as[(String, Double)]
        StreamingSketch
          .statefulPerKeyHistogram(stream, layout)
          .toDF("k", "n", "p50")
          .writeStream
          .outputMode("update")
          // foreachBatch, not the memory sink: only fault-tolerant sinks
          // support restarting from a checkpoint
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            batch.write.mode("append").parquet(s"$tmp/out")
          }
          .option("checkpointLocation", s"$tmp/ckpt")
          .start()
      }
      // first incarnation processes batch1, then the query is STOPPED
      val q1 = startQuery()
      try q1.processAllAvailable()
      finally q1.stop()
      // new data lands while the query is down
      batch2.toDF("k", "v").write.mode("append").parquet(s"$tmp/in")
      // second incarnation recovers per-key sketch state from the checkpoint
      val q2 = startQuery()
      try q2.processAllAvailable()
      finally q2.stop()

      val finalCounts = spark.read
        .parquet(s"$tmp/out")
        .groupBy(col("k"))
        .agg(max(col("n")).as("n"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      // counts cover BOTH batches: the restarted query resumed the sketches,
      // it did not restart them from zero
      val expected = (batch1 ++ batch2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(finalCounts == expected)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("stateful per-key sketch accumulates across micro-batches") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    try {
      val rnd = new java.util.SplittableRandom(2L)
      // two micro-batches as two files
      val batch1 = (0 until 5000).map(i => (s"k${i % 3}", rnd.nextDouble() * 100))
      val batch2 = (0 until 5000).map(i => (s"k${i % 3}", 100 + rnd.nextDouble() * 100))
      batch1.toDF("k", "v").write.parquet(s"$tmp/in")

      val stream = spark.readStream
        .schema("k string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/in")
        .as[(String, Double)]
      val out = StreamingSketch.statefulPerKeyHistogram(stream, layout)
      val q = out
        .toDF("k", "n", "p50")
        .writeStream
        .outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
      try {
        q.processAllAvailable()
        batch2.toDF("k", "v").write.mode("append").parquet(s"$tmp/in")
        q.processAllAvailable()
      } finally q.stop()

      // the last update per key must reflect ALL rows of both batches
      val finalCounts = spark
        .table("stateful_out")
        .groupBy(col("k"))
        .agg(max(col("n")).as("n"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      val expected = (batch1 ++ batch2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(finalCounts == expected)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.spark.SparkTestSession.spark

  test("multimodal feature extraction: schema, determinism, balanced batches") {
    import graft.multimodal._
    val media = Multimodal.synthesize(spark, 300)
    val feats = Multimodal.extractFeatures(media, targetPartitions = 4).collect()
    assert(feats.length == 300)
    // schema contract
    assert(feats.forall(_.embedding.length == 16))
    assert(feats.forall(f => math.abs(f.embedding.map(x => x.toDouble * x).sum - 1.0) < 1e-5))
    assert(feats.filter(_.media_type == "image").forall(f => f.width >= 64 && f.duration_ms == 0))
    assert(feats.filter(_.media_type == "audio").forall(f => f.width == 0 && f.duration_ms >= 1000))
    assert(feats.filter(_.media_type == "video").forall(_.n_frames_sampled >= 1))
    // deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.synthesize(spark, 300), 8).collect()
    val a = feats.sortBy(_.media_id).map(f => (f.media_id, f.width, f.embedding.toSeq))
    val b = again.sortBy(_.media_id).map(f => (f.media_id, f.width, f.embedding.toSeq))
    assert(a.sameElements(b))
    // byte accounting matches the source
    val totalBytes = media.collect().map(_.media.length.toLong).sum
    assert(feats.map(_.n_bytes).sum == totalBytes)
  }
}
