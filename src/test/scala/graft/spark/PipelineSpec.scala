package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{LogQuadraticLayout, SketchEnvelope}
import graft.spark.functions._

class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val layout = LogQuadraticLayout(1e-3, 1e-2, 0, 1e6)

  test("salted aggregation is byte-identical to direct aggregation under skew") {
    import spark.implicits._
    // one hot key with 50k rows, 10 normal keys with 1k each
    val rnd = new java.util.SplittableRandom(1L)
    val hot = (0 until 50000).map(_ => ("hot", rnd.nextDouble() * 100))
    val normal = for (k <- 0 until 10; _ <- 0 until 1000)
      yield (s"k$k", rnd.nextDouble() * 100)
    val df = (hot ++ normal).toDF("key", "v").repartition(16)
    val direct = df
      .groupBy($"key")
      .agg(hist_sketch($"v", layout).as("sketch"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .toMap
    val salted = Pipeline
      .saltedHistogram(df, Seq("key"), "v", layout, saltBuckets = 32)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, salted(k)), s"salted differs for $k")
    }
  }

  test("checkpointed aggregation resumes and matches direct; lineage is complete") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt_test").toString
    try {
      val rnd = new java.util.SplittableRandom(2L)
      val df = (0 until 40000).map(_ => rnd.nextDouble() * 1000).toDF("v")
      val inputDir = s"$tmp/input"
      df.repartition(8).write.parquet(inputDir)
      val files = new java.io.File(inputDir)
        .listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
        .toSeq
      assert(files.size == 8)
      val ckpt = new Pipeline.CheckpointedSketch(
        spark, files, "v", layout, s"$tmp/ckpt", numChunks = 4)
      assert(ckpt.runChunks(maxChunks = 2) == 2)
      intercept[IllegalArgumentException](ckpt.result()) // incomplete
      assert(ckpt.runChunks() == 2) // resume runs only the remaining chunks
      assert(ckpt.runChunks() == 0) // idempotent: everything checkpointed
      val (merged, lineage) = ckpt.result()
      assert(lineage.map(_.rows_consumed).sum == 40000L)
      assert(lineage.map(_.chunk_id).sorted == Seq(0, 1, 2, 3))
      assert(lineage.flatMap(_.files).toSet == files.toSet)
      val directBytes = df
        .agg(hist_sketch($"v", layout))
        .collect()(0)
        .getAs[Array[Byte]](0)
      assert(SketchEnvelope.fromBytes(directBytes) == merged)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("transcript job runs end-to-end on synthesized data with sane quantiles") {
    val transcripts = Transcripts.synthesize(spark, numConvs = 300, avgTurns = 10).toDF()
    val result = TranscriptJob.run(spark, transcripts)
    assert(result.turns > 3000, s"turns=${result.turns}")
    assert(result.perRole.length == 4)
    // text lengths are log-uniform [10, 1e4]: median ~ exp((ln10+ln1e4)/2) ~ 316
    val medians = result.perRole.map(_._3)
    assert(medians.forall(m => m > 150 && m < 650), s"medians=${medians.mkString(",")}")
    assert(result.latencyP50 > 0 && result.latencyP99 > result.latencyP50)
    assert(result.toolCallsP95 > 0) // hot conversation has many tool turns
  }

  test("TranscriptMain (spark-submit entry) writes per-role table, summary, metrics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_main").toString
    try {
      Transcripts.synthesize(spark, numConvs = 200, avgTurns = 8).toDF()
        .write.parquet(s"$tmp/in")
      TranscriptMain.main(Array(s"$tmp/in", s"$tmp/out"))
      val perRole = spark.read.parquet(s"$tmp/out/per_role.parquet").collect()
      assert(perRole.nonEmpty)
      assert(perRole.forall(_.getAs[Long]("n_turns") > 0))
      val summary = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$tmp/out/summary.json"))
      assert(summary.contains("\"turns\":") && summary.contains("latency_p50_ms"))
      val metrics = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$tmp/out/metrics.json"))
      assert(metrics.contains("\"records_read\":"))
      // the listener really observed the job: records were read, tasks ran
      val records = "\"records_read\":(\\d+)".r.findFirstMatchIn(metrics).get.group(1).toLong
      val tasks = "\"tasks_completed\":(\\d+)".r.findFirstMatchIn(metrics).get.group(1).toLong
      assert(records > 0 && tasks > 0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("transcript synthesis is deterministic and contains the hot conversation") {
    import spark.implicits._
    val a = Transcripts.synthesize(spark, 50, avgTurns = 10).collect()
    val b = Transcripts.synthesize(spark, 50, avgTurns = 10).collect()
    assert(a.length == b.length)
    assert(a.map(_.hashCode()).sum == b.map(_.hashCode()).sum)
    val byConv = a.groupBy(_.conv_id).view.mapValues(_.length)
    val hot = byConv("conv-00000000")
    val rest = byConv.filter(_._1 != "conv-00000000").values
    assert(hot >= 10 * rest.max, s"hot=$hot max_rest=${rest.max}")
    // stable turn ordering: turn_idx dense per conversation
    val c = a.filter(_.conv_id == "conv-00000001").map(_.turn_idx).sorted.toSeq
    assert(c == c.indices.toSeq)
  }
}
