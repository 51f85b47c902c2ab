package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One conversation turn (the engine's canonical input row shape). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

/**
 * The transcript input table: (conv_id, turn_idx, role, text, tool, ts).
 *
 * Two ways to obtain one in this sandbox:
 *  - [[fromEvents]] reshapes the driver-provided events table (SQL-expressible,
 *    so DuckDB oracles can reproduce it);
 *  - [[synthesize]] generates an arbitrarily large deterministic table
 *    distributively (each conversation is a pure function of (seed, conv_idx);
 *    generation is embarrassingly parallel over a range — no shuffle), with a
 *    Zipf-skewed turn-count distribution and one deliberately hot conversation
 *    to exercise salting.
 */
object Transcripts {

  /** Reshape the events stream into transcript form. Deterministic and
   * SQL-expressible (see the matching oracle snippets). */
  def fromEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      concat(lit("conv-"), col("user_id")).as("conv_id"),
      (row_number().over(w) - lit(1)).as("turn_idx"),
      col("event_type").as("role"),
      col("props").as("text"),
      when(col("event_type").isin("click", "purchase"), col("event_type")).as("tool"),
      col("ts"))
  }

  private val Roles = Array("user", "assistant", "tool", "system")
  private val Tools =
    Array("search", "calculator", "browser", "python", "sql", "shell", "editor", "api")

  // deterministic filler text: a fixed pseudo-sentence pool; turns take a
  // length-sliced view so lengths vary while generation stays O(length)
  private val BasePool: String = {
    val words = Array(
      "the", "quick", "model", "turn", "agent", "tool", "call", "stream", "token",
      "merge", "shuffle", "sketch", "histogram", "quantile", "latency", "batch",
      "query", "plan", "join", "filter", "reduce", "map", "state", "window")
    val sb = new StringBuilder(1 << 15)
    var x = 0x9e3779b97f4a7c15L
    while (sb.length < (1 << 15)) {
      x = splitmix(x)
      sb.append(words(((x >>> 16) % words.length).toInt)).append(' ')
    }
    sb.toString
  }

  private def splitmix(state: Long): Long = {
    var z = state + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0,1) from a splitmix draw. */
  private def unit(x: Long): Double = (x >>> 11) * 1.1102230246251565e-16

  /**
   * Deterministic synthetic transcript table. `conv 0` is hot: it gets
   * `hotFactor` times the average turn count (the skew case salting exists
   * for). Text lengths are log-uniform on [10, 10000] — mirroring the
   * reference benchmark's reciprocal distribution
   * (dynahist `src/jmh/.../AbstractRecordingSpeedBenchmark.java:29-42`).
   */
  def synthesize(
      spark: SparkSession,
      numConvs: Long,
      avgTurns: Int = 20,
      seed: Long = 42L,
      hotFactor: Int = 200,
      maxTextLen: Int = 10000): Dataset[Turn] = {
    import spark.implicits._
    val baseEpochMs = 1700000000000L // fixed epoch; no wall-clock dependence
    spark
      .range(0, numConvs, 1, spark.sparkContext.defaultParallelism)
      .as[Long]
      .flatMap { convIdx =>
        var s = splitmix(seed ^ splitmix(convIdx + 1))
        def next(): Long = { s = splitmix(s); s }
        val turnCount =
          if (convIdx == 0L) avgTurns * hotFactor
          else {
            // log-uniform on [2, 4*avgTurns] => mean ~ avgTurns
            val lo = 2.0
            val hi = 4.0 * avgTurns
            math.max(2, math.exp(
              unit(next()) * (math.log(hi) - math.log(lo)) + math.log(lo)).toInt)
          }
        var tsMs = baseEpochMs + (unit(next()) * 1e10).toLong
        (0 until turnCount).iterator.map { turnIdx =>
          val role = Roles(turnIdx % Roles.length)
          val lenDraw = unit(next())
          val len = math
            .exp(lenDraw * (math.log(maxTextLen.toDouble) - math.log(10.0)) + math.log(10.0))
            .toInt
          val off = (next() >>> 40).toInt % (BasePool.length - 10001)
          val text = BasePool.substring(off, off + len)
          val tool = if (role == "tool") Tools((next() >>> 33).toInt % Tools.length) else null
          // per-turn latency: log-uniform 100ms .. 100s
          tsMs += math.exp(unit(next()) * math.log(1000.0) + math.log(100.0)).toLong
          Turn(
            f"conv-$convIdx%08d",
            turnIdx,
            role,
            text,
            tool,
            new java.sql.Timestamp(tsMs))
        }
      }
  }
}
