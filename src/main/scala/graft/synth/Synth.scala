package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript generator (FIXTURES.md §1) plus the
  * adapter that reshapes the driver's `events` table into the transcript
  * schema (FIXTURES.md §6).
  *
  * All values are pure functions of (seed, conv, turn) via xxhash64 — no
  * wall clock, no partition-dependent state — so any parallelism level
  * produces bit-identical tables (SURVEY.md §4.4).
  */
object Synth {

  /** Uniform [0,1) from arbitrary hashable columns: top 53 bits of
    * xxhash64. Pure column expression (codegen'd, deterministic). */
  def hashRand(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    shiftrightunsigned(xxhash64(cols: _*), 11).cast("double") / lit(9007199254740992.0) // 2^53

  /** Synthetic multi-turn transcripts in the exact BASELINE.json
    * input_hint shape: (conv_id, turn_idx, role, text, tool, ts).
    *
    * Heavy-hitter skew: 1 in 64 conversations gets ~50× the turns, and
    * tool usage is zipf-skewed over `nTools` tools — this is what the
    * salting / skew handling is exercised against.
    */
  def transcripts(
      spark: SparkSession,
      nConvs: Long,
      maxTurns: Int = 12,
      nTools: Int = 8,
      seed: Long = 42L): DataFrame = {
    val convs = spark.range(nConvs).toDF("cid")
      .withColumn(
        "n_turns",
        when(pmod(xxhash64(lit(seed), col("cid"), lit("hh")), lit(64)) === 0,
          lit(2) + pmod(xxhash64(lit(seed), col("cid")), lit(maxTurns * 50L)))
          .otherwise(lit(2) + pmod(xxhash64(lit(seed), col("cid")), lit(maxTurns.toLong))))
    convs
      .select(col("cid"), explode(sequence(lit(0), col("n_turns").cast("int") - 1)).as("turn_idx"))
      .withColumn("role",
        // user/assistant alternation with occasional tool turns
        when(pmod(xxhash64(lit(seed), col("cid"), col("turn_idx"), lit("r")), lit(10)) < 1, lit("tool"))
          .otherwise(when(pmod(col("turn_idx"), lit(2)) === 0, lit("user")).otherwise(lit("assistant"))))
      .withColumn("tool",
        // ~15% of assistant turns call a tool; tool choice zipf-ish:
        // floor(nTools * u^2) concentrates mass on tool 0 (the heavy hitter)
        when(col("role") === "assistant" &&
             hashRand(lit(seed), col("cid"), col("turn_idx"), lit("t")) < 0.15,
          concat(lit("tool_"),
            floor(lit(nTools) * pow(hashRand(lit(seed), col("cid"), col("turn_idx"), lit("tz")), 2)).cast("int")))
          .otherwise(lit(null).cast("string")))
      .select(
        format_string("c%06d", col("cid")).as("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        col("role"),
        concat(lit("c"), col("cid"), lit("t"), col("turn_idx"), lit(":"),
          hex(xxhash64(lit(seed), col("cid"), col("turn_idx"), lit("x")))).as("text"),
        col("tool"),
        (lit(1767225600L) + col("cid") * 4096L + col("turn_idx")).cast("timestamp").as("ts"))
  }

  /** Tool-call value threshold for the events adapter: an event with
    * value above this is treated as a tool invocation of its event_type.
    * Mirrored verbatim in every DuckDB oracle (SparkEntry.oracleSql). */
  val ToolValueThreshold = 250.0

  /** Vertex-id stride for the events adapter: vid = user_id * Stride +
    * turn_idx. Portable arithmetic (identical in Spark and DuckDB SQL),
    * collision-free while turns-per-user < Stride. */
  val VidStride = 1000000L

  /** Reshape the driver's events table (event_id, ts, user_id, event_type,
    * value, props) into the transcript shape, with a deterministic vertex
    * id `vid` per turn. turn ordering key (ts, event_id) is unique in the
    * driver data, so row_number is deterministic at any parallelism. */
  def eventsAsTranscripts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("long"))
      .select(
        col("user_id").cast("string").as("conv_id"),
        col("turn_idx").cast("int").as("turn_idx"),
        col("event_type").as("role"),
        col("props").as("text"),
        when(col("value") > ToolValueThreshold, col("event_type"))
          .otherwise(lit(null).cast("string")).as("tool"),
        col("ts"),
        (col("user_id") * VidStride + col("turn_idx")).as("vid"))
  }

  /** Read the events table of a driver testdata dir as transcripts. */
  def eventsAsTranscripts(spark: SparkSession, sfDir: String): DataFrame =
    eventsAsTranscripts(spark.read.parquet(s"$sfDir/events.parquet"))
}
