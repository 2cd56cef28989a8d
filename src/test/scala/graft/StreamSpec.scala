package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.TranscriptStream
import graft.streaming.TranscriptStream.{EdgeEvent, TurnEvent}

/** Streaming derivation must converge to the batch derivation on the same
  * turns (succession/reply/skip families; tool chains tested in batch). */
class StreamSpec extends SparkSpec {
  import spark.implicits._

  test("stateful streaming edge derivation == batch derivation (conv families)") {
    val turns = graft.synth.Synth.transcripts(spark, nConvs = 50, seed = 42)
    val withVid = graft.derive.Derive.withDenseVid(turns)

    // batch truth: succession + reply + skip (no tool family here)
    val batch = {
      val t = withVid
      val lagged = t.select(col("vid"),
        lag(col("vid"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("conv_id")).orderBy(col("turn_idx"))).as("v1"),
        lag(col("role"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("conv_id")).orderBy(col("turn_idx"))).as("r1"),
        col("role"),
        lag(col("vid"), 2).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("conv_id")).orderBy(col("turn_idx"))).as("v2"))
      lagged.select(explode(array(
          when(col("v1").isNotNull, struct(col("v1").as("src"), col("vid").as("dst"), lit(1L).as("w"))),
          when(col("v1").isNotNull && col("r1") =!= col("role"),
            struct(col("v1").as("src"), col("vid").as("dst"), lit(2L).as("w"))),
          when(col("v2").isNotNull, struct(col("v2").as("src"), col("vid").as("dst"), lit(1L).as("w"))))).as("e"))
        .select(col("e.src"), col("e.dst"), col("e.w"))
        .filter(col("src").isNotNull && col("src") =!= col("dst"))
        .groupBy("src", "dst").agg(sum("w").cast("double").as("weight"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }

    val events = withVid
      .select(col("conv_id"), col("turn_idx"), col("role"),
        col("tool"), col("vid"))
      .collect()
      .map(r => TurnEvent(r.getString(0), r.getInt(1), r.getString(2),
        Option(r.getString(3)), r.getLong(4)))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TurnEvent]
    val q = TranscriptStream.edgeEvents(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("edges_out").start()
    // feed in two out-of-order-across-convs batches (within-conv order kept
    // by the batch sort inside advance())
    val (a, b) = events.sortBy(e => (e.conv_id, e.turn_idx)).splitAt(events.length / 2)
    input.addData(a.toSeq); q.processAllAvailable()
    input.addData(b.toSeq); q.processAllAvailable()
    val got = spark.table("edges_out").as[EdgeEvent].collect()
      .groupBy(e => (e.src, e.dst)).view.mapValues(_.map(_.w).sum.toDouble).toMap
    q.stop()
    assert(got === batch)
  }

  test("advance() drops late/duplicate turns, seeds state correctly") {
    import TranscriptStream._
    val t0 = TranscriptStream.advance(None, Seq(TurnEvent("c", 0, "user", None, 10)))
    assert(t0._1 === Some(ConvTail(10, "user", -1, 0)) && t0._2.isEmpty)
    val t1 = TranscriptStream.advance(t0._1, Seq(
      TurnEvent("c", 1, "assistant", None, 11),
      TurnEvent("c", 1, "assistant", None, 11),  // duplicate
      TurnEvent("c", 0, "user", None, 10)))      // late
    assert(t1._2 === Seq(EdgeEvent(10, 11, 1), EdgeEvent(10, 11, 2)))
    val t2 = TranscriptStream.advance(t1._1, Seq(TurnEvent("c", 2, "user", None, 12)))
    assert(t2._2.toSet === Set(EdgeEvent(11, 12, 1), EdgeEvent(11, 12, 2), EdgeEvent(10, 12, 1)))
  }
  test("watermarked windowed turn rates: windows finalize, late rows drop") {
    implicit val sql = spark.sqlContext
    import java.sql.Timestamp
    def t(min: Int, sec: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

    val mem = MemoryStream[(Timestamp, String)]
    val out = TranscriptStream.turnRates(mem.toDF().toDF("ts", "role"),
      windowLen = "1 minute", lateness = "1 minute")
    val q = out.writeStream.format("memory").queryName("rates")
      .outputMode("append").start()
    try {
      mem.addData((t(0, 10), "user"), (t(0, 20), "assistant"),
        (t(0, 40), "user"), (t(1, 10), "user"))
      q.processAllAvailable()
      mem.addData((t(5, 0), "user")) // watermark -> 10:04: 10:00/10:01 finalize
      q.processAllAvailable()
      mem.addData((t(0, 50), "user")) // LATE: beyond watermark, must be dropped
      q.processAllAvailable()
      mem.addData((t(12, 0), "user")) // watermark -> 11:11: 10:05 finalizes
      q.processAllAvailable()

      val rows = spark.table("rates").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows.contains(("2026-01-01 10:00:00.0", "user", 2L)), s"rows=$rows")
      assert(rows.contains(("2026-01-01 10:00:00.0", "assistant", 1L)))
      assert(rows.contains(("2026-01-01 10:01:00.0", "user", 1L)))
      assert(rows.contains(("2026-01-01 10:05:00.0", "user", 1L)))
      // the late 10:00:50 row must not have produced any extra/duplicate
      // emission for the already-finalized 10:00 window
      assert(rows.count(_._1.startsWith("2026-01-01 10:00")) === 2)
    } finally q.stop()
  }

}
