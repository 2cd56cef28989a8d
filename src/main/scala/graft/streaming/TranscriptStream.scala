package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transcript ingest: the incremental counterpart of
  * [[graft.derive.Derive.edges]]. The batch derivation uses window
  * functions (lag over conv order), which streaming can't express — the
  * streaming form keeps the per-conversation tail (last two turn vids +
  * last role) in keyed state via `flatMapGroupsWithState` and emits
  * succession / reply / skip edges as turns arrive. Shared-tool chain
  * edges keep the same pattern keyed by tool.
  *
  * Edge weights: emit unit-weight edge events; aggregate downstream
  * (`groupBy(src,dst).sum` with a watermark, or merge into the batch edge
  * table via foreachBatch) — identical semantics to the batch groupBy.
  */
object TranscriptStream {

  final case class TurnEvent(
      conv_id: String, turn_idx: Int, role: String, tool: Option[String], vid: Long)

  final case class EdgeEvent(src: Long, dst: Long, w: Long)

  /** (lastVid, lastRole, secondLastVid) per conversation. */
  final case class ConvTail(lastVid: Long, lastRole: String, prevVid: Long, lastIdx: Int)

  /** Edges produced by appending `turns` (sorted by turn_idx) onto `tail`. */
  def advance(
      tail: Option[ConvTail], turns: Seq[TurnEvent]): (Option[ConvTail], Seq[EdgeEvent]) = {
    var t = tail
    val out = scala.collection.mutable.ArrayBuffer[EdgeEvent]()
    turns.sortBy(_.turn_idx).foreach { turn =>
      t match {
        case Some(ConvTail(lastVid, lastRole, prevVid, lastIdx)) if turn.turn_idx > lastIdx =>
          if (lastVid != turn.vid) {
            out += EdgeEvent(lastVid, turn.vid, 1L)                    // succession
            if (lastRole != turn.role) out += EdgeEvent(lastVid, turn.vid, 2L) // reply
          }
          if (prevVid >= 0 && prevVid != turn.vid)
            out += EdgeEvent(prevVid, turn.vid, 1L)                    // skip
          t = Some(ConvTail(turn.vid, turn.role, lastVid, turn.turn_idx))
        case Some(_) => () // late/duplicate turn: drop (at-least-once upstream)
        case None =>
          t = Some(ConvTail(turn.vid, turn.role, -1L, turn.turn_idx))
      }
    }
    (t, out.toSeq)
  }

  /** Turn stream → edge-event stream with per-conversation state. */
  def edgeEvents(turns: Dataset[TurnEvent]): Dataset[EdgeEvent] = {
    implicit val edgeEnc = Encoders.product[EdgeEvent]
    implicit val stateEnc = Encoders.product[ConvTail]
    turns
      .groupByKey(_.conv_id)(Encoders.STRING)
      .flatMapGroupsWithState[ConvTail, EdgeEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, it: Iterator[TurnEvent], state: GroupState[ConvTail]) =>
          val (next, out) = advance(state.getOption, it.toSeq)
          next.foreach(state.update)
          out.iterator
      }
  }

  /** Running weighted edge table (complete-mode aggregate) — for
    * memory-sink tests and foreachBatch merges. */
  def edgeCounts(events: Dataset[EdgeEvent]): DataFrame =
    events.groupBy("src", "dst").agg(sum("w").cast("double").as("weight"))

  /** Watermarked per-window turn rates: the standard event-time windowed
    * aggregation over the transcript stream (turns/window per role),
    * append-mode — state for a window is dropped once the watermark
    * passes `lateness` behind max event time, so it is bounded at any
    * input rate. */
  def turnRates(
      turns: DataFrame,               // needs (ts TIMESTAMP, role STRING)
      windowLen: String = "1 minute",
      lateness: String = "2 minutes"): DataFrame =
    turns
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("window.start").as("win_start"), col("role"), col("n_turns"))
}
