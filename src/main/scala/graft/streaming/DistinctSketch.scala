package graft.streaming

import java.sql.Timestamp

import graft.functions.Hll
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed distinct-count sketches: per event-time window,
  * the SAME 512-register HLL the batch side builds with
  * [[graft.functions.HllSketchAgg]] — the continuous face of the
  * persisted-sketch posture (a stream keeps one 512-byte register
  * array per open window, emits the closed window's sketch exactly
  * once on watermark timeout, and the emitted bytes are byte-identical
  * to the batch aggregate over the same rows, so downstream unions
  * with historical sketches are exact).
  */
object DistinctSketch {

  case class In(ts: Timestamp, value: String)
  case class Out(window_start: Timestamp, n_rows: Long,
      sketch: Array[Byte], est: Double)
  /** Open-window state: registers + row count. */
  case class OpenWindow(regs: Array[Byte], n: Long)

  def stream(in: Dataset[In], windowMinutes: Int): Dataset[Out] = {
    require(windowMinutes > 0, "windowMinutes must be positive")
    val spark = in.sparkSession
    import spark.implicits._
    val windowMs = windowMinutes * 60000L

    // floorDiv: `/` truncates toward zero, which would shift pre-1970
    // event times into the NEXT window and collide two windows at the
    // epoch boundary (the batch twin uses floor-based window())
    in.groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (wk: Long, it: Iterator[In], state: GroupState[OpenWindow]) =>
          if (!it.hasNext) {
            // watermark passed the window end: close exactly once
            val out = state.getOption.map { w =>
              val (_, _, est) = Hll.stats(w.regs)
              Out(new Timestamp(wk * windowMs), w.n, w.regs, est)
            }.toSeq
            state.remove()
            out.iterator
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= (wk + 1) * windowMs) {
            // late data for an already-closed window: DROP (standard
            // watermark semantics) — re-opening would both emit the
            // window twice and make setTimeoutTimestamp throw (it
            // rejects timestamps at or below the watermark)
            Iterator.empty
          } else {
            val w = state.getOption.getOrElse(
              OpenWindow(new Array[Byte](Hll.M), 0L))
            var n = w.n
            it.foreach { e =>
              // null values skip the hash, exactly like the batch
              // HllSketchAgg; the row still counts
              if (e.value != null) Hll.add(w.regs, e.value)
              n += 1
            }
            val endMs = (wk + 1) * windowMs
            if (state.getCurrentWatermarkMs() >= endMs) {
              // the watermark crossed the window end within this very
              // batch: close now (setTimeoutTimestamp would reject a
              // timestamp at or below the watermark)
              val (_, _, est) = Hll.stats(w.regs)
              state.remove()
              Iterator.single(
                Out(new Timestamp(wk * windowMs), n, w.regs, est))
            } else {
              state.update(OpenWindow(w.regs, n))
              state.setTimeoutTimestamp(endMs)
              Iterator.empty
            }
          }
      }
  }
}
