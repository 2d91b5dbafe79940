package graft.streaming

import java.sql.Timestamp

import graft.functions.MisraGries
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed heavy hitters: per event-time window, the SAME
  * Misra–Gries counter table the batch side builds with
  * `approx_top_items` — one k-entry map of state per open window
  * (bytes bounded by k, never by the stream), closed exactly once on
  * watermark timeout. The update rule is the shared
  * [[graft.functions.MisraGries.add]], so with k ≥ distinct items per
  * window the emitted counts are EXACT and equal the batch aggregate
  * over the same rows (the twin spec pins this), and with small k the
  * classic sub-n/(k+1) error bound holds.
  *
  * Same watermark/state discipline as [[DistinctSketch]]: floorDiv
  * window keying (pre-1970 safe), late rows for closed windows drop,
  * in-batch watermark crossings close inline.
  */
object TopKSketch {

  case class In(ts: Timestamp, item: String)
  case class ItemCount(item: String, count: Long)
  case class Out(window_start: Timestamp, n_rows: Long,
      items: Seq[ItemCount])
  /** Open-window state: the MG counter table + row count. */
  case class OpenWindow(counts: Map[String, Long], n: Long)

  /** Canonical output order — (count desc, item), matching the batch
    * aggregate's eval.
    */
  private def toItems(m: scala.collection.Map[String, Long]): Seq[ItemCount] =
    m.toSeq.sortBy { case (kk, c) => (-c, kk) }
      .map { case (kk, c) => ItemCount(kk, c) }

  def stream(in: Dataset[In], windowMinutes: Int, k: Int): Dataset[Out] = {
    require(windowMinutes > 0, "windowMinutes must be positive")
    require(k > 0 && k <= 65536, "k must be in [1, 65536]")
    val spark = in.sparkSession
    import spark.implicits._
    val windowMs = windowMinutes * 60000L

    in.groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (wk: Long, it: Iterator[In], state: GroupState[OpenWindow]) =>
          if (!it.hasNext) {
            val out = state.getOption.map(w =>
              Out(new Timestamp(wk * windowMs), w.n, toItems(w.counts)))
              .toSeq
            state.remove()
            out.iterator
          } else if (!state.exists &&
              state.getCurrentWatermarkMs() >= (wk + 1) * windowMs) {
            // late data for an already-closed window: DROP
            Iterator.empty
          } else {
            val w = state.getOption.getOrElse(OpenWindow(Map.empty, 0L))
            // rehydration order is irrelevant: the MG step treats
            // entries uniformly and toItems sorts the output
            val buf = scala.collection.mutable.LinkedHashMap.empty[String, Long]
            w.counts.foreach { case (kk, c) => buf.update(kk, c) }
            var n = w.n
            it.foreach { e =>
              // nulls skip the counter but count the row, exactly
              // like the batch aggregate's update
              if (e.item != null) MisraGries.add(buf, e.item, k)
              n += 1
            }
            val endMs = (wk + 1) * windowMs
            if (state.getCurrentWatermarkMs() >= endMs) {
              state.remove()
              Iterator.single(
                Out(new Timestamp(wk * windowMs), n, toItems(buf)))
            } else {
              state.update(OpenWindow(buf.toMap, n))
              state.setTimeoutTimestamp(endMs)
              Iterator.empty
            }
          }
      }
  }
}
