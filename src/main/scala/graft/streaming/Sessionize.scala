package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event sessionization (gap-based): group a keyed event stream into
  * sessions separated by more than `gapMinutes` of event-time silence.
  *
  * Beyond the reference (it has no streaming engine — SURVEY.md §2.9);
  * this is the canonical training-data-pipeline shape for both modes:
  *
  *  - [[batch]]: pure window functions (lag → new-session flag →
  *    running sum → group), fully SQL-expressible, so the judged
  *    `q_sessionize` query has a plain DuckDB oracle.
  *  - [[stream]]: `flatMapGroupsWithState` with event-time timeout —
  *    the custom-state operator Structured Streaming is built for.
  *    Sessions close either inline (a new event arrives past the gap)
  *    or by watermark timeout, so results are append-mode and
  *    exactly-once under the checkpoint contract.
  *
  * The two paths compute the same sessions; SessionizeSpec proves the
  * stream output equals the batch formulation on the closed prefix.
  */
object Sessionize {

  case class Event(key: Long, ts: Timestamp)
  case class SessionOut(key: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)
  /** Open-session state: micros since epoch + event count. */
  case class OpenSession(startUs: Long, endUs: Long, n: Long)

  /** Batch sessionization over any frame: `keyCol` partitions,
    * `tsCol` orders (ties broken by `tieCol` for determinism).
    */
  def batch(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val marked = df.withColumn("__prev",
      lag(unix_micros(col(tsCol).cast("timestamp")), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol).cast("timestamp")) - col("__prev") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col(keyCol), col("session_no"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming sessionization. Input must already carry a watermark on
    * the event-time column mapped into [[Event.ts]].
    */
  def stream(events: Dataset[Event], gapMinutes: Int): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def close(key: Long, s: OpenSession): SessionOut =
      SessionOut(key, new Timestamp(s.startUs / 1000),
        new Timestamp(s.endUs / 1000), s.n)

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
          if (!it.hasNext) {
            // watermark passed the open session's gap horizon: close it
            val out = state.getOption.map(close(key, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val us = e.ts.getTime * 1000
              open match {
                case Some(s) if us - s.endUs > gapUs =>
                  closed += close(key, s)
                  open = Some(OpenSession(us, us, 1))
                case Some(s) =>
                  open = Some(OpenSession(s.startUs, math.max(s.endUs, us),
                    s.n + 1))
                case None =>
                  open = Some(OpenSession(us, us, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when the watermark passes end + gap
              state.setTimeoutTimestamp(s.endUs / 1000 + gapMinutes * 60000L)
            }
            closed.result().iterator
          }
      }
  }
}
