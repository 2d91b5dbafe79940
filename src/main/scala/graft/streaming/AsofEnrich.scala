package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the continuous twin of
  * [[graft.operators.Temporal.asofJoin]] (backward direction): a keyed
  * stream of reference updates (side 0) and fact events (side 1), where
  * every fact is enriched with the most recent reference row at or
  * before its event time, optionally within a tolerance.
  *
  * State is ONE row per key (the latest reference seen) — bounded
  * regardless of stream length, no timeline buffering. Within a batch,
  * events process in (ts, side, id) order, so a simultaneous reference
  * row matches (<= semantics) and ties resolve by the highest reference
  * id — the exact batch tie-break. Event times keep full microsecond
  * precision (Timestamp nanos), matching the batch operator's
  * unix_micros comparisons. For inputs delivered in event-time order
  * across batches the output equals the batch operator row for row
  * (AsofEnrichSpec proves it); a reference row arriving LATE (after a
  * fact it should have matched was already emitted) only affects
  * subsequent facts — the append-mode contract.
  */
object AsofEnrich {

  /** Tagged input: side 0 = reference/right, side 1 = fact/left. */
  case class In(key: Long, ts: Timestamp, side: Int, id: Long, value: Double)
  case class Enriched(key: Long, id: Long, ts: Timestamp,
      matched_id: Option[Long], matched_ts: Option[Timestamp],
      matched_value: Option[Double])
  /** Per-key state: the latest reference row (micros, id, value). */
  case class LastRef(tsUs: Long, id: Long, value: Double)

  /** Full-microsecond conversions. getTime already includes the
    * sub-second millis carried in nanos, so seconds must come from a
    * FLOOR division (floorDiv, not `/` which truncates toward zero) or
    * pre-1970 timestamps would land up to 1 s off the batch operator's
    * unix_micros; nanos then supply the exact sub-second micros.
    */
  private[graft] def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private[graft] def toTs(us: Long): Timestamp = {
    // floorDiv/floorMod: truncation would hand setNanos a NEGATIVE
    // sub-second for pre-1970 instants (IllegalArgumentException)
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  def stream(in: Dataset[In],
      toleranceUs: Option[Long] = None): Dataset[Enriched] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[In], state: GroupState[LastRef]) =>
          val sorted = it.toSeq.sortBy(e => (toUs(e.ts), e.side, e.id))
          val out = Seq.newBuilder[Enriched]
          var last = state.getOption
          sorted.foreach { e =>
            val us = toUs(e.ts)
            if (e.side == 0) {
              if (last.forall(l =>
                  (us > l.tsUs) || (us == l.tsUs && e.id > l.id)))
                last = Some(LastRef(us, e.id, e.value))
            } else {
              val m = last.filter(l =>
                toleranceUs.forall(t => us - l.tsUs <= t))
              out += Enriched(key, e.id, e.ts, m.map(_.id),
                m.map(l => toTs(l.tsUs)), m.map(_.value))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
