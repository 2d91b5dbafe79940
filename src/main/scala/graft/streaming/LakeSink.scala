package graft.streaming

import graft.lake.LakeTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming ingest into managed lake tables.
  *
  * The reference has no streaming engine — its documented pattern is a
  * staging table flushed into Iceberg by cron
  * (docs/iceberg-tables.md:195-215). The Spark-native equivalent goes
  * through `writeStream.foreachBatch`: every micro-batch becomes one
  * atomic [[LakeTable.append]] snapshot commit, so readers always see
  * batch-aligned snapshots, time travel works per micro-batch, and
  * exactly-once lands on the checkpoint + idempotent-commit pair.
  */
object LakeSink {

  /** Exactly-once batch apply: the last committed batch id is stored
    * as a table property IN the snapshot commit itself, so a replayed
    * micro-batch (restart before the checkpoint advanced) is detected
    * and skipped — the idempotent-commit half of the
    * checkpoint + idempotent-sink contract.
    */
  private[graft] def processBatch(table: LakeTable, streamKey: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val key = s"stream.$streamKey.last-batch"
    val last = table.meta.properties.get(key).map(_.toLong)
    if (last.exists(_ >= batchId) || batch.isEmpty) ()
    else { table.append(batch, commitProps = Map(key -> batchId.toString)); () }
  }

  /** Continuous append: each micro-batch commits one snapshot. */
  def append(stream: DataFrame, table: LakeTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val streamKey = Integer.toHexString(checkpoint.hashCode)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(processBatch(table, streamKey) _)
      .start()
  }

  /** Windowed aggregate ingest: watermarked event-time aggregation
    * whose per-batch UPDATES are upserted into the table as
    * delete-then-append (copy-on-write on the window key) — the
    * streaming analogue of the reference's staging-flush pattern.
    *
    * Scale guard: the updated-key set is collected to the driver only
    * below `maxPredicateKeys` (watermarking keeps the active-window
    * count small, so this is the normal path), and the delete
    * predicate is chunked so no single predicate tree grows O(keys).
    * A pathological batch above the cap switches to a fully
    * distributed merge: anti-join the current table against the batch
    * keys and [[LakeTable.replace]] in one atomic commit — no driver
    * materialization at any size.
    */
  def appendWindowed(stream: DataFrame, table: LakeTable,
      checkpoint: String, keyCols: Seq[String],
      trigger: Trigger = Trigger.AvailableNow(),
      maxPredicateKeys: Int = 10000): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.{col, lit}
          val keys = batch.select(keyCols.map(col): _*).distinct()
            .limit(maxPredicateKeys + 1).collect()
          if (keys.length > maxPredicateKeys) {
            // distributed merge path: current rows not updated by this
            // batch survive, batch rows replace their keys — one
            // atomic snapshot, no driver-side key list
            val cur = table.read()
            val merged = cur.join(batch.select(keyCols.map(col): _*)
                .distinct(), keyCols, "left_anti")
              .unionByName(batch.select(cur.columns.map(col): _*))
            table.replace(merged)
            ()
          } else if (keys.nonEmpty) {
            // delete updated keys (chunked predicates), then append
            // fresh values — snapshots serialized by the commit lock
            keys.grouped(1000).foreach { chunk =>
              val pred = chunk.map { r =>
                keyCols.zipWithIndex.map { case (k, i) =>
                  col(k) <=> lit(r.get(i))
                }.reduce(_ && _)
              }.reduce(_ || _)
              table.delete(pred)
            }
            table.append(batch)
            ()
          }
        }
      }
      .start()
}
