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
    */
  def appendWindowed(stream: DataFrame, table: LakeTable,
      checkpoint: String, keyCols: Seq[String],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.col
          val keys = batch.select(keyCols.map(col): _*).distinct().collect()
          if (keys.nonEmpty) {
            // delete updated keys, then append fresh values — one
            // snapshot per step, serialized by the table commit lock
            val pred = keys.map { r =>
              keyCols.zipWithIndex.map { case (k, i) =>
                col(k) <=> org.apache.spark.sql.functions.lit(r.get(i))
              }.reduce(_ && _)
            }.reduce(_ || _)
            table.delete(pred)
            table.append(batch)
            ()
          }
        }
      }
      .start()
}
