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

  /** Micro-batch maintenance cadence: streaming appends land one or
    * more SMALL files per micro-batch, which at 100 TB scale
    * accumulates millions of files — the reference's autovacuum
    * compacts managed tables on a 10-minute timer
    * (pg_lake_table/src/ddl/vacuum.c:94-98). The Spark-native
    * analogue rides the batch counter: every `every` committed
    * micro-batches the sink folds small files into target-size ones.
    * [[LakeTable.compact]] is CAS-guarded, retrying, and
    * row-preserving, so it is safe against concurrent appenders (the
    * ConcurrencySpec race family) and a replayed batch id re-triggers
    * at most a no-op (fewer than two small files ⇒ skip). `every <= 0`
    * disables the cadence for callers running their own maintenance.
    */
  private def maybeCompact(tables: Seq[LakeTable], batchId: Long,
      every: Int): Unit =
    if (every > 0 && batchId > 0 && batchId % every == 0)
      tables.foreach { t => t.compact(); () }

  /** Continuous append: each micro-batch commits one snapshot;
    * every `compactEvery` batches the sink compacts small files.
    */
  def append(stream: DataFrame, table: LakeTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 16): StreamingQuery = {
    val streamKey = Integer.toHexString(checkpoint.hashCode)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(table, streamKey)(batch, batchId)
        maybeCompact(Seq(table), batchId, compactEvery)
      }
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
  /** Continuous DEDUPLICATED ingestion — the end-to-end streaming shape
    * of a training-data pipeline: each micro-batch is cleaned against
    * the corpus state accumulated in `sigTable` (exact fingerprints +
    * MinHash signatures), survivors land in `docTable` and their
    * signatures in `sigTable`, so the corpus is NEVER re-read or
    * re-shingled — per-batch cost is O(batch + band collisions)
    * regardless of corpus size.
    *
    * Order of filters inside a batch:
    *   1. exact dedup within the batch (min id per fingerprint),
    *   2. near-dup within the batch ([[graft.operators.Dedup.minhashPairs]],
    *      smaller id wins),
    *   3. exact dedup vs corpus (anti-join on stored fingerprints),
    *   4. near-dup vs corpus
    *      ([[graft.operators.Dedup.incrementalMinhashPairs]] over the
    *      stored signatures; the corpus doc always wins).
    *
    * Exactly-once: each table carries its own replayed-batch guard; a
    * crash between the two appends replays the batch, the already-
    * committed table skips it, and the recomputation is deterministic
    * against the unchanged signature state, so the pair converges.
    */
  def appendDeduped(stream: DataFrame, docTable: LakeTable,
      sigTable: LakeTable, idCol: String, textCol: String,
      checkpoint: String,
      minJaccard: Double = graft.operators.PipelineParams.MinhashJaccard,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 16): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextOps}
    val streamKey = Integer.toHexString(checkpoint.hashCode)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val fp = batch.withColumn("__fp", TextOps.fingerprint(col(textCol)))
          // 1. exact within batch
          val w = org.apache.spark.sql.expressions.Window.partitionBy("__fp")
          val exactKept = fp
            .withColumn("__rep", min(col(idCol)).over(w))
            .filter(col(idCol) === col("__rep")).drop("__rep")
          // 2. near-dup within batch: smaller id wins each pair
          val inPairs = Dedup.minhashPairs(
            exactKept, idCol, textCol, minJaccard)
          val batchKept = exactKept.join(
            inPairs.select(col("b_id").as(idCol)).distinct(),
            Seq(idCol), "left_anti")
          // 3. exact vs corpus
          val corpusSigs = sigTable.read()
          val freshFp = batchKept.join(
            corpusSigs.select(col("fingerprint").as("__fp")).distinct(),
            Seq("__fp"), "left_anti")
          // 4. near-dup vs corpus: corpus always wins
          val incPairs = Dedup.incrementalMinhashPairs(
            corpusSigs, freshFp, idCol, textCol, minJaccard)
          val survivors = freshFp.join(
            incPairs.select(col("a_id").as(idCol))
              .union(incPairs.select(col("b_id").as(idCol))).distinct(),
            Seq(idCol), "left_anti")
            .cache()
          try {
            val newSigs = Dedup.minhashSignatures(survivors, idCol, textCol)
              .join(survivors.select(col(idCol).as("id"), col("__fp")), Seq("id"))
              .select(col("id"), col("__fp").as("fingerprint"),
                col("hs"), col("sig"))
            processBatch(docTable, streamKey)(
              survivors.drop("__fp"), batchId)
            processBatch(sigTable, s"$streamKey-sigs")(newSigs, batchId)
          } finally { survivors.unpersist(); () }
        }
        maybeCompact(Seq(docTable, sigTable), batchId, compactEvery)
      }
      .start()
  }

  /** Continuous line-deduplicated ingestion — the streaming twin of
    * [[graft.operators.Dedup.dedupLinesIncremental]]: each micro-batch
    * of documents is cleaned against the PERSISTED line-frequency
    * state (boilerplate lines — seen in more than `maxDocs` documents
    * across corpus + batch — removed, survivors reassembled in order),
    * the cleaned docs append to `docTable`, and the batch's own line
    * frequencies append to `statsTable` as increments (readers
    * re-aggregate by line hash; compaction folds increments away).
    *
    * Exactly-once by the same two-table argument as [[appendDeduped]]:
    * per-table replayed-batch guards + deterministic recompute against
    * the unchanged state.
    *
    * `lines` is the line-segmentation column (array<string>) evaluated
    * against each batch, e.g. `split(col("text"), "\n")`.
    */
  def appendLineDeduped(stream: DataFrame, docTable: LakeTable,
      statsTable: LakeTable, idCol: String,
      lines: org.apache.spark.sql.Column, checkpoint: String,
      maxDocs: Long = 1, lineSep: String = "\n",
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 16): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val streamKey = Integer.toHexString(checkpoint.hashCode)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val state = statsTable.read()
            .groupBy("lh").agg(sum("docs").as("docs"))
          val cleaned = Dedup.dedupLinesIncremental(
            state, batch, idCol, lines, maxDocs, lineSep)
          val newStats = Dedup.lineStats(batch, idCol, lines)
          processBatch(docTable, streamKey)(cleaned, batchId)
          processBatch(statsTable, s"$streamKey-stats")(newStats, batchId)
        }
        // file-level compaction is row-preserving, so the stats
        // table's increment rows survive it — readers re-aggregate
        // by line hash exactly as before, just over fewer files
        maybeCompact(Seq(docTable, statsTable), batchId, compactEvery)
      }
      .start()
  }

  def appendWindowed(stream: DataFrame, table: LakeTable,
      checkpoint: String, keyCols: Seq[String],
      trigger: Trigger = Trigger.AvailableNow(),
      maxPredicateKeys: Int = 10000,
      compactEvery: Int = 16): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
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
        maybeCompact(Seq(table), batchId, compactEvery)
      }
      .start()
}
