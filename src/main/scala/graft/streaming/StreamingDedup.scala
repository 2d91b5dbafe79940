package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming exact deduplication: first-writer-wins on the normalized
  * document fingerprint, the continuous-ingest twin of
  * [[graft.operators.Dedup.exact]].
  *
  * Beyond the reference (it has no streaming engine — SURVEY.md §2.9);
  * this is how a training-data pipeline ingests a document firehose
  * without re-clustering the corpus: each arriving doc is kept only if
  * its fingerprint was never seen.
  *
  * Two state regimes:
  *  - [[exact]]: unbounded state — the fingerprint set grows with the
  *    distinct corpus. Correct at any horizon; state is one 32-char
  *    key per DISTINCT document (duplicates don't grow it), sharded by
  *    the state-store's hash partitioning, so 10⁹ distinct docs ≈ tens
  *    of GB across a cluster's state stores — viable, but unbounded.
  *  - [[exactWithinWatermark]]: bounded state — duplicates are only
  *    suppressed within the watermark horizon; state entries expire
  *    with the watermark. The steady-state footprint is
  *    O(docs per horizon), the right trade when re-crawls arrive in
  *    bursts rather than forever.
  *
  * Both emit append-mode rows and are exactly-once under the
  * checkpoint contract (the kept set is decided by the state store,
  * replayed batches re-emit identical rows).
  */
object StreamingDedup {

  /** Kept-rows stream: input columns plus the fingerprint. Unbounded
    * fingerprint state (every distinct fingerprint ever seen).
    */
  def exact(stream: DataFrame, textCol: String): DataFrame =
    stream
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .dropDuplicates("fingerprint")

  /** Kept-rows stream with watermark-bounded state: `tsCol` must be
    * the event-time column; duplicates are suppressed only within the
    * watermark delay, and state expires past it.
    */
  def exactWithinWatermark(stream: DataFrame, textCol: String,
      tsCol: String, delay: String): DataFrame =
    stream
      .withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Batch twin: the rows a first-writer-wins stream would keep when
    * fed in ascending `idCol` order — one row per fingerprint, the
    * minimum id. Used by the spec to prove stream ≡ batch.
    */
  def batchTwin(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
    val firsts = fp.groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol))
    fp.join(firsts, Seq("fingerprint", idCol), "left_semi")
  }
}
