package graft.lake

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Crash-recovery record for a multi-table transaction COMMIT — the
  * piece that makes COMMIT all-or-nothing ACROSS tables, matching the
  * reference's PG-inherited cross-table atomicity
  * (pg_lake_iceberg/src/iceberg/metadata_operations.c applies every
  * table's metadata op under ONE PG commit;
  * pg_lake_table/tests/pytests/test_iceberg_xacts.py pins the
  * multi-process visibility).
  *
  * Protocol (presumed abort, per-table markers + one decision file):
  *
  *  1. Before installing ANY table, COMMIT writes one marker per dirty
  *     table into that table's `_meta` dir: the serialized pre-tx base,
  *     the serialized staged state it is about to install, and the
  *     coordinator `_meta` dir (the first dirty table's).
  *  2. Tables install sequentially under the usual CAS.
  *  3. On full success the engine writes `txdone-<txId>` at the
  *     coordinator (the atomic commit decision), deletes the markers,
  *     then the decision.
  *  4. On a mid-loop failure (a concurrent writer beat a later table's
  *     CAS) the engine COMPENSATES: every already-installed table is
  *     re-CASed back to its pre-tx base — pinned to the state this
  *     transaction installed, so a writer that already built on top of
  *     it is never clobbered — staged files are reaped, markers
  *     deleted, and the COMMIT raises the serialization failure with
  *     ZERO tables changed.
  *  5. A crash anywhere leaves markers behind; [[graft.LakeEngine]]'s
  *     `maintain()` sweep finds markers older than the staging grace
  *     and finishes the protocol: decision present → the transaction
  *     committed, drop the marker; decision absent → presumed abort,
  *     restore the base wherever the transaction's install is still
  *     the table head.
  *
  * State identity uses [[TxMarker.sameState]] — a semantic comparison
  * (snapshot ids + per-snapshot file-path sets + schemas + properties)
  * rather than raw JSON equality, because the dehydrate/hydrate round
  * trip through manifest files does not preserve byte-level layout.
  */
final case class TxMarker(
    txId: String,
    table: String,
    location: String,
    coordinator: String, // _meta dir holding the decision file
    baseJson: String, // serialized pre-tx metadata (restore target)
    stagedJson: String, // serialized staged metadata (install content)
    stagedPaths: Seq[String]) { // data files only this tx references

  def base: TableMetadata = TxMarker.meta(baseJson)

  def staged: TableMetadata = TxMarker.meta(stagedJson)
}

object TxMarker {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private def meta(json: String): TableMetadata =
    TableMetadata.deserialize(json)

  def markerName(txId: String): String = s"txmarker-$txId.json"

  def markerPath(location: String, txId: String): String =
    LakeFs.child(TableMetadata.metaDir(location), markerName(txId))

  def decisionPath(coordinator: String, txId: String): String =
    LakeFs.child(coordinator, s"txdone-$txId")

  def write(m: TxMarker): Unit =
    LakeFs.writeAtomic(markerPath(m.location, m.txId),
      mapper.writeValueAsBytes(m))

  def read(path: String): TxMarker =
    mapper.readValue(LakeFs.readAllBytes(path), classOf[TxMarker])

  /** Marker files present in a table's `_meta` dir: (file name, path). */
  def list(location: String): Seq[(String, String)] = {
    val dir = TableMetadata.metaDir(location)
    LakeFs.listNames(dir).filter(n =>
      n.startsWith("txmarker-") && n.endsWith(".json"))
      .map(n => (n, LakeFs.child(dir, n)))
  }

  /** Semantic state identity: two metadata documents describe the same
    * table state iff the snapshot graph (ids, operations, file-path
    * sets), current pointers, schema history, partition spec and
    * properties all agree. Ignores manifest-file layout, which the
    * dehydrate/hydrate round trip may legitimately reshape.
    */
  def sameState(a: TableMetadata, b: TableMetadata): Boolean =
    stateKey(a) == stateKey(b)

  private def stateKey(m: TableMetadata) =
    (m.currentSnapshotId,
      m.snapshots.map(s =>
        (s.id, s.operation, s.files.map(_.path).toSet)).toSet,
      m.currentSchemaVersion, m.schemas, m.partitionSpec,
      m.properties, m.nextFieldId)
}
