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
  *     table into that table's `_meta` dir: a POINTER to the pre-tx
  *     base (its on-disk metadata version — old versions are never
  *     swept, and the base's manifests stay referenced while the
  *     staged install is head) plus state hashes of the base and of
  *     the staged content about to install, and the coordinator
  *     `_meta` dir (the first dirty table's). Markers are O(1)-sized:
  *     at 100 TB a table's metadata inlines very large file lists, so
  *     embedding serialized metadata in a per-commit marker would make
  *     every multi-table COMMIT O(table size).
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
  * State identity uses [[TxMarker.stateHash]] — a digest of the
  * semantic state (snapshot id+operation chain + the TIP snapshot's
  * file-path set + schema history + properties) rather than raw JSON
  * equality,
  * because the dehydrate/hydrate round trip through manifest files
  * does not preserve byte-level layout, and recovery runs in a
  * DIFFERENT process than the one that wrote the marker.
  */
final case class TxMarker(
    txId: String,
    table: String,
    location: String,
    coordinator: String, // _meta dir holding the decision file
    baseVersion: Int, // on-disk metadata version of the pre-tx state
    baseStateHash: String, // stateHash of the pre-tx base
    stagedStateHash: String, // stateHash of the install content
    stagedPaths: Seq[String]) // data files only this tx references

object TxMarker {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

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

  /** The marker's pre-tx base, loaded from its on-disk version file
    * (old versions are never swept; see the class doc for why the
    * base's manifests stay live through the recovery window).
    */
  def baseOf(m: TxMarker): TableMetadata =
    TableMetadata.loadVersion(m.location, m.baseVersion)

  /** Marker files present in a table's `_meta` dir: (file name, path). */
  def list(location: String): Seq[(String, String)] = {
    val dir = TableMetadata.metaDir(location)
    LakeFs.listNames(dir).filter(n =>
      n.startsWith("txmarker-") && n.endsWith(".json"))
      .map(n => (n, LakeFs.child(dir, n)))
  }

  /** Semantic state identity: two metadata documents describe the same
    * table state iff the snapshot id+operation chain, the tip
    * snapshot's file set, current pointers, schema history, partition
    * spec and properties all agree. Ignores manifest-file layout,
    * which the dehydrate/hydrate round trip may legitimately reshape.
    */
  def sameState(a: TableMetadata, b: TableMetadata): Boolean =
    canonicalState(a) == canonicalState(b)

  /** SHA-256 of the canonical state — stable ACROSS processes (crash
    * recovery reads markers a dead JVM wrote), unlike case-class
    * hashCodes.
    */
  def stateHash(m: TableMetadata): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.digest(canonicalState(m)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  private def canonicalState(m: TableMetadata): String = {
    // Bounded to the TIP: snapshot ids are engine-generated and unique,
    // so the sorted id+operation chain alone pins the retained history;
    // only the CURRENT snapshot's file set is spelled out. The
    // protocol's equality checks ask "is the disk state exactly the
    // base / exactly this install?" — id chain + tip content + schema
    // history + properties answer that, and hashing stays O(current
    // metadata) instead of O(retained snapshots × files) per marker
    // even on tables with long retained history at 100 TB.
    val snaps = m.snapshots.sortBy(_.id)
      .map(s => s"${s.id}|${s.operation}").mkString(";")
    val tip = m.snapshots.find(_.id == m.currentSnapshotId)
      .map(_.files.map(_.path).sorted.mkString(",")).getOrElse("")
    val schemas = m.schemas.sortBy(_.version).map { sv =>
      s"${sv.version}:" + sv.fields.map(f =>
        s"${f.id},${f.name},${f.dataType},${f.nullable}," +
          f.initialDefault.getOrElse("")).mkString("|")
    }.mkString(";")
    val props = m.properties.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString(";")
    Seq(m.currentSnapshotId, snaps, tip, m.currentSchemaVersion, schemas,
      m.partitionSpec.mkString(","), props, m.nextFieldId).mkString("\n")
  }
}
