package graft.lake

/** Per-table staged state of an engine transaction (reference:
  * pg_lake_iceberg/src/iceberg/metadata_operations.c:159-418 —
  * metadata operations accumulate across a PG transaction and apply
  * at pre-commit; test_iceberg_in_tx.py pins the observable
  * semantics: data files push eagerly DURING the transaction,
  * metadata publishes as ONE new version at COMMIT).
  *
  * While installed on a [[LakeTable]], every `commitOp` advances the
  * in-memory staged metadata instead of the storage CAS. `staged` is
  * `(base, current)`: `base` is the on-disk state loaded at the FIRST
  * staged write (the CAS basis at COMMIT — if the table moved past it,
  * the transaction serializes-fails instead of clobbering the
  * concurrent writer), `current` is the result of replaying every
  * staged operation. An overlay with `staged = None` marks a table as
  * transaction-scoped but untouched — reads fall through to live
  * storage (READ COMMITTED for tables this transaction never wrote).
  */
final class TxOverlay {
  @volatile var staged: Option[(TableMetadata, TableMetadata)] = None

  def dirty: Boolean = staged.isDefined
}
