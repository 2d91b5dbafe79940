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
  * storage (READ COMMITTED for tables this transaction never wrote),
  * unless the transaction runs REPEATABLE READ / SERIALIZABLE, in
  * which case the first access pins the committed snapshot for the
  * rest of the transaction (PG's snapshot semantics for those levels;
  * our SERIALIZABLE is snapshot isolation + the commit-time CAS on
  * every written table — write-write conflicts serialize-fail, SSI's
  * read-write-antidependency detection is out of scope and
  * documented).
  */
final class TxOverlay {
  @volatile var staged: Option[(TableMetadata, TableMetadata)] = None

  /** REPEATABLE READ / SERIALIZABLE: pin the committed state at first
    * access and serve every later read (and the first write's base)
    * from the pin.
    */
  @volatile var repeatableRead: Boolean = false
  @volatile var pinned: Option[TableMetadata] = None

  /** ONE transaction-wide snapshot moment (PG RR semantics: the
    * snapshot is taken at the transaction's first query and covers
    * EVERY table). Installed by the engine at BEGIN: the first access
    * to ANY table under REPEATABLE READ pins every registered table's
    * committed state at that same instant, so a concurrent two-table
    * commit landing between the transaction's reads of table A and
    * table B can never produce cross-table skew (old A + new B).
    */
  @volatile var pinAll: () => Unit = () => ()

  /** THIS table was actually accessed (read or written) by the
    * transaction — distinct from `pinned`, which the snapshot moment
    * sets on EVERY table: SERIALIZABLE's commit-time read-pin re-check
    * must only cover tables the transaction really read (PG's SSI
    * tracks actual reads; failing on concurrent writes to NEVER-read
    * tables would be a gratuitous false positive).
    */
  @volatile var touched: Boolean = false

  def dirty: Boolean = staged.isDefined

  /** Committed-state base for reads and for the FIRST staged write:
    * under REPEATABLE READ the snapshot pinned at the transaction's
    * snapshot moment (triggered by the first access to any table),
    * otherwise the live committed load (READ COMMITTED).
    */
  def baseMeta(load: => TableMetadata): TableMetadata = {
    touched = true
    if (repeatableRead)
      pinned.getOrElse {
        pinAll()
        pinned.getOrElse { val m = load; pinned = Some(m); m }
      }
    else load
  }
}
