package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Multi-statement transactions (reference: PG ACID over staged
  * Iceberg metadata ops — metadata_operations.c:159-418;
  * test_iceberg_in_tx.py pins the observable semantics: data files
  * push eagerly during the transaction, metadata publishes as ONE new
  * version at COMMIT, ROLLBACK TO SAVEPOINT restores mid-transaction
  * state).
  */
class TxSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tx").toString

  private def metaVersions(loc: String): Int =
    graft.lake.LakeFs.listNames(graft.lake.LakeFs.child(loc, "_meta"))
      .count(n => n.matches("v\\d+\\.json"))

  private def dataFiles(t: graft.lake.LakeTable): Seq[String] = {
    val d = java.nio.file.Paths.get(t.location, "data")
    if (!java.nio.file.Files.isDirectory(d)) return Nil
    val s = java.nio.file.Files.walk(d)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
    finally s.close()
  }

  test("in-tx visibility: reads see staged state, outsiders see nothing, " +
      "COMMIT publishes ONE metadata version") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_vis", loc, Seq((1L, "a")).toDF("id", "v"))
    val vBefore = metaVersions(loc)
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_vis VALUES (2, 'b')")
    e.sql("INSERT INTO tx_vis VALUES (3, 'c')")
    e.sql("UPDATE tx_vis SET v = 'z' WHERE id = 1")
    // the transaction sees its own writes
    assert(e.sql("SELECT count(*) FROM tx_vis").first().getLong(0) == 3)
    assert(e.sql("SELECT v FROM tx_vis WHERE id = 1").first()
      .getString(0) == "z")
    // an external reader over the same storage sees NOTHING staged
    val outside = new graft.lake.LakeTable(spark, loc)
    assert(outside.read().count() == 1)
    assert(metaVersions(loc) == vBefore, "metadata leaked before COMMIT")
    e.sql("COMMIT")
    // one metadata version for the whole transaction (reference: a
    // single metadata.json push per table)
    assert(metaVersions(loc) == vBefore + 1)
    assert(outside.read().count() == 3)
    assert(e.sql("SELECT v FROM tx_vis WHERE id = 1").first()
      .getString(0) == "z")
  }

  test("ROLLBACK restores pre-transaction state and reaps staged files") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_rb", loc, Seq(1L, 2L).toDF("id"))
    val t = e.table("tx_rb")
    val filesBefore = dataFiles(t).toSet
    val vBefore = metaVersions(loc)
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_rb VALUES (3)")
    e.sql("DELETE FROM tx_rb WHERE id = 1")
    assert(e.sql("SELECT count(*) FROM tx_rb").first().getLong(0) == 2)
    e.sql("ROLLBACK")
    assert(e.sql("SELECT id FROM tx_rb ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 2L))
    // ABORT is PG's ROLLBACK synonym
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_rb VALUES (9)")
    e.sql("ABORT")
    assert(e.sql("SELECT count(*) FROM tx_rb").first().getLong(0) == 2)
    assert(metaVersions(loc) == vBefore)
    // the eagerly-written parquet of the discarded statements is gone
    assert(dataFiles(t).toSet == filesBefore,
      s"staged files not reaped: ${dataFiles(t).toSet -- filesBefore}")
  }

  test("SAVEPOINT partial rollback (reference in-subtx shapes incl. " +
      "TRUNCATE) and RELEASE") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_sp", loc, Seq(1L, 2L).toDF("a"))
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_sp VALUES (3)")
    e.sql("SAVEPOINT sp1")
    // the reference's test_in_subtx_fail_with_truncate shape:
    // insert + update + truncate, all undone by ROLLBACK TO
    e.sql("INSERT INTO tx_sp SELECT id + 100 FROM range(3)")
    e.sql("UPDATE tx_sp SET a = 999 WHERE a = 102")
    e.sql("TRUNCATE TABLE tx_sp")
    assert(e.sql("SELECT count(*) FROM tx_sp").first().getLong(0) == 0)
    e.sql("ROLLBACK TO SAVEPOINT sp1")
    // state is exactly the pre-savepoint staged state
    assert(e.sql("SELECT a FROM tx_sp ORDER BY a").as[Long]
      .collect().toSeq == Seq(1L, 2L, 3L))
    // the savepoint survives a rollback-to (PG) — reusable
    e.sql("INSERT INTO tx_sp VALUES (4)")
    e.sql("ROLLBACK TO sp1")
    assert(e.sql("SELECT count(*) FROM tx_sp").first().getLong(0) == 3)
    e.sql("RELEASE SAVEPOINT sp1")
    val gone = intercept[IllegalArgumentException](e.sql("ROLLBACK TO sp1"))
    assert(gone.getMessage.contains("does not exist"))
    e.sql("COMMIT")
    assert(new graft.lake.LakeTable(spark, loc).read().count() == 3)
  }

  test("savepoint rollback reaps files staged after the mark, keeps " +
      "files staged before it") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_spf", loc, Seq(1L).toDF("a"))
    val t = e.table("tx_spf")
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_spf VALUES (2)")
    val atMark = dataFiles(t).toSet
    e.sql("SAVEPOINT m")
    e.sql("INSERT INTO tx_spf VALUES (3)")
    assert(dataFiles(t).size > atMark.size)
    e.sql("ROLLBACK TO SAVEPOINT m")
    assert(dataFiles(t).toSet == atMark)
    e.sql("COMMIT")
    assert(e.sql("SELECT a FROM tx_spf ORDER BY a").as[Long]
      .collect().toSeq == Seq(1L, 2L))
  }

  test("crash leaves nothing: an abandoned transaction never surfaces " +
      "to storage readers") {
    val loc = s"${tmp()}/t"
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("tx_crash", loc, Seq(1L).toDF("a"))
    val vBefore = metaVersions(loc)
    e1.sql("BEGIN")
    e1.sql("INSERT INTO tx_crash VALUES (2)")
    // the engine dies here (no COMMIT) — a fresh process attaching to
    // the same storage sees only committed state
    assert(metaVersions(loc) == vBefore)
    assert(new graft.lake.LakeTable(spark, loc).read().count() == 1)
  }

  test("a concurrent writer moving the table fails the COMMIT loudly " +
      "(serialization failure), staged rows reaped") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_conc", loc, Seq(1L).toDF("a"))
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_conc VALUES (2)")
    // another engine commits directly while our transaction is open
    new graft.lake.LakeTable(spark, loc).append(Seq(50L).toDF("a"))
    val err = intercept[java.util.ConcurrentModificationException](
      e.sql("COMMIT"))
    assert(err.getMessage.contains("could not serialize access"),
      err.getMessage)
    // the concurrent writer's commit survives; our staged row is gone
    assert(e.sql("SELECT a FROM tx_conc ORDER BY a").as[Long]
      .collect().toSeq == Seq(1L, 50L))
  }

  test("DDL in tx: ADD COLUMN stages with the DML (reference " +
      "test_in_tx_with_partition_by shape); CTAS rolls back") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_ddl", loc, Seq(1L).toDF("a"))
    e.sql("BEGIN")
    e.sql("ALTER TABLE tx_ddl ADD COLUMN b BIGINT")
    e.sql("INSERT INTO tx_ddl VALUES (2, 20)")
    assert(e.sql("SELECT b FROM tx_ddl WHERE a = 2").first().getLong(0)
      == 20L)
    // outsiders still see the OLD schema
    assert(new graft.lake.LakeTable(spark, loc).read().columns.toSeq
      == Seq("a"))
    // a table created inside the transaction vanishes on ROLLBACK
    val ctasLoc = s"${tmp()}/c"
    e.sql(s"CREATE TABLE tx_ctas LOCATION '$ctasLoc' AS SELECT 7 AS x")
    assert(e.sql("SELECT x FROM tx_ctas").first().getInt(0) == 7)
    e.sql("ROLLBACK")
    assert(new graft.lake.LakeTable(spark, loc).read().columns.toSeq
      == Seq("a"))
    assert(e.tableOption("tx_ctas").isEmpty)
    assert(!graft.lake.LakeFs.exists(
      graft.lake.LakeFs.child(ctasLoc, "_meta")))
    // and the survivor is intact
    assert(e.sql("SELECT a FROM tx_ddl").as[Long].collect().toSeq
      == Seq(1L))
  }

  /** The reference's test_iceberg_xacts.py shape: CREATE + mixed DML
    * over TWO tables inside one transaction, committed together; a
    * second engine over the same storage sees both-or-neither.
    */
  test("multi-table transaction: create + insert two tables, " +
      "commit together, second engine sees both") {
    val e = LakeEngine(spark)
    val (l1, l2) = (s"${tmp()}/t1", s"${tmp()}/t2")
    e.sql("BEGIN")
    e.sql(s"CREATE TABLE txm_t1 LOCATION '$l1' AS " +
      "SELECT id, concat('Item ', id) AS name FROM range(100)")
    e.sql(s"CREATE TABLE txm_t2 LOCATION '$l2' AS " +
      "SELECT id, id * 2 AS qty FROM range(50)")
    e.sql("INSERT INTO txm_t1 SELECT id + 100, concat('X', id) FROM range(10)")
    e.sql("UPDATE txm_t2 SET qty = qty + 1 WHERE id < 5")
    e.sql("DELETE FROM txm_t1 WHERE id = 0")
    // in-tx view is consistent
    assert(e.sql("SELECT count(*) FROM txm_t1").first().getLong(0) == 109)
    e.sql("COMMIT")
    // a SECOND engine attaching to the same storage sees the whole
    // transaction's outcome
    val e2 = LakeEngine(spark)
    assert(e2.loadTable("txm2_t1", l1).read().count() == 109)
    val q = e2.loadTable("txm2_t2", l2).read()
      .filter(col("id") < 5).agg(sum("qty")).first().getLong(0)
    assert(q == (0 until 5).map(_ * 2 + 1).sum)
  }

  /** Randomized transaction fuzz: a scripted sequence of
    * BEGIN/DML/SAVEPOINT/ROLLBACK TO/ROLLBACK/COMMIT steps drawn from
    * a seeded RNG, mirrored against a driver-maintained expected
    * state (with its own savepoint stack). Any divergence in the
    * staged-visibility or restore logic lands as a state mismatch.
    */
  test("transaction fuzz: random begin/savepoint/rollback/commit " +
      "sequences track the model") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_fz", loc, (0L until 20L).toDF("id"))
    val rnd = new scala.util.Random(20260813L)
    var committed: Set[Long] = (0L until 20L).toSet
    var staged: Set[Long] = committed
    var inTx = false
    var marks = List.empty[(String, Set[Long])]
    var nextId = 100L
    def stateNow: Set[Long] =
      e.sql("SELECT id FROM tx_fz").as[Long].collect().toSet
    for (step <- 0 until 120) {
      rnd.nextInt(10) match {
        case 0 if !inTx => e.sql("BEGIN"); inTx = true; marks = Nil
        case 1 if inTx =>
          e.sql("COMMIT"); committed = staged; inTx = false
        case 2 if inTx =>
          e.sql("ROLLBACK"); staged = committed; inTx = false
        case 3 if inTx =>
          val n = s"sp${step % 7}"
          e.sql(s"SAVEPOINT $n"); marks = (n, staged) :: marks
        case 4 if inTx && marks.nonEmpty =>
          val (n, snap) = marks(rnd.nextInt(marks.size))
          e.sql(s"ROLLBACK TO SAVEPOINT $n")
          staged = snap
          marks = marks.dropWhile(_._1 != n) // later marks destroyed
        case k if k >= 5 && k % 2 == 1 =>
          val v = nextId; nextId += 1
          e.sql(s"INSERT INTO tx_fz VALUES ($v)")
          staged += v
          if (!inTx) committed = staged
        case _ =>
          if (staged.nonEmpty) {
            val v = staged.toSeq(rnd.nextInt(staged.size))
            e.sql(s"DELETE FROM tx_fz WHERE id = $v")
            staged -= v
            if (!inTx) committed = staged
          }
      }
      assert(stateNow == staged, s"step $step: engine state diverged")
      // committed state stays what the model says it is
      assert(new graft.lake.LakeTable(spark, loc).read()
        .as[Long].collect().toSet == committed,
        s"step $step: COMMITTED state diverged (tx leak)")
    }
    if (inTx) e.sql("ROLLBACK")
    assert(stateNow == committed)
    e.dropTable("tx_fz")
  }

  /** The drop-aware twin of the transaction fuzz: DROP TABLE joins the
    * random step pool, the model tracks a staged-drop flag through
    * savepoints, COMMIT of a dropped table must leave the tree for
    * VACUUM, and ROLLBACK (full or to a pre-drop mark) must restore
    * the table exactly.
    */
  test("transaction fuzz with staged DROP tracks the model " +
      "(drop/savepoint/rollback interleavings)") {
    val e = LakeEngine(spark)
    var loc = s"${tmp()}/t"
    val seed: Set[Long] = (0L until 10L).toSet
    e.createTableAsSelect("tx_fzd", loc, seed.toSeq.toDF("id"))
    val rnd = new scala.util.Random(20260816L)
    var committed = seed
    var staged = committed
    var inTx = false
    var dropped = false // a DROP TABLE is staged in the open tx
    var marks = List.empty[(String, Set[Long], Boolean)]
    var nextId = 100L
    def liveState: Set[Long] =
      e.sql("SELECT id FROM tx_fzd").as[Long].collect().toSet
    for (step <- 0 until 120) {
      rnd.nextInt(12) match {
        case 0 if !inTx => e.sql("BEGIN"); inTx = true; marks = Nil
        case 1 if inTx =>
          e.sql("COMMIT"); inTx = false
          if (dropped) {
            // committed drop: unresolvable, tree queued until VACUUM
            intercept[Exception](e.sql("SELECT count(*) FROM tx_fzd"))
            assert(graft.lake.LakeFs.exists(loc),
              s"step $step: committed-drop tree reaped before VACUUM")
            e.sql("VACUUM")
            assert(!graft.lake.LakeFs.exists(loc),
              s"step $step: VACUUM left the committed-drop tree")
            // recreate so the fuzz keeps running
            loc = s"${tmp()}/t"
            committed = seed
            e.createTableAsSelect("tx_fzd", loc, seed.toSeq.toDF("id"))
            staged = committed; dropped = false
          } else committed = staged
        case 2 if inTx =>
          e.sql("ROLLBACK"); staged = committed; dropped = false
          inTx = false
        case 3 if inTx =>
          val n = s"sp${step % 7}"
          e.sql(s"SAVEPOINT $n"); marks = (n, staged, dropped) :: marks
        case 4 if inTx && marks.nonEmpty =>
          val (n, snap, wasDropped) = marks(rnd.nextInt(marks.size))
          e.sql(s"ROLLBACK TO SAVEPOINT $n")
          staged = snap; dropped = wasDropped
          marks = marks.dropWhile(_._1 != n)
        case 5 if inTx && !dropped =>
          e.sql("DROP TABLE tx_fzd"); dropped = true
        case k if k >= 6 && k % 2 == 0 =>
          if (!dropped) {
            val v = nextId; nextId += 1
            e.sql(s"INSERT INTO tx_fzd VALUES ($v)")
            staged += v
            if (!inTx) committed = staged
          }
        case _ =>
          if (!dropped && staged.nonEmpty) {
            val v = staged.toSeq(rnd.nextInt(staged.size))
            e.sql(s"DELETE FROM tx_fzd WHERE id = $v")
            staged -= v
            if (!inTx) committed = staged
          }
      }
      if (dropped) {
        // in-tx reads stop resolving the dropped table
        assert(e.tableOption("tx_fzd").isEmpty, s"step $step: dropped " +
          "table still registered")
        intercept[Exception](e.sql("SELECT count(*) FROM tx_fzd"))
      } else {
        assert(liveState == staged, s"step $step: engine state diverged")
      }
      // external readers always see the committed state — a staged
      // drop (like any staged write) is invisible until COMMIT
      assert(new graft.lake.LakeTable(spark, loc).read()
        .as[Long].collect().toSet == committed,
        s"step $step: COMMITTED state diverged (tx leak)")
    }
    if (inTx) e.sql("ROLLBACK")
    assert(liveState == committed)
    e.dropTable("tx_fzd")
  }

  /** The reference's lake_engine.in_progress_files surface
    * (test_iceberg_in_progress_files.py): files the active transaction
    * staged list with ONE operation_id; they vanish at
    * COMMIT/ROLLBACK; a CRASHED transaction's files are reaped by
    * VACUUM's unreferenced-file sweep.
    */
  test("in_progress_files lists staged files; VACUUM reaps a crashed " +
      "transaction's leftovers") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_ipf", loc, Seq(1L).toDF("id"))
    assert(e.sql("SELECT * FROM lake_engine.in_progress_files")
      .count() == 0)
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_ipf VALUES (2)")
    e.sql("INSERT INTO tx_ipf VALUES (3)")
    e.sql("DELETE FROM tx_ipf WHERE id = 1")
    val rows = e.sql(
      "SELECT path, operation_id, table_name " +
        "FROM lake_engine.in_progress_files").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(2) == "tx_ipf"))
    // the reference's test queries filter the view (WHERE path ilike)
    assert(e.sql("SELECT path FROM lake_engine.in_progress_files " +
      "WHERE path LIKE '%.parquet'").count() == rows.length)
    assert(e.sql("SELECT path FROM lake_engine.in_progress_files " +
      "WHERE path LIKE '%nope%'").count() == 0)
    assert(rows.map(_.getString(1)).distinct.length == 1,
      "one operation_id labels the whole transaction")
    rows.foreach(r => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(
        r.getString(0))), s"staged file missing: ${r.getString(0)}"))
    e.sql("COMMIT")
    assert(e.sql("SELECT * FROM lake_engine.in_progress_files")
      .count() == 0)

    // crash shape: stage writes, abandon the engine (no COMMIT) — the
    // files are unreferenced on storage; VACUUM's sweep reclaims them
    val filesBefore = dataFiles(e.table("tx_ipf")).toSet
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_ipf VALUES (99)")
    val orphans = e.sql("SELECT path FROM lake_engine.in_progress_files")
      .collect().map(_.getString(0)).toSet
    assert(orphans.nonEmpty)
    // "crash": a fresh LakeTable over the same storage, old engine
    // forgotten mid-transaction
    val t2 = new graft.lake.LakeTable(spark, loc)
    assert(orphans.forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    t2.vacuum(graceMs = 0)
    assert(orphans.forall(p =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "VACUUM must reap a crashed transaction's staged files")
    assert(t2.read().as[Long].collect().toSet == Set(2L, 3L))
  }

  test("COPY FROM and DML RETURNING stage inside a transaction") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("tx_copy", loc, Seq((1L, "a")).toDF("id", "v"))
    val csv = java.nio.file.Files.createTempFile("txcopy", ".csv")
    java.nio.file.Files.write(csv, "id,v\n2,b\n3,c\n".getBytes)
    e.sql("BEGIN")
    assert(e.sql(s"COPY tx_copy FROM '$csv' WITH (format 'csv')")
      .first().getLong(0) == 2)
    // RETURNING inside the tx projects the staged rows
    val ret = e.sql(
      "UPDATE tx_copy SET v = upper(v) WHERE id >= 2 RETURNING id, v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(ret.toSeq == Seq((2L, "B"), (3L, "C")))
    assert(new graft.lake.LakeTable(spark, loc).read().count() == 1)
    e.sql("COMMIT")
    assert(new graft.lake.LakeTable(spark, loc).read().count() == 3)
  }

  /** Hidden partitioning × transactions: partitioned writes stage,
    * pruning works on the staged view in-tx and on the committed
    * state after; a rolled-back partition write leaves nothing.
    */
  test("partitioned table DML stages in-tx; pruning holds through COMMIT") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    val t = graft.lake.LakeTable.createAsSelect(spark, loc, "tx_part",
      spark.range(100).select(col("id"),
        (col("id") % 4).cast("int").as("bucket_val")),
      partitionSpec = Seq("identity(bucket_val)"))
    e.register("tx_part", t)
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_part SELECT id + 100, CAST(id % 4 AS INT) " +
      "FROM range(40)")
    e.sql("DELETE FROM tx_part WHERE bucket_val = 3")
    // staged state: 100+40 minus the bucket-3 rows (25 + 10)
    assert(e.sql("SELECT count(*) FROM tx_part").first().getLong(0) == 105)
    // partition pruning against the STAGED metadata
    val (kept, total) = t.pruneStats(col("bucket_val") === 1)
    assert(kept < total, s"no pruning on staged metadata ($kept/$total)")
    e.sql("COMMIT")
    assert(new graft.lake.LakeTable(spark, loc).read().count() == 105)
    val (k2, t2) = t.pruneStats(col("bucket_val") === 1)
    assert(k2 < t2)
    // a rolled-back partitioned write leaves no trace
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_part SELECT id + 500, CAST(id % 4 AS INT) " +
      "FROM range(20)")
    e.sql("ROLLBACK")
    assert(e.sql("SELECT count(*) FROM tx_part").first().getLong(0) == 105)
  }

  /** Merge-on-read × transactions: an in-tx DELETE on a threshold-100
    * table stages position-delete FILES (not a rewrite) alongside the
    * staged metadata; in-tx reads apply them, ROLLBACK reaps them,
    * COMMIT publishes them.
    */
  test("merge-on-read DELETE stages inside a transaction") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    val t = graft.lake.LakeTable.createAsSelect(spark, loc, "tx_mor",
      (0L until 50L).toDF("id"),
      properties = Map("copy_on_write_threshold" -> "100",
        "autovacuum_enabled" -> "false"))
    e.register("tx_mor", t)
    val dataBefore = dataFiles(t).toSet
    e.sql("BEGIN")
    e.sql("DELETE FROM tx_mor WHERE id < 5")
    // staged as position deletes: original data files untouched
    assert(t.meta.currentSnapshot.get.deleteFiles.nonEmpty,
      "threshold 100 in-tx must stage position deletes")
    assert(dataFiles(t).toSet.intersect(dataBefore) == dataBefore,
      "merge-on-read must not rewrite data files")
    assert(e.sql("SELECT count(*) FROM tx_mor").first().getLong(0) == 45)
    assert(new graft.lake.LakeTable(spark, loc).read().count() == 50)
    e.sql("ROLLBACK")
    // the staged delete files are reaped, data files intact
    assert(dataFiles(t).toSet == dataBefore)
    assert(e.sql("SELECT count(*) FROM tx_mor").first().getLong(0) == 50)
    e.sql("BEGIN")
    e.sql("DELETE FROM tx_mor WHERE id < 7")
    e.sql("COMMIT")
    val after = new graft.lake.LakeTable(spark, loc)
    assert(after.read().count() == 43)
    assert(after.meta.currentSnapshot.get.deleteFiles.nonEmpty)
  }

  /** REST appends inside a transaction STAGE (r15) and commit as one
    * CommitTransaction batch — the full surface is pinned in
    * WritableRestSpec; here the transaction-control edges: ROLLBACK
    * commits nothing and reaps, savepoint rollback drops the appends
    * staged after the mark, and autocommit still works.
    */
  test("REST-catalog append stages inside a transaction block") {
    val e = LakeEngine(spark)
    val srv = e.serveRestCatalog()
    try {
      import org.apache.spark.sql.types._
      e.createRestTable(srv.address, "default", "tx_rest",
        StructType(Seq(StructField("id", LongType))))
      e.sql("BEGIN")
      assert(e.insertIntoRestTable(srv.address, "default", "tx_rest",
        Seq(1L).toDF("id")) == 1)
      // the staged parquet shows in in_progress_files until COMMIT
      val prog = e.sql(
        "SELECT table_name FROM lake_engine.in_progress_files")
        .collect().map(_.getString(0)).toSeq
      assert(prog.contains("default.tx_rest"),
        s"staged REST append missing from in_progress_files: $prog")
      e.sql("SAVEPOINT s1")
      assert(e.insertIntoRestTable(srv.address, "default", "tx_rest",
        Seq(2L).toDF("id")) == 1)
      e.sql("ROLLBACK TO s1") // drops the post-mark append
      e.sql("COMMIT")
      assert(e.sql("SELECT * FROM lake_engine.in_progress_files")
        .count() == 0)
      assert(e.table("tx_rest").read().as[Long].collect().toSet ==
        Set(1L))
      e.sql("BEGIN")
      e.insertIntoRestTable(srv.address, "default", "tx_rest",
        Seq(9L).toDF("id"))
      e.sql("ROLLBACK")
      assert(e.table("tx_rest").read().count() == 1)
      // and autocommit still works outside a block
      assert(e.insertIntoRestTable(srv.address, "default", "tx_rest",
        Seq(3L).toDF("id")) == 1)
      assert(e.table("tx_rest").read().count() == 2)
    } finally srv.stop()
  }

  /** Two ENGINES, two transactions, one table: both stage against the
    * same base; the first COMMIT wins, the second serialization-fails
    * and its staged rows never surface (the reference's
    * multi-process test_iceberg_xacts posture, one JVM here).
    */
  test("racing transactions in two engines: first commit wins, " +
      "second fails serialization") {
    val loc = s"${tmp()}/t"
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("txr_a", loc, Seq(1L).toDF("id"))
    val e2 = LakeEngine(spark)
    e2.loadTable("txr_b", loc)
    e1.sql("BEGIN"); e2.sql("BEGIN")
    e1.sql("INSERT INTO txr_a VALUES (10)")
    e2.sql("INSERT INTO txr_b VALUES (20)")
    // each engine sees only its own staged write
    assert(e1.sql("SELECT id FROM txr_a").as[Long].collect().toSet ==
      Set(1L, 10L))
    assert(e2.sql("SELECT id FROM txr_b").as[Long].collect().toSet ==
      Set(1L, 20L))
    e1.sql("COMMIT")
    val err = intercept[java.util.ConcurrentModificationException](
      e2.sql("COMMIT"))
    assert(err.getMessage.contains("could not serialize access"))
    // the winner's rows, and only the winner's, are committed
    assert(new graft.lake.LakeTable(spark, loc).read()
      .as[Long].collect().toSet == Set(1L, 10L))
  }

  test("REFRESH MATERIALIZED VIEW stages in a transaction (PG allows it)") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("txmv_src", loc, Seq(1L, 2L).toDF("id"))
    e.sql("CREATE MATERIALIZED VIEW txmv AS " +
      "SELECT count(*) AS n FROM txmv_src")
    assert(e.sql("SELECT n FROM txmv").first().getLong(0) == 2)
    e.sql("INSERT INTO txmv_src VALUES (3)")
    e.sql("BEGIN")
    e.sql("REFRESH MATERIALIZED VIEW txmv")
    assert(e.sql("SELECT n FROM txmv").first().getLong(0) == 3)
    e.sql("ROLLBACK")
    // the refresh rolled back with the transaction
    assert(e.sql("SELECT n FROM txmv").first().getLong(0) == 2)
    e.sql("BEGIN")
    e.sql("REFRESH MATERIALIZED VIEW txmv")
    e.sql("COMMIT")
    assert(e.sql("SELECT n FROM txmv").first().getLong(0) == 3)
  }

  test("SET LOCAL reverts at transaction end; AND CHAIN opens the next") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("tx_setl", s"${tmp()}/t", Seq(1L).toDF("id"))
    e.sql("SET app.tag TO 'outside'")
    e.sql("BEGIN")
    e.sql("SET LOCAL app.tag TO 'inside'")
    assert(e.sql("SHOW app.tag").first().getString(0) == "inside")
    e.sql("COMMIT")
    // reverted at COMMIT (PG semantics)
    assert(e.sql("SHOW app.tag").first().getString(0) == "outside")
    e.sql("BEGIN")
    e.sql("SET LOCAL app.tag TO 'aborted'")
    e.sql("ROLLBACK")
    assert(e.sql("SHOW app.tag").first().getString(0) == "outside")
    // a never-set key SET LOCAL'd inside reverts to unset
    e.sql("BEGIN")
    e.sql("SET LOCAL app.fresh TO 'x'")
    assert(e.sql("SHOW app.fresh").first().getString(0) == "x")
    e.sql("ROLLBACK")
    // reverted to UNSET: SHOW refuses like PG's unrecognized-parameter
    val unset = intercept[IllegalArgumentException](e.sql("SHOW app.fresh"))
    assert(unset.getMessage.contains("unrecognized configuration"))

    // BEGIN READ ONLY: writes refuse with PG's message, reads work
    e.sql("BEGIN READ ONLY")
    assert(e.sql("SELECT count(*) FROM tx_setl").first().getLong(0) >= 1)
    val ro = intercept[IllegalStateException](
      e.sql("INSERT INTO tx_setl VALUES (7)"))
    assert(ro.getMessage.contains(
      "cannot execute INSERT in a read-only transaction"))
    e.sql("COMMIT")

    // COMMIT AND CHAIN: the next statement is already in a transaction
    e.sql("BEGIN")
    e.sql("INSERT INTO tx_setl VALUES (2)")
    e.sql("COMMIT AND CHAIN")
    e.sql("INSERT INTO tx_setl VALUES (3)")
    assert(e.inTransaction)
    e.sql("ROLLBACK")
    assert(e.sql("SELECT id FROM tx_setl ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 2L))
  }

  test("refusals: VACUUM / RENAME / re-create-after-drop inside a tx; " +
      "SAVEPOINT outside one") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("tx_ref", s"${tmp()}/t", Seq(1L).toDF("a"))
    val sp = intercept[IllegalStateException](e.sql("SAVEPOINT s1"))
    assert(sp.getMessage.contains("transaction block"))
    e.sql("BEGIN")
    val vac = intercept[IllegalArgumentException](e.sql("VACUUM tx_ref"))
    assert(vac.getMessage.contains(
      "VACUUM cannot run inside a transaction block"))
    // a transactional rename would need ROLLBACK to restore the old
    // name across every registry — refused loudly
    val ren = intercept[IllegalArgumentException](
      e.renameTable("tx_ref", "tx_ref2"))
    assert(ren.getMessage.contains("not supported"))
    // a name dropped in this transaction cannot be reused: COMMIT will
    // queue the old tree for deletion
    e.sql("DROP TABLE tx_ref")
    val rec = intercept[IllegalArgumentException](
      e.createTableAsSelect("tx_ref", s"${tmp()}/t2", Seq(9L).toDF("a")))
    assert(rec.getMessage.contains("dropped in the same transaction"))
    e.sql("ROLLBACK")
    // autocommit untouched after the transaction ends (and the staged
    // drop rolled back)
    e.sql("INSERT INTO tx_ref VALUES (2)")
    assert(e.sql("SELECT count(*) FROM tx_ref").first().getLong(0) == 2)
  }

  test("multi-table COMMIT is all-or-nothing: a writer landing between " +
      "the pre-flight and the second table's CAS leaves ZERO tables " +
      "changed (compensating un-commit)") {
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val e = LakeEngine(spark)
    e.createTableAsSelect("txaon_a", l1, Seq(1L).toDF("id"),
      partitionBy = Nil)
    e.createTableAsSelect("txaon_b", l2, Seq(1L).toDF("id"))
    e.sql("BEGIN")
    e.sql("INSERT INTO txaon_a VALUES (10)")
    e.sql("INSERT INTO txaon_b VALUES (10)")
    // a concurrent engine writes the SECOND-to-install table after the
    // pre-flight passed and the first table already installed — the
    // exact window that used to leave a partial commit
    var calls = 0
    e.txPreInstallHook = n => {
      calls += 1
      if (calls == 2)
        new graft.lake.LakeTable(spark, e.table(n).location)
          .append(Seq(99L).toDF("id"))
    }
    val err = intercept[java.util.ConcurrentModificationException](
      e.sql("COMMIT"))
    e.txPreInstallHook = _ => ()
    assert(err.getMessage.contains("could not serialize access"))
    // ALL-OR-NOTHING: the first-installed table must be BACK at its
    // pre-transaction state; the concurrent writer's row survives
    val s1 = new graft.lake.LakeTable(spark, l1).read()
      .as[Long].collect().toSet
    val s2 = new graft.lake.LakeTable(spark, l2).read()
      .as[Long].collect().toSet
    assert(!s1.contains(10L) && !s2.contains(10L),
      s"transaction rows leaked: $s1 / $s2")
    assert(Set(s1, s2) == Set(Set(1L), Set(1L, 99L)),
      s"unexpected states: $s1 / $s2")
    // the protocol cleaned its markers
    assert(graft.lake.TxMarker.list(l1).isEmpty &&
      graft.lake.TxMarker.list(l2).isEmpty)
    // no staged parquet survives the abort
    val e2 = LakeEngine(spark)
    assert(e2.loadTable("txaon_a2", l1).read().count() ==
      s1.size.toLong)
    // the engine stays usable after the failed COMMIT
    e.sql("INSERT INTO txaon_a VALUES (7)")
    assert(new graft.lake.LakeTable(spark, l1).read().count() ==
      s1.size + 1L)
  }

  test("crash between the first and second table's CAS: maintain() in " +
      "a fresh engine finishes the presumed-abort protocol") {
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val e = LakeEngine(spark)
    e.createTableAsSelect("txcr_a", l1, Seq(1L).toDF("id"))
    e.createTableAsSelect("txcr_b", l2, Seq(1L).toDF("id"))
    e.sql("BEGIN")
    e.sql("INSERT INTO txcr_a VALUES (10)")
    e.sql("INSERT INTO txcr_b VALUES (10)")
    // a FATAL throw (InterruptedException is not NonFatal) skips both
    // the compensation handler and the marker cleanup — the closest
    // in-process stand-in for a driver crash mid-protocol
    var calls = 0
    e.txPreInstallHook = _ => {
      calls += 1
      if (calls == 2) throw new InterruptedException("simulated crash")
    }
    intercept[InterruptedException](e.sql("COMMIT"))
    // both markers survived the crash
    assert(graft.lake.TxMarker.list(l1).nonEmpty &&
      graft.lake.TxMarker.list(l2).nonEmpty)
    // one table carries the installed-but-undecided commit
    val heads = Seq(l1, l2).map(l =>
      new graft.lake.LakeTable(spark, l).read().as[Long].collect().toSet)
    assert(heads.contains(Set(1L, 10L)) && heads.contains(Set(1L)))
    // the restarted process: a fresh engine attaches and maintains
    val e2 = LakeEngine(spark)
    e2.loadTable("txcr_a2", l1)
    e2.loadTable("txcr_b2", l2)
    spark.conf.set("graft.staging.grace_ms", "-1")
    try e2.maintain()
    finally spark.conf.unset("graft.staging.grace_ms")
    // presumed abort: BOTH tables back at their pre-transaction state
    assert(new graft.lake.LakeTable(spark, l1).read()
      .as[Long].collect().toSet == Set(1L))
    assert(new graft.lake.LakeTable(spark, l2).read()
      .as[Long].collect().toSet == Set(1L))
    assert(graft.lake.TxMarker.list(l1).isEmpty &&
      graft.lake.TxMarker.list(l2).isEmpty)
  }

  /** Randomized all-or-nothing: four dirty tables, a conflicting
    * writer injected at a RANDOM install index, repeated across seeds —
    * whatever prefix had installed must be compensated back, the
    * outcome is always zero-tables-changed plus the interloper's row.
    */
  test("multi-table all-or-nothing fuzz: conflict at a random install " +
      "index always compensates to zero tables changed") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(20260816L + seed)
      val names = (1 to 4).map(i => s"txmf${seed}_$i")
      val locs = names.map(_ => s"${tmp()}/t")
      val e = LakeEngine(spark)
      names.zip(locs).foreach { case (n, l) =>
        e.createTableAsSelect(n, l, Seq(1L).toDF("id"))
      }
      e.sql("BEGIN")
      names.foreach(n => e.sql(s"INSERT INTO $n VALUES (10)"))
      val conflictAt = 1 + rnd.nextInt(4) // 1-based install index
      var calls = 0
      e.txPreInstallHook = n => {
        calls += 1
        if (calls == conflictAt)
          new graft.lake.LakeTable(spark, e.table(n).location)
            .append(Seq(99L).toDF("id"))
      }
      val err = intercept[java.util.ConcurrentModificationException](
        e.sql("COMMIT"))
      e.txPreInstallHook = _ => ()
      assert(err.getMessage.contains("could not serialize access"))
      val states = locs.map(l => new graft.lake.LakeTable(spark, l)
        .read().as[Long].collect().toSet)
      assert(states.forall(!_.contains(10L)),
        s"seed $seed (conflict at $conflictAt): tx rows leaked: $states")
      assert(states.count(_ == Set(1L, 99L)) == 1 &&
        states.count(_ == Set(1L)) == 3,
        s"seed $seed (conflict at $conflictAt): $states")
      assert(locs.forall(graft.lake.TxMarker.list(_).isEmpty),
        s"seed $seed: markers left behind")
    }
  }

  /** Real concurrency (no injected hooks): four engines race two-table
    * transactions over the SAME two tables, retrying on serialization
    * failure. Every commit must be all-or-nothing — at the end both
    * tables carry exactly the same tag set, and every transaction's
    * tags are present (no lost updates, no half-applied transaction).
    */
  test("racing multi-table transactions across engines: all-or-nothing " +
      "outcomes, no lost updates") {
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val e0 = LakeEngine(spark)
    e0.createTableAsSelect("txrm0_a", l1, Seq(0L).toDF("id"),
      partitionBy = Nil)
    e0.createTableAsSelect("txrm0_b", l2, Seq(0L).toDF("id"))
    val threads = 4
    val txPerThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val latch = new java.util.concurrent.CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to threads).foreach { w =>
      pool.execute { () =>
        try {
          val e = LakeEngine(spark)
          e.loadTable(s"txrm${w}_a", l1)
          e.loadTable(s"txrm${w}_b", l2)
          latch.await()
          (1 to txPerThread).foreach { i =>
            val tag = w * 100L + i
            var attempts = 0
            var done = false
            while (!done) {
              try {
                e.sql("BEGIN")
                e.sql(s"INSERT INTO txrm${w}_a VALUES ($tag)")
                e.sql(s"INSERT INTO txrm${w}_b VALUES ($tag)")
                e.sql("COMMIT")
                done = true
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  attempts += 1
                  if (attempts > 25) throw new IllegalStateException(
                    s"tx $tag starved after $attempts serialization " +
                      "failures")
                  Thread.sleep(5L + scala.util.Random.nextInt(20))
              }
            }
          }
        } catch { case t: Throwable => errs.add(t) }
      }
    }
    latch.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300,
      java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, s"racing tx failed: ${errs.peek()}")
    val sa = new graft.lake.LakeTable(spark, l1).read()
      .as[Long].collect().toSet
    val sb = new graft.lake.LakeTable(spark, l2).read()
      .as[Long].collect().toSet
    val want = (for (w <- 1 to threads; i <- 1 to txPerThread)
      yield w * 100L + i).toSet + 0L
    assert(sa == want, s"table A lost/heaped updates: ${sa.diff(want)} " +
      s"missing ${want.diff(sa)}")
    assert(sb == want, s"table B lost/heaped updates: ${sb.diff(want)} " +
      s"missing ${want.diff(sb)}")
    assert(graft.lake.TxMarker.list(l1).isEmpty &&
      graft.lake.TxMarker.list(l2).isEmpty, "markers left behind")
  }

  /** Width scaling: one transaction dirtying 20 tables commits 20
    * CASes behind 20 O(1)-sized markers — all land, nothing lingers,
    * and in_progress_files carries every staged file (incl. a staged
    * drop's) mid-transaction.
    */
  test("wide transaction: 20 tables commit together; markers are " +
      "O(1)-sized and all cleaned up") {
    val e = LakeEngine(spark)
    val locs = (1 to 20).map(i => s"${tmp()}/t$i")
    locs.zipWithIndex.foreach { case (l, i) =>
      e.createTableAsSelect(s"txw_$i", l, Seq(i.toLong).toDF("id"))
    }
    e.sql("BEGIN")
    locs.indices.foreach(i => e.sql(s"INSERT INTO txw_$i VALUES (100)"))
    e.sql("DROP TABLE txw_19")
    // every staged file is visible in the in-progress view, labeled by
    // ONE operation id — including the dropped table's staged file
    val prog = e.sql(
      "SELECT path, operation_id, table_name FROM " +
        "lake_engine.in_progress_files").collect()
    assert(prog.length == 20, s"in_progress_files rows: ${prog.length}")
    assert(prog.map(_.getString(1)).distinct.length == 1)
    assert(prog.map(_.getString(2)).contains("txw_19"))
    e.sql("COMMIT")
    locs.indices.dropRight(1).foreach { i =>
      assert(new graft.lake.LakeTable(spark, locs(i)).read()
        .as[Long].collect().toSet == Set(i.toLong, 100L),
        s"table $i missing the transaction's row")
      assert(graft.lake.TxMarker.list(locs(i)).isEmpty,
        s"table $i kept its marker")
    }
    // the dropped table's tree waits for VACUUM, then goes
    assert(graft.lake.LakeFs.exists(locs(19)))
    e.sql("VACUUM")
    assert(!graft.lake.LakeFs.exists(locs(19)))
    // markers stayed O(1): tiny fixed-size records, not metadata dumps
    val m = graft.lake.TxMarker(
      "t", "n", locs(0), "c", 1, "h" * 64, "h" * 64,
      Seq(s"${locs(0)}/data/x.parquet"))
    graft.lake.TxMarker.write(m)
    val bytes = graft.lake.LakeFs.readAllBytes(
      graft.lake.TxMarker.markerPath(locs(0), "t")).length
    assert(bytes < 1024, s"marker is $bytes bytes — not O(1)")
    graft.lake.LakeFs.deleteIfExists(
      graft.lake.TxMarker.markerPath(locs(0), "t"))
  }

  test("multi-table commit + crash recovery over a mockfs:// scheme " +
      "(markers and decisions route through LakeFs, not java.nio)") {
    val spark2 = spark
    spark2.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockClusterFs].getName)
    def freshLoc() = "mockfs:" +
      java.nio.file.Files.createTempDirectory("txmock").toString + "/t"
    val (l1, l2) = (freshLoc(), freshLoc())
    val e = LakeEngine(spark2)
    e.createTableAsSelect("txmk_a", l1, Seq(1L).toDF("id"))
    e.createTableAsSelect("txmk_b", l2, Seq(1L).toDF("id"))
    // happy path: both commit atomically behind the marker protocol
    e.sql("BEGIN")
    e.sql("INSERT INTO txmk_a VALUES (2)")
    e.sql("INSERT INTO txmk_b VALUES (2)")
    e.sql("COMMIT")
    assert(new graft.lake.LakeTable(spark2, l1).read().count() == 2)
    assert(new graft.lake.LakeTable(spark2, l2).read().count() == 2)
    assert(graft.lake.TxMarker.list(l1).isEmpty)
    // crash path: markers survive on the remote scheme and a fresh
    // engine's maintain() recovers both tables
    e.sql("BEGIN")
    e.sql("INSERT INTO txmk_a VALUES (3)")
    e.sql("INSERT INTO txmk_b VALUES (3)")
    var calls = 0
    e.txPreInstallHook = _ => {
      calls += 1
      if (calls == 2) throw new InterruptedException("simulated crash")
    }
    intercept[InterruptedException](e.sql("COMMIT"))
    val e2 = LakeEngine(spark2)
    e2.loadTable("txmk_a2", l1)
    e2.loadTable("txmk_b2", l2)
    spark2.conf.set("graft.staging.grace_ms", "-1")
    try e2.maintain()
    finally spark2.conf.unset("graft.staging.grace_ms")
    assert(new graft.lake.LakeTable(spark2, l1).read()
      .as[Long].collect().toSet == Set(1L, 2L))
    assert(new graft.lake.LakeTable(spark2, l2).read()
      .as[Long].collect().toSet == Set(1L, 2L))
    assert(graft.lake.TxMarker.list(l1).isEmpty &&
      graft.lake.TxMarker.list(l2).isEmpty)
  }

  /** The grace guard: a FRESH marker (a commit possibly in flight)
    * must survive a concurrent maintain() untouched — recovery only
    * acts past the staging grace.
    */
  test("maintain() leaves young tx markers alone (grace guards a " +
      "commit in flight)") {
    import graft.lake.{LakeFs, LakeTable, TableMetadata, TxMarker}
    val loc = s"${tmp()}/t"
    val e = LakeEngine(spark)
    e.createTableAsSelect("txg_t", loc, Seq(1L).toDF("id"))
    val head = TableMetadata.load(loc)
    // a marker as a mid-install commit would leave it: staged == head
    TxMarker.write(TxMarker("young-tx", "txg_t", loc,
      TableMetadata.metaDir(loc), 1, "base-hash-x",
      TxMarker.stateHash(head), Nil))
    e.maintain() // default grace (10 min) — must not touch it
    assert(TxMarker.list(loc).nonEmpty,
      "maintain() swept a young marker — it could abort a live commit")
    assert(TxMarker.stateHash(TableMetadata.load(loc)) ==
      TxMarker.stateHash(head), "maintain() moved the table state")
    LakeFs.deleteIfExists(TxMarker.markerPath(loc, "young-tx"))
  }

  test("in_progress_files drains to empty at COMMIT and ROLLBACK, " +
      "drop-containing transactions included") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("txip_t", s"${tmp()}/t", Seq(1L).toDF("id"))
    def progRows: Long = e.sql(
      "SELECT path FROM lake_engine.in_progress_files").count()
    e.sql("BEGIN")
    e.sql("INSERT INTO txip_t VALUES (2)")
    assert(progRows == 1)
    e.sql("DROP TABLE txip_t")
    assert(progRows == 1) // the dropped table's staged file still shows
    e.sql("ROLLBACK")
    assert(progRows == 0)
    e.sql("BEGIN")
    e.sql("INSERT INTO txip_t VALUES (3)")
    e.sql("DROP TABLE txip_t")
    e.sql("COMMIT")
    assert(progRows == 0)
    e.sql("VACUUM") // reap the committed-drop tree
  }

  /** The committed-crash branch of the marker protocol: a crash AFTER
    * the decision record but BEFORE marker cleanup must be finished by
    * maintain() as a COMMIT — markers cleared, state kept; the orphan
    * decision record itself is swept at 10x the marker grace.
    */
  test("crash after the decision record: maintain() keeps the " +
      "committed state, clears markers, then sweeps the orphan " +
      "decision") {
    import graft.lake.{LakeFs, LakeTable, TableMetadata, TxMarker}
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val e = LakeEngine(spark)
    e.createTableAsSelect("txdc_a", l1, Seq(1L, 2L).toDF("id"))
    e.createTableAsSelect("txdc_b", l2, Seq(1L).toDF("id"))
    // hand-build the crash scene: the tx installed BOTH tables and
    // wrote its decision, then died before deleting the markers
    val txId = "deadbeef-0000-4000-8000-000000000001"
    val coord = TableMetadata.metaDir(l1)
    Seq(("txdc_a", l1), ("txdc_b", l2)).foreach { case (n, l) =>
      val head = TableMetadata.load(l)
      TxMarker.write(TxMarker(txId, n, l, coord,
        TableMetadata.currentVersion(l).get - 1 max 1,
        "not-the-head-hash", TxMarker.stateHash(head), Nil))
    }
    LakeFs.writeAtomic(TxMarker.decisionPath(coord, txId),
      s"$l1\n$l2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val before1 = new LakeTable(spark, l1).read().as[Long].collect().toSet
    spark.conf.set("graft.staging.grace_ms", "-1")
    try e.maintain()
    finally spark.conf.unset("graft.staging.grace_ms")
    // decision present => committed: markers gone, state untouched
    assert(TxMarker.list(l1).isEmpty && TxMarker.list(l2).isEmpty)
    assert(new LakeTable(spark, l1).read().as[Long].collect().toSet ==
      before1)
    // the orphan decision is swept at 10x grace (grace -1 => any age)
    assert(!LakeFs.exists(TxMarker.decisionPath(coord, txId)),
      "orphan decision record not swept")
  }

  test("transactional DROP TABLE: ROLLBACK restores the table " +
      "untouched; COMMIT unregisters and the tree stays until VACUUM") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("txd_t", loc, Seq(1L, 2L).toDF("id"))
    val filesBefore = dataFiles(e.table("txd_t")).size
    // ---- rollback leg
    e.sql("BEGIN")
    e.sql("INSERT INTO txd_t VALUES (3)")
    e.sql("DROP TABLE txd_t")
    // in-tx reads stop resolving the dropped table
    intercept[Exception](e.sql("SELECT count(*) FROM txd_t"))
    e.sql("ROLLBACK")
    assert(e.sql("SELECT id FROM txd_t ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 2L))
    // the staged insert's parquet was reaped with the rollback
    assert(dataFiles(e.table("txd_t")).size == filesBefore)
    // ---- commit leg (reference test_iceberg_in_tx.py:560-586: the
    // dropped table's metadata AND data stay until VACUUM)
    e.sql("BEGIN")
    e.sql("INSERT INTO txd_t VALUES (4)")
    e.sql("DROP TABLE txd_t")
    e.sql("COMMIT")
    intercept[Exception](e.sql("SELECT count(*) FROM txd_t"))
    assert(graft.lake.LakeFs.exists(loc),
      "COMMIT must leave the dropped tree for VACUUM")
    e.sql("VACUUM")
    assert(!graft.lake.LakeFs.exists(loc),
      "VACUUM must reap the committed-drop tree")
  }

  test("DROP inside a savepoint rolls back with ROLLBACK TO, restoring " +
      "the pre-savepoint staged state (reference " +
      "test_in_subtx_fail_with_drop)") {
    val e = LakeEngine(spark)
    val loc = s"${tmp()}/t"
    e.createTableAsSelect("txds_t", loc, Seq(1L).toDF("id"))
    e.sql("BEGIN")
    e.sql("INSERT INTO txds_t VALUES (2)")
    e.sql("SAVEPOINT sp1")
    e.sql("INSERT INTO txds_t VALUES (3)")
    e.sql("DROP TABLE txds_t")
    e.sql("ROLLBACK TO SAVEPOINT sp1")
    // the table is back, carrying the pre-savepoint staged INSERT (2)
    // but not the rolled-back one (3)
    assert(e.sql("SELECT id FROM txds_t ORDER BY id").as[Long]
      .collect().toSeq == Seq(1L, 2L))
    e.sql("COMMIT")
    assert(new graft.lake.LakeTable(spark, loc).read()
      .as[Long].collect().toSet == Set(1L, 2L))
    // a drop staged BEFORE the savepoint stays dropped through
    // ROLLBACK TO a LATER mark
    e.sql("BEGIN")
    e.sql("DROP TABLE txds_t")
    e.sql("SAVEPOINT sp2")
    e.sql("ROLLBACK TO SAVEPOINT sp2")
    intercept[Exception](e.sql("SELECT count(*) FROM txds_t"))
    e.sql("ROLLBACK")
    assert(e.sql("SELECT count(*) FROM txds_t").first().getLong(0) == 2)
  }

  test("REPEATABLE READ pins reads at first access; SERIALIZABLE " +
      "write on a moved pin serialization-fails; SET TRANSACTION " +
      "guards after first query") {
    val loc = s"${tmp()}/t"
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("txi_a", loc, Seq(1L).toDF("id"))
    val e2 = LakeEngine(spark)
    e2.loadTable("txi_b", loc)
    e1.sql("BEGIN ISOLATION LEVEL REPEATABLE READ")
    assert(e1.table("txi_a").read().count() == 1) // pin at first access
    e2.sql("INSERT INTO txi_b VALUES (2)") // concurrent committed write
    assert(e1.table("txi_a").read().count() == 1,
      "REPEATABLE READ must not see a concurrent commit")
    e1.sql("COMMIT")
    assert(e1.table("txi_a").read().count() == 2, "pin must release")
    // READ COMMITTED (the default) sees concurrent commits mid-tx
    e1.sql("BEGIN")
    assert(e1.table("txi_a").read().count() == 2)
    e2.sql("INSERT INTO txi_b VALUES (3)")
    assert(e1.table("txi_a").read().count() == 3,
      "READ COMMITTED reads the live committed state")
    e1.sql("ROLLBACK")
    // SERIALIZABLE: the first write bases on the pin, so a writer
    // landing after the pin fails the COMMIT CAS
    e1.sql("BEGIN ISOLATION LEVEL SERIALIZABLE")
    assert(e1.table("txi_a").read().count() == 3) // pin
    e2.sql("INSERT INTO txi_b VALUES (4)")
    e1.sql("INSERT INTO txi_a VALUES (99)")
    val err = intercept[java.util.ConcurrentModificationException](
      e1.sql("COMMIT"))
    assert(err.getMessage.contains("could not serialize access"))
    assert(new graft.lake.LakeTable(spark, loc).read()
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
    // SET TRANSACTION ISOLATION LEVEL: applies before any query...
    e1.sql("BEGIN")
    e1.sql("SET TRANSACTION ISOLATION LEVEL REPEATABLE READ")
    assert(e1.table("txi_a").read().count() == 4)
    e2.sql("INSERT INTO txi_b VALUES (5)")
    assert(e1.table("txi_a").read().count() == 4)
    // ...and refuses after one
    val late = intercept[IllegalArgumentException](e1.sql(
      "SET TRANSACTION ISOLATION LEVEL SERIALIZABLE"))
    assert(late.getMessage.contains("before any query"))
    e1.sql("ROLLBACK")
    // SET TRANSACTION READ ONLY tightens mid-block; writes then refuse
    e1.sql("BEGIN")
    e1.sql("SET TRANSACTION READ ONLY")
    val ro = intercept[IllegalStateException](
      e1.sql("INSERT INTO txi_a VALUES (7)"))
    assert(ro.getMessage.contains("read-only transaction"))
    e1.sql("ROLLBACK")
  }

  /** Deterministic isolation fuzz: a transaction runner interleaves
    * reads/writes on TWO tables with EXTERNAL commits from a second
    * engine, under a random isolation level per transaction. The model
    * tracks pin moments — REPEATABLE READ / SERIALIZABLE pin EVERY
    * table at the transaction's first access to ANY table (the one
    * snapshot moment), READ COMMITTED bases at first WRITE — and
    * predicts both every read and the COMMIT outcome: serialization
    * failure iff an external commit landed on a WRITTEN table after
    * its base moment, OR (SERIALIZABLE only) on a table the
    * transaction READ but did not write (approximate SSI — write
    * skew); a failed multi-table COMMIT changes NOTHING
    * (all-or-nothing).
    */
  test("isolation fuzz: RC/RR/SERIALIZABLE pin, commit-CAS and " +
      "write-skew outcomes track a model under external commits") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(20260814L + seed)
      val locs = Seq(s"${tmp()}/a", s"${tmp()}/b")
      val e1 = LakeEngine(spark)
      val e2 = LakeEngine(spark)
      val n1 = locs.indices.map(i => s"txif${seed}_${i}_r")
      val n2 = locs.indices.map(i => s"txif${seed}_${i}_x")
      locs.indices.foreach { i =>
        e1.createTableAsSelect(n1(i), locs(i), Seq(i * 1000L).toDF("id"))
        e2.loadTable(n2(i), locs(i))
      }
      // model state per table
      val committed = Array(Set(0L), Set(1000L))
      var inTx = false
      var rr = false // pinned levels: REPEATABLE READ or SERIALIZABLE
      var ser = false
      // base the tx's view/CAS uses, Some = pinned/base taken
      val base = Array[Option[Set[Long]]](None, None)
      val written = Array(false, false)
      // the tx actually read/wrote this table (engine: TxOverlay
      // .touched) — SERIALIZABLE's read-pin re-check only covers these
      val accessed = Array(false, false)
      val staged = Array(Set.empty[Long], Set.empty[Long])
      val conflicted = Array(false, false)
      var nextId = 1L
      def txView(i: Int): Set[Long] =
        if (!inTx) committed(i)
        else if (written(i)) staged(i)
        else if (rr) base(i).getOrElse(committed(i))
        else committed(i) // RC reads live
      // ONE snapshot moment (PG RR, r15): the first access to ANY
      // table pins EVERY table's committed state at that instant
      def readAccess(i: Int): Unit =
        if (inTx && rr && base.forall(_.isEmpty))
          locs.indices.foreach(j => base(j) = Some(committed(j)))
      for (step <- 0 until 80) {
        rnd.nextInt(10) match {
          case 0 if !inTx =>
            val lvl = rnd.nextInt(3)
            rr = lvl >= 1; ser = lvl == 2
            e1.sql(lvl match {
              case 0 => "BEGIN"
              case 1 => "BEGIN ISOLATION LEVEL REPEATABLE READ"
              case _ => "BEGIN ISOLATION LEVEL SERIALIZABLE"
            })
            inTx = true
            locs.indices.foreach { i =>
              base(i) = None; written(i) = false
              staged(i) = committed(i); conflicted(i) = false
              accessed(i) = false
            }
          case 1 | 2 if inTx => // read one table, model-checked below
            val i = rnd.nextInt(2)
            accessed(i) = true
            readAccess(i)
            val got = e1.table(n1(i)).read().as[Long].collect().toSet
            assert(got == txView(i),
              s"seed $seed step $step: in-tx read of table $i got " +
                s"$got want ${txView(i)} (rr=$rr)")
          case 3 | 4 | 5 if inTx => // stage a write
            val i = rnd.nextInt(2)
            accessed(i) = true
            readAccess(i) // RR: writing is an access too
            if (!written(i)) {
              // RC takes its CAS base at the FIRST write
              if (!rr) base(i) = Some(committed(i))
              staged(i) = txView(i)
              written(i) = true
            }
            val v = nextId; nextId += 1
            e1.sql(s"INSERT INTO ${n1(i)} VALUES ($v)")
            staged(i) += v
          case 6 => // EXTERNAL commit (any time)
            val i = rnd.nextInt(2)
            val v = 100000L + nextId; nextId += 1
            e2.sql(s"INSERT INTO ${n2(i)} VALUES ($v)")
            committed(i) += v
            if (inTx && base(i).isDefined) conflicted(i) = true
          case 7 if inTx => // COMMIT: model predicts the outcome
            val mustFail =
              locs.indices.exists(i => written(i) && conflicted(i)) ||
                (ser && locs.indices.exists(i =>
                  accessed(i) && !written(i) && conflicted(i)))
            if (mustFail) {
              intercept[java.util.ConcurrentModificationException](
                e1.sql("COMMIT"))
            } else {
              e1.sql("COMMIT")
              locs.indices.foreach(i =>
                if (written(i)) committed(i) = staged(i))
            }
            inTx = false
          case 8 if inTx =>
            e1.sql("ROLLBACK"); inTx = false
          case _ => ()
        }
        // external readers always see exactly the committed state
        locs.indices.foreach { i =>
          val got = new graft.lake.LakeTable(spark, locs(i)).read()
            .as[Long].collect().toSet
          assert(got == committed(i),
            s"seed $seed step $step: committed state of table $i " +
              s"diverged: $got want ${committed(i)}")
        }
      }
      if (inTx) e1.sql("ROLLBACK")
      locs.indices.foreach { i =>
        assert(e1.table(n1(i)).read().as[Long].collect().toSet ==
          committed(i), s"seed $seed: final state of table $i diverged")
      }
    }
  }

  /** PG serializes DDL vs DML via the table lock: a concurrent ALTER
    * landing mid-transaction can never be silently erased by the
    * transaction's COMMIT. Metadata-only operations advance only the
    * schema version (not the snapshot id), so the COMMIT's
    * serialization checks must compare FULL state, not snapshot ids.
    */
  test("concurrent metadata-only ALTER serialization-fails the COMMIT " +
      "(single- and multi-table) instead of being clobbered") {
    import graft.lake.TableMetadata
    // single-table path
    val l1 = s"${tmp()}/a"
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("txalt_a", l1, Seq((1L, "x")).toDF("id", "v"))
    val e2 = LakeEngine(spark)
    e2.loadTable("txalt_a2", l1)
    e1.sql("BEGIN")
    e1.sql("INSERT INTO txalt_a VALUES (2, 'y')")
    e2.sql("ALTER TABLE txalt_a2 ADD COLUMN note text")
    val err = intercept[java.util.ConcurrentModificationException](
      e1.sql("COMMIT"))
    assert(err.getMessage.contains("could not serialize access"))
    // B's column survives; A's insert did NOT land
    val m1 = TableMetadata.load(l1)
    assert(m1.schemas.maxBy(_.version).fields.exists(_.name == "note"),
      "the concurrent ALTER was clobbered")
    assert(new graft.lake.LakeTable(spark, l1).read().count() == 1)
    // multi-table path: ALTER on the SECOND table aborts the whole tx
    val (l2, l3) = (s"${tmp()}/b", s"${tmp()}/c")
    e1.createTableAsSelect("txalt_b", l2, Seq(1L).toDF("id"))
    e1.createTableAsSelect("txalt_c", l3, Seq(1L).toDF("id"))
    e2.loadTable("txalt_c2", l3)
    e1.sql("BEGIN")
    e1.sql("INSERT INTO txalt_b VALUES (2)")
    e1.sql("INSERT INTO txalt_c VALUES (2)")
    e2.sql("ALTER TABLE txalt_c2 ADD COLUMN tag text")
    val err2 = intercept[java.util.ConcurrentModificationException](
      e1.sql("COMMIT"))
    assert(err2.getMessage.contains("could not serialize access"))
    // all-or-nothing: NEITHER table changed, B's column survives
    assert(new graft.lake.LakeTable(spark, l2).read().count() == 1)
    assert(new graft.lake.LakeTable(spark, l3).read().count() == 1)
    assert(TableMetadata.load(l3).schemas.maxBy(_.version)
      .fields.exists(_.name == "tag"))
    assert(graft.lake.TxMarker.list(l2).isEmpty &&
      graft.lake.TxMarker.list(l3).isEmpty, "markers not cleaned")
  }

  /** PG REPEATABLE READ takes ONE snapshot at the first query covering
    * every table — never per-table pins at different instants. A
    * concurrent TWO-table commit landing between the transaction's
    * first reads of table A and table B must be invisible to BOTH
    * (no cross-table read skew: old A + new B).
    */
  test("REPEATABLE READ pins ONE snapshot moment across tables: no " +
      "cross-table read skew from a concurrent two-table commit") {
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val e1 = LakeEngine(spark)
    e1.createTableAsSelect("txrr_a", l1, Seq(1L).toDF("id"))
    e1.createTableAsSelect("txrr_b", l2, Seq(1L).toDF("id"))
    val e2 = LakeEngine(spark)
    e2.loadTable("txrr_a2", l1)
    e2.loadTable("txrr_b2", l2)
    e1.sql("BEGIN ISOLATION LEVEL REPEATABLE READ")
    // first access to ANY table takes the transaction-wide snapshot
    assert(e1.table("txrr_a").read().count() == 1)
    // a two-table commit lands BEFORE the tx ever touches table b
    e2.sql("BEGIN")
    e2.sql("INSERT INTO txrr_a2 VALUES (2)")
    e2.sql("INSERT INTO txrr_b2 VALUES (2)")
    e2.sql("COMMIT")
    // the RR tx must see the PRE-change state of BOTH tables
    assert(e1.table("txrr_a").read().count() == 1)
    assert(e1.table("txrr_b").read().count() == 1,
      "cross-table read skew: table b read past the snapshot moment")
    e1.sql("COMMIT")
    assert(e1.table("txrr_a").read().count() == 2)
    assert(e1.table("txrr_b").read().count() == 2)
  }

  /** Approximate SSI: SERIALIZABLE re-checks every READ-pinned table
    * at COMMIT, so write skew (two transactions each reading the
    * other's table and writing their own) cannot commit on both sides.
    * REPEATABLE READ permits it — PG's documented difference between
    * the two levels.
    */
  test("SERIALIZABLE detects write skew (at least one side fails); " +
      "REPEATABLE READ allows it") {
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val eA = LakeEngine(spark)
    eA.createTableAsSelect("txws_a1", l1, Seq(1L).toDF("id"))
    eA.createTableAsSelect("txws_b1", l2, Seq(1L).toDF("id"))
    val eB = LakeEngine(spark)
    eB.loadTable("txws_a2", l1)
    eB.loadTable("txws_b2", l2)
    eA.sql("BEGIN ISOLATION LEVEL SERIALIZABLE")
    eB.sql("BEGIN ISOLATION LEVEL SERIALIZABLE")
    // each reads the OTHER's table, then writes its own
    assert(eA.table("txws_b1").read().count() == 1)
    assert(eB.table("txws_a2").read().count() == 1)
    eA.sql("INSERT INTO txws_a1 VALUES (10)")
    eB.sql("INSERT INTO txws_b2 VALUES (20)")
    eA.sql("COMMIT") // first committer wins
    val err = intercept[java.util.ConcurrentModificationException](
      eB.sql("COMMIT"))
    assert(err.getMessage.contains("could not serialize access"))
    // B aborted whole: its write is absent, A's is present
    assert(new graft.lake.LakeTable(spark, l1).read()
      .as[Long].collect().toSet == Set(1L, 10L))
    assert(new graft.lake.LakeTable(spark, l2).read()
      .as[Long].collect().toSet == Set(1L))
    // the SAME interleaving under REPEATABLE READ commits on both
    // sides (write skew is legal at RR)
    eA.sql("BEGIN ISOLATION LEVEL REPEATABLE READ")
    eB.sql("BEGIN ISOLATION LEVEL REPEATABLE READ")
    assert(eA.table("txws_b1").read().count() == 1)
    assert(eB.table("txws_a2").read().count() == 2)
    eA.sql("INSERT INTO txws_a1 VALUES (11)")
    eB.sql("INSERT INTO txws_b2 VALUES (21)")
    eA.sql("COMMIT")
    eB.sql("COMMIT")
    assert(new graft.lake.LakeTable(spark, l2).read()
      .as[Long].collect().toSet == Set(1L, 21L))
    // no false positives: a concurrent write to a table the
    // SERIALIZABLE tx NEVER touched is no antidependency — the
    // snapshot moment pins every table, but only actually-read tables
    // count at COMMIT (PG's SSI tracks reads)
    eA.sql("BEGIN ISOLATION LEVEL SERIALIZABLE")
    eA.sql("INSERT INTO txws_a1 VALUES (12)")
    eB.sql("INSERT INTO txws_b2 VALUES (22)") // autocommit; A never read b
    eA.sql("COMMIT") // must succeed
    assert(new graft.lake.LakeTable(spark, l1).read()
      .as[Long].collect().toSet == Set(1L, 10L, 11L, 12L))
  }

  /** A commitTx() that returned success must never leave markers that
    * can roll the commit back: when the decision-record write fails
    * (twice), the fallback deletes the markers DIRECTLY — removing the
    * presumed-abort hazard is the completion.
    */
  test("decision-record write failure falls back to direct marker " +
      "removal: the COMMIT survives a later maintain()") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.decfailfs.impl", classOf[DecisionFailFs].getName)
    def freshLoc() = "decfailfs:" +
      java.nio.file.Files.createTempDirectory("txdf").toString + "/t"
    val (l1, l2) = (freshLoc(), freshLoc())
    val e = LakeEngine(spark)
    e.createTableAsSelect("txdf_a", l1, Seq(1L).toDF("id"))
    e.createTableAsSelect("txdf_b", l2, Seq(1L).toDF("id"))
    e.sql("BEGIN")
    e.sql("INSERT INTO txdf_a VALUES (2)")
    e.sql("INSERT INTO txdf_b VALUES (2)")
    DecisionFailFs.failDecisions = true
    try e.sql("COMMIT") // must SUCCEED despite the decision failure
    finally DecisionFailFs.failDecisions = false
    // both tables committed, markers removed by the fallback
    assert(new graft.lake.LakeTable(spark, l1).read().count() == 2)
    assert(new graft.lake.LakeTable(spark, l2).read().count() == 2)
    assert(graft.lake.TxMarker.list(l1).isEmpty &&
      graft.lake.TxMarker.list(l2).isEmpty,
      "markers survived a successful COMMIT with no decision record")
    // a later maintain() (fresh engine, zero grace) must not roll the
    // committed transaction back
    val e2 = LakeEngine(spark)
    e2.loadTable("txdf_a2", l1)
    e2.loadTable("txdf_b2", l2)
    spark.conf.set("graft.staging.grace_ms", "-1")
    try e2.maintain()
    finally spark.conf.unset("graft.staging.grace_ms")
    assert(new graft.lake.LakeTable(spark, l1).read().count() == 2)
    assert(new graft.lake.LakeTable(spark, l2).read().count() == 2)
  }

  test("refused re-create of an in-tx-dropped name leaves no orphaned " +
      "storage tree") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("txrc_t", s"${tmp()}/t", Seq(1L).toDF("id"))
    e.sql("BEGIN")
    e.sql("DROP TABLE txrc_t")
    val newLoc = s"${tmp()}/t2"
    val err = intercept[IllegalArgumentException](
      e.createTableAsSelect("txrc_t", newLoc, Seq(2L).toDF("id")))
    assert(err.getMessage.contains("dropped in the same transaction"))
    // refused BEFORE storage creation: no orphaned directory
    assert(!graft.lake.LakeFs.exists(newLoc),
      "refused CTAS leaked an orphaned storage tree")
    e.sql("ROLLBACK")
    assert(e.sql("SELECT count(*) FROM txrc_t").first().getLong(0) == 1)
  }

  test("SET TRANSACTION ISOLATION LEVEL refuses after a plain read " +
      "(PG: before any query)") {
    val e = LakeEngine(spark)
    e.createTableAsSelect("txsi_t", s"${tmp()}/t", Seq(1L).toDF("id"))
    e.sql("BEGIN")
    // a plain READ COMMITTED select stages and pins nothing — only the
    // queryRun flag can catch it
    assert(e.sql("SELECT count(*) FROM txsi_t").first().getLong(0) == 1)
    val err = intercept[IllegalArgumentException](e.sql(
      "SET TRANSACTION ISOLATION LEVEL REPEATABLE READ"))
    assert(err.getMessage.contains("before any query"))
    e.sql("ROLLBACK")
    // transaction control itself does NOT trip the guard
    e.sql("BEGIN")
    e.sql("SAVEPOINT s1")
    e.sql("SET TRANSACTION ISOLATION LEVEL SERIALIZABLE")
    e.sql("ROLLBACK")
  }

  /** Tip-bounded state hash: marker hashing is O(current metadata) —
    * it must stay STABLE across dehydrate/hydrate round trips (reload
    * from disk) and still CHANGE whenever the retained history, tip
    * content, schema, or properties change.
    */
  test("TxMarker.stateHash is reload-stable and history-sensitive") {
    import graft.lake.{TableMetadata, TxMarker}
    val loc = s"${tmp()}/t"
    val e = LakeEngine(spark)
    e.createTableAsSelect("txsh_t", loc, Seq(1L).toDF("id"))
    e.sql("INSERT INTO txsh_t VALUES (2)")
    e.sql("INSERT INTO txsh_t VALUES (3)")
    val h1 = TxMarker.stateHash(TableMetadata.load(loc))
    // reload round trip: same state, same hash (recovery runs in a
    // DIFFERENT process than the writer)
    assert(TxMarker.stateHash(TableMetadata.load(loc)) == h1)
    // a new snapshot changes the hash
    e.sql("INSERT INTO txsh_t VALUES (4)")
    val h2 = TxMarker.stateHash(TableMetadata.load(loc))
    assert(h2 != h1)
    // a retained-history change (snapshot expiry keeps the tip but
    // drops old snapshots) changes the hash even with the tip intact
    val tipBefore = TableMetadata.load(loc).currentSnapshotId
    e.table("txsh_t").expireSnapshots(keepLast = 1, graceMs = -1)
    val m3 = TableMetadata.load(loc)
    assert(m3.currentSnapshotId == tipBefore, "expiry moved the tip")
    assert(TxMarker.stateHash(m3) != h2,
      "history change not reflected in the state hash")
    // a metadata-only schema change (no snapshot movement) changes it
    val before = TxMarker.stateHash(TableMetadata.load(loc))
    e.sql("ALTER TABLE txsh_t ADD COLUMN note text")
    val m4 = TableMetadata.load(loc)
    assert(m4.currentSnapshotId == tipBefore)
    assert(TxMarker.stateHash(m4) != before,
      "schema-only change not reflected in the state hash")
  }

  /** Heartbeat correctness: a heartbeat re-write after the FIRST
    * table's install must repeat the ORIGINAL marker records — a
    * naive rewrite would recompute baseVersion from the (now
    * installed) head, and a crash after that heartbeat would make
    * recovery refuse the restore (base-hash mismatch against the
    * recorded pre-tx hash).
    */
  test("crash after a marker heartbeat: maintain() still restores " +
      "every table to its pre-tx base") {
    val (l1, l2) = (s"${tmp()}/a", s"${tmp()}/b")
    val e = LakeEngine(spark)
    e.createTableAsSelect("txhb_a", l1, Seq(1L).toDF("id"))
    e.createTableAsSelect("txhb_b", l2, Seq(1L).toDF("id"))
    e.sql("BEGIN")
    e.sql("INSERT INTO txhb_a VALUES (2)")
    e.sql("INSERT INTO txhb_b VALUES (2)")
    // negative heartbeat interval => markers re-write before EVERY
    // install; the crash lands after the post-install heartbeat
    spark.conf.set("graft.staging.grace_ms", "-4")
    var calls = 0
    e.txPreInstallHook = _ => {
      calls += 1
      if (calls == 2) throw new InterruptedException("simulated crash")
    }
    try intercept[InterruptedException](e.sql("COMMIT"))
    finally {
      e.txPreInstallHook = _ => ()
      spark.conf.unset("graft.staging.grace_ms")
    }
    val e2 = LakeEngine(spark)
    e2.loadTable("txhb_a2", l1)
    e2.loadTable("txhb_b2", l2)
    spark.conf.set("graft.staging.grace_ms", "-1")
    try e2.maintain()
    finally spark.conf.unset("graft.staging.grace_ms")
    assert(new graft.lake.LakeTable(spark, l1).read()
      .as[Long].collect().toSet == Set(1L),
      "heartbeat-corrupted marker: first table not restored")
    assert(new graft.lake.LakeTable(spark, l2).read()
      .as[Long].collect().toSet == Set(1L))
    assert(graft.lake.TxMarker.list(l1).isEmpty &&
      graft.lake.TxMarker.list(l2).isEmpty)
  }

  test("loadTable inside a transaction: ROLLBACK must not purge the " +
      "attached pre-existing table") {
    val loc = s"${tmp()}/t"
    val e0 = LakeEngine(spark)
    e0.createTableAsSelect("txl_src", loc, Seq(1L).toDF("id"))
    val e = LakeEngine(spark)
    e.sql("BEGIN")
    e.loadTable("txl_t", loc)
    e.sql("INSERT INTO txl_t VALUES (2)")
    assert(e.sql("SELECT count(*) FROM txl_t").first().getLong(0) == 2)
    e.sql("ROLLBACK")
    // the attached table's storage survives (only the staged insert
    // rolled back) and it stays registered
    assert(graft.lake.LakeFs.exists(loc),
      "ROLLBACK purged an attached pre-existing table")
    assert(new graft.lake.LakeTable(spark, loc).read()
      .as[Long].collect().toSet == Set(1L))
    assert(e.tableOption("txl_t").isDefined)
  }
}

/** Failure-injecting wrapper scheme: renames onto a `txdone-` decision
  * record fail while [[DecisionFailFs.failDecisions]] is set —
  * simulating a transient store error ONLY on the decision write (the
  * CASes already landed). Everything else behaves like local disk.
  */
class DecisionFailFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "decfailfs"
  override def getUri: java.net.URI = java.net.URI.create("decfailfs:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean =
    if (DecisionFailFs.failDecisions && dst.getName.startsWith("txdone-"))
      false
    else super.rename(src, dst)
}

object DecisionFailFs {
  @volatile var failDecisions = false
}
