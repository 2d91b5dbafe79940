package graft

import graft.lake.LakeTable
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Background/maintenance compaction for BATCH tables — the reference's
  * autovacuum posture (pg_lake_table/src/ddl/vacuum.c:108
  * `pg_lake_iceberg_vacuum` worker loop; `autovacuum_enabled` table
  * option :346, `autovacuum_compact_data_files` :356) re-expressed
  * without a resident worker: a commit-count trigger rides the write
  * path ([[LakeTable.maintainIfDue]]) and [[LakeEngine.maintain]] is
  * the engine-level sweep. The 100 TB design point: many small
  * streaming/batch commits must converge to a bounded file count
  * WITHOUT anyone calling VACUUM, or scans drown in file-open overhead.
  */
class MaintenanceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def freshLoc(): String =
    Files.createTempDirectory("maint").toString + "/t"

  private def dataFileCount(t: LakeTable): Int =
    t.meta.currentSnapshot.map(_.dataFiles.size).getOrElse(0)

  test("many small commits converge to bounded files without VACUUM") {
    import spark.implicits._
    val t = LakeTable.createAsSelect(spark, freshLoc(), "auto_conv",
      Seq((0L, "v0")).toDF("k", "v"))
    // 40 one-row appends: the ride-along trigger (default interval 16)
    // must fire at least twice; without it this table ends at 41 files
    (1 to 40).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(t.read().count() == 41)
    val files = dataFileCount(t)
    assert(files <= 16,
      s"41 single-row commits left $files data files — ride-along " +
        "compaction never fired")
    assert(t.meta.snapshots.exists(_.operation == "compact"))
  }

  test("autovacuum_enabled=false disables the ride-along; manual compacts") {
    import spark.implicits._
    val t = LakeTable.createAsSelect(spark, freshLoc(), "auto_off",
      Seq(0L).toDF("k"),
      properties = Map("autovacuum_enabled" -> "false"))
    (1 to 20).foreach(i => t.append(Seq(i.toLong).toDF("k")))
    assert(dataFileCount(t) == 21,
      "autovacuum_enabled=false must leave every appended file in place")
    assert(!t.meta.snapshots.exists(_.operation == "compact"))
    // manual VACUUM always compacts, mirroring the heap storage param
    t.vacuum()
    assert(dataFileCount(t) < 21)
  }

  test("autovacuum_compact_data_files=false skips only the rewrite") {
    import spark.implicits._
    val t = LakeTable.createAsSelect(spark, freshLoc(), "auto_nodf",
      Seq(0L).toDF("k"),
      properties = Map("autovacuum_compact_data_files" -> "false"))
    (1 to 20).foreach(i => t.append(Seq(i.toLong).toDF("k")))
    assert(dataFileCount(t) == 21)
    assert(!t.meta.snapshots.exists(_.operation == "compact"))
  }

  test("engine maintain() sweeps per policy: compact + expire; skip off") {
    import spark.implicits._
    val e = LakeEngine(spark)
    val a = e.createTableAsSelect("m_on", LakeEngine.tempLocation("m_on"),
      Seq(1L).toDF("k"))
    a.setProperties(Map("autovacuum_commit_interval" -> "0",
      "autovacuum_grace_ms" -> "0"))
    (2 to 9).foreach(i => a.append(Seq(i.toLong).toDF("k")))
    val b = e.createTableAsSelect("m_off", LakeEngine.tempLocation("m_off"),
      Seq(1L).toDF("k"))
    b.setProperties(Map("autovacuum_enabled" -> "false"))
    (2 to 9).foreach(i => b.append(Seq(i.toLong).toDF("k")))

    val swept = e.maintain()
    assert(swept.contains("m_on") && !swept.contains("m_off"))
    assert(dataFileCount(e.table("m_on")) < 8)
    // expiry honored the keep policy (default 3) with zero grace
    assert(e.table("m_on").meta.snapshots.size <= 3)
    assert(dataFileCount(e.table("m_off")) == 9)
    // the swept table still reads correctly through the engine
    assert(e.sql("SELECT count(*) AS n FROM m_on").head.getLong(0) == 9)
    // bare VACUUM reaches the same sweep
    val out = e.sql("VACUUM").head.getString(0)
    assert(out.contains("m_on") && !out.contains("m_off"))
    // the reference's option spellings are accepted — and manual
    // VACUUM always compacts, even on the autovacuum-disabled table
    assert(e.sql("VACUUM (ICEBERG) m_off").head.getInt(0) < 9)
    assert(e.sql("VACUUM FULL m_on").schema.fieldNames.head == "data_files")
    e.dropTable("m_on"); e.dropTable("m_off")
  }

  test("manifest merge folds per-commit manifests; readers unaffected") {
    import spark.implicits._
    import graft.lake.TableMetadata
    // low thresholds so the merge fires inside the test (reference
    // defaults are min-count 100 / 8 MB, manifest_merge.h:28-31)
    val t = LakeTable.createAsSelect(spark, freshLoc(), "mm_t",
      Seq((0L, "s")).toDF("k", "v"),
      properties = Map(
        "manifest_min_count_to_merge" -> "6",
        // big target: everything coalesces into ONE manifest
        "target_manifest_size_kb" -> "1024",
        // isolate from data compaction so the count is deterministic
        "autovacuum_enabled" -> "false"))
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    def refs(m: graft.lake.TableMetadata = t.meta) =
      m.currentSnapshot.get.manifests.size
    assert(refs() == 5, s"expected one manifest per commit, got ${refs()}")
    val preMergeSnap = t.meta.currentSnapshotId

    // 6th commit crosses min-count: merge-on-write folds to one
    t.append(Seq((5L, "v5")).toDF("k", "v"))
    assert(refs() == 1,
      s"merge-on-write did not fold the manifest refs: ${refs()}")
    // identity-preserving: same snapshot CONTENT, readers see all rows
    assert(t.read().count() == 6)
    assert(t.read().select("v").collect().map(_.getString(0)).sorted
      .toSeq == Seq("s", "v1", "v2", "v3", "v4", "v5"))
    // time travel to a pre-merge snapshot still resolves (old
    // snapshots keep their original manifests)
    assert(t.readAsOf(preMergeSnap).count() == 5)

    // a bounded target splits into multiple groups instead of one
    val t2 = LakeTable.createAsSelect(spark, freshLoc(), "mm_t2",
      Seq((0L, "s")).toDF("k", "v"),
      properties = Map("autovacuum_enabled" -> "false",
        "enable_manifest_merge_on_write" -> "false"))
    (1 to 9).foreach(i => t2.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(t2.meta.currentSnapshot.get.manifests.size == 10)
    val single = java.nio.file.Files.size(
      java.nio.file.Paths.get(TableMetadata.metaDir(t2.location))
        .resolve(t2.meta.currentSnapshot.get.manifests.head))
    // target of ~3 manifests per group
    assert(TableMetadata.mergeManifests(t2.location, 2, single * 3))
    val after = t2.meta.currentSnapshot.get.manifests.size
    assert(after >= 3 && after < 10, s"expected partial grouping: $after")
    assert(t2.read().count() == 10)
  }

  test("manifest merge keeps a mixed-form snapshot's inline entries") {
    import spark.implicits._
    import graft.lake.TableMetadata
    // legacy metadata may carry BOTH inline files and manifest refs on
    // one snapshot (hydrate supports the form; current writers never
    // emit it) — the merge must fold the inline remainder into a
    // manifest, not silently drop those file references
    val t = LakeTable.createAsSelect(spark, freshLoc(), "mm_mixed",
      Seq((0L, "s")).toDF("k", "v"),
      properties = Map("autovacuum_enabled" -> "false",
        "enable_manifest_merge_on_write" -> "false"))
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    // doctor the stored form: current snapshot's FIRST manifest's
    // entries move inline, the ref disappears — the mixed legacy shape
    val loc = t.location
    val v = TableMetadata.currentVersion(loc).get
    val raw = TableMetadata.deserialize(new String(java.nio.file.Files
      .readAllBytes(java.nio.file.Paths.get(TableMetadata.metaDir(loc)).resolve(s"v$v.json"))))
    val curId = raw.currentSnapshotId
    val doctored = raw.copy(snapshots = raw.snapshots.map { s =>
      if (s.id == curId) {
        val refs = Option(s.manifests).getOrElse(Nil)
        s.copy(files = TableMetadata.readManifest(loc, refs.head),
          manifests = refs.tail)
      } else s
    })
    assert(TableMetadata.tryCommit(loc, doctored, v + 1))
    assert(t.read().count() == 6, "doctored mixed form must read whole")
    // merge everything into one group; the inline entry must survive
    assert(TableMetadata.mergeManifests(loc, 2, 1024L * 1024))
    val after = TableMetadata.load(loc)
    assert(after.currentSnapshot.get.files.size == 6,
      "inline entries dropped by manifest merge")
    assert(t.read().count() == 6)
    assert(t.read().select("v").collect().map(_.getString(0)).sorted
      .toSeq == Seq("s", "v1", "v2", "v3", "v4", "v5"))
  }

  test("maintain() isolates broken tables and trims padded options") {
    import spark.implicits._
    val e = LakeEngine(spark)
    // "a_*" sorts first, so the sweep must CONTINUE past the breakage
    val broken = e.createTableAsSelect("a_broken",
      LakeEngine.tempLocation("a_broken"), Seq(1L).toDF("k"))
    (2 to 4).foreach(i => broken.append(Seq(i.toLong).toDF("k")))
    val ok = e.createTableAsSelect("z_ok",
      LakeEngine.tempLocation("z_ok"), Seq(1L).toDF("k"))
    // whitespace-padded values pass the DDL validator (it trims), so
    // the sweep must trim too instead of crashing on ' 5 '.toInt
    ok.setProperties(Map("autovacuum_keep_snapshots" -> " 5 ",
      "autovacuum_grace_ms" -> " 0 "))
    (2 to 9).foreach(i => ok.append(Seq(i.toLong).toDF("k")))
    // corrupt the broken table's latest metadata so t.meta throws
    import graft.lake.TableMetadata
    val bv = TableMetadata.currentVersion(broken.location).get
    java.nio.file.Files.write(
      java.nio.file.Paths.get(TableMetadata.metaDir(broken.location)).resolve(s"v${bv + 1}.json"),
      "{ not json".getBytes)
    val swept = e.maintain()
    assert(!swept.contains("a_broken"), "broken table must be skipped")
    assert(swept.contains("z_ok"),
      s"sweep aborted instead of continuing past the broken table: $swept")
    assert(e.table("z_ok").meta.snapshots.size <= 5)
    // cleanup: remove the corrupt version so dropTable can load
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(TableMetadata.metaDir(broken.location)).resolve(s"v${bv + 1}.json"))
    e.dropTable("a_broken"); e.dropTable("z_ok")
  }

  test("maintain() reclaims orphaned staging dirs past the grace") {
    val e = LakeEngine(spark)
    val root = java.nio.file.Paths.get(LakeEngine.stagingRoot(spark))
    java.nio.file.Files.createDirectories(root)
    // an "orphan" from a crashed statement: old mtime
    val orphan = root.resolve("ins_stage_crashed-xyz")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0"), "x".getBytes)
    java.nio.file.Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60L * 60 * 1000))
    java.nio.file.Files.setLastModifiedTime(root.resolve(
      "ins_stage_crashed-xyz"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60L * 60 * 1000))
    // a live staging dir (fresh mtime) must survive the sweep
    val live = root.resolve("copyto-live-abc")
    java.nio.file.Files.createDirectories(live)
    e.maintain()
    assert(!java.nio.file.Files.exists(orphan),
      "stale staging dir not reclaimed")
    assert(java.nio.file.Files.exists(live),
      "grace must protect an in-flight staging dir")
    java.nio.file.Files.deleteIfExists(live)
  }

  test("option validator: PG boolean spellings accepted, garbage rejected") {
    import spark.implicits._
    // accepted spellings, at CREATE and at SET (reference
    // test_autovacuum_compact_data_files.py validator tests)
    for (v <- Seq("true", "false", "on", "off", "1", "0")) {
      val t = LakeTable.createAsSelect(spark, freshLoc(), s"val_$v",
        Seq(1L).toDF("k"),
        properties = Map("autovacuum_compact_data_files" -> v))
      t.setProperties(Map("autovacuum_enabled" -> v))
    }
    // garbage must be rejected AT DDL TIME with the PG message
    val ex = intercept[IllegalArgumentException] {
      LakeTable.createAsSelect(spark, freshLoc(), "val_bad",
        Seq(1L).toDF("k"),
        properties = Map("autovacuum_compact_data_files" -> "maybe"))
    }
    assert(ex.getMessage.toLowerCase.contains("boolean"), ex.getMessage)
    val t2 = LakeTable.createAsSelect(spark, freshLoc(), "val_set",
      Seq(1L).toDF("k"))
    val ex2 = intercept[IllegalArgumentException](
      t2.setProperties(Map("autovacuum_enabled" -> "banana")))
    assert(ex2.getMessage.toLowerCase.contains("boolean"))
    val ex3 = intercept[Exception](
      t2.setProperties(Map("autovacuum_commit_interval" -> "soon")))
    assert(ex3.getMessage.toLowerCase.contains("integer"))
    // the "on" spelling actually drives behavior, not just validation
    val t3 = LakeTable.createAsSelect(spark, freshLoc(), "val_on",
      Seq(0L).toDF("k"),
      properties = Map("autovacuum_enabled" -> "off"))
    (1 to 20).foreach(i => t3.append(Seq(i.toLong).toDF("k")))
    assert(dataFileCount(t3) == 21, "'off' must disable the ride-along")
  }

  test("maintenance races concurrent appenders: no lost rows") {
    import spark.implicits._
    val t = LakeTable.createAsSelect(spark, freshLoc(), "auto_race",
      Seq((-1L, "seed")).toDF("k", "v"),
      // short interval so the trigger fires DURING the race
      properties = Map("autovacuum_commit_interval" -> "4"))
    val nAppenders = 3
    val appendsEach = 8
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nAppenders + 1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until nAppenders).foreach { a =>
      pool.submit(new Runnable {
        override def run(): Unit = try {
          start.await()
          (0 until appendsEach).foreach { i =>
            val k = (a * appendsEach + i).toLong
            t.append(Seq((k, s"w$a-$i")).toDF("k", "v"))
          }
        } catch { case th: Throwable => failures.add(th) }
      })
    }
    // one dedicated maintainer hammering the sweep while they append
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until 6).foreach { _ => t.compact(); Thread.sleep(20) }
      } catch { case th: Throwable => failures.add(th) }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"worker failed: ${failures.peek()}")
    val rows = t.read().select("k").collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == (-1L until (nAppenders * appendsEach)).toSeq,
      "maintenance lost or duplicated committed rows")
    assert(dataFileCount(t) <= nAppenders * appendsEach / 2)
  }
}
