package graft

import graft.lake.{ColStats, FileEntry, LakeTable, Snapshot, TableMetadata}
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Concurrent-writer coverage for the manifest-split metadata path
  * (the reference runs an isolation-tester suite over the same
  * interleavings — pg_lake_table/tests/isolation/specs): racing
  * append + delete + expireSnapshots must never lose a committed file,
  * leave a dangling manifest reference, or GC a manifest that a
  * committed metadata version still points at.
  */
class ConcurrencySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def freshLoc(): String =
    Files.createTempDirectory("conc").toString + "/t"

  private def manifestsOnDisk(loc: String): Set[String] = {
    val dir = java.nio.file.Paths.get(TableMetadata.metaDir(loc))
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("manifest-")).toSet
    finally s.close()
  }

  test("racing append+delete+expire: no lost files, no dangling manifests") {
    import spark.implicits._
    val loc = freshLoc()
    val seed = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = LakeTable.createAsSelect(spark, loc, "race", seed,
      targetFiles = Some(4))

    val nAppenders = 3
    val appendsEach = 3
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(nAppenders + 2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    // appenders: disjoint fresh key ranges, so the expected final
    // row set is deterministic regardless of interleaving
    (0 until nAppenders).foreach { a =>
      pool.submit(new Runnable {
        override def run(): Unit = try {
          start.await()
          (0 until appendsEach).foreach { i =>
            val base = 1000L + a * 100 + i * 10
            t.append((0 until 5).map(j => (base + j, s"a$a"))
              .toDF("k", "v"))
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    // deleter: removes seed keys 1..30, ten at a time
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        Seq((1L, 10L), (11L, 20L), (21L, 30L)).foreach { case (lo, hi) =>
          t.delete(col("k").between(lo, hi))
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    // expirer races with the writers; the default grace period keeps
    // freshly staged (pre-CAS) manifests and data files safe
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until 3).foreach { _ =>
          t.expireSnapshots(keepLast = 2)
          Thread.sleep(50)
        }
      } catch { case e: Throwable => failures.add(e) }
    })

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.asScala.headOption}")

    // every commit landed: 100 seed - 30 deleted + 45 appended
    val expected = 100 - 30 + nAppenders * appendsEach * 5
    assert(t.read().count() == expected)
    assert(t.read().filter(col("k").between(1, 30)).isEmpty)

    // structural invariants on the ON-DISK state (what a fresh process
    // would load): every snapshot hydrates, every referenced manifest
    // and data file exists
    val onDisk = TableMetadata.load(loc)
    val refs = TableMetadata.referencedManifests(onDisk)
    val disk = manifestsOnDisk(loc)
    assert(refs.subsetOf(disk),
      s"dangling manifest refs: ${refs -- disk}")
    onDisk.snapshots.foreach(s => s.files.foreach(f =>
      assert(Files.exists(Paths.get(f.path)), s"lost data file ${f.path}")))

    // quiescent expiry with zero grace: sweep converges to exactly the
    // referenced set, and the table still reads identically afterwards
    t.expireSnapshots(keepLast = 1, graceMs = 0L)
    val after = TableMetadata.load(loc)
    assert(TableMetadata.referencedManifests(after) == manifestsOnDisk(loc),
      "post-expiry manifest set must equal the referenced set")
    assert(t.read().count() == expected)
  }

  test("cluster races appenders: no lost rows, clustering lands or retries") {
    import spark.implicits._
    val loc = freshLoc()
    val seed = (1 to 200).map(i => (i.toLong, i * 1.5)).toDF("k", "v")
    val t = LakeTable.createAsSelect(spark, loc, "zrace", seed,
      targetFiles = Some(6))

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(3)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    (0 until 2).foreach { a =>
      pool.submit(new Runnable {
        override def run(): Unit = try {
          start.await()
          (0 until 3).foreach { i =>
            val base = 1000L + a * 100 + i * 10
            t.append((0 until 5).map(j => (base + j, j * 2.0)).toDF("k", "v"))
          }
        } catch { case e: Throwable => failures.add(e) }
      })
    }
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until 2).foreach { _ => t.cluster(Seq("k", "v"), targetFiles = 4) }
      } catch { case e: Throwable => failures.add(e) }
    })

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.asScala.headOption}")

    // no lost updates in either direction: clustering rewrites only the
    // files it read (CAS-guarded), appends always land
    assert(t.read().count() == 200 + 2 * 3 * 5)
    val onDisk = TableMetadata.load(loc)
    onDisk.currentSnapshot.get.files.foreach(f =>
      assert(Files.exists(Paths.get(f.path)), s"lost data file ${f.path}"))
  }

  test("legacy inline metadata: expire after migration keeps manifests live") {
    val loc = freshLoc()
    import spark.implicits._
    val t = LakeTable.createAsSelect(spark, loc, "legacy",
      (1 to 50).map(i => (i.toLong, s"x$i")).toDF("k", "v"))

    // rewrite current metadata into the LEGACY shape: inline file
    // lists, no manifest refs (what pre-manifest-split tables look like)
    val cur = TableMetadata.load(loc)
    val inline = cur.copy(snapshots = cur.snapshots.map(s =>
      s.copy(files = s.files, manifests = Nil)))
    val v = TableMetadata.currentVersion(loc).get + 1
    Files.write(java.nio.file.Paths.get(TableMetadata.metaDir(loc)).resolve(s"v$v.json"),
      TableMetadata.serialize(inline).getBytes)
    manifestsOnDisk(loc).foreach(m =>
      Files.delete(java.nio.file.Paths.get(TableMetadata.metaDir(loc)).resolve(m)))

    // expireSnapshots both migrates (commit dehydrates inline lists to
    // fresh manifests) and sweeps — the sweep must be computed from the
    // ON-DISK state or it deletes the manifests it just wrote
    t.expireSnapshots(keepLast = 1, graceMs = 0L)

    val after = TableMetadata.load(loc)
    val refs = TableMetadata.referencedManifests(after)
    assert(refs.nonEmpty, "migration should have produced manifest refs")
    assert(refs.subsetOf(manifestsOnDisk(loc)),
      s"GC deleted just-written manifests: ${refs -- manifestsOnDisk(loc)}")
    refs.foreach(m => assert(
      Files.exists(java.nio.file.Paths.get(TableMetadata.metaDir(loc)).resolve(m))))
    assert(t.read().count() == 50)
  }

  test("update races update: commuting increments never lose a write") {
    import spark.implicits._
    val loc = freshLoc()
    val seed = (1 to 100).map(i => (i.toLong, 0L)).toDF("k", "n")
    val t = LakeTable.createAsSelect(spark, loc, "uprace", seed,
      targetFiles = Some(4))

    // overlapping predicates force both writers onto the SAME files:
    // the copy-on-write rewrite must CAS-retry from fresh state, so
    // each increment is applied exactly once (a lost update would
    // revert the other writer's rows to a stale image)
    val rounds = 2
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until rounds).foreach { _ =>
          t.update(col("k") <= 60, Map("n" -> (col("n") + 1)))
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until rounds).foreach { _ =>
          t.update(col("k") >= 40, Map("n" -> (col("n") + 10)))
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race timed out")
    assert(failures.isEmpty, s"writer failed: ${failures.asScala.headOption}")

    // every row carries exactly the increments whose predicate it
    // matches — regardless of interleaving
    val rows = t.read().select("k", "n").as[(Long, Long)].collect().toMap
    assert(rows.size == 100)
    (1 to 100).foreach { i =>
      val expected = (if (i <= 60) rounds * 1L else 0L) +
        (if (i >= 40) rounds * 10L else 0L)
      assert(rows(i.toLong) == expected,
        s"k=$i: got ${rows(i.toLong)}, want $expected (lost update)")
    }
    val onDisk = TableMetadata.load(loc)
    onDisk.currentSnapshot.get.files.foreach(f =>
      assert(Files.exists(Paths.get(f.path)), s"lost data file ${f.path}"))
  }

  test("expire races readAsOf: grace protects in-flight time travel") {
    import spark.implicits._
    val loc = freshLoc()
    val t = LakeTable.createAsSelect(spark, loc, "ttrace",
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v"),
      targetFiles = Some(3))
    val oldId = t.meta.currentSnapshotId
    val oldCount = 50L
    val oldFiles = t.meta.currentSnapshot.get.files.map(_.path)
    (0 until 2).foreach { i =>
      t.append(Seq((100L + i, "a")).toDF("k", "v"))
    }
    // rewrite everything so the original files become unique to the
    // old snapshots — the case where expiry actually GCs reader state
    t.cluster(Seq("k"), targetFiles = 2)

    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until 8).foreach { _ =>
          // each attempt must be all-or-nothing: the full old count
          // when the snapshot is still in metadata, a clean
          // no-such-snapshot error once expired — never a partial scan
          // or a missing-file failure (default grace keeps the bytes)
          try assert(t.readAsOf(oldId).count() == oldCount)
          catch { case _: IllegalArgumentException => () }
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    pool.submit(new Runnable {
      override def run(): Unit = try {
        start.await()
        (0 until 3).foreach { _ =>
          t.expireSnapshots(keepLast = 1) // default grace
          Thread.sleep(20)
        }
      } catch { case e: Throwable => failures.add(e) }
    })
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race timed out")
    assert(failures.isEmpty,
      s"time-travel read saw GC'd state: ${failures.asScala.headOption}")

    // the racing expiry removed the snapshot from metadata, but grace
    // kept its bytes; the snapshot itself is gone for NEW reads
    intercept[IllegalArgumentException] { t.readAsOf(oldId) }
    oldFiles.foreach(p => assert(Files.exists(Paths.get(p)),
      "grace must keep expired snapshots' files during the race window"))
    // quiescent zero-grace expiry reclaims the now-orphaned files;
    // the current snapshot is untouched throughout
    t.expireSnapshots(keepLast = 1, graceMs = 0L)
    val current = TableMetadata.load(loc).currentSnapshot.get.files
      .map(_.path).toSet
    oldFiles.filterNot(current).foreach(p =>
      assert(!Files.exists(Paths.get(p)), s"orphaned file survived: $p"))
    assert(t.read().count() == 52)
  }

  test("expiry races a slow writer: grace keeps the staged manifest") {
    val loc = freshLoc()
    import spark.implicits._
    val t = LakeTable.createAsSelect(spark, loc, "grace",
      (1 to 10).map(i => (i.toLong, "s")).toDF("k", "v"))

    // stage a manifest exactly like a writer does pre-CAS, then run the
    // sweep: with the default grace the file must survive even though
    // no committed version references it yet
    val staged = TableMetadata.writeManifest(loc, Seq(FileEntry(
      s"$loc/data/in-flight.parquet", 1L, 10L, 1,
      Map("1" -> ColStats(Some("1"), Some("1"), 0)), Map.empty)))
    t.expireSnapshots(keepLast = 1)
    assert(Files.exists(java.nio.file.Paths.get(TableMetadata.metaDir(loc)).resolve(staged)),
      "grace period must protect a pre-CAS staged manifest")
    // zero grace reclaims it once it is provably orphaned
    t.expireSnapshots(keepLast = 1, graceMs = 0L)
    assert(!Files.exists(java.nio.file.Paths.get(TableMetadata.metaDir(loc)).resolve(staged)))
  }
}
