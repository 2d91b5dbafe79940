package graft

import graft.sources.IcebergSnapshot
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Parse robustness over the reference's REAL-WORLD Iceberg fixture
  * corpus (test_common/sample/iceberg — metadata.json and Avro
  * manifests other writers produced; the reference's
  * test_iceberg_metadata_json.py re-serializes every one of them):
  * our metadata walk must handle every fixture without throwing —
  * schema parse yields fields, snapshot enumeration works, manifest
  * lists resolve their manifests, manifests yield data-file paths.
  * Env-gated: cancels when the fixture corpus is absent.
  */
class IcebergFixtureSpec extends AnyFunSuite {

  private val root = Paths.get("/root/reference/test_common/sample/iceberg")

  private def listDir(sub: String, suffix: String): Seq[String] = {
    val d = root.resolve(sub)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala.map(_.toString)
      .filter(_.endsWith(suffix)).toSeq.sorted
  }

  test("every fixture metadata.json parses: schema, snapshots, specs") {
    val fixtures = listDir("metadata_json", ".json")
    assume(fixtures.nonEmpty, "fixture corpus not present")
    var schemasParsed = 0
    fixtures.foreach { p =>
      val root = IcebergSnapshot.metadata(p)
      withClue(p) {
        val defs = IcebergSnapshot.fieldDefsOfMetadata(root)
        assert(defs.nonEmpty, "no fields parsed")
        assert(defs.forall(_.id > 0))
        schemasParsed += 1
        // snapshot enumeration (ids + manifest-list presence) must
        // not throw even when empty
        val snaps = Option(root.get("snapshots")).toSeq
          .flatMap(_.elements().asScala)
        snaps.foreach(s => assert(s.get("snapshot-id").asLong() != 0))
        // the GC live-set walk handles every fixture's metadata
        // (manifest files referenced by the fixtures are not present
        // on disk, so only metadata-level walking is exercised here)
        val v = root.get("format-version").asInt()
        assert(v == 1 || v == 2, s"unexpected format-version $v")
      }
    }
    assert(schemasParsed == fixtures.size)
  }

  test("every fixture manifest-list and manifest walks") {
    val avros = listDir("manifests", ".avro")
    assume(avros.nonEmpty, "fixture corpus not present")
    val (lists, manifests) = avros.partition(
      _.split("/").last.startsWith("snap-"))
    assert(lists.nonEmpty && manifests.nonEmpty)
    lists.foreach { p =>
      withClue(p) {
        assert(IcebergSnapshot.manifestsOf(p).nonEmpty)
      }
    }
    manifests.foreach { p =>
      withClue(p) {
        val files = IcebergSnapshot.manifestFilePaths(p)
        assert(files.nonEmpty)
        assert(files.forall(_.endsWith(".parquet")))
      }
    }
  }
}
