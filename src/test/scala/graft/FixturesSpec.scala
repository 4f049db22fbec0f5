package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class FixturesSpec extends AnyFunSuite {

  private def tmpFixtureDir(): String = {
    val d = Files.createTempDirectory("graft_fixdir_").toString
    d
  }

  test("buildOnce builds once per (fixture, layout) and skips when fresh") {
    val d = tmpFixtureDir()
    var builds = 0
    def build(root: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(root))
      Files.writeString(Paths.get(root, "payload.txt"), s"v$builds")
    }
    val r1 = Fixtures.buildOnce(d, "spec_a", "v1")(build)
    val r2 = Fixtures.buildOnce(d, "spec_a", "v1")(build)
    assert(r1 == r2)
    assert(builds == 1, "fresh marker must skip the builder")
    assert(Files.readString(Paths.get(r1, "payload.txt")) == "v1")
  }

  test("a stale layout stamp wipes the root before rebuilding") {
    val d = tmpFixtureDir()
    def build(extra: Option[String])(root: String): Unit = {
      Files.createDirectories(Paths.get(root))
      Files.writeString(Paths.get(root, "payload.txt"), "x")
      extra.foreach(e => Files.writeString(Paths.get(root, e), "old"))
    }
    val r1 = Fixtures.buildOnce(d, "spec_b", "v1")(build(Some("stale.bin")))
    assert(Files.exists(Paths.get(r1, "stale.bin")))
    // layout bump: the old root (including files the new builder would
    // never rewrite) must be gone, not merged into
    val r2 = Fixtures.buildOnce(d, "spec_b", "v2")(build(None))
    assert(r1 == r2)
    assert(!Files.exists(Paths.get(r2, "stale.bin")),
      "stale-layout content survived the rebuild")
    assert(Files.exists(Paths.get(r2, "payload.txt")))
  }

  test("a crash before the marker write (content, no marker) rebuilds clean") {
    val d = tmpFixtureDir()
    var builds = 0
    def build(root: String): Unit = {
      builds += 1
      Files.createDirectories(Paths.get(root))
      Files.writeString(Paths.get(root, "payload.txt"), "x")
    }
    val r1 = Fixtures.buildOnce(d, "spec_c", "v1")(build)
    // simulate the crash window: content present, marker missing, plus a
    // half-written file the re-run must not inherit
    Files.delete(Paths.get(r1, "_graft_spec_c_built.json"))
    Files.writeString(Paths.get(r1, "half-written.tmp"), "junk")
    val r2 = Fixtures.buildOnce(d, "spec_c", "v1")(build)
    assert(builds == 2)
    assert(!Files.exists(Paths.get(r2, "half-written.tmp")))
    assert(Files.exists(Paths.get(r2, "_graft_spec_c_built.json")))
  }

  test("different fixture dirs get independent roots") {
    val d1 = tmpFixtureDir()
    val d2 = tmpFixtureDir()
    def build(root: String): Unit = {
      Files.createDirectories(Paths.get(root))
    }
    val r1 = Fixtures.buildOnce(d1, "spec_d", "v1")(build)
    val r2 = Fixtures.buildOnce(d2, "spec_d", "v1")(build)
    assert(r1 != r2)
  }
}
