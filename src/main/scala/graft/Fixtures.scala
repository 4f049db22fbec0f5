package graft

import java.nio.file.{Files, Path, Paths}

/** Build-once protocol for persisted fixture indexes (Delta tables, IVF
  * lists, landmark indexes) that several queries read per run: the index
  * lives under java.io.tmpdir keyed by (name, fixture dir), and a marker
  * file inside the root records the fixture dir plus a LAYOUT VERSION. A
  * missing or stale marker (layout change, crash before the marker write)
  * WIPES the root before rebuilding — building on top of a half-built or
  * differently-laid-out root is never safe (q224 pins Delta version
  * numbers; upsert sinks would MERGE into stale content instead of
  * replacing it).
  *
  * Round-9 directive: this protocol was hand-rolled at four query sites
  * (q183/q192, q198, q204, q224) with drifting wipe semantics — one
  * helper, one discipline.
  */
object Fixtures {

  /** Returns the index root, running `build(root)` only when the marker is
    * missing or stale. `layout` must change whenever the builder's output
    * shape changes — it invalidates every previously-built root.
    */
  def buildOnce(d: String, name: String, layout: String)
               (build: String => Unit): String = {
    val root = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${name}_" + new java.io.File(d).getName).toString
    val marker = Paths.get(root, s"_graft_${name}_built.json")
    val stamp = s"""{"src":"$d","layout":"$layout"}"""
    val fresh = Files.exists(marker) &&
      Files.readString(marker).trim == stamp
    if (!fresh) {
      wipe(Paths.get(root))
      build(root)
      Files.createDirectories(Paths.get(root))
      Files.writeString(marker, stamp)
    }
    root
  }

  private def wipe(root: Path): Unit =
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(root)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
}
