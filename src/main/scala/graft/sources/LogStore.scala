package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** The storage contract the generational-Delta COMMIT LAYER assumes —
  * extracted (round-11 directive 4) so the ACID dance ports to an
  * object store without touching commit logic. Five primitives — three
  * core commit operations:
  *
  *  1. `createNew` — atomic create-if-absent, the `_LOCK` mutex acquire
  *     (object store: conditional PUT / If-None-Match);
  *  2. `putIfAbsent` — atomic whole-object publish that FAILS when the
  *     object exists, the `_delta_log/<v>.json` commit CAS (same
  *     conditional PUT; this is Delta's own LogStore contract — two
  *     writers racing the same version must produce one winner);
  *  3. `put` — atomic whole-object publish, last-writer-wins, for the
  *     single-object pointers (`_CURRENT`, `_last_checkpoint`, the
  *     symlink manifests) whose readers must see old-or-new, never torn
  *     bytes (object store: plain PUT, which is atomic per object).
  *
  * `putFile` is `put` for payloads staged as a local file (the
  * checkpoint parquet); `delete` releases locks and drops objects.
  * `lastModifiedMs` is the one metadata READ the commit layer needs —
  * the stale-lock age check (object stores expose per-object mtime in
  * HEAD responses); without it a non-filesystem deployment could never
  * break a crashed holder's lock and every writer would die on the
  * acquire deadline instead (round-12 ADVICE find).
  *
  * NOT part of the contract, deliberately: directory rename. The staged
  * `_txn-*` → `gen-N` move in the local engine is a layout convenience,
  * not a commit primitive — visibility is defined ONLY by the pointer
  * and the log, which swing after the data is fully written, so an
  * object-store port writes data files straight to their final unique
  * prefix (gen-N is single-writer by the lock + pointer CAS) and skips
  * the rename entirely. [[MockObjectStore]] in the test tree proves the
  * commit layer holds every DeltaLogSpec invariant with rename
  * forbidden.
  *
  * Listing (ordered versions) stays on the shared namespace walk
  * ([[Sinks.deltaLogVersions]]) — object-store LIST is prefix-ordered,
  * the same contract the local directory listing provides.
  */
trait LogStore {
  /** Atomic create-if-absent (mutex acquire). MUST throw
    * [[java.nio.file.FileAlreadyExistsException]] when present.
    */
  def createNew(path: Path): Unit

  /** Atomic whole-object publish; readers see the complete old or new
    * content, never torn bytes. Last writer wins.
    */
  def put(path: Path, content: String): Unit

  /** [[put]] that MUST throw
    * [[java.nio.file.FileAlreadyExistsException]] when the object
    * already exists — the log-commit CAS primitive.
    */
  def putIfAbsent(path: Path, content: String): Unit

  /** Atomic whole-object publish of a locally staged file (large or
    * binary payloads — the checkpoint parquet). Last writer wins.
    */
  def putFile(src: Path, dst: Path): Unit

  /** Remove the object if present (lock release, pruning). */
  def delete(path: Path): Unit

  /** The object's last-modified epoch millis — the stale-lock age
    * check's clock. Throws [[java.io.IOException]] (or a subclass, e.g.
    * NoSuchFileException) when the object is gone — the caller treats
    * that as "retry the acquire now". Defaulted to the local-FS
    * attribute so a store that only overrides the write primitives
    * keeps working on a local namespace; an object-store implementation
    * maps this to its HEAD/metadata call.
    */
  def lastModifiedMs(path: Path): Long =
    Files.getLastModifiedTime(path).toMillis

  /** Whole-object content read (GET) — the fence-token check of the
    * lock holder ([[Sinks.LockHandle]]) reads the `_LOCK` content
    * through the store, like the staleness clock above: a direct
    * Files call on a non-filesystem store would throw on every verify
    * and permanently wedge the fenced commit paths. Throws
    * [[java.io.IOException]] when the object is gone.
    */
  def getString(path: Path): String = Files.readString(path)
}

/** Local-filesystem implementation — the default. `put`/`putFile`
  * publish via tmp + ATOMIC_MOVE (POSIX rename, atomic for readers);
  * `putIfAbsent` publishes via a hard link — POSIX link() fails EEXIST
  * atomically, so even a writer resuming from a stale-lock break can
  * never overwrite the lock-breaker's committed version.
  */
object LocalFsLogStore extends LogStore {
  def createNew(path: Path): Unit = Files.createFile(path)

  def put(path: Path, content: String): Unit = {
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def putIfAbsent(path: Path, content: String): Unit = {
    // hard-link publish: POSIX link() fails EEXIST ATOMICALLY, unlike
    // rename(), which silently replaces — an exists() pre-check would
    // leave a window where a writer resuming from a stale-lock break
    // overwrites the lock-breaker's committed version (round-12 review
    // find). The tmp name is unique so concurrent callers never collide
    // on the staging file itself.
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp-" +
      java.util.UUID.randomUUID().toString.take(8))
    Files.writeString(tmp, content)
    try Files.createLink(path, tmp)
    catch {
      // FileAlreadyExistsException IS the CAS losing — propagate first
      // (it extends FileSystemException, which the fallback matches)
      case e: java.nio.file.FileAlreadyExistsException => throw e
      case _: UnsupportedOperationException
           | _: java.nio.file.FileSystemException =>
        // link(2) unavailable: non-default providers throw
        // UnsupportedOperationException, but the JDK's Unix provider
        // surfaces EPERM/ENOTSUP from NFS/FUSE/FAT mounts as a plain
        // FileSystemException (round-12 review find). Fall back to the
        // check + atomic-move publish — the narrower stale-lock race is
        // accepted only where the filesystem forces it; a target that
        // already exists keeps the CAS contract loudly, and any real
        // I/O failure re-throws from the move itself.
        if (Files.exists(path))
          throw new java.nio.file.FileAlreadyExistsException(path.toString)
        Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
    }
    finally Files.deleteIfExists(tmp)
  }

  def putFile(src: Path, dst: Path): Unit =
    Files.move(src, dst,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

  def delete(path: Path): Unit = Files.deleteIfExists(path)
}

/** Per-table-root store registry. Production resolves every path to
  * [[LocalFsLogStore]]; a test (or an object-store deployment) registers
  * its store under the table root and ONLY paths below that root route
  * to it — suite-parallel tests on different temp dirs never interfere,
  * unlike a global mutable default. The registry is also the fault seam
  * the Delta fuzz harness uses to kill a writer at an exact commit-step
  * boundary (a store that throws after N operations).
  */
object LogStores {
  private val overrides =
    new scala.collection.concurrent.TrieMap[String, LogStore]()

  private def key(root: Path): String =
    root.toAbsolutePath.normalize.toString + java.io.File.separator

  def register(root: Path, store: LogStore): Unit =
    overrides.put(key(root), store)

  def unregister(root: Path): Unit = overrides.remove(key(root))

  /** The store governing `path`: the registered store of the nearest
    * enclosing root, else the local-FS default. O(#registered) — the
    * registry holds test/deployment roots, not tables at large.
    */
  def forPath(path: Path): LogStore = {
    if (overrides.isEmpty) return LocalFsLogStore
    val p = path.toAbsolutePath.normalize.toString
    overrides.foldLeft(Option.empty[(String, LogStore)]) {
      case (best, (k, s)) if p.startsWith(k) &&
          best.forall(_._1.length < k.length) => Some((k, s))
      case (best, _) => best
    }.map(_._2).getOrElse(LocalFsLogStore)
  }
}
