package graft.sources

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._
import scala.util.Using

/** The storage seam under [[ManifestLog]] (r14 verdict #5): everything
  * the log needs from its storage, with the commit race isolated in ONE
  * primitive — `publish`, an atomic create-if-absent. The manifest
  * format, replay, checkpoint and retention logic above this interface
  * are storage-agnostic; porting the log to an object store means
  * implementing these four methods, nothing else.
  *
  *   - POSIX ([[PosixLogStore]]): publish = stage-to-temp +
  *     `Files.createLink` (link(2) fails EEXIST atomically; a plain
  *     rename would silently clobber the loser's view).
  *   - Object store (not shipped — no S3 in this environment): publish
  *     = conditional PUT (If-None-Match: *) or a catalog CAS, which is
  *     where Delta's LogStore / Iceberg's catalog pointer put the same
  *     race.
  *   - [[InMemoryLogStore]]: a compare-and-swap map — the CAS-shaped
  *     mock the object-store port would behave like, used by
  *     ManifestLogSpec to prove the conflict semantics are a property
  *     of the PROTOCOL, not of link(2).
  */
trait LogStore {

  /** Atomically publish `content` under `name` iff `name` is absent.
    * Returns true when this caller created it, false when it already
    * existed (the caller lost the race — or is republishing derived
    * state, where a loss is a no-op). Must never leave a partial file
    * visible under `name`. */
  def publish(name: String, content: String): Boolean

  /** Names currently visible, any order; never partial files. */
  def list(): Seq[String]

  def read(name: String): String

  /** Remove `name`; absent names are a no-op (retention pruning is
    * idempotent and may race another pruner). */
  def delete(name: String): Unit

  /** BINARY sidecar publish/read (r19, the parquet checkpoint's
    * seam): the same atomic create-if-absent contract as [[publish]].
    * The default binding rides the string primitives via Base64, so
    * every store is correct by construction; bindings with native
    * byte IO (POSIX) override to skip the 4/3 inflation. */
  def publishBytes(name: String, content: Array[Byte]): Boolean =
    publish(name, java.util.Base64.getEncoder.encodeToString(content))

  def readBytes(name: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(read(name))
}

/** POSIX directory-backed store: the local/NFS production binding. */
final class PosixLogStore(dir: Path) extends LogStore {

  override def publish(name: String, content: String): Boolean = {
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".stage-", ".json")
    Files.writeString(tmp, content)
    try { Files.createLink(dir.resolve(name), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def list(): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    // Files.list holds a directory fd until closed — materialize under
    // Using so a long-lived driver resolving many snapshots doesn't
    // accumulate leaked descriptors
    else Using.resource(Files.list(dir))(
      _.iterator().asScala.map(_.getFileName.toString)
        .filterNot(_.startsWith(".")).toSeq)

  override def read(name: String): String =
    Files.readString(dir.resolve(name))

  override def delete(name: String): Unit =
    Files.deleteIfExists(dir.resolve(name))

  override def publishBytes(name: String,
      content: Array[Byte]): Boolean = {
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".stage-", ".bin")
    Files.write(tmp, content)
    try { Files.createLink(dir.resolve(name), tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  override def readBytes(name: String): Array[Byte] =
    Files.readAllBytes(dir.resolve(name))
}

/** Compare-and-swap in-memory store: the object-store-shaped mock.
  * `publish` is a single `putIfAbsent` — the exact semantics of a
  * conditional PUT — so the 8-writer race spec run against this store
  * proves the log's conflict story holds on any CAS backend. */
final class InMemoryLogStore extends LogStore {
  private val files =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  override def publish(name: String, content: String): Boolean =
    files.putIfAbsent(name, content) == null

  override def list(): Seq[String] = files.keySet.asScala.toSeq

  override def read(name: String): String = {
    val c = files.get(name)
    if (c == null) throw new java.nio.file.NoSuchFileException(name)
    c
  }

  override def delete(name: String): Unit = files.remove(name)
}
