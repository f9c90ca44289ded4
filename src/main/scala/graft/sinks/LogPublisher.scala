package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

/** The LogStore seam — how a prepared log-entry file becomes version N
  * of a [[Snapshots]] table, EXCLUSIVELY. This one primitive is the
  * entire consistency root of the snapshot log: exactly one committer
  * may materialize a given `vNNNNN.json`, and the loser must learn it
  * lost (so the commit loop can rebase an append or conflict a
  * rewrite).
  *
  * Filesystems with a native atomic refuse-existing-destination
  * primitive get a built-in implementation ([[LogPublisher.PosixLink]]
  * for `file:`, [[LogPublisher.ExclusiveRename]] for HDFS-likes).
  * Object stores do NOT have one behind the Hadoop `rename` API —
  * S3A rename is copy+delete with no exclusivity guarantee — but most
  * expose a CONDITIONAL WRITE (S3 `If-None-Match: *`, GCS
  * `ifGenerationMatch=0`, ABFS ETag preconditions); a deployment
  * supplies an implementation over that primitive via
  * `spark.graft.snapshots.logPublisher=<class name>` and gets full
  * multi-writer safety on its store — the Delta LogStore idea as a
  * seam instead of a hardcoded per-scheme block.
  *
  * Contract for implementors:
  *  - return true iff THIS call created `dest` (won the race); false
  *    iff `dest` already existed or another committer created it
  *    concurrently — never both writers true for one dest;
  *  - a partial/torn `dest` must never become visible (write to a
  *    temp name + conditional finalize, or a conditional single PUT);
  *  - `tmp` (the prepared entry on the same filesystem) is left in
  *    place either way — the caller deletes it;
  *  - implementations are resolved per commit via a no-arg constructor
  *    (or a Scala `object`), so they must be stateless or manage their
  *    own state.
  */
trait LogPublisher {
  def publishExclusive(fs: FileSystem, tmp: Path, dest: Path): Boolean
}

object LogPublisher {

  /** `file:` — POSIX rename REPLACES an existing destination, so the
    * exclusivity primitive is link(2): hard-link creation is
    * atomic-exclusive (EEXIST for the loser). */
  object PosixLink extends LogPublisher {
    override def publishExclusive(fs: FileSystem, tmp: Path,
                                  dest: Path): Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dest.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
  }

  /** HDFS/viewfs — `rename` refuses an existing destination
    * atomically at the namenode, so rename IS the exclusive publish.
    * The pre-check only short-circuits the common already-lost case. */
  object ExclusiveRename extends LogPublisher {
    override def publishExclusive(fs: FileSystem, tmp: Path,
                                  dest: Path): Boolean =
      !fs.exists(dest) && fs.rename(tmp, dest)
  }

  /** Check-then-rename with NO atomicity guarantee — the explicit
    * single-writer-only escape for stores without an exclusive
    * primitive (`spark.graft.snapshots.allowNonAtomicPublish=true`).
    * Two concurrent committers can both "win" one version here; the
    * caller has accepted that no second writer exists. */
  object NonAtomic extends LogPublisher {
    override def publishExclusive(fs: FileSystem, tmp: Path,
                                  dest: Path): Boolean =
      !fs.exists(dest) && fs.rename(tmp, dest)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, LogPublisher]()

  /** Instantiate a configured publisher: a Scala `object` (by its
    * `MODULE$` field) or a class with a no-arg constructor. A module
    * hit must itself BE a LogPublisher — a publisher CLASS with an
    * unrelated companion object (config-key constants, a shared
    * client) must not be shadowed by that companion. Cached by name —
    * publishers are contractually stateless-or-self-managed. */
  private[sinks] def forName(name: String): LogPublisher =
    cache.computeIfAbsent(name, { cls =>
      def module(n: String) = scala.util.Try(
        Class.forName(n).getField("MODULE$").get(null))
        .toOption.filter(_.isInstanceOf[LogPublisher])
      val inst = module(cls).orElse(module(cls + "$"))
        .getOrElse(Class.forName(cls).getDeclaredConstructor().newInstance())
      inst match {
        case p: LogPublisher => p
        case other => throw new IllegalArgumentException(
          s"spark.graft.snapshots.logPublisher=$cls is not a " +
            s"graft.sinks.LogPublisher: ${other.getClass.getName}")
      }
    })
}
