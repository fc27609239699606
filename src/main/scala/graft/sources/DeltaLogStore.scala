package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

/** Pluggable Delta COMMIT PUBLISHER — the log-store seam the protocol
  * requires of every writer: publishing version N's JSON must be atomic
  * AND fail when N already exists (put-if-absent), because two writers
  * racing the same version is how a Delta table forks. delta-spark makes
  * the same cut (its LogStore interface); here every write verb
  * ([[DeltaWrite.toDelta]] / deleteWhere / updateWhere / merge / compact)
  * routes its one commit through [[DeltaWrite.logStore]], so running on
  * an S3-style object store — where a plain PUT can't express
  * if-absent — means providing exactly ONE class backed by whatever
  * coordination the deployment has (a DynamoDB table, a database row,
  * etcd), with no other cluster delta (DIVERGENCES §3). */
trait DeltaLogStore {

  /** Atomically publish `lines` as `_delta_log/%020d.json` for
    * `version`, throwing IllegalStateException when that version was
    * already committed by anyone (the put-if-absent contract).
    * `tablePath` is for error messages only. */
  def publish(logDir: File, version: Long, lines: Seq[String],
      tablePath: String): Unit
}

/** Default log store for filesystems with atomic link/rename semantics
  * (local, NFS, HDFS-style): the commit is staged to a temp file and made
  * visible by HARD-LINK creation into the versioned name — atomic and
  * failing when the target exists, which plain POSIX rename() does not
  * guarantee (it silently replaces). Filesystems without hard links fall
  * back to existence-check + atomic move, which keeps atomicity but
  * narrows the concurrent-writer guard to a race window — the
  * delta-standalone model. */
object HardLinkLogStore extends DeltaLogStore {

  def publish(logDir: File, version: Long, lines: Seq[String],
      tablePath: String): Unit = {
    val tmpCommit = new File(logDir,
      s".${version}_${java.util.UUID.randomUUID().toString}.json.tmp")
    val target = new File(logDir, f"$version%020d.json")
    try {
      Files.write(tmpCommit.toPath, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      try Files.createLink(target.toPath, tmpCommit.toPath)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"concurrent Delta commit at version $version for $tablePath", e)
        case _: UnsupportedOperationException =>
          // no hard links on this fs: best-effort existence check + atomic
          // move (still atomic; loses only the concurrent-writer guard)
          if (target.exists())
            throw new IllegalStateException(
              s"concurrent Delta commit at version $version for $tablePath")
          Files.move(tmpCommit.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
      }
    } finally {
      if (tmpCommit.exists()) tmpCommit.delete()
    }
  }
}
