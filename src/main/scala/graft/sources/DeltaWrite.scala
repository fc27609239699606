package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Native Delta Lake WRITE for filesystems with atomic rename — the
  * single-writer side of [[DeltaRead]], per the same public protocol:
  * data lands as plain parquet parts, then ONE commit JSON
  * (`_delta_log/%020d.json`) publishes them with add (and, for
  * overwrite, remove) actions. The commit is made visible by an ATOMIC
  * `Files.move` of a temp file into the versioned name, failing if the
  * version already exists — exactly the put-if-absent contract the Delta
  * spec requires of a log store. That makes this writer correct for
  * local/NFS/HDFS-style rename semantics (the delta-standalone model);
  * S3-style multi-writer coordination needs a real log-store service and
  * stays with delta-spark (DIVERGENCES.md §3).
  *
  * Tables written here carry protocol (1,2) and read back both through
  * [[DeltaRead]] and any standard Delta reader. */
object DeltaWrite {

  /** Write `df` to a Delta table at `path`. Supported modes: Overwrite
    * (logically removes previously active files) and Append. Returns the
    * committed version. */
  def toDelta(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Long = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"toDelta supports Overwrite/Append, got $mode")
    val table = new File(path)
    val logDir = new File(table, "_delta_log")
    logDir.mkdirs()

    val existing = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(_.getName.take(20).toLong)
    val version = if (existing.isEmpty) 0L else existing.max + 1
    val isFirst = existing.isEmpty

    // previously active files (to remove on overwrite) via the reader's
    // replay — bounded driver-side metadata work
    val priorActive: Seq[String] =
      if (!isFirst && mode == SaveMode.Overwrite)
        DeltaRead.activeFiles(df.sparkSession, path)
      else Seq.empty

    // data: write parts into a temp dir, move them in under unique names
    val tmp = Files.createTempDirectory("graft_delta_write").toFile
    df.write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
    val commitUuid = java.util.UUID.randomUUID().toString
    val parts = Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val added = parts.zipWithIndex.map { case (p, i) =>
      val name = f"part-$i%05d-$commitUuid.snappy.parquet"
      Files.move(p.toPath, new File(table, name).toPath,
        StandardCopyOption.REPLACE_EXISTING)
      name -> p.length()
    }.toSeq

    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val now = System.currentTimeMillis()
    val lines = Seq.newBuilder[String]
    if (isFirst) {
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
      lines += s"""{"metaData":{"id":${jstr(java.util.UUID.randomUUID().toString)},""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(df.schema.json)},""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":$now}}"""
    }
    priorActive.foreach { p =>
      lines += s"""{"remove":{"path":${jstr(p)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    added.foreach { case (name, size) =>
      lines += s"""{"add":{"path":${jstr(name)},"partitionValues":{},""" +
        s""""size":$size,"modificationTime":$now,"dataChange":true}}"""
    }

    // atomic publish with PUT-IF-ABSENT: plain rename() would silently
    // REPLACE an existing version on POSIX — hard-link creation is both
    // atomic and fails when the target exists, which is exactly the
    // log-store contract
    val tmpCommit = new File(logDir, s".${version}_$commitUuid.json.tmp")
    Files.write(tmpCommit.toPath, (lines.result().mkString("\n") + "\n").getBytes("UTF-8"))
    val target = new File(logDir, f"$version%020d.json")
    try {
      Files.createLink(target.toPath, tmpCommit.toPath)
      tmpCommit.delete()
    } catch {
      case e: java.nio.file.FileAlreadyExistsException =>
        tmpCommit.delete()
        throw new IllegalStateException(
          s"concurrent Delta commit at version $version for $path", e)
    }
    version
  }
}
