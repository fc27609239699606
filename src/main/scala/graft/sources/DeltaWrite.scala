package graft.sources

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types.{DataType, StructType}

/** Native Delta Lake WRITE for filesystems with atomic link/rename — the
  * single-writer side of [[DeltaRead]], per the same public protocol:
  * data lands as plain parquet parts, then ONE commit JSON
  * (`_delta_log/%020d.json`) publishes them with add (and, for
  * overwrite, remove) actions. The commit is made visible by hard-link
  * creation into the versioned name — atomic AND failing when the
  * version already exists, which is the put-if-absent contract the Delta
  * spec requires of a log store (plain rename() silently REPLACES on
  * POSIX). Correct for local/NFS/HDFS-style semantics, the
  * delta-standalone model; S3-style multi-writer coordination needs a
  * real log-store service and stays with delta-spark (DIVERGENCES §3).
  *
  * The writer replays the existing table state first (checkpoints
  * included, via [[DeltaRead]]): the next version counts BOTH commit
  * JSONs and checkpoints, appends validate the schema against the
  * table's metaData (a silent mismatch would read back as all-null
  * columns), overwrite with a NEW schema publishes an updated metaData
  * action, and partitioned tables are refused — this writer emits
  * unpartitioned layouts only.
  *
  * Tables written here carry protocol (1,2) and read back both through
  * [[DeltaRead]] and any standard Delta reader. */
object DeltaWrite {

  /** Write `df` to a Delta table at `path`. Supported modes: Overwrite
    * (logically removes previously active files; may change the schema)
    * and Append (schema must match). Returns the committed version. */
  def toDelta(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Long = {
    require(mode == SaveMode.Overwrite || mode == SaveMode.Append,
      s"toDelta supports Overwrite/Append, got $mode")
    val table = new File(path)
    val logDir = new File(table, "_delta_log")
    logDir.mkdirs()

    // existing table state — version counting must see CHECKPOINTS too
    // (a checkpoint-only log is a real table, not a fresh one)
    val prior = DeltaRead.currentState(df.sparkSession, path)
    val version = prior.map(_.version + 1).getOrElse(0L)
    prior.foreach { st =>
      require(st.partitionCols.isEmpty,
        s"Delta table at $path is partitioned by ${st.partitionCols.mkString(",")}; " +
          "this writer emits unpartitioned layouts only — use delta-spark")
      if (mode == SaveMode.Append && st.schemaJson != null) {
        val existing = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
        val same = existing.fields.map(f => (f.name, f.dataType)).toSeq ==
          df.schema.fields.map(f => (f.name, f.dataType)).toSeq
        require(same,
          s"append schema ${df.schema.simpleString} does not match the table's " +
            s"${existing.simpleString} at $path — the mismatch would read back " +
            "as null columns")
      }
    }
    val priorActive: Seq[String] =
      if (mode == SaveMode.Overwrite) prior.map(_.active.keys.toSeq).getOrElse(Seq.empty)
      else Seq.empty
    val schemaChanged = prior.forall(_.schemaJson == null) ||
      prior.exists { st =>
        DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
          .fields.map(f => (f.name, f.dataType)).toSeq !=
          df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      }
    val needMeta = prior.isEmpty || (mode == SaveMode.Overwrite && schemaChanged)

    // data: write parts into a temp dir, move them in under unique names;
    // the staging dir is removed afterwards
    val tmp = Files.createTempDirectory("graft_delta_write").toFile
    val added = try {
      df.write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      val commitUuid = java.util.UUID.randomUUID().toString
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .zipWithIndex.map { case (p, i) =>
          val name = f"part-$i%05d-$commitUuid.snappy.parquet"
          Files.move(p.toPath, new File(table, name).toPath,
            StandardCopyOption.REPLACE_EXISTING)
          name -> new File(table, name).length()
        }.toSeq
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp)

    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val now = System.currentTimeMillis()
    val lines = Seq.newBuilder[String]
    if (prior.isEmpty)
      lines += """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""
    if (needMeta)
      lines += s"""{"metaData":{"id":${jstr(java.util.UUID.randomUUID().toString)},""" +
        s""""format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${jstr(df.schema.json)},""" +
        s""""partitionColumns":[],"configuration":{},"createdTime":$now}}"""
    priorActive.foreach { p =>
      lines += s"""{"remove":{"path":${jstr(p)},"deletionTimestamp":$now,"dataChange":true}}"""
    }
    added.foreach { case (name, size) =>
      lines += s"""{"add":{"path":${jstr(name)},"partitionValues":{},""" +
        s""""size":$size,"modificationTime":$now,"dataChange":true}}"""
    }

    publishCommit(logDir, version, lines.result(), path)
    version
  }

  /** Collapse the table's current state into a parquet checkpoint at the
    * latest version (+ `_last_checkpoint` pointer), so replay cost stays
    * bounded as history grows — the standard log-maintenance step.
    * Aged-out JSON prefixes are then safe to delete: [[DeltaRead]] starts
    * from the newest complete checkpoint. Returns the checkpointed
    * version. */
  def checkpoint(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val st = DeltaRead.currentState(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no Delta table at $path"))
    val logDir = new File(new File(path), "_delta_log")
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val lines =
      Seq(s"""{"protocol":{"minReaderVersion":${st.minReader},"minWriterVersion":2}}""",
        s"""{"metaData":{"id":${jstr(java.util.UUID.randomUUID().toString)},""" +
          s""""format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":${jstr(st.schemaJson)},""" +
          s""""partitionColumns":${st.partitionCols.map(jstr).mkString("[", ",", "]")},""" +
          """"configuration":{}}}""") ++
      st.active.toSeq.map { case (p, pv) =>
        val pvJson = pv.toSeq.map { case (k, v) =>
          s"${jstr(k)}:${if (v == null) "null" else jstr(v)}" }.mkString("{", ",", "}")
        s"""{"add":{"path":${jstr(p)},"partitionValues":$pvJson,"size":0,""" +
          s""""modificationTime":0,"dataChange":false}}"""
      }
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_delta_cp").toFile
    try {
      spark.read.json(lines.toDS).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.getAbsolutePath)
      val part = Option(tmp.listFiles()).getOrElse(Array.empty)
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath,
        new File(logDir, f"${st.version}%020d.checkpoint.parquet").toPath,
        StandardCopyOption.REPLACE_EXISTING)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    Files.write(new File(logDir, "_last_checkpoint").toPath,
      s"""{"version":${st.version},"size":${lines.size}}\n""".getBytes("UTF-8"))
    st.version
  }

  /** Delete data files no longer referenced by the current table version
    * and older than `retentionMs` (default 7 days — the retention window
    * protects readers of recent historical versions and in-flight
    * writers). Returns the deleted paths. The log itself is never
    * touched; time travel to versions whose files were vacuumed will
    * fail at scan time, same as delta-spark. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, path: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    require(retentionMs >= 0, "retentionMs must be >= 0")
    val st = DeltaRead.currentState(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no Delta table at $path"))
    val table = new File(path)
    val activeAbs = st.active.keys.map { p =>
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      val f = if (decoded.startsWith("/")) new File(decoded) else new File(table, decoded)
      f.getCanonicalPath
    }.toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    val logCanon = new File(table, "_delta_log").getCanonicalPath
    def walk(dir: File): Seq[File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory)
          { if (f.getCanonicalPath == logCanon) Seq.empty else walk(f) }
        else Seq(f)
      }
    val deleted = walk(table).filter { f =>
      f.getName.endsWith(".parquet") &&
        !activeAbs.contains(f.getCanonicalPath) &&
        f.lastModified() < cutoff
    }
    deleted.foreach(_.delete())
    deleted.map(_.getAbsolutePath)
  }

  private def publishCommit(logDir: File, version: Long, lines: Seq[String],
      path: String): Unit = {
    // atomic publish with PUT-IF-ABSENT via hard-link creation
    val tmpCommit = new File(logDir,
      s".${version}_${java.util.UUID.randomUUID().toString}.json.tmp")
    val target = new File(logDir, f"$version%020d.json")
    try {
      Files.write(tmpCommit.toPath, (lines.mkString("\n") + "\n").getBytes("UTF-8"))
      try Files.createLink(target.toPath, tmpCommit.toPath)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new IllegalStateException(
            s"concurrent Delta commit at version $version for $path", e)
        case _: UnsupportedOperationException =>
          // no hard links on this fs: best-effort existence check + atomic
          // move (still atomic; loses only the concurrent-writer guard)
          if (target.exists())
            throw new IllegalStateException(
              s"concurrent Delta commit at version $version for $path")
          Files.move(tmpCommit.toPath, target.toPath, StandardCopyOption.ATOMIC_MOVE)
      }
    } finally {
      if (tmpCommit.exists()) tmpCommit.delete()
    }
  }
}
