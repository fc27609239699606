package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Native Delta Lake READ — no delta-spark jar required.
  *
  * The Delta transaction log is a PUBLIC protocol (delta.io PROTOCOL.md):
  * `_delta_log/` holds one JSON file of actions per commit
  * (`%020d.json`) plus optional parquet checkpoints (single-part
  * `%020d.checkpoint.parquet` or multi-part
  * `%020d.checkpoint.%010d.%010d.parquet`). Replaying add/remove actions
  * yields the active file set; the latest `metaData` action carries the
  * schema (Spark StructType JSON) and partition columns. This implements
  * exactly that for protocol-v1 tables, and FAILS CLEARLY (rather than
  * returning wrong data) when: `protocol.minReaderVersion` demands
  * reader features this replay lacks (deletion vectors, column mapping);
  * the surviving log is NOT contiguous from a checkpoint or version 0
  * (mid-log replay would silently return a partial table); or a
  * requested time-travel version does not exist.
  *
  * Partition columns come from each add action's `partitionValues` —
  * the protocol's authoritative source (directory layout is only a
  * convention) — attached as per-partition literals, one scan per
  * distinct partition tuple, unioned.
  *
  * Scale: the log is bounded by table history (thousands of commits ≈
  * MBs of JSON; checkpoints collapse it), so replay is driver-side
  * metadata work; the DATA read is a plain pruned parquet scan over the
  * active files. (Reference surface: `read_delta`,
  * backends/pyspark/__init__.py:801.)
  */
object DeltaRead {

  private[sources] case class LogState(
    var minReader: Int = 1,
    var schemaJson: String = null,
    var partitionCols: Seq[String] = Seq.empty,
    var version: Long = -1L,
    // path → partitionValues (the add action's map, authoritative)
    active: scala.collection.mutable.LinkedHashMap[String, Map[String, String]] =
      scala.collection.mutable.LinkedHashMap.empty)

  /** Relative paths of the currently active files — the remove set an
    * overwrite commit must publish ([[DeltaWrite]]). */
  def activeFiles(spark: SparkSession, path: String): Seq[String] =
    replay(spark, path, None).active.keys.toSeq

  /** Current table state (version, schema, partition columns) — what a
    * writer must validate against before committing ([[DeltaWrite]]).
    * None when the directory holds no Delta log yet. */
  private[sources] def currentState(spark: SparkSession, path: String): Option[LogState] = {
    val logDir = new File(path, "_delta_log")
    if (!logDir.isDirectory) return None
    val any = Option(logDir.listFiles()).getOrElse(Array.empty)
      .exists(f => f.getName.matches("\\d{20}\\.json") ||
        f.getName.matches("\\d{20}\\.checkpoint(\\.\\d{10}\\.\\d{10})?\\.parquet"))
    if (!any) None else Some(replay(spark, path, None))
  }

  /** Read a Delta table at its latest version (or `asOfVersion`). */
  def readDelta(spark: SparkSession, path: String,
      asOfVersion: Option[Long] = None): DataFrame = {
    val st = replay(spark, path, asOfVersion)
    require(st.minReader <= 1,
      s"Delta table at $path requires minReaderVersion=${st.minReader}; " +
        "this native reader implements protocol v1 only (no deletion " +
        "vectors / column mapping) — read it with delta-spark instead")
    require(st.schemaJson != null, s"Delta log at $path has no metaData action")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]

    def resolve(p: String): String = {
      // percent-decode only: URLDecoder's '+'→space rule would corrupt a
      // literal '+' in a path (percent-encoding never emits '+')
      val decoded = java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")
      if (decoded.startsWith("/") || decoded.contains("://")) decoded
      else new File(path, decoded).getAbsolutePath
    }

    if (st.active.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else if (st.partitionCols.isEmpty) {
      spark.read.schema(schema)
        .parquet(st.active.keys.toSeq.map(resolve): _*)
        .select(schema.fieldNames.map(col).toSeq: _*)
    } else {
      // partition values come from the ADD ACTIONS (protocol-authoritative;
      // hive-style dirs are only a convention some writers follow): one
      // scan per distinct partition tuple with literal columns, unioned —
      // bounded by the table's partition count
      val dataSchema = StructType(schema.filterNot(f => st.partitionCols.contains(f.name)))
      val byPartition = st.active.toSeq.groupBy(_._2)
      val parts = byPartition.toSeq.map { case (pv, files) =>
        var df = spark.read.schema(dataSchema)
          .parquet(files.map(f => resolve(f._1)): _*)
        st.partitionCols.foreach { c =>
          val field = schema(c)
          val raw = pv.get(c).orNull
          val v = if (raw == null || raw == "__HIVE_DEFAULT_PARTITION__") lit(null)
                  else lit(raw)
          df = df.withColumn(c, v.cast(field.dataType))
        }
        df.select(schema.fieldNames.map(col).toSeq: _*)
      }
      parts.reduce(_ unionByName _)
    }
  }

  /** Names of multi-part checkpoint files for version v, if complete. */
  private def checkpointFiles(logDir: File, v: Long, files: Array[File]): Option[Seq[File]] = {
    val single = files.find(_.getName == f"$v%020d.checkpoint.parquet")
    if (single.isDefined) return single.map(Seq(_))
    val multi = files.filter(_.getName.matches(f"$v%020d\\.checkpoint\\.\\d{10}\\.\\d{10}\\.parquet"))
    if (multi.isEmpty) return None
    val total = multi.head.getName
      .replaceAll("^\\d{20}\\.checkpoint\\.\\d{10}\\.(\\d{10})\\.parquet$", "$1").toLong
    if (multi.length.toLong == total) Some(multi.sortBy(_.getName).toSeq) else None
  }

  private def replay(spark: SparkSession, path: String,
      asOfVersion: Option[Long]): LogState = {
    val logDir = new File(path, "_delta_log")
    require(logDir.isDirectory, s"not a Delta table (no _delta_log): $path")
    val all = Option(logDir.listFiles()).getOrElse(Array.empty)

    val commitsAll = all.filter(_.getName.matches("\\d{20}\\.json"))
      .map(f => f.getName.take(20).toLong -> f).sortBy(_._1)
    val checkpointVersions = all
      .flatMap { f =>
        val n = f.getName
        if (n.matches("\\d{20}\\.checkpoint(\\.\\d{10}\\.\\d{10})?\\.parquet"))
          Some(n.take(20).toLong)
        else None
      }.distinct.sorted
    val latestVersion =
      (commitsAll.map(_._1) ++ checkpointVersions).foldLeft(-1L)(math.max)
    require(latestVersion >= 0,
      s"Delta log at $path has no commits")
    asOfVersion.foreach { v =>
      require(v >= 0 && v <= latestVersion,
        s"Delta table at $path has no version $v (latest is $latestVersion) — " +
          "time travel must name an existing version")
    }
    val target = asOfVersion.getOrElse(latestVersion)

    // newest COMPLETE checkpoint at or below the target version
    val checkpoint = checkpointVersions.filter(_ <= target)
      .flatMap(v => checkpointFiles(logDir, v, all).map(v -> _))
      .lastOption
    val commits = commitsAll.filter { case (v, _) =>
      v <= target && checkpoint.forall(v > _._1)
    }

    // contiguity: replaying from mid-log (aged-out prefix without a
    // covering checkpoint) would silently produce a PARTIAL table
    val expectedFrom = checkpoint.map(_._1 + 1).getOrElse(0L)
    val expected = (expectedFrom to target)
    require(commits.map(_._1).toSeq == expected,
      s"Delta log at $path is not contiguous for version $target: " +
        s"need commits ${expectedFrom}..$target" +
        checkpoint.fold(" (no checkpoint found)")(c => s" above checkpoint ${c._1}") +
        s", have ${commits.map(_._1).mkString("[", ",", "]")} — " +
        "aged-out prefix without a covering checkpoint")

    val st = LogState()
    st.version = target

    def applyActions(df: DataFrame): Unit = {
      val cols = df.columns.toSet
      val pvCol =
        if (cols("add") && df.select(col("add.*")).columns.contains("partitionValues"))
          to_json(col("add.partitionValues")).cast("string")
        else lit(null).cast("string")
      val rows = df.select(
        (if (cols("protocol")) col("protocol.minReaderVersion") else lit(null)).cast("int"),
        if (cols("metaData")) col("metaData.schemaString") else lit(null).cast("string"),
        if (cols("metaData")) col("metaData.partitionColumns").cast("array<string>")
        else lit(null).cast("array<string>"),
        (if (cols("add")) col("add.path") else lit(null)).cast("string"),
        (if (cols("remove")) col("remove.path") else lit(null)).cast("string"),
        // struct (json inference) or map (real checkpoints) → uniform JSON
        pvCol
      ).collect()
      rows.foreach { r =>
        if (!r.isNullAt(0)) st.minReader = r.getInt(0)
        if (!r.isNullAt(1)) st.schemaJson = r.getString(1)
        if (!r.isNullAt(2)) st.partitionCols = r.getSeq[String](2)
        if (!r.isNullAt(4)) st.active.remove(r.getString(4))
        if (!r.isNullAt(3)) {
          val pv: Map[String, String] =
            if (r.isNullAt(5)) Map.empty else parsePartitionValues(r.getString(5))
          st.active.put(r.getString(3), pv)
        }
      }
    }

    checkpoint.foreach { case (_, files) =>
      applyActions(spark.read.parquet(files.map(_.getAbsolutePath): _*))
    }
    commits.foreach { case (_, f) =>
      // one commit at a time keeps action ordering exact across commits
      applyActions(spark.read.json(f.getAbsolutePath))
    }
    st
  }

  /** Flat string→string JSON object → Map (partitionValues shape). */
  private def parsePartitionValues(json: String): Map[String, String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parseOpt(json) match {
      case Some(JObject(fields)) => fields.collect {
        case (k, JString(v)) => k -> v
        case (k, JNull) => k -> null
      }.toMap
      case _ => Map.empty
    }
  }
}
