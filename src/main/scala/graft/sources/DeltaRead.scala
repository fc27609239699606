package graft.sources

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Native Delta Lake READ — no delta-spark jar required.
  *
  * The Delta transaction log is a PUBLIC protocol (delta.io PROTOCOL.md):
  * `_delta_log/` holds one JSON file of actions per commit
  * (`%020d.json`) plus optional parquet checkpoints (single-part
  * `%020d.checkpoint.parquet` or multi-part
  * `%020d.checkpoint.%010d.%010d.parquet`). Replaying add/remove actions
  * yields the active file set; the latest `metaData` action carries the
  * schema (Spark StructType JSON), partition columns and table
  * configuration. Within a commit, removes reconcile before adds (the
  * protocol's set semantics — a DV-update commit re-adds the same path).
  *
  * Protocol support (round 9 extends v1 → v2/v3):
  *   - **Column mapping** (reader v2, or the `columnMapping` feature):
  *     modes `name` and `id` — files are read under the RECURSIVE
  *     physical schema (`delta.columnMapping.physicalName` at every
  *     nesting level) and renamed back to logical names by a
  *     struct-positional cast, which handles nested structs, arrays and
  *     maps in one expression. `partitionValues` keys are physical.
  *   - **Deletion vectors** (reader v3 + `deletionVectors` feature):
  *     each add's descriptor resolves through [[DeletionVectors]]
  *     (u/p/inline storage, portable RoaringBitmapArray) to the file's
  *     deleted row positions; the scan attaches
  *     `_metadata.file_path/row_index` and drops marked rows with a
  *     broadcast binary-search filter before any downstream operator.
  *   - Reader-v3 tables gate on the feature list: only
  *     {deletionVectors, columnMapping, timestampNtz,
  *     vacuumProtocolCheck} are accepted; anything else (v2Checkpoint,
  *     type widening, ...) FAILS CLEARLY rather than reading wrongly.
  *
  * Also fails clearly on: non-contiguous logs (aged-out prefix without a
  * covering checkpoint — mid-log replay would silently return a partial
  * table) and time travel to nonexistent versions.
  *
  * Partition columns come from each add action's `partitionValues` —
  * the protocol's authoritative source (directory layout is only a
  * convention) — attached as per-partition literals, one scan per
  * distinct partition tuple, unioned.
  *
  * Scale: the log is bounded by table history (thousands of commits ≈
  * MBs of JSON; checkpoints collapse it), so replay is driver-side
  * metadata work; DV bitmaps are per-file and ride one broadcast; the
  * DATA read is a plain pruned parquet scan over the active files.
  * (Reference surface: `read_delta`, backends/pyspark/__init__.py:801.)
  */
object DeltaRead {

  /** One active file: its partitionValues map (authoritative; keys are
    * PHYSICAL names under column mapping) and the deletionVector
    * descriptor JSON (null when none). */
  private[graft] case class AddEntry(pv: Map[String, String], dvJson: String)

  private[graft] case class LogState(
    var minReader: Int = 1,
    var minWriter: Int = 1,
    var readerFeatures: Set[String] = Set.empty,
    var writerFeatures: Set[String] = Set.empty,
    var schemaJson: String = null,
    var partitionCols: Seq[String] = Seq.empty,
    var configuration: Map[String, String] = Map.empty,
    var version: Long = -1L,
    active: scala.collection.mutable.LinkedHashMap[String, AddEntry] =
      scala.collection.mutable.LinkedHashMap.empty)

  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "timestampNtz", "vacuumProtocolCheck",
      // round 12: the reader requests the table's (widened) schema and
      // Spark 4's parquet readers promote int32→int64 / float→double
      // from older files' narrower physical types natively
      "typeWidening")

  /** Relative paths of the currently active files — the remove set an
    * overwrite commit must publish ([[DeltaWrite]]). */
  def activeFiles(spark: SparkSession, path: String): Seq[String] =
    replay(spark, path, None).active.keys.toSeq

  /** Current table state (version, schema, partition columns) — what a
    * writer must validate against before committing ([[DeltaWrite]]).
    * None when the directory holds no Delta log yet. */
  private[graft] def currentState(spark: SparkSession, path: String): Option[LogState] = {
    val logDir = new File(path, "_delta_log")
    if (!logDir.isDirectory) return None
    val any = Option(logDir.listFiles()).getOrElse(Array.empty)
      .exists(f => f.getName.matches("\\d{20}\\.json") ||
        f.getName.matches("\\d{20}\\.checkpoint(\\.\\d{10}\\.\\d{10})?\\.parquet"))
    if (!any) None else Some(replay(spark, path, None))
  }

  private[sources] def checkProtocol(st: LogState, path: String): Unit = {
    require(st.minReader <= 3,
      s"Delta table at $path requires minReaderVersion=${st.minReader}; " +
        "this native reader implements protocol v1-v3 (column mapping, " +
        "deletion vectors) — read it with delta-spark instead")
    if (st.minReader == 3) {
      val unsupported = st.readerFeatures -- SupportedReaderFeatures
      require(unsupported.isEmpty,
        s"Delta table at $path requires reader features " +
          s"${unsupported.toSeq.sorted.mkString("[", ",", "]")} this native " +
          "reader does not implement — read it with delta-spark instead")
    }
  }

  /** Local filesystem path of a scan's `_metadata.file_path` string.
    * `new java.net.URI(fp)` throws on URI-illegal characters (spaces,
    * unescaped partition-value dirs from foreign writers); Hadoop's Path
    * parser is the tolerant decode Spark itself applies to these. */
  private[sources] def filePathToLocal(fp: String): String =
    new org.apache.hadoop.fs.Path(fp).toUri.getPath

  private[sources] def columnMapped(st: LogState): Boolean = {
    val mode = st.configuration.getOrElse("delta.columnMapping.mode", "none")
    mode == "name" || mode == "id"
  }

  private[sources] def physName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** The schema as stored in the files: every field renamed to its
    * physical name, recursively through structs, arrays and maps. */
  private[sources] def physType(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(name = physName(f), dataType = physType(f.dataType))))
    case a: ArrayType => a.copy(elementType = physType(a.elementType))
    case m: MapType =>
      m.copy(keyType = physType(m.keyType), valueType = physType(m.valueType))
    case o => o
  }

  private def colq(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Read a Delta table at its latest version (or `asOfVersion`). */
  def readDelta(spark: SparkSession, path: String,
      asOfVersion: Option[Long] = None): DataFrame =
    read0(spark, path, asOfVersion, lineage = false)

  /** The live rows plus their physical lineage — `_graft_file` (the
    * scan's file-path URI) and `_graft_pos` (row index within the file):
    * what a DV-writing DELETE needs ([[DeltaWrite.deleteWhere]]). */
  private[sources] def readWithLineage(spark: SparkSession, path: String): DataFrame =
    read0(spark, path, None, lineage = true)

  /** The live (DV-applied) logical rows of just `relPaths` — the rewrite
    * input for copy-on-write UPDATE and OPTIMIZE-style compaction
    * ([[DeltaWrite.updateWhere]] / [[DeltaWrite.compact]]). */
  private[sources] def readSubset(spark: SparkSession, path: String,
      relPaths: Set[String]): DataFrame =
    read0(spark, path, None, lineage = false, onlyFiles = Some(relPaths))

  private def read0(spark: SparkSession, path: String,
      asOfVersion: Option[Long], lineage: Boolean,
      onlyFiles: Option[Set[String]] = None): DataFrame = {
    val st = replay(spark, path, asOfVersion)
    checkProtocol(st, path)
    onlyFiles.foreach { keep =>
      val missing = keep -- st.active.keySet
      require(missing.isEmpty,
        s"readSubset: ${missing.size} requested files not in the active set at $path")
      st.active.filterInPlace((p, _) => keep.contains(p))
    }
    require(st.schemaJson != null, s"Delta log at $path has no metaData action")
    val schema = DataType.fromJson(st.schemaJson).asInstanceOf[StructType]
    val mapped = columnMapped(st)

    def resolve(p: String): String = {
      // percent-decode only: URLDecoder's '+'→space rule would corrupt a
      // literal '+' in a path (percent-encoding never emits '+')
      val decoded = java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")
      if (decoded.startsWith("/") || decoded.contains("://")) decoded
      else new File(path, decoded).getAbsolutePath
    }

    if (st.active.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

    // deletion vectors: absolute file path → sorted deleted row indices
    val dvIdx: Map[String, Array[Long]] = st.active.toSeq.flatMap { case (p, e) =>
      Option(e.dvJson).map { j =>
        new File(resolve(p)).getAbsolutePath ->
          DeletionVectors.readDescriptor(parseDvDescriptor(j), new File(path))
      }
    }.toMap
    val dvFilter: Option[Column] = if (dvIdx.isEmpty) None else {
      val bc = spark.sparkContext.broadcast(dvIdx)
      val deleted = udf { (fp: String, ri: java.lang.Long) =>
        val arr = bc.value.getOrElse(filePathToLocal(fp), null)
        arr != null && ri != null &&
          java.util.Arrays.binarySearch(arr, ri.longValue()) >= 0
      }
      Some(!deleted(col("_metadata.file_path"), col("_metadata.row_index")))
    }

    val dataFields = schema.fields.filterNot(f => st.partitionCols.contains(f.name)).toSeq
    val readSchema =
      if (mapped) physType(StructType(dataFields)).asInstanceOf[StructType]
      else StructType(dataFields)
    // logical partition column → the physicalValues key for its values
    val pvKey: Map[String, String] = schema.fields
      .filter(f => st.partitionCols.contains(f.name))
      .map(f => f.name -> (if (mapped) physName(f) else f.name)).toMap

    def scan(allFiles: Seq[String], pv: Map[String, String]): DataFrame = {
      // files WITHOUT a DV scan clean — no metadata columns, no per-row
      // filter; only DV-carrying files pay for the row-index check.
      // Metadata columns resolve per relation, so the data select (and
      // lineage columns) happen per scan, before the union.
      val (dvFiles, cleanFiles) = allFiles.partition(f =>
        dvIdx.contains(new File(f).getAbsolutePath))
      def scanPart(files: Seq[String], withDv: Boolean): DataFrame = {
        var df = spark.read.schema(readSchema).parquet(files: _*)
        if (withDv) dvFilter.foreach(f => df = df.filter(f))
        // physical → logical rename: a struct-positional cast renames
        // every nesting level in one expression (types are identical, so
        // values pass through unchanged, nulls included)
        val lineageCols =
          if (lineage) Seq(col("_metadata.file_path").as("_graft_file"),
            col("_metadata.row_index").as("_graft_pos"))
          else Seq.empty
        df.select(dataFields.zipWithIndex.map { case (f, i) =>
          val c = colq(readSchema.fields(i).name)
          (if (mapped) c.cast(f.dataType) else c).as(f.name)
        } ++ lineageCols: _*)
      }
      var out =
        if (dvFiles.isEmpty) scanPart(cleanFiles, withDv = false)
        else if (cleanFiles.isEmpty) scanPart(dvFiles, withDv = true)
        else scanPart(cleanFiles, withDv = false)
          .unionByName(scanPart(dvFiles, withDv = true))
      st.partitionCols.foreach { c =>
        val field = schema(c)
        val raw = pv.get(pvKey(c)).orNull
        val v = if (raw == null || raw == "__HIVE_DEFAULT_PARTITION__") lit(null)
                else lit(raw)
        out = out.withColumn(c, v.cast(field.dataType))
      }
      val tail = if (lineage) Seq(col("_graft_file"), col("_graft_pos")) else Seq.empty
      out.select(schema.fieldNames.map(colq).toSeq ++ tail: _*)
    }

    if (st.partitionCols.isEmpty) {
      scan(st.active.keys.toSeq.map(resolve), Map.empty)
    } else {
      // partition values come from the ADD ACTIONS (protocol-authoritative;
      // hive-style dirs are only a convention some writers follow): one
      // scan per distinct partition tuple with literal columns, unioned —
      // bounded by the table's partition count
      val byPartition = st.active.toSeq.groupBy(_._2.pv)
      byPartition.toSeq.map { case (pv, files) =>
        scan(files.map(f => resolve(f._1)), pv)
      }.reduce(_ unionByName _)
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
      def addSub(name: String): Boolean =
        cols("add") && df.select(col("add.*")).columns.contains(name)
      val pvCol =
        if (addSub("partitionValues")) to_json(col("add.partitionValues")).cast("string")
        else lit(null).cast("string")
      val dvCol =
        if (addSub("deletionVector")) to_json(col("add.deletionVector")).cast("string")
        else lit(null).cast("string")
      def protoSub(name: String): Boolean =
        cols("protocol") && df.select(col("protocol.*")).columns.contains(name)
      val featCol =
        if (protoSub("readerFeatures")) col("protocol.readerFeatures").cast("array<string>")
        else lit(null).cast("array<string>")
      val wFeatCol =
        if (protoSub("writerFeatures")) col("protocol.writerFeatures").cast("array<string>")
        else lit(null).cast("array<string>")
      val confCol =
        if (cols("metaData") &&
            df.select(col("metaData.*")).columns.contains("configuration"))
          to_json(col("metaData.configuration")).cast("string")
        else lit(null).cast("string")
      val rows = df.select(
        (if (cols("protocol")) col("protocol.minReaderVersion") else lit(null)).cast("int"),
        if (cols("metaData")) col("metaData.schemaString") else lit(null).cast("string"),
        if (cols("metaData")) col("metaData.partitionColumns").cast("array<string>")
        else lit(null).cast("array<string>"),
        (if (cols("add")) col("add.path") else lit(null)).cast("string"),
        (if (cols("remove")) col("remove.path") else lit(null)).cast("string"),
        // struct (json inference) or map (real checkpoints) → uniform JSON
        pvCol,
        dvCol,
        featCol,
        confCol,
        (if (cols("protocol")) col("protocol.minWriterVersion") else lit(null)).cast("int"),
        wFeatCol
      ).collect()
      // the protocol reconciles a commit as a SET: removes apply before
      // adds, so a DV-update commit (remove path + re-add with the new
      // descriptor) keeps the file regardless of line order
      rows.foreach { r =>
        if (!r.isNullAt(0)) st.minReader = r.getInt(0)
        if (!r.isNullAt(9)) st.minWriter = r.getInt(9)
        if (!r.isNullAt(7)) st.readerFeatures = r.getSeq[String](7).toSet
        if (!r.isNullAt(10)) st.writerFeatures = r.getSeq[String](10).toSet
        if (!r.isNullAt(1)) st.schemaJson = r.getString(1)
        if (!r.isNullAt(2)) st.partitionCols = r.getSeq[String](2)
        if (!r.isNullAt(8)) st.configuration = parseStringMap(r.getString(8))
        if (!r.isNullAt(4)) st.active.remove(r.getString(4))
      }
      rows.foreach { r =>
        if (!r.isNullAt(3)) {
          val pv: Map[String, String] =
            if (r.isNullAt(5)) Map.empty else parseStringMap(r.getString(5))
          st.active.put(r.getString(3), AddEntry(pv, if (r.isNullAt(6)) null else r.getString(6)))
        }
      }
    }

    checkpoint.foreach { case (_, files) =>
      applyActions(spark.read.parquet(files.map(_.getAbsolutePath): _*))
    }
    // SCALE SWITCH (round 11): a long tail of commit JSONs replays as ONE
    // distributed reconcile job instead of a per-commit read+collect loop
    // — a 100 TB table accumulating tens of millions of add/remove
    // actions parses and reconciles on executors; the driver receives one
    // row per CURRENTLY-REFERENCED path (exactly what scan planning
    // needs, the delta-spark model), not every historical action.
    val minDistributed = spark.conf
      .getOption("graft.delta.replay.distributedMinCommits").map(_.toInt).getOrElse(64)
    if (commits.length >= minDistributed) distributedReplay(spark, commits.toSeq, st)
    else commits.foreach { case (_, f) =>
      // one commit at a time keeps action ordering exact across commits
      applyActions(spark.read.json(f.getAbsolutePath))
    }
    st
  }

  /** Replay `commits` (ascending, contiguous) into `st` as a Spark job:
    * all commit JSONs load in ONE read with their version recovered from
    * the file name; metadata/protocol actions (rare) collect ordered and
    * fold exactly like the sequential path; file actions reconcile
    * last-writer-wins per path — `max(struct(version, isAdd, …))`, one
    * map-side-combining aggregation, so adds beat removes within a
    * version (the protocol's remove-then-re-add DV-update shape) and the
    * newest action wins across versions. Winners overlay the
    * checkpoint-seeded active map. */
  private def distributedReplay(spark: SparkSession, commits: Seq[(Long, File)],
      st: LogState): Unit = {
    val df = spark.read.json(commits.map(_._2.getAbsolutePath): _*)
      .withColumn("__v",
        regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
    val cols = df.columns.toSet
    def sub(parent: String, name: String): Boolean =
      cols(parent) && df.select(col(s"$parent.*")).columns.contains(name)

    // metadata / protocol: a handful of rows across any real log — apply
    // them in version order with the same semantics as applyActions
    if (cols("metaData") || cols("protocol")) {
      val metaRows = df.filter(
        (if (cols("metaData")) col("metaData").isNotNull else lit(false)) ||
        (if (cols("protocol")) col("protocol").isNotNull else lit(false)))
        .select(
          col("__v"),
          (if (cols("protocol")) col("protocol.minReaderVersion") else lit(null)).cast("int"),
          (if (cols("protocol")) col("protocol.minWriterVersion") else lit(null)).cast("int"),
          (if (sub("protocol", "readerFeatures")) col("protocol.readerFeatures")
           else lit(null)).cast("array<string>"),
          (if (sub("protocol", "writerFeatures")) col("protocol.writerFeatures")
           else lit(null)).cast("array<string>"),
          (if (cols("metaData")) col("metaData.schemaString") else lit(null)).cast("string"),
          (if (cols("metaData")) col("metaData.partitionColumns")
           else lit(null)).cast("array<string>"),
          (if (sub("metaData", "configuration")) to_json(col("metaData.configuration"))
           else lit(null)).cast("string"))
        .collect().sortBy(_.getLong(0))
      metaRows.foreach { r =>
        if (!r.isNullAt(1)) st.minReader = r.getInt(1)
        if (!r.isNullAt(2)) st.minWriter = r.getInt(2)
        if (!r.isNullAt(3)) st.readerFeatures = r.getSeq[String](3).toSet
        if (!r.isNullAt(4)) st.writerFeatures = r.getSeq[String](4).toSet
        if (!r.isNullAt(5)) st.schemaJson = r.getString(5)
        if (!r.isNullAt(6)) st.partitionCols = r.getSeq[String](6)
        if (!r.isNullAt(7)) st.configuration = parseStringMap(r.getString(7))
      }
    }

    // file actions: last-writer-wins reconcile per path
    if (cols("add") || cols("remove")) {
      val ap = (if (cols("add")) col("add.path") else lit(null)).cast("string")
      val rp = (if (cols("remove")) col("remove.path") else lit(null)).cast("string")
      val pv = if (sub("add", "partitionValues"))
        to_json(col("add.partitionValues")).cast("string") else lit(null).cast("string")
      val dv = if (sub("add", "deletionVector"))
        to_json(col("add.deletionVector")).cast("string") else lit(null).cast("string")
      val winners = df
        .filter(ap.isNotNull || rp.isNotNull)
        // __ord: intra-commit line order (partition-local id; a commit
        // JSON is one split) — after (version, isAdd) the tie-break is
        // the LAST action line, matching the sequential replay exactly
        // (not the lexicographic pv/dv text a bare struct-max would use)
        .withColumn("__ord", monotonically_increasing_id())
        .select(coalesce(ap, rp).as("path"),
          struct(col("__v"), ap.isNotNull.cast("int").as("isAdd"),
            col("__ord").as("ord"), pv.as("pv"), dv.as("dv")).as("act"))
        .groupBy(col("path"))
        .agg(max(col("act")).as("w"))
        .select(col("path"), col("w.isAdd"), col("w.pv"), col("w.dv"))
        .collect()
      winners.foreach { r =>
        val path = r.getString(0)
        if (r.getInt(1) == 1) {
          val pvMap: Map[String, String] =
            if (r.isNullAt(2)) Map.empty else parseStringMap(r.getString(2))
          st.active.put(path, AddEntry(pvMap, if (r.isNullAt(3)) null else r.getString(3)))
        } else st.active.remove(path)
      }
    }
  }

  /** Flat string→string JSON object → Map (partitionValues /
    * configuration shape). */
  private def parseStringMap(json: String): Map[String, String] = {
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

  /** `add.deletionVector` JSON → descriptor. */
  private[sources] def parseDvDescriptor(json: String): DeletionVectors.Descriptor = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parseOpt(json) match {
      case Some(JObject(fields)) =>
        val m = fields.toMap
        def str(k: String): String = m.get(k) match {
          case Some(JString(v)) => v
          case _ => throw new IllegalArgumentException(
            s"deletionVector descriptor missing '$k': $json")
        }
        def num(k: String): Option[Long] = m.get(k) match {
          case Some(JInt(v)) => Some(v.toLong)
          case Some(JLong(v)) => Some(v)
          case _ => None
        }
        DeletionVectors.Descriptor(str("storageType"), str("pathOrInlineDv"),
          num("offset").map(_.toInt),
          num("sizeInBytes").getOrElse(throw new IllegalArgumentException(
            s"deletionVector descriptor missing 'sizeInBytes': $json")).toInt,
          num("cardinality").getOrElse(-1L))
      case _ => throw new IllegalArgumentException(s"bad deletionVector JSON: $json")
    }
  }
}
