package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Native Delta Lake READ — no delta-spark jar required.
  *
  * The Delta transaction log is a PUBLIC protocol (delta.io PROTOCOL.md):
  * `_delta_log/` holds one JSON file of actions per commit
  * (`%020d.json`) plus optional parquet checkpoints
  * (`%020d.checkpoint.parquet`, pointed at by `_last_checkpoint`).
  * Replaying add/remove actions yields the active file set; the latest
  * `metaData` action carries the schema (Spark StructType JSON) and
  * partition columns. That's everything a reader needs for
  * protocol-v1 tables — this implements exactly that, and FAILS CLEARLY
  * (rather than returning wrong data) when `protocol.minReaderVersion`
  * demands reader features this replay does not implement (deletion
  * vectors, column mapping).
  *
  * Scale: the log is bounded by table history (thousands of commits ≈
  * MBs of JSON; checkpoints collapse it), so replay is driver-side
  * metadata work; the DATA read is a plain pruned parquet scan over the
  * active files with hive-style partition dirs (`basePath` keeps the
  * partition columns). Writing still requires delta-spark's atomic
  * commit protocol — read is the side a Spark-native engine can own
  * (reference surface: `read_delta`, backends/pyspark/__init__.py:801).
  */
object DeltaRead {

  private[sources] case class LogState(
    var minReader: Int = 1,
    var schemaJson: String = null,
    var partitionCols: Seq[String] = Seq.empty,
    active: scala.collection.mutable.LinkedHashMap[String, Unit] =
      scala.collection.mutable.LinkedHashMap.empty)

  /** Relative paths of the currently active files — the remove set an
    * overwrite commit must publish ([[DeltaWrite]]). */
  def activeFiles(spark: SparkSession, path: String): Seq[String] =
    replay(spark, path, None).active.keys.toSeq

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
    val files = st.active.keys.toSeq.map { p =>
      val decoded = java.net.URLDecoder.decode(p, "UTF-8")
      if (decoded.startsWith("/") || decoded.contains("://")) decoded
      else new File(path, decoded).getAbsolutePath
    }
    if (files.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      // basePath keeps hive-style partition directories as columns; the
      // declared data schema excludes them in the Delta layout
      val dataSchema = StructType(schema.filterNot(f => st.partitionCols.contains(f.name)))
      val df = spark.read
        .option("basePath", path)
        .schema(StructType(dataSchema ++
          schema.filter(f => st.partitionCols.contains(f.name))))
        .parquet(files: _*)
      // restore declared column order
      df.select(schema.fieldNames.map(col).toSeq: _*)
    }
  }

  private def replay(spark: SparkSession, path: String,
      asOfVersion: Option[Long]): LogState = {
    val logDir = new File(path, "_delta_log")
    require(logDir.isDirectory, s"not a Delta table (no _delta_log): $path")

    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(f => f.getName.take(20).toLong -> f)
      .filter { case (v, _) => asOfVersion.forall(v <= _) }
      .sortBy(_._1)
    // checkpoint: skip the JSON prefix the checkpoint already covers
    val checkpoint = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.checkpoint\\.parquet"))
      .map(f => f.getName.take(20).toLong -> f)
      .filter { case (v, _) => asOfVersion.forall(v <= _) }
      .sortBy(_._1).lastOption
    require(commits.nonEmpty || checkpoint.nonEmpty,
      s"Delta log at $path has no commits" +
        asOfVersion.fold("")(v => s" at or below version $v"))

    // action stream in commit order: checkpoint rows first (their order
    // is irrelevant — a checkpoint holds one action per live entity),
    // then each later commit's actions
    val st = LogState()

    def applyActions(df: DataFrame): Unit = {
      val cols = df.columns.toSet
      val rows = df.select(
        (if (cols("protocol")) col("protocol.minReaderVersion") else lit(null)).cast("int"),
        if (cols("metaData")) col("metaData.schemaString") else lit(null).cast("string"),
        if (cols("metaData")) col("metaData.partitionColumns").cast("array<string>")
        else lit(null).cast("array<string>"),
        if (cols("add")) col("add.path") else lit(null).cast("string"),
        if (cols("remove")) col("remove.path") else lit(null).cast("string")
      ).collect()
      rows.foreach { r =>
        if (!r.isNullAt(0)) st.minReader = r.getInt(0)
        if (!r.isNullAt(1)) st.schemaJson = r.getString(1)
        if (!r.isNullAt(2)) st.partitionCols = r.getSeq[String](2)
        if (!r.isNullAt(4)) st.active.remove(r.getString(4))
        if (!r.isNullAt(3)) st.active.put(r.getString(3), ())
      }
    }

    checkpoint.foreach { case (_, f) =>
      applyActions(spark.read.parquet(f.getAbsolutePath))
    }
    val startAfter = checkpoint.map(_._1).getOrElse(-1L)
    commits.filter(_._1 > startAfter).foreach { case (_, f) =>
      // one commit at a time keeps action ordering exact across commits
      applyActions(spark.read.json(f.getAbsolutePath))
    }
    st
  }
}
