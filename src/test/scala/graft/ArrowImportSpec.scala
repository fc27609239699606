package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.interop.{ArrowExport, ArrowImport}

/** Arrow IPC import (the inverse of ArrowExportSpec): bytes produced by
  * the exporter — i.e. exactly what pyarrow's stream writer emits —
  * decode back into a DataFrame with the same schema and rows, so a
  * pyarrow/duckdb-produced frame becomes a queryable relation with no
  * parquet detour. */
class ArrowImportSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(df: DataFrame, batch: Int = 10000): DataFrame = {
    val back = ArrowImport.fromArrowBytes(spark,
      ArrowExport.toArrowStreamBytes(df, maxRecordsPerBatch = batch))
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)), "schema mismatch")
    assert(back.collect().toSeq == df.collect().toSeq, "row mismatch")
    back
  }

  test("primitives, strings, nulls, decimals, dates and timestamps roundtrip") {
    roundTrip(Seq(
      (1L, Some(1.5), "alpha", Some(true)),
      (2L, None, "beta", None),
      (3L, Some(-0.25), null.asInstanceOf[String], Some(false)))
      .toDF("id", "x", "s", "b")
      .withColumn("dec", (col("id") * 3).cast("decimal(10,2)") / 2)
      .withColumn("d", lit(Date.valueOf("2024-03-01")))
      .withColumn("t", lit(Timestamp.valueOf("2024-03-01 12:30:45.123456")))
      .withColumn("bin", when(col("id") =!= 2L, col("s").cast("binary")))
      .withColumn("i", col("id").cast("int"))
      .withColumn("f", col("x").cast("float"))
      .withColumn("sh", col("id").cast("short"))
      .withColumn("by", col("id").cast("byte")))
  }

  test("timestamp_ntz roundtrips through a naive Arrow timestamp") {
    roundTrip(Seq(1L, 2L).toDF("id")
      .withColumn("tn", when(col("id") === 1L,
        lit(java.time.LocalDateTime.parse("2024-03-01T12:30:45.123456")))))
  }

  test("ANSI intervals roundtrip through Duration / year-month Interval vectors") {
    roundTrip(Seq(1L, 2L).toDF("id")
      .withColumn("dt", when(col("id") === 1L,
        expr("INTERVAL '1 02:03:04.123456' DAY TO SECOND")))
      .withColumn("dtneg", expr("INTERVAL '-0 00:00:01.5' DAY TO SECOND"))
      .withColumn("ym", when(col("id") === 2L, expr("INTERVAL '1-2' YEAR TO MONTH"))))
  }

  test("nested lists, structs and maps roundtrip incl. null rows and elements") {
    roundTrip(Seq(
      (1L, Seq("alpha", null, "gamma"), ("doc-a", 3, Seq(0.5, 1.5)),
        Seq(Seq(1, 2), Seq(3)), Map("a" -> 1, "b" -> 2)),
      (2L, null.asInstanceOf[Seq[String]],
        null.asInstanceOf[(String, Int, Seq[Double])],
        Seq(Seq.empty[Int]), Map.empty[String, Int]),
      (3L, Seq.empty[String], ("doc-c", 7, null.asInstanceOf[Seq[Double]]),
        null.asInstanceOf[Seq[Seq[Int]]], null.asInstanceOf[Map[String, Int]]))
      .toDF("id", "toks", "meta", "grams", "m"), batch = 2)
  }

  test("embedding arrays survive multi-batch and the imported frame is queryable") {
    val df = Seq(
      (1L, Some(Seq(0.5f, -1.0f, 2.25f))),
      (2L, None),
      (3L, Some(Seq.empty[Float])),
      (4L, Some(Seq(9.0f))))
      .toDF("id", "emb")
    val back = roundTrip(df, batch = 2)
    // first-class relation: aggregates and joins work on the import
    val s = back.selectExpr("sum(aggregate(emb, 0D, (a, x) -> a + x)) AS s")
      .as[Double].head()
    assert(math.abs(s - (0.5 - 1.0 + 2.25 + 9.0)) < 1e-6)
    assert(back.join(df.select(col("id")), "id").count() == 4)
  }

  test("file surface: Table.toArrowFile → Table.fromArrowFile round-trips a query result") {
    val d = graft.queries.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val path = java.nio.file.Files.createTempFile("graft_arrow_imp", ".arrows").toString
    graft.api.Table(d).toArrowFile(path)
    val back = graft.api.Table.fromArrowFile(spark, path)
    assert(back.df.schema.map(_.name) == Seq("lang", "n"))
    assert(back.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("ARROW1 file format round-trips and is auto-sniffed (round 9)") {
    // same nested shapes as the stream tests, through the random-access
    // layout pyarrow.ipc.new_file / feather v2 produces
    val df = Seq(
      (1L, Seq("a", "b"), Map("k" -> 1.5), ("x", 10L)),
      (2L, Seq.empty[String], Map.empty[String, Double], ("y", 20L)),
      (3L, null.asInstanceOf[Seq[String]], null.asInstanceOf[Map[String, Double]],
        null.asInstanceOf[(String, Long)]))
      .toDF("id", "toks", "m", "meta")
    val path = java.nio.file.Files.createTempFile("graft_arrow_ipc", ".arrow").toString
    val n = graft.api.Table(df).toArrowIpcFile(path, maxRecordsPerBatch = 2) // multi-batch
    assert(n == 3)
    // the file leads (and ends) with the ARROW1 magic
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(new String(head.take(6)) == "ARROW1")
    assert(new String(head.takeRight(6)) == "ARROW1")
    // fromArrowFile sniffs the layout — same call as for streams
    val back = graft.api.Table.fromArrowFile(spark, path).df
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().toSeq == df.collect().toSeq)
    // bytes entry point sniffs too
    val back2 = ArrowImport.fromArrowBytes(spark, head)
    assert(back2.collect().toSeq == df.collect().toSeq)
    java.nio.file.Files.delete(java.nio.file.Paths.get(path))
  }

  test("unsupported arrow types fail fast with the column path") {
    // an unsigned-int vector has no Spark mapping — build one directly
    import scala.jdk.CollectionConverters._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    val f = new Field("u", new FieldType(true, new ArrowType.Int(32, false), null),
      java.util.Collections.emptyList[Field]())
    val ex = intercept[UnsupportedOperationException] {
      ArrowImport.sparkSchema(new Schema(Seq(f).asJava))
    }
    assert(ex.getMessage.contains("'u'"))
  }
}
