package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write one Arrow IPC stream file from a query result — the smoke any
  * pyarrow/polars/duckdb client can open (`pyarrow.ipc.open_stream`). */
object ArrowDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val out = docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("embedding"))
      .orderBy("doc_id").limit(100)
    val n = graft.interop.ArrowExport.toArrowFile(out, args(1))
    println(s"[arrow] wrote $n rows to ${args(1)}")
    spark.stop()
  }
}
