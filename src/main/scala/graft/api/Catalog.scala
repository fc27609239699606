package graft.api

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Catalog-management verbs over the Spark session catalog — the
  * reference backend's `create_table` / `create_view` / `list_tables` /
  * `drop_table` / `rename_table` / database surface
  * (`ibis/backends/pyspark/__init__.py:380,512,552,621,701,740` and the
  * base-backend drop verbs). Spark-first: persistent tables go through
  * `DataFrameWriter.saveAsTable` (so format/partitioning/bucketing ride
  * the normal write path and the table is immediately queryable by name
  * from SQL and [[Table.parseSql]]); views are session temp views, the
  * reference's `create_view` semantics (`kind="TEMPORARY VIEW"`).
  *
  * Scale: every verb here is metadata-only except `createTable(obj)`,
  * which is one distributed write of the source plan — identical cost to
  * writing the same data as parquet. Nothing collects rows. */
object Catalog {

  private def q(name: String): String = "`" + name.replace("`", "``") + "`"
  private def qualified(name: String, database: Option[String]): String =
    database.fold(q(name))(db => s"${q(db)}.${q(name)}")

  /** Reference `_filter_with_like`: a regex searched against each name,
    * results sorted. */
  private def filterLike(names: Seq[String], like: Option[String]): Seq[String] =
    like.fold(names.sorted) { pat =>
      val r = pat.r
      names.filter(n => r.findFirstIn(n).isDefined).sorted
    }

  /** create_table from a table expression (reference :621): one
    * distributed write via saveAsTable. `overwrite=false` errors when the
    * table exists (reference mode="error"). Returns the created table
    * read back by name. */
  def createTable(name: String, obj: Table,
      database: Option[String] = None,
      overwrite: Boolean = false,
      format: String = "parquet",
      partitionBy: Seq[String] = Seq.empty): Table = {
    val w = obj.df.write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(qualified(name, database))
    table(obj.spark, name, database)
  }

  /** create_table from a schema only (reference :693,
    * `catalog.createTable`): an empty managed table. */
  def createEmptyTable(spark: SparkSession, name: String, schema: StructType,
      database: Option[String] = None,
      format: String = "parquet"): Table = {
    spark.catalog.createTable(qualified(name, database), format, schema,
      Map.empty[String, String])
    table(spark, name, database)
  }

  /** create_view (reference :701): a session TEMPORARY view over the
    * expression — `overwrite` maps to CREATE OR REPLACE. */
  def createView(name: String, obj: Table, overwrite: Boolean = false): Table = {
    if (overwrite) obj.df.createOrReplaceTempView(name)
    else obj.df.createTempView(name) // throws if it exists, reference parity
    table(obj.spark, name, None)
  }

  /** list_tables (reference :387): table + temp-view names in the
    * database (current when None), `like` a regex filter. */
  def listTables(spark: SparkSession, database: Option[String] = None,
      like: Option[String] = None): Seq[String] = {
    val names = database.fold(spark.catalog.listTables())(spark.catalog.listTables(_))
      .collect().toSeq.map(_.name)
    filterLike(names, like)
  }

  /** list_databases (reference :380). */
  def listDatabases(spark: SparkSession, like: Option[String] = None): Seq[String] =
    filterLike(spark.catalog.listDatabases().collect().toSeq.map(_.name), like)

  /** create_database (reference :512); `path` sets LOCATION, `force` →
    * IF NOT EXISTS. */
  def createDatabase(spark: SparkSession, name: String,
      path: Option[String] = None, force: Boolean = false): Unit = {
    val ifNot = if (force) "IF NOT EXISTS " else ""
    val loc = path.fold("")(p => s" LOCATION '${p.replace("'", "''")}'")
    spark.sql(s"CREATE DATABASE $ifNot${q(name)}$loc")
  }

  /** drop_database (reference :552); `force` → IF EXISTS + CASCADE. */
  def dropDatabase(spark: SparkSession, name: String, force: Boolean = false): Unit = {
    val ifEx = if (force) "IF EXISTS " else ""
    val cascade = if (force) " CASCADE" else ""
    spark.sql(s"DROP DATABASE $ifEx${q(name)}$cascade")
  }

  /** drop_table (base-backend verb): `force` → IF EXISTS. */
  def dropTable(spark: SparkSession, name: String,
      database: Option[String] = None, force: Boolean = false): Unit =
    spark.sql(s"DROP TABLE ${if (force) "IF EXISTS " else ""}${qualified(name, database)}")

  /** drop_view for temp views created by [[createView]]. */
  def dropView(spark: SparkSession, name: String): Unit =
    spark.catalog.dropTempView(name)

  /** rename_table (reference :740): ALTER TABLE … RENAME TO. */
  def renameTable(spark: SparkSession, oldName: String, newName: String): Unit =
    spark.sql(s"ALTER TABLE ${q(oldName)} RENAME TO ${q(newName)}")

  /** table-by-name → a composable [[Table]] (reference `con.table`). */
  def table(spark: SparkSession, name: String,
      database: Option[String] = None): Table =
    new Table(spark.table(qualified(name, database)))

  /** get_schema (reference :578). */
  def getSchema(spark: SparkSession, name: String,
      database: Option[String] = None): StructType =
    spark.table(qualified(name, database)).schema

  /** compute_stats (reference :760): ANALYZE TABLE … COMPUTE STATISTICS
    * [NOSCAN] — feeds Catalyst's cost-based sizing (join strategy,
    * broadcast decisions) for catalog tables. */
  def computeStats(spark: SparkSession, name: String,
      database: Option[String] = None, noscan: Boolean = false): Unit =
    spark.sql(s"ANALYZE TABLE ${qualified(name, database)} COMPUTE STATISTICS" +
      (if (noscan) " NOSCAN" else ""))

  private val cached =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  /** The reference's `_create_cached_table` (:785 — the `expr.cache()`
    * role): materialize the expression in executor memory/disk and expose
    * it as a named temp view; the frame is tracked so [[uncacheTable]]
    * releases the memory on demand instead of at session end. */
  def cacheTable(name: String, obj: Table): Table = {
    val t = obj.df.cache()
    t.createOrReplaceTempView(name)
    // re-caching a name must release the PREVIOUS frame's blocks, or they
    // stay pinned until session end — but Spark's CacheManager keys
    // entries by CANONICALIZED PLAN, so unpersist is GLOBAL per plan: skip
    // it when the displaced frame shares an entry with the new one
    // (sameSemantics = same entry — unpersisting would evict the cache we
    // just created) or with a frame still cached under ANOTHER name
    // (unpersisting would pull the blocks out from under that name too)
    Option(cached.put(name, t))
      .filter(prev => (prev ne t) && !prev.sameSemantics(t))
      .filterNot(prev => stillBacked(prev))
      .foreach(_.unpersist())
    table(obj.spark, name, None)
  }

  /** Is some OTHER cached name still semantically backed by `frame`'s
    * CacheManager entry? */
  private def stillBacked(frame: org.apache.spark.sql.DataFrame): Boolean = {
    val it = cached.values.iterator()
    var hit = false
    while (it.hasNext && !hit) hit = it.next().sameSemantics(frame)
    hit
  }

  /** The reference's `_drop_cached_table`: drop the view and unpersist
    * the tracked frame — unless another cached name still shares its
    * CacheManager entry. */
  def uncacheTable(spark: SparkSession, name: String): Unit = {
    spark.catalog.dropTempView(name)
    Option(cached.remove(name)).filterNot(stillBacked).foreach(_.unpersist())
  }
}
