package graft

import graft.functions.FlinkFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** TableEnvironment-like façade over SparkSession — the user entry point
  * matching the reference's surface (TableEnvironmentImpl.sqlQuery at
  * flink-table-api-java .../internal/TableEnvironmentImpl.java:715,
  * executeSql at :735; SURVEY.md §3.1, §7.1).
  *
  * Per the survey's architecture stance, ~90% of the work delegates to
  * Spark SQL/Catalyst; the façade owns only what Spark has no DDL slot
  * for: per-table watermark declarations (applied when a table is read
  * in a streaming context), primary-key metadata (drives upsert/dedup
  * behavior), and registration of the engine's gap functions.
  */
class GraftTableEnvironment private (val spark: SparkSession) {
  private val watermarkDecl = mutable.Map[String, (String, String)]()
  private val primaryKeys = mutable.Map[String, Seq[String]]()

  /** DQL/DML/DDL passthrough to Spark SQL (gap functions registered). */
  def executeSql(sql: String): DataFrame = spark.sql(sql)

  /** Query returning a Table (reference Table == DataFrame here). */
  def sqlQuery(sql: String): DataFrame = spark.sql(sql)

  /** Register a table, optionally with a watermark declaration
    * (CREATE TABLE ... WATERMARK FOR ts AS ts - INTERVAL d) and
    * primary key metadata.
    */
  def createTemporaryView(name: String, df: DataFrame,
                          watermark: Option[(String, String)] = None,
                          primaryKey: Seq[String] = Nil): Unit = {
    df.createOrReplaceTempView(name)
    watermark.foreach(w => watermarkDecl(name) = w)
    if (primaryKey.nonEmpty) primaryKeys(name) = primaryKey
  }

  /** Batch read of a registered table. */
  def from(name: String): DataFrame = spark.table(name)

  /** Read a registered table applying its declared watermark — use on
    * streaming DataFrames (readStream/MemoryStream) registered as views;
    * on batch frames the watermark node is a no-op, matching the
    * reference where watermarks only matter in streaming mode.
    */
  def fromWithWatermark(name: String): DataFrame = {
    val df = spark.table(name)
    watermarkDecl.get(name) match {
      case Some((tsCol, delay)) => df.withWatermark(tsCol, delay)
      case None                 => df
    }
  }

  def declaredWatermark(name: String): Option[(String, String)] =
    watermarkDecl.get(name)

  def primaryKey(name: String): Seq[String] =
    primaryKeys.getOrElse(name, Nil)

  /** Register the driver testdata tables as views. */
  def registerTestTables(dir: String): Unit = {
    Tables.registerAll(spark, dir)
    // events is the stream table (FIXTURES.md): declare its watermark.
    watermarkDecl.getOrElseUpdate("events", ("ts", "10 minutes"))
  }
}

object GraftTableEnvironment {
  def create(spark: SparkSession): GraftTableEnvironment = {
    FlinkFunctions.registerAll(spark)
    new GraftTableEnvironment(spark)
  }
}
