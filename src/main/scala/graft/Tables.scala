package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md / FIXTURES.md §A).
  * All queries take the sf directory as a runtime parameter so the same plan
  * runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.parquet has stored ts as TIMESTAMP(NANOS) in some testdata
    * generations (readable only via spark.sql.legacy.parquet.nanosAsLong,
    * set in GraftSession — truncated to micros exactly like DuckDB
    * truncates when reading the same file) and TIMESTAMP(MICROS) in
    * others (read natively as NTZ). Normalize BY THE TYPE SPARK READ,
    * not by assumption, so every query sees one canonical
    * session-TZ=UTC timestamp whichever file generation is on disk.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }

  /** Register every table as a temp view (for spark.sql-based entries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
