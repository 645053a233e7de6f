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

  /** events.parquet stores ts as TIMESTAMP(NANOS) which Spark cannot read
    * natively; sessions must set spark.sql.legacy.parquet.nanosAsLong=true
    * (see GraftSession). We truncate nanos → micros exactly like DuckDB
    * does when it reads the same file, so oracle comparisons line up.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql-based entries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
