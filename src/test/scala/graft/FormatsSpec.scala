package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink format parity (SURVEY §2.1: CSV/JSON/Parquet formats,
  * partitioned filesystem sink, overwrite ability).
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("graft-fmt").toString
  private lazy val src = Tables.load(spark, "/root/testdata/sf0.001", "nation")

  test("csv round-trip with header preserves rows") {
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/csv")
    assert(back.count() == src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
  }

  test("json round-trip preserves values") {
    src.write.mode("overwrite").json(s"$dir/json")
    val back = spark.read.json(s"$dir/json")
    val a = src.orderBy("n_nationkey").select("n_name").as[String].collect().toSeq
    val b = back.orderBy("n_nationkey").select("n_name").as[String].collect().toSeq
    assert(a == b)
  }

  test("orc round-trip preserves values") {
    src.write.mode("overwrite").orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    val a = src.orderBy("n_nationkey").select("n_name").as[String].collect().toSeq
    val b = back.orderBy("n_nationkey").select("n_name").as[String].collect().toSeq
    assert(a == b)
  }

  test("text source reads lines, text sink writes them") {
    src.select(col("n_name")).write.mode("overwrite").text(s"$dir/txt")
    val back = spark.read.text(s"$dir/txt")
    assert(back.as[String].collect().sorted.toSeq ==
      src.select("n_name").as[String].collect().sorted.toSeq)
  }

  test("partitioned parquet sink prunes partitions on read") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(s"$dir/part")
    val one = spark.read.parquet(s"$dir/part")
      .filter(col("day") === "2024-01-05")
    // partition pruning visible in the plan
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(scan.contains("PartitionFilters") || !scan.contains("day#"))
  }

  test("overwrite mode replaces prior output") {
    val p = s"$dir/ow"
    spark.range(10).write.mode("overwrite").parquet(p)
    spark.range(3).write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).count() == 3)
  }
}
