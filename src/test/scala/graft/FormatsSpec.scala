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

  test("compressed sinks round-trip (flink-compress parity)") {
    // the reference's flink-compress wraps bulk writers in a codec;
    // Spark's writers take the codec as an option
    src.write.mode("overwrite").option("compression", "gzip")
      .option("header", "true").csv(s"$dir/csvgz")
    assert(new java.io.File(s"$dir/csvgz").listFiles()
      .exists(_.getName.endsWith(".csv.gz")))
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/csvgz")
    assert(back.count() == src.count())
    src.write.mode("overwrite").option("compression", "deflate")
      .json(s"$dir/jsondef")
    assert(spark.read.json(s"$dir/jsondef").count() == src.count())
  }

  test("sequence-file round-trip (flink-sequence-file parity)") {
    // the reference's SequenceFileWriterFactory writes (key, value)
    // Writables; Spark covers the format through the Hadoop RDD API
    import org.apache.hadoop.io.{LongWritable, Text}
    val path = s"$dir/seq"
    val rows = src.select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].rdd
      .map { case (k, v) => (new LongWritable(k), new Text(v)) }
    rows.saveAsNewAPIHadoopFile[
      org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat[
        LongWritable, Text]](path)
    val back = spark.sparkContext
      .sequenceFile[LongWritable, Text](path)
      .map { case (k, v) => (k.get(), v.toString) }
      .toDF("n_nationkey", "n_name")
    val exp = src.select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].collect().toSet
    assert(back.as[(Long, String)].collect().toSet == exp)
  }

  test("overwrite mode replaces prior output") {
    val p = s"$dir/ow"
    spark.range(10).write.mode("overwrite").parquet(p)
    spark.range(3).write.mode("overwrite").parquet(p)
    assert(spark.read.parquet(p).count() == 3)
  }
}
