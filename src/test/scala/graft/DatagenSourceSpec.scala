package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 datagen source (SURVEY §2.1 unified-source parity: the DSv2
  * Batch/InputPartition/PartitionReader trio standing in for the
  * reference's FLIP-27 SplitEnumerator/SourceSplit/SourceReader, one
  * Scan serving batch and micro-batch).
  */
class DatagenSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("s", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  test("batch read: bounded, partitioned, deterministic") {
    val df = spark.read.format("graft-datagen").schema(sch)
      .option("numRows", 1000).option("partitions", 8).load()
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    assert(df.select(countDistinct(col("id"))).as[Long].head() == 1000)
    // values are a pure function of (id, column): re-read identical
    val again = spark.read.format("graft-datagen").schema(sch)
      .option("numRows", 1000).option("partitions", 3).load()
    assert(df.orderBy("id").collect().sameElements(again.orderBy("id").collect()))
  }

  test("default schema when none declared") {
    val df = spark.read.format("graft-datagen").option("numRows", 10).load()
    assert(df.columns.toSeq == Seq("id", "v", "s", "ts"))
    assert(df.count() == 10)
  }

  test("micro-batch streaming read reaches maxRows and matches batch rows") {
    val q = spark.readStream.format("graft-datagen").schema(sch)
      .option("rowsPerBatch", 100).option("maxRows", 350)
      .load()
      .writeStream.format("memory").queryName("dg").outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dg")
    assert(streamed.count() == 350)
    val batch = spark.read.format("graft-datagen").schema(sch)
      .option("numRows", 350).load()
    // same row range through the streaming path = identical rows
    assert(streamed.orderBy("id").collect()
      .sameElements(batch.orderBy("id").collect()))
  }

  test("source composes with engine operators (windowed agg over datagen)") {
    val df = spark.read.format("graft-datagen").schema(sch)
      .option("numRows", 3600).load()
    val agg = df.groupBy(window(col("ts"), "10 minutes")).count()
      .orderBy(col("window.start"))
    // ts = epoch2000 + id seconds → 3600 rows = 6 full 10-min windows
    assert(agg.as[((java.sql.Timestamp, java.sql.Timestamp), Long)].collect()
      .map(_._2).toSeq == Seq.fill(6)(600L))
  }
}
