package graft

import graft.sources.AvroFormat
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tests for the engine's Avro container format (DSv2
  * reader + Hadoop-FS writer on the Avro core API) — the reference's
  * flink-avro format parity.
  */
class AvroFormatSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-avro").toString

  test("write/read round-trip preserves values, nulls, and schema") {
    val dir = tmp()
    val df = Seq(
      (1L, Some("alpha"), 1.5, true, Some(java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456"))),
      (2L, None, -2.25, false, None),
      (3L, Some("gamma"), 0.0, true, Some(java.sql.Timestamp.valueOf("1999-12-31 23:59:59.0")))
    ).toDF("id", "name", "score", "flag", "ts")
    AvroFormat.write(df, dir)

    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema("id").dataType.typeName == "long")
    assert(back.schema("name").dataType.typeName == "string")
    assert(back.schema("ts").dataType.typeName == "timestamp")
    val got = back.select("id", "name", "score", "flag", "ts")
      .as[(Long, Option[String], Double, Boolean, Option[java.sql.Timestamp])]
      .collect().toSet
    assert(got == df.as[(Long, Option[String], Double, Boolean, Option[java.sql.Timestamp])]
      .collect().toSet)
  }

  test("binary and date columns round-trip; reader parallelizes per file") {
    val dir = tmp()
    val df = spark.range(100)
      .select(col("id"),
        encode(concat(lit("payload-"), col("id")), "UTF-8").as("payload"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")), col("id").cast("int")).as("d"))
      .repartition(4)
    AvroFormat.write(df, dir)
    // one container file per non-empty partition
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length > 1)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.rdd.getNumPartitions == files.length)
    assert(back.count() == 100)
    val one = back.where(col("id") === 42)
      .select(decode(col("payload"), "UTF-8"), col("d")).as[(String, java.sql.Date)].head()
    assert(one == ("payload-42", java.sql.Date.valueOf("2020-02-12")))
  }

  test("re-write with fewer partitions leaves no stale part files; staging cleaned") {
    val dir = tmp()
    AvroFormat.write(spark.range(100).select(col("id")).repartition(8), dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 8)
    // second write with fewer partitions must REPLACE the directory
    // contents — a naive per-partition overwrite would leave parts
    // 2..7 from the first write and the reader would double-count
    AvroFormat.write(spark.range(10).select(col("id")).repartition(2), dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.count(_.getName.endsWith(".avro")) == 2)
    // no staging/attempt residue after job commit
    assert(!files.exists(_.getName.startsWith("_")))
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.count() == 10)
    assert(back.agg(sum(col("id"))).as[Long].head() == 45L)
  }

  test("engine queries run over the avro table; DDL connector binds it") {
    val dir = tmp()
    AvroFormat.write(
      Tables.load(spark, "/root/testdata/sf0.001", "nation"), dir)
    val env = GraftTableEnvironment.create(spark)
    env.executeSql(s"""
      CREATE TABLE nation_avro (
        n_nationkey INT,
        n_name STRING,
        n_regionkey INT,
        PRIMARY KEY (n_nationkey) NOT ENFORCED
      ) WITH ('connector' = 'filesystem', 'path' = '$dir', 'format' = 'avro')""")
    val got = env.sqlQuery(
      "SELECT count(1) AS n, min(n_name) AS first FROM nation_avro")
      .as[(Long, String)].head()
    assert(got._1 == 25 && got._2 == "NATION_0")
    env.executeSql("DROP TABLE nation_avro")
  }
}
