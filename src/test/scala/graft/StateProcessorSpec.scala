package graft

import graft.streaming.StateProcessor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State Processor API parity (reference
  * flink-libraries/flink-state-processing-api): a checkpoint written
  * by a stateful query is readable OFFLINE as batch frames — operator
  * metadata and per-key state — without restarting the query.
  */
class StateProcessorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("keyed aggregation state reads back offline from the checkpoint") {
    val in = MemoryStream[(String, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sp").toString
    val counts = in.toDS().toDF("k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val q = counts.writeStream.format("memory").queryName("sp_counts")
      .option("checkpointLocation", ckpt).outputMode("complete").start()
    in.addData(("a", 1L), ("a", 2L), ("b", 10L))
    q.processAllAvailable()
    in.addData(("a", 3L), ("c", 7L))
    q.processAllAvailable()
    q.stop()

    // Operator enumeration — SavepointReader's metadata surface.
    val meta = StateProcessor.stateMetadata(spark, ckpt)
    val ops = meta.select("operatorName").as[String].collect().toSet
    assert(ops.contains("stateStoreSave"))

    // Keyed state as a batch frame: one row per key, carrying the
    // aggregation buffer (count, sum) exactly as the operator holds it.
    val state = StateProcessor.readKeyedState(spark, ckpt)
    val byKey = state
      .select(col("key").getField("k").as("k"),
        col("value").getField("count").as("n"),
        col("value").getField("sum").as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byKey == Map("a" -> ((3L, 6L)), "b" -> ((1L, 10L)), "c" -> ((1L, 7L))))

    // Time travel: batchId 0 sees only the first micro-batch's state.
    val state0 = StateProcessor.readKeyedState(spark, ckpt, batchId = Some(0L))
    val byKey0 = state0
      .select(col("key").getField("k").as("k"),
        col("value").getField("count").as("n"))
      .as[(String, Long)].collect().toMap
    assert(byKey0 == Map("a" -> 2L, "b" -> 1L))
  }
}
