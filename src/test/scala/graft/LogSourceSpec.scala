package graft

import java.nio.file.Files

import graft.sources.LogSource
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Drives the graft-log partitioned-log source end-to-end: batch scan,
  * segment-rolled offsets, admission-controlled micro-batches, and the
  * Kafka-shaped exactly-once contract — kill a query MID-SEGMENT (an
  * offset strictly inside a segment file committed, the rest not) and
  * restart from the checkpoint with no loss and no duplicates.
  */
class LogSourceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("batch read returns every record with per-segment offsets") {
    val dir = tmp("graft-log")
    LogSource.append(dir, 0, Seq("a0", "a1", "a2"))
    LogSource.append(dir, 0, Seq("a3", "a4")) // segment roll at offset 3
    LogSource.append(dir, 1, Seq("b0"))
    val got = spark.read.format("graft-log").option("path", dir).load()
      .as[(Int, Long, String)].collect().toSet
    assert(got == Set((0, 0L, "a0"), (0, 1L, "a1"), (0, 2L, "a2"),
      (0, 3L, "a3"), (0, 4L, "a4"), (1, 0L, "b0")))
  }

  test("batch read plans one split per log partition") {
    val dir = tmp("graft-log")
    LogSource.append(dir, 0, Seq("x"))
    LogSource.append(dir, 1, Seq("y"))
    LogSource.append(dir, 2, Seq("z"))
    val df = spark.read.format("graft-log").option("path", dir).load()
    assert(df.rdd.getNumPartitions == 3)
  }

  test("offset json round-trips") {
    val m = Map(0 -> 12L, 3 -> 40L, 11 -> 7L)
    assert(LogSource.offsetsFromJson(LogSource.offsetsToJson(m)) == m)
    assert(LogSource.offsetsToJson(m) == """{"0":12,"3":40,"11":7}""")
  }

  test("streaming honors maxRecordsPerTrigger and drains completely") {
    val dir = tmp("graft-log")
    LogSource.append(dir, 0, (0 until 7).map(i => s"a$i"))
    LogSource.append(dir, 1, (0 until 3).map(i => s"b$i"))
    val q = spark.readStream.format("graft-log").option("path", dir)
      .option("maxRecordsPerTrigger", 4).load()
      .writeStream.format("memory").queryName("logadm")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("logadm").as[(Int, Long, String)].collect()
    assert(got.length == 10)
    assert(got.toSet.map((r: (Int, Long, String)) => (r._1, r._2)) ==
      (0 until 7).map((0, _)).toSet ++ (0 until 3).map((1, _)).toSet)
    // Admission really batched: > 2 batches for 10 rows at 4/trigger.
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
  }

  test("startup modes: latest skips history, specific-offsets starts mid-partition") {
    val dir = tmp("graft-log-start")
    LogSource.append(dir, 0, Seq("a0", "a1", "a2"))
    LogSource.append(dir, 1, Seq("b0", "b1"))
    // latest-offset: a fresh query sees ONLY post-start appends.
    val qLatest = spark.readStream.format("graft-log").option("path", dir)
      .option("startupMode", "latest").load()
      .writeStream.format("memory").queryName("start_latest")
      .outputMode("append").start()
    qLatest.processAllAvailable()
    LogSource.append(dir, 0, Seq("a3"))
    qLatest.processAllAvailable(); qLatest.stop()
    assert(spark.table("start_latest").as[(Int, Long, String)].collect().toSet ==
      Set((0, 3L, "a3")))
    // specific-offsets (Flink option syntax): partition 0 from offset 2,
    // partition 1 unlisted -> earliest.
    assert(LogSource.parseSpecificOffsets(
      "partition:0,offset:42;partition:1,offset:300") == Map(0 -> 42L, 1 -> 300L))
    val qSpec = spark.readStream.format("graft-log").option("path", dir)
      .option("startupMode", "specific")
      .option("specificOffsets", "partition:0,offset:2").load()
      .writeStream.format("memory").queryName("start_specific")
      .outputMode("append").start()
    qSpec.processAllAvailable(); qSpec.stop()
    assert(spark.table("start_specific").as[(Int, Long, String)].collect().toSet ==
      Set((0, 2L, "a2"), (0, 3L, "a3"), (1, 0L, "b0"), (1, 1L, "b1")))
  }

  test("batch write assigns contiguous offsets at commit; appends continue them") {
    val dir = tmp("graft-log-w")
    val df1 = Seq((0, "a0"), (0, "a1"), (1, "b0")).toDF("partition", "value")
    LogSource.write(df1.repartition(2, col("partition"))
      .sortWithinPartitions(col("partition"), col("value")), dir)
    val df2 = Seq((0, "a2"), (2, "c0")).toDF("partition", "value")
    LogSource.write(df2.repartition(2, col("partition"))
      .sortWithinPartitions(col("partition"), col("value")), dir)
    val got = spark.read.format("graft-log").option("path", dir).load()
      .as[(Int, Long, String)].collect().toSet
    assert(got == Set((0, 0L, "a0"), (0, 1L, "a1"), (0, 2L, "a2"),
      (1, 0L, "b0"), (2, 0L, "c0")))
  }

  test("streamSink appends each batch exactly once across a restart") {
    val srcDir = tmp("graft-log-src")
    val dstDir = tmp("graft-log-dst")
    val ckpt = tmp("graft-log-sck")
    LogSource.append(srcDir, 0, Seq("x0", "x1"))
    def start() = LogSource.streamSink(
      spark.readStream.format("graft-log").option("path", srcDir).load()
        .select(col("partition"), col("value")),
      dstDir, ckpt).start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    LogSource.append(srcDir, 0, Seq("x2"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.format("graft-log").option("path", dstDir).load()
      .as[(Int, Long, String)].collect().toSet
    assert(got == Set((0, 0L, "x0"), (0, 1L, "x1"), (0, 2L, "x2")))
    // The idempotence markers exist — a replayed epoch would skip.
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dstDir))
      .iterator().asScala.exists(_.getFileName.toString.startsWith("_batch-")))
  }

  test("exactly-once: crash mid-segment, restart resumes with no loss/dup") {
    val dir = tmp("graft-log")
    val ckpt = tmp("graft-log-ck")
    val out = tmp("graft-log-out")
    // One 5-record segment; admission 2/trigger, so epoch 0 commits
    // offsets [0,2) — strictly inside the segment file. A crash is
    // injected BEFORE epoch 1 writes (the sink raises), leaving the
    // checkpoint mid-segment: the restart must seek INTO the segment.
    LogSource.append(dir, 0, (0 until 5).map(i => s"a$i"))
    def start(failAtEpoch: Option[Long], availableNow: Boolean) = {
      val w = spark.readStream.format("graft-log").option("path", dir)
        .option("maxRecordsPerTrigger", 2).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, epoch: Long) =>
          if (failAtEpoch.contains(epoch)) sys.error("injected crash")
          val d = java.nio.file.Paths.get(out, f"epoch=$epoch%020d")
          if (!Files.exists(d)) b.write.parquet(d.toString)
          ()
        }
      (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    val q1 = start(Some(1L), availableNow = true)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    val afterKill = spark.read.parquet(out + "/epoch=*").count()
    assert(afterKill == 2, s"one admission-capped epoch, got $afterKill")
    // Data arrives while the query is down: a mid-stream append to the
    // live partition AND a brand-new partition (Kafka partition
    // discovery).
    LogSource.append(dir, 0, Seq("a5"))
    LogSource.append(dir, 1, Seq("b0", "b1"))
    val q2 = start(None, availableNow = false)
    q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(out + "/epoch=*")
      .as[(Int, Long, String)].collect()
    assert(got.length == got.toSet.size, "no duplicates across epochs")
    assert(got.toSet == (0 until 6).map(i => (0, i.toLong, s"a$i")).toSet ++
      Set((1, 0L, "b0"), (1, 1L, "b1")))
  }
}
