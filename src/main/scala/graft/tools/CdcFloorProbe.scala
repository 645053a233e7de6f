package graft.tools

import java.nio.file.{Files, Paths}
import java.util.Comparator

import graft.GraftSession
import graft.operators.{CdcParity, Dedup}
import graft.sources.{CdcFormats, LogSource}
import org.apache.spark.sql.functions._

/** Floor analysis for the suite's two slowest queries — kfk04
  * (streaming CDC normalize) and kfk06 (upsert compaction): decompose
  * each into its stages and vary kfk04's admission cap, to decide
  * whether the sf0.1 cost is reducible work or micro-batch/state-store
  * fixed overhead (the it05 driver-floor question, applied to
  * streaming). Findings land in SCALE.md.
  *
  * Usage: runMain graft.tools.CdcFloorProbe [sfDir]
  */
object CdcFloorProbe {
  private def scratch(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), s"graft-floor-$name")
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    p.toString
  }

  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[floor] $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // ———— kfk04: harness write / stream epochs / merge-on-read agg ————
    val ev = CdcParity.debeziumEvents(s, sfDir)
    val nEvents = ev.count() // warm the JSON-encode path too
    println(s"[floor] kfk04 events=$nEvents")
    for (cap <- Seq(1000000000, 200000, 50000)) {
      val base = scratch(s"kfk04-$cap")
      val logDir = s"$base/log"
      t(s"kfk04 harness write (cap=$cap)") {
        LogSource.write(
          CdcParity.debeziumEvents(s, sfDir)
            .withColumn("partition", pmod(col("k"), lit(4)).cast("int"))
            .repartition(4, col("partition"))
            .sortWithinPartitions(col("partition"), col("k"), col("seq"))
            .select(col("partition"), col("json").as("value")),
          logDir)
      }
      val epochs = math.ceil(nEvents.toDouble / cap).toInt
      t(s"kfk04 stream drain (cap=$cap, ~$epochs epochs)") {
        val src = s.readStream.format("graft-log").option("path", logDir)
          .option("maxRecordsPerTrigger", cap.toLong).load()
        val parsed = CdcFormats.debeziumJson(
            src.select(col("offset"), col("value")), col("value"),
            CdcParity.physical).drop("value")
        val kindRank = when(col("__rowkind") === "+I", 0)
          .when(col("__rowkind") === "-U", 1)
          .when(col("__rowkind") === "+U", 2).otherwise(3)
        val versioned = parsed.withColumn("__version",
          col("offset") * 4 + kindRank)
        val norm = graft.streaming.CdcStream.normalize(
          versioned, Seq("o_orderkey"), "__version")
        val prevP = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val q =
          try graft.streaming.CdcStream.upsertSink(
            norm, s"$base/state", s"$base/ckpt").start()
          finally s.conf.set("spark.sql.shuffle.partitions", prevP)
        try q.processAllAvailable() finally q.stop()
      }
      t(s"kfk04 readState agg (cap=$cap)") {
        graft.streaming.CdcStream.readState(
            s, s"$base/state", Seq("o_orderkey"), "__version")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n")).count()
      }
    }

    // ———— kfk06: build+checkpoint / delta writes / compact / read ————
    for (rep <- 1 to 2) {
      val base = scratch(s"kfk06-$rep")
      val versioned = t(s"kfk06 decode + localCheckpoint (rep $rep)") {
        val parsed = CdcFormats.debeziumJson(
          CdcParity.debeziumEvents(s, sfDir), col("json"), CdcParity.physical)
        val kindRank = when(col("__rowkind") === "+I", 0)
          .when(col("__rowkind") === "-U", 1)
          .when(col("__rowkind") === "+U", 2).otherwise(3)
        parsed.withColumn("__version", col("seq").cast("long") * 4 + kindRank)
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), col("__rowkind"), col("__version"))
          .localCheckpoint()
      }
      t(s"kfk06 delta writes 3-scan loop (rep $rep)") {
        for (e <- 1 to 3) {
          Dedup.keepLast(
              versioned.where(col("__version") >= e * 4L &&
                col("__version") < (e + 1) * 4L)
                .filter(col("__rowkind") =!= "-U"),
              Seq(col("o_orderkey")), Seq(col("__version")))
            .write.mode("overwrite")
            .parquet(s"$base/state3/delta=" + f"$e%020d")
        }
      }
      t(s"kfk06 delta writes one-pass partitionBy (rep $rep)") {
        Dedup.keepLast(
            versioned.filter(col("__rowkind") =!= "-U")
              .withColumn("delta", format_string("%020d",
                floor(col("__version") / 4).cast("long"))),
            Seq(col("delta"), col("o_orderkey")), Seq(col("__version")))
          .write.mode("overwrite").partitionBy("delta")
          .parquet(s"$base/state")
      }
      t(s"kfk06 compact (rep $rep)") {
        graft.streaming.CdcStream.compact(
          s, s"$base/state", Seq("o_orderkey"), "__version")
      }
      t(s"kfk06 readState agg (rep $rep)") {
        graft.streaming.CdcStream.readState(
            s, s"$base/state", Seq("o_orderkey"), "__version")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n")).count()
      }
      versioned.unpersist(blocking = true)
    }
    s.stop()
  }
}
