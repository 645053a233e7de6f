package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Floor decomposition of td56 (the suite's most expensive query
  * after round 14): times each stage of the incremental curation
  * pipeline separately at sf0.1 — log seeding, each of the three
  * epoch updates, and the merge-on-read manifest — plus the batch
  * td46 run for reference, so the bench reading can be attributed to
  * stages instead of argued about. Usage:
  *   runMain graft.tools.CurationFloorProbe [sfDir] [reps]
  */
object CurationFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cur-floor] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"[cur-floor] --- rep $rep ---")
      val base = java.nio.file.Files
        .createTempDirectory("graft-cur-floor").toString
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val n = docs.count()
      t("seed log (JSON encode)") {
        graft.sources.LogSource.write(
          docs.withColumn("partition", lit(0))
            .repartition(1).sortWithinPartitions(col("doc_id"))
            .select(col("partition"),
              to_json(struct(col("doc_id"), col("text"), col("lang")))
                .as("value")),
          s"$base/log")
      }
      // epochs driven directly (no stream harness) to isolate the
      // engine work from trigger/offset-log latency
      val bounds = (0 to 3).map(i => i * n / 3)
      for (e <- 0 until 3) {
        t(s"epoch $e (${bounds(e + 1) - bounds(e)} docs)") {
          graft.streaming.IncrementalCuration.processEpoch(e.toLong,
            docs.orderBy("doc_id")
              .limit(bounds(e + 1).toInt).offset(bounds(e).toInt),
            s"$base/st", "doc_id", "text", "lang")
        }
      }
      t("manifest (merge-on-read)") {
        graft.streaming.IncrementalCuration.manifest(spark, s"$base/st").count()
      }
      t("td46 batch reference") {
        graft.operators.CurationOps.curationManifest(
          Tables.load(spark, dir, "documents"), "doc_id", "text", "lang").count()
      }
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
