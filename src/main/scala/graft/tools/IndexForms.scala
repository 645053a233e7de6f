package graft.tools

import graft.GraftSession
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off A/B: window-lead shingle index (current `shingleHashIndex`,
  * two shuffles — round-robin text + word-level window by id) vs the
  * array-lambda form (one text-level shuffle, interpreted per-row
  * n-gram lambda). Measures index build + one downstream consumer
  * (distinct count) at probe scales, to decide which form the at-scale
  * pipelines should use.
  * Usage: runMain graft.tools.IndexForms <nDocs>
  */
object IndexForms {
  def arrayFormIndex(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    docs.select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(parallelism)
      .select(col("id"), explode(TextOps.wordNgrams(
        TextOps.words(col("__text")), n)).as("shs"))
      .select(col("id"), xxhash64(col("shs")).as("sh"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 500000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = ScaleProbe.syntheticDocs(spark, nDocs).localCheckpoint()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"| $tag | $nDocs | $out | ${(System.nanoTime() - t0) / 1e9}%.1f |")
    }
    // warmup scan
    docs.count()
    time("window-lead index") {
      TextOps.shingleHashIndex(docs, "doc_id", "text", 3).count()
    }
    time("array-lambda index") {
      arrayFormIndex(docs, "doc_id", "text", 3).count()
    }
    time("window-lead index (2nd)") {
      TextOps.shingleHashIndex(docs, "doc_id", "text", 3).count()
    }
    time("array-lambda index (2nd)") {
      arrayFormIndex(docs, "doc_id", "text", 3).count()
    }
    spark.stop()
  }
}
