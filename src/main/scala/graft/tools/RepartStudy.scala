package graft.tools

import graft.GraftSession
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B study: shingleCols' pre-explode repartition — round-robin
  * (re-shuffles the exploded token stream for the lead window) vs
  * hash-by-id (docs move once; window + distinct + signature fold run
  * shuffle-free). Times the td03 minhash-LSH path on both layouts in
  * ONE JVM, interleaved, so co-tenant waves hit both arms.
  * Usage: runMain graft.tools.RepartStudy [nDocs] [reps]
  */
object RepartStudy {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 500000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = ScaleProbe.syntheticDocs(spark, n).localCheckpoint()

    def shingleIdx(rr: Boolean): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("pos"))
      val base = docs.select(col("doc_id").as("id"), col("text").as("__text"))
      val parted =
        if (rr) base.repartition(spark.sparkContext.defaultParallelism)
        else base.repartition(col("id"))
      val withLeads = parted
        .select(col("id"), posexplode(split(lower(col("__text")), " "))
          .as(Seq("pos", "w")))
        .select(col("id"), col("w"),
          lead(col("w"), 1).over(w).as("w1"), lead(col("w"), 2).over(w).as("w2"))
      withLeads.where(col("w1").isNotNull && col("w2").isNotNull)
        .select(col("id"),
          xxhash64(concat_ws(" ", col("w"), col("w1"), col("w2"))).as("sh"))
        .distinct()
    }

    for (r <- 1 to reps; rr <- Seq(true, false)) {
      val t0 = System.nanoTime()
      val out = TextOps.minhashLshPairsIdx(shingleIdx(rr), 0.8).count()
      println(f"[study] rep=$r rr=$rr%-5s pairs=$out  ${(System.nanoTime() - t0) / 1e9}%7.1f s")
    }
    spark.stop()
  }
}
