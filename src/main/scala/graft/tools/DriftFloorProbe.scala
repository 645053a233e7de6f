package graft.tools

import graft.GraftSession
import graft.operators.DriftOps
import org.apache.spark.sql.functions._

/** Attribution of td57's 100× ScaleProbe step (r14 verdict #6: 1.7 s
  * at 10× → 8.2 s at 100×, the only non-flat drift row — expected
  * scan-bound). Times, at each scale: the bare corpus pass (words
  * explode + stopword filter, no drift arithmetic), the one-side
  * bucket-count frame ([[DriftOps.corpusFeatureCounts]] — scan +
  * map-side bucketing + partial agg to features×buckets), and the
  * full two-side [[DriftOps.corpusDrift]]. If the three track each
  * other, the step is the corpus scan (linear by design); any gap
  * between (b) and (c) would mean an exchange crept above the bucket
  * aggregate. Usage:
  *   runMain graft.tools.DriftFloorProbe [docBase] [scales]
  */
object DriftFloorProbe {
  def main(args: Array[String]): Unit = {
    val docBase = if (args.length > 0) args(0).toLong else 5000L
    val scales = (if (args.length > 1) args(1) else "10,100")
      .split(",").map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String, k: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"| td57-floor $name | ${k}x | $out%d | ${(System.nanoTime() - t0) / 1e9}%.1f |")
    }
    println("| probe | scale | rows out | sec |")
    println("|---|---|---|---|")
    for (k <- scales; _ <- 1 to 2) {
      val docs = ScaleProbe.syntheticDocs(spark, docBase * k)
        .withColumn("lang", concat(lit("l"), pmod(col("doc_id"), lit(5))))
      val stop = Seq("the", "a", "of", "and", "to")
      t("scan+explode only", k) {
        docs.select(explode(graft.operators.TextOps.words(col("text")))
          .as("w")).where(col("w").isin(stop: _*)).count()
      }
      t("one-side bucket counts", k) {
        DriftOps.corpusFeatureCounts(docs, "doc_id", "text", "lang").count()
      }
      t("full corpusDrift", k) {
        DriftOps.corpusDrift(docs, "doc_id", "text", "lang",
          col("doc_id") % 2 === 1).count()
      }
    }
  }
}
