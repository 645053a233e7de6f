package graft.tools

import graft.{GraftSession, Tables}

/** Debug helper: print Spark-inferred schemas of the testdata tables. */
object PrintSchemas {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach { n =>
      println(s"== $n")
      Tables.load(spark, dir, n).printSchema()
    }
    spark.stop()
  }
}
