package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify/Bench/tests agree.
  *
  * Scale notes: shuffle partitions default to the local core count here,
  * but on a real cluster this is the knob to set to ~2-3x total cores;
  * AQE coalesces the excess. All engine behavior must flow from the
  * session + query plans — no driver-side state.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // Flink-dialect gap functions + the range-join optimizer rule
      // ride in via SparkSessionExtensions, so spark.sql("...
      // split_index(...) ...") and auto-binned BETWEEN joins work out
      // of the box.
      .withExtensions(graft.plans.GraftExtensions.injectAll)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as long then convert.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft-warehouse-${sys.props.getOrElse("user.name", "u")}")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 4): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
