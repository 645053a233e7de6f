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
      // Generated-class cache (STATIC conf, default 100 entries): an
      // engine session re-runs whole query families — every streaming
      // epoch re-plans the same shapes, and any benchmark/regression
      // harness repeats each query — so at 100 entries the Janino
      // cache thrashes and identical WholeStageCodegen units are
      // recompiled (~20-100 ms each) on every repetition. 5000 entries
      // keeps a full session's units resident for ~hundreds of MB of
      // metaspace, the right trade on any long-lived driver.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
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
