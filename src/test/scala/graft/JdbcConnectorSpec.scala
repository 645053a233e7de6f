package graft

import graft.sources.JdbcConnector
import graft.operators.LookupJoin
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** JDBC connector against embedded Derby — scan (partitioned +
  * pushdown), lookup probe, keyed upsert/delete sink, DDL binding,
  * and the streaming foreachBatch path; semantics of the reference's
  * flink-connector-jdbc table connector.
  */
class JdbcConnectorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private var n = 0
  private def opts(table: String): Map[String, String] = {
    n += 1
    Map("url" -> s"jdbc:derby:memory:graftspec$n;create=true",
      "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
      "table-name" -> table)
  }

  test("scan: partitioned BETWEEN read honors scan.partition.* and round-trips") {
    val o = opts("t_scan")
    val df = spark.range(1, 101)
      .select(col("id"), concat(lit("name-"), col("id")).as("name"),
        (col("id") % 7).cast("double").as("score"))
    JdbcConnector.overwriteTable(df, o, primaryKey = Seq("id"))

    val back = JdbcConnector.read(spark, o ++ Map(
      "scan.partition.column" -> "id",
      "scan.partition.num" -> "4",
      "scan.partition.lower-bound" -> "1",
      "scan.partition.upper-bound" -> "100"))
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
    assert(back.agg(sum("id")).as[Long].head() == 5050L)
  }

  test("scan: Catalyst pushes filters and projection into the JDBC source") {
    val o = opts("t_push")
    JdbcConnector.overwriteTable(
      spark.range(1, 51).select(col("id"), (col("id") * 2).as("v")), o)
    val q = JdbcConnector.read(spark, o).filter(col("id") > 40).select("v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"expected JDBC pushdown in plan:\n$plan")
    assert(q.as[Long].collect().sorted.toSeq == (41 to 50).map(_ * 2L))
  }

  test("upsert: last-wins by key, -D deletes, flush batches respected") {
    val o = opts("t_upsert")
    JdbcConnector.createTable(o,
      StructType.fromDDL("k bigint, v string, seq bigint"), primaryKey = Seq("k"))
    // changelog: k=1 inserted then updated; k=2 inserted then deleted;
    // k=3 deleted then re-inserted; k=4 plain insert. seq column fixes
    // the order; flushMaxRows=2 forces multiple flushes per partition.
    val changelog = Seq(
      (1L, "a", "+I", 1L), (2L, "b", "+I", 2L), (3L, "c", "+I", 3L),
      (4L, "d", "+I", 4L), (1L, "a2", "+U", 5L), (2L, "b", "-D", 6L),
      (3L, "c", "-D", 7L), (3L, "c2", "+I", 8L)
    ).toDF("k", "v", "__rowkind", "seq")
    JdbcConnector.upsertChangelog(changelog, o,
      keyCols = Seq("k"), orderCols = Seq("seq"),
      rowkindCol = Some("__rowkind"), flushMaxRows = 2)

    val state = JdbcConnector.read(spark, o)
      .select(col("K").as[Long], col("V").as[String]).collect().toMap
    assert(state == Map(1L -> "a2", 3L -> "c2", 4L -> "d"))
  }

  test("upsert is idempotent: replaying the same changelog leaves state unchanged") {
    val o = opts("t_idem")
    JdbcConnector.createTable(o,
      StructType.fromDDL("k bigint, v string, seq bigint"), primaryKey = Seq("k"))
    val changelog = Seq((1L, "x", "+I", 1L), (2L, "y", "+I", 2L), (1L, "x2", "+U", 3L))
      .toDF("k", "v", "__rowkind", "seq")
    JdbcConnector.upsertChangelog(changelog, o, Seq("k"), Seq("seq"), Some("__rowkind"))
    JdbcConnector.upsertChangelog(changelog, o, Seq("k"), Seq("seq"), Some("__rowkind"))
    val state = JdbcConnector.read(spark, o)
      .select(col("K").as[Long], col("V").as[String]).collect().toMap
    assert(state == Map(1L -> "x2", 2L -> "y"))
  }

  test("lookup probe joins through LookupJoin with per-partition cache") {
    val o = opts("t_dim")
    JdbcConnector.overwriteTable(
      Seq((0, "red"), (1, "green"), (2, "blue")).toDF("k", "color"), o,
      primaryKey = Seq("k"))
    val probes = spark.sparkContext.longAccumulator("probes")
    val base = JdbcConnector.lookupProbe[Int, String](o, "k", Seq("color"), _.getString(1))
    val facts = spark.range(0, 1000).map(i => (i.toLong, (i % 5).toInt))
    val joined = LookupJoin.lookup[(Long, Int), Int, String](
      facts, _._2,
      () => { val p = base(); k => { probes.add(1); p(k) } },
      cacheSize = 100)
      .map { case ((id, k), c) => (id, k, c.getOrElse("none")) }
      .collect()
    assert(joined.length == 1000)
    assert(joined.forall { case (_, k, c) =>
      c == Map(0 -> "red", 1 -> "green", 2 -> "blue").getOrElse(k, "none") })
    // LRU caching: at most (#partitions × 5 distinct keys) probes, not 1000
    assert(probes.value <= facts.rdd.getNumPartitions * 5L)
  }

  test("DDL: CREATE TABLE ... WITH ('connector'='jdbc') binds the scan") {
    val o = opts("t_ddl")
    JdbcConnector.overwriteTable(
      Seq((1L, "alpha"), (2L, "beta")).toDF("id", "label"), o)
    val tenv = GraftTableEnvironment.create(spark)
    tenv.executeSql(s"""
      CREATE TABLE jdbc_ddl_t (
        ID BIGINT,
        LABEL STRING
      ) WITH (
        'connector' = 'jdbc',
        'url' = '${o("url")}',
        'driver' = '${o("driver")}',
        'table-name' = '${o("table-name")}'
      )""")
    val rows = tenv.sqlQuery("SELECT ID, LABEL FROM jdbc_ddl_t ORDER BY ID")
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "alpha"), (2L, "beta")))
    tenv.executeSql("DROP TABLE jdbc_ddl_t")
  }

  test("streaming: foreachBatch upsert maintains keyed state across micro-batches") {
    val o = opts("t_stream")
    JdbcConnector.createTable(o,
      StructType.fromDDL("k bigint, v string, seq bigint"), primaryKey = Seq("k"))
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String, String, Long)]
    val q = JdbcConnector.streamUpsert(
        in.toDS().toDF("k", "v", "__rowkind", "seq"),
        o, keyCols = Seq("k"), orderCols = Seq("seq"),
        rowkindCol = Some("__rowkind"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt").toString)
      .start()
    try {
      in.addData((1L, "a", "+I", 1L), (2L, "b", "+I", 2L))
      q.processAllAvailable()
      in.addData((1L, "a2", "+U", 3L), (2L, "b", "-D", 4L), (3L, "c", "+I", 5L))
      q.processAllAvailable()
    } finally q.stop()
    val state = JdbcConnector.read(spark, o)
      .select(col("K").as[Long], col("V").as[String]).collect().toMap
    assert(state == Map(1L -> "a2", 3L -> "c"))
  }
}
