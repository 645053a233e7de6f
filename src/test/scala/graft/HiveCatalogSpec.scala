package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Derby-backed Hive-metastore persistence smoke test: a catalog table
  * created THROUGH THE FAÇADE (pass-through Spark DDL branch of
  * executeSql) must still resolve after the session — and its whole
  * SparkContext — is torn down and rebuilt against the same embedded
  * metastore, the property the reference gets from its Hive catalog
  * (flink-connectors/flink-connector-hive HiveCatalog). A real remote
  * metastore is env-blocked (no egress); embedded Derby exercises the
  * identical catalog code path.
  *
  * The test stops any active session first (catalogImplementation is a
  * static conf, so the hive session needs a fresh context); suites run
  * sequentially in the forked test JVM and every other spec calls
  * GraftSession.local lazily, so a later suite just builds a fresh
  * non-hive context.
  */
class HiveCatalogSpec extends AnyFunSuite {

  test("façade CREATE TABLE persists in a Derby metastore across a full session restart") {
    assume(
      try { Class.forName("org.apache.hadoop.hive.conf.HiveConf"); true }
      catch { case _: Throwable => false },
      "hive jars not on the classpath")
    val metastore = Files.createTempDirectory("graft-hive-ms").toString
    val warehouse = Files.createTempDirectory("graft-hive-wh").toString
    def mk(): SparkSession = GraftSession.builder("local[2]", 4)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.hadoop.javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()

    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    val s1 = mk()
    try {
      assume(s1.conf.get("spark.sql.catalogImplementation") == "hive",
        "could not obtain a hive-catalog session")
      val env = GraftTableEnvironment.create(s1)
      env.executeSql("DROP TABLE IF EXISTS graft_hive_smoke")
      env.executeSql(
        "CREATE TABLE graft_hive_smoke (k INT, v STRING) USING parquet")
      s1.sql("INSERT INTO graft_hive_smoke VALUES (1, 'a'), (2, 'b')")
      assert(s1.catalog.tableExists("graft_hive_smoke"))
    } finally s1.stop()

    // Full restart: new context, same metastore — the table must come
    // back from Derby, not from any in-memory catalog state.
    val s2 = mk()
    try {
      assert(s2.catalog.tableExists("graft_hive_smoke"))
      val rows = s2.table("graft_hive_smoke").collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
      assert(rows == Set((1, "a"), (2, "b")))
      GraftTableEnvironment.create(s2)
        .executeSql("DROP TABLE graft_hive_smoke")
      assert(!s2.catalog.tableExists("graft_hive_smoke"))
    } finally s2.stop()
  }
}
