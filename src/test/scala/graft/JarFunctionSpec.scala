package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** JAR resource statements end-to-end (GraftTableEnvironment: ADD JAR /
  * SHOW JARS / REMOVE JAR + `CREATE FUNCTION f AS 'cls' USING JAR` —
  * reference flink-sql-parser ddl/SqlAddJar.java:31, dql/SqlShowJars
  * .java:29, ddl/SqlRemoveJar.java, SqlCreateFunction's resource list).
  * The spec compiles a real UDF jar in a temp dir with the JDK
  * compiler, so the reflective classloading + generic-signature return
  * type inference is exercised for real, including a UDF inherited
  * through an abstract base class (the signature lives on the base,
  * not the concrete class) and the loud failure modes.
  */
class JarFunctionSpec extends AnyFunSuite {
  lazy val root: SparkSession = GraftSession.local(4)

  private def freshEnv(): (SparkSession, GraftTableEnvironment) = {
    val s = root.newSession()
    (s, GraftTableEnvironment.create(s))
  }

  /** Compile the given (className → java source) pairs and package them
    * into a jar at `jarPath`, compiling against THIS JVM's classpath
    * (which carries the Spark jars the UDF interfaces live in).
    */
  private def buildJar(jarPath: java.nio.file.Path,
                       sources: Seq[(String, String)]): Unit = {
    import java.nio.file.Files
    val srcDir = Files.createTempDirectory("graft-udf-src")
    val outDir = Files.createTempDirectory("graft-udf-cls")
    val files = sources.map { case (cls, code) =>
      val f = srcDir.resolve(s"$cls.java")
      Files.writeString(f, code)
      f.toString
    }
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(javac != null, "JDK compiler not available in this JVM")
    val cp = System.getProperty("java.class.path")
    val rc = javac.run(null, null, null,
      (Seq("-cp", cp, "-d", outDir.toString) ++ files): _*)
    assert(rc == 0, "javac failed")
    val jos = new java.util.jar.JarOutputStream(
      Files.newOutputStream(jarPath))
    try Files.list(outDir).forEach { p =>
      jos.putNextEntry(new java.util.zip.ZipEntry(p.getFileName.toString))
      jos.write(Files.readAllBytes(p))
      jos.closeEntry()
    } finally jos.close()
  }

  private lazy val jarPath: String = {
    val p = java.nio.file.Files
      .createTempDirectory("graft-udf-jar").resolve("graft-test-udfs.jar")
    buildJar(p, Seq(
      "GraftPlusOne" ->
        """public class GraftPlusOne
          |    implements org.apache.spark.sql.api.java.UDF1<Long, Long> {
          |  public Long call(Long x) { return x + 1L; }
          |}""".stripMargin,
      "GraftBaseFn" ->
        """public abstract class GraftBaseFn
          |    implements org.apache.spark.sql.api.java.UDF1<String, String> {
          |  public String call(String s) { return transform(s); }
          |  protected abstract String transform(String s);
          |}""".stripMargin,
      "GraftShout" ->
        """public class GraftShout extends GraftBaseFn {
          |  protected String transform(String s) { return s.toUpperCase(); }
          |}""".stripMargin,
      "GraftWeightedSum" ->
        """public class GraftWeightedSum
          |    implements org.apache.spark.sql.api.java.UDF2<Long, Double, Double> {
          |  public Double call(Long a, Double b) { return a * 2.0 + b; }
          |}""".stripMargin,
      "GraftNotAUdf" ->
        """public class GraftNotAUdf { public int x() { return 1; } }""",
      "GraftBadReturn" ->
        """public class GraftBadReturn
          |    implements org.apache.spark.sql.api.java.UDF1<Long, java.util.ArrayList> {
          |  public java.util.ArrayList call(Long x) { return new java.util.ArrayList(); }
          |}""".stripMargin))
    p.toString
  }

  test("CREATE FUNCTION ... USING JAR loads, registers, and evaluates") {
    val (_, env) = freshEnv()
    env.executeSql(
      s"CREATE FUNCTION plus_one AS 'GraftPlusOne' USING JAR '$jarPath'")
    val r = env.executeSql("SELECT plus_one(CAST(41 AS BIGINT)) AS v").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(42L))
    // the jar the function came from is tracked
    val shown = env.executeSql("SHOW JARS").collect().map(_.getString(0))
    assert(shown.contains(jarPath))
  }

  test("UDF inherited through an abstract base class resolves (hierarchy walk)") {
    val (_, env) = freshEnv()
    env.executeSql(
      s"CREATE FUNCTION shout AS 'GraftShout' USING JAR '$jarPath'")
    val r = env.executeSql("SELECT shout('abc') AS v").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("ABC"))
  }

  test("UDF2 arity + return type reflected from the generic signature") {
    val (_, env) = freshEnv()
    env.executeSql(
      s"CREATE FUNCTION wsum AS 'GraftWeightedSum' USING JAR '$jarPath'")
    val r = env.executeSql(
      "SELECT wsum(CAST(3 AS BIGINT), CAST(0.5 AS DOUBLE)) AS v").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(6.5))
  }

  test("jar-loaded function works over a table, not just literals") {
    val (s, env) = freshEnv()
    import s.implicits._
    Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("jt")
    env.executeSql(
      s"CREATE FUNCTION p1 AS 'GraftPlusOne' USING JAR '$jarPath'")
    val r = env.executeSql("SELECT sum(p1(x)) AS s FROM jt").collect()
    assert(r.head.getLong(0) == 9L)
  }

  test("ADD JAR / SHOW JARS / REMOVE JAR lifecycle") {
    val (_, env) = freshEnv()
    assert(env.executeSql("SHOW JARS").collect().isEmpty)
    env.executeSql(s"ADD JAR '$jarPath'")
    assert(env.executeSql("SHOW JARS").collect().map(_.getString(0))
      .toSeq == Seq(jarPath))
    // double-ADD is idempotent in the tracker
    env.executeSql(s"ADD JAR '$jarPath'")
    assert(env.executeSql("SHOW JARS").collect().length == 1)
    env.executeSql(s"REMOVE JAR '$jarPath'")
    assert(env.executeSql("SHOW JARS").collect().isEmpty)
    // removing an untracked jar errors loudly
    assertThrows[IllegalArgumentException](
      env.executeSql(s"REMOVE JAR '$jarPath'"))
  }

  test("loud failures: missing jar, non-UDF class, unsupported return type") {
    val (_, env) = freshEnv()
    assertThrows[IllegalArgumentException](env.executeSql(
      "CREATE FUNCTION nope AS 'GraftPlusOne' USING JAR '/no/such/path.jar'"))
    val e1 = intercept[IllegalArgumentException](env.executeSql(
      s"CREATE FUNCTION nope2 AS 'GraftNotAUdf' USING JAR '$jarPath'"))
    assert(e1.getMessage.contains("does not implement"))
    val e2 = intercept[IllegalArgumentException](env.executeSql(
      s"CREATE FUNCTION nope3 AS 'GraftBadReturn' USING JAR '$jarPath'"))
    assert(e2.getMessage.contains("unsupported UDF return type"))
  }
}
