package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bin-bucketed key-less range join: equal to the naive range-predicate
  * join, but planned as an equi-join on the bin id instead of a
  * nested loop.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private lazy val points = spark.range(0, 2000)
    .select(col("id").as("pid"), (col("id") * 37 % 10000).as("pt"))
  private lazy val intervals = spark.range(0, 300)
    .select(col("id").as("iid"), (col("id") * 31 % 9000).as("lo"))
    .withColumn("hi", col("lo") + (col("iid") % 5) * 100)

  test("matches the naive range-predicate join across bin widths") {
    val naive = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (bin <- Seq(50L, 100L, 1000L, 100000L)) {
      val bucketed = RangeJoin.pointInInterval(points, intervals,
          col("pt"), col("lo"), col("hi"), bin)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(bucketed == naive, s"bin width $bin diverged")
    }
  }

  test("property: equals naive join on randomized intervals") {
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      seed <- Gen.choose(1L, 1000000L)
      bin <- Gen.oneOf(7L, 64L, 500L, 9999L)
    } yield (seed, bin)
    val prop = Prop.forAll(gen) { case (seed, bin) =>
      val p = spark.range(0, 300)
        .select(col("id").as("pid"), ((col("id") * seed) % 5000).as("pt"))
      val iv = spark.range(0, 50)
        .select(col("id").as("iid"), ((col("id") * seed * 7) % 4500).as("lo"))
        .withColumn("hi", col("lo") + (col("iid") * seed) % 800)
      val naive = p.join(iv, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val bucketed = RangeJoin.pointInInterval(p, iv,
          col("pt"), col("lo"), col("hi"), bin)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      bucketed == naive
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(result.passed, result.status.toString)
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    val naivePlan = points.join(intervals,
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin")
      || naivePlan.contains("CartesianProduct"))
    val bucketedPlan = RangeJoin.pointInInterval(points, intervals,
        col("pt"), col("lo"), col("hi"), 100L)
      .queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("BroadcastNestedLoopJoin")
      && !bucketedPlan.contains("CartesianProduct"))
    // the join key is the bin id
    assert(bucketedPlan.contains("__bin"))
  }
}
