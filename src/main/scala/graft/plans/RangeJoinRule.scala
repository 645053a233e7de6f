package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Automatic range-join optimization, the planner-level form of
  * [[graft.operators.RangeJoin.pointInInterval]].
  *
  * Spark plans an inner join whose only cross-side predicate is
  * `pt >= lo AND pt <= hi` (no equality conjunct) as a
  * BroadcastNestedLoopJoin — or a cartesian product when neither side
  * fits — O(|L|·|R|) work no matter how many executors share it. The
  * reference's interval join avoids this only when a join key exists
  * (TimeIntervalJoin); its key-less SQL spelling degenerates the same
  * way. This rule restores a shuffle shape for ANY such join written
  * against the SQL/DataFrame surface, not just calls routed through the
  * RangeJoin helper: the point side gets its bin id
  * `floor(pt / binWidth)`, the interval side is replicated to every bin
  * it overlaps (`explode(sequence(floor(lo/w), floor(hi/w)))`), and the
  * join becomes a plain equi-join on the bin with the original
  * predicate as residual filter. A pair can meet in only the point's
  * bin, so no dedup is needed; null bounds produce an empty sequence
  * and null points a null bin — both drop, matching the original
  * semantics.
  *
  * Opt-in, mirroring the bin-size parameter a user must pick anyway:
  * the rule fires only while `spark.graft.rangeJoin.binWidth` is set
  * (choose it near the typical interval span — much smaller multiplies
  * replication, much larger multiplies residual-filter work). Numeric
  * point/bound types only. The equality-conjunct guard both skips
  * joins Spark already hash-joins AND makes the rewrite idempotent
  * inside the optimizer's fixed-point batch (the emitted join carries
  * a bin equality).
  */
class RangeJoinRule(session: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wStr = conf.getConfString(ConfKey, "")
    if (wStr.isEmpty) return plan
    val w = wStr.toDouble
    require(w > 0, s"$ConfKey must be positive, got $wStr")
    plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        rewrite(j, w).getOrElse(j)
    }
  }

  /** Some(true) = only left side referenced, Some(false) = only right. */
  private def sideOf(e: Expression, j: Join): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val crossSideEqui = conjuncts.exists {
      case EqualTo(a, b) => isCross(a, b, j)
      case EqualNullSafe(a, b) => isCross(a, b, j)
      case _ => false
    }
    if (crossSideEqui) return None

    // Normalize comparisons into lower/upper bound candidates on a
    // point expression from one side, bounded by the other side.
    // Strict forms bin identically (pt > lo implies pt >= lo); the
    // residual keeps them exact.
    def cand(a: Expression, b: Expression): Option[(Expression, Expression)] =
      (sideOf(a, j), sideOf(b, j)) match {
        case (Some(x), Some(y)) if x != y && numeric(a) && numeric(b) =>
          Some((a, b))
        case _ => None
      }
    val lowers = conjuncts.flatMap { // (pt, lo)
      case GreaterThanOrEqual(a, b) => cand(a, b)
      case GreaterThan(a, b) => cand(a, b)
      case LessThanOrEqual(a, b) => cand(b, a)
      case LessThan(a, b) => cand(b, a)
      case _ => None
    }
    val uppers = conjuncts.flatMap { // (pt, hi)
      case LessThanOrEqual(a, b) => cand(a, b)
      case LessThan(a, b) => cand(a, b)
      case GreaterThanOrEqual(a, b) => cand(b, a)
      case GreaterThan(a, b) => cand(b, a)
      case _ => None
    }
    val matched = (for {
      (pt, lo) <- lowers.iterator
      (pt2, hi) <- uppers.iterator
      if pt.semanticEquals(pt2) && sideOf(lo, j) == sideOf(hi, j)
    } yield (pt, lo, hi)).nextOption()

    matched.map { case (pt, lo, hi) =>
      def bin(e: Expression): Expression =
        Cast(Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType))), LongType)
      val ptOnLeft = sideOf(pt, j).get
      val (ptPlan, boundPlan) = if (ptOnLeft) (j.left, j.right) else (j.right, j.left)
      val binAlias = Alias(bin(pt), "__graft_bin")()
      val binnedPt = Project(ptPlan.output :+ binAlias, ptPlan)
      val genAttr = AttributeReference("__graft_bin_r", LongType, nullable = false)()
      val seqExpr = new Sequence(bin(lo), bin(hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val exploded = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(genAttr),
        child = boundPlan)
      val binEq = EqualTo(binAlias.toAttribute, genAttr)
      val newJoin =
        if (ptOnLeft) Join(binnedPt, exploded, Inner,
          Some(And(binEq, j.condition.get)), j.hint)
        else Join(exploded, binnedPt, Inner,
          Some(And(binEq, j.condition.get)), j.hint)
      Project(j.output, newJoin)
    }
  }

  private def isCross(a: Expression, b: Expression, j: Join): Boolean =
    (sideOf(a, j), sideOf(b, j)) match {
      case (Some(x), Some(y)) => x != y
      case _ => false
    }
}

/** One injection point for every engine extension: the Flink-dialect
  * gap functions plus the range-join optimizer rule.
  */
object GraftExtensions {
  def injectAll(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    graft.functions.FlinkFunctions.injectAll(ext)
    ext.injectOptimizerRule(new RangeJoinRule(_))
  }
}
