package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, NumericType}

/** Catalyst optimizer rule that plans interval-containment joins at
  * scale. Stock Spark has no range-join strategy: an inner join whose
  * condition is ONLY `v >= lo AND v < hi` (no equi conjunct) plans as
  * BroadcastNestedLoopJoin — or a cartesian product when both sides
  * are large — which is O(|facts|·|ranges|) and unusable at 100 TB.
  * [[graft.operators.RangeJoin.binned]] is the manual scale
  * formulation (bin both sides on floor(v/binW), equi-join the bin,
  * re-filter); this rule applies the SAME rewrite inside the
  * optimizer, so any plan — including plain `spark.sql` with a
  * BETWEEN join — gets the scalable shape without calling the
  * operator.
  *
  * Rewrite (v from one side, lo/hi from the other):
  * {{{
  * Join(L, R, Inner, v >= lo && v < hi && rest)
  *   ==>
  * Project(origOutput,
  *   Join(Project(L*, _graft_bin = floor(v/w)),
  *        Generate(explode(sequence(floor(lo/w), floor(hi/w))), R),
  *        Inner, _graft_bin = _graft_bin2 && <original condition>))
  * }}}
  * Each point row lands in exactly ONE bin while the interval side is
  * exploded to every bin it overlaps, so each qualifying pair meets
  * exactly once — no dedup. The original condition is re-applied in
  * full, so bound strictness (inclusive/exclusive, any orientation)
  * and any residual conjuncts are preserved verbatim; the bins only
  * over-approximate. Intervals with lo > hi (or null bounds) explode
  * to zero bins, matching the predicate's empty result.
  *
  * Guarded OFF unless `spark.graft.rangeJoin.bin` (the bin width; pick
  * it near the typical interval width) is set, and skipped whenever
  * the join already has a cross-side equi conjunct — Catalyst plans
  * those fine, and the guard also terminates the fixed point: the
  * rewritten join carries the bin equality, so it never re-matches.
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinConf = "spark.graft.rangeJoin.bin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinConf, "")
    if (w.isEmpty) plan
    else {
      val binW = w.toDouble
      require(binW > 0, s"$BinConf must be a positive bin width, got $w")
      plan.transformUp {
        case j: Join if j.joinType == Inner && j.condition.isDefined =>
          rewrite(j, binW).getOrElse(j)
      }
    }
  }

  /** Some(true) if `e` reads only the left side, Some(false) only the
    * right, None if it straddles or reads neither. */
  private def sideOf(e: Expression, j: Join): Option[Boolean] =
    if (e.references.isEmpty) None
    else if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  private def crossSideEqui(j: Join, c: Expression): Boolean = c match {
    case EqualTo(a, b)       => sideOf(a, j).isDefined && sideOf(b, j).isDefined && sideOf(a, j) != sideOf(b, j)
    case EqualNullSafe(a, b) => sideOf(a, j).isDefined && sideOf(b, j).isDefined && sideOf(a, j) != sideOf(b, j)
    case _ => false
  }

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType] && e.deterministic

  private def rewrite(j: Join, binW: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    if (conjuncts.exists(crossSideEqui(j, _))) return None

    // Collect (value, bound) orientations: a comparison bounds BOTH of
    // its operands, so record each conjunct from both ends and let the
    // pairing step pick the (v, lo, hi) assignment whose sides work.
    val lowers = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => Seq((a, b))
      case GreaterThan(a, b)        => Seq((a, b))
      case LessThanOrEqual(a, b)    => Seq((b, a))
      case LessThan(a, b)           => Seq((b, a))
      case _ => Nil
    }
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(a, b)    => Seq((a, b))
      case LessThan(a, b)           => Seq((a, b))
      case GreaterThanOrEqual(a, b) => Seq((b, a))
      case GreaterThan(a, b)        => Seq((b, a))
      case _ => Nil
    }
    val hit = (for {
      (v, lo) <- lowers
      (v2, hi) <- uppers
      if v.semanticEquals(v2) && numeric(v) && numeric(lo) && numeric(hi)
      vSide <- sideOf(v, j)
      loSide <- sideOf(lo, j)
      hiSide <- sideOf(hi, j)
      if loSide == hiSide && loSide != vSide
    } yield (v, lo, hi, vSide)).headOption

    hit.map { case (v, lo, hi, vOnLeft) =>
      def bin(e: Expression): Expression = // Floor(double) is LongType
        Floor(Divide(Cast(e, DoubleType), Literal(binW)))
      val (pointSide, intervalSide) = if (vOnLeft) (j.left, j.right) else (j.right, j.left)
      val pBin = Alias(bin(v), "_graft_bin")()
      val pointPlan = Project(pointSide.output :+ pBin, pointSide)
      val loBin = bin(lo)
      val hiBin = bin(hi)
      // Empty / null-bounded intervals must explode to zero rows:
      // sequence() throws on start > stop with step 1, and a null If
      // predicate also falls through to the empty array.
      val bins = If(LessThanOrEqual(loBin, hiBin),
        Sequence(loBin, hiBin, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)))
      val gOut = AttributeReference("_graft_bin2", LongType, nullable = false)()
      val genPlan = Generate(Explode(bins), Nil, outer = false, None, Seq(gOut), intervalSide)
      val (newL, newR) = if (vOnLeft) (pointPlan, genPlan) else (genPlan, pointPlan)
      val joined = Join(newL, newR, Inner,
        Some(And(EqualTo(pBin.toAttribute, gOut), j.condition.get)), j.hint)
      Project(j.output, joined)
    }
  }
}

/** Session extension wiring (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * injects [[RangeJoinRule]] into the operator-optimization batch. The
  * rule is inert until `spark.graft.rangeJoin.bin` is set, so the
  * extension is safe to register unconditionally. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RangeJoinRule)
}
