package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampType}

/** Automatic range-join binning — the optimizer-rule tier of the build
  * plan ((c): custom `Rule[LogicalPlan]` via `SparkSessionExtensions`).
  *
  * An inner join whose condition is only a point-in-interval range
  * (`p >= lo AND p <= hi`, the two bounds on the other side) has no
  * equi-key, so Spark plans it as BroadcastNestedLoopJoin — O(|L|·|R|)
  * comparisons, the one plan shape that cannot survive a 100 TB input.
  * q88 avoids it by hand (rangeJoinBinned); this rule performs the same
  * rewrite automatically on ANY such join — including ad-hoc
  * `spark.sql` — once a bin width is configured:
  *
  *   Join(L, R, p BETWEEN lo AND hi)
  *   ⇒ Project(origOutput,
  *       Join(Project(L + bin(p)),
  *            Generate(explode(sequence(bin(lo), bin(hi))), R),
  *            bin(p) = bin_iv  AND  <original condition>))
  *
  * `bin(x) = floor(x / width)` is monotone non-decreasing, so
  * lo <= p <= hi  ⇒  bin(lo) <= bin(p) <= bin(hi): every qualifying
  * pair shares a generated bin (no false negatives), and the original
  * predicate — kept verbatim in the new join condition — removes the
  * false positives. The equality gives ExtractEquiJoinKeys a key, so
  * planning turns the cartesian into a shuffled hash/sort-merge join
  * whose fan-in per interval is (len/width)+1 bins.
  *
  * Scope guards (each also makes the rule idempotent under the
  * fixed-point "User Provided Optimizers" batch):
  *  - inner joins only (outer null-extension rows would duplicate per bin);
  *  - skipped when ANY equi-predicate is present — Spark already hash-joins
  *    on it and plans the range as a post-join filter;
  *  - skipped unless `spark.graft.rangejoin.binWidth` > 0 (off by default);
  *  - point and both bounds must be deterministic, single-sided, and of
  *    numeric or timestamp type (cast-to-double is monotone for both).
  *
  * Null bounds or points are dropped by the bin equality — exactly the
  * rows the original comparison predicate already rejected (NULL is not
  * TRUE under inner-join semantics), so results are unchanged.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val widthKey = "spark.graft.rangejoin.binWidth"
  private val binName = "__graft_bin"

  /** One side of a comparison, normalized: the point expression, which
    * child it comes from (true = left), the bound, and whether the bound
    * is a lower bound. */
  private case class Bound(point: Expression, pointOnLeft: Boolean,
      bound: Expression, isLower: Boolean)

  private def supported(e: Expression): Boolean = e.dataType match {
    case _: NumericType | TimestampType => e.deterministic
    case _ => false
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.nonEmpty && refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.nonEmpty && refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  /** Normalize `cmp(a, b)` into point-vs-bound candidates (both readings:
    * either operand may be the point). */
  private def bounds(p: Expression, l: LogicalPlan, r: LogicalPlan): Seq[Bound] = {
    def mk(point: Expression, bound: Expression, isLower: Boolean): Seq[Bound] =
      (sideOf(point, l, r), sideOf(bound, l, r)) match {
        case (Some(ps), Some(bs)) if ps != bs && supported(point) && supported(bound) =>
          Seq(Bound(point, ps, bound, isLower))
        case _ => Nil
      }
    p match {
      // a >= b: reading a as point → b is a lower bound; reading b as
      // point → a is an upper bound
      case GreaterThanOrEqual(a, b) => mk(a, b, isLower = true) ++ mk(b, a, isLower = false)
      case GreaterThan(a, b)        => mk(a, b, isLower = true) ++ mk(b, a, isLower = false)
      case LessThanOrEqual(a, b)    => mk(a, b, isLower = false) ++ mk(b, a, isLower = true)
      case LessThan(a, b)           => mk(a, b, isLower = false) ++ mk(b, a, isLower = true)
      case _ => Nil
    }
  }

  private def isEqui(p: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = p match {
    case EqualTo(a, b) =>
      (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r)) yield sa != sb).getOrElse(false)
    case EqualNullSafe(a, b) =>
      (for (sa <- sideOf(a, l, r); sb <- sideOf(b, l, r)) yield sa != sb).getOrElse(false)
    case _ => false
  }

  // timeZoneId must be supplied explicitly: expressions built at
  // optimizer time skip the ResolveTimeZone analyzer rule, and an
  // unset zone on Cast/Sequence makes the whole plan unresolved
  private def bin(x: Expression, width: Double, tz: String): Expression =
    Floor(Divide(Cast(x, DoubleType, Some(tz)), Literal(width, DoubleType)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = SQLConf.get.getConfString(widthKey, "0").toDouble
    if (width <= 0) return plan
    val tz = SQLConf.get.sessionLocalTimeZone
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !cond.exists { case a: Attribute => a.name.startsWith(binName); case _ => false } =>
        val preds = splitConjunctivePredicates(cond)
        if (preds.exists(isEqui(_, left, right))) j
        else {
          val cands = preds.flatMap(bounds(_, left, right))
          // a usable pair: same point expression, same side, one lower
          // bound + one upper bound
          val pair = cands.collectFirst(Function.unlift { lo =>
            if (!lo.isLower) None
            else cands.find(hi => !hi.isLower && hi.pointOnLeft == lo.pointOnLeft &&
              hi.point.semanticEquals(lo.point)).map(hi => (lo, hi))
          })
          pair match {
            case None => j
            case Some((lo, hi)) =>
              val (pointSide, ivSide) =
                if (lo.pointOnLeft) (left, right) else (right, left)
              val binP = Alias(bin(lo.point, width, tz), binName + "_p")()
              val pointPlan = Project(pointSide.output :+ binP, pointSide)
              val seq = Sequence(
                bin(lo.bound, width, tz), bin(hi.bound, width, tz),
                Some(Literal(1L)), Some(tz))
              val gen = Explode(seq)
              val binIv = AttributeReference(binName + "_iv", LongType,
                nullable = gen.elementSchema.head.nullable)()
              val ivPlan = Generate(gen, unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(binIv), child = ivSide)
              val newCond = And(EqualTo(binP.toAttribute, binIv), cond)
              val joined =
                if (lo.pointOnLeft) Join(pointPlan, ivPlan, Inner, Some(newCond), hint)
                else Join(ivPlan, pointPlan, Inner, Some(newCond), hint)
              Project(j.output, joined)
          }
        }
    }
  }

  /** Install on a live session (idempotent) — the builder-time path is
    * `spark.sql.extensions=graft.plans.GraftExtensions`. The rule stays
    * inert until [[widthKey]] is set > 0. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RangeJoinRule))
      spark.experimental.extraOptimizations = cur :+ RangeJoinRule
  }
}
