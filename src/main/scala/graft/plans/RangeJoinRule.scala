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
  *
  * A second shape, interval OVERLAP (`l.start <= r.end AND r.start <=
  * l.end`, no equi-key, no shared point — the q96/q123/q125 form), is
  * rewritten with BOTH sides exploded into their bin ranges and joined
  * on the shared bin, deduplicated by keeping only the first shared bin
  * `greatest(bin(l.start), bin(r.start))` (every overlapping pair
  * visits it exactly once). Both rewrites assume non-empty intervals
  * (start <= end per row) — an inverted interval makes the generated
  * `sequence()` fail loudly rather than silently dropping rows.
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

  /** An interval-overlap shape: left interval (ls, le), right interval
    * (rs, re), detected from `ls <= re AND rs <= le` in any spelling. */
  private case class Overlap(ls: Expression, le: Expression,
      rs: Expression, re: Expression)

  /** Find the overlap shape among the conjuncts: one comparison bounding
    * a LEFT expression by a RIGHT one (`l.start <= r.end`) and one
    * bounding a RIGHT expression by a LEFT one (`r.start <= l.end`).
    * This is the q96/q123/q125 shape — two intervals, no equi-key, no
    * shared point — which the point-in-interval detection above cannot
    * see (its point and bounds must live on opposite sides, here each
    * side contributes one endpoint to each comparison). */
  private def overlapPair(preds: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Option[Overlap] = {
    // normalize every comparison to (small, large): small <= large
    def le(p: Expression): Option[(Expression, Expression)] = p match {
      case LessThanOrEqual(a, b)    => Some((a, b))
      case LessThan(a, b)           => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b)        => Some((b, a))
      case _ => None
    }
    val norm = preds.flatMap(le)
      .filter { case (a, b) => supported(a) && supported(b) }
      .flatMap { case (a, b) =>
        (sideOf(a, l, r), sideOf(b, l, r)) match {
          case (Some(sa), Some(sb)) if sa != sb => Some((a, b, sa))
          case _ => None
        }
      }
    for {
      (ls, re, _) <- norm.find(_._3)  // small side on the left
      (rs, lEnd, _) <- norm.find(!_._3) // small side on the right
    } yield Overlap(ls, lEnd, rs, re)
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
            case None =>
              // no point-in-interval pair — try the interval-overlap
              // shape: explode BOTH sides into their bin ranges and join
              // on the shared bin. A pair can share several bins, so the
              // join keeps only the FIRST shared bin — b =
              // greatest(bin(l.start), bin(r.start)) — which every
              // overlapping pair visits exactly once (bin monotonicity:
              // max of the start bins <= min of the end bins whenever the
              // intervals overlap and each interval is non-empty), so no
              // duplicates and no false negatives; the original
              // condition still removes bin-only false positives.
              overlapPair(preds, left, right) match {
                case None => j
                case Some(ov) =>
                  def gen(side: LogicalPlan, lo: Expression, hi: Expression,
                      name: String): (Generate, AttributeReference) = {
                    val g = Explode(Sequence(
                      bin(lo, width, tz), bin(hi, width, tz),
                      Some(Literal(1L)), Some(tz)))
                    val attr = AttributeReference(name, LongType,
                      nullable = g.elementSchema.head.nullable)()
                    (Generate(g, unrequiredChildIndex = Nil, outer = false,
                      qualifier = None, generatorOutput = Seq(attr),
                      child = side), attr)
                  }
                  val (genL, binL) = gen(left, ov.ls, ov.le, binName + "_l")
                  val (genR, binR) = gen(right, ov.rs, ov.re, binName + "_r")
                  val firstShared = EqualTo(binL,
                    Greatest(Seq(bin(ov.ls, width, tz), bin(ov.rs, width, tz))))
                  val newCond = And(And(EqualTo(binL, binR), firstShared), cond)
                  Project(j.output, Join(genL, genR, Inner, Some(newCond), hint))
              }
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
