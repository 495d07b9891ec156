package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure range-predicate INNER join
  * (`lo <= point AND point <= hi` across the two sides, no equi
  * conjunct) into the binned equi-join of [[graft.ops.RangeJoin]] —
  * automatically.
  *
  * Without this, Catalyst plans such a join as BroadcastNestedLoopJoin:
  * every fact row compared against every interval, the O(n·m) shape that
  * cannot survive 100 TB. The rewrite adds a bin key to both sides
  * (point side: one bin per row; bound side: one row per overlapped bin
  * via explode(sequence(...))), so ExtractEquiJoinKeys finds an equality
  * and the join becomes a hash/sort-merge join; the original predicate
  * stays as the in-bucket residual, so semantics are unchanged (strict
  * or non-strict bounds alike — binning by the non-strict hull only ever
  * over-generates candidates, never drops one, and a point maps to
  * exactly one bin so no dedup is needed).
  *
  * Binning uses an arithmetic right shift (floor division by 2^shift) —
  * total, monotonic, negative-safe, and free of ANSI division edge
  * cases. Config:
  *   - spark.graft.rangejoin.enabled  (default true)
  *   - spark.graft.rangejoin.binShift (default 10 ⇒ bins of 1024 units;
  *     pick ~log2 of the typical interval length)
  *
  * The rule is deliberately narrow: INNER joins, integral-typed point
  * and bounds, and it stands down whenever the condition already has a
  * cross-side equality (Catalyst hash-joins those fine on its own) —
  * which also makes it idempotent, since the rewritten join carries the
  * bin equality.
  */
class RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangejoin.enabled", "true").toBoolean
  private def binShift: Int =
    conf.getConfString("spark.graft.rangejoin.binShift", "10").toInt

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // (point, bound, isLower): `point >= bound` when isLower, `point <= bound`
  private def boundCandidates(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case LessThan(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      // batch only: a streaming join has its own state/watermark planning
      // that the explode+equi rewrite must not silently alter
      case j @ Join(left, right, Inner, Some(cond), _)
          if !left.isStreaming && !right.isStreaming =>
        rewrite(j, left, right, cond).getOrElse(j)
    }
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression)
      : Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val crossEquality = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case _ => false
    }
    if (crossEquality) return None

    // candidates where the point lives on `pSide` and the bound on the other
    def sided(pSide: LogicalPlan, bSide: LogicalPlan) =
      conjuncts.flatMap(boundCandidates).filter { case (p, b, _) =>
        p.references.nonEmpty && b.references.nonEmpty &&
          p.references.subsetOf(pSide.outputSet) && b.references.subsetOf(bSide.outputSet) &&
          integral(p.dataType) && integral(b.dataType) && p.deterministic && b.deterministic
      }

    def findPair(cands: Seq[(Expression, Expression, Boolean)])
        : Option[(Expression, Expression, Expression)] = {
      val byPoint = cands.groupBy(_._1.canonicalized)
      byPoint.values.flatMap { group =>
        for {
          (p, lo, _) <- group.find(_._3)
          (_, hi, _) <- group.find(!_._3)
        } yield (p, lo, hi)
      }.headOption
    }

    val shift = Literal(binShift)
    def bin(e: Expression): Expression = ShiftRight(Cast(e, LongType), shift)

    def build(
        pointPlan: LogicalPlan, boundPlan: LogicalPlan,
        p: Expression, lo: Expression, hi: Expression,
        pointIsLeft: Boolean): LogicalPlan = {
      val binPoint = Alias(bin(p), "__graft_bin_p")()
      val pointProj = Project(pointPlan.output :+ binPoint, pointPlan)
      val binBoundAttr = AttributeReference("__graft_bin_b", LongType, nullable = false)()
      // post-analysis, ResolveTimeZone has already run — a TimeZoneAware
      // expression we introduce must carry its zone or the plan unresolves
      val seq = Sequence(bin(lo), bin(hi), Some(Literal(1L)),
        Some(conf.sessionLocalTimeZone))
      val gen = Generate(Explode(seq), Nil, outer = false, None, Seq(binBoundAttr), boundPlan)
      val newCond = And(EqualTo(binPoint.toAttribute, binBoundAttr), cond)
      val joined =
        if (pointIsLeft) Join(pointProj, gen, Inner, Some(newCond), j.hint)
        else Join(gen, pointProj, Inner, Some(newCond), j.hint)
      Project(j.output, joined)
    }

    findPair(sided(left, right)).map { case (p, lo, hi) =>
      build(left, right, p, lo, hi, pointIsLeft = true)
    }.orElse(findPair(sided(right, left)).map { case (p, lo, hi) =>
      build(right, left, p, lo, hi, pointIsLeft = false)
    })
  }
}
