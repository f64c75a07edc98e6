package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Derived-predicate optimizer rule for [[DamerauLevenshtein]] thresholds —
  * the [[JaroWinklerLengthPrune]] pattern on the distance side: every
  * insertion/deletion changes a string's length by exactly 1 and
  * substitutions/transpositions by 0, so `DL(a, b) >= |len(a) - len(b)|`
  * unconditionally. A conjunct `dl(a, b) <= k` therefore IMPLIES
  * `abs(length(a) - length(b)) <= k`, and prepending that two-`length()`
  * check to the same Filter lets conjunct short-circuiting skip the
  * O(|a|*|b|) DP kernel for every length-mismatched pair — at a fuzzy-probe
  * join the overwhelming majority.
  *
  * Soundness: the implied predicate is a pure relaxation (never false for
  * an accepted row); NULL inputs make both predicates NULL, so the
  * rewritten filter drops exactly the same rows. Idempotent under the
  * fixpoint optimizer: an existing semantically-equal conjunct suppresses
  * re-derivation.
  */
object DamerauLengthPrune extends Rule[LogicalPlan] {

  private def lengthCheck(a: Expression, b: Expression, k: Int): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), Literal(k, IntegerType))

  private def derive(conjunct: Expression): Option[Expression] = conjunct match {
    case LessThanOrEqual(DamerauLevenshtein(a, b), Literal(k: Int, IntegerType)) =>
      Some(lengthCheck(a, b, k))
    case LessThan(DamerauLevenshtein(a, b), Literal(k: Int, IntegerType)) =>
      Some(lengthCheck(a, b, k - 1))
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), DamerauLevenshtein(a, b)) =>
      Some(lengthCheck(a, b, k))
    case GreaterThan(Literal(k: Int, IntegerType), DamerauLevenshtein(a, b)) =>
      Some(lengthCheck(a, b, k - 1))
    case EqualTo(DamerauLevenshtein(a, b), Literal(k: Int, IntegerType)) =>
      Some(lengthCheck(a, b, k))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (derived.isEmpty) f
      // derived checks FIRST: conjunct order is evaluation order, and the
      // point is running length() before the DP kernel
      else Filter((derived :+ cond).reduce(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }
}
