package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import graft.functions.Hex60

/** SURVEY.md §4 optional-rule candidate, implemented: rewrite
  * equi-joins on raw `sequence` columns to lead with a 60-bit hash of
  * the key.
  *
  * The reference's HAS_SEQUENCE load joins on the full nucleotide
  * string (load.cyp:119 — kilobases per row). Keeping those semantics
  * verbatim would shuffle and sort-merge-compare kilobase keys; this
  * rule turns `a.sequence = b.sequence` into
  * `graft_hex60(a.sequence) = graft_hex60(b.sequence) AND
  *  a.sequence = b.sequence`, so:
  *  - the shuffle/partitioning key becomes the fixed-width hash;
  *  - sort-merge comparisons resolve on 8 bytes except for true
  *    matches and 1-in-2^60 collisions;
  *  - the retained full equality keeps results exactly identical.
  *
  * Deliberately narrow trigger: both sides must be string columns
  * named `sequence` (the domain's long-key convention, SURVEY §1.2).
  * Registered via [[graft.functions.GraftSparkExtensions]] /
  * [[install]].
  */
object SequenceJoinRewrite extends Rule[LogicalPlan] {

  private def isSequenceCol(e: Expression): Boolean = e match {
    case a: AttributeReference =>
      a.name.equalsIgnoreCase("sequence") && a.dataType == StringType
    case _ => false
  }

  private def rewriteCondition(cond: Expression): Expression =
    cond.transformUp {
      case eq @ EqualTo(l, r)
          if isSequenceCol(l) && isSequenceCol(r) =>
        And(EqualTo(Hex60(l), Hex60(r)), eq)
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, _, Some(cond), _)
        if cond.exists {
          case EqualTo(l, r) => isSequenceCol(l) && isSequenceCol(r)
          case _ => false
        } && !alreadyRewritten(cond) =>
      j.copy(condition = Some(rewriteCondition(cond)))
  }

  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists { case _: Hex60 => true; case _ => false }

  /** Idempotent session-level installation (the config-free path;
    * cluster deployments use `spark.sql.extensions`). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val o = spark.sessionState.experimentalMethods
    if (!o.extraOptimizations.exists(_ eq SequenceJoinRewrite))
      o.extraOptimizations = o.extraOptimizations :+ SequenceJoinRewrite
  }
}
