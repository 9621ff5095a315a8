package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.GraftStoreFileIndex

/** RUNTIME bucket pruning for the `graftstore` data source — the
  * join-shaped twin of the FileIndex's literal pruning, and the SQL
  * twin of [[graft.graph.GraphStore.probe]] driven by a table.
  *
  * The FileIndex prunes a scan whose anchor key is pinned by LITERAL
  * `=`/`IN` conjuncts at planning time. But the natural BI-tool probe
  * is join-shaped — `store JOIN dims ON store.name = dims.name`, or
  * `WHERE name IN (SELECT …)` (a left-semi join after subquery
  * rewrite) — where the anchor values exist only at runtime. Without
  * this rule such a query scans every live bucket of a 100 TB store.
  *
  * The store's layout makes the runtime prune DERIVABLE: a row with
  * anchor key k lives in exactly bucket `pmod(murmur3(k), width)`
  * (EventStreams.bucketCol — the writers' own hash), and the bucket id
  * is the relation's `_graft_bucket` PARTITION column. So for a join
  * that equates every bucket-key column of a graftstore relation with
  * expressions from the other side, this rule inserts
  *
  * {{{ Filter(DynamicPruningSubquery(_graft_bucket, otherSide,
  *            Seq(pmod(murmur3(otherKeys…), width)), …), relation) }}}
  *
  * — Spark's OWN dynamic-partition-pruning expression, which the
  * engine then plans (distinct-aggregate subquery, broadcast reuse
  * when available) and FileSourceScanExec evaluates against the
  * partition values at execution: only the buckets some other-side
  * key actually hashes to are read. Stock DPP cannot derive this (the
  * join key is a FUNCTION of the partition column, not the column);
  * the rule states the derivation, the engine does the work.
  *
  * Soundness:
  *  - the inserted predicate only REMOVES store rows whose bucket no
  *    other-side key hashes to — such rows cannot satisfy the join
  *    equality (same hash function, same width, same key types), so
  *    results are unchanged for Inner/LeftSemi joins and for the
  *    preserved side of outer joins (same prune-side legality as
  *    Spark's PartitionPruning: prune left under Inner/LeftSemi/
  *    RightOuter, right under Inner/LeftOuter);
  *  - key lineage is traced with Catalyst's own
  *    `findExpressionAndTrackLineageDown` (through Project aliases and
  *    Aggregate group keys — group-key filters drop whole groups that
  *    the equality would drop anyway), and the other-side expression
  *    must carry the store column's exact type (a type-coerced join
  *    would hash differently — skipped, conservative);
  *  - a NULL other-side key hashes to some bucket and keeps it live —
  *    harmless (equality never matches null), never wrong.
  *
  * Cost gate: the subquery re-executes the other side once (aggregated
  * to ≤ width distinct ints, so the overhead is one scan of the dim
  * side, nothing driver-sized). That trade only pays when the store
  * side is too big to broadcast anyway, so relations smaller than
  * `spark.graft.store.dynamicPrune.minBytes` (default: the session's
  * autoBroadcastJoinThreshold) are left alone — exactly the tables a
  * BroadcastHashJoin already handles without scanning cost.
  *
  * Registered per session via `experimental.extraOptimizations`
  * (public API; the batch runs AFTER the built-in optimizer, so
  * subquery rewriting has already turned IN-subqueries into the
  * left-semi joins this rule matches) by
  * [[graft.sources.GraftStoreSource]] on first relation construction.
  */
object StoreBucketPruning extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case j @ Join(left, right, joinType, Some(cond), _) =>
        val newLeft =
          if (canPruneLeft(joinType)) pruneSide(left, right, cond)
          else left
        val newRight =
          if (canPruneRight(joinType)) pruneSide(right, left, cond)
          else right
        if ((newLeft eq left) && (newRight eq right)) j
        else j.copy(left = newLeft, right = newRight)
    }

  // same prune-side legality as Spark's own PartitionPruning rule
  private def canPruneLeft(t: JoinType): Boolean = t match {
    case Inner | LeftSemi | RightOuter => true
    case _ => false
  }
  private def canPruneRight(t: JoinType): Boolean = t match {
    case Inner | LeftOuter => true
    case _ => false
  }

  /** `side` with a DynamicPruningSubquery filter inserted atop its
    * graftstore relation, when the join condition pins every bucket
    * key — unchanged (reference-equal) otherwise. */
  private def pruneSide(side: LogicalPlan, other: LogicalPlan,
      cond: Expression): LogicalPlan = {
    // idempotence under the fixed-point batch (and no stacked prunes):
    // one dynamic prune per side subtree
    if (side.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[DynamicPruning])))) return side
    val minBytes = conf
      .getConfString("spark.graft.store.dynamicPrune.minBytes",
        conf.autoBroadcastJoinThreshold.toString).toLong
    val candidates = side.collect {
      case r: LogicalRelation if r.relation.isInstanceOf[HadoopFsRelation]
          && r.relation.asInstanceOf[HadoopFsRelation].location
            .isInstanceOf[GraftStoreFileIndex] => r
    }
    val equalities = splitConjunctivePredicates(cond).collect {
      case EqualTo(l, r) => (l, r)
    }
    candidates.iterator.flatMap { r =>
      val index = r.relation.asInstanceOf[HadoopFsRelation].location
        .asInstanceOf[GraftStoreFileIndex]
      pruneFor(r, index, side, other, equalities, minBytes)
    }.nextOption() match {
      case None => side
      case Some((rel, pruning)) =>
        side.transformUp {
          case node if node eq rel => Filter(pruning, rel)
        }
    }
  }

  /** The pruning filter for relation `r`, when every one of its bucket
    * keys is equated (with exact lineage and exact type) to an
    * other-side expression. */
  private def pruneFor(r: LogicalRelation, index: GraftStoreFileIndex,
      side: LogicalPlan, other: LogicalPlan,
      equalities: Seq[(Expression, Expression)], minBytes: Long)
      : Option[(LogicalRelation, Expression)] = {
    val keys = index.anchorKeys
    val width = index.bucketWidth
    if (keys.isEmpty || width <= 0) return None
    // a store the planner can just broadcast doesn't need pruning —
    // skip, and skip the subquery's extra dim-side scan with it
    if (index.sizeInBytes < minBytes) return None
    val bucketAttr = r.output.find(
      _.name == GraftStoreFileIndex.BucketCol).getOrElse(return None)
    val storeAttrs = keys.map(k =>
      r.output.find(a => conf.resolver(a.name, k)).getOrElse(return None))
    // for each bucket key: an equality whose one side traces down
    // `side` to exactly this relation attribute, and whose other side
    // is computable from `other` with the store column's exact type
    val otherExprs = storeAttrs.map { sa =>
      equalities.iterator.flatMap { case (l, rgt) =>
        def traced(e: Expression): Boolean =
          e.references.subsetOf(side.outputSet) &&
            findExpressionAndTrackLineageDown(e, side).exists {
              case (resExp: Attribute, leaf) =>
                (leaf eq r) && resExp.exprId == sa.exprId
              case _ => false
            }
        def usable(e: Expression): Boolean =
          e.references.nonEmpty &&
            e.references.subsetOf(other.outputSet) && e.deterministic &&
            e.dataType == sa.dataType
        if (traced(l) && usable(rgt)) Some(rgt)
        else if (traced(rgt) && usable(l)) Some(l)
        else None
      }.nextOption().getOrElse(return None)
    }
    // the writers' exact bucket derivation, over the other side's key
    // expressions in persisted key order: pmod(murmur3(keys), width)
    val buildKey = Pmod(new Murmur3Hash(otherExprs),
      Literal(width))
    Some((r, DynamicPruningSubquery(bucketAttr, other,
      Seq(buildKey), Seq(0), onlyInBroadcast = false)))
  }
}
