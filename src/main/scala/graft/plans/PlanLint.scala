package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan}
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Automated plan lint over every registered query (r8-verdict #8): the
  * three scale hazards rounds 7–8 fixed by hand, now asserted
  * mechanically on each query's physical/optimized plan so they cannot
  * regrow silently.
  *
  *   1. `cartesian` — a `CartesianProductExec` anywhere. Bounded scalar
  *      cross-joins plan as BroadcastNestedLoopJoin over one-row
  *      aggregates and never trip this; a true cartesian over fact rows
  *      does.
  *   2. `global-window` — a `WindowExec` with an EMPTY partition spec
  *      whose input is not provably bounded. A partition-less window
  *      serializes its whole input through ONE task; it is legitimate
  *      only over grain-bounded intermediates, which the lint
  *      recognizes structurally: the window's input subtree contains an
  *      aggregate (post-agg series — rows = grain cardinality), a
  *      limit/top-k, or a local/driver-side relation.
  *   3. `forced-broadcast` — an explicit `broadcast()` hint whose
  *      hinted side is DATA-DEPENDENT with nothing bounding it: the
  *      subtree contains a join but no aggregate, no limit, no counted
  *      checkpoint leaf ([[graft.operators.Joins.broadcastIfSmall]]
  *      produces exactly such a leaf), and no local relation. A plain
  *      dimension-scan broadcast (size fixed by the table) passes.
  *
  * Queries that run their loops via internal actions (the iterative
  * graph family) return driver-local stats frames; their internal round
  * plans are pinned by the operator specs instead — the lint grades
  * what the RETURNED frame executes, like the driver does.
  *
  * Exceptions are allowlisted WITH REASONS in [[allowed]]; the gate is
  * zero non-allowlisted hits, and the allowlist itself is part of the
  * report artifact so a reviewer sees every documented exception.
  */
object PlanLint {

  final case class Hit(query: String, rule: String, detail: String) {
    def json: String =
      s"""{"query":"$query","rule":"$rule","detail":"${detail.replace("\"", "'")}"}"""
  }

  /** Documented exceptions: (query, rule) → reason. */
  val allowed: Map[(String, String), String] = {
    val ivfProbe = "probe/ADC lookup table = query-batch × nprobe (or × " +
      "sub-codebook) pairs — the documented IVF/PQ dataflow " +
      "(Similarity.ivfTopK/pqTopK scaladoc): queries ≪ corpus and the " +
      "batch is bounded by the serving layer, so the broadcast is the " +
      "contract, not a guess about a data-dependent intermediate"
    Map(
      ("s_ivf_topk", "forced-broadcast") -> ivfProbe,
      ("s_ivf_recall_curve", "forced-broadcast") -> ivfProbe,
      ("s_pq_topk", "forced-broadcast") -> ivfProbe,
      ("s_ivfpq_topk", "forced-broadcast") -> ivfProbe)
  }

  private def boundedPhysical(p: SparkPlan): Boolean = p.exists {
    case _: BaseAggregateExec => true // post-agg series: rows = grain
    case _: LocalTableScanExec => true // driver-local stats frame
    case l if l.nodeName.contains("Limit") ||
      l.nodeName.contains("TakeOrderedAndProject") => true // top-k survivor set
    case _ => false
  }

  private def boundedLogical(p: LogicalPlan): Boolean = {
    val hasBoundingNode = p.exists {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalRelation => true
      case l if l.nodeName == "LogicalRDD" => true // counted checkpoint leaf
      case _ => false
    }
    // a subtree whose EVERY leaf is constant-size (literal ranges,
    // local rows, checkpoints) is bounded no matter how it is joined —
    // e.g. a 64×16 projection matrix built as range × range
    def constantLeaves = p.collectLeaves().forall {
      case _: LocalRelation => true
      case l => l.nodeName == "Range" || l.nodeName == "OneRowRelation" ||
        l.nodeName == "LogicalRDD"
    }
    hasBoundingNode || constantLeaves
  }

  /** Strip the AQE wrapper (lint the initial physical plan). */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.initialPlan
    case other => other
  }

  def lint(name: String, df: DataFrame): Seq[Hit] = {
    val physical = unwrap(df.queryExecution.executedPlan)
    val hits = Seq.newBuilder[Hit]

    physical.foreach {
      case c: CartesianProductExec =>
        hits += Hit(name, "cartesian", c.simpleStringWithNodeId())
      case w: WindowExec if w.partitionSpec.isEmpty && !boundedPhysical(w.child) =>
        hits += Hit(name, "global-window",
          s"partition-less window over unbounded input: ${w.child.nodeName}")
      case _ => ()
    }

    // forced-broadcast: inspect the OPTIMIZED logical plan, where
    // user `broadcast()` hints survive as JoinHint.BROADCAST on the
    // join node (AQE/stats-chosen broadcasts carry no hint)
    df.queryExecution.optimizedPlan.foreach {
      case j: Join =>
        def check(side: String,
            h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo],
            sub: LogicalPlan): Unit =
          if (h.exists(_.strategy.exists(_.toString.startsWith("broadcast"))) &&
              sub.exists(_.isInstanceOf[Join]) && !boundedLogical(sub))
            hits += Hit(name, "forced-broadcast",
              s"$side-side hint over unbounded join composition: ${sub.nodeName}")
        check("left", j.hint.leftHint, j.left)
        check("right", j.hint.rightHint, j.right)
      case _ => ()
    }

    hits.result().filterNot(h => allowed.contains((h.query, h.rule)))
  }

  /** Render the full report (hits + documented allowlist) as JSON. */
  def report(all: Seq[Hit]): String = {
    val hitsJson = all.map(_.json).mkString("[", ",", "]")
    val allowJson = allowed.map { case ((q, r), why) =>
      s"""{"query":"$q","rule":"$r","reason":"${why.replace("\"", "'")}"}"""
    }.mkString("[", ",", "]")
    s"""{"metric":"plan_lint","n_hits":${all.size},"hits":$hitsJson,"allowlisted":$allowJson}"""
  }
}
