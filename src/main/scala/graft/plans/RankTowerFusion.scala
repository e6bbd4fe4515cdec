package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.{Final, Partial, WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.internal.SQLConf

/** Plans a stacked pair of rank windows — the engine's ubiquitous
  * "best-X-per-(q,sub), then top-k-per-q" serve tower
  * ([[graft.operators.VectorOps]]'s MaxSim rank,
  * [[graft.operators.TextOps.bm25ChunkTopKFrom]]'s best-chunk rank) —
  * through ONE exchange instead of two (optimization guide §2.4:
  * "window functions partitioned by the same key as a preceding
  * [operation] do not need a second shuffle").
  *
  * Default planning of
  *
  * {{{ Window(rank over P∪S) → filter → Window(rank over P) → filter }}}
  *
  * inserts `Exchange(hash(P∪S))` under the inner window and
  * `Exchange(hash(P))` under the outer one, because EnsureRequirements
  * always materializes a required ClusteredDistribution with ALL its
  * keys. But `hash(P)` already satisfies ClusteredDistribution(P∪S) —
  * every (P∪S) group is wholly inside one P partition — so ONE
  * exchange keyed by the SUBSET serves both windows. This strategy
  * emits exactly that plan, keeping the map-side
  * [[WindowGroupLimitExec]] Partial prune BELOW the exchange (the
  * r20-adjudicated scale requirement: each rank exchange moves ≤ limit
  * rows per group per map partition, so fusing never moves more bytes
  * than the two-exchange plan — it only moves them once).
  *
  * Soundness: the rewrite only changes WHERE rows are routed, never
  * which rows share a window partition (coarser co-location) nor the
  * intra-partition sort (unchanged, enforced by EnsureRequirements
  * from the unchanged operator requirements). Rank values are
  * identical for any total per-partition ordering; the engine's rank
  * orderings all tie-break on a unique key (chunk_id / doc_id /
  * vec_id), and every consumer is oracle-hash-gated.
  *
  * Fires only on the exact shape it understands: two
  * `Window(_, P2, _, WindowGroupLimit(P2, _, _, _, mid))` towers with
  * attribute-only partition specs, `P2` a strict non-empty subset of
  * `P1`, and `mid` a pure Project/Filter chain. Everything else falls
  * through to default planning (returns Nil).
  */
object RankTowerFusion extends SparkStrategy {

  /** Attribute-only partition specs, compared by exprId. Non-attribute
    * partition expressions (computed keys) are left to default
    * planning — the subset check below would need alias tracing
    * through `mid` to stay sound. */
  private def attrs(es: Seq[Expression]): Option[Seq[Attribute]] =
    if (es.forall(_.isInstanceOf[Attribute])) Some(es.map(_.asInstanceOf[Attribute]))
    else None

  private def sameSpec(a: Seq[Expression], b: Seq[Expression]): Boolean =
    a.length == b.length && a.zip(b).forall { case (x, y) => x.semanticEquals(y) }

  /** `mid` may only reorder/drop/rename columns or filter rows between
    * the two windows (Project/Filter chain). Returns the chain
    * outermost-first plus the inner plan. */
  private def unwrapMid(p: LogicalPlan,
      acc: List[LogicalPlan] = Nil): (List[LogicalPlan], LogicalPlan) = p match {
    case pr @ Project(_, child) => unwrapMid(child, acc :+ pr)
    case f @ Filter(_, child)   => unwrapMid(child, acc :+ f)
    case other                  => (acc, other)
  }

  private def rebuildMid(chain: List[LogicalPlan], inner: SparkPlan): SparkPlan =
    chain.foldRight(inner) {
      case (Project(list, _), c) => ProjectExec(list, c)
      case (Filter(cond, _), c)  => FilterExec(cond, c)
      case (other, _) => sys.error(s"unexpected mid node $other") // unreachable
    }

  /** True when the subtree below the inner tower would ALREADY arrive
    * partitioned compatibly with hash(p2) — a lower Window or Aggregate
    * whose keys are a subset of p2 establishes (through its own
    * exchange) a partitioning that satisfies BOTH towers' clustered
    * distributions, so default planning needs no exchange here at all
    * and inserting ours would ADD a shuffle (the x91/x94 curve
    * harness's (q,np)→(q,np,r,doc)→(q,np,r) stacks are exactly this
    * shape). Walks through row-local unary nodes only. */
  private def alreadyClusteredBelow(p: LogicalPlan, p2: Seq[Attribute]): Boolean = {
    @scala.annotation.tailrec
    def walk(n: LogicalPlan): Boolean = n match {
      case Project(_, c)  => walk(c)
      case Filter(_, c)   => walk(c)
      case g: logical.Generate => walk(g.child)
      case w: Window =>
        w.partitionSpec.nonEmpty &&
          w.partitionSpec.forall(e => p2.exists(_.semanticEquals(e)))
      case a: logical.Aggregate =>
        a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall(e => p2.exists(_.semanticEquals(e)))
      case r: logical.RepartitionByExpression =>
        r.partitionExpressions.nonEmpty &&
          r.partitionExpressions.forall(e => p2.exists(_.semanticEquals(e)))
      case _ => false
    }
    walk(p)
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Window(we2, p2, o2, WindowGroupLimit(p2b, o2b, rf2, k2, mid), _)
        if p2.nonEmpty && sameSpec(p2, p2b) && sameSpec(o2, o2b) =>
      val (chain, inner) = unwrapMid(mid)
      (attrs(p2), inner) match {
        case (Some(a2), Window(we1, p1, o1, WindowGroupLimit(p1b, o1b, rf1, k1, child), _))
            if sameSpec(p1, p1b) && sameSpec(o1, o1b) &&
              attrs(p1).exists(a1 =>
                a1.length > a2.length &&
                  a2.forall(x => a1.exists(_.semanticEquals(x)))) &&
              !alreadyClusteredBelow(child, a2) =>
          // one exchange, keyed by the OUTER (subset) partition spec;
          // the inner window's Partial group-limit prunes below it
          val partial = WindowGroupLimitExec(p1, o1, rf1, k1, Partial,
            planLater(child))
          val shuffle = ShuffleExchangeExec(
            HashPartitioning(p2, SQLConf.get.numShufflePartitions),
            partial, ENSURE_REQUIREMENTS, None)
          val w1 = WindowExec(we1, p1, o1,
            WindowGroupLimitExec(p1, o1, rf1, k1, Final, shuffle))
          // hash(P2) satisfies both windows' ClusteredDistributions, so
          // EnsureRequirements adds only the local sorts each rank needs
          WindowExec(we2, p2, o2,
            WindowGroupLimitExec(p2, o2, rf2, k2, Final,
              rebuildMid(chain, w1))) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }

  /** Idempotent imperative installation on a live session (the
    * extensions path covers sessions built with the extension class).
    *
    * Also lifts `spark.sql.requireAllClusterKeysForCoPartition` (a
    * planner conservatism toggle, default true): the fused towers end
    * partitioned by `hash(P2)` = hash(query_id), and the downstream
    * fusion join on (query_id, doc_id) can only REUSE that
    * partitioning when EnsureRequirements is allowed to accept
    * subset-keyed co-partitioning (guide §2.4: "a join whose inputs
    * are already co-partitioned but not recognised as such"). The
    * relaxed check never adds a shuffle — it only skips provably
    * redundant ones — and join/window results are partition-layout
    * independent (every consumer is oracle-gated). */
  def install(spark: SparkSession): Unit =
    // measurement escape hatch for A/B isolation (guide §1): set
    // SPARK_GRAFT_NO_RTF=1 to bench the unfused plans; never set by
    // the driver, absent in production
    if (!sys.env.get("SPARK_GRAFT_NO_RTF").contains("1")) {
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val current = spark.experimental.extraStrategies
      if (!current.contains(this))
        spark.experimental.extraStrategies = current :+ this
    }
}
