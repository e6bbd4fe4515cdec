package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pushdown-recovery rule for watermark scans over raw epoch-nanos
  * columns (SURVEY.md S2; the sf fixtures carry TIMESTAMP(NANOS) read as
  * long + `timestamp_micros(ts div 1000)`).
  *
  * The envelope view derives its event time as
  * `timestamp_micros(ts div 1000)`; a watermark predicate
  * `derived >= W` is then a function of `ts`, which the parquet data
  * source cannot push — so at scale an incremental sync would scan every
  * row group of a 100 TB table to discard almost all of it. This rule
  * ADDS the implied raw-column conjunct
  *
  *   ts >= micros(W)·1000 − 999
  *
  * (the −999 keeps it sound for truncating division of negative
  * epochs), which pushes into the scan as a plain
  * `GreaterThanOrEqual(ts, …)` and prunes row groups by their min/max
  * stats. The original exact predicate stays in place — the rule never
  * changes results, only what the scan can skip.
  *
  * Injection: `SparkSessionExtensions.injectOptimizerRule` (see
  * [[graft.functions.GraftExtensions]]) or imperatively via
  * [[NanoWatermarkPushdown.install]].
  */
object NanoWatermarkPushdown extends Rule[LogicalPlan] {

  /** micros → nanos lower bound, None on overflow. */
  private def nanosLowerBound(micros: Long): Option[Long] =
    // <=: micros == MinValue/1000 still underflows after the −999
    if (micros > (Long.MaxValue - 999L) / 1000L || micros <= Long.MinValue / 1000L) None
    else Some(micros * 1000L - 999L)

  /** Matches `timestamp_micros(attr div 1000)` over a long column. */
  private object DerivedMicros {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => (d.left, d.right) match {
        case (attr: AttributeReference, Literal(1000L, LongType))
            if attr.dataType == LongType => Some(attr)
        case _ => None
      }
      case _ => None
    }
  }

  /** Top-level conjuncts only: recurse through And, never into Or /
    * CaseWhen / Not — a watermark comparison inside a disjunct does NOT
    * imply the bound for the whole filter (`p OR ts >= W` admits rows
    * that satisfy only `p`), so harvesting it would silently drop rows. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val implied = conjuncts(cond).collect {
        case GreaterThanOrEqual(DerivedMicros(attr), Literal(w: Long, TimestampType)) =>
          nanosLowerBound(w).map(lb => GreaterThanOrEqual(attr, Literal(lb, LongType)))
        case LessThanOrEqual(Literal(w: Long, TimestampType), DerivedMicros(attr)) =>
          nanosLowerBound(w).map(lb => GreaterThanOrEqual(attr, Literal(lb, LongType)))
        case GreaterThan(DerivedMicros(attr), Literal(w: Long, TimestampType)) =>
          nanosLowerBound(w).map(lb => GreaterThanOrEqual(attr, Literal(lb, LongType)))
      }.flatten.distinct
        .filterNot(e => cond.exists(_.semanticEquals(e))) // fixed-point safe
        .filter(_.references.subsetOf(child.outputSet))
      if (implied.isEmpty) f
      else Filter(implied.foldLeft(cond)(And(_, _)), child)
  }

  /** Idempotent imperative installation on a live session (the
    * extensions path covers sessions built with the extension class). */
  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.contains(this))
      spark.experimental.extraOptimizations = current :+ this
  }
}
