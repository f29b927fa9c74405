package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` to the
  * HyperLogLog++ sketch (`approx_count_distinct` semantics) when the
  * session sets `spark.graft.approxDistinct.enabled=true`.
  *
  * Why a RULE and not a rewritten query: at 100 TB an exact distinct
  * count shuffles every distinct value (Spark plans it as a two-phase
  * expand + re-aggregate — the key space is the data), while HLL++ is
  * single-pass, fixed-memory and mergeable. A pipeline owner flips one
  * session conf to trade exactness for that plan across EVERY query
  * the session runs — dashboards, ad-hoc SQL, the registered queries —
  * without editing any of them. The default is off: correctness-gated
  * paths (the DuckDB oracle hashes exact values) never see the
  * rewrite unless a session explicitly asks for it.
  *
  * Scope is deliberately narrow:
  *  - only single-argument `COUNT(DISTINCT x)` — multi-arg distinct
  *    counts have no single-sketch equivalent (a struct-wrap changes
  *    null semantics: COUNT(DISTINCT a, b) drops rows where ANY arg
  *    is null, a struct is non-null when its fields are), so they are
  *    left exact rather than silently altered;
  *  - `FILTER (WHERE ...)` clauses are preserved (the rewrite swaps
  *    the aggregate function, not the aggregate expression around it);
  *  - other distinct aggregates (SUM(DISTINCT), AVG(DISTINCT)) are
  *    untouched — a sketch cannot reproduce them.
  *
  * Both sides ignore nulls (exact COUNT DISTINCT and HLL++ alike), so
  * null semantics are unchanged. Estimation error is bounded by
  * `spark.graft.approxDistinct.rsd` (default 0.02, same as Spark's
  * `approx_count_distinct` default).
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`, so `spark.sql.extensions=graft.functions.
  * GraftExtensions` is the only wiring a cluster needs.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.approxDistinct.enabled"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val conf = SQLConf.get
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.02").toDouble
      plan.transform {
        case a: Aggregate =>
          a.transformExpressions {
            case ae @ AggregateExpression(c: Count, _, true, _, _)
                if c.children.lengthCompare(1) == 0 =>
              ae.copy(
                aggregateFunction =
                  HyperLogLogPlusPlus(c.children.head, rsd),
                isDistinct = false)
          }
      }
    }
  }
}
