package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Domain optimizer rule: cosine similarity of a vector with itself is
  * 1.0 — rewrite `cosine_similarity(x, x)` to a literal, eliminating two
  * array traversals per row. A tiny but real instance of the
  * `Rule[LogicalPlan]` extension point (SURVEY.md §7: "custom Catalyst
  * work — none required; optional where profiling justifies"): injected
  * via `GraftExtensions`, it runs inside Catalyst's optimizer alongside
  * the built-in rules.
  *
  * (Semantics note: exact only for non-zero finite vectors — a zero
  * vector yields NaN in the unrewritten form. The engine's embedding
  * columns are unit-normalized upstream, never zero; documented contract.)
  */
object SelfCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // !nullable guard: a NULL input must keep returning NULL, and the
      // rewritten literal is non-nullable — only fold when the child
      // can't be NULL.
      case CosineSimilarity(a, b)
          if a.semanticEquals(b) && a.deterministic && !a.nullable =>
        Literal(1.0, DoubleType)
    }
}
