package graft.sqlfront

import graft.model.Catalog
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

/** Fail-closed security gates for SQL transports (reference:
  * core/transport_security.py:1-197).
  *
  * A SQL transport (server endpoint, MCP tool, notebook bridge) accepts
  * arbitrary SQL text. When any model declares an access/row policy or a
  * field is non-public, text the semantic rewriter cannot fully claim
  * must be REFUSED rather than passed through: a passthrough read of the
  * underlying source tables would bypass every gate the structured path
  * enforces. The checks here are deliberately conservative — anything
  * that cannot be PROVEN to route through the semantic layer is denied
  * (the reference treats even unparseable SQL as unsafe,
  * transport_security.py:36-37).
  *
  * Plan-level detection instead of the reference's sqlglot re-parse:
  * Spark's own parser already produced the logical plan, so source
  * reads are `UnresolvedRelation` nodes (including inside expression
  * subqueries via `collectWithSubqueries`) and expression subqueries
  * are `SubqueryExpression`s — no second grammar, same contract.
  */
object TransportSecurity {

  /** Any model declares an access gate or row policy
    * (transport_security.py:8-10). */
  def hasDeclaredSecurity(cat: Catalog): Boolean =
    cat.models.values.exists(_.security.isDefined)

  /** Any semantic field is hidden (`public: false`). Graft enforces
    * visibility unconditionally at plan time, so a declared restriction
    * IS an enforced restriction (the reference keys off its layer-level
    * `enforce_visibility` flag, transport_security.py:13-22). */
  def hasEnforcedColumnRestrictions(cat: Catalog): Boolean =
    cat.models.values.exists(m =>
      m.dimensions.exists(!_.public) || m.metrics.exists(!_.public))

  def controlsAreActive(cat: Catalog): Boolean =
    hasDeclaredSecurity(cat) || hasEnforcedColumnRestrictions(cat)

  /** Source tables that are neither semantic models, the `metrics`
    * virtual table, nor CTEs *in scope at the point of reference*
    * (transport_security.py:41-66; the reference resolves sources per
    * scope via sqlglot's traverse_scope). Multipart names (db.table,
    * format.`path`) are always unrecognized — they are physical reads
    * by construction.
    *
    * Scope rules are SQL's own: a CTE definition sees only the CTEs
    * declared *before* it in the same WITH (plus outer scopes) — never
    * itself and never later siblings. A name that merely collides with
    * a CTE but is read where that CTE is not in scope (e.g.
    * `t AS (SELECT * FROM t)`) is a physical/temp-view read and must
    * be reported, not whitelisted: [[graft.sqlfront.SqlFront]] compiles
    * such a definition via plain Spark SQL, so a global-name whitelist
    * would let raw table contents through the fail-closed gate.
    *
    * Model names deliberately compare CASE-SENSITIVELY: the gate may
    * recognize no more than the rewriter actually claims, and the
    * rewriter resolves model names exactly. Were the gate alone
    * case-insensitive, `WITH x AS (<semantic>) SELECT * FROM Orders`
    * against model `orders` would pass the gate, fail the rewrite, and
    * fall to plain Spark SQL — which resolves identifiers
    * case-insensitively and would return the raw relation with no
    * access gate or row filters. A case-mismatched reference is
    * therefore refused (fail-closed; the reference lowercases both
    * sides only because sqlglot normalizes both sides). */
  def unrecognizedSources(plan: LogicalPlan, cat: Catalog): Seq[String] = {
    val bad = scala.collection.mutable.Set.empty[String]
    def walk(p: LogicalPlan, scope: Set[String]): Unit = {
      p match {
        case w: UnresolvedWith =>
          var s = scope
          w.cteRelations.foreach { case (name, defn, _) =>
            walk(defn, s) // earlier siblings + outer scope only
            s += name.toLowerCase
          }
          walk(w.child, s)
        case ur: UnresolvedRelation =>
          val parts = ur.multipartIdentifier
          val ok = parts.size == 1 && {
            val n = parts.head.toLowerCase
            cat.models.contains(parts.head) || n == "metrics" || scope(n)
          }
          if (!ok) bad += parts.mkString(".")
        case other =>
          other.children.foreach(walk(_, scope))
      }
      p.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => walk(sq.plan, scope)
        case _ => ()
      })
    }
    walk(plan, Set.empty)
    bad.toSeq.sorted
  }

  /** A SELECT in expression position — predicate/projection subqueries
    * (`WHERE x IN (SELECT …)`, scalar subqueries) read sources outside
    * any scope the rewriter secures (transport_security.py:68-94).
    * FROM-position subqueries and CTEs are plan nodes, not expressions,
    * so they are untouched. */
  def hasExpressionSubquery(plan: LogicalPlan): Boolean = {
    var found = false
    plan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: SubqueryExpression => found = true
        case _ => ()
      })
    }
    found
  }

  /** Conservative "reads anything at all" — mirrors the reference's
    * `_reads_from_source` (any table node counts, INCLUDING references
    * to the query's own CTEs, transport_security.py:28-39): a
    * passthrough that touches any relation cannot be proven safe. */
  def readsAnySource(plan: LogicalPlan): Boolean =
    plan.collectWithSubqueries { case ur: UnresolvedRelation => ur }.nonEmpty

  /** Disable a raw-SQL bypass entirely while controls are active
    * (transport_security.py:185-197). */
  def denyRawSql(cat: Catalog, transport: String): Unit = {
    val controls = Seq(
      if (hasDeclaredSecurity(cat)) Some("model access/row policies") else None,
      if (hasEnforcedColumnRestrictions(cat))
        Some("column visibility restrictions")
      else None).flatten
    if (controls.nonEmpty) throw new SecurityException(
      s"$transport is disabled: ${controls.mkString(" and ")} are in " +
        "force, and a raw database channel would sidestep them entirely. " +
        "Route queries through the semantic layer (structured API or " +
        "semantic SQL).")
  }
}
