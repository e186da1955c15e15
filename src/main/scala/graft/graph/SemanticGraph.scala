package graft.graph

import graft.model.{Catalog, Model, Relationship}
import scala.collection.mutable

/** One directed hop in a resolved join path.
  *
  * @param fromModel model already in the plan
  * @param toModel   model being joined in
  * @param fromKeys  equi-join key columns on fromModel
  * @param toKeys    equi-join key columns on toModel
  * @param fanOut    true when this hop can multiply fromModel's rows
  *                  (one_to_many / many_to_many leg / cross)
  * @param sqlOn     custom join condition with {from}/{to} placeholders
  */
final case class JoinHop(
    fromModel: String,
    toModel: String,
    fromKeys: Seq[String],
    toKeys: Seq[String],
    fanOut: Boolean,
    cross: Boolean = false,
    oneToOne: Boolean = false,
    sqlOn: Option[String] = None
)

/** Join-graph resolution: models are nodes, relationships are bidirectional
  * edges (one_to_many auto-inverts to many_to_one), many_to_many expands
  * through its junction model. BFS finds the unique shortest path; ties that
  * cannot be broken by preferring in-query intermediates are a hard error.
  *
  * Same algorithm family as the reference (core/semantic_graph.py:310-561),
  * re-derived for an immutable Scala catalog. Pure metadata — runs on the
  * driver in O(V+E), never touches data.
  */
final class SemanticGraph(cat: Catalog) {

  /** Directed edge set: every relationship yields a forward and an inverse
    * edge so BFS can traverse either direction. */
  private case class Edge(from: String, to: String, hops: Seq[JoinHop])

  private lazy val edges: Seq[Edge] = cat.models.values.toSeq
    .sortBy(_.name)
    .flatMap(m => m.relationships.flatMap(r => expand(m, r)))
    // the same relationship declared from both sides (owner's many_to_one +
    // target's one_to_many) collapses to one edge per direction — parallel
    // duplicates would read as a false ambiguity in BFS
    .distinctBy(e => (e.from, e.to))

  /** Custom `sql` conditions write {from}/{to} relative to the DECLARING
    * model; traversing the edge backwards must swap them. */
  private def invertPlaceholders(sqlOn: Option[String]): Option[String] =
    sqlOn.map(_.replace("{from}", "{__swap__}")
      .replace("{to}", "{from}").replace("{__swap__}", "{to}"))

  private def pkOf(name: String): Seq[String] = {
    val pk = cat.model(name).primaryKey
    require(pk.nonEmpty, s"Model '$name' used in a join needs a primary_key")
    pk
  }

  private def expand(owner: Model, r: Relationship): Seq[Edge] = r.relType match {
    case "many_to_one" | "one_to_one" =>
      val o2o = r.relType == "one_to_one"
      val toKeys = if (r.primaryKey.nonEmpty) r.primaryKey else pkOf(r.to)
      val fk = if (r.foreignKey.nonEmpty) r.foreignKey else toKeys
      val fwd = JoinHop(owner.name, r.to, fk, toKeys, fanOut = false, oneToOne = o2o)
      val inv = JoinHop(r.to, owner.name, toKeys, fk,
        fanOut = !o2o, oneToOne = o2o, sqlOn = invertPlaceholders(r.sqlOn))
      Seq(Edge(owner.name, r.to, Seq(fwd.copy(sqlOn = r.sqlOn))),
          Edge(r.to, owner.name, Seq(inv)))
    case "one_to_many" =>
      // owner 1→N related: joining related onto owner fans out
      val ownerPk = if (r.primaryKey.nonEmpty) r.primaryKey else pkOf(owner.name)
      val fk = if (r.foreignKey.nonEmpty) r.foreignKey else ownerPk
      Seq(Edge(owner.name, r.to,
            Seq(JoinHop(owner.name, r.to, ownerPk, fk, fanOut = true, sqlOn = r.sqlOn))),
          Edge(r.to, owner.name,
            Seq(JoinHop(r.to, owner.name, fk, ownerPk, fanOut = false,
              sqlOn = invertPlaceholders(r.sqlOn)))))
    case "many_to_many" =>
      val junction = r.through.getOrElse(throw new IllegalArgumentException(
        s"many_to_many ${owner.name}→${r.to} needs 'through'"))
      val ownerPk = pkOf(owner.name)
      val targetPk = pkOf(r.to)
      val jFk = if (r.throughForeignKey.nonEmpty) r.throughForeignKey else ownerPk
      val jRk = if (r.relatedForeignKey.nonEmpty) r.relatedForeignKey else targetPk
      // two-hop expansion through the junction, both directions; each leg
      // that lands on the junction fans out.
      Seq(
        Edge(owner.name, r.to, Seq(
          JoinHop(owner.name, junction, ownerPk, jFk, fanOut = true),
          JoinHop(junction, r.to, jRk, targetPk, fanOut = false))),
        Edge(r.to, owner.name, Seq(
          JoinHop(r.to, junction, targetPk, jRk, fanOut = true),
          JoinHop(junction, owner.name, jFk, ownerPk, fanOut = false))))
    case "cross" =>
      Seq(Edge(owner.name, r.to,
            Seq(JoinHop(owner.name, r.to, Nil, Nil, fanOut = true, cross = true))),
          Edge(r.to, owner.name,
            Seq(JoinHop(r.to, owner.name, Nil, Nil, fanOut = true, cross = true))))
    case other =>
      throw new IllegalArgumentException(s"Unknown relationship type '$other'")
  }

  private lazy val adj: Map[String, Seq[Edge]] = edges.groupBy(_.from)

  /** BFS shortest path base→target. Ambiguity (two shortest paths of equal
    * length whose tie survives the prefer-in-query heuristic) is an error —
    * silently picking one would silently change query semantics. */
  def path(base: String, target: String, inQuery: Set[String]): Seq[JoinHop] = {
    if (base == target) return Nil
    // level-order BFS tracking ALL shortest predecessors to detect ambiguity
    val dist = mutable.Map(base -> 0)
    val preds = mutable.Map[String, List[(String, Edge)]]().withDefaultValue(Nil)
    val queue = mutable.Queue(base)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for (e <- adj.getOrElse(u, Nil)) {
        val d = dist(u) + 1
        dist.get(e.to) match {
          case None =>
            dist(e.to) = d; preds(e.to) ::= (u, e); queue.enqueue(e.to)
          case Some(existing) if existing == d =>
            preds(e.to) ::= (u, e)
          case _ => ()
        }
      }
    }
    if (!dist.contains(target))
      throw new IllegalArgumentException(
        s"No join path from '$base' to '$target'")
    // reconstruct; at each step, if multiple shortest predecessors exist,
    // prefer ones already referenced by the query, else fail as ambiguous
    val hops = mutable.ListBuffer[JoinHop]()
    var cur = target
    while (cur != base) {
      val options = preds(cur).distinct
      val chosen =
        if (options.size == 1) options.head
        else {
          val preferred = options.filter { case (p, _) => inQuery(p) || p == base }
          if (preferred.size == 1) preferred.head
          else throw new IllegalArgumentException(
            s"Ambiguous join path from '$base' to '$target' via " +
              options.map(_._1).mkString("{", ", ", "}") +
              " — add an explicit intermediate model to the query")
        }
      hops.prependAll(chosen._2.hops)
      cur = chosen._1
    }
    hops.toList
  }

  /** Resolve the minimal join plan covering all query models: BFS from the
    * base to each other model, dedup shared hop prefixes (join pruning — only
    * referenced + path-intermediate models are joined; Catalyst cannot drop
    * a semantic join on its own). */
  def joinPlan(base: String, others: Seq[String]): Seq[JoinHop] = {
    val inQuery = (base +: others).toSet
    val seen = mutable.LinkedHashSet[(String, String)]()
    val plan = mutable.ListBuffer[JoinHop]()
    for (t <- others if t != base; hop <- path(base, t, inQuery)) {
      val key = (hop.fromModel, hop.toModel)
      if (!seen(key)) { seen += key; plan += hop }
    }
    // order hops so each hop's fromModel is already joined
    val ordered = mutable.ListBuffer[JoinHop]()
    val joined = mutable.Set(base)
    var remaining = plan.toList
    while (remaining.nonEmpty) {
      val (ready, later) = remaining.partition(h => joined(h.fromModel))
      require(ready.nonEmpty, s"Disconnected join plan: ${remaining.mkString(";")}")
      ready.foreach { h => ordered += h; joined += h.toModel }
      remaining = later
    }
    ordered.toList
  }

  /** Models whose rows are multiplied in the joined frame — their non-
    * idempotent metrics need the symmetric / multi-fact route.
    *
    * Tracks which models stay row-unique as hops apply:
    *   - a fan-out hop (one_to_many) moves the frame to the target's grain:
    *     the target is unique iff its parent was; everything else loses
    *     uniqueness (branch fan-outs cross-multiply);
    *   - a many_to_one hop repeats the target across the frame (dimension
    *     tables are shared by many fact rows) — target never unique;
    *   - one_to_one inherits the source's uniqueness;
    *   - cross multiplies everything.
    * Stricter than the reference's from-base-only check
    * (generator.py:2500-2548): it also catches double-counting of metrics
    * declared on a many_to_one-joined dimension model. */
  def fannedOutModels(base: String, hops: Seq[JoinHop]): Set[String] = {
    var unique = Set(base)
    val joined = mutable.ListBuffer(base)
    for (h <- hops) {
      if (h.cross) unique = Set.empty
      else if (h.fanOut)
        unique = if (unique(h.fromModel)) Set(h.toModel) else Set.empty
      else if (h.oneToOne && unique(h.fromModel)) unique += h.toModel
      joined += h.toModel
    }
    joined.toSet -- unique
  }
}
