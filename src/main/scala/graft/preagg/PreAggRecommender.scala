package graft.preagg

import graft.model.{Catalog, PreAggregation}
import graft.plan.{FieldRef, Grains, SemanticQuery}

/** Pre-aggregation recommender: mines the query history for repeated
  * (model × dimension-set × measure-set) shapes and proposes rollups that
  * would serve them (reference: core/preagg_recommender.py, fed by the
  * instrumentation comments generator.py:7218 — here the planner records
  * queries directly).
  *
  * Pure metadata — scoring is driver-side over recorded shapes, never
  * touches data.
  */
final class PreAggRecommender(cat: Catalog) {

  private case class Shape(model: String, dims: Set[String],
      timeDim: Option[String], grain: Option[String], measures: Set[String])

  private val history = scala.collection.mutable.ListBuffer[Shape]()

  /** Record a served query (call from wherever queries are executed). */
  def record(q: SemanticQuery): Unit = synchronized {
    val metricRefs = q.metrics.map(FieldRef.parse)
    val models = metricRefs.map(_.model).distinct
    if (models.size != 1) return // single-model rollups only (as reference)
    val model = cat.models.getOrElse(models.head, return)
    // only simple additive measures can ever be served by a rollup
    val measures = metricRefs.map(_.field).filter(f =>
      model.metric(f).exists(m => m.isSimple && m.filters.isEmpty &&
        m.agg.exists(Set("sum", "count", "avg", "min", "max"))))
    if (measures.size != metricRefs.size) return
    val dimRefs = q.dimensions.map(FieldRef.parse)
    if (dimRefs.exists(_.model != model.name)) return
    val (timeDims, plainDims) = dimRefs.partition(d => d.grain.isDefined ||
      model.dimension(d.field).exists(_.dimType == graft.model.DimType.Time))
    if (timeDims.size > 1) return
    history += Shape(model.name, plainDims.map(_.field).toSet,
      timeDims.headOption.map(_.field),
      timeDims.headOption.flatMap(_.grain), measures.toSet)
  }

  /** Propose rollups: shapes are grouped per model; a candidate rollup is
    * the union of dimensions/measures over the shapes it would serve, at
    * the finest requested grain. Returns candidates with ≥ `minHits`
    * supporting queries, most-supported first. */
  def recommend(minHits: Int = 2): Seq[(PreAggregation, Int)] = synchronized {
    history.groupBy(_.model).toSeq.flatMap { case (model, shapes) =>
      val dims = shapes.flatMap(_.dims).distinct.sorted
      val measures = shapes.flatMap(_.measures).distinct.sorted
      val timeDim = shapes.flatMap(_.timeDim).headOption
      val grains = shapes.flatMap(_.grain)
      val finest = if (grains.isEmpty) None
        else Some(grains.minBy(g => Grains.All.indexOf(g)))
      val hits = shapes.size
      if (hits >= minHits && measures.nonEmpty)
        Some((PreAggregation(
          name = s"recommended_${model}",
          measures = measures.toSeq,
          dimensions = dims.toSeq,
          timeDimension = timeDim,
          granularity = finest.orElse(timeDim.map(_ => "day")),
          partitionGranularity = timeDim.map(_ => "month")), hits))
      else None
    }.sortBy(-_._2)
  }
}
