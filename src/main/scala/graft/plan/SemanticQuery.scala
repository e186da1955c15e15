package graft.plan

/** A structured semantic query (reference: SemanticLayer.query kwargs,
  * core/semantic_layer.py:680).
  *
  * Field references are `model.field`, optionally with a time-grain suffix:
  * `orders.order_date__month`. Filters are Spark SQL boolean expressions over
  * such references; entries are ANDed.
  */
final case class SemanticQuery(
    metrics: Seq[String] = Nil,
    dimensions: Seq[String] = Nil,
    filters: Seq[String] = Nil,
    segments: Seq[String] = Nil,       // "model.segment_name"
    orderBy: Seq[String] = Nil,        // output column name, "-name" = desc
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    ungrouped: Boolean = false,        // drill-to-detail: raw rows, no GROUP BY
    withTotals: Boolean = false,       // GROUPING SETS ((dims),()) + _is_total
    parameters: Map[String, String] = Map.empty,
    // Security context: None = no user_attributes supplied (denied on any
    // secured model — deny-by-default, reference docs/security.md); Some(Map())
    // = authenticated user with no attributes.
    user: Option[Map[String, String]] = None,
    anchorDate: Option[String] = None,     // overrides current_date for relative dates
    timezone: Option[String] = None,       // localize time dims before grain trunc
    baseModel: Option[String] = None,      // anchor the join graph (reference: base_model)
    usePreAggs: Boolean = true
)

object Grains {
  val All = Seq("second", "minute", "hour", "day", "week", "month", "quarter", "year")
  def isGrain(s: String): Boolean = All.contains(s.toLowerCase)
}

/** Parsed `model.field[__grain]` reference. */
final case class FieldRef(model: String, field: String, grain: Option[String]) {
  def outName: String = field + grain.map("__" + _).getOrElse("")
}

object FieldRef {
  def parse(ref: String): FieldRef = {
    val (m, f) = ref.split('.') match {
      case Array(a, b) => (a, b)
      case _ => throw new IllegalArgumentException(
        s"Field reference must be 'model.field', got '$ref'")
    }
    f.split("__") match {
      case Array(base, g) if Grains.isGrain(g) => FieldRef(m, base, Some(g.toLowerCase))
      case _ => FieldRef(m, f, None)
    }
  }
}
