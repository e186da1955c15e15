package graft.load

import scala.util.DynamicVariable

/** Import fidelity reporting (reference: sidemantic/fidelity.py:1-137).
  *
  * Not every LookML/TMDL/Cube/… construct survives translation into the
  * semantic model; an adapter that quietly skips what it can't express
  * leaves the user with a model that LOOKS fully imported. The deal here:
  * any adapter line that gives up on a construct also calls
  * [[Fidelity.note]], and a caller who wants the loss ledger wraps the
  * load in [[Fidelity.capture]] and reads the returned [[ImportReport]].
  * Nothing about the import itself changes — same results, same adapter
  * signatures, plus an audit trail.
  *
  * When no capture is in flight, `note` returns immediately (one
  * thread-local read), so production loads that never ask for a report
  * pay nothing. Capture blocks may be nested; an inner capture's notes
  * also land in every enclosing one, so a batch import can hold one
  * outer report while per-file captures run inside it.
  *
  * {{{
  * val (imported, report) = Fidelity.capture {
  *   TmdlAdapter.loadDirectory(dir)
  * }
  * if (report.hasLosses) log.warn(report.summaryLines.mkString("\n"))
  * }}}
  */
object Fidelity {

  /** One construct that was dropped or approximated during import. */
  final case class Note(
      construct: String, // short slug, e.g. "non_translatable_dax"
      detail: String, // human-readable explanation
      severity: String, // "dropped" | "approximated" | "unsupported"
      source: Option[String] = None, // originating file / format when known
      location: Option[String] = None) // "file:line" when known — what makes
      // a note actionable on a many-file model repo (ref fidelity.py:35)

  // severity render order; unknown severities sort after these, alphabetically
  private val SeverityOrder = Seq("dropped", "approximated", "unsupported")

  /** Collected fidelity notes from one import. */
  final case class ImportReport(notes: Seq[Note]) {
    def hasLosses: Boolean = notes.nonEmpty
    def counts: Map[String, Int] =
      notes.groupBy(_.severity).map { case (s, ns) => s -> ns.size }
    def bySeverity(severity: String): Seq[Note] =
      notes.filter(_.severity == severity)
    def byConstruct(construct: String): Seq[Note] =
      notes.filter(_.construct == construct)

    /** Human-renderable lines grouped by severity in a stable order; notes
      * keep insertion order within a group so repeated runs over the same
      * import render identically. */
    def summaryLines: Seq[String] = {
      val severities = notes.map(_.severity).distinct.sortBy(s =>
        SeverityOrder.indexOf(s) match {
          case -1 => (SeverityOrder.size, s)
          case i  => (i, "")
        })
      severities.flatMap { sev =>
        val group = bySeverity(sev)
        s"$sev (${group.size}):" +: group.map { n =>
          val where = (n.source, n.location) match {
            case (Some(s), Some(l)) => s" ($s @ $l)"
            case (Some(s), None)    => s" ($s)"
            case (None, Some(l))    => s" (@ $l)"
            case _                  => ""
          }
          s"  ${n.construct}: ${n.detail}$where"
        }
      }
    }
  }

  // Stack of active collectors. DynamicVariable is inheritable-thread-local,
  // so a capture is scoped to the importing call chain — parallel imports on
  // other threads do not cross-contaminate.
  private val active =
    new DynamicVariable[List[scala.collection.mutable.Buffer[Note]]](Nil)

  /** Collect fidelity notes recorded while `body` runs. Nesting is
    * supported: a note recorded inside nested captures lands in every
    * active report, so an outer capture still sees notes from an inner
    * one. */
  def capture[A](body: => A): (A, ImportReport) = {
    val buf = scala.collection.mutable.Buffer.empty[Note]
    val result = active.withValue(buf :: active.value)(body)
    (result, ImportReport(buf.toSeq))
  }

  /** Record a note about a dropped/approximated construct. No-op when no
    * [[capture]] is active; never throws — drop sites call this mid-parse
    * and must not be destabilized by it. `location` is the "file:line"
    * of the dropped construct in the SOURCE model file when the parser
    * knows it. */
  def note(construct: String, detail: String,
      severity: String = "dropped", source: Option[String] = None,
      location: Option[String] = None): Unit =
    try {
      val reports = active.value
      if (reports.nonEmpty) {
        val n = Note(construct, detail, severity, source, location)
        reports.foreach(_ += n)
      }
    } catch { case _: Throwable => () }
}
