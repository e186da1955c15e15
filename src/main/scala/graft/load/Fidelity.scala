package graft.load

import scala.util.DynamicVariable

/** Import fidelity reporting (reference: sidemantic/fidelity.py:1-137).
  *
  * Foreign-format importers (Cube, LookML, TMDL, …) must sometimes drop or
  * approximate constructs the semantic model cannot represent. This module
  * lets those drop sites record a structured note a caller can surface,
  * without changing what actually gets imported or any adapter signature.
  *
  * Recording is opt-in: [[Fidelity.note]] is a no-op unless a
  * [[Fidelity.capture]] block is active, so instrumented drop sites carry
  * zero cost on the normal path. Captures nest — a note recorded while
  * several captures are active is delivered to every one of them.
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
      source: Option[String] = None) // originating file / format when known

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
          val loc = n.source.map(s => s" ($s)").getOrElse("")
          s"  ${n.construct}: ${n.detail}$loc"
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
    * and must not be destabilized by it. */
  def note(construct: String, detail: String,
      severity: String = "dropped", source: Option[String] = None): Unit =
    try {
      val reports = active.value
      if (reports.nonEmpty) {
        val n = Note(construct, detail, severity, source)
        reports.foreach(_ += n)
      }
    } catch { case _: Throwable => () }
}
