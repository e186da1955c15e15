package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** htmlToText (WET-style markup extraction): script/style/comment
  * bodies must not leak into training text, entities single-decode
  * (&amp; last), and the edge inputs every crawl contains — unclosed
  * tags, nulls, empty strings — behave predictably. End-to-end parity
  * with the DuckDB regex replay is gated by q_html_extract. */
class HtmlExtractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(html: String*): Seq[String] =
    html.toDF("h").select(TextAnalysis.htmlToText(col("h")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("script, style, and comment BODIES are dropped, not just tags") {
    val Seq(out) = clean(
      """<head><style>p{color:red}</style><script>var a = "</p>";
        |if (1 < 2) alert('x');</script></head>
        |<body><!-- secret
        |note --><p>visible text</p></body>""".stripMargin)
    assert(out === "visible text")
  }

  test("entities decode once — &amp;lt; is the literal string &lt;") {
    assert(clean("a &amp;lt; b &lt; c &gt; d &quot;e&quot; " +
      "&#39;f&#39; &apos;g&apos;&nbsp;h") ===
      Seq("a &lt; b < c > d \"e\" 'f' 'g' h"))
  }

  test("case-insensitive, multi-line script/style blocks") {
    val Seq(out) = clean(
      "<SCRIPT type=\"module\">\nlet x=1;\n</ScRiPt>kept<STYLE>\nx{}\n</style>!")
    assert(out === "kept !") // each stripped block leaves one space
  }

  test("unclosed script swallows to end of input (non-greedy needs a " +
      "closer); unclosed plain tag strips to its '>' or survives") {
    // no </script>: the script regex can't match, the tag strip then
    // removes <script> itself and the body text remains — the
    // documented regex-chain semantics (not a DOM parser)
    assert(clean("<script>var x;") === Seq("var x;"))
    assert(clean("a <b unclosed") === Seq("a <b unclosed"))
  }

  test("null stays null; empty and whitespace-only collapse to empty") {
    val out = Seq[Option[String]](None, Some(""), Some("  \n\t "))
      .toDF("h").select(TextAnalysis.htmlToText(col("h")).as("c"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getString(0) === "")
    assert(out(2).getString(0) === "")
  }
}
