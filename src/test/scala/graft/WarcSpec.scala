package graft

import graft.functions.WarcExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC record splitting: field extraction, byte-exact Content-Length
  * payload slicing (multibyte text), junk tolerance, truncated-tail
  * drop, case-insensitive headers, bare-\n line endings, and the
  * no-fallback codegen claim. End-to-end composition with htmlToText is
  * gated by q_warc_extract. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rec(warcType: String, payload: String,
      extra: String = ""): String =
    s"WARC/1.0\r\nWARC-Type: $warcType\r\n${extra}Content-Length: " +
      s"${payload.getBytes("UTF-8").length}\r\n\r\n$payload\r\n\r\n"

  private def parse(blob: String) =
    Seq(blob).toDF("b")
      .select(explode(WarcExprs.warcRecords(col("b"))).as("r"))
      .select(col("r.rec_idx"), col("r.rec_type"), col("r.target_uri"),
        col("r.content_type"), col("r.content_length"), col("r.payload"))
      .collect()

  test("splits concatenated records and extracts the header fields") {
    val blob = rec("warcinfo", "software: graft") +
      rec("response", "<p>hello</p>",
        "WARC-Target-URI: https://x.example/1\r\nContent-Type: text/html\r\n") +
      rec("metadata", "ok")
    val rows = parse(blob)
    assert(rows.length === 3)
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("warcinfo", "response", "metadata"))
    assert(rows(1).getString(2) === "https://x.example/1")
    assert(rows(1).getString(3) === "text/html")
    assert(rows(0).isNullAt(2)) // warcinfo has no URI
    assert(rows.map(_.getString(5)).toSeq ===
      Seq("software: graft", "<p>hello</p>", "ok"))
  }

  test("payload slicing is byte-exact: a payload containing \\r\\n\\r\\n " +
      "and multibyte text survives intact") {
    val tricky = "line1\r\n\r\nWARC/1.0 fake — naïve café 日本"
    val rows = parse(rec("response", tricky) + rec("metadata", "ok"))
    assert(rows.length === 2)
    assert(rows(0).getString(5) === tricky)
    assert(rows(0).getLong(4) === tricky.getBytes("UTF-8").length.toLong)
    assert(rows(1).getString(1) === "metadata")
  }

  test("junk between records is skipped; truncated tail and bad " +
      "Content-Length records drop") {
    val blob = "garbage preamble\r\n" + rec("response", "good") +
      "mid-archive noise\nmore\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort" +
      rec("metadata", "tail-after-truncated-is-unreachable")
    val rows = parse(blob)
    // the 9999-length record swallows to EOF and drops; scanning resumes
    // line-by-line, so the metadata record INSIDE its declared span is
    // still found when the truncated record is rejected
    assert(rows.exists(r => r.getString(1) == "response" &&
      r.getString(5) == "good"))
    assert(!rows.exists(_.getLong(4) == 9999L))
  }

  test("header names are case-insensitive and bare-\\n endings parse") {
    val blob = "WARC/1.0\nwarc-type: RESPONSE\ncontent-length: 2\n\nhi\n\n"
    val rows = parse(blob)
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "RESPONSE") // value case preserved
    assert(rows(0).getString(5) === "hi")
  }

  test("null blob stays null; recordless blob yields an empty array") {
    val out = Seq[Option[String]](None, Some("no records here\njust text"))
      .toDF("b").select(WarcExprs.warcRecords(col("b")).as("r")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Any](0).isEmpty)
  }

  test("multi-member gzip round-trips: one member per record, " +
      "corrupt gzip → null") {
    import graft.functions.WarcExprs.{gzipBytes, gunzipText}
    val out = Seq(("a", "b")).toDF("r1", "r2")
      .select(gunzipText(concat(
        gzipBytes(lit(rec("warcinfo", "info"))),
        gzipBytes(lit(rec("metadata", "ok"))))).as("t"),
        gunzipText(lit("not gzip".getBytes("UTF-8"))).as("bad"))
      .collect()(0)
    assert(out.getString(0) === rec("warcinfo", "info") + rec("metadata", "ok"))
    assert(out.isNullAt(1))
    // and through the splitter
    val rows = Seq(1).toDF("x")
      .select(explode(WarcExprs.warcRecords(gunzipText(concat(
        gzipBytes(lit(rec("warcinfo", "info"))),
        gzipBytes(lit(rec("metadata", "ok")))))))
        .as("r"))
      .select(col("r.rec_type")).as[String].collect().toSeq
    assert(rows === Seq("warcinfo", "metadata"))
  }

  test("no codegen fallback: generated code compiles and evaluates") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(
        WarcExprs.WarcRecords(Literal(rec("metadata", "ok")))))
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(row.getArray(0).numElements() === 1)
  }
}
