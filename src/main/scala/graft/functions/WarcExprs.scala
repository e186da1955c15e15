package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500) record splitting — the container
  * format of CommonCrawl and of every serious crawl archive. A WARC
  * "file" is a concatenation of records:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: http://…\r\n
  * Content-Type: text/html\r\n
  * Content-Length: <payload octets>\r\n
  * \r\n
  * <payload>\r\n\r\n
  * }}}
  *
  * [[WarcRecords]] splits one such blob (a string column — WET and
  * uncompressed response archives; the payload slice is byte-exact, so
  * multibyte text survives) into an array of records. Parsing is a
  * single compiled scan per row: find `WARC/`, read headers until the
  * blank line, slice exactly `Content-Length` payload BYTES, skip the
  * record separator, repeat. Bytes between records that are not a
  * record header are skipped (crawl archives carry padding and junk);
  * a record whose declared payload runs past the end of the blob is
  * dropped (truncated tail), matching warcio's strict reading.
  *
  * Designed to compose: `explode(warcRecords(blob))` → filter
  * `rec_type = 'response'` → [[graft.ops.TextAnalysis.htmlToText]] →
  * quality / dedup — the complete WARC→WET→corpus pipeline as one
  * declarative plan, no UDFs, scan-speed at any archive size. */
object WarcExprs {

  private val recordType = StructType(Seq(
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("rec_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Array of parsed WARC records; null input → null, a blob with no
    * well-formed record → empty array. */
  case class WarcRecords(child: Expression) extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(recordType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_warc_records"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string blob, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      WarcKernels.records(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.functions.WarcKernels.records($a);"
      })

    override protected def withNewChildInternal(newChild: Expression): WarcRecords =
      copy(child = newChild)
  }

  /** Multi-member gzip → UTF-8 text. Real crawl archives ship as
    * `.warc.gz` / `.wet.gz` with ONE GZIP MEMBER PER RECORD so readers
    * can seek; `java.util.zip.GZIPInputStream` transparently reads
    * concatenated members, so the whole archive decompresses in one
    * compiled call per row and feeds [[WarcRecords]] directly. Null
    * input → null; corrupt gzip → null (a poisoned blob must not kill
    * a 100 TB scan — filter nulls and count them). */
  case class GunzipText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gunzip_text"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary gzip bytes, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      WarcKernels.gunzipText(v.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val r = ctx.freshName("gz")
        s"""
           |org.apache.spark.unsafe.types.UTF8String $r =
           |  graft.functions.WarcKernels.gunzipText($a);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): GunzipText =
      copy(child = newChild)
  }

  /** UTF-8 text → one gzip member (the fixture/write side of
    * [[GunzipText]]; concat the members for a multi-member archive). */
  case class GzipBytes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_gzip_bytes"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      WarcKernels.gzipBytes(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.functions.WarcKernels.gzipBytes($a);"
      })

    override protected def withNewChildInternal(newChild: Expression): GzipBytes =
      copy(child = newChild)
  }

  def warcRecords(blob: Column): Column =
    GraftSqlBridge.column(WarcRecords(GraftSqlBridge.expression(blob)))

  def gunzipText(gz: Column): Column =
    GraftSqlBridge.column(GunzipText(GraftSqlBridge.expression(gz)))

  def gzipBytes(text: Column): Column =
    GraftSqlBridge.column(GzipBytes(GraftSqlBridge.expression(text)))
}

/** Compiled WARC scan (see [[DedupKernels]] for the kernel pattern). */
object WarcKernels {

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def startsWith(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean = {
    if (at + pat.length > b.length) return false
    var i = 0
    while (i < pat.length) {
      if (b(at + i) != pat(i)) return false
      i += 1
    }
    true
  }

  /** Next `\r\n` (or bare `\n`) at/after `from`; returns (lineEnd,
    * nextLineStart) or null at end of input. */
  private def lineEnd(b: Array[Byte], from: Int): (Int, Int) = {
    var i = from
    while (i < b.length) {
      if (b(i) == '\n') {
        val e = if (i > from && b(i - 1) == '\r') i - 1 else i
        return (e, i + 1)
      }
      i += 1
    }
    null
  }

  /** See [[WarcExprs.GunzipText]]. */
  def gunzipText(gz: Array[Byte]): UTF8String =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz), 64 << 10)
      val out = new java.io.ByteArrayOutputStream(
        math.max(gz.length * 4, 1024))
      val buf = new Array[Byte](64 << 10)
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      UTF8String.fromBytes(out.toByteArray)
    } catch { case _: java.io.IOException => null }

  /** See [[WarcExprs.GzipBytes]]. */
  def gzipBytes(text: UTF8String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1024)
    val gz = new java.util.zip.GZIPOutputStream(out, 64 << 10)
    gz.write(text.getBytes)
    gz.close()
    out.toByteArray
  }

  def records(blob: UTF8String): ArrayData = {
    val b = blob.getBytes
    val out = new java.util.ArrayList[InternalRow]
    var pos = 0
    var idx = 0
    while (pos < b.length) {
      if (!startsWith(b, pos, Magic)) {
        // skip to the next line — junk/padding between records
        val le = lineEnd(b, pos)
        if (le == null) pos = b.length else pos = le._2
      } else {
        // version line, then headers until the blank line
        var cur = lineEnd(b, pos)
        var recType: UTF8String = null
        var uri: UTF8String = null
        var ctype: UTF8String = null
        var clen = -1L
        var ok = cur != null
        var headerEnd = -1
        while (ok && cur != null) {
          val from = cur._2
          cur = lineEnd(b, from)
          if (cur == null) ok = false
          else if (cur._1 == from) { // blank line → headers done
            headerEnd = cur._2
            cur = null
          } else {
            // "Name: value" — names are case-insensitive per spec
            var colon = from
            while (colon < cur._1 && b(colon) != ':') colon += 1
            if (colon < cur._1) {
              val name = new String(b, from, colon - from, "US-ASCII")
                .toLowerCase
              var vs = colon + 1
              while (vs < cur._1 && (b(vs) == ' ' || b(vs) == '\t')) vs += 1
              val value = UTF8String.fromBytes(b, vs, cur._1 - vs)
              name match {
                case "warc-type" => recType = value
                case "warc-target-uri" => uri = value
                case "content-type" => ctype = value
                case "content-length" =>
                  clen = try value.toString.trim.toLong catch {
                    case _: NumberFormatException => -1L
                  }
                case _ => ()
              }
            }
          }
        }
        if (!ok || headerEnd < 0 || clen < 0 ||
            headerEnd + clen > b.length) {
          // malformed or truncated record: skip past this header line
          val le = lineEnd(b, pos)
          pos = if (le == null) b.length else le._2
        } else {
          val payload = UTF8String.fromBytes(b, headerEnd, clen.toInt)
          out.add(InternalRow(idx, recType, uri, ctype, clen, payload))
          idx += 1
          pos = headerEnd + clen.toInt
          // consume the record separator (\r\n\r\n), tolerantly
          var skips = 0
          while (skips < 2 && pos < b.length &&
              (b(pos) == '\r' || b(pos) == '\n')) {
            if (b(pos) == '\n') skips += 1
            pos += 1
          }
        }
      }
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }
}
