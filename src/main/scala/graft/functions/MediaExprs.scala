package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Header-only media metadata sniffing as a native Catalyst `Expression`.
  *
  * At catalog scale nobody decodes pixels to learn an image's dimensions:
  * the production pattern is a bounded range-read of the object's first
  * bytes and a byte-level parse of the container header (the same reason
  * parquet readers read footers, not files). [[Multimodal.decodeAndFeaturize]]
  * is the full-decode stage; this expression is the cheap catalog pass that
  * runs BEFORE it — O(header) per row regardless of payload size, no codec,
  * no `ImageIO` object allocation, and it stays inside whole-stage codegen
  * (the generated code is a single static call, constant-size at any
  * payload width — same janino discipline as [[VectorExprs]]).
  *
  * Containers parsed (all pure byte math, bounds-checked):
  *   - PNG  — 8-byte signature + IHDR width/height (big-endian)
  *   - JPEG — marker scan to the first SOF segment (height, width)
  *   - GIF  — GIF87a/GIF89a logical screen descriptor (little-endian)
  *   - BMP  — BITMAPINFOHEADER width/|height| (height may be negative
  *            for top-down rows; magnitude is the raster size)
  *   - WAV  — RIFF/WAVE chunk walk: `fmt ` (channels, sample rate) +
  *            `data` size → duration_ms = dataBytes·1000 / byteRate.
  *            The declared data size is trusted, not re-measured — a
  *            header sniff must not require the payload to be present
  *            (an object-store range-GET of the first KB sees exactly
  *            these bytes).
  *
  * Result: `struct<format string, width int, height int, duration_ms
  * bigint, channels int, sample_rate int>`; NULL for bytes no parser
  * recognizes (including truncated or corrupt headers — every read is
  * bounds-checked, never an exception). Image rows carry null audio
  * fields and vice versa.
  */
object MediaExprs {

  val sniffSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType)))

  // ---------------------------------------------------------------- parsers

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean = {
    var k = 0
    while (k < s.length) { if (u8(b, i + k) != s.charAt(k)) return false; k += 1 }
    true
  }

  private def image(fmt: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt), w.toInt, h.toInt, null, null, null))

  private def png(b: Array[Byte]): InternalRow = {
    if (b.length < 24) return null
    if (u8(b, 0) != 0x89 || !tag(b, 1, "PNG") || u8(b, 4) != 0x0d ||
      u8(b, 5) != 0x0a || u8(b, 6) != 0x1a || u8(b, 7) != 0x0a) return null
    if (!tag(b, 12, "IHDR")) return null
    image("png", be32(b, 16), be32(b, 20))
  }

  /** Marker scan: skip entropy-free segments until a start-of-frame
    * (C0–CF minus DHT C4 / JPG C8 / DAC CC) carries the geometry. Stops
    * at start-of-scan — past it lies entropy-coded payload, and a SOF
    * after SOS would mean a corrupt stream anyway. */
  private def jpeg(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return null
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (i + 9 > b.length) return null
        return image("jpeg", be16(b, i + 7), be16(b, i + 5))
      }
      if (m == 0xd9 || m == 0xda) return null // EOI / SOS before any SOF
      if ((m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // standalone markers
      else {
        if (i + 4 > b.length) return null
        val seg = be16(b, i + 2)
        if (seg < 2) return null
        i += 2 + seg
      }
    }
    null
  }

  private def gif(b: Array[Byte]): InternalRow = {
    if (b.length < 10) return null
    if (!tag(b, 0, "GIF8") || (u8(b, 4) != '7' && u8(b, 4) != '9') ||
      u8(b, 5) != 'a') return null
    image("gif", le16(b, 6).toLong, le16(b, 8).toLong)
  }

  private def bmp(b: Array[Byte]): InternalRow = {
    if (b.length < 26 || !tag(b, 0, "BM")) return null
    val w = le32(b, 18).toInt
    val h = le32(b, 22).toInt // negative = top-down row order
    image("bmp", w.toLong, math.abs(h.toLong))
  }

  private def wav(b: Array[Byte]): InternalRow = {
    if (b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12
    var channels = -1; var sampleRate = -1L; var byteRate = -1L
    var dataBytes = -1L
    while (i + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (i + 24 > b.length) return null
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (tag(b, i, "data")) {
        dataBytes = size // declared, not re-measured: see scaladoc
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      if (size < 0 || i < 0) return null
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataBytes < 0 ||
      sampleRate > Int.MaxValue) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("wav"), null, null,
      dataBytes * 1000L / byteRate, channels, sampleRate.toInt))
  }

  /** Static entry the generated code calls: first matching container wins
    * (signatures are disjoint). Null bytes / no match → null row. */
  def sniff(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 4) return null
    u8(bytes, 0) match {
      case 0x89 => png(bytes)
      case 0xff => jpeg(bytes)
      case 0x47 => gif(bytes) // 'G'
      case 0x42 => bmp(bytes) // 'B'
      case 0x52 => wav(bytes) // 'R'
      case _    => null
    }
  }

  /** `graft_sniff_media(binary)` → metadata struct or NULL. */
  case class SniffMedia(child: Expression) extends UnaryExpression {
    override def dataType: DataType = sniffSchema
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sniff_media"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary input, got ${child.dataType.sql}")

    override def nullSafeEval(input: Any): Any =
      sniff(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, bytes => {
        s"""
           |${ev.value} = graft.functions.MediaExprs.sniff($bytes);
           |${ev.isNull} = ${ev.value} == null;
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SniffMedia =
      copy(child = newChild)
  }
}
