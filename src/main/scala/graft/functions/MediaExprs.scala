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
  *   - WebP — RIFF/WEBP first chunk: lossy `VP8 ` frame tag (14-bit
  *            w/h), lossless `VP8L` 14-bit packed dims, extended `VP8X`
  *            24-bit canvas dims
  *   - MP4/M4A — ISO-BMFF box walk: `ftyp` major brand picks the
  *            format name, then `moov`/`mvhd` for timescale + duration
  *            and the first `trak`/`tkhd` with nonzero geometry for
  *            width/height (16.16 fixed; audio tracks store zeros).
  *            Faststart files carry `moov` up front and get the
  *            metadata; tail-moov files (the streaming-hostile layout)
  *            are still recognized by brand with null fields — a
  *            header sniff never demands the whole object.
  *   - OGG  — first page's id packet: `\x01vorbis` or `OpusHead`
  *            (channels, sample rate; duration lives in the LAST page's
  *            granule, out of header reach → null)
  *   - FLAC — `fLaC` + mandatory first STREAMINFO block: 20-bit sample
  *            rate, 3-bit channels, 36-bit total samples → duration_ms
  *   - TIFF — `II*\0` / `MM\0*` + first-IFD walk, both byte orders:
  *            ImageWidth/ImageLength, BitsPerSample, SamplesPerPixel
  *            (→ channels); scanned-document corpora ship as TIFF
  *
  * Result: `struct<format string, width int, height int, duration_ms
  * bigint, channels int, sample_rate int, bits_per_sample int>`
  * (bits_per_sample is TIFF-only for now); NULL for bytes no parser
  * recognizes (including truncated or corrupt headers — every read is
  * bounds-checked, never an exception). Image rows carry null audio
  * fields and vice versa; fields a recognized container keeps out of
  * header reach are null, not an excuse to return no row.
  */
object MediaExprs {

  val sniffSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType)))

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
      UTF8String.fromString(fmt), w.toInt, h.toInt, null, null, null, null))

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
      dataBytes * 1000L / byteRate, channels, sampleRate.toInt, null))
  }

  /** RIFF dispatch: the container four-cc at 8 separates WAVE from WEBP. */
  private def riff(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || !tag(b, 0, "RIFF")) return null
    if (tag(b, 8, "WAVE")) wav(b)
    else if (tag(b, 8, "WEBP")) webp(b)
    else null
  }

  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)

  private def webp(b: Array[Byte]): InternalRow = {
    if (b.length < 30) return null
    if (tag(b, 12, "VP8 ")) {
      // lossy: 3-byte frame tag, then start code 9D 01 2A, then 14-bit dims
      if (u8(b, 23) != 0x9d || u8(b, 24) != 0x01 || u8(b, 25) != 0x2a) null
      else image("webp", (le16(b, 26) & 0x3fff).toLong,
        (le16(b, 28) & 0x3fff).toLong)
    } else if (tag(b, 12, "VP8L")) {
      // lossless: 0x2F signature, then width-1 / height-1 in 14-bit fields
      if (u8(b, 20) != 0x2f) null
      else {
        val bits = le32(b, 21)
        image("webp", (bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1)
      }
    } else if (tag(b, 12, "VP8X")) {
      // extended: 24-bit little-endian canvas width-1 / height-1
      image("webp", le24(b, 24).toLong + 1, le24(b, 27).toLong + 1)
    } else null
  }

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  /** ISO-BMFF box walk (MP4/M4A/MOV family). Boxes are
    * [size be32][type 4cc]; size 1 = 64-bit extended size follows,
    * size 0 = "to end of file" (ends the walk — unbounded). `moov` and
    * `trak` are pure containers, so their children are walked in place:
    * `mvhd` yields timescale + duration, the first `tkhd` with nonzero
    * geometry yields width/height (16.16 fixed point — audio tracks
    * store zeros and are skipped). A box that runs past the provided
    * bytes ends the walk: whatever was parsed by then stands
    * (brand-only rows for tail-moov files). */
  private def mp4(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || !tag(b, 4, "ftyp")) return null
    val fmt = if (tag(b, 8, "M4A ")) "m4a" else "mp4"
    var durationMs: Any = null
    var w: Any = null
    var h: Any = null
    def result = new GenericInternalRow(Array[Any](
      UTF8String.fromString(fmt), w, h, durationMs, null, null, null))
    var i = 0
    var guard = 0
    while (i + 8 <= b.length && guard < 128 && !(durationMs != null && w != null)) {
      guard += 1
      var size = be32(b, i)
      var hdr = 8
      if (size == 1) {
        if (i + 16 > b.length) return result
        size = be64(b, i + 8); hdr = 16
      }
      if (size == 0 || size < hdr || i + size > Int.MaxValue)
        return result
      if (tag(b, i + 4, "moov") || tag(b, i + 4, "trak"))
        i += hdr // container: descend in place
      else if (tag(b, i + 4, "mvhd")) {
        if (i + hdr >= b.length) return result
        val v = u8(b, i + hdr)
        // all-ones duration is the spec's "unknown" sentinel (common in
        // live-recorded/fragmented files) — report null, not 49,710 days
        if (v == 0 && i + hdr + 20 <= b.length) {
          val ts = be32(b, i + hdr + 12)
          val dur = be32(b, i + hdr + 16)
          if (ts > 0 && dur != 0xffffffffL) durationMs = dur * 1000L / ts
        } else if (v == 1 && i + hdr + 32 <= b.length) {
          val ts = be32(b, i + hdr + 20)
          val dur = be64(b, i + hdr + 24)
          if (ts > 0 && dur >= 0 && dur <= Long.MaxValue / 1000L)
            durationMs = dur * 1000L / ts
        }
        i += size.toInt
      } else if (tag(b, i + 4, "tkhd")) {
        if (i + hdr >= b.length) return result
        val v = u8(b, i + hdr)
        val off = if (v == 1) 88 else 76 // width's offset in the tkhd body
        if (i + hdr + off + 8 <= b.length) {
          val ww = (be32(b, i + hdr + off) >> 16).toInt
          val hh = (be32(b, i + hdr + off + 4) >> 16).toInt
          if (w == null && ww > 0 && hh > 0) { w = ww; h = hh }
        }
        i += size.toInt
      } else i += size.toInt
    }
    result
  }

  /** First OGG page: 27-byte header + segment table, then the codec id
    * packet. Vorbis/Opus id headers carry channels + sample rate; total
    * duration lives in the stream's LAST granule position — not header
    * territory, so it stays null. */
  private def ogg(b: Array[Byte]): InternalRow = {
    if (b.length < 28 || !tag(b, 0, "OggS") || u8(b, 4) != 0) return null
    val nsegs = u8(b, 26)
    val p = 27 + nsegs // first packet start
    if (p + 19 > b.length) return null
    if (u8(b, p) == 0x01 && tag(b, p + 1, "vorbis")) {
      // id header: version le32 @+7, channels u8 @+11, rate le32 @+12
      val ch = u8(b, p + 11); val sr = le32(b, p + 12)
      if (ch <= 0 || sr <= 0 || sr > Int.MaxValue) return null
      new GenericInternalRow(Array[Any](
        UTF8String.fromString("ogg"), null, null, null, ch, sr.toInt, null))
    } else if (tag(b, p, "OpusHead")) {
      // channels u8 @+9, input sample rate le32 @+12
      val ch = u8(b, p + 9); val sr = le32(b, p + 12)
      if (ch <= 0 || sr <= 0 || sr > Int.MaxValue) return null
      new GenericInternalRow(Array[Any](
        UTF8String.fromString("ogg"), null, null, null, ch, sr.toInt, null))
    } else null
  }

  /** `fLaC` + the mandatory first STREAMINFO block: sample rate (20
    * bits), channels-1 (3 bits), total samples (36 bits) packed at
    * byte 18 of the stream. */
  private def flac(b: Array[Byte]): InternalRow = {
    if (b.length < 26 || !tag(b, 0, "fLaC")) return null
    if ((u8(b, 4) & 0x7f) != 0) return null // first block must be STREAMINFO
    val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val ch = ((u8(b, 20) >> 1) & 0x7) + 1
    // 36-bit total: low nibble of byte 21 (after 5 bps bits) + be32(22)
    val totalSamples = ((u8(b, 21) & 0x0f).toLong << 32) | be32(b, 22)
    if (sr <= 0) return null
    val durationMs: Any =
      if (totalSamples > 0) totalSamples * 1000L / sr else null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("flac"), null, null, durationMs, ch, sr, null))
  }

  /** TIFF: `II*\0` (little-endian) or `MM\0*` (big-endian) + the first
    * IFD's entry walk. Tags read: 256 ImageWidth, 257 ImageLength, 258
    * BitsPerSample, 277 SamplesPerPixel (→ channels). Values decode
    * inline for count 1 (SHORT sits in the value field's first two
    * bytes, endian-aware); a multi-count BitsPerSample (one per
    * channel) follows its offset when the bytes are in header reach,
    * else stays null — a sniff never demands bytes past the range-GET.
    * Scanned-document corpora ship as TIFF, hence the parser. */
  private def tiff(b: Array[Byte]): InternalRow = {
    if (b.length < 8) return null
    val le =
      if (u8(b, 0) == 'I' && u8(b, 1) == 'I' && u8(b, 2) == 0x2a &&
        u8(b, 3) == 0) true
      else if (u8(b, 0) == 'M' && u8(b, 1) == 'M' && u8(b, 2) == 0 &&
        u8(b, 3) == 0x2a) false
      else return null
    def r16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
    def r32(i: Int): Long = if (le) le32(b, i) else be32(b, i)
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = r16(ifd.toInt)
    var w = -1L; var h = -1L; var bits: Any = null; var samples: Any = null
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + 12 * i
      if (e + 12 > b.length) {
        // IFD truncated mid-walk: keep what parsed so far (header reach)
        i = n
      } else {
        val t = r16(e)
        val typ = r16(e + 2)
        val count = r32(e + 4)
        // SHORT (3) inline in the first 2 value bytes; LONG (4) in all 4
        def inlineVal: Long =
          if (typ == 3) r16(e + 8).toLong
          else if (typ == 4) r32(e + 8)
          else -1L
        t match {
          case 256 if count == 1 => w = inlineVal
          case 257 if count == 1 => h = inlineVal
          case 258 =>
            if (count == 1) { val v = inlineVal; if (v > 0) bits = v.toInt }
            else if (typ == 3 && count >= 2) {
              val off = r32(e + 8)
              if (off >= 0 && off + 2 <= b.length) {
                val v = r16(off.toInt)
                if (v > 0) bits = v
              }
            }
          case 277 if count == 1 =>
            val v = inlineVal; if (v > 0 && v <= Int.MaxValue) samples = v.toInt
          case _ => ()
        }
        i += 1
      }
    }
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString("tiff"), w.toInt, h.toInt, null, samples, null,
      bits))
  }

  /** Static entry the generated code calls: first matching container wins
    * (signatures are disjoint). Null bytes / no match → null row. */
  def sniff(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 4) return null
    u8(bytes, 0) match {
      case 0x89 => png(bytes)
      case 0xff => jpeg(bytes)
      case 0x47 => gif(bytes)  // 'G'
      case 0x42 => bmp(bytes)  // 'B'
      case 0x52 => riff(bytes) // 'R' — WAVE or WEBP
      case 0x4f => ogg(bytes)  // 'O'
      case 0x66 => flac(bytes) // 'f'
      case 0x49 => tiff(bytes) // 'I' — little-endian TIFF
      case 0x4d => tiff(bytes) // 'M' — big-endian TIFF
      case 0x00 => mp4(bytes)  // ftyp box size high byte
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

  /** `graft_average_hash(array<float|double>)` → 64-bit average-hash
    * perceptual fingerprint: bit i is set when cell i of the (row-major,
    * ≤64-cell) downsampled luma grid sits ABOVE the grid mean. The
    * classic aHash — invariant to uniform brightness/contrast shifts and
    * to the high-frequency noise lossy recompression introduces, which
    * is exactly what an image-level near-dup key needs (a JPEG re-save
    * of a PNG keeps its fingerprint; a different picture does not).
    *
    * The DECODE (pixels → luma grid) lives in
    * [[graft.ops.Multimodal.imageLumaGrid]] behind `mapPartitions`
    * (a codec cannot be a Catalyst expression); this kernel is the
    * grid → fingerprint step, a tight two-pass loop that stays inside
    * whole-stage codegen like every [[VectorExprs]] kernel. NULL for
    * null/empty/oversized grids or null cells — never an exception.
    */
  case class AverageHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_average_hash"

    @transient private lazy val elem =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double> input, got ${t.sql}")
      }

    private def get(a: org.apache.spark.sql.catalyst.util.ArrayData,
        i: Int): Double = elem match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      if (n == 0 || n > 64) return null
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        sum += get(a, i)
        i += 1
      }
      val mean = sum / n
      var bits = 0L
      i = 0
      while (i < n) {
        if (get(a, i) > mean) bits |= 1L << i
        i += 1
      }
      bits
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val sum = ctx.freshName("sum")
        val mean = ctx.freshName("mean")
        val bits = ctx.freshName("bits")
        val bad = ctx.freshName("bad")
        val getter = elem match {
          case FloatType => s"(double) $a.getFloat"
          case _ => s"$a.getDouble"
        }
        s"""
           |final int $n = $a.numElements();
           |if ($n == 0 || $n > 64) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $sum = 0.0;
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i)) { $bad = true; break; }
           |    $sum += $getter($i);
           |  }
           |  if ($bad) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final double $mean = $sum / $n;
           |    long $bits = 0L;
           |    for (int $i = 0; $i < $n; $i++) {
           |      if ($getter($i) > $mean) $bits |= 1L << $i;
           |    }
           |    ${ev.value} = $bits;
           |  }
           |}
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): AverageHash =
      copy(child = newChild)
  }

  /** `graft_difference_hash(array<float|double>)` → 64-bit dHash over a
    * SQUARE row-major luma grid (g×g, g² ≤ 64): bit (r·g + c) is set
    * when cell (r, c) is brighter than its right neighbor (wrapping at
    * the row end, so a g×g grid still yields g² bits). Complements
    * [[AverageHash]]: aHash compares against the GLOBAL mean, so a
    * low-contrast image whose cells sit near the mean flips bits under
    * tiny noise — dHash compares ADJACENT cells (a local gradient
    * sign), which survives exactly that case and is equally invariant
    * to uniform brightness/contrast shifts. Same null contracts, same
    * codegen discipline. NULL for non-square grids. */
  case class DifferenceHash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_difference_hash"

    @transient private lazy val elem =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType | DoubleType, _) =>
          TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<float|double> input, got ${t.sql}")
      }

    private def get(a: org.apache.spark.sql.catalyst.util.ArrayData,
        i: Int): Double = elem match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

    override def nullSafeEval(input: Any): Any = {
      val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      val g = math.sqrt(n.toDouble).toInt
      if (n == 0 || n > 64 || g * g != n) return null
      var i = 0
      while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
      var bits = 0L
      var r = 0
      while (r < g) {
        var c = 0
        while (c < g) {
          val here = get(a, r * g + c)
          val right = get(a, r * g + (c + 1) % g)
          if (here > right) bits |= 1L << (r * g + c)
          c += 1
        }
        r += 1
      }
      bits
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val g = ctx.freshName("g")
        val r = ctx.freshName("r")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val bits = ctx.freshName("bits")
        val bad = ctx.freshName("bad")
        val getter = elem match {
          case FloatType => s"(double) $a.getFloat"
          case _ => s"$a.getDouble"
        }
        s"""
           |final int $n = $a.numElements();
           |final int $g = (int) java.lang.Math.sqrt((double) $n);
           |if ($n == 0 || $n > 64 || $g * $g != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i)) { $bad = true; break; }
           |  }
           |  if ($bad) {
           |    ${ev.isNull} = true;
           |  } else {
           |    long $bits = 0L;
           |    for (int $r = 0; $r < $g; $r++) {
           |      for (int $c = 0; $c < $g; $c++) {
           |        if ($getter($r * $g + $c) >
           |            $getter($r * $g + ($c + 1) % $g))
           |          $bits |= 1L << ($r * $g + $c);
           |      }
           |    }
           |    ${ev.value} = $bits;
           |  }
           |}
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): DifferenceHash =
      copy(child = newChild)
  }
}
