package graft

import graft.functions.MediaExprs
import graft.ops.Multimodal
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftSqlBridge, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Header-only media sniffing ([[MediaExprs.SniffMedia]]): exact metadata
  * from real container bytes (ImageIO encodes + hand-built RIFF), marker
  * scans across multi-segment JPEGs, bounds-checked rejection of
  * truncated/corrupt input, interpreted/codegen parity, and the
  * whole-stage-codegen claim. */
class MediaSniffSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def encode(w: Int, h: Int, format: String): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, format, bos)
    bos.toByteArray
  }

  private def evalSniff(bytes: Array[Byte]) =
    Option(MediaExprs.SniffMedia(Literal.create(bytes, BinaryType)).eval(null))
      .map(_.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  test("png/jpeg/gif/bmp ImageIO encodes sniff to their exact geometry") {
    for (fmt <- Seq("png", "jpg", "gif", "bmp")) {
      val r = evalSniff(encode(37, 21, fmt)).getOrElse(
        fail(s"$fmt not recognized"))
      val name = if (fmt == "jpg") "jpeg" else fmt
      assert(r.getUTF8String(0).toString === name)
      assert(r.getInt(1) === 37, fmt)
      assert(r.getInt(2) === 21, fmt)
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5), fmt)
    }
  }

  test("jpeg marker scan skips leading APP/comment segments to the SOF") {
    // FF D8, APP1 of 10 payload bytes, COM of 3, then SOF0 with geometry
    val bos = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => bos.write(x & 0xff))
    b(0xff, 0xd8)
    b(0xff, 0xe1, 0x00, 0x0c); (0 until 10).foreach(_ => b(0x55))
    b(0xff, 0xfe, 0x00, 0x05); (0 until 3).foreach(_ => b(0x2a))
    b(0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0x00, 0x02, 0x80) // h=256 w=640
    val r = evalSniff(bos.toByteArray).getOrElse(fail("jpeg not recognized"))
    assert(r.getUTF8String(0).toString === "jpeg")
    assert(r.getInt(1) === 640)
    assert(r.getInt(2) === 256)
  }

  test("wav fmt/data chunk walk yields channels, rate, floor duration") {
    // via the battery generator so the spec gates the same byte layout
    val df = Multimodal.syntheticMixedMedia(
      spark.range(2, 600, 3).select(col("id").as("doc_id")), "doc_id")
    val out = df.select(col("media_id"),
        Multimodal.sniffMedia(col("content")).as("m"))
      .select(col("media_id"), col("m.format"), col("m.duration_ms"),
        col("m.channels"), col("m.sample_rate"), col("m.width"))
      .collect()
    assert(out.length === 200)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === "wav")
      val channels = 1 + (id % 2).toInt
      val dataBytes = ((id % 200) + 1) * 16
      assert(r.getLong(2) === dataBytes * 1000L / (16000L * channels), s"id=$id")
      assert(r.getInt(3) === channels)
      assert(r.getInt(4) === 8000)
      assert(r.isNullAt(5))
    }
  }

  test("webp/mp4/m4a/ogg/flac sniff id-exact fields from the synthetic " +
      "extended corpus") {
    val df = Multimodal.syntheticMixedMediaExt(
      spark.range(0, 160).select(col("id").as("doc_id")), "doc_id")
    val out = df.select(col("media_id"),
        Multimodal.sniffMedia(col("content")).as("m"))
      .select(col("media_id"), col("m.format"), col("m.width"),
        col("m.height"), col("m.duration_ms"), col("m.channels"),
        col("m.sample_rate"))
      .collect()
    assert(out.length === 160)
    out.foreach { r =>
      val id = r.getLong(0)
      (id % 4) match {
        case 0 =>
          assert(r.getString(1) === "webp", s"id=$id")
          assert(r.getInt(2) === 8 + (id % 16).toInt, s"id=$id")
          assert(r.getInt(3) === 8 + ((id / 16) % 16).toInt, s"id=$id")
          assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
        case 1 =>
          val fmt = if ((id / 4) % 2 == 1) "m4a" else "mp4"
          assert(r.getString(1) === fmt, s"id=$id")
          assert(r.getLong(4) === ((id % 300) + 1) * 100, s"id=$id")
          assert(r.getInt(2) === 320 + (id % 8).toInt * 16, s"id=$id")
          assert(r.getInt(3) === 240, s"id=$id")
          assert(r.isNullAt(5) && r.isNullAt(6))
        case 2 =>
          assert(r.getString(1) === "ogg", s"id=$id")
          assert(r.getInt(5) === 1 + (id % 2).toInt, s"id=$id")
          assert(r.getInt(6) === 44100, s"id=$id")
          assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        case _ =>
          assert(r.getString(1) === "flac", s"id=$id")
          assert(r.getLong(4) === ((id % 100) + 1) * 100, s"id=$id")
          assert(r.getInt(5) === 2 && r.getInt(6) === 44100, s"id=$id")
          assert(r.isNullAt(2) && r.isNullAt(3))
      }
    }
  }

  test("webp lossy (VP8) and extended (VP8X) headers sniff their dims") {
    // VP8 lossy: 3-byte frame tag, 9D 01 2A start code, 14-bit le dims
    val lossy = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    lossy.put("RIFF".getBytes("US-ASCII")).putInt(22)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8 ".getBytes("US-ASCII")).putInt(10)
      .put(Array[Byte](0, 0, 0)) // frame tag
      .put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
      .putShort(641.toShort).putShort(353.toShort)
    val r1 = evalSniff(lossy.array()).getOrElse(fail("VP8 not recognized"))
    assert(r1.getUTF8String(0).toString === "webp")
    assert(r1.getInt(1) === 641 && r1.getInt(2) === 353)
    // VP8X extended: flags(4) then 24-bit canvas width-1 / height-1
    val ext = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ext.put("RIFF".getBytes("US-ASCII")).putInt(22)
      .put("WEBP".getBytes("US-ASCII"))
      .put("VP8X".getBytes("US-ASCII")).putInt(10)
      .putInt(0) // feature flags + reserved
    ext.put(0xff.toByte).put(0x01.toByte).put(0.toByte) // w-1 = 511
    ext.put(0x2b.toByte).put(0x01.toByte).put(0.toByte) // h-1 = 299
    val r2 = evalSniff(ext.array()).getOrElse(fail("VP8X not recognized"))
    assert(r2.getUTF8String(0).toString === "webp")
    assert(r2.getInt(1) === 512 && r2.getInt(2) === 300)
    // corrupt VP8 start code is refused, not misread
    val bad = lossy.array().clone(); bad(23) = 0x00
    assert(evalSniff(bad).isEmpty)
  }

  test("tail-moov mp4 sniffs to brand-only (format, null duration) — a " +
      "header sniff never demands the whole object") {
    // ftyp then an mdat box whose declared size reaches past the bytes
    val buf = java.nio.ByteBuffer.allocate(24)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
    buf.putInt(1 << 28).put("mdat".getBytes("US-ASCII"))
    val r = evalSniff(buf.array()).getOrElse(fail("mp4 brand not recognized"))
    assert(r.getUTF8String(0).toString === "mp4")
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) &&
      r.isNullAt(4) && r.isNullAt(5))
  }

  test("opus id header sniffs channels and input rate") {
    val packet = java.nio.ByteBuffer.allocate(19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    packet.put("OpusHead".getBytes("US-ASCII")).put(1.toByte) // version
      .put(2.toByte).putShort(312.toShort).putInt(48000).putShort(0.toShort)
      .put(0.toByte)
    val page = java.nio.ByteBuffer.allocate(27 + 1 + 19)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    page.put("OggS".getBytes("US-ASCII")).put(0.toByte).put(0x02.toByte)
      .putLong(0L).putInt(1).putInt(0).putInt(0)
      .put(1.toByte).put(19.toByte).put(packet.array())
    val r = evalSniff(page.array()).getOrElse(fail("opus not recognized"))
    assert(r.getUTF8String(0).toString === "ogg")
    assert(r.getInt(4) === 2 && r.getInt(5) === 48000)
    assert(r.isNullAt(3)) // duration lives in the last page's granule
  }

  test("truncated new-format headers sniff to NULL, never throw") {
    val webp = Multimodal.syntheticMixedMediaExt(
      spark.range(0, 1).select(col("id").as("doc_id")), "doc_id")
      .collect()(0).getAs[Array[Byte]]("content")
    val flac = Multimodal.syntheticMixedMediaExt(
      spark.range(3, 4).select(col("id").as("doc_id")), "doc_id")
      .collect()(0).getAs[Array[Byte]]("content")
    val bad: Seq[Array[Byte]] = Seq(
      webp.take(20),                         // RIFF/WEBP cut before VP8L sig
      flac.take(17),                         // fLaC cut inside STREAMINFO
      "OggS~~~~~~~~".getBytes("US-ASCII"),   // bad version byte
      "fLaC".getBytes("US-ASCII"),     // non-STREAMINFO first block
      java.util.Arrays.copyOf("RIFF0000WEBPVP8L".getBytes("US-ASCII"), 30))
    bad.foreach(bytes => assert(evalSniff(bytes).isEmpty,
      s"len=${bytes.length} should not sniff"))
  }

  test("truncated, corrupt, and unrecognized bytes sniff to NULL, never throw") {
    val png = encode(16, 16, "png")
    val wavDf = Multimodal.syntheticMixedMedia(
      spark.range(2, 3).select(col("id").as("doc_id")), "doc_id")
    val wav = wavDf.collect()(0).getAs[Array[Byte]]("content")
    val bad: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      Array[Byte](1, 2, 3),
      png.take(10),              // png cut inside the IHDR
      wav.take(20),              // RIFF cut inside the fmt chunk
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte), // SOS first
      "GIF88a~~~~~~".getBytes("US-ASCII"), // bad version byte
      ("RIFF" + "\u0000" * 8).getBytes("US-ASCII"),
      Array.fill[Byte](64)(0x42.toByte)) // 'B' lead-in but no BMP header
    bad.foreach(bytes => assert(evalSniff(bytes).isEmpty,
      s"len=${bytes.length} should not sniff"))
    assert(MediaExprs.SniffMedia(Literal.create(null, BinaryType))
      .eval(null) == null)
  }

  test("interpreted eval matches the codegen'd projection") {
    val samples = Seq(encode(9, 33, "png"), encode(12, 7, "jpg"),
      encode(5, 5, "gif"), Array[Byte](1, 2, 3, 4))
    val df = samples.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
    val fromDf = df.select(col("id"),
        Multimodal.sniffMedia(col("content")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .orderBy("id").collect()
    samples.zip(fromDf).foreach { case (bytes, row) =>
      evalSniff(bytes) match {
        case None =>
          assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(3))
        case Some(r) =>
          assert(row.getString(1) === r.getUTF8String(0).toString)
          assert(row.getInt(2) === r.getInt(1))
          assert(row.getInt(3) === r.getInt(2))
      }
    }
  }

  test("the sniff projection stays inside whole-stage codegen and compiles") {
    // id-dependent bytes — constant bytes would be ConstantFolding'd away
    // before codegen (same Range-source discipline as VectorExprsSpec):
    // GIF89a + width (16+id, little-endian) + height 32
    val df = spark.range(8)
      .select(col("id"), unhex(concat(lit("474946383961"),
        lpad(hex(col("id") + 16), 2, "0"), lit("0020000000"))).as("content"))
      .select(col("id"), Multimodal.sniffMedia(col("content")).as("m"))
    val rows = df.select(col("id"), col("m.width"), col("m.height")).collect()
    rows.foreach(r => assert(r.getInt(1) === 16 + r.getLong(0).toInt &&
      r.getInt(2) === 32))
    val plan = GraftSqlBridge.explainString(df, "simple")
    val projLine = plan.linesIterator.find(_.contains("graft_sniff_media")).get
    assert(projLine.trim.startsWith("*"), s"not codegen'd:\n$plan")
    // janino must accept the generated code (a compile failure would
    // silently fall back to interpreted eval)
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(MediaExprs.SniffMedia(
        Literal.create(encode(3, 4, "png"), BinaryType))))
    val out = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    val struct = out.getStruct(0, 7)
    assert(struct.getInt(1) === 3 && struct.getInt(2) === 4)
  }

  test("tiff: both byte orders, both BitsPerSample storage forms") {
    def tiff(le: Boolean, w: Int, h: Int, samples: Int,
        inlineBits: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(62 + samples * 2).order(
        if (le) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
      buf.put((if (le) "II" else "MM").getBytes("US-ASCII"))
        .putShort(42).putInt(8)
      buf.putShort(4)
      def e(tag: Int, v: Int): Unit = {
        buf.putShort(tag.toShort).putShort(3).putInt(1)
          .putShort(v.toShort).putShort(0); ()
      }
      e(256, w); e(257, h)
      if (samples == 1) e(258, inlineBits)
      else buf.putShort(258).putShort(3).putInt(samples).putInt(62)
      e(277, samples)
      buf.putInt(0)
      (0 until samples).foreach(_ => buf.putShort(12))
      buf.array()
    }
    for (le <- Seq(true, false)) {
      // inline single-sample form
      val r1 = evalSniff(tiff(le, 640, 480, 1, 16)).getOrElse(
        fail(s"tiff le=$le not recognized"))
      assert(r1.getUTF8String(0).toString === "tiff")
      assert(r1.getInt(1) === 640 && r1.getInt(2) === 480)
      assert(r1.getInt(4) === 1)      // channels = SamplesPerPixel
      assert(r1.isNullAt(3) && r1.isNullAt(5))
      assert(r1.getInt(6) === 16)     // inline BitsPerSample
      // offset-stored multi-sample form (3 channels × 12 bits)
      val r3 = evalSniff(tiff(le, 37, 21, 3, 0)).getOrElse(
        fail(s"tiff le=$le multi not recognized"))
      assert(r3.getInt(1) === 37 && r3.getInt(2) === 21)
      assert(r3.getInt(4) === 3 && r3.getInt(6) === 12)
    }
    // truncated: IFD offset past the bytes → null row
    assert(evalSniff(tiff(le = true, 9, 9, 1, 8).take(8)).isEmpty)
    // truncated mid-IFD: whatever entries are in reach survive; the
    // offset-stored bits table is out of reach → bits null, w/h kept
    val cut = tiff(le = true, 37, 21, 3, 0).take(62)
    val rc = evalSniff(cut).getOrElse(fail("truncated tiff dropped w/h"))
    assert(rc.getInt(1) === 37 && rc.getInt(2) === 21 && rc.isNullAt(6))
    // corrupt magic → not tiff
    val bad = tiff(le = true, 9, 9, 1, 8); bad(2) = 0x2b
    assert(evalSniff(bad).isEmpty)
    // interpreted == codegen at the new branch
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(MediaExprs.SniffMedia(
        Literal.create(tiff(le = false, 55, 44, 2, 0), BinaryType))))
    val s = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
      .getStruct(0, 7)
    assert(s.getInt(1) === 55 && s.getInt(2) === 44 &&
      s.getInt(4) === 2 && s.getInt(6) === 12)
  }

  test("graft_sniff_media is reachable from SQL") {
    graft.functions.GraftFunctions.install(spark)
    val df = Multimodal.syntheticMixedMedia(
      spark.range(0, 9).select(col("id").as("doc_id")), "doc_id")
    df.createOrReplaceTempView("media_sniff_sql")
    val out = spark.sql(
      """SELECT media_id, graft_sniff_media(content).format AS f
        |FROM media_sniff_sql ORDER BY media_id""".stripMargin).collect()
    assert(out.map(_.getString(1)).toSeq ===
      Seq("png", "jpeg", "wav", "png", "jpeg", "wav", "png", "jpeg", "wav"))
  }
}
