package graft

import graft.functions.MediaExprs
import graft.ops.Multimodal
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Image-content near-dup: the [[MediaExprs.AverageHash]] kernel (bit
  * semantics, null contracts, no codegen fallback, whole-stage span) and
  * the [[Multimodal.imageNearDupPairs]] pipeline — planted recompressed
  * twins (PNG original, JPEG re-save) must be retrieved, junk bytes must
  * flow through as observable nulls, distinct images must not pair. */
class ImageNearDupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("averageHash kernel: above-mean bits, null contracts, codegen " +
      "compiles") {
    val grid = Literal.create((0 until 64).map(_.toFloat), ArrayType(FloatType))
    // generated code must compile (throws on janino error) and agree
    // with the interpreted eval path
    val proj = GenerateUnsafeProjection.generate(Seq(MediaExprs.AverageHash(grid)))
    val row = proj.apply(InternalRow.empty)
    // mean = 31.5 → cells 32..63 sit above → the high 32 bits
    assert(row.getLong(0) === 0xFFFFFFFF00000000L)
    assert(MediaExprs.AverageHash(grid).eval(null) === 0xFFFFFFFF00000000L)
    // uniform grid: nothing above the mean → fingerprint 0, not null
    assert(MediaExprs.AverageHash(Literal.create(
      Seq.fill(64)(7f), ArrayType(FloatType))).eval(null) === 0L)
    // empty and >64-cell grids are NULL, never an exception
    assert(MediaExprs.AverageHash(Literal.create(
      Seq.empty[Float], ArrayType(FloatType))).eval(null) == null)
    assert(MediaExprs.AverageHash(Literal.create(
      (0 until 65).map(_.toFloat), ArrayType(FloatType))).eval(null) == null)
  }

  test("averageHash is invariant to uniform brightness/contrast shifts") {
    def h(cells: Seq[Float]): Any = MediaExprs.AverageHash(
      Literal.create(cells, ArrayType(FloatType))).eval(null)
    val base = (0 until 64).map(i => if (i % 3 == 0) 200f else 55f)
    assert(h(base) === h(base.map(_ + 30f)))       // brightness
    assert(h(base) === h(base.map(v => v * 0.5f))) // contrast
  }

  test("the fingerprint projection stays inside whole-stage codegen") {
    val df = spark.range(20)
      .select(array((0 until 64).map(d =>
        pmod(col("id") * 7 + lit(d) * 13, lit(64)).cast("float")): _*).as("g"))
      .select(Multimodal.averageHash(col("g")).as("sig"))
    df.collect()
    val plan = GraftSqlBridge.explainString(df, "simple")
    val projLine = plan.linesIterator.find(_.contains("graft_average_hash")).get
    assert(projLine.trim.startsWith("*"), s"not codegen'd:\n$plan")
  }

  test("recompressed twins retrieved: every PNG original pairs with its " +
      "JPEG re-save, and ONLY with it") {
    val base = spark.range(0, 20).toDF("id")
    val orig = Multimodal.syntheticPatternImage(base, "id", "png")
    val twins = Multimodal.syntheticPatternImage(base, "id", "jpg",
      idOffset = 100000L)
    val pairs = Multimodal.imageNearDupPairs(
        orig.unionByName(twins), "media_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keys = pairs.map(p => (p._1, p._2)).toSet
    (0L until 20L).foreach { i =>
      assert(keys.contains((i, i + 100000L)), s"twin pair for id $i missing")
    }
    assert(keys.size === 20, s"unexpected cross-image pairs: " +
      keys.filterNot(p => p._2 - p._1 == 100000L).mkString(", "))
    pairs.foreach(p =>
      assert(p._3 <= 6, s"twin distance blew the budget: $p"))
  }

  test("differenceHash: gradient-sign bits, shift invariance, null on " +
      "non-square grids, codegen compiles; dhash twins retrieved") {
    def h(cells: Seq[Float]): Any = MediaExprs.DifferenceHash(
      Literal.create(cells, ArrayType(FloatType))).eval(null)
    // 2x2 grid [10, 20; 30, 5]: bit set where cell > right neighbor
    // (wrapping): (0,0)=10>20? no; (0,1)=20>10? yes → bit 1;
    // (1,0)=30>5? yes → bit 2; (1,1)=5>30? no
    assert(h(Seq(10f, 20f, 30f, 5f)) === 6L)
    // invariant to uniform brightness/contrast like aHash
    val base = (0 until 64).map(i => if ((i * 7) % 3 == 0) 180f else 60f)
    assert(h(base) === h(base.map(_ + 25f)))
    assert(h(base) === h(base.map(_ * 2f)))
    // where aHash degenerates (low contrast around the mean), dhash
    // still separates: tiny gradient survives a brightness wobble
    val lowc = (0 until 64).map(i => 100f + (i % 8) * 0.5f)
    assert(h(lowc) === h(lowc.map(_ + 0.2f)))
    // non-square cell counts are NULL, never an exception
    assert(h((0 until 6).map(_.toFloat)) == null)
    // generated code compiles and agrees with interpreted eval
    val lit = Literal.create(base, ArrayType(FloatType))
    val proj = GenerateUnsafeProjection.generate(
      Seq(MediaExprs.DifferenceHash(lit)))
    assert(proj.apply(InternalRow.empty).getLong(0) ===
      MediaExprs.DifferenceHash(lit).eval(null))
    // end-to-end under dhash: THUMBNAIL twins (the same pattern
    // rendered at 2x size — a resize re-encode) land at hamming 0
    // through the cell-mean grid. JPEG-noise robustness stays aHash's
    // test: the block fixture has exactly-EQUAL adjacent cells whose
    // gradient sign is undefined under ringing, which is the documented
    // reason dhash targets low-contrast/smooth content instead
    val ids = spark.range(0, 10).toDF("id")
    val both = Multimodal.syntheticPatternImage(ids, "id", "png")
      .unionByName(Multimodal.syntheticPatternImage(ids, "id", "png",
        idOffset = 100000L, side = 32))
    val pairs = Multimodal.imageNearDupPairs(both, "media_id", "content",
        method = "dhash")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    (0L until 10L).foreach { i =>
      assert(pairs.get((i, i + 100000L)).contains(0L),
        s"dhash thumbnail twin for id $i missing or nonzero distance")
    }
  }

  test("undecodable bytes: observable null grid, zero pairs, no crash") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](-9, 0, 4)))
      .toDF("media_id", "content")
    val grids = Multimodal.imageLumaGrid(junk, "media_id", "content").collect()
    assert(grids.length === 2 && grids.forall(_.isNullAt(3)))
    assert(Multimodal.imageNearDupPairs(junk, "media_id", "content")
      .count() === 0L)
  }

  test("grid decode: cell means track the block pattern; smaller-than-" +
      "grid images still fingerprint") {
    val one = spark.range(5, 6).toDF("id")
    val grid = Multimodal.imageLumaGrid(
        Multimodal.syntheticPatternImage(one, "id", "png"),
        "media_id", "content")
      .head()
    assert(grid.getInt(1) === 16 && grid.getInt(2) === 16)
    val cells = grid.getSeq[Float](3)
    assert(cells.length === 64)
    // every cell is exactly one uniform 2x2 block: 55 or 200 luma
    assert(cells.forall(v => math.abs(v - 55f) < 1f || math.abs(v - 200f) < 1f))
    // a 2x2 image through an 8x8 grid: clamped cell ranges, 64 cells out
    val tiny = {
      val im = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      im.setRGB(0, 0, 0xffffff); im.setRGB(1, 1, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      Seq((9L, bos.toByteArray)).toDF("media_id", "content")
    }
    val tg = Multimodal.imageLumaGrid(tiny, "media_id", "content").head()
    assert(tg.getSeq[Float](3).length === 64)
  }
}
