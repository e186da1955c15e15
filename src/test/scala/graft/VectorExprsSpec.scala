package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftSqlBridge, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Native vector kernels (DotProduct / L2Norm / MatVecDots): bit-equality
  * against the lambda and literal-expansion shapes they replace, null
  * semantics, float widening, and the codegen claim (the projection must
  * sit inside a WholeStageCodegen span — the whole point of the native
  * expression is NOT falling back to interpreted eval). */
class VectorExprsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random vector (no RNG state). */
  private def vec(seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d =>
      scala.util.hashing.MurmurHash3.productHash((seed, d)).toDouble / Int.MaxValue)

  /** The lambda fold the kernels replaced (CodegenFallback — kept here
    * as the bit-equality oracle only). */
  private def lambdaDot(x: org.apache.spark.sql.Column,
      y: org.apache.spark.sql.Column) =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
  private def lambdaNorm(x: org.apache.spark.sql.Column) =
    sqrt(aggregate(x, lit(0.0d), (acc, v) => acc + v * v))

  test("dot and l2norm are bit-identical to the lambda fold") {
    val rows = (0 until 50).map(i => (i.toLong, vec(i, 64), vec(i + 1000, 64)))
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorExprs.dot(col("a"), col("b")).as("nd"),
      lambdaDot(col("a"), col("b")).as("ld"),
      VectorExprs.l2norm(col("a")).as("nn"),
      lambdaNorm(col("a")).as("ln")).collect()
    out.foreach { r =>
      // exact — same ascending-index left fold, just codegen'd
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("float arrays widen exactly (no cast materialization needed)") {
    val rows = (0 until 20).map { i =>
      (vec(i, 16).map(_.toFloat), vec(i + 7, 16).map(_.toFloat))
    }
    val df = rows.toDF("fa", "fb")
    val out = df.select(
      VectorExprs.dot(col("fa"), col("fb")).as("native_float"),
      VectorExprs.dot(col("fa").cast("array<double>"),
        col("fb").cast("array<double>")).as("native_double")).collect()
    out.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("null semantics: null array, null element, length mismatch") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)),
      StructField("b", ArrayType(DoubleType))))
    val data = Seq(
      Row(null, Seq(1.0, 2.0)),                 // null array
      Row(Seq(1.0, null), Seq(1.0, 2.0)),       // null element
      Row(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),   // length mismatch
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)))        // clean
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(r => Row(
        Option(r.get(0)).map(_.asInstanceOf[Seq[Any]]).orNull,
        r.get(1).asInstanceOf[Seq[Any]]))), schema)
    val out = df.select(
      VectorExprs.dot(col("a"), col("b")).as("d"),
      VectorExprs.l2norm(col("a")).as("n")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    assert(out(2).isNullAt(0))                    // mismatch → null dot
    assert(!out(2).isNullAt(1))                   // norm of the valid side
    assert(out(3).getDouble(0) === 11.0)
    assert(out(3).getDouble(1) === math.sqrt(5.0))
  }

  test("matVecDots is bit-identical to the literal-expansion fold") {
    val planes = (0 until 48).map(p => vec(9000 + p, 64))
    val df = (0 until 30).map(i => Tuple1(vec(i, 64))).toDF("v")
    val litCols = planes.zipWithIndex.map { case (pl, p) =>
      (0 until 64).map(d => element_at(col("v"), d + 1) * lit(pl(d)))
        .reduce(_ + _).as(s"lit_$p")
    }
    val out = df.select(
      (VectorExprs.matVecDots(col("v"), planes).as("native") +: litCols): _*)
      .collect()
    out.foreach { r =>
      val native = r.getSeq[Double](0)
      (0 until 48).foreach(p => assert(
        java.lang.Double.doubleToLongBits(native(p)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(p + 1)),
        s"plane $p"))
    }
  }

  test("matVecDots null semantics: wrong dim and null element → null row") {
    val planes = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType))))
    val data = Seq(Row(Seq(1.0, 1.0)), Row(Seq(1.0)), Row(Seq(1.0, null)), Row(null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(data), schema)
    val out = df.select(VectorExprs.matVecDots(col("v"), planes).as("d")).collect()
    assert(out(0).getSeq[Double](0) === Seq(3.0, 7.0))
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    assert(out(3).isNullAt(0))
  }

  test("signBuckets matches the when(element_at) column expansion") {
    val bands = 16
    val p = 11
    val planes = (0 until bands * p).map(i => vec(3000 + i, 8))
    val df = spark.range(40)
      .select(array((0 until 8).map(d =>
        sin(col("id") * (d + 1)).cast("double")): _*).as("v"))
      .select(VectorExprs.matVecDots(col("v"), planes).as("__dots"))
    val litCols = (0 until bands).map { b =>
      (0 until p).map(q =>
        when(element_at(col("__dots"), b * p + q + 1) > 0, lit(1L << q))
          .otherwise(lit(0L))).reduce(_ + _).as(s"lit_$b")
    }
    val out = df.select(
      (VectorExprs.signBuckets(col("__dots"), p).as("native") +: litCols): _*)
      .collect()
    out.foreach { r =>
      val native = r.getSeq[Long](0)
      (0 until bands).foreach(b =>
        assert(native(b) === r.getLong(b + 1), s"band $b"))
    }
  }

  test("interpreted eval path matches codegen (direct Expression.eval)") {
    val a = Literal.create(Seq(1.5, -2.0, 3.25), ArrayType(DoubleType))
    val b = Literal.create(Seq(2.0, 0.5, -1.0), ArrayType(DoubleType))
    val d = VectorExprs.DotProduct(a, b).eval(null)
    assert(d === (1.5 * 2.0 + -2.0 * 0.5 + 3.25 * -1.0))
    val n = VectorExprs.L2Norm(a).eval(null)
    assert(n === math.sqrt(1.5 * 1.5 + 4.0 + 3.25 * 3.25))
    val mv = VectorExprs.MatVecDots(a, Seq(Seq(1.0, 1.0, 1.0), Seq(2.0, 0.0, 0.0)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(mv.toDoubleArray.toSeq === Seq(2.75, 3.0))
  }

  test("the projection stays inside whole-stage codegen") {
    // a Range source (not a local Seq — ConvertToLocalRelation would fold
    // the projection away at optimization time, interpreted)
    val df = spark.range(10)
      .select(array((0 until 8).map(d =>
        (col("id") + lit(d)).cast("double")): _*).as("v"))
      .select(VectorExprs.dot(col("v"), col("v")).as("d"),
        VectorExprs.l2norm(col("v")).as("n"),
        VectorExprs.matVecDots(col("v"), Seq(vec(1, 8))).as("m"))
    df.collect()
    val plan = GraftSqlBridge.explainString(df, "simple")
    // codegen'd spans are starred in the plan string; the Project line
    // carrying the kernels must be one of them
    val projLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(projLine.trim.startsWith("*"), s"not codegen'd:\n$plan")
  }

  test("adcTables is bit-identical to the qn2−2·dot+|c|² column expansion " +
      "and compiles at 16×32 geometry") {
    // 2 subspaces × 3 codewords × dsub 2: expected computed with the
    // EXACT float-op order the old Column shape used — ascending dot
    // and norm folds, (qn2 − 2.0·dot) + Σc² left-to-right
    val books = Seq(
      Seq(Seq(0.1, -0.2), Seq(1.0, 1.0), Seq(-3.0, 0.5)),
      Seq(Seq(2.0, 0.0), Seq(0.25, -1.5), Seq(0.0, 0.0)))
    val vec = Seq(1.2, -0.8, 0.5, 2.0)
    val expected = (0 until 2).map { s =>
      val sub = vec.slice(s * 2, s * 2 + 2)
      val qn2 = sub.foldLeft(0.0)((acc, x) => acc + x * x)
      books(s).map { c =>
        val dot = sub.zip(c).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
        (qn2 - 2.0 * dot) + c.map(x => x * x).sum
      }
    }
    val e = VectorExprs.AdcTables(
      Literal.create(vec, ArrayType(DoubleType)), books)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val got = (0 until 2).map(s => interp.getArray(s).toDoubleArray.toSeq)
    assert(got === expected)
    // null semantics: wrong length and null element → null
    assert(VectorExprs.AdcTables(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)), books)
      .eval(null) == null)
    assert(VectorExprs.AdcTables(
      Literal.create(Seq(1.0, null, 0.5, 2.0), ArrayType(DoubleType)), books)
      .eval(null) == null)
    // compiled path agrees, at BOTH the small geometry and the 16×32
    // geometry that used to blow janino's 64 KB limit
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(e))
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    val compiled = (0 until 2).map(s =>
      row.getArray(0).getArray(s).toDoubleArray.toSeq)
    assert(compiled === expected)
    val bigBooks = (0 until 16).map(s => (0 until 32).map(j =>
      (0 until 4).map(d => (s * 128 + j * 4 + d).toDouble * 0.001 - 0.5)))
    val bigVec = (0 until 64).map(i => math.sin(i.toDouble))
    val bigExpr = VectorExprs.AdcTables(
      Literal.create(bigVec, ArrayType(DoubleType)), bigBooks)
    val bigProj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(bigExpr)) // throws on janino error
    val bigRow = bigProj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    val bigInterp = bigExpr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until 16).foreach { s =>
      assert(bigRow.getArray(0).getArray(s).toDoubleArray.toSeq ===
        bigInterp.getArray(s).toDoubleArray.toSeq)
    }
  }

  test("outerUpper emits v(i)·v(j) for i<=j in row-major pair order, " +
      "compiled == interpreted") {
    val vec = Seq(1.5, -2.0, 0.5)
    val expected = Seq(1.5 * 1.5, 1.5 * -2.0, 1.5 * 0.5,
      -2.0 * -2.0, -2.0 * 0.5, 0.5 * 0.5)
    val e = VectorExprs.OuterUpper(
      Literal.create(vec, ArrayType(DoubleType)), 3)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray.toSeq
    assert(interp === expected)
    // wrong length / null element → null
    assert(VectorExprs.OuterUpper(
      Literal.create(Seq(1.0), ArrayType(DoubleType)), 3).eval(null) == null)
    assert(VectorExprs.OuterUpper(
      Literal.create(Seq(1.0, null, 2.0), ArrayType(DoubleType)), 3)
      .eval(null) == null)
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(e)) // throws on janino error
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(row.getArray(0).toDoubleArray.toSeq === expected)
  }

  test("no codegen fallback: generated projection code compiles (no janino error)") {
    // a compile failure silently falls back to interpreted eval — catch it
    // by generating + compiling the projection code directly
    val exprs = Seq(
      VectorExprs.DotProduct(
        Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
        Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType))),
      VectorExprs.L2Norm(Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType))),
      VectorExprs.MatVecDots(
        Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))))
    // throws if janino rejects the generated code
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(exprs)
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === math.sqrt(5.0))
    assert(row.getArray(2).toDoubleArray.toSeq === Seq(1.0, 2.0))
  }
}
