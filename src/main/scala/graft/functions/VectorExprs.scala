package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native vector kernels as Catalyst `Expression`s with `doGenCode`.
  *
  * The engine's embedding operators originally kept vector math inside
  * whole-stage codegen by literal-expanding per dimension (`element_at`
  * chains) or by routing plane/centroid dots through a posexplode +
  * aggregate. Both shapes are codegen'd but scale badly in the dimension:
  * a dim-D literal expansion generates O(D) expression nodes per use (at
  * real embedding widths — 768 to 3072 — the generated method tree blows
  * past janino's 64 KB limit and whole-stage codegen bails), and the
  * explode shape pays a row-explosion plus a hash aggregate (a shuffle)
  * for what is semantically a per-row projection.
  *
  * These expressions replace both with a tight loop over `ArrayData`:
  * one generated method of constant size at any dimension, no
  * per-element null-check expression nodes, no explode, no aggregate.
  * Accumulation is a sequential left fold in ascending index order —
  * bit-identical to both prior shapes (the literal expansion reduced
  * left-assoc ascending; the exploded sum accumulated in explode order,
  * which is ascending index within the single source row) — so every
  * golden-pinned result is unchanged to the last bit.
  *
  * Null semantics mirror the `element_at` chains they replace: a null
  * array, a null element, or a length mismatch yields NULL (the chain
  * propagated element nulls, and out-of-range `element_at` returned
  * null under non-ANSI semantics, nulling the whole sum).
  *
  * Float arrays are read with an explicit per-element widen to double,
  * so `array<float>` inputs need no `cast(array<double>)` materialization
  * first — the fold is still bit-identical (float→double widening is
  * exact).
  */
object VectorExprs {

  private[functions] def elemOk(t: DataType): Boolean =
    t == DoubleType || t == FloatType

  /** Java source for reading element `i` of `arr` as a double. */
  private def getter(elem: DataType, arr: String, i: String): String =
    elem match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType  => s"((double) $arr.getFloat($i))"
      case other      => throw new IllegalStateException(s"unsupported $other")
    }

  private def getElem(a: ArrayData, elem: DataType, i: Int): Double =
    elem match {
      case DoubleType => a.getDouble(i)
      case FloatType  => a.getFloat(i).toDouble
      case other      => throw new IllegalStateException(s"unsupported $other")
    }

  private def arrayCheck(name: String, types: DataType*): TypeCheckResult = {
    val bad = types.collect {
      case ArrayType(t, _) if !elemOk(t) => t.sql
      case t if !t.isInstanceOf[ArrayType] => t.sql
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<double> or array<float> inputs, got ${bad.mkString(", ")}")
  }

  /** Σᵢ aᵢ·bᵢ in ascending index order; double accumulation. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dot"
    override def checkInputDataTypes(): TypeCheckResult =
      arrayCheck(prettyName, left.dataType, right.dataType)

    @transient private lazy val leftElem =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val rightElem =
      right.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        sum += getElem(a, leftElem, i) * getElem(b, rightElem, i)
        i += 1
      }
      sum
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val sum = ctx.freshName("sum")
        val bad = ctx.freshName("bad")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $sum = 0.0;
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    $sum += ${getter(leftElem, a, i)} * ${getter(rightElem, b, i)};
           |  }
           |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
           |}""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σᵢ aᵢ²), ascending index order. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_l2norm"
    override def checkInputDataTypes(): TypeCheckResult =
      arrayCheck(prettyName, child.dataType)

    @transient private lazy val elem =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var sum = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val x = getElem(a, elem, i)
        sum += x * x
        i += 1
      }
      math.sqrt(sum)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val sum = ctx.freshName("sum")
        val x = ctx.freshName("x")
        val bad = ctx.freshName("bad")
        s"""
           |final int $n = $a.numElements();
           |double $sum = 0.0;
           |boolean $bad = false;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { $bad = true; break; }
           |  final double $x = ${getter(elem, a, i)};
           |  $sum += $x * $x;
           |}
           |if ($bad) { ${ev.isNull} = true; }
           |else { ${ev.value} = java.lang.Math.sqrt($sum); }""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)
  }

  /** Dot products of one vector against every row of a constant matrix
    * (LSH planes, IVF centroids): `out[r] = Σ_d vec[d]·matrix[r][d]`.
    *
    * The matrix ships to executors once via the expression's reference
    * array (`ctx.addReferenceObj`), not as a literal expression tree, so
    * the generated method stays constant-size at any rows×dim. Replaces
    * the posexplode + per-row `sum` aggregate shape — a projection
    * instead of a row explosion and a hash aggregate.
    *
    * NULL on: null array, any null element, or `vec.length != dim`
    * (the aggregate shape silently summed a truncated prefix on a
    * malformed short vector; an explicit NULL is strictly safer and
    * identical on well-formed data).
    */
  case class MatVecDots(child: Expression, matrix: Seq[Seq[Double]])
      extends UnaryExpression {
    require(matrix.nonEmpty, "matrix must have at least one row")
    require(matrix.forall(_.length == matrix.head.length),
      "matrix rows must share one dimension")

    private val rows = matrix.length
    private val dim = matrix.head.length
    @transient private lazy val flat: Array[Double] = matrix.flatten.toArray

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_matvec"
    override def checkInputDataTypes(): TypeCheckResult =
      arrayCheck(prettyName, child.dataType)

    @transient private lazy val elem =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() != dim) return null
      var i = 0
      while (i < dim) {
        if (a.isNullAt(i)) return null
        i += 1
      }
      val out = new Array[Double](rows)
      var r = 0
      while (r < rows) {
        val off = r * dim
        var s = 0.0
        var d = 0
        while (d < dim) {
          s += getElem(a, elem, d) * flat(off + d)
          d += 1
        }
        out(r) = s
        r += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val matRef = ctx.addReferenceObj("graftMatrix", flat, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out")
        val r = ctx.freshName("r")
        val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val off = ctx.freshName("off")
        val bad = ctx.freshName("bad")
        s"""
           |if ($a.numElements() != $dim) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $bad = false;
           |  for (int $d = 0; $d < $dim; $d++) {
           |    if ($a.isNullAt($d)) { $bad = true; break; }
           |  }
           |  if ($bad) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final double[] $out = new double[$rows];
           |    for (int $r = 0; $r < $rows; $r++) {
           |      final int $off = $r * $dim;
           |      double $s = 0.0;
           |      for (int $d = 0; $d < $dim; $d++) {
           |        $s += ${getter(elem, a, d)} * $matRef[$off + $d];
           |      }
           |      $out[$r] = $s;
           |    }
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |  }
           |}""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MatVecDots =
      copy(child = newChild)
  }

  /** Sign-LSH bucket assembly over a plane-dots array: the dots are
    * consumed in groups of `planesPerBand`; bucket b's bit p is set
    * when `dots[b*planesPerBand + p] > 0`. Output: one long bucket per
    * band. Kept native because the `when(element_at(...))` column
    * expansion is bands×planes expression nodes — at 16 bands × 11
    * planes the generated whole-stage method crossed janino's 64 KB
    * limit and the whole stage fell back to interpreted eval. */
  case class SignBuckets(child: Expression, planesPerBand: Int)
      extends UnaryExpression {
    require(planesPerBand > 0, "planesPerBand must be positive")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sign_buckets"
    override def checkInputDataTypes(): TypeCheckResult =
      arrayCheck(prettyName, child.dataType)

    @transient private lazy val elem =
      child.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n % planesPerBand != 0) return null
      val bands = n / planesPerBand
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var bits = 0L
        var p = 0
        while (p < planesPerBand) {
          if (a.isNullAt(b * planesPerBand + p)) return null
          if (getElem(a, elem, b * planesPerBand + p) > 0.0)
            bits |= (1L << p)
          p += 1
        }
        out(b) = bits
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val bands = ctx.freshName("bands")
        val out = ctx.freshName("out")
        val b = ctx.freshName("b")
        val p = ctx.freshName("p")
        val bits = ctx.freshName("bits")
        val idx = ctx.freshName("idx")
        val bad = ctx.freshName("bad")
        s"""
           |final int $n = $a.numElements();
           |if ($n % $planesPerBand != 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  final int $bands = $n / $planesPerBand;
           |  final long[] $out = new long[$bands];
           |  boolean $bad = false;
           |  for (int $b = 0; $b < $bands && !$bad; $b++) {
           |    long $bits = 0L;
           |    for (int $p = 0; $p < $planesPerBand; $p++) {
           |      final int $idx = $b * $planesPerBand + $p;
           |      if ($a.isNullAt($idx)) { $bad = true; break; }
           |      if (${getter(elem, a, idx)} > 0.0) $bits |= (1L << $p);
           |    }
           |    $out[$b] = $bits;
           |  }
           |  if ($bad) { ${ev.isNull} = true; }
           |  else {
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |  }
           |}""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SignBuckets =
      copy(child = newChild)
  }

  /** Total agreeing bits between two equal-length long-array bit
    * signatures, counting `bitsPerElement` low bits per element:
    * `Σᵢ bitsPerElement − popcount(aᵢ xor bᵢ)`.
    *
    * Exists so the LSH signature gate carries ONE array column through
    * its joins: expanding the signature into per-band `element_at`
    * columns made Catalyst's constraint inference re-derive null checks
    * that re-evaluated the entire upstream kernel chain once per band
    * in pushed-down filters — a silent bands× recompute of the
    * plane-dots projection (measured 19 s of a 20 s sf0.1 run). */
  case class BitAgreement(left: Expression, right: Expression,
      bitsPerElement: Int) extends BinaryExpression {
    require(bitsPerElement > 0 && bitsPerElement <= 64,
      "bitsPerElement must be in 1..64")

    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_bit_agreement"
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint> signatures, got ${l.sql}, ${r.sql}")
      }

    private val mask =
      if (bitsPerElement == 64) -1L else (1L << bitsPerElement) - 1

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) return null
      var total = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        total += bitsPerElement -
          java.lang.Long.bitCount((a.getLong(i) ^ b.getLong(i)) & mask)
        i += 1
      }
      total
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val tot = ctx.freshName("tot")
        val bad = ctx.freshName("bad")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $tot = 0L;
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
           |    $tot += $bitsPerElement - java.lang.Long.bitCount(
           |      ($a.getLong($i) ^ $b.getLong($i)) & ${mask}L);
           |  }
           |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $tot; }
           |}""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BitAgreement =
      copy(left = newLeft, right = newRight)
  }

  // ---- Column API ----

  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def l2norm(a: Column): Column =
    GraftSqlBridge.column(L2Norm(GraftSqlBridge.expression(a)))

  def matVecDots(vec: Column, matrix: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(MatVecDots(GraftSqlBridge.expression(vec), matrix))

  def signBuckets(dots: Column, planesPerBand: Int): Column =
    GraftSqlBridge.column(SignBuckets(
      GraftSqlBridge.expression(dots), planesPerBand))

  def bitAgreement(a: Column, b: Column, bitsPerElement: Int): Column =
    GraftSqlBridge.column(BitAgreement(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      bitsPerElement))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
