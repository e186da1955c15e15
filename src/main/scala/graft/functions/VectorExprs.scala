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

  /** Shared driver-side prep for the PQ kernels: flatten `m` codebooks
    * of `k` codewords × `dsub` dims into one double[], plus per-codeword
    * |c|² computed with the same ascending Scala fold the Column-chain
    * shape used (`c.map(x*x).sum`) so argmin discriminants are
    * bit-identical to the `least(struct(...))` expansion they replace. */
  private[functions] final class PqBooks(val books: Seq[Seq[Seq[Double]]])
      extends Serializable {
    require(books.nonEmpty && books.head.nonEmpty,
      "codebooks must be non-empty")
    val m: Int = books.size
    val k: Int = books.head.size
    val dsub: Int = books.head.head.size
    require(books.forall(b => b.size == k && b.forall(_.size == dsub)),
      "every subspace codebook must share one (kCodes, dsub) geometry")
    val flat: Array[Double] = books.flatten.flatten.toArray
    val normsSq: Array[Double] =
      books.flatten.map(c => c.map(x => x * x).sum).toArray
  }

  /** Product-quantization encode: the full vector in, the `m` nearest
    * per-subspace codeword indices out — ONE expression for the whole
    * encode. The Column-chain shape (`m` chained selects of
    * `least(struct(...))` over `kCodes` structs each) generated
    * O(m·kCodes) expression nodes: at 8×16 the whole-stage method blew
    * janino's 64 KB limit (stage fell back to interpreted eval), and
    * constraint inference re-expanded the chain into a scan-side Filter
    * that re-ran the entire encode per row. One opaque loop kernel fixes
    * both: constant-size generated code at any (m, kCodes, dim), and
    * nothing for the optimizer to clone.
    *
    * Discriminant is |c|² − 2·v_s·c (the row's |v_s|² is constant per
    * subspace and drops out of the argmin); ties break toward the lower
    * code via strict `<`, matching the struct-least total order. NULL on
    * null array, null element, or `length != m·dsub`. */
  case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    @transient private lazy val pb = new PqBooks(books)
    private val m = books.size
    private val k = books.head.size
    private val dsub = books.head.head.size
    private val dim = m * dsub

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pq_encode"
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
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = 0.0
        var bestJ = -1
        var j = 0
        while (j < k) {
          val off = (s * k + j) * dsub
          var dot = 0.0
          var d = 0
          while (d < dsub) {
            dot += getElem(a, elem, s * dsub + d) * pb.flat(off + d)
            d += 1
          }
          val dist = pb.normsSq(s * k + j) - 2.0 * dot
          if (bestJ < 0 || dist < best) { best = dist; bestJ = j }
          j += 1
        }
        codes(s) = bestJ
        s += 1
      }
      new GenericArrayData(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("graftPqFlat", pb.flat, "double[]")
      val normRef = ctx.addReferenceObj("graftPqNorms", pb.normsSq, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val codes = ctx.freshName("codes")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val d = ctx.freshName("d")
        val off = ctx.freshName("off")
        val dot = ctx.freshName("dot")
        val dist = ctx.freshName("dist")
        val best = ctx.freshName("best")
        val bestJ = ctx.freshName("bestJ")
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
           |    final int[] $codes = new int[$m];
           |    for (int $s = 0; $s < $m; $s++) {
           |      double $best = 0.0;
           |      int $bestJ = -1;
           |      for (int $j = 0; $j < $k; $j++) {
           |        final int $off = ($s * $k + $j) * $dsub;
           |        double $dot = 0.0;
           |        for (int $d = 0; $d < $dsub; $d++) {
           |          $dot += ${getter(elem, a, s"($s * $dsub + $d)")} * $flatRef[$off + $d];
           |        }
           |        final double $dist = $normRef[$s * $k + $j] - 2.0 * $dot;
           |        if ($bestJ < 0 || $dist < $best) { $best = $dist; $bestJ = $j; }
           |      }
           |      $codes[$s] = $bestJ;
           |    }
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
           |  }
           |}""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** Per-query ADC lookup tables as ONE loop kernel: `out(s)(j)` is the
    * full per-subspace squared distance |v_s|² − 2·v_s·c_sj + |c_sj|²
    * for subvector s against codeword j. The Column shape it replaces —
    * `array(array(qn2_s − 2·element_at(qdots_s, j+1) + lit) ×kCodes) ×m`
    * — emits m·kCodes CreateArray slots (512 at 16×32) whose nested
    * array writers janino cannot split below the 64 KB method limit
    * (the ADC stage fell back to interpreted eval). Arithmetic is
    * bit-identical to that shape: ascending-index dot and norm folds
    * (the [[DotProduct]]/[[MatVecDots]] order), codeword |c|² as the
    * left-to-right Scala sum ([[PqBooks.normsSq]]), combined as
    * `(qn2 − 2.0·dot) + |c|²`. NULL on null/wrong-length vector or any
    * null element. */
  case class AdcTables(child: Expression, books: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    @transient private lazy val pb = new PqBooks(books)
    private val m = books.size
    private val k = books.head.size
    private val dsub = books.head.head.size
    private val dim = m * dsub

    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_adc_tables"
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
      val outer = new Array[AnyRef](m)
      var s = 0
      while (s < m) {
        var qn2 = 0.0
        var d = 0
        while (d < dsub) {
          val x = getElem(a, elem, s * dsub + d)
          qn2 += x * x
          d += 1
        }
        val inner = new Array[Double](k)
        var j = 0
        while (j < k) {
          val off = (s * k + j) * dsub
          var dot = 0.0
          d = 0
          while (d < dsub) {
            dot += getElem(a, elem, s * dsub + d) * pb.flat(off + d)
            d += 1
          }
          inner(j) = (qn2 - 2.0 * dot) + pb.normsSq(s * k + j)
          j += 1
        }
        outer(s) = new GenericArrayData(inner)
        s += 1
      }
      new GenericArrayData(outer)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("graftAdcFlat", pb.flat, "double[]")
      val normRef = ctx.addReferenceObj("graftAdcNorms", pb.normsSq, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val outer = ctx.freshName("outer")
        val inner = ctx.freshName("inner")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val d = ctx.freshName("d")
        val off = ctx.freshName("off")
        val dot = ctx.freshName("dot")
        val qn2 = ctx.freshName("qn2")
        val x = ctx.freshName("x")
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
           |    final Object[] $outer = new Object[$m];
           |    for (int $s = 0; $s < $m; $s++) {
           |      double $qn2 = 0.0;
           |      for (int $d = 0; $d < $dsub; $d++) {
           |        final double $x = ${getter(elem, a, s"($s * $dsub + $d)")};
           |        $qn2 += $x * $x;
           |      }
           |      final double[] $inner = new double[$k];
           |      for (int $j = 0; $j < $k; $j++) {
           |        final int $off = ($s * $k + $j) * $dsub;
           |        double $dot = 0.0;
           |        for (int $d = 0; $d < $dsub; $d++) {
           |          $dot += ${getter(elem, a, s"($s * $dsub + $d)")} * $flatRef[$off + $d];
           |        }
           |        $inner[$j] = ($qn2 - 2.0 * $dot) + $normRef[$s * $k + $j];
           |      }
           |      $outer[$s] =
           |        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($inner);
           |    }
           |    ${ev.value} =
           |      new org.apache.spark.sql.catalyst.util.GenericArrayData($outer);
           |  }
           |}""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): AdcTables =
      copy(child = newChild)
  }

  /** `vec − matrix[idx]` as one loop kernel: the residual step of
    * residual-quantized IVFADC (vector minus its cell's centroid, cell
    * chosen per row). The Column-expression alternative —
    * `zip_with(v, element_at(<literal array of arrays>, idx+1), -)` —
    * embeds rows×dim literal nodes per use (1 024 at 16×64, 12 288 at
    * 16×768: the janino ceiling again); here the matrix ships once per
    * executor via `addReferenceObj`. NULL on null/short vector or an
    * out-of-range index. */
  case class VecSubRow(left: Expression, right: Expression,
      matrix: Seq[Seq[Double]]) extends BinaryExpression {
    require(matrix.nonEmpty, "matrix must have at least one row")
    require(matrix.forall(_.length == matrix.head.length),
      "matrix rows must share one dimension")
    private val rows = matrix.length
    private val dim = matrix.head.length
    @transient private lazy val flat: Array[Double] = matrix.flatten.toArray

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_vec_sub_row"
    override def checkInputDataTypes(): TypeCheckResult = {
      val vecOk = left.dataType match {
        case ArrayType(e, _) => elemOk(e)
        case _ => false
      }
      if (!vecOk)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: first argument must be array<float|double>")
      else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(right.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: second argument must be integral")
      else TypeCheckResult.TypeCheckSuccess
    }

    @transient private lazy val elem =
      left.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(v: Any, ix: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val idx = ix match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case b: Byte => b.toLong
      }
      if (idx < 0 || idx >= rows || a.numElements() != dim) return null
      var i = 0
      while (i < dim) {
        if (a.isNullAt(i)) return null
        i += 1
      }
      val off = idx.toInt * dim
      val out = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        out(d) = getElem(a, elem, d) - flat(off + d)
        d += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val matRef = ctx.addReferenceObj("graftSubMatrix", flat, "double[]")
      nullSafeCodeGen(ctx, ev, (a, ix) => {
        val out = ctx.freshName("out")
        val d = ctx.freshName("d")
        val off = ctx.freshName("off")
        val bad = ctx.freshName("bad")
        s"""
           |if ((long)$ix < 0L || (long)$ix >= ${rows}L || $a.numElements() != $dim) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $bad = false;
           |  for (int $d = 0; $d < $dim; $d++) {
           |    if ($a.isNullAt($d)) { $bad = true; break; }
           |  }
           |  if ($bad) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final int $off = (int)$ix * $dim;
           |    final double[] $out = new double[$dim];
           |    for (int $d = 0; $d < $dim; $d++) {
           |      $out[$d] = ${getter(elem, a, d)} - $matRef[$off + $d];
           |    }
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |  }
           |}""".stripMargin
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecSubRow =
      copy(left = newLeft, right = newRight)
  }

  /** Coordinate permutation `out(i) = in(perm(i))` as one loop kernel.
    * The Column-expression alternative — `array(element_at(v, p+1) ×dim)`
    * — clones the `v` subtree `dim` times; with the OPQ residual subtree
    * as `v` (VecSubRow under a join) the 64 copies crossed janino's
    * 64 KB whole-stage limit and the stage fell back to interpreted
    * eval. Here `v` is evaluated once and `perm` ships per executor via
    * `addReferenceObj`, so generated code is constant-size in dim.
    * NULL on null/wrong-length vector or any null element (the chained
    * form produced an array WITH nulls there, which the downstream PQ
    * kernels mapped to NULL anyway — net behavior unchanged). */
  case class Permute(child: Expression, perm: Seq[Int])
      extends UnaryExpression {
    require(perm.nonEmpty && perm.sorted == perm.indices,
      "perm must be a permutation of 0 until dim")
    private val dim = perm.length
    @transient private lazy val p: Array[Int] = perm.toArray

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_permute"
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
      val out = new Array[Double](dim)
      i = 0
      while (i < dim) {
        out(i) = getElem(a, elem, p(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val permRef = ctx.addReferenceObj("graftPerm", p, "int[]")
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val bad = ctx.freshName("bad")
        s"""
           |if ($a.numElements() != $dim) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $dim; $i++) {
           |    if ($a.isNullAt($i)) { $bad = true; break; }
           |  }
           |  if ($bad) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final double[] $out = new double[$dim];
           |    for (int $i = 0; $i < $dim; $i++) {
           |      $out[$i] = ${getter(elem, a, s"$permRef[$i]")};
           |    }
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |  }
           |}""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Permute =
      copy(child = newChild)
  }

  /** Upper-triangular outer product `out(p) = v(i)·v(j)` for i ≤ j,
    * row-major pair order `p = i·d − i(i−1)/2 + (j−i)` — the per-row
    * contribution to a covariance second-moment matrix, emitted as ONE
    * loop kernel so the rotation trainer's moment pass (posexplode →
    * per-pair decimal sums, the [[graft.ops.Pq.trainPermutation]]
    * aggregation pattern at d(d+1)/2 groups) stays inside whole-stage
    * codegen. NULL on null/wrong-length vector or any null element. */
  case class OuterUpper(child: Expression, dim: Int)
      extends UnaryExpression {
    require(dim >= 1, "dim must be positive")
    private val nPairs = dim * (dim + 1) / 2

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_outer_upper"
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
      val out = new Array[Double](nPairs)
      var p = 0
      i = 0
      while (i < dim) {
        val xi = getElem(a, elem, i)
        var j = i
        while (j < dim) {
          out(p) = xi * getElem(a, elem, j)
          p += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val p = ctx.freshName("p")
        val xi = ctx.freshName("xi")
        val bad = ctx.freshName("bad")
        s"""
           |if ($a.numElements() != $dim) {
           |  ${ev.isNull} = true;
           |} else {
           |  boolean $bad = false;
           |  for (int $i = 0; $i < $dim; $i++) {
           |    if ($a.isNullAt($i)) { $bad = true; break; }
           |  }
           |  if ($bad) {
           |    ${ev.isNull} = true;
           |  } else {
           |    final double[] $out = new double[$nPairs];
           |    int $p = 0;
           |    for (int $i = 0; $i < $dim; $i++) {
           |      final double $xi = ${getter(elem, a, i)};
           |      for (int $j = $i; $j < $dim; $j++) {
           |        $out[$p++] = $xi * ${getter(elem, a, j)};
           |      }
           |    }
           |    ${ev.value} =
           |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
           |  }
           |}""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): OuterUpper =
      copy(child = newChild)
  }

  /** Total squared PQ reconstruction error of a vector: per subspace,
    * pick the codeword by the SAME |c|²−2·v·c argmin as [[PqEncode]]
    * (so the measured error is the error of the codes actually stored),
    * then accumulate the true Σ(v_d − c_d)² in ascending dim order,
    * subspaces left-to-right — bit-identical to the zip_with/aggregate
    * Column shape it replaces, which literal-embedded the whole codebook
    * per use. NULL semantics as [[PqEncode]]. */
  case class PqReconSq(child: Expression, books: Seq[Seq[Seq[Double]]])
      extends UnaryExpression {
    @transient private lazy val pb = new PqBooks(books)
    private val m = books.size
    private val k = books.head.size
    private val dsub = books.head.head.size
    private val dim = m * dsub

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_pq_recon_sq"
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
      var err = 0.0
      var s = 0
      while (s < m) {
        var best = 0.0
        var bestJ = -1
        var j = 0
        while (j < k) {
          val off = (s * k + j) * dsub
          var dot = 0.0
          var d = 0
          while (d < dsub) {
            dot += getElem(a, elem, s * dsub + d) * pb.flat(off + d)
            d += 1
          }
          val dist = pb.normsSq(s * k + j) - 2.0 * dot
          if (bestJ < 0 || dist < best) { best = dist; bestJ = j }
          j += 1
        }
        val off = (s * k + bestJ) * dsub
        var sub = 0.0
        var d = 0
        while (d < dsub) {
          val diff = getElem(a, elem, s * dsub + d) - pb.flat(off + d)
          sub += diff * diff
          d += 1
        }
        err += sub
        s += 1
      }
      err
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("graftPqFlat", pb.flat, "double[]")
      val normRef = ctx.addReferenceObj("graftPqNorms", pb.normsSq, "double[]")
      nullSafeCodeGen(ctx, ev, a => {
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val d = ctx.freshName("d")
        val off = ctx.freshName("off")
        val dot = ctx.freshName("dot")
        val dist = ctx.freshName("dist")
        val best = ctx.freshName("best")
        val bestJ = ctx.freshName("bestJ")
        val err = ctx.freshName("err")
        val sub = ctx.freshName("sub")
        val diff = ctx.freshName("diff")
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
           |    double $err = 0.0;
           |    for (int $s = 0; $s < $m; $s++) {
           |      double $best = 0.0;
           |      int $bestJ = -1;
           |      for (int $j = 0; $j < $k; $j++) {
           |        final int $off = ($s * $k + $j) * $dsub;
           |        double $dot = 0.0;
           |        for (int $d = 0; $d < $dsub; $d++) {
           |          $dot += ${getter(elem, a, s"($s * $dsub + $d)")} * $flatRef[$off + $d];
           |        }
           |        final double $dist = $normRef[$s * $k + $j] - 2.0 * $dot;
           |        if ($bestJ < 0 || $dist < $best) { $best = $dist; $bestJ = $j; }
           |      }
           |      final int $off = ($s * $k + $bestJ) * $dsub;
           |      double $sub = 0.0;
           |      for (int $d = 0; $d < $dsub; $d++) {
           |        final double $diff = ${getter(elem, a, s"($s * $dsub + $d)")} - $flatRef[$off + $d];
           |        $sub += $diff * $diff;
           |      }
           |      $err += $sub;
           |    }
           |    ${ev.value} = $err;
           |  }
           |}""".stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): PqReconSq =
      copy(child = newChild)
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

  def vecSubRow(vec: Column, idx: Column, matrix: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(VecSubRow(GraftSqlBridge.expression(vec),
      GraftSqlBridge.expression(idx), matrix))

  def pqEncode(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(vec), books))

  def permute(vec: Column, perm: Seq[Int]): Column =
    GraftSqlBridge.column(Permute(GraftSqlBridge.expression(vec), perm))

  def adcTables(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftSqlBridge.column(AdcTables(GraftSqlBridge.expression(vec), books))

  def outerUpper(vec: Column, dim: Int): Column =
    GraftSqlBridge.column(OuterUpper(GraftSqlBridge.expression(vec), dim))

  def pqReconSq(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftSqlBridge.column(PqReconSq(GraftSqlBridge.expression(vec), books))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
