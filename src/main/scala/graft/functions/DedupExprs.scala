package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row kernels for the text-dedup family (MinHash, SimHash).
  *
  * Both fingerprints are per-document functions of the token array, but
  * the original shapes computed them as corpus-wide AGGREGATES — explode
  * the tokens, window-lead them into shingles, distinct the hashes,
  * groupBy the document — because Spark's array lambdas are
  * CodegenFallback and the per-seed/per-bit column expansions were the
  * only codegen'd alternative. That cost real exchanges: the shingle
  * front alone paid a window sort plus a distinct shuffle plus the
  * signature groupBy, all keyed by doc id, before any candidate was
  * generated.
  *
  * These expressions collapse each front to ONE projection: a tight
  * loop over the token `ArrayData`, calling the same hash primitives
  * Spark's own expressions use (`XXH64.hashUTF8String` with seed 42 for
  * `xxhash64`, `Murmur3_x86_32.hashLong/hashInt` with seed 42 for
  * `hash(h, i)`), so every produced value is bit-identical to the
  * aggregate shapes — signatures, band buckets and Jaccard numbers all
  * replay exactly against the pinned goldens. Codegen emits a single
  * static call into [[DedupKernels]]; the heavy loop runs as compiled
  * Scala inside the whole-stage-generated method, never as interpreted
  * expression fallback.
  *
  * Null semantics: a null token array returns NULL; an EMPTY token
  * array returns NULL too (the explode shapes dropped such documents —
  * callers filter nulls to preserve "no rows for empty docs"). Null
  * elements cannot come out of `split()`; they are skipped inside a
  * shingle (mirroring `concat_ws`) and skipped by SimHash.
  */
object DedupExprs {

  /** Distinct shingle hashes of a token array, first-occurrence order.
    *
    * Shingles are the space-joins of `shingleSize` consecutive tokens
    * at every valid start (`p + shingleSize <= len`), plus the
    * truncated whole-prefix shingle at position 0 when the document is
    * shorter than one shingle — exactly the window-lead construction it
    * replaces; each is hashed with xxhash64 (seed 42) and deduped.
    *
    * Deliberately SEPARATE from [[MinHashSigs]]: a projection has no
    * exchange for Spark to reuse, so consumers that only need the hash
    * sets (the Jaccard verify joins) must not pay the numHashes×
    * signature murmurs on recompute — column pruning drops the
    * signature expression wherever `sigs` is unused. */
  case class ShingleHashes(child: Expression, shingleSize: Int)
      extends UnaryExpression {
    require(shingleSize > 0, "shingleSize must be positive")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_shingle_hashes"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      DedupKernels.shingleHashes(v.asInstanceOf[ArrayData], shingleSize)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val r = ctx.freshName("sh")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.DedupKernels.shingleHashes($a, $shingleSize);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** POSITIONAL shingle hashes: one xxhash64 per start position, in
    * position order, NO dedup — `result[p]` is the hash of the window
    * starting at token `p`. The span-level contamination ops need the
    * position (to report and cut the covered interval), which
    * [[ShingleHashes]]'s first-occurrence dedup deliberately discards.
    * Hash values are bit-identical to [[ShingleHashes]]' (same shingle
    * construction incl. the truncated position-0 rule on short docs,
    * same seed), so hits agree across the dedup'd and positional
    * fronts. Empty/null token array → null (match [[ShingleHashes]]). */
  case class PositionalShingleHashes(child: Expression, shingleSize: Int)
      extends UnaryExpression {
    require(shingleSize > 0, "shingleSize must be positive")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_positional_shingle_hashes"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      DedupKernels.positionalShingleHashes(
        v.asInstanceOf[ArrayData], shingleSize)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val r = ctx.freshName("psh")
        s"""
           |org.apache.spark.sql.catalyst.util.ArrayData $r =
           |  graft.functions.DedupKernels.positionalShingleHashes($a, $shingleSize);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
           |""".stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): PositionalShingleHashes =
      copy(child = newChild)
  }

  /** `numHashes` MinHash signature minima over a shingle-hash array:
    * `sigs[i] = min over h of hash(h, i)` with Spark's `hash()` murmur3
    * folding (seed 42 → hashLong(h) → hashInt(i)) — value-identical to
    * the `min(hash(col, lit(i)))` aggregates it replaces. */
  case class MinHashSigs(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes > 0, "numHashes must be positive")

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_minhash_sigs"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint> hashes, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      DedupKernels.minhashSigs(v.asInstanceOf[ArrayData], numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.functions.DedupKernels.minhashSigs($a, $numHashes);"
      })

    override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
      copy(child = newChild)
  }

  /** 64-bit SimHash over the token array: xxhash64 each token (seed 42),
    * bit b of the fingerprint is set when tokens with bit b set outweigh
    * those without — identical to the per-bit ±1 sum aggregate it
    * replaces (integer sums are order-free, so the value is exact). */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_simhash"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      DedupKernels.simhash64(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val r = ctx.freshName("sh")
        s"""
           |java.lang.Long $r = graft.functions.DedupKernels.simhash64($a);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.longValue(); }
           |""".stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** Distinct `n`-token windows of a token array as TEXT, first-
    * occurrence order — the loop-kernel form of
    * `array_distinct(transform(sequence(0, size-n), i ->
    * concat_ws(' ', slice(t, i+1, n))))`, which Spark evaluates as an
    * interpreted lambda per position with a fresh slice allocation
    * each time (higher-order functions are CodegenFallback).
    *
    * `truncated = true` adds [[ShingleHashes]]'s short-document rule:
    * an array shorter than `n` contributes ONE whole-array window
    * (the Bloom-gate keying contract — short docs can still pair);
    * `truncated = false` returns an empty array for short inputs
    * (callers pre-filter on size >= n, explode then emits nothing). */
  case class DistinctTokenWindows(child: Expression, n: Int,
      truncated: Boolean) extends UnaryExpression {
    require(n > 0, "window size must be positive")

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_token_windows"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      DedupKernels.tokenWindows(v.asInstanceOf[ArrayData], n, truncated)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.functions.DedupKernels.tokenWindows($a, $n, $truncated);"
      })

    override protected def withNewChildInternal(
        newChild: Expression): DistinctTokenWindows = copy(child = newChild)
  }

  /** Content-defined chunk boundary candidates: the 1-based positions
    * `p` in `[window, len]` where the engine-portable boundary hash
    * `conv(substring(md5(concat_ws(' ', slice(t, p-window+1, window))),
    * 1, 8), 16, 10) % divisor = 0` — bit-identical to the SQL form
    * (the first 8 hex chars of the md5 ARE the first 4 digest bytes),
    * computed as one compiled md5-per-position loop instead of an
    * interpreted lambda that re-slices, re-joins, hex-encodes and
    * re-parses at every position. Arrays shorter than `window` return
    * an empty array (the whole document becomes one chunk). */
  case class CdcBoundaries(child: Expression, window: Int, divisor: Int)
      extends UnaryExpression {
    require(window > 0, "window must be positive")
    require(divisor > 1, "divisor must exceed 1")

    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_cdc_boundaries"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${t.sql}")
    }

    override def nullSafeEval(v: Any): Any =
      DedupKernels.cdcBoundaries(v.asInstanceOf[ArrayData], window, divisor)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        s"${ev.value} = graft.functions.DedupKernels.cdcBoundaries($a, $window, $divisor);"
      })

    override protected def withNewChildInternal(
        newChild: Expression): CdcBoundaries = copy(child = newChild)
  }

  // ---- Column API ----

  def positionalShingleHashes(tokens: Column, shingleSize: Int): Column =
    GraftSqlBridge.column(PositionalShingleHashes(
      GraftSqlBridge.expression(tokens), shingleSize))

  def shingleHashes(tokens: Column, shingleSize: Int): Column =
    GraftSqlBridge.column(ShingleHashes(
      GraftSqlBridge.expression(tokens), shingleSize))

  def distinctTokenWindows(tokens: Column, n: Int,
      truncated: Boolean = false): Column =
    GraftSqlBridge.column(DistinctTokenWindows(
      GraftSqlBridge.expression(tokens), n, truncated))

  def cdcBoundaries(tokens: Column, window: Int, divisor: Int): Column =
    GraftSqlBridge.column(CdcBoundaries(
      GraftSqlBridge.expression(tokens), window, divisor))

  def minHashSigs(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashSigs(
      GraftSqlBridge.expression(hashes), numHashes))

  def simHash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))
}

/** Static per-row workers called from both `eval` and generated code —
  * the loops live here as compiled Scala, so codegen'd plans make one
  * static call per row instead of interpreting per-element lambdas. */
object DedupKernels {

  private val Space = UTF8String.fromString(" ")

  /** See [[DedupExprs.ShingleHashes]]. Returns null for an empty
    * token array (the explode shapes dropped such docs). */
  def shingleHashes(tokens: ArrayData, shingleSize: Int): ArrayData = {
    val len = tokens.numElements()
    if (len == 0) return null
    // distinct shingle hashes, first-occurrence order
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val parts = new Array[UTF8String](shingleSize)
    var p = 0
    val lastStart = math.max(0, len - shingleSize)
    while (p <= lastStart) {
      // a start is valid when its last token exists and is non-null —
      // except position 0, which always contributes (possibly truncated)
      val full = p + shingleSize <= len
      if (p == 0 || (full && !tokens.isNullAt(p + shingleSize - 1))) {
        var i = p
        var m = 0
        val hi = math.min(p + shingleSize, len)
        while (i < hi) {
          if (!tokens.isNullAt(i)) { parts(m) = tokens.getUTF8String(i); m += 1 }
          i += 1
        }
        val shingle =
          if (m == shingleSize) UTF8String.concatWs(Space, parts: _*)
          else UTF8String.concatWs(Space, java.util.Arrays.copyOf(parts, m): _*)
        seen.add(XXH64.hashUTF8String(shingle, 42L))
      }
      p += 1
    }
    val hashes = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { hashes(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(hashes)
  }

  /** See [[DedupExprs.PositionalShingleHashes]]: [[shingleHashes]]'
    * shingle construction and hashing, positional and undeduped. */
  def positionalShingleHashes(tokens: ArrayData, shingleSize: Int): ArrayData = {
    val len = tokens.numElements()
    if (len == 0) return null
    val parts = new Array[UTF8String](shingleSize)
    val lastStart = math.max(0, len - shingleSize)
    val hashes = new Array[Long](lastStart + 1)
    var p = 0
    while (p <= lastStart) {
      var i = p
      var m = 0
      val hi = math.min(p + shingleSize, len)
      while (i < hi) {
        if (!tokens.isNullAt(i)) { parts(m) = tokens.getUTF8String(i); m += 1 }
        i += 1
      }
      val shingle =
        if (m == shingleSize) UTF8String.concatWs(Space, parts: _*)
        else UTF8String.concatWs(Space, java.util.Arrays.copyOf(parts, m): _*)
      hashes(p) = XXH64.hashUTF8String(shingle, 42L)
      p += 1
    }
    new GenericArrayData(hashes)
  }

  /** See [[DedupExprs.DistinctTokenWindows]]. */
  def tokenWindows(tokens: ArrayData, n: Int,
      truncated: Boolean): ArrayData = {
    val len = tokens.numElements()
    val parts = new Array[UTF8String](n)
    def window(start: Int, end: Int): UTF8String = {
      var i = start
      var m = 0
      while (i < end) {
        if (!tokens.isNullAt(i)) { parts(m) = tokens.getUTF8String(i); m += 1 }
        i += 1
      }
      if (m == n) UTF8String.concatWs(Space, parts: _*)
      else UTF8String.concatWs(Space, java.util.Arrays.copyOf(parts, m): _*)
    }
    if (len < n) {
      if (!truncated) return new GenericArrayData(new Array[AnyRef](0))
      // one whole-array window (concat_ws over everything, "" when empty)
      return new GenericArrayData(Array[AnyRef](window(0, len)))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]
    var p = 0
    while (p + n <= len) {
      seen.add(window(p, p + n))
      p += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val SpaceByte = ' '.toByte

  /** See [[DedupExprs.CdcBoundaries]]. */
  def cdcBoundaries(tokens: ArrayData, window: Int,
      divisor: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < window) return new GenericArrayData(new Array[Int](0))
    // token bytes extracted once; each position digests its window span
    val bytes = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) {
      bytes(i) =
        if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val md = md5Local.get()
    val out = new java.util.ArrayList[Integer]
    var p = window // 1-based candidate position
    while (p <= len) {
      md.reset()
      var first = true
      var q = p - window
      while (q < p) {
        val b = bytes(q)
        if (b != null) { // concat_ws skips nulls without doubling the sep
          if (!first) md.update(SpaceByte)
          md.update(b)
          first = false
        }
        q += 1
      }
      val dg = md.digest()
      // first 8 hex chars of md5 = first 4 digest bytes, read unsigned
      val v = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      if (v % divisor == 0) out.add(p)
      p += 1
    }
    val arr = new Array[Int](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }

  /** See [[DedupExprs.MinHashSigs]]. */
  def minhashSigs(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val sigs = Array.fill(numHashes)(Int.MaxValue)
    var j = 0
    while (j < n) {
      val inner = Murmur3_x86_32.hashLong(hashes.getLong(j), 42)
      var s = 0
      while (s < numHashes) {
        val v = Murmur3_x86_32.hashInt(s, inner)
        if (v < sigs(s)) sigs(s) = v
        s += 1
      }
      j += 1
    }
    new GenericArrayData(sigs)
  }

  /** See [[DedupExprs.SimHash64]]. Returns null for an empty array. */
  def simhash64(tokens: ArrayData): java.lang.Long = {
    val len = tokens.numElements()
    if (len == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < len) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
