package graft.ops

import graft.functions.VectorExprs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Product quantization (PQ) for embedding search at corpus scale
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — the standard compression layer under
  * billion-vector ANN services).
  *
  * The vector is split into `m` contiguous subspaces; each subspace
  * gets its own k-means codebook of `kCodes` centroids; a vector is
  * stored as `m` small code integers instead of `dim` floats. At dim 64
  * / m 8 / kCodes 256 that is 8 bytes per vector instead of 256 — a
  * 32× reduction, which is the difference between "the candidate scan
  * streams 100 TB of floats" and "it streams 3 TB of codes".
  *
  * Query-time scoring is asymmetric distance computation (ADC): the
  * query is NOT quantized; per subspace a table of `kCodes` partial
  * squared distances from the query's sub-vector to every codeword is
  * built (m×kCodes doubles per query — tiny, broadcast with the query
  * row), and a stored vector's distance is `m` table lookups summed.
  * Per-pair cost drops from `dim` multiply-adds to `m` array reads, and
  * the scan side never touches the original floats. The ADC shortlist
  * is then re-ranked with exact cosine over the true vectors of just
  * the shortlisted ids — the standard shortlist+re-rank pipeline, so
  * the final ranking is exact over whatever the shortlist recalls.
  *
  * All driver-side state is the codebook matrix (m × kCodes × dim/m
  * doubles — kilobytes by design); training inherits
  * [[Similarity.trainCentroids]]'s determinism (hash-seeded, decimal
  * means), so codes, tables, shortlists, and the final ranking are
  * bit-reproducible across runs and partition layouts. */
object Pq {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Train the `m` per-subspace codebooks JOINTLY: one seed job plus one
    * job per Lloyd round covering all subspaces at once — `1 + iters`
    * driver-coordinated jobs total, against the `m×(1+iters)` a
    * per-subspace [[Similarity.trainCentroids]] loop costs (at m=8,
    * iters=2 that was 24 scheduling floors for 3 jobs' worth of work;
    * at 100 TB the floors are fixed but still ×8 wasted wall-clock).
    * Each round encodes the (hash-sampled) slice with the current books
    * ([[VectorExprs.PqEncode]], one projection), explodes to
    * (subspace, code, dim, x) and takes decimal means per cell.
    *
    * Bit-identical to the per-subspace loop it replaces: the seed order
    * (`xxhash64(id), id`) is id-only, so every subspace drew its seeds
    * from the SAME k rows (jointly sliced here); the per-round argmin is
    * [[VectorExprs.PqEncode]]'s |c|²−2·v·c with the identical fold
    * order; and decimal sums are association-free, so the means match
    * to the last bit and all pinned goldens hold. Empty cells keep the
    * previous codeword (same Lloyd fix as the IVF trainer).
    *
    * Returns codebooks(s)(j) = centroid j of subspace s. `dim` must be
    * divisible by `m` (contiguous equal-width slices — the classic
    * layout; for correlated coordinates compose with
    * [[trainPermutation]]/[[permute]], the OPQ-lite rebalancing pass). */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int = 8, kCodes: Int = 16, iters: Int = 3,
      trainSampleMod: Int = 1): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m $m subspaces")
    val dsub = dim / m
    val base = corpus.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    val v = if (trainSampleMod <= 1) base
      else base.filter(pmod(xxhash64(col("__id")), lit(trainSampleMod)) === 0)
    val seeds = v.orderBy(xxhash64(col("__id")), col("__id")).limit(kCodes)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map(s =>
      seeds.map(row => row.slice(s * dsub, (s + 1) * dsub)))
    for (_ <- 0 until iters) {
      val sCol = (col("__pos") / dsub).cast("int")
      // The encode kernel is referenced exactly ONCE, inside the
      // generator input: codes expanded to one per position and zipped
      // with the vector. The previous shape — `select(pqEncode.as,
      // posexplode(v))` then `filter(codes.isNotNull)` then
      // `element_at(codes, s+1)` — left the optimizer two extra sites to
      // clone the kernel into (guide §4.4): the pushed-down null filter
      // re-ran the encode per INPUT row at the scan, and projection
      // collapse moved the element_at's encode ABOVE the explode — once
      // per EXPLODED row, dim+1 evaluations per vector (profiled: the PQ
      // Lloyd stage cost ~5x the IVF stage on identical rows). A null
      // codes array nulls the zip and the explode emits nothing, which
      // is exactly the row set the old filter kept. Values and row
      // multiset are bit-identical, so the decimal means (and every
      // golden downstream) are unchanged.
      val means = v
        .select(posexplode(arrays_zip(
            col("__v").as("x"),
            flatten(transform(
              VectorExprs.pqEncode(col("__v"), books),
              c => array_repeat(c, dsub))).as("c")))
          .as(Seq("__pos", "__zx")))
        .select(sCol.as("__s"), col("__zx.c").as("__c"),
          pmod(col("__pos"), lit(dsub)).cast("int").as("__p"),
          col("__zx.x").as("__x"))
        .groupBy(col("__s"), col("__c"), col("__p"))
        .agg((sum(col("__x").cast("decimal(30,12)")) / count(lit(1)))
          .cast("double").as("__m"))
        .groupBy(col("__s"), col("__c"))
        .agg(sort_array(collect_list(struct(col("__p"), col("__m"))))
          .as("__pm"))
        .select(col("__s"), col("__c"), col("__pm.__m").as("__mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toSeq)
        .toMap
      books = books.indices.map(s => books(s).indices.map(j =>
        means.getOrElse((s, j), books(s)(j))))
    }
    books
  }

  /** Variance-balancing coordinate permutation — the OPQ idea (Ge et
    * al., "Optimized Product Quantization", CVPR 2013) restricted to
    * permutation matrices: OPQ learns a rotation R so the m subspaces
    * carry balanced energy; a permutation is the rotation's cheapest
    * useful special case (free to apply — element shuffles, no
    * matrix multiply per row — and exactly inverts). Real embedding
    * blocks are correlated (adjacent coordinates co-vary, energy
    * concentrates in coordinate bands), so the contiguous split hands
    * some subspaces most of the variance and their kCodes codewords
    * saturate while low-energy subspaces waste theirs.
    *
    * Policy: per-dimension variance in one aggregate job (decimal sums
    * — deterministic), dims sorted by descending variance (index
    * tie-break), then snake-dealt across the m subspaces so each gets
    * an even mix of hot and cold dims. Only `dim` (mean, mean-square)
    * pairs ever reach the driver.
    *
    * Returns `perm` with `perm(outPos) = inPos`; feed [[permute]]d
    * vectors (corpus AND queries — a shared permutation preserves
    * dot products and norms, so cosine and every ranking are
    * unchanged in exact space) into the rest of the PQ family. */
  def trainPermutation(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, trainSampleMod: Int = 1): Seq[Int] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m $m subspaces")
    val base = corpus.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    // Same row-population discipline as trainRotation: drop vectors with
    // null elements up front so sum (null-skipping) and count (null-
    // counting) agree on the denominator of every per-dim moment.
    val v = (if (trainSampleMod <= 1) base
      else base.filter(pmod(xxhash64(col("__id")), lit(trainSampleMod)) === 0))
      .filter(col("__v").isNotNull && forall(col("__v"), x => x.isNotNull))
    val variances = v
      .select(posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__p"))
      .agg(
        (sum(col("__x").cast("decimal(30,12)")) / count(lit(1)))
          .cast("double").as("__mu"),
        (sum((col("__x") * col("__x")).cast("decimal(30,12)"))
          / count(lit(1))).cast("double").as("__m2"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(2) - r.getDouble(1) * r.getDouble(1)))
      .toMap
    require(variances.size == dim,
      s"expected $dim per-dim stats, got ${variances.size} — vector " +
        s"lengths inconsistent with dim $dim")
    val order = (0 until dim).sortBy(p => (-variances(p), p))
    val groups = Array.fill(m)(List.newBuilder[Int])
    order.zipWithIndex.foreach { case (p, i) =>
      val s = if ((i / m) % 2 == 0) i % m else m - 1 - (i % m) // snake deal
      groups(s) += p
    }
    groups.flatMap(_.result()).toSeq
  }

  /** Parametric OPQ rotation (Ge et al., "Optimized Product
    * Quantization", CVPR 2013 — the OPQ-P solution): under a Gaussian
    * assumption the distortion-minimizing rotation is the PCA basis
    * with eigenvectors ALLOCATED to the m subspaces so each subspace's
    * eigenvalue PRODUCT is balanced ("eigenvalue allocation"). Strictly
    * more powerful than [[trainPermutation]]: a permutation can only
    * re-deal existing coordinates, a rotation also DECORRELATES them —
    * correlated coordinate pairs (the norm in learned embeddings) carry
    * redundant energy into every subspace that a permutation cannot
    * remove.
    *
    * Distributed work is ONE moment pass: per-row upper-triangular
    * outer products through the [[VectorExprs.OuterUpper]] loop kernel,
    * posexplode'd and summed per pair as decimals (exact, so the sums —
    * and therefore the learned rotation and every golden downstream —
    * are invariant to partitioning/layout; the [[trainPermutation]]
    * discipline at d(d+1)/2 groups). Only d(d+1)/2 + d + 1 numbers
    * reach the driver; the d×d eigendecomposition (cyclic Jacobi,
    * fixed sweep order — deterministic) is driver-side math on that
    * one small matrix.
    *
    * Returns the rotation as d rows; `rotated = R·v` via [[rotate]].
    * Rows are orthonormal, so L2 and dot products are preserved and
    * ADC distances in rotated space are true distances. */
  def trainRotation(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, trainSampleMod: Int = 1): Seq[Seq[Double]] = {
    require(m >= 1 && dim % m == 0, s"dim $dim must divide into m $m subspaces")
    val base = corpus.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    // One shared filter for BOTH passes below: a vector carrying a null
    // element would vanish from the moment pass (OuterUpper nulls the
    // whole row, posexplode emits nothing) while still feeding the means
    // pass — biasing mu and s(p)/n - mu_i*mu_j against each other. Both
    // passes must see the identical row set.
    val v = (if (trainSampleMod <= 1) base
      else base.filter(pmod(xxhash64(col("__id")), lit(trainSampleMod)) === 0))
      .filter(col("__v").isNotNull && size(col("__v")) === dim &&
        forall(col("__v"), x => x.isNotNull))
    val nPairs = dim * (dim + 1) / 2
    val moments = v
      .select(posexplode(VectorExprs.outerUpper(col("__v"), dim))
        .as(Seq("__p", "__x")))
      .groupBy(col("__p"))
      .agg((sum(col("__x").cast("decimal(30,12)")))
        .cast("double").as("__s"),
        count(lit(1)).as("__n"))
      .collect()
    require(moments.length == nPairs,
      s"expected $nPairs pair sums, got ${moments.length}")
    val n = moments.head.getLong(2).toDouble
    val s = new Array[Double](nPairs)
    moments.foreach(r => s(r.getInt(0)) = r.getDouble(1))
    val means = v
      .select(posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__p"))
      .agg((sum(col("__x").cast("decimal(30,12)")) / count(lit(1)))
        .cast("double").as("__mu"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val cov = Array.ofDim[Double](dim, dim)
    var p = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = s(p) / n - means(i) * means(j)
      cov(i)(j) = c; cov(j)(i) = c
      p += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    // eigenvalue allocation: eigenpairs by descending variance, each
    // assigned to the non-full subspace with the smallest log-product
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i))
    val logs = Array.fill(m)(0.0)
    val used = Array.fill(m)(0)
    val dsub = dim / m
    val buckets = Array.fill(m)(List.newBuilder[Int])
    order.foreach { e =>
      val sIdx = (0 until m).filter(used(_) < dsub)
        .minBy(b => (logs(b), b))
      buckets(sIdx) += e
      used(sIdx) += 1
      logs(sIdx) += math.log(math.max(eigVals(e), 1e-12))
    }
    buckets.flatMap(_.result()).toSeq.map(e => eigVecs(e).toSeq)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
    * deterministic (fixed (i,j) sweep order, fixed convergence
    * threshold). Returns (eigenvalues, eigenvectors as ROWS aligned
    * with the eigenvalues). Driver-side only, on the d×d covariance. */
  private[ops] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val vT = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-22) {
      off = 0.0
      for (i <- 0 until d; j <- (i + 1) until d) {
        off += a(i)(j) * a(i)(j)
        if (math.abs(a(i)(j)) > 1e-14) {
          val theta = (a(j)(j) - a(i)(i)) / (2.0 * a(i)(j))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * c
          for (k <- 0 until d) {
            val aik = a(i)(k); val ajk = a(j)(k)
            a(i)(k) = c * aik - sn * ajk
            a(j)(k) = sn * aik + c * ajk
          }
          for (k <- 0 until d) {
            val aki = a(k)(i); val akj = a(k)(j)
            a(k)(i) = c * aki - sn * akj
            a(k)(j) = sn * aki + c * akj
          }
          for (k <- 0 until d) {
            val vik = vT(i)(k); val vjk = vT(j)(k)
            vT(i)(k) = c * vik - sn * vjk
            vT(j)(k) = sn * vik + c * vjk
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), vT)
  }

  /** Apply the OPQ rotation as a pure projection: `out = R·v` through
    * ONE [[VectorExprs.MatVecDots]] kernel call (d dot products,
    * constant-size generated code — born codegen-safe, unlike the
    * permutation's first cut). */
  def rotate(vec: Column, r: Seq[Seq[Double]]): Column =
    VectorExprs.matVecDots(asDouble(vec), r)

  /** Apply a coordinate permutation as a pure projection:
    * out(i) = in(perm(i)) through ONE [[VectorExprs.Permute]] loop
    * kernel, so `vec` — often the full VecSubRow residual subtree on
    * the IVFADC path — is evaluated once. The first cut chained `dim`
    * `element_at(vec, p+1)` slots, cloning that subtree dim times and
    * blowing janino's 64 KB whole-stage limit at dim 64 (interpreted
    * fallback — the exact failure class [[encode]]'s kernel fixed). */
  def permute(vec: Column, perm: Seq[Int]): Column =
    VectorExprs.permute(asDouble(vec), perm)

  /** Encode every row to its `m` nearest-codeword indices — a pure
    * projection through ONE [[VectorExprs.PqEncode]] kernel call, so
    * encoding 100 TB is one map-side pass that writes m small ints per
    * row. Output: (idCol, __codes array<int> of length m).
    *
    * The first cut chained `m` `least(struct(...))` argmin expansions
    * (one select per subspace, kCodes struct nodes each); at 8×16 the
    * whole-stage method crossed janino's 64 KB limit (the stage fell
    * back to interpreted eval) AND constraint inference cloned the
    * chain into a scan-side Filter that re-ran the encode per row. The
    * opaque loop kernel generates constant-size code and gives the
    * optimizer nothing to clone; codes are bit-identical (same
    * |c|²−2·v·c discriminant, same lower-code tie-break). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        VectorExprs.pqEncode(asDouble(col(vecCol)), codebooks).as("__codes"))

  /** Per-query ADC tables as one projection over the query frame.
    * `__tables(s)(j)` is the FULL per-subspace squared distance
    * |v_s|² − 2·v_s·c_sj + |c_sj|²: the |v_s|² term is constant within
    * one ranking group when the frame is keyed by query alone, but when
    * the key is (query, cell) — residual IVFADC, where v is the
    * per-cell query residual — the term differs across a query's probed
    * cells, and dropping it would skew the cross-cell shortlist.
    * Keeping it makes the table the true quantized distance in both
    * uses. m × kCodes doubles per key row — rides the broadcast. */
  private[ops] def adcTablesKeyed(frame: DataFrame, keyCols: Seq[String],
      vecCol: String, codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    // one [[VectorExprs.AdcTables]] kernel call: the earlier
    // slice/matVecDots foldLeft + m×kCodes CreateArray slots blew
    // janino's 64 KB limit at 16×32 (interpreted fallback); the kernel
    // is bit-identical (same fold orders, same (qn2 − 2·dot) + |c|²
    // combine) and evaluates the — possibly deep residual — vec
    // subtree exactly once
    frame.filter(col(vecCol).isNotNull)
      .select(keyCols.map(col) :+
        VectorExprs.adcTables(asDouble(col(vecCol)), codebooks)
          .as("__tables"): _*)

  private[ops] def adcTables(queries: DataFrame, queryIdCol: String,
      vecCol: String, codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    adcTablesKeyed(
      queries.select(col(queryIdCol).as("query_id"), col(vecCol)),
      Seq("query_id"), vecCol, codebooks)

  /** End-to-end PQ search: train codebooks, encode the corpus, scan the
    * codes with ADC against the broadcast query tables, take the
    * per-query `shortlist` best by approximate distance, then re-rank
    * the shortlist with exact cosine over the true vectors. Output
    * (query_id, neighbor_id, cosine, rank) — same contract as
    * [[Similarity.bruteForceTopK]] / [[Similarity.ivfTopK]].
    *
    * Scale shape: the only corpus-wide work after encoding is the ADC
    * scan — a broadcast nested-loop over m-byte codes with m lookups
    * per pair (no shuffle; the corpus floats are untouched). The exact
    * re-rank joins vectors for queries × shortlist rows only. Complement
    * to IVF rather than a replacement: IVF prunes WHICH rows are scanned,
    * PQ shrinks WHAT a scanned row costs; production systems compose
    * them (IVFADC) — here [[IvfIndex]] partitions I/O and this operator
    * is the in-cell scan economics, kept separate so each is testable. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, queryIdCol: String, k: Int, dim: Int, m: Int = 8,
      kCodes: Int = 16, shortlist: Int = 50, iters: Int = 3,
      trainSampleMod: Int = 1): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val books = trainCodebooks(corpus, idCol, vecCol, dim, m, kCodes,
      iters, trainSampleMod)
    val codes = encode(corpus, idCol, vecCol, books)
    val qt = broadcast(adcTables(queries, queryIdCol, vecCol, books))
    val adc = codes.crossJoin(qt)
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("__adc", aggregate(
        zip_with(col("__codes"), col("__tables"),
          (c, t) => element_at(t, c + 1)),
        lit(0.0), (acc, x) => acc + x))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col(idCol).asc)
    val short = adc.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= shortlist)
      .select(col("query_id"), col(idCol).as("neighbor_id"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", VectorExprs.l2norm(col("__cv")))
    val q = broadcast(queries
      .select(col(queryIdCol).as("query_id"),
        asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", VectorExprs.l2norm(col("__qv"))))
    Similarity.exactRerank(short, c, q, k)
  }

  /** Reconstruction error report of a codebook over a corpus — the
    * "is m/kCodes enough for this data" dial: per-row squared
    * reconstruction error summed across subspaces, aggregated to
    * (rows, mean_sq_err, max_sq_err, mean_norm_sq). Rows whose
    * quantization error rivals their norm are poorly served by the
    * codebook (raise kCodes, or train on a larger sample). */
  def reconstructionError(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame =
    // one projection, no self-join: the [[VectorExprs.PqReconSq]] kernel
    // re-derives each row's codes (same argmin as encode) and folds the
    // true Σ(v−c)² inline — the earlier literal-embedded-codebook
    // zip_with shape is what PqEncode's scaladoc documents against
    df.filter(col(vecCol).isNotNull)
      .select(
        VectorExprs.pqReconSq(asDouble(col(vecCol)), codebooks).as("__err"),
        VectorExprs.dot(asDouble(col(vecCol)), asDouble(col(vecCol)))
          .as("__n2"))
      .agg(count(lit(1)).as("rows"),
        avg(col("__err")).as("mean_sq_err"),
        max(col("__err")).as("max_sq_err"),
        avg(col("__n2")).as("mean_norm_sq"))
}
