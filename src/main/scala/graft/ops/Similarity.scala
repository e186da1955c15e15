package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k for a bounded query set (queries are
  * broadcast, corpus stays partitioned — linear scan, no corpus shuffle).
  * Scale path: sign-LSH (random hyperplanes) bucketing so candidate
  * generation is an equi-join on bucket keys instead of a full cross
  * product.
  */
object Similarity {

  /** Cosine similarity between two double-array columns (computed in
    * double; cast float embeddings first). */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)

  def norm(x: Column): Column =
    sqrt(aggregate(x, lit(0.0d), (acc, v) => acc + v * v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force cosine top-k: for each row of `queries` (small — it gets
    * broadcast), the `k` nearest corpus rows. One pass over the corpus,
    * TopK per query via window (Catalyst prunes with rank pushdown). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String, k: Int): DataFrame = {
    // norms precomputed once per vector — not once per (query, corpus) pair
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv")).withColumn("__qn", norm(col("__qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val scored = c.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane matrix (numPlanes × dim),
    * components in [-1, 1), derived from a hash — no RNG state to ship. */
  private def planes(numPlanes: Int, dim: Int, seed: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map { p =>
      (0 until dim).map { d =>
        val h = scala.util.hashing.MurmurHash3.productHash((seed, p, d))
        (h.toDouble / Int.MaxValue)
      }
    }

  /** Sign-LSH bucket key: one bit per hyperplane (sign of the dot
    * product). Near vectors land in the same bucket with high
    * probability. Column-expression form — fine for small inputs; the
    * batch operators below use the codegen explode/agg path instead
    * (higher-order lambdas are interpreted). */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Int = 42): Column =
    planes(numPlanes, dim, seed).zipWithIndex.map { case (plane, p) =>
      // bit p of the bucket = sign of plane_p · v
      when(aggregate(zip_with(typedlit(plane), vec, (a, b) => a * b),
        lit(0.0d), (acc, v) => acc + v) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Attach `__bucket` via the codegen path: posexplode the vector, dot
    * against literal hyperplane rows inside plain aggregates (one shuffle
    * keyed by id), assemble the sign bits with scalar column math. */
  private def withBucket(df: DataFrame, idName: String, vecName: String,
      numPlanes: Int, dim: Int, seed: Int = 42): DataFrame = {
    val m = planes(numPlanes, dim, seed)
    val pos = df.select(col(idName),
      posexplode(col(vecName)).as(Seq("__p", "__x")))
    val dots = (0 until numPlanes).map(p =>
      sum(col("__x") * element_at(typedlit(m(p)), col("__p") + 1)).as(s"__d$p"))
    val sig = (0 until numPlanes).map(p =>
      when(col(s"__d$p") > 0, lit(1L << p)).otherwise(lit(0L))).reduce(_ + _)
    val buckets = pos.groupBy(idName).agg(dots.head, dots.tail: _*)
      .select(col(idName), sig.as("__bucket"))
    df.join(buckets, Seq(idName))
  }

  /** LSH-bucketed approximate top-k: corpus and queries are bucketed by
    * sign-LSH; candidates come from bucket equality (shuffle join on the
    * bucket key), then exact cosine re-ranks within candidates. Recall is
    * tunable via `numPlanes` (fewer planes → bigger buckets → higher
    * recall, more work). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, queryIdCol: String, k: Int,
      numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val c = withBucket(corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv")), "neighbor_id", "__cv", numPlanes, dim)
      .withColumn("__cn", norm(col("__cv")))
    val q = withBucket(queries.select(col(queryIdCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv")), "query_id", "__qv", numPlanes, dim)
      .withColumn("__qn", norm(col("__qv")))
    val scored = c.join(q, Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, candidates
    * from LSH buckets (the embedding analog of Dedup.minHashLSH). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val v = withBucket(df.select(col(idCol).as("id"),
      asDouble(col(vecCol)).as("__v")), "id", "__v", numPlanes, dim)
      .withColumn("__n", norm(col("__v")))
    val l = v.select(col("__bucket"), col("id").as("id_a"),
      col("__v").as("__va"), col("__n").as("__na"))
    val r = v.select(col("__bucket"), col("id").as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    l.join(r, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
