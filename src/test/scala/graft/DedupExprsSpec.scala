package graft

import graft.functions.DedupExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native MinHash/SimHash kernels: value-equality against the exact
  * aggregate shapes they replaced (reconstructed here as oracles), edge
  * docs, and the no-fallback codegen claim. */
class DedupExprsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The retired explode + window-lead + distinct shingle front. */
  private def legacyShingleHashes(df: DataFrame, idCol: String,
      textCol: String, shingleSize: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("__p", "__t")))
    val w = Window.partitionBy("id").orderBy("__p")
    val parts = col("__t") +: (1 until shingleSize).map(i =>
      lead(col("__t"), i).over(w))
    toks
      .withColumn("__s", concat_ws(" ", parts: _*))
      .withColumn("__last", parts.last)
      .filter(col("__last").isNotNull || col("__p") === 0)
      .select(col("id"), xxhash64(col("__s")).as("__h"))
      .distinct()
  }

  /** The retired groupBy signature aggregation. */
  private def legacySigs(exploded: DataFrame, numHashes: Int): DataFrame = {
    val minCols = (0 until numHashes).map(i =>
      min(hash(col("__h"), lit(i))).as(s"__m$i"))
    exploded.groupBy("id")
      .agg(minCols.head, (minCols.tail :+ count(lit(1)).as("__n")): _*)
  }

  /** The retired explode + 64-bit-sum SimHash aggregate. */
  private def legacySimHash(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("__t"))
      .select(col("id"), xxhash64(col("__t")).as("__h"))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b"))
    val sigExpr = (0 until 64).map(b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    exploded.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"), sigExpr.as("sig"))
  }

  private def docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    .select(col("doc_id"), col("text"))

  // ids far above the real corpus range — and a deterministic subset
  // below (limit() without order re-picks rows per evaluation)
  private val edgeDocs = Seq(
    (1000001L, "one"),                       // shorter than a shingle
    (1000002L, "one two"),                   // exactly shingleSize - 1
    (1000003L, "one two three"),             // exactly one full shingle
    (1000004L, "  leading and   multi  spaces "), // split() empties preserved
    (1000005L, "repeat repeat repeat repeat"),    // duplicate shingles collapse
    (1000006L, "Case FOLDS lower case folds"))

  test("minhash front: sigs, n, and hash set equal the aggregate shape") {
    val corpus = docs.filter(col("doc_id") < 150)
      .unionByName(edgeDocs.toDF("doc_id", "text"))
    val front = graft.ops.Dedup.minhashFront(corpus, "doc_id", "text", 3, 16)
      .withColumnRenamed("__n", "__nNative")
    val legacy = legacySigs(
      legacyShingleHashes(corpus, "doc_id", "text", 3), 16)
    val joined = front.join(legacy, "id")
    assert(joined.count() === front.count() && front.count() === legacy.count())
    val bad = joined.filter(
      (0 until 16).map(i =>
        element_at(col("__sigs"), i + 1) =!= col(s"__m$i")).reduce(_ || _)
        || col("__nNative") =!= col("__n"))
    assert(bad.count() === 0)
    // distinct-hash SETS agree both ways (order differs: first-occurrence
    // vs shuffle order, so compare as sets of (id, hash) rows)
    val nativeRows = front.select(col("id"), explode(col("__hashes")).as("__h"))
    val legacyRows = legacyShingleHashes(corpus, "doc_id", "text", 3)
    assert(nativeRows.exceptAll(legacyRows).count() === 0)
    assert(legacyRows.exceptAll(nativeRows).count() === 0)
  }

  test("minhash n equals the distinct hash count") {
    val front = graft.ops.Dedup.minhashFront(
      edgeDocs.toDF("doc_id", "text"), "doc_id", "text", 3, 8)
    assert(front.filter(size(col("__hashes")).cast("long") =!= col("__n"))
      .count() === 0)
    // "repeat ×4": both 3-token windows are identical → 1 distinct shingle
    val n5 = front.filter(col("id") === 1000005L).select("__n").head.getLong(0)
    assert(n5 === 1L)
  }

  test("simhash equals the bit-sum aggregate shape") {
    val corpus = docs.filter(col("doc_id") < 150)
      .unionByName(edgeDocs.toDF("doc_id", "text"))
    val native = corpus.select(col("doc_id").as("id"),
      DedupExprs.simHash64(split(lower(col("text")), "\\s+")).as("nsig"))
    val joined = native.join(legacySimHash(corpus, "doc_id", "text"), "id")
    assert(joined.count() === native.count())
    assert(joined.filter(col("nsig") =!= col("sig")).count() === 0)
  }

  test("null and empty token arrays return null (docs are dropped)") {
    val df = Seq[(Long, Option[String])]((1L, Some("a b c")), (2L, None))
      .toDF("doc_id", "text")
    val front = graft.ops.Dedup.minhashFront(df, "doc_id", "text", 3, 4)
    assert(front.select("id").as[Long].collect().toSeq === Seq(1L))
    val sh = df.select(
      DedupExprs.simHash64(split(lower(col("text")), "\\s+")).as("s"))
      .collect()
    assert(!sh(0).isNullAt(0) && sh(1).isNullAt(0))
  }

  test("token-window kernel equals the array_distinct(transform(slice)) " +
      "lambda shape, both truncation modes") {
    val corpus = docs.filter(col("doc_id") < 150)
      .unionByName(edgeDocs.toDF("doc_id", "text"))
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("__t"))
    // full-window mode (the duplicateWindows front): size >= n only
    val n = 5
    val lambda = corpus.filter(size(col("__t")) >= n)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n)))))).as("w"))
    val kernel = corpus.filter(size(col("__t")) >= n)
      .select(col("doc_id"), explode(
        DedupExprs.distinctTokenWindows(col("__t"), n)).as("w"))
    assert(kernel.exceptAll(lambda).count() === 0)
    assert(lambda.exceptAll(kernel).count() === 0)
    // truncated mode (the Bloom-gate keying contract): short docs emit
    // ONE whole-array window
    val lambdaT = corpus.select(col("doc_id"), explode(array_distinct(
      when(size(col("__t")) >= n,
        transform(sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ", slice(col("__t"), i + 1, lit(n)))))
        .otherwise(array(concat_ws(" ", col("__t")))))).as("w"))
    val kernelT = corpus.select(col("doc_id"), explode(
      DedupExprs.distinctTokenWindows(col("__t"), n, truncated = true))
      .as("w"))
    assert(kernelT.exceptAll(lambdaT).count() === 0)
    assert(lambdaT.exceptAll(kernelT).count() === 0)
  }

  test("cdc-boundary kernel equals the md5/conv/pmod SQL form") {
    val corpus = docs.filter(col("doc_id") < 150)
      .unionByName(edgeDocs.toDF("doc_id", "text"))
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("__t"))
      .withColumn("__n", size(col("__t")))
    val (window, divisor) = (8, 16)
    val sqlForm = corpus.withColumn("cand", expr(
      s"""CASE WHEN __n >= $window THEN
         |  filter(transform(sequence($window, __n), p ->
         |    IF(pmod(cast(conv(substring(md5(concat_ws(' ',
         |         slice(__t, p - ${window - 1}, $window))), 1, 8),
         |       16, 10) as bigint), $divisor) = 0, p, -1)),
         |    x -> x >= 0)
         |ELSE array() END""".stripMargin))
      .select(col("doc_id"), col("cand"))
    val kernel = corpus.select(col("doc_id"),
      DedupExprs.cdcBoundaries(col("__t"), window, divisor).as("cand"))
    val joined = kernel.withColumnRenamed("cand", "k").join(sqlForm, "doc_id")
    assert(joined.count() === kernel.count())
    assert(joined.filter(col("k") =!= col("cand")).count() === 0)
    // and at a divisor where boundaries are dense, too
    val dense = corpus.select(col("doc_id"),
      DedupExprs.cdcBoundaries(col("__t"), 3, 2).as("k"))
      .join(corpus.withColumn("cand", expr(
        """CASE WHEN __n >= 3 THEN
          |  filter(transform(sequence(3, __n), p ->
          |    IF(pmod(cast(conv(substring(md5(concat_ws(' ',
          |         slice(__t, p - 2, 3))), 1, 8), 16, 10) as bigint),
          |       2) = 0, p, -1)), x -> x >= 0)
          |ELSE array() END""".stripMargin))
        .select(col("doc_id"), col("cand")), "doc_id")
    assert(dense.filter(col("k") =!= col("cand")).count() === 0)
  }

  test("positional shingle hashes: position-indexed, undeduped, " +
      "value-identical to the dedup'd kernel") {
    val df = (docs.limit(0).unionByName(edgeDocs.toDF("doc_id", "text"))
      .unionByName(docs.filter(col("doc_id") < 50)))
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\s+"),
          t => length(t) > 0).as("__t"))
      .filter(size(col("__t")) > 0)
    val both = df.select(col("doc_id"),
      DedupExprs.positionalShingleHashes(col("__t"), 3).as("pos"),
      DedupExprs.shingleHashes(col("__t"), 3).as("dedup"),
      size(col("__t")).as("n"))
    both.collect().foreach { r =>
      val pos = r.getSeq[Long](1)
      val dedup = r.getSeq[Long](2)
      val n = r.getInt(3)
      // one hash per start position (single truncated window when short)
      assert(pos.length === math.max(1, n - 3 + 1), s"doc ${r.getLong(0)}")
      // the dedup'd kernel is exactly the first-occurrence distinct view
      assert(pos.distinct === dedup, s"doc ${r.getLong(0)}")
    }
  }

  test("no codegen fallback: generated code compiles and evaluates") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val toks = Literal.create(Seq("a", "b", "c", "a", "b", "c"),
      ArrayType(StringType))
    val exprs = Seq(
      DedupExprs.ShingleHashes(toks, 3),
      DedupExprs.MinHashSigs(DedupExprs.ShingleHashes(toks, 3), 4),
      DedupExprs.SimHash64(toks),
      DedupExprs.PositionalShingleHashes(toks, 3),
      DedupExprs.DistinctTokenWindows(toks, 3, truncated = false),
      DedupExprs.DistinctTokenWindows(toks, 8, truncated = true),
      DedupExprs.CdcBoundaries(toks, 3, 2))
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(exprs) // throws on janino error
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    // "a b c" appears twice, plus "b c a", "c a b" → 3 distinct shingles
    // (starts: [a b c] [b c a] [c a b] [a b c])
    assert(row.getArray(0).numElements() === 3)
    assert(row.getArray(1).numElements() === 4)
    assert(row.getLong(2) !== 0L)
    assert(row.getArray(3).numElements() === 4) // one hash per start
    assert(row.getArray(4).numElements() === 3) // same 3 distinct windows
    assert(row.getArray(5).numElements() === 1) // truncated whole-array
    assert(row.getArray(5).getUTF8String(0).toString === "a b c a b c")
  }

  test("the minhash front plan has zero exchanges") {
    import org.apache.spark.sql.classic
    val front = graft.ops.Dedup.minhashFront(docs, "doc_id", "text", 3, 16)
    front.collect()
    val plan = front.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange (hash|range)partitioning".r.findAllIn(plan).isEmpty, plan)
  }
}
