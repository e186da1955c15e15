package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the native kernel expressions, so the semantic
  * SQL surface (SURVEY §2.12) reaches them as first-class functions:
  *
  *   - `graft_dot(a, b)`              — [[VectorExprs.DotProduct]]
  *   - `graft_l2norm(a)`              — [[VectorExprs.L2Norm]]
  *   - `graft_bit_agreement(a, b, k)` — [[VectorExprs.BitAgreement]]
  *   - `graft_simhash(tokens)`        — [[DedupExprs.SimHash64]]
  *   - `graft_shingle_hashes(t, n)`   — [[DedupExprs.ShingleHashes]]
  *   - `graft_minhash_sigs(h, n)`     — [[DedupExprs.MinHashSigs]]
  *   - `graft_sniff_media(bytes)`     — [[MediaExprs.SniffMedia]]
  *   - `graft_positional_shingle_hashes(t, n)`
  *                                    — [[DedupExprs.PositionalShingleHashes]]
  *   - `graft_warc_records(blob)`     — [[WarcExprs.WarcRecords]]
  *   - `graft_gunzip_text(bytes)`     — [[WarcExprs.GunzipText]]
  *   - `graft_gzip_bytes(text)`      — [[WarcExprs.GzipBytes]]
  *
  * Two installation routes, same builders:
  *   - `spark.sql.extensions=graft.sqlfront.GraftExtensions` injects
  *     them at session build ([[descriptions]] via `injectFunction`);
  *   - [[install]] registers them on an already-built session
  *     (idempotent — re-registration replaces the same builder).
  *
  * Structural parameters (shingle size, hash count, bits per element)
  * must be integer literals: they shape the generated code / the
  * expression tree, exactly like the Scala API's `Int` parameters.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n,
      s"$fn expects $n arguments, got ${args.length}")

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] =
    Seq(
      ("graft_dot", classOf[VectorExprs.DotProduct],
        (args: Seq[Expression]) => {
          arity("graft_dot", args, 2)
          VectorExprs.DotProduct(args(0), args(1))
        }),
      ("graft_l2norm", classOf[VectorExprs.L2Norm],
        (args: Seq[Expression]) => {
          arity("graft_l2norm", args, 1)
          VectorExprs.L2Norm(args(0))
        }),
      ("graft_bit_agreement", classOf[VectorExprs.BitAgreement],
        (args: Seq[Expression]) => {
          arity("graft_bit_agreement", args, 3)
          VectorExprs.BitAgreement(args(0), args(1),
            intLit(args(2), "graft_bit_agreement", "bitsPerElement"))
        }),
      ("graft_simhash", classOf[DedupExprs.SimHash64],
        (args: Seq[Expression]) => {
          arity("graft_simhash", args, 1)
          DedupExprs.SimHash64(args(0))
        }),
      ("graft_shingle_hashes", classOf[DedupExprs.ShingleHashes],
        (args: Seq[Expression]) => {
          arity("graft_shingle_hashes", args, 2)
          DedupExprs.ShingleHashes(args(0),
            intLit(args(1), "graft_shingle_hashes", "shingleSize"))
        }),
      ("graft_minhash_sigs", classOf[DedupExprs.MinHashSigs],
        (args: Seq[Expression]) => {
          arity("graft_minhash_sigs", args, 2)
          DedupExprs.MinHashSigs(args(0),
            intLit(args(1), "graft_minhash_sigs", "numHashes"))
        }),
      ("graft_sniff_media", classOf[MediaExprs.SniffMedia],
        (args: Seq[Expression]) => {
          arity("graft_sniff_media", args, 1)
          MediaExprs.SniffMedia(args(0))
        }),
      ("graft_positional_shingle_hashes",
        classOf[DedupExprs.PositionalShingleHashes],
        (args: Seq[Expression]) => {
          arity("graft_positional_shingle_hashes", args, 2)
          DedupExprs.PositionalShingleHashes(args(0),
            intLit(args(1), "graft_positional_shingle_hashes", "shingleSize"))
        }),
      ("graft_warc_records", classOf[WarcExprs.WarcRecords],
        (args: Seq[Expression]) => {
          arity("graft_warc_records", args, 1)
          WarcExprs.WarcRecords(args(0))
        }),
      ("graft_gunzip_text", classOf[WarcExprs.GunzipText],
        (args: Seq[Expression]) => {
          arity("graft_gunzip_text", args, 1)
          WarcExprs.GunzipText(args(0))
        }),
      ("graft_gzip_bytes", classOf[WarcExprs.GzipBytes],
        (args: Seq[Expression]) => {
          arity("graft_gzip_bytes", args, 1)
          WarcExprs.GzipBytes(args(0))
        })
    ).map { case (name, cls, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, null, name),
        builder)
    }

  /** Register every kernel function on an already-built session (the
    * programmatic twin of the extensions route). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
