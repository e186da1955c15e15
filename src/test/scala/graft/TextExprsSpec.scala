package graft

import graft.functions.TextExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TermTfs kernel: value-equality against the lambda-filter shapes it
  * replaced in the BM25 fronts, null/empty semantics, and the
  * no-fallback codegen claim. */
class TextExprsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet(s"${TestSpark.sfDir}/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("termTfs equals the size(filter(...)) lambda shape per term, " +
      "and element 0 the non-empty token count") {
    val terms = Seq("the", "spark", "customer", "zzz_absent")
    val corpus = docs.limit(0).unionByName(docs.filter(col("doc_id") < 150))
      .unionByName(Seq(
        (900001L, "  leading  and multi   spaces "),
        (900002L, "the the the"),
        (900003L, "")).toDF("doc_id", "text"))
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("__t"))
    val lambda = corpus.select(col("doc_id") +:
      size(filter(col("__t"), t => length(t) > 0)).as("len") +:
        terms.indices.map(i => size(filter(
          filter(col("__t"), t => length(t) > 0),
          t => t === lit(terms(i)))).as(s"tf$i")): _*)
    val kernel = corpus.select(col("doc_id"),
      TextExprs.termTfs(col("__t"), terms).as("__c"))
      .select(col("doc_id") +: col("__c").getItem(0).as("len") +:
        terms.indices.map(i => col("__c").getItem(i + 1).as(s"tf$i")): _*)
    assert(kernel.exceptAll(lambda).count() === 0)
    assert(lambda.exceptAll(kernel).count() === 0)
  }

  test("null token arrays stay null") {
    val df = Seq[(Long, Option[String])]((1L, Some("a b")), (2L, None))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextExprs.termTfs(split(lower(col("text")), "\\s+"), Seq("a"))
          .as("c"))
      .orderBy("doc_id").collect()
    assert(!df(0).isNullAt(1) && df(1).isNullAt(1))
  }

  test("no codegen fallback: generated code compiles and evaluates") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val toks = Literal.create(Seq("a", "", "b", "a"),
      ArrayType(StringType))
    val proj = org.apache.spark.sql.catalyst.expressions.codegen
      .GenerateUnsafeProjection.generate(Seq(
        TextExprs.TermTfs(toks, Seq("a", "b", "c"))))
    val row = proj.apply(org.apache.spark.sql.catalyst.InternalRow.empty)
    val arr = row.getArray(0)
    assert(arr.toIntArray().toSeq === Seq(3, 2, 1, 0)) // len, tf(a), tf(b), tf(c)
  }
}
