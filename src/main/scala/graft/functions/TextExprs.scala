package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row kernels for the text-retrieval family (see
  * [[DedupExprs]] for the dedup kernels and the rationale: Spark's
  * array lambdas are CodegenFallback, so a `filter`/`size(filter(...))`
  * chain interprets an expression tree per element — a BM25 front with
  * q query terms walked every token q+1 times through interpreted
  * lambdas, twice per query (stats pass + score pass). */
object TextExprs {

  /** One compiled pass over a token array: element 0 is the non-empty
    * token count (the BM25 doc length), element i+1 the exact-match
    * term frequency of `terms(i)` — value-identical to
    * `size(filter(tokens, t -> length(t) > 0))` and
    * `size(filter(tokens, t -> t = terms(i)))` (an empty token can
    * never equal a query term, so filtering empties first changes no
    * tf). Null token arrays stay null (same aggregate semantics as the
    * lambda shapes: count counts the row, avg/sum skip the nulls). */
  case class TermTfs(child: Expression, terms: Seq[String])
      extends UnaryExpression {
    require(terms.nonEmpty, "TermTfs needs at least one term")

    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_term_tfs"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${t.sql}")
    }

    @transient private lazy val termBytes: Array[UTF8String] =
      terms.map(UTF8String.fromString).toArray

    override def nullSafeEval(v: Any): Any =
      TextKernels.termTfs(v.asInstanceOf[ArrayData], termBytes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val ref = ctx.addReferenceObj("terms", termBytes,
          "org.apache.spark.unsafe.types.UTF8String[]")
        s"${ev.value} = graft.functions.TextKernels.termTfs($a, $ref);"
      })

    override protected def withNewChildInternal(newChild: Expression): TermTfs =
      copy(child = newChild)
  }

  def termTfs(tokens: Column, terms: Seq[String]): Column =
    GraftSqlBridge.column(TermTfs(GraftSqlBridge.expression(tokens), terms))
}

/** Static per-row workers — compiled loops called from both `eval` and
  * generated code (the [[DedupKernels]] pattern). */
object TextKernels {

  /** See [[TextExprs.TermTfs]]. */
  def termTfs(tokens: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val len = tokens.numElements()
    val out = new Array[Int](terms.length + 1)
    var i = 0
    while (i < len) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t.numBytes() > 0) {
          out(0) += 1
          var j = 0
          while (j < terms.length) {
            if (t.equals(terms(j))) out(j + 1) += 1
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
