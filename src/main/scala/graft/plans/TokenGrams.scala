package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native STRING k-gram emitter: text → array<string> of full
  * k-token windows joined by single spaces, in document order — the
  * string twin of [[ShingleHash]] over the SAME shared tokenizer
  * ([[ShingleHash.tokens]]: lower → collapse whitespace → trim →
  * split), so the gram an operator counts and the gram an operator
  * hashes can never drift apart (the r14 verdict's residual
  * two-tokenizations finding: LangModel carried its own bigram UDF
  * next to the codegen k-gram path).
  *
  * k=2 is the CCNet-style bigram front of ta11_perplexity
  * (LangModel.bigrams): only full windows — a doc with fewer than k
  * tokens emits NOTHING, mirroring the oracle's
  * list_transform(range(1, len), i -> concat(tks[i],' ',tks[i+1])).
  *
  * Like ShingleHash this is a Catalyst expression, not a ScalaUDF:
  * no CatalystTypeConverters boundary, no codegen fence — the
  * generated code calls one static helper, keeping the tokenize
  * stage inside the WholeStageCodegen span.
  */
case class TokenGrams(child: Expression, k: Int) extends UnaryExpression
    with NullBothWays {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenGrams.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenGrams.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): TokenGrams =
    copy(child = newChild)
}

object TokenGrams {

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val tks = ShingleHash.tokens(s)
    val n = tks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(tks(i))
      var j = 1
      while (j < k) {
        sb.append(' ').append(tks(i + j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Document-order full-window string k-grams. */
  def tokenGrams(text: Column, k: Int): Column =
    GraftShims.column(TokenGrams(GraftShims.expression(text), k))
}
