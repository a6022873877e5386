package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `n`-gram shingles of a tokenized document.
  *
  * Input: `array<string>` of words; output: `array<string>` of distinct
  * space-joined n-grams (window i = words[i, min(i+n, len)); a document
  * shorter than `n` words yields its single full join — identical to the
  * `array_distinct(transform(sequence(...), i -> array_join(slice(words,
  * i+1, n), ' ')))` composite it replaces). That composite runs through
  * higher-order functions, which are CodegenFallback: per-SHINGLE
  * interpreted lambda dispatch plus a fresh array allocation per slice.
  * This expression does one tight per-DOCUMENT loop over `ArrayData` and
  * stays inside whole-stage codegen via a static helper call.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val Space = UTF8String.fromString(" ")

  /** One pass: windows of `n` words joined by a single space, first
    * occurrence kept (array_distinct semantics).
    */
  def shingles(words: ArrayData, n: Int): ArrayData = {
    val m = words.numElements()
    val windows = math.max(m - n, 0) + 1
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    var i = 0
    while (i < windows) {
      val end = math.min(i + n, m)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = words.getUTF8String(j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def apply(words: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(words), n))
}
