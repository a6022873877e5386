package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size token windows with stride over a tokenized document — the
  * pretraining-chunking kernel behind `TextStats.chunkByTokens`.
  *
  * Input: `array<string>` of tokens; output: `array<string>` of
  * space-joined chunks at starts 0, stride, ..., ceil((len − window) /
  * stride)·stride (clamped at 0), each covering up to `window` tokens —
  * the trailing remnant chunk is kept, an empty token array yields one
  * empty chunk (callers filter token-less docs upstream). Replaces the
  * `transform(sequence(...), st -> array_join(slice(...)))` composite:
  * higher-order functions are CodegenFallback, so that shape pays
  * per-CHUNK interpreted lambda dispatch plus an array allocation per
  * slice (measured at the 100× staging: 17.7 s for 1.46M chunks). This
  * expression is one tight per-document loop over `ArrayData` inside
  * whole-stage codegen via a static helper call.
  */
case class ChunkWindows(child: Expression, window: Int, stride: Int)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")
  require(stride >= 1 && stride <= window,
    s"stride must be in [1, window], got $stride (window $window)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "chunk_windows"

  override def nullSafeEval(input: Any): Any =
    ChunkWindows.chunks(input.asInstanceOf[ArrayData], window, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkWindows.chunks($c, $window, $stride)")

  override protected def withNewChildInternal(newChild: Expression): ChunkWindows =
    copy(child = newChild)
}

object ChunkWindows {

  private val Space = UTF8String.fromString(" ")

  /** Chunk k starts at k·stride; the last start is the smallest
    * multiple of `stride` from which the window reaches the end
    * (equivalently ceil((m − window)/stride)·stride clamped at 0).
    */
  def chunks(tokens: ArrayData, window: Int, stride: Int): ArrayData = {
    val m = tokens.numElements()
    val lastStart =
      if (m <= window) 0
      else ((m - window + stride - 1) / stride) * stride
    val out = new Array[AnyRef](lastStart / stride + 1)
    var k = 0
    var start = 0
    while (start <= lastStart) {
      val end = math.min(start + window, m)
      val parts = new Array[UTF8String](math.max(end - start, 0))
      var j = start
      while (j < end) {
        parts(j - start) = tokens.getUTF8String(j)
        j += 1
      }
      out(k) = UTF8String.concatWs(Space, parts: _*)
      k += 1
      start += stride
    }
    new GenericArrayData(out)
  }

  def apply(tokens: Column, window: Int, stride: Int): Column =
    ColumnBridge.column(ChunkWindows(ColumnBridge.expression(tokens), window, stride))
}
