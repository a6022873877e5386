package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF-8-byte-aware truncation with `" ..."` suffix.
  *
  * Mirrors the reference's trim semantics
  * (reference: Dao.trimToBytes, Dao.java:191-209; Manager.trimTo4000,
  * Manager.java:148-183): if the UTF-8 encoding of `child` exceeds
  * `maxBytes`, shrink on Java-String (UTF-16) boundaries until the
  * encoding fits in `maxBytes - 4` bytes, then append `" ..."`.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) so the
  * fast path — value already within budget — never leaves UTF8String.
  */
case class TrimUtf8Bytes(child: Expression, maxBytes: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "trim_utf8_bytes"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numBytes <= maxBytes) s
    else UTF8String.fromString(TrimUtf8Bytes.trim(s.toString, maxBytes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    defineCodeGen(ctx, ev, c =>
      s"($c.numBytes() <= $maxBytes) ? $c : " +
        s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TrimUtf8Bytes.trim($c.toString(), $maxBytes))")
  }

  override protected def withNewChildInternal(newChild: Expression): TrimUtf8Bytes =
    copy(child = newChild)
}

object TrimUtf8Bytes {

  /** Exact translation of the reference shrink loop (Dao.java:196-203):
    * budget = maxBytes - 4 (reserved for the `" ..."` suffix); start at
    * min(length, maxBytes) UTF-16 chars and shrink until the UTF-8
    * encoding fits the budget.
    */
  def trim(value: String, maxBytes: Int): String = {
    val bytes = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (bytes.length <= maxBytes) return value
    val budget = maxBytes - 4
    var len = math.min(value.length, maxBytes)
    var trimmed = value.substring(0, len)
    len -= 1
    while (trimmed.getBytes(java.nio.charset.StandardCharsets.UTF_8).length > budget && len > 0) {
      trimmed = value.substring(0, len)
      len -= 1
    }
    trimmed + " ..."
  }

  /** Column-level entry point. */
  def apply(c: Column, maxBytes: Int): Column =
    ColumnBridge.column(TrimUtf8Bytes(ColumnBridge.expression(c), maxBytes))
}
