package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared IN-PLAN guard expressions (the r19 self-review extraction:
  * the same guard shape had grown three verbatim copies, the exact
  * drift class the quarantine refactor exists to prevent).
  *
  * Both helpers follow the codegen null-short-circuit law: the guard
  * sits on the LEFT of the `+`, because the failing case is exactly a
  * NULL cast and codegen legally skips the right operand of `+` when
  * the left is null.
  */
object Guards {

  /** Guard-first long cast with a NAMED error: a null or non-castable
    * caller value would otherwise surface downstream as an anonymous
    * task NullPointerException (a two-phase pass's `getLong`, an
    * encoder, a fold UDF).
    */
  def guardedLong(c: String, op: String, what: String): Column =
    coalesce(
      assert_true(col(c).cast("long").isNotNull,
        lit(s"$op: $c has a null or non-long-castable value — " +
          s"every row needs a $what")).cast("long"),
      lit(0L)) + col(c).cast("long")

  /** The reward family's milli quantization with its guard: NaN or a
    * reward outside ±2^63/1000 fails BY NAME (an unguarded NaN
    * compares false downstream and silently mislabels; an oversized
    * reward would wrap the quantized long). Returns ⌊reward · 1000⌋
    * as a long — quantize-FIRST is the family law; reductions sum the
    * integers.
    */
  def quantizedMilli(rewardCol: String, op: String): Column = {
    val ok = !isnan(col(rewardCol)) &&
      abs(col(rewardCol)) < lit(9.223372036854775e15)
    coalesce(
      assert_true(ok,
        lit(s"$op: reward NaN or out of milli-quantization range " +
          "(|reward| must be < 2^63/1000)")).cast("long"),
      lit(0L)) + floor(col(rewardCol) * 1000).cast("long")
  }
}
