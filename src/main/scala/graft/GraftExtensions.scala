package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{ArgMaxTieMin, DotProduct, SqDistLong, TrimUtf8Bytes, WordShingles}

/** Registers the engine's native Catalyst expressions as SQL functions,
  * so `spark.sql` queries can call them directly:
  *
  *   - `trim_utf8_bytes(str, maxBytes)`  (X1)
  *   - `dot_product(arr, arr)`           (vector math, scale/)
  *   - `sqdist_long(arr, arr)`           (integer squared L2, scale/ k-means/PQ)
  *   - `word_shingles(arr, n)`           (n-gram shingling, scale/)
  *   - `argmax_tie_min(id, score)`       (hash-aggregable argmax, scale/)
  *
  * Two entry points:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` at session
  *     build (the standard SparkSessionExtensions route);
  *   - programmatic: `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("trim_utf8_bytes"),
      new ExpressionInfo(classOf[TrimUtf8Bytes].getName, "trim_utf8_bytes"),
      (children: Seq[Expression]) =>
        TrimUtf8Bytes(children.head, intLit(children(1), "trim_utf8_bytes maxBytes"))),
    (
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))),
    (
      FunctionIdentifier("sqdist_long"),
      new ExpressionInfo(classOf[SqDistLong].getName, "sqdist_long"),
      (children: Seq[Expression]) => SqDistLong(children.head, children(1))),
    (
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) =>
        WordShingles(children.head, intLit(children(1), "word_shingles n"))),
    (
      FunctionIdentifier("argmax_tie_min"),
      new ExpressionInfo(classOf[ArgMaxTieMin].getName, "argmax_tie_min"),
      (children: Seq[Expression]) =>
        ArgMaxTieMin(children.head, children(1)).toAggregateExpression()))

  /** Register on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
