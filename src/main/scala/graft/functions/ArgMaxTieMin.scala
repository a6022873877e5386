package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, EqualTo, Expression, GreaterThan, If, IsNotNull,
  LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Hash-aggregable argmax with min-id tie-break: the id (long) whose
  * score (double) is the group maximum; equal scores resolve to the
  * SMALLEST id — exactly `max_by(id, struct(score, -id))` and the
  * oracle's `row_number() OVER (ORDER BY score DESC, id)` = 1.
  *
  * Why not `max_by` itself: a struct-typed ordering gives MaxBy a
  * struct aggregation buffer, and non-mutable buffer types demote the
  * whole aggregation to SortAggregate — the IVF/SemDeDup assignment
  * then SORTS the N·nlist (vector × centroid) score rows instead of
  * hash-folding them (the same regression class the k-means argmin
  * avoids by packing into a long; PlanGuardSpec pins both). This
  * aggregate keeps two primitive buffer slots (double score, long id),
  * so HashAggregate + map-side partial merge apply.
  *
  * Contract: ids must not be Long.MaxValue (the empty-buffer sentinel);
  * NaN scores follow Spark's NaN-is-largest comparison semantics.
  */
case class ArgMaxTieMin(valueExpr: Expression, scoreExpr: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = valueExpr
  override def right: Expression = scoreExpr
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "argmax_tie_min"

  override def checkInputDataTypes(): TypeCheckResult =
    if (valueExpr.dataType == LongType && scoreExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, double), got " +
          s"${valueExpr.dataType.simpleString}, ${scoreExpr.dataType.simpleString}")

  private lazy val bestScore = AttributeReference("bestScore", DoubleType)()
  private lazy val bestId = AttributeReference("bestId", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestScore, bestId)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.NegativeInfinity, DoubleType),
    Literal(Long.MaxValue, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val candidateBetter = Or(
      GreaterThan(scoreExpr, bestScore),
      And(EqualTo(scoreExpr, bestScore), LessThan(valueExpr, bestId)))
    val b = And(And(IsNotNull(scoreExpr), IsNotNull(valueExpr)), candidateBetter)
    Seq(
      If(b, scoreExpr, bestScore),
      If(b, valueExpr, bestId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val b = Or(
      GreaterThan(bestScore.right, bestScore.left),
      And(
        EqualTo(bestScore.right, bestScore.left),
        LessThan(bestId.right, bestId.left)))
    Seq(
      If(b, bestScore.right, bestScore.left),
      If(b, bestId.right, bestId.left))
  }

  override lazy val evaluateExpression: Expression =
    If(
      EqualTo(bestId, Literal(Long.MaxValue, LongType)),
      Literal(null, LongType),
      bestId)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxTieMin =
    copy(valueExpr = newLeft, scoreExpr = newRight)
}

object ArgMaxTieMin {

  /** `argmaxTieMin(id, score)` as a user-facing aggregate Column. */
  def apply(value: Column, score: Column): Column =
    ColumnBridge.column(
      ArgMaxTieMin(
        ColumnBridge.expression(value.cast("long")),
        ColumnBridge.expression(score.cast("double"))).toAggregateExpression())
}
