package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.{ColumnShim, PlanShim}
import org.apache.spark.sql.types.LongType

/** Native AS-OF JOIN as a first-class operator — the time-series join
  * Spark's logical algebra lacks (the aj1/aj2 gates express it as a
  * union + window trick; engines like DuckDB/kdb ship it natively).
  * This is the engine's demonstration of the full custom-operator
  * stack from SURVEY §4: a [[AsofJoin]] LogicalPlan, a
  * [[AsofJoinStrategy]] SparkStrategy, and a [[AsofJoinExec]]
  * physical node that declares DISTRIBUTION and ORDERING requirements
  * so EnsureRequirements plans exactly one hash exchange + sort per
  * side — after which the merge itself is a single forward pass with
  * O(1) state per partition (ONE held right row), versus the
  * window formulation's union + full per-key sort + filter.
  *
  * Semantics: backward inclusive as-of — for each left row, the last
  * right row with equal keys and rightTime <= leftTime (ties broken
  * by the greatest rightTie), LEFT OUTER (unmatched left rows emit
  * nulls on the right). NULL join keys follow SQL equi-join
  * semantics: a null-keyed left row emits an unmatched (null-right)
  * row and null-keyed right rows match nothing. Key expression types
  * must align pairwise between the sides (enforced), and time/tie
  * expressions must be LongType (callers project timestamps to
  * integer micros, which also sidesteps ns/µs physical-type skew).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    forward: Boolean = false)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tie, fwd) =>
      AsofJoinExec(lk, rk, lt, rt, tie, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, rightTie: Expression,
    forward: Boolean,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of times must be LongType (project timestamps to integer micros)")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types must align pairwise: " +
      s"left=${leftKeys.map(_.dataType.simpleString).mkString(",")} " +
      s"right=${rightKeys.map(_.dataType.simpleString).mkString(",")}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // One hash exchange per side on the join keys — the same contract as
  // sort-merge join, so AQE/EnsureRequirements co-partition the sides.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Each side sorted by (keys, time[, tie]) — EnsureRequirements
  // inserts the sorts; the merge below then needs no buffering.
  // Forward mode sorts the tie DESCENDING so the first row at the
  // matching time is the greatest tie (mirrors the backward mode's
  // last-absorbed-wins).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTime, Ascending),
        SortOrder(rightTie, if (forward) Descending else Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // project to UnsafeRow on emit: downstream consumers (collect,
      // shuffle) require unsafe rows, same contract as SortMergeJoin's
      // result projection
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = ri.buffered
      if (forward) {
        // successor mode: the head row (sorted time asc, tie desc) is
        // the match once rows strictly before the left time are gone.
        li.map { lrow =>
          val lk = lKeyProj(lrow)
          if (lk.anyNull) resultProj(joined(lrow, nullRight))
          else {
            // SQL equi-join semantics: NULL keys match nothing. Null-
            // keyed right rows sort first (NULLS FIRST), so this drain
            // runs once per partition at the first non-null left key.
            while (rBuf.hasNext && rKeyProj(rBuf.head).anyNull)
              rBuf.next()
            val lt = lTimeProj(lrow).getLong(0)
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) < 0)
              rBuf.next()
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) == 0
                && rTimeProj(rBuf.head).getLong(0) < lt)
              rBuf.next()
            val matched = rBuf.hasNext &&
              keyOrd.compare(rKeyProj(rBuf.head), lk) == 0
            // copy: BufferedIterator caches the reference and upstream
            // readers reuse row objects across next() calls
            resultProj(joined(lrow, if (matched) rBuf.head.copy() else nullRight))
          }
        }
      } else {
        // O(1) merge state: the as-of predecessor for the current key.
        var heldKey: UnsafeRow = null
        var held: InternalRow = null
        li.map { lrow =>
          val lk = lKeyProj(lrow)
          if (lk.anyNull) resultProj(joined(lrow, nullRight))
          else {
            // SQL equi-join semantics: NULL keys match nothing (see
            // the forward branch — null right rows sort first, one
            // drain per partition).
            while (rBuf.hasNext && rKeyProj(rBuf.head).anyNull)
              rBuf.next()
            val lt = lTimeProj(lrow).getLong(0)
            // discard right rows for keys already passed
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) < 0)
              rBuf.next()
            // absorb right rows at this key up to the left time; the
            // LAST one absorbed is the as-of match (sorted by time,
            // then tie)
            var advanced = false
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) == 0
                && rTimeProj(rBuf.head).getLong(0) <= lt) {
              held = rBuf.next().copy(); advanced = true
            }
            if (advanced) heldKey = lk.copy()
            val matched = heldKey != null && keyOrd.compare(heldKey, lk) == 0
            resultProj(joined(lrow, if (matched) held else nullRight))
          }
        }
      }
    }
  }
}

/** DataFrame-level builder + session wiring for the native as-of join. */
object AsofJoinOps {

  /** Backward inclusive as-of LEFT join; time/tie columns must be
    * LongType. Children should expose disjoint column names (alias
    * the right side) — the node does not deduplicate self-join
    * attribute ids. Keys/times are given by NAME and bound here
    * against the analyzed children (Spark 4 Columns carry opaque
    * lazy nodes the analyzer will not resolve inside foreign plans).
    */
  def asofBackward(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightTie: String): DataFrame =
    asof(left, right, leftKeys, rightKeys, leftTime, rightTime, rightTie,
      forward = false)

  /** Forward inclusive as-of LEFT join (earliest right at-or-after the
    * left time, greatest tie among equals).
    */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKeys: Seq[String], rightKeys: Seq[String],
                  leftTime: String, rightTime: String,
                  rightTie: String): DataFrame =
    asof(left, right, leftKeys, rightKeys, leftTime, rightTime, rightTie,
      forward = true)

  private def asof(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightTie: String, forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lPlan = PlanShim.analyzed(left)
    val rPlan = PlanShim.analyzed(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"asofBackward: column '$name' not in ${plan.output.map(_.name)}"))
    PlanShim.ofRows(spark, AsofJoin(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), attr(rPlan, rightTie),
      forward))
  }
}
