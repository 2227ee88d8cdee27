package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: EnsureRequirements hash-partitions both
  * children on the key and sorts them by (key, time, tie); doExecute
  * then zips co-partitions and merges linearly, carrying only the
  * latest build row per key — O(n) time, O(1) state, spill-free.
  *
  * Scale shape: one shuffle + sort per side (the minimum any keyed
  * temporal join needs), then a streaming merge. Contrast with the
  * range-join expansion (probe × candidate window) or the union+window
  * composition (sorts the concatenation and buffers a running frame).
  */
final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    leftTie: Attribute, rightTie: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder.apply(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(leftTie, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder.apply(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder.apply(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rightWidth = right.output.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (probeIt, buildIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        private var lookahead: InternalRow =
          if (buildIt.hasNext) buildIt.next() else null
        private var matchKey: Long = 0L
        private var matchRow: InternalRow = null // copy of latest build ≤ probe

        override def hasNext: Boolean = probeIt.hasNext

        override def next(): InternalRow = {
          val probe = probeIt.next()
          val pk = probe.getLong(lKeyOrd)
          val pt = probe.getLong(lTimeOrd)
          // consume all build rows at-or-before (pk, pt); the last one
          // with key == pk is the as-of match (tie order inside equal
          // times comes from the required sort)
          var bk = if (lookahead == null) 0L else lookahead.getLong(rKeyOrd)
          var bt = if (lookahead == null) 0L else lookahead.getLong(rTimeOrd)
          while (lookahead != null && (bk < pk || (bk == pk && bt <= pt))) {
            if (bk == pk) { matchKey = pk; matchRow = lookahead.copy() }
            lookahead = if (buildIt.hasNext) buildIt.next() else null
            if (lookahead != null) {
              bk = lookahead.getLong(rKeyOrd)
              bt = lookahead.getLong(rTimeOrd)
            }
          }
          val rightSide =
            if (matchRow != null && matchKey == pk) matchRow else nullRight
          project(joined(probe, rightSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
