package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for every left (probe) row, attach the single
  * right (build) row with the same key and the greatest
  * (time, tie) <= (probe time, ∞) — i.e. the most recent build state
  * at probe time, ties broken deterministically by `tie`.
  *
  * This is the whole-operator form (preference (c) of the build rules:
  * custom LogicalPlan + Strategy + SparkPlan) of the same semantics as
  * graft.operators.AsOf's union-then-window composition. The physical
  * plan (AsOfJoinExec) co-partitions both sides by key and runs a
  * linear merge over the sorted partitions with O(1) state per key —
  * no union materialization, no window buffering.
  *
  * Keys/ties are LongType, times are TimestampType/LongType (checked in
  * AsOfNative.join). Right-side output is nullable (probe may precede
  * every build row).
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    leftTie: Attribute, rightTie: Attribute)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, rightKey, leftTime, rightTime, leftTie, rightTie))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}
