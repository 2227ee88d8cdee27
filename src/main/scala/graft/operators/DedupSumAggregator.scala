package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass dedup-by-uuid SUM as a typed Aggregator (SURVEY.md §7.3):
  * the two-operator `dropDuplicates(uuid) → sum(field)` pipeline fused
  * into a single aggregation, for callers that want the reference's
  * per-accumulator semantics (models/aggregate.py:55-58, whose O(n)
  * list-membership scan this replaces with a hash map) without a
  * separate dedup shuffle.
  *
  * Buffer = uuid → value map, so a duplicate uuid contributes once even
  * when the copies arrive in different input partitions (partial
  * buffers merge by map union — a plain seen-set + running-sum buffer
  * could not subtract the duplicate's value). finish() sums in uuid
  * order for a deterministic double result.
  *
  * Scale trade-off: the buffer grows with distinct uuids per key,
  * exactly like the reference's state. The default engine path (global
  * dropDuplicates, then conditional sums — EventAggregates.perUser)
  * bounds memory via shuffle spill and is preferred at 100 TB; this
  * exists for the single-pass shape and as the typed-UDAF capability.
  */
class DedupSumAggregator
    extends Aggregator[(Long, Double), Map[Long, Double], Double] {

  override def zero: Map[Long, Double] = Map.empty

  override def reduce(b: Map[Long, Double], a: (Long, Double)): Map[Long, Double] =
    if (b.contains(a._1)) b else b.updated(a._1, a._2)

  override def merge(x: Map[Long, Double], y: Map[Long, Double]): Map[Long, Double] =
    if (x.size >= y.size) y.foldLeft(x) { case (m, (k, v)) =>
      if (m.contains(k)) m else m.updated(k, v)
    } else merge(y, x)

  override def finish(r: Map[Long, Double]): Double =
    r.toSeq.sortBy(_._1).iterator.map(_._2).sum

  override def bufferEncoder: Encoder[Map[Long, Double]] =
    Encoders.kryo[Map[Long, Double]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
