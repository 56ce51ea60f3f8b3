package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Size-capped `collect_list` for long keys: gathers group members up
  * to `cap`, and the moment a group exceeds it the buffer collapses to
  * an overflow marker (finish → null) and stops accumulating. This is
  * the scale-safe way to fold a document-frequency cap INTO the
  * grouping aggregate: `collect_list` + post-filter materializes a
  * hot boilerplate key's full (possibly corpus-sized) member list
  * before dropping it, while this buffer is ≤ cap + 1 elements by
  * construction — map-side partials included — so the df-capped
  * pair-generation plan (q220's span ladder) runs in ONE shuffle with
  * bounded memory on any corpus.
  *
  * Merge is associative/commutative (overflow is absorbing), so Spark
  * partial-aggregates map-side like any built-in aggregate. The
  * result arrives sorted for deterministic (a < b) pair emission.
  *
  * `cap` is expected to stay small (df-caps are tens, not millions):
  * the buffer is an immutable Array grown with `:+`, so each group pays
  * O(cap²) element copies — which is noise next to the encoder
  * round-trip the udaf path already pays per input row, but would stop
  * being noise if someone passed cap = 10⁶. The constructor enforces
  * the intended regime rather than documenting it away.
  */
class CollectCapped(cap: Int)
    extends Aggregator[Long, (Array[Long], Boolean), Seq[Long]] {
  require(cap > 0 && cap <= 10000,
    s"CollectCapped is a SMALL-cap bounded collect (got cap=$cap); " +
      "for large caps use collect_list + post-filter or a sketch")

  override def zero: (Array[Long], Boolean) = (Array.emptyLongArray, false)

  override def reduce(b: (Array[Long], Boolean), v: Long): (Array[Long], Boolean) =
    if (b._2) b
    else if (b._1.length >= cap) (Array.emptyLongArray, true)
    else (b._1 :+ v, false)

  override def merge(
      a: (Array[Long], Boolean), b: (Array[Long], Boolean)): (Array[Long], Boolean) =
    if (a._2 || b._2 || a._1.length + b._1.length > cap)
      (Array.emptyLongArray, true)
    else (a._1 ++ b._1, false)

  override def finish(b: (Array[Long], Boolean)): Seq[Long] =
    if (b._2) null else b._1.sorted.toSeq

  override def bufferEncoder: Encoder[(Array[Long], Boolean)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Boolean)]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CollectCapped {
  /** Column form: `df.groupBy(k).agg(CollectCapped.of(50)(col("id")))` —
    * null result = group overflowed the cap.
    */
  def of(cap: Int): Column => Column = c => udaf(new CollectCapped(cap)).apply(c)
}
