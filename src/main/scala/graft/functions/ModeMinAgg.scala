package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mode-with-min-tiebreak as ONE typed aggregate: returns the most
  * frequent input value, ties broken by the SMALLEST value — the
  * deterministic neighbor-vote [[graft.operators.Components.labelPropagation]]
  * takes every round. Replaces the two-shuffle formulation
  * (`groupBy(node, label).count` then `groupBy(node).min(struct(-cnt,
  * label))`) with a single node-keyed exchange: the per-node counting
  * happens inside an ObjectHashAggregate buffer (a live HashMap,
  * kryo-serialized only when a partial buffer crosses the exchange or
  * spills), and map-side partial aggregation still applies because
  * merge is count-sum. (A primitive `mutable.LongMap` buffer was
  * measured first but its transient internals don't survive the kryo
  * round-trip — EXPRESSION_DECODING_FAILED on block serialization.)
  *
  * Buffer size is bounded by the node's distinct neighbor-label count
  * (≤ degree), the same bound the exploded (node, label) relation
  * carries — no new memory class, one fewer shuffle of it.
  */
final class ModeMinAgg
    extends Aggregator[Long, java.util.HashMap[Long, Long], Long] {

  override def zero: java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def reduce(buf: java.util.HashMap[Long, Long],
      x: Long): java.util.HashMap[Long, Long] = {
    buf.merge(x, 1L, (a: Long, b: Long) => a + b)
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long],
      b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    b.forEach { (k, v) =>
      a.merge(k, v, (x: Long, y: Long) => x + y)
    }
    a
  }

  override def finish(buf: java.util.HashMap[Long, Long]): Long = {
    var bestLabel = Long.MaxValue
    var bestCount = -1L
    buf.forEach { (label, cnt) =>
      if (cnt > bestCount || (cnt == bestCount && label < bestLabel)) {
        bestCount = cnt
        bestLabel = label
      }
    }
    bestLabel
  }

  override def bufferEncoder: Encoder[java.util.HashMap[Long, Long]] =
    Encoders.kryo[java.util.HashMap[Long, Long]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object ModeMinAgg {
  /** Column form: most frequent value of `c`, smallest wins ties. */
  def of(c: Column): Column = udaf(new ModeMinAgg).apply(c)
}
