package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` computing the element-wise mean of an
  * `array<float>` column — the UDAF extension surface (SURVEY.md
  * §2.E17), and the centroid primitive an IVF-style ANN index builds
  * its partition lists from.
  *
  * The buffer is (running double sums, count): merge is associative and
  * commutative, so Spark can partial-aggregate map-side and combine
  * across partitions — the same contract as built-in aggregates.
  */
class VectorAvg(dim: Int) extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) return b
    require(v.length == dim, s"vector_avg: expected dim $dim, got ${v.length}")
    val (sums, n) = b
    var i = 0
    while (i < dim) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(
      a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    val (sa, na) = a; val (sb, nb) = b
    var i = 0
    while (i < dim) { sa(i) += sb(i); i += 1 }
    (sa, na + nb)
  }

  override def finish(b: (Array[Double], Long)): Seq[Float] = {
    val (sums, n) = b
    if (n == 0L) null else sums.map(s => (s / n).toFloat).toSeq
  }

  // ExpressionEncoder keeps the buffer columnar (ARRAY<DOUBLE>, BIGINT)
  // instead of opaque serialized bytes
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()
}

object VectorAvg {
  /** Column form: `df.groupBy(k).agg(VectorAvg.of(64)(col("embedding")))`. */
  def of(dim: Int): Column => Column = c => udaf(new VectorAvg(dim)).apply(c)
}
