package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** k-way MinHash signature as ONE typed aggregate: the buffer is a
  * primitive long[k] updated in a tight loop per input hash, merged
  * element-wise min. Runs through ObjectHashAggregateExec, which keeps
  * buffers as live objects in the hash map (serializing only on spill),
  * so per-row cost is k multiply-mods with no boxing — versus k
  * separate min(pmod(...)) aggregate columns, which carry k codegen'd
  * buffer slots and k expression evaluations through the whole
  * aggregation pipeline.
  *
  * Input values must already be reduced mod [[MinHashAgg.P]].
  */
final class MinHashAgg(k: Int, seed: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  import MinHashAgg.P

  private val (as, bs) = {
    val rnd = new scala.util.Random(seed)
    (Array.fill(k)(1 + rnd.nextLong(P - 1)), Array.fill(k)(rnd.nextLong(P)))
  }

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = (as(i) * x + bs(i)) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashAgg {
  /** Mersenne prime 2^31−1; residue products stay under 2^62. */
  val P: Long = 2147483647L

  /** Column form over a pre-reduced hash column. */
  def of(k: Int, seed: Long): Column => Column =
    c => udaf(new MinHashAgg(k, seed)).apply(c)
}
